"""Controlled A/B for the r7→r8 headline-bench drift (VERDICT r8 #4).

Protocol: alternating fresh-JVM bench runs of r7 HEAD (7c98c99) and r8
HEAD (d05140b) from two git worktrees, same idle session, on the 10
most-regressed queries (by BENCH_r08/BENCH_r07 ratio), 3 pairs, each run
the bench's own warmup+median-of-3 per query. Verdict rule: if the two
checkouts agree within noise pair-for-pair, the drift was machine
condition (exoneration); if r8 is consistently slower on a query whose
code did not change, the guilty commit must be found.

Writes AB_DRIFT.json (worktree paths are session-local; the adjudicated
summary is recorded in SCALING.md).
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
QUERIES = (
    "ext_fingerprint,ext_simhash_neardup,ext_token_stats,"
    "ext_tfidf_top_terms,ext_window_suite,ext_lang_id,"
    "ext_interleave_sources,ext_exact_dedup_docs,ext_ngram_jaccard,"
    "ext_grouping_sets"
)
PAIRS = 3


def run_once(tree: Path) -> dict[str, float]:
    env = {
        "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.1",
        "SPARK_GRAFT_CPUS": "32",
        "SPARK_GRAFT_QUERIES": QUERIES,
        "SPARK_GRAFT_REPS": "3",
        "SPARK_GRAFT_WARMUP": "1",
        "SPARK_GRAFT_PASSES": "1",  # each paired run IS a fresh JVM already
        "PATH": "/usr/bin:/bin:/usr/local/bin",
        "HOME": "/root",
    }
    import os

    env["JAVA_HOME"] = os.environ.get("JAVA_HOME", "")
    out = subprocess.run(
        [sys.executable, str(tree / "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        check=True,
        cwd=str(tree),
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)["queries"]


def main() -> None:
    runs: dict[str, list[dict[str, float]]] = {"r7": [], "r8": []}
    for i in range(PAIRS):
        for tag, tree in (("r7", REPO / ".ab_r7"), ("r8", REPO / ".ab_r8")):
            q = run_once(tree)
            runs[tag].append(q)
            print(f"[ab] pair {i + 1} {tag}: " + json.dumps(q), file=sys.stderr)
    summary = {}
    for name in QUERIES.split(","):
        a = [r[name] for r in runs["r7"]]
        b = [r[name] for r in runs["r8"]]
        summary[name] = {
            "r7_runs": a,
            "r8_runs": b,
            "r7_median": statistics.median(a),
            "r8_median": statistics.median(b),
            "ratio": round(statistics.median(b) / statistics.median(a), 3),
        }
    rec = {"protocol": "alternating fresh-JVM, 3 pairs, bench warmup+median-of-3",
           "checkouts": {"r7": "7c98c99", "r8": "d05140b"},
           "queries": summary}
    (REPO / "AB_DRIFT.json").write_text(json.dumps(rec, indent=1) + "\n")
    print(json.dumps({n: s["ratio"] for n, s in summary.items()}, indent=1))


if __name__ == "__main__":
    main()
