"""Generic paired A/B bench: alternating fresh-JVM runs of two git
revisions on a chosen query set (the r9 drift-adjudication protocol,
`tools/ab_drift.py`, generalized for any within-round perf claim —
paired same-session runs are the only valid cross-revision comparison
on this machine, see SCALING.md's drift sections).

Usage:
    python tools/ab_pair.py <revA> <revB> <comma-queries> [pairs=3] [out.json]

Creates throwaway worktrees .ab_A/.ab_B (removed after), alternates
A,B per pair (each run = the bench's own warmup + median-of-3 per
query, fresh JVM), prints per-query medians and B/A ratios, and writes
the record to the optional out path.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load1() -> float | None:
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:
        return None


def run_once(tree: Path, queries: str) -> dict[str, float]:
    env = {
        "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.1",
        "SPARK_GRAFT_CPUS": "32",
        "SPARK_GRAFT_QUERIES": queries,
        "SPARK_GRAFT_REPS": "3",
        "SPARK_GRAFT_WARMUP": "1",
        "SPARK_GRAFT_PASSES": "1",  # each paired run IS a fresh JVM already
        "PATH": "/usr/bin:/bin:/usr/local/bin",
        "HOME": "/root",
        "JAVA_HOME": os.environ.get("JAVA_HOME", ""),
    }
    out = subprocess.run(
        [sys.executable, str(tree / "bench.py")],
        capture_output=True, text=True, env=env, check=True, cwd=str(tree),
    )
    return json.loads(out.stdout.strip().splitlines()[-1])["queries"]


def main() -> None:
    rev_a, rev_b, queries = sys.argv[1], sys.argv[2], sys.argv[3]
    pairs = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    out_path = sys.argv[5] if len(sys.argv) > 5 else None
    trees = {"A": REPO / ".ab_A", "B": REPO / ".ab_B"}
    for tag, rev in (("A", rev_a), ("B", rev_b)):
        subprocess.run(
            ["git", "worktree", "remove", "--force", str(trees[tag])],
            cwd=REPO, capture_output=True,
        )
        subprocess.run(
            ["git", "worktree", "add", "--detach", str(trees[tag]), rev],
            cwd=REPO, check=True, capture_output=True,
        )
    try:
        runs: dict[str, list[dict[str, float]]] = {"A": [], "B": []}
        loads: list[float | None] = []  # load1 before each run (r17:
        # quiet-window evidence travels WITH the record, VERDICT r16 #3)
        for i in range(pairs):
            for tag in ("A", "B"):
                loads.append(_load1())
                q = run_once(trees[tag], queries)
                runs[tag].append(q)
                print(f"[ab] pair {i + 1} {tag} (load1 {loads[-1]}): "
                      f"{json.dumps(q)}", file=sys.stderr)
        summary = {}
        for name in queries.split(","):
            a = [r[name] for r in runs["A"]]
            b = [r[name] for r in runs["B"]]
            summary[name] = {
                "A_runs": a, "B_runs": b,
                "A_median": statistics.median(a),
                "B_median": statistics.median(b),
                "B_over_A": round(
                    statistics.median(b) / statistics.median(a), 3
                ),
                # the PAIRED statistic: median of per-pair ratios — robust
                # to a host-drift window hitting both sides of some pairs
                "pairwise_median": round(statistics.median(
                    bi / ai for ai, bi in zip(a, b)
                ), 3),
            }
        rec = {
            "protocol": f"alternating fresh-JVM, {pairs} pairs, "
                        "bench warmup+median-of-3 per run",
            "checkouts": {"A": rev_a, "B": rev_b},
            "load1_before_each_run": loads,
            "queries": summary,
        }
        if out_path:
            Path(out_path).write_text(json.dumps(rec, indent=1) + "\n")
        print(json.dumps(rec, indent=1))
    finally:
        for tree in trees.values():
            subprocess.run(
                ["git", "worktree", "remove", "--force", str(tree)],
                cwd=REPO, capture_output=True,
            )


if __name__ == "__main__":
    main()
