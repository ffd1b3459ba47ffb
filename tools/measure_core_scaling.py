"""Core-count scaling demonstration (r17, VERDICT r16 #2): run the
bench's own protocol on a heavy-query subset at two core counts and one
scale factor, recording loadavg and cumulative steal ticks around each
run so the record shows WHETHER the host can express core scaling at
all (this sandbox is a shared VM — under full 32-way load a double-digit
percent of CPU is stolen, which caps wall-clock gains from wider local
parallelism regardless of plan quality).

Usage:
    python tools/measure_core_scaling.py <sf_dir> <comma-queries> \
        [cpus_list=8,32] [out.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _steal_ticks() -> int | None:
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        return int(parts[8]) if len(parts) > 8 else None
    except OSError:
        return None


def run_bench(sf_dir: str, cpus: int, queries: str) -> dict:
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_SF_DIR": sf_dir,
        "SPARK_GRAFT_CPUS": str(cpus),
        "SPARK_GRAFT_QUERIES": queries,
        "SPARK_GRAFT_REPS": "3",
        "SPARK_GRAFT_WARMUP": "1",
        "SPARK_GRAFT_PASSES": "1",
    })
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True, text=True, env=env, check=True, cwd=str(REPO),
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    sf_dir, queries = sys.argv[1], sys.argv[2]
    cpus_list = [int(c) for c in (sys.argv[3] if len(sys.argv) > 3 else "8,32").split(",")]
    out_path = sys.argv[4] if len(sys.argv) > 4 else None
    runs = []
    for cpus in cpus_list:
        # quiet-window wait (bounded): the previous run's dying JVM keeps
        # load1 elevated for ~a minute, which would bias whichever config
        # runs second
        import time

        for _ in range(24):
            if os.getloadavg()[0] < 1.0:
                break
            time.sleep(10)
        load1 = round(os.getloadavg()[0], 2)
        steal0 = _steal_ticks()
        rec = run_bench(sf_dir, cpus, queries)
        steal1 = _steal_ticks()
        runs.append({
            "cpus": cpus,
            "master": rec.get("master"),
            "default_parallelism": rec.get("default_parallelism"),
            "input_layout": rec.get("input_layout"),
            "load1_before": load1,
            "steal_ticks_delta": (steal1 - steal0)
            if steal0 is not None and steal1 is not None else None,
            "total": rec["value"],
            "queries": rec["queries"],
        })
        print(f"[scaling] cpus={cpus} total={rec['value']}s "
              f"steal_delta={runs[-1]['steal_ticks_delta']}", file=sys.stderr)
    ratios = {}
    if len(runs) == 2:
        for name in runs[0]["queries"]:
            a, b = runs[0]["queries"][name], runs[1]["queries"][name]
            ratios[name] = round(a / b, 3) if b else None
    rec = {"sf_dir": sf_dir, "protocol": "bench.py, 1 fresh-JVM pass each, "
           "warmup 1 + median-of-3 per query",
           "runs": runs,
           # per query: t_{first_cpus} / t_{last_cpus} — >1 means the wider
           # core count is faster by that factor
           f"t{cpus_list[0]}c_over_t{cpus_list[-1]}c": ratios}
    if out_path:
        Path(out_path).write_text(json.dumps(rec, indent=1) + "\n")
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
