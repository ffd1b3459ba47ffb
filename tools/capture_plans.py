"""Capture .explain("formatted") for every benched query → plans/<tag>/.

Usage: python tools/capture_plans.py <out_dir> [query,query,...]

Streaming queries (ext_stream_*) have no lazy batch plan — they are skipped
(the memory-sink table's plan is just an in-memory scan and says nothing
about the streaming plan). The bench EXTRA_FNS twins are included.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from etl_airflow_adventureworks_spark import registry  # noqa: E402
from etl_airflow_adventureworks_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir = Path(sys.argv[1])
    out_dir.mkdir(parents=True, exist_ok=True)
    subset = None
    if len(sys.argv) > 2:
        subset = {s.strip() for s in sys.argv[2].split(",") if s.strip()}
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="capture_plans",
        cpus=cpus,
        shuffle_partitions=cpus,
        extra_conf={"spark.sql.files.maxPartitionBytes": "8m"},
    )
    registry.load_all()

    import bench  # noqa: E402

    fns = dict(registry.QUERIES)
    for name, fn in bench.EXTRA_FNS.items():
        fns.setdefault(name, fn)
    names = sorted(fns)
    if subset:
        names = [n for n in names if n in subset]
    for name in names:
        if name.startswith("ext_stream_"):
            continue
        df = fns[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}.txt").write_text(plan)
        print(f"[plans] wrote {name}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
