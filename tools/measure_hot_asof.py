"""Hot-user as-of attribution straggler measurement (VERDICT r5 #5).

Same harness as measure_hot_sessions.py (shared via tools/hotcorpus.py):
a Zipf-head events corpus (one user holds ~30% of N events over 30 days,
view/purchase mix), timing the user-window as-of twin against the
time-sharded form (the DECLARED ext_asof_attribution since round 6) on
local[N]. The window form's last_value(... IGNORE NULLS) partitions on
user_id — one indivisible task per user — so the hot user's history is
the stage's critical path; the sharded form's heavy window keys on
(user, day) and stitches the carry-in over per-shard summaries.

Measured round 6 (idle machine, 1 warmup + median-of-5): user-window
1.00 / 2.57 / 10.05 s at 2M / 8M / 32M events vs sharded 0.89 / 1.47 /
4.76 s = 1.11x / 1.75x / 2.11x, monotone and widening with the hot
task. Run on an IDLE machine: concurrent load distorted an earlier
in-round measurement.

Usage: python tools/measure_hot_asof.py [n_events] [cpus]
Prints one JSON line; numbers are recorded in SCALING.md.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from tools.hotcorpus import cleanup, median_timed, write_hot_events  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F

    from etl_airflow_adventureworks_spark.operators.sessionize import (
        asof_attribution_sharded,
        asof_attribution_user_window,
    )
    from etl_airflow_adventureworks_spark.session import get_spark
    from etl_airflow_adventureworks_spark.sources import load_table

    spark = get_spark(app_name="hot-asof", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # ~70% views / 10% purchases / 20% other — the attribution mix
    out = write_hot_events(
        n, seed=43, event_types=[("view", 0.7), ("purchase", 0.8), ("click", 1.0)]
    )

    def consume(df):
        # NOT count(): the attributed column is cardinality-neutral, so a
        # bare count lets Catalyst eliminate the Window node entirely and
        # the "measurement" times a filtered scan. Aggregating the column
        # (avg — epoch-µs overflows a long sum) forces the full compute.
        return df.agg(F.avg("last_view_us"), F.count(F.lit(1))).collect()

    ev = load_table(spark, str(out), "events")
    user_window = median_timed(lambda: asof_attribution_user_window(ev), consume)
    sharded = median_timed(lambda: asof_attribution_sharded(ev, shard_hours=24), consume)

    # sanity: identical ATTRIBUTIONS, not just identical row counts — both
    # forms emit one row per purchase by construction, so a count compare
    # is vacuous; hash the full (purchase, attributed-view) mapping
    # order-insensitively instead (full tuple-equality lives in
    # tests/test_skew_zipf.py)
    def checksum(df):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64("purchase_id", "last_view_us").cast("decimal(38,0)")
            ).alias("x"),
        ).collect()[0]
        return row["n"], row["x"]

    a = checksum(asof_attribution_user_window(ev))
    b = checksum(asof_attribution_sharded(ev, shard_hours=24))
    print(
        json.dumps(
            {
                "n_events": n,
                "hot_share": 0.3,
                "cpus": cpus,
                "user_window_sec": round(user_window, 2),
                "sharded_user_day_sec": round(sharded, 2),
                "speedup": round(user_window / sharded, 2),
                "attribution_checksums_equal": a == b,
                "purchases": a[0],
            }
        )
    )
    cleanup(out)
    spark.stop()


if __name__ == "__main__":
    main()
