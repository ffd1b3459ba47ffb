"""Hot-entity measurement for the GENERIC two-table asof_join (VERDICT r6 #2).

Same harness as measure_hot_asof.py (tools/hotcorpus.py): a Zipf-head
events corpus where user 0 holds ~30% of N events over 30 days, split
into a purchases left table and a views right table (with a payload
column, so the join must carry a real right row, not just a timestamp).
Times the per-entity Arrow merge_asof plan (``asof_join_grouped`` — one
pandas frame per entity, the r6 fail-loud path) against the pure-Catalyst
time-sharded default (``asof_join``), and checks the full attribution
mapping is identical.

Usage: python tools/measure_hot_asof_twotable.py [n_events] [cpus]
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

    from etl_airflow_adventureworks_spark.operators.asof import (
        asof_join,
        asof_join_grouped,
    )
    from etl_airflow_adventureworks_spark.session import get_spark
    from etl_airflow_adventureworks_spark.sources import load_table

    spark = get_spark(app_name="hot-asof2", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    out = write_hot_events(
        n, seed=47, event_types=[("view", 0.7), ("purchase", 0.8), ("click", 1.0)]
    )
    ev = load_table(spark, str(out), "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts_us"
    )
    # unique (user, ts) on the right → deterministic carried payload
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts_us")
        .agg(F.max("event_id").alias("view_id"))
    )

    def consume(df):
        # aggregate the carried columns so Catalyst can't prune the join
        return df.agg(
            F.avg("ts_us_right"), F.sum("view_id_right"), F.count(F.lit(1))
        ).collect()

    # raise the guard so the grouped plan runs to completion on the hot key
    grouped = median_timed(
        lambda: asof_join_grouped(
            purchases, views, on="ts_us", by="user_id", max_group_rows=50_000_000
        ),
        consume,
    )
    shard_us = 24 * 3600 * 1_000_000
    sharded = median_timed(
        lambda: asof_join(purchases, views, on="ts_us", by="user_id", shard_width=shard_us),
        consume,
    )

    def checksum(df):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64("purchase_id", "ts_us_right", "view_id_right").cast(
                    "decimal(38,0)"
                )
            ).alias("x"),
        ).collect()[0]
        return row["n"], row["x"]

    a = checksum(
        asof_join_grouped(
            purchases, views, on="ts_us", by="user_id", max_group_rows=50_000_000
        )
    )
    b = checksum(
        asof_join(purchases, views, on="ts_us", by="user_id", shard_width=shard_us)
    )
    print(
        json.dumps(
            {
                "n_events": n,
                "hot_share": 0.3,
                "cpus": cpus,
                "grouped_merge_asof_sec": round(grouped, 2),
                "sharded_sec": round(sharded, 2),
                "speedup": round(grouped / sharded, 2),
                "checksums_equal": a == b,
                "purchases": a[0],
            }
        )
    )
    cleanup(out)
    spark.stop()


if __name__ == "__main__":
    main()
