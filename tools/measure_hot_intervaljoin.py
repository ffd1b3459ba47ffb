"""Hot-key measurement for the generic interval_join (round 8).

Same Zipf-head corpus as the range-join harness (tools/hotcorpus.py):
user 0 holds ~30% of N events over 30 days. Left intervals = 30-minute
windows opened by purchase events, right intervals = 1-hour windows
opened by error events, overlap-joined per user. The naive plan is
Spark's non-equi join (equality on user_id + overlap residual) — a
sort-merge join scanning every same-key (purchase-window, error-window)
pair, O(|L_hot| x |R_hot|) on ONE task for the hot user — while the
sharded default explodes both sides to ~2 shard copies and meets each
true pair in exactly one (user, shard) co-partition. Checksums must be
identical.

Usage: python tools/measure_hot_intervaljoin.py [n_events] [cpus] [naive_reps]
naive_reps=0 checksums the naive plan without timing it; -1 skips it
entirely. Prints one JSON line; recorded in SCALING.md.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from tools.hotcorpus import cleanup, median_timed, write_hot_events  # noqa: E402

L_WIN_US = 1800 * 1_000_000  # 30 min purchase windows
R_WIN_US = 3600 * 1_000_000  # 1 h error windows


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    naive_reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from pyspark.sql import functions as F

    from etl_airflow_adventureworks_spark.operators.rangejoin import (
        interval_join,
        interval_join_naive,
    )
    from etl_airflow_adventureworks_spark.session import get_spark
    from etl_airflow_adventureworks_spark.sources import load_table

    spark = get_spark(app_name="hot-intervaljoin", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    out = write_hot_events(
        n, seed=59, event_types=[("view", 0.55), ("purchase", 0.8), ("error", 1.0)]
    )
    ev = load_table(spark, str(out), "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    lhs = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts_us").alias("l_start"),
        (F.col("ts_us") + F.lit(L_WIN_US)).alias("l_end"),
    )
    rhs = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_id"),
        F.col("ts_us").alias("r_start"),
        (F.col("ts_us") + F.lit(R_WIN_US)).alias("r_end"),
    )

    def consume(df):
        return df.agg(
            F.count(F.lit(1)), F.avg("r_start_iv"), F.sum("error_id_iv")
        ).collect()

    def checksum(df):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64("purchase_id", "error_id_iv").cast("decimal(38,0)")
            ).alias("x"),
        ).collect()[0]
        return row["n"], row["x"]

    # shard width = the (known) mean interval length across both sides
    width = (L_WIN_US + R_WIN_US) // 2
    sharded_fn = lambda: interval_join(
        lhs, rhs, "l_start", "l_end", "r_start", "r_end",
        by="user_id", shard_width=width,
    )
    naive_fn = lambda: interval_join_naive(
        lhs, rhs, "l_start", "l_end", "r_start", "r_end", by="user_id"
    )

    sharded = median_timed(sharded_fn, consume, reps=3)
    result = {
        "n_events": n,
        "hot_share": 0.3,
        "cpus": cpus,
        "l_window_min": 30,
        "r_window_h": 1,
        "sharded_sec": round(sharded, 2),
    }
    if naive_reps >= 0:
        if naive_reps > 0:
            import time

            samples = []
            for _ in range(naive_reps):
                t0 = time.perf_counter()
                consume(naive_fn())
                samples.append(time.perf_counter() - t0)
            naive = sorted(samples)[len(samples) // 2]
            result["naive_nonequi_sec"] = round(naive, 2)
            result["speedup"] = round(naive / sharded, 2)
        cs = checksum(sharded_fn())
        result["checksums_equal"] = cs == checksum(naive_fn())
        result["pairs"] = cs[0]
    print(json.dumps(result))
    cleanup(out)
    spark.stop()


if __name__ == "__main__":
    main()
