"""Hot-key measurement for the generic range_join (round 7).

Same Zipf-head corpus as the session/as-of harnesses (tools/hotcorpus.py):
user 0 holds ~30% of N events over 30 days. Points = purchase events,
intervals = 1-hour windows opened by error events, joined per user. The
naive plan is Spark's own non-equi join (equality on user_id + range
residual): a sort-merge join that buffers each key group and scans every
same-key (purchase, window) pair — O(|P_hot| x |I_hot|) work on ONE task
for the hot user, which is why its cost explodes quadratically with the
corpus while the sharded default (equi-join on (user, shard)) grows
~linearly. Checksums must be identical.

Usage: python tools/measure_hot_rangejoin.py [n_events] [cpus] [naive_reps]
naive_reps=0 skips the naive timing (for sizes where the quadratic task
would run for hours) but still checksums it at most once — pass -1 to
skip the naive plan entirely. Prints one JSON line; recorded in SCALING.md.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from tools.hotcorpus import cleanup, median_timed, write_hot_events  # noqa: E402

WIN_US = 3600 * 1_000_000  # 1 h error windows; shard width = window length


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    naive_reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from pyspark.sql import functions as F

    from etl_airflow_adventureworks_spark.operators.rangejoin import (
        range_join,
        range_join_naive,
    )
    from etl_airflow_adventureworks_spark.session import get_spark
    from etl_airflow_adventureworks_spark.sources import load_table

    spark = get_spark(app_name="hot-rangejoin", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    out = write_hot_events(
        n, seed=53, event_types=[("view", 0.55), ("purchase", 0.8), ("error", 1.0)]
    )
    ev = load_table(spark, str(out), "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    points = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts_us").alias("p_ts"),
    )
    windows = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_id"),
        F.col("ts_us").alias("w_start"),
        (F.col("ts_us") + F.lit(WIN_US)).alias("w_end"),
    )

    def consume(df):
        return df.agg(
            F.count(F.lit(1)), F.avg("w_start_iv"), F.sum("error_id_iv")
        ).collect()

    def checksum(df):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64("purchase_id", "error_id_iv").cast("decimal(38,0)")
            ).alias("x"),
        ).collect()[0]
        return row["n"], row["x"]

    sharded_fn = lambda: range_join(
        points, windows, "p_ts", "w_start", "w_end", by="user_id", shard_width=WIN_US
    )
    naive_fn = lambda: range_join_naive(
        points, windows, "p_ts", "w_start", "w_end", by="user_id"
    )

    sharded = median_timed(sharded_fn, consume, reps=3)
    result = {
        "n_events": n,
        "hot_share": 0.3,
        "cpus": cpus,
        "window_h": 1,
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
