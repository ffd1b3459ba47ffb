"""Measure the r8 event-analytics operators across the scaling corpora.

gapfill / cohort_retention / ordered_funnel / transition_matrix over the
events table at sf0.1 → sf1 → sf10 (same single-corpus protocol as
BENCH_SCALING: idle machine, fresh JVM per sf — invoke once per dir —
1 warmup + median-of-3 per operator). The structural claims these ops
ship with ("output declared, hot keys cost their range not their
volume") only hold water next to a measured decade curve; this records
it. Prints one JSON line per run; recorded in SCALING.md.

Usage: python tools/measure_event_analytics.py <sf_dir> [cpus]
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1]
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F

    from etl_airflow_adventureworks_spark.operators.funnel import (
        funnel_counts,
        ordered_funnel,
        transition_matrix,
    )
    from etl_airflow_adventureworks_spark.operators.timeseries import (
        bucketize,
        cohort_retention,
        gapfill,
    )
    from etl_airflow_adventureworks_spark.session import get_spark
    from etl_airflow_adventureworks_spark.sources import load_table

    spark = get_spark(app_name="evt-analytics", cpus=cpus,
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()

    def run_gapfill():
        # consume the filled columns — a bare count() would let Catalyst
        # prune the locf windows away (same note as run_rolling)
        s = bucketize(ev, "ts", 3600).groupBy("user_id", "bucket_ts").agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
        return gapfill(
            s, ["user_id"], "bucket_ts", 3600, ["n", "sv"], fill="locf"
        ).selectExpr("sum(n) AS s", "sum(sv) AS v").first()["s"]

    def run_cohort():
        return cohort_retention(ev, "user_id", "ts", 86400).selectExpr(
            "sum(n_active) AS s", "sum(retention) AS r"
        ).first()["s"]

    def run_funnel():
        f = ordered_funnel(ev, "user_id", "ts", "event_type",
                           ["signup", "view", "click", "purchase"],
                           within_seconds=48 * 3600)
        return funnel_counts(f, 4).first()[0]

    def run_transitions():
        return transition_matrix(ev, "user_id", "ts", "event_type",
                                 "event_id").count()

    def run_rolling():
        from etl_airflow_adventureworks_spark.operators.timeseries import (
            rolling_agg,
        )

        base = ev.selectExpr("user_id", "event_id", "unix_micros(ts) AS us",
                             "value")
        # consume the windowed columns — a bare count() would let
        # Catalyst prune the window evaluation away entirely
        return rolling_agg(
            base, ["user_id"], "us",
            {"n_24h": ("count", "event_id"), "avg_24h": ("avg", "value")},
            preceding=24 * 3600 * 1_000_000,
        ).selectExpr("sum(n_24h) AS s", "sum(avg_24h) AS a").first()["s"]

    ops = {"gapfill_locf_1h": run_gapfill, "cohort_retention_1d": run_cohort,
           "ordered_funnel_4step": run_funnel,
           "transition_matrix": run_transitions,
           "rolling_24h": run_rolling}
    out = {"metric": "event_analytics_ops", "sf_dir": sf_dir,
           "n_events": n_events, "cpus": cpus,
           "protocol": "1 warmup + median-of-3, fresh JVM per sf"}
    for name, fn in ops.items():
        fn()  # warmup
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            reps.append(round(time.perf_counter() - t0, 3))
        out[name] = statistics.median(reps)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
