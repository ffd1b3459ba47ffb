"""Measure retraction-consuming rollup refresh vs full rebuild (r10).

The r9 measurement (tools/measure_rollup_refresh.py) covered APPEND
deltas; r10's row-level change feed lets the refresh survive an UPSERT
— the workload every CDC-fed table runs — by consuming retractions
(update_preimage/delete subtract, update_postimage/insert add). This
tool times exactly that case:

  events at $1 (default .scale/sf1) committed whole; a rollup over
  (event_type, day) with the RETRACTABLE measure set — count, decimal
  sum, 64-bin value histogram — is bootstrapped. An upsert batch then
  MUTATES ~5% of rows (event_type and value change, so rows LEAVE one
  group and ENTER another) and INSERTS ~5% new rows. The refresh is
  timed twice from identical starting states:

    incremental:  row_changes (change files only) + signed partial +
                  rollup-sized merge (the r10 operator path)
    full_rebuild: re-aggregate the whole source

  All measures are retractable, so the two results are asserted
  BIT-EQUAL (integer counts, decimal sums, integer histogram bins —
  commutative merges) before any ratio is reported. The upsert itself
  is timed once per rep as context: the change-file recording cost
  rides the upsert (delta-sized), not the refresh.

Wall times are medians of 3 (state rebuilt per rep via fresh copies).
Run on an idle machine: python tools/measure_retraction_refresh.py [sf_dir]
"""

from __future__ import annotations

import json
import shutil
import statistics
import sys
import time
import warnings
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from etl_airflow_adventureworks_spark.operators.rollup import (  # noqa: E402
    refresh_rollup,
)
from etl_airflow_adventureworks_spark.session import get_spark  # noqa: E402
from etl_airflow_adventureworks_spark.table import VersionedTable  # noqa: E402

DIMS = [
    "event_type",
    "CAST(unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000 AS BIGINT) AS day",
]
#: retractable-only set — min/max/HLL would (correctly) force a rebuild
MEASURES = {
    "n_events": ("count", None),
    "sum_value": ("sum", "CAST(value AS DECIMAL(18,6))"),
    "h_value": ("histogram", ("value", 0.0, 120.0, 64)),
}


def snap(spark, roll_path):
    rows = VersionedTable(spark, roll_path).read().select(
        "event_type", "day", "n_events",
        F.col("sum_value").cast("string").alias("sum_value"), "h_value",
    ).collect()
    return tuple(sorted(
        (r["event_type"], r["day"], r["n_events"], r["sum_value"],
         tuple(r["h_value"]))
        for r in rows
    ))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else f"{REPO}/.scale/sf1"
    work = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/retraction_measure")
    shutil.rmtree(work, ignore_errors=True)
    spark = get_spark(app_name="measure-retraction", cpus=32,
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "ts", "event_type", "value"
    )
    n_total = ev.count()
    # the upsert batch: ~5% mutated in place (group-moving: new type,
    # shifted value) + ~5% brand-new rows
    mutated = (
        ev.filter("pmod(xxhash64(event_id), 20) = 0")
        .withColumn("event_type", F.lit("mutated"))
        .withColumn("value", F.col("value") + F.lit(7.0))
    )
    inserts = (
        ev.filter("pmod(xxhash64(event_id), 20) = 1")
        .withColumn("event_id", F.col("event_id") + F.lit(10_000_000_000))
    )
    batch = mutated.unionByName(inserts).localCheckpoint(eager=True)
    n_batch = batch.count()

    # pristine bytes restored INTO the same run paths each rep (r14:
    # refresh_rollup validates the rollup's recorded source identity, so
    # relocated per-rep copies of the pair would fail loud)
    src, roll = str(work / "src_run"), str(work / "roll_run")
    src0, roll0 = str(work / "src0"), str(work / "roll0")
    VersionedTable(spark, src).commit(ev.repartition(32))
    refresh_rollup(spark, src, roll, DIMS, MEASURES)  # bootstrap (untimed)
    shutil.copytree(src, src0)
    shutil.copytree(roll, roll0)

    results: dict = {}
    upsert_times = []
    for mode in ("incremental", "full_rebuild"):
        times = []
        for rep in range(3):
            shutil.rmtree(src, ignore_errors=True)
            shutil.rmtree(roll, ignore_errors=True)
            shutil.copytree(src0, src)
            shutil.copytree(roll0, roll)
            t0 = time.perf_counter()
            v_up = VersionedTable(spark, src).upsert(batch, key="event_id")
            upsert_times.append(time.perf_counter() - t0)
            man = VersionedTable(spark, src).manifest(v_up)
            results.setdefault("upsert_op", man["op"])
            t0 = time.perf_counter()
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")  # size advisory, not timed
                refresh_rollup(
                    spark, src, roll, DIMS, MEASURES,
                    full_rebuild=(mode == "full_rebuild"),
                )
            times.append(time.perf_counter() - t0)
            results.setdefault(f"{mode}_chk", snap(spark, roll))
        results[mode] = round(statistics.median(times), 3)
        results[f"{mode}_runs"] = [round(t, 3) for t in times]
    assert results["incremental_chk"] == results["full_rebuild_chk"], (
        "retraction-consuming refresh diverged from the from-scratch "
        "aggregate — the speed ratio would be meaningless"
    )
    out = {
        "sf_dir": sf_dir,
        "events_total": n_total,
        "upsert_batch_rows": n_batch,
        "upsert_op": results["upsert_op"],
        "upsert_s_median": round(statistics.median(upsert_times), 3),
        "incremental_s": results["incremental"],
        "full_rebuild_s": results["full_rebuild"],
        "speedup": round(results["full_rebuild"] / results["incremental"], 2),
        "bit_equal": True,
        "runs": {
            "incremental": results["incremental_runs"],
            "full_rebuild": results["full_rebuild_runs"],
        },
    }
    print(json.dumps(out, indent=1))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
