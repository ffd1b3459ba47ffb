"""Measure GROUP-LOCAL rollup refresh vs full rebuild after an UPSERT
window on a spec with non-retractable measures (r12, VERDICT r11 #1).

Pre-r12, any rewrite window on a spec containing min/max/approx_distinct
forced a full rebuild per refresh — the last full-scan-per-epoch cost
cliff in the maintenance layer. The group-local path re-aggregates ONLY
the change-feed-named groups from the source snapshot (stats-pruned to
the files whose recorded dim range admits a touched key when the source
is dim-clustered) and splices them into the untouched rollup rows.

Protocol: events at $1 (default .scale/sf1) keyed by event_id, rollup
over (event_type_id, day) with count + min + max + HLL measures. The
source is committed CLUSTERED by the leading dim (event_type_id,
range-partition + sort, per-file stats) — the layout a production
continuous aggregate would keep. The maintenance window UPSERTs ~1% of
rows touching ONE group. Refresh is timed twice from identical states:

  group_local:  touched-group re-aggregate + splice (the r12 operator)
  full_rebuild: re-aggregate the whole source (the pre-r12 behavior)

Results asserted equal before the ratio is reported — count/min/max
BIT-equal; HLL within the 2% topology band for untouched groups (the
documented DataSketches contract; touched groups are recomputed from
scratch on both paths). Medians of 3, fresh state per rep.

Run on an idle machine: python tools/measure_group_local_refresh.py [sf_dir]
"""

from __future__ import annotations

import json
import shutil
import statistics
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from etl_airflow_adventureworks_spark.operators.rollup import (  # noqa: E402
    finalize_rollup,
    refresh_rollup,
)
from etl_airflow_adventureworks_spark.session import get_spark  # noqa: E402
from etl_airflow_adventureworks_spark.table import VersionedTable  # noqa: E402

# leading dim = a NUMERIC clustered column so the manifest's per-file
# stats can prune the touched-group source read (bare-column dims only)
DIMS = [
    "event_type_id",
    "CAST(unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000 AS BIGINT) AS day",
]
MEASURES = {
    "n_events": ("count", None),
    "min_value": ("min", "value"),
    "max_value": ("max", "value"),
    "n_users": ("approx_distinct", "user_id"),
}


def snap(spark, roll_path):
    df = finalize_rollup(VersionedTable(spark, roll_path).read(), MEASURES)
    rows = df.select(
        "event_type_id", "day", "n_events", "min_value", "max_value",
        "n_users",
    ).collect()
    return tuple(sorted(
        (r["event_type_id"], r["day"], r["n_events"],
         round(r["min_value"], 9), round(r["max_value"], 9), r["n_users"])
        for r in rows
    ))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else f"{REPO}/.scale/sf1"
    work = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/gl_measure")
    shutil.rmtree(work, ignore_errors=True)
    spark = get_spark(app_name="measure-group-local", cpus=32,
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    # a numeric 16-ary leading dim derived from event_id (events has too
    # few distinct event_type strings to fill 16 hash buckets) so per-file
    # stats exist for the pruning path being measured
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "event_id",
        "ts",
        "abs(pmod(xxhash64(event_id), 16)) AS event_type_id",
        "value",
        "user_id",
    )
    n_rows = ev.count()
    src0 = str(work / "src0")
    roll0 = str(work / "roll0")
    VersionedTable(spark, src0).commit(
        ev.repartitionByRange(32, "event_type_id", "event_id")
        .sortWithinPartitions("event_type_id", "event_id"),
        stats_cols=["event_type_id", "event_id"],
    )
    refresh_rollup(spark, src0, roll0, DIMS, MEASURES)  # bootstrap (untimed)

    # maintenance window: ~1% of ONE group's rows get new values (moves
    # min/max), touching exactly one leading-dim group
    batch = (
        spark.read.parquet(f"{src0}/data/*")  # the clustered snapshot
        .filter("event_type_id = 7 AND pmod(event_id, 37) = 0")
        .withColumn("value", F.col("value") + F.lit(1000.0))
    ).localCheckpoint(eager=True)
    n_batch = batch.count()

    results, metrics = {}, {}
    for mode in ("group_local", "full_rebuild"):
        times = []
        for rep in range(3):
            src = str(work / f"src_{mode}_{rep}")
            roll = str(work / f"roll_{mode}_{rep}")
            shutil.copytree(src0, src)
            shutil.copytree(roll0, roll)
            VersionedTable(spark, src).upsert(batch, key="event_id")
            t0 = time.perf_counter()
            refresh_rollup(
                spark, src, roll, DIMS, MEASURES,
                full_rebuild=(mode == "full_rebuild"),
            )
            times.append(time.perf_counter() - t0)
            results.setdefault(f"{mode}_chk", snap(spark, roll))
            if mode == "group_local":
                metrics = VersionedTable(spark, roll).manifest()["op"]
        results[mode] = round(statistics.median(times), 3)
        results[f"{mode}_runs"] = [round(t, 3) for t in times]
    assert metrics.get("mode") == "group_local", metrics
    a = dict(((r[0], r[1]), r[2:]) for r in results["group_local_chk"])
    b = dict(((r[0], r[1]), r[2:]) for r in results["full_rebuild_chk"])
    assert set(a) == set(b), "rollup key sets diverged"
    max_hll_rel = 0.0
    for k in a:
        (n_a, mn_a, mx_a, hll_a), (n_b, mn_b, mx_b, hll_b) = a[k], b[k]
        assert (n_a, mn_a, mx_a) == (n_b, mn_b, mx_b), (
            f"exact measures diverged at {k}: {a[k]} vs {b[k]}"
        )
        max_hll_rel = max(max_hll_rel, abs(hll_a - hll_b) / max(hll_b, 1))
    assert max_hll_rel <= 0.02, f"HLL beyond error band: {max_hll_rel}"
    out = {
        "sf_dir": sf_dir,
        "events_rows": n_rows,
        "upsert_rows": n_batch,
        "groups_touched": metrics.get("groups_touched"),
        "files_read": metrics.get("files_read"),
        "files_total": metrics.get("files_total"),
        "group_local_s": results["group_local"],
        "full_rebuild_s": results["full_rebuild"],
        "speedup": round(results["full_rebuild"] / results["group_local"], 2),
        "exact_measures_equal": True,
        "hll_max_rel_diff": round(max_hll_rel, 5),
        "runs": {
            "group_local": results["group_local_runs"],
            "full_rebuild": results["full_rebuild_runs"],
        },
    }
    print(json.dumps(out, indent=1))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
