"""Measure GROUP-LOCAL rollup refresh vs full rebuild after an UPSERT
window on a spec with non-retractable measures (r12, VERDICT r11 #1;
expression-dim pruning r13, VERDICT r12 #1).

Pre-r12, any rewrite window on a spec containing min/max/approx_distinct
forced a full rebuild per refresh — the last full-scan-per-epoch cost
cliff in the maintenance layer. The group-local path re-aggregates ONLY
the change-feed-named groups from the source snapshot (stats-pruned to
the files whose recorded dim range admits a touched key) and splices
them into the untouched rollup rows.

Two shapes, each timed group_local vs full_rebuild from identical
states (results asserted equal FIRST — count/min/max bit-equal, HLL
within the 2% topology band):

  bare  — source clustered by a NUMERIC leading dim (event_type_id);
          the rollup's bare dim prunes directly on per-file stats (the
          r12 measurement, kept for continuity);
  expr  — source clustered by the raw TIMESTAMP; the rollup's ONLY dim
          is date_trunc('day', ts) — the canonical time-bucketed
          continuous aggregate — pruned by mapping each file's recorded
          ts [min, max] through the transform (r13). Pre-r13 this shape
          read EVERY file (no bare co-dim to prune through).

Protocol: events at $1 (default .scale/sf1), maintenance window UPSERTs
~1% of one group's / one day's rows. Medians of 3, fresh state per rep.

Run on an idle machine:
    python tools/measure_group_local_refresh.py [sf_dir] [workdir] [shape]
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

SHAPES = {
    # r12 shape: bare numeric leading dim, clustered on it
    "bare": {
        "dims": [
            "event_type_id",
            "CAST(unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000"
            " AS BIGINT) AS day",
        ],
        "cluster": ["event_type_id", "event_id"],
        "stats": ["event_type_id", "event_id"],
        "batch_filter": "event_type_id = 7 AND pmod(event_id, 37) = 0",
        "dim_cols": ["event_type_id", "day"],
    },
    # r13 shape: the canonical time-bucketed rollup — the ONLY dim is an
    # expression over the clustered timestamp; pruning must come from
    # the monotone transform mapping (auto-recognized date_trunc)
    "expr": {
        "dims": ["date_trunc('day', ts) AS day"],
        "cluster": ["ts", "event_id"],
        "stats": ["ts", "event_id"],
        # one day ≈ 1/ndays of rows; thin with pmod for ~1% of the table
        "batch_filter": None,  # derived from the data's min day below
        "dim_cols": ["day"],
    },
}
MEASURES = {
    "n_events": ("count", None),
    "min_value": ("min", "value"),
    "max_value": ("max", "value"),
    "n_users": ("approx_distinct", "user_id"),
}


def snap(spark, roll_path, dim_cols):
    df = finalize_rollup(VersionedTable(spark, roll_path).read(), MEASURES)
    rows = df.select(
        *dim_cols, "n_events", "min_value", "max_value", "n_users"
    ).collect()
    return tuple(sorted(
        (*[str(r[c]) for c in dim_cols], r["n_events"],
         round(r["min_value"], 9), round(r["max_value"], 9), r["n_users"])
        for r in rows
    ))


def measure_shape(spark, shape, sf_dir, work) -> dict:
    cfg = SHAPES[shape]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "event_id",
        "ts",
        "abs(pmod(xxhash64(event_id), 16)) AS event_type_id",
        "value",
        "user_id",
    )
    n_rows = ev.count()
    # pristine bytes restored INTO the same run paths each rep (r14:
    # refresh_rollup validates the rollup's recorded source identity, so
    # relocated per-rep copies of the pair would fail loud)
    src = str(work / f"src_run_{shape}")
    roll = str(work / f"roll_run_{shape}")
    src0 = str(work / f"src0_{shape}")
    roll0 = str(work / f"roll0_{shape}")
    VersionedTable(spark, src).commit(
        ev.repartitionByRange(32, *cfg["cluster"])
        .sortWithinPartitions(*cfg["cluster"]),
        stats_cols=cfg["stats"],
    )
    refresh_rollup(spark, src, roll, cfg["dims"], MEASURES)  # bootstrap
    shutil.copytree(src, src0)
    shutil.copytree(roll, roll0)

    bf = cfg["batch_filter"]
    if bf is None:
        # expr shape: touch ONE day (the 3rd day present in the data)
        day = spark.read.parquet(f"{src}/data/*").selectExpr(
            "date_trunc('day', ts) AS d"
        ).distinct().orderBy("d").collect()[2]["d"]
        bf = (f"date_trunc('day', ts) = timestamp'{day}'"
              " AND pmod(event_id, 7) = 0")
    batch = (
        spark.read.parquet(f"{src}/data/*")
        .filter(bf)
        .withColumn("value", F.col("value") + F.lit(1000.0))
    ).localCheckpoint(eager=True)
    n_batch = batch.count()

    results, metrics = {}, {}
    for mode in ("group_local", "full_rebuild"):
        times = []
        for rep in range(3):
            shutil.rmtree(src, ignore_errors=True)
            shutil.rmtree(roll, ignore_errors=True)
            shutil.copytree(src0, src)
            shutil.copytree(roll0, roll)
            VersionedTable(spark, src).upsert(batch, key="event_id")
            t0 = time.perf_counter()
            refresh_rollup(
                spark, src, roll, cfg["dims"], MEASURES,
                full_rebuild=(mode == "full_rebuild"),
            )
            times.append(time.perf_counter() - t0)
            results.setdefault(
                f"{mode}_chk", snap(spark, roll, cfg["dim_cols"])
            )
            if mode == "group_local":
                metrics = VersionedTable(spark, roll).manifest()["op"]
        results[mode] = round(statistics.median(times), 3)
        results[f"{mode}_runs"] = [round(t, 3) for t in times]
    assert metrics.get("mode") == "group_local", metrics
    nd = len(cfg["dim_cols"])
    a = dict((r[:nd], r[nd:]) for r in results["group_local_chk"])
    b = dict((r[:nd], r[nd:]) for r in results["full_rebuild_chk"])
    assert set(a) == set(b), "rollup key sets diverged"
    max_hll_rel = 0.0
    for k in a:
        (n_a, mn_a, mx_a, hll_a), (n_b, mn_b, mx_b, hll_b) = a[k], b[k]
        assert (n_a, mn_a, mx_a) == (n_b, mn_b, mx_b), (
            f"exact measures diverged at {k}: {a[k]} vs {b[k]}"
        )
        max_hll_rel = max(max_hll_rel, abs(hll_a - hll_b) / max(hll_b, 1))
    assert max_hll_rel <= 0.02, f"HLL beyond error band: {max_hll_rel}"
    return {
        "shape": shape,
        "dims": cfg["dims"],
        "events_rows": n_rows,
        "upsert_rows": n_batch,
        "groups_touched": metrics.get("groups_touched"),
        "files_read": metrics.get("files_read"),
        "files_total": metrics.get("files_total"),
        "group_local_s": results["group_local"],
        "full_rebuild_s": results["full_rebuild"],
        "speedup": round(
            results["full_rebuild"] / results["group_local"], 2
        ),
        "exact_measures_equal": True,
        "hll_max_rel_diff": round(max_hll_rel, 5),
        "runs": {
            "group_local": results["group_local_runs"],
            "full_rebuild": results["full_rebuild_runs"],
        },
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else f"{REPO}/.scale/sf1"
    work = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/gl_measure")
    shapes = ([sys.argv[3]] if len(sys.argv) > 3 else list(SHAPES))
    shutil.rmtree(work, ignore_errors=True)
    spark = get_spark(app_name="measure-group-local", cpus=32,
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    out = {"sf_dir": sf_dir,
           "shapes": [measure_shape(spark, s, sf_dir, work) for s in shapes]}
    print(json.dumps(out, indent=1))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
