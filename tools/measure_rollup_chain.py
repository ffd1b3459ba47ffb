"""Measure the continuous-aggregate CHAIN cost (r14): with the rollup
recording its OWN change rows at refresh time (commit(changes_df=...)),
a replica OF the rollup syncs from the recorded delta instead of
re-seeding from the whole rollup — and the recording itself must stay a
small, delta-sized overhead on the refresh.

Why it matters at 100 TB: a high-cardinality rollup (per-user, per-SKU)
is itself a big table. Pre-r14 every downstream sync after a refresh
either failed loud or re-read ALL of it (`full_copy=True`); the recorded
delta makes the downstream read ∝ touched groups, the same flat-vs-linear
argument as every other incremental path in SCALING.md.

Protocol (the measure_group_local_refresh.py discipline; pristine state
restored INTO the same absolute paths per rep — the r14 source-identity
check refuses relocated source/rollup pairs):
  - events at $1 (default .scale/sf1, ~1M rows), rollup keyed
    per-ENTITY (event_id: 1M groups — the rollup IS a big table), the
    replica key-clustered after seeding;
  - maintenance window: a contiguous ~1% entity range rewritten + a
    batch of unseen entities, then ONE refresh (retract mode, changes
    recorded);
  - A: replica sync from the recorded delta vs B: full_copy re-seed —
    fresh replica state per rep, results asserted EQUAL first;
  - C: the refresh itself with record_changes=True vs False from
    identical pre-states — the overhead of recording.
Medians of 3.

Run on an idle machine:
    python tools/measure_rollup_chain.py [sf_dir] [workdir]
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
from etl_airflow_adventureworks_spark.table import (  # noqa: E402
    VersionedTable,
    replicate_table,
)

# per-ENTITY aggregate: the high-cardinality shape where the rollup is
# itself a big table (1M groups at sf1) — the case the recorded delta
# exists for; the replica is clustered on the key after seeding (the
# same key-clustered discipline as the r11 index-sync measurement), so
# the CDC apply's copy-on-write touches ∝ changed files
DIMS = ["event_id AS entity_id"]
MEASURES = {"n_events": ("count", None), "sum_value": ("sum", "value")}


def snap(spark, path):
    """Order-insensitive content fingerprint (count + hash-sum) — the
    rollup/replica can be millions of rows, so a driver collect would
    dominate the measurement it guards."""
    r = VersionedTable(spark, path).read().selectExpr(
        "count(*) AS n",
        "bit_xor(xxhash64(entity_id, n_events, cast(sum_value AS"
        " string))) AS h",
    ).first()
    return (r["n"], r["h"])


def restore(backup: str, live: str) -> None:
    shutil.rmtree(live, ignore_errors=True)
    shutil.copytree(backup, live)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else f"{REPO}/.scale/sf1"
    work = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/chain_measure")
    shutil.rmtree(work, ignore_errors=True)
    work.mkdir(parents=True)
    spark = get_spark(app_name="measure-rollup-chain", cpus=32,
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "value"
    )
    n_rows = ev.count()
    src = str(work / "src")
    roll = str(work / "roll")
    repl = str(work / "repl")
    src0, roll0, repl0 = (str(work / f"{n}0") for n in ("src", "roll", "repl"))
    VersionedTable(spark, src).commit(ev.repartition(32))
    refresh_rollup(spark, src, roll, DIMS, MEASURES)           # bootstrap
    replicate_table(spark, roll, repl, key="entity_id")        # seed
    # cluster the replica on its key (r14: an OPTIMIZE no longer bricks
    # replication) so the CDC apply prunes to the touched files
    VersionedTable(spark, repl).optimize(
        cluster_by=["entity_id"], num_files=32)
    n_groups = VersionedTable(spark, roll).read().count()
    for live, backup in ((src, src0), (roll, roll0), (repl, repl0)):
        shutil.copytree(live, backup)

    # maintenance window: a CONTIGUOUS ~1% entity range rewritten (the
    # clustered-maintenance shape) + unseen entities appended
    stats_row = spark.read.parquet(f"{src}/data/*").selectExpr(
        "max(event_id) AS hi",
        "percentile_approx(event_id, array(0.40, 0.41), 10000) AS cuts",
    ).first()
    hi = stats_row["hi"]
    cut0, cut1 = (int(c) for c in stats_row["cuts"])
    upsert = (
        spark.read.parquet(f"{src}/data/*")
        .filter(f"event_id >= {cut0} AND event_id < {cut1}")
        .withColumn("value", F.col("value") + F.lit(1000.0))
    ).localCheckpoint(eager=True)
    append = upsert.limit(2000).selectExpr(
        f"event_id + {hi + 1000} AS event_id",
        "value",
    ).localCheckpoint(eager=True)
    n_window = upsert.count() + append.count()

    # C: refresh cost — classic merge without vs with change recording;
    # identical pre-states per rep. (A touched-group "spliced" merge was
    # prototyped and measured 1.47x/1.51x SLOWER at 1M/10M groups — the
    # rollup-sized state WRITE dominates, which no merge shape avoids —
    # so the classic single merge stays; see rollup.py's merge note.)
    legs = (
        ("without", dict(record_changes=False)),
        ("with", dict(record_changes=True)),  # last: the surviving state
        # must carry recorded changes for the sync legs below
    )
    refresh_times: dict[str, list[float]] = {t: [] for t, _ in legs}
    for rep in range(3):
        for tag, kw in legs:
            restore(src0, src)
            restore(roll0, roll)
            t = VersionedTable(spark, src)
            t.upsert(upsert, key="event_id")
            t.commit(append, mode="append")
            t0 = time.perf_counter()
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")  # size advisory, not timed
                refresh_rollup(spark, src, roll, DIMS, MEASURES, **kw)
            refresh_times[tag].append(time.perf_counter() - t0)

    # the surviving roll state has the recorded delta the syncs consume
    changed = VersionedTable(spark, roll).row_changes(1).select(
        "entity_id").distinct().count()

    sync_times: dict[str, list[float]] = {"delta": [], "full_copy": []}
    checks = {}
    for rep in range(3):
        for tag, full in (("delta", False), ("full_copy", True)):
            restore(repl0, repl)
            t0 = time.perf_counter()
            replicate_table(spark, roll, repl, key="entity_id",
                            full_copy=full)
            sync_times[tag].append(time.perf_counter() - t0)
            checks.setdefault(tag, snap(spark, repl))
    assert checks["delta"] == checks["full_copy"], "replicas diverged"
    assert checks["delta"] == snap(spark, roll), "replica != rollup"

    med = {
        k: round(statistics.median(v), 3)
        for k, v in {**sync_times, **refresh_times}.items()
    }
    out = {
        "sf_dir": sf_dir,
        "events_rows": n_rows,
        "rollup_groups": n_groups,
        "window_rows": n_window,
        "changed_groups": changed,
        "replica_sync_delta_s": med["delta"],
        "replica_sync_full_copy_s": med["full_copy"],
        "sync_speedup": round(med["full_copy"] / med["delta"], 2),
        "refresh_with_changes_s": med["with"],
        "refresh_without_changes_s": med["without"],
        "record_overhead_ratio": round(med["with"] / med["without"], 2),
        "replicas_equal": True,
        "runs": {k: [round(x, 3) for x in v]
                 for k, v in {**sync_times, **refresh_times}.items()},
    }
    print(json.dumps(out, indent=1))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
