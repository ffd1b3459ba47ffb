"""Measure the copy-on-write keyed rollup refresh (r15, VERDICT r14 #1)
against the classic full-state overwrite it replaces.

The r14 measurement ("Measured and rejected", SCALING.md) showed every
refresh mode's cost was dominated by the O(rollup) state WRITE the
overwrite contract required — a touched-only merge ("splice") with the
same overwrite commit came out 1.47-1.51x SLOWER. merge_keyed removes
the overwrite contract itself: untouched rollup FILES are carried
verbatim, so the write shrinks to the files containing touched groups.
This tool measures exactly that claim:

  - per-entity rollup (event_id: the rollup IS a big table) at each
    given events scale, key-clustered (optimize cluster_by) after
    bootstrap so file pruning has disjoint ranges;
  - maintenance window: a contiguous ~1% entity range UPSERTED on the
    source (a recorded rewrite -> retract-mode refresh) + a batch of
    unseen entities appended — mutated ONCE per scale; each rep
    restores only the ROLLUP and re-refreshes from identical state;
  - legs: cow=False (classic overwrite) vs cow=True (merge_keyed),
    results asserted content-equal to each other AND to a from-scratch
    rebuild before any timing is trusted;
  - SKEW leg (worst case): the same window size but touched entities
    SPREAD uniformly across the whole key range, so every rollup file
    contains a touched group — CoW degenerates to rewriting everything
    plus its probe chain; measured honestly, not hidden.

Expectation at scale: classic grows with rollup size (the write),
CoW stays ~flat in rollup size for a fixed touched-group count
(probe + touched-file write), crossing over once the rollup outweighs
the probe chain's fixed cost — COW_REFRESH_MIN_BYTES records the
measured break-even.

Run on an idle machine:
    python tools/measure_cow_refresh.py [sf_dir ...] [--work DIR]
    # default scales: /root/testdata/sf0.1 .scale/sf1 .scale/sf10
"""

from __future__ import annotations

import json
import os
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
)

DIMS = ["event_id AS entity_id"]
MEASURES = {"n_events": ("count", None), "sum_value": ("sum", "value")}
#: --wide: a realistic per-entity stats rollup (count + 12 sums, each
#: with its hidden non-null counter -> 26 stored aggregate columns,
#: ~200 B/group) — the "rollup IS a big table" shape where the classic
#: overwrite's O(rollup) write actually dominates; the narrow 2-measure
#: spec above is fixed-cost-bound at every local scale (measured r15)
MEASURES_WIDE = {"n_events": ("count", None)}
MEASURES_WIDE.update({
    f"s{i}": ("sum", f"value * {i + 1}") for i in range(12)
})
REPS = 3


def snap(spark, path, measures, exact=True):
    """Order-insensitive content fingerprint (count + hash-sum over all
    measure columns) — never a driver collect of a millions-of-rows
    rollup. ``exact=False`` rounds double sums to 6 dp: an incremental
    double SUM differs from a from-scratch rebuild in the last ulp
    (reassociation — the operator docstring's documented bound), so the
    vs-rebuild gate compares rounded while classic-vs-cow compares
    bit-exact (same merge algebra, same parts)."""
    def col(m):
        if exact:
            return f"cast({m} AS string)"
        return f"cast(round(cast({m} AS double), 6) AS string)"
    cols = ", ".join(col(m) for m in ["entity_id", *measures])
    r = VersionedTable(spark, path).read().selectExpr(
        "count(*) AS n",
        f"bit_xor(xxhash64({cols})) AS h",
    ).first()
    return (r["n"], r["h"])


def restore(backup: str, live: str) -> None:
    shutil.rmtree(live, ignore_errors=True)
    shutil.copytree(backup, live)


def measure_scale(spark, sf_dir: str, work: Path, measures) -> dict:
    shutil.rmtree(work, ignore_errors=True)
    work.mkdir(parents=True)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "value"
    )
    n_rows = ev.count()
    # FIXED paths for source and the refreshed rollup: the r14
    # source-identity check (rightly) refuses a relocated source, so
    # window mutations restore-then-mutate IN PLACE
    src = str(work / "src")
    src_pristine = str(work / "src_pristine")
    roll = str(work / "roll")
    roll0 = str(work / "roll_live")
    VersionedTable(spark, src).commit(ev.repartition(32))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        refresh_rollup(spark, src, roll, DIMS, measures)       # bootstrap
    rt = VersionedTable(spark, roll)
    rt.optimize(cluster_by=["entity_id"], num_files=32)
    n_groups = rt.read().count()
    roll_bytes = rt.visible_bytes()
    n_files = len(rt.manifest()["files"])
    shutil.copytree(src, src_pristine)

    # window shapes, both a FIXED ~2000 touched entities + 2000 unseen
    # appends at EVERY scale — the flat-vs-linear claim is "refresh
    # wall time flat in ROLLUP size for a fixed touched-group count",
    # so the window must not grow with the corpus:
    #   contiguous — the clustered-maintenance case (prunes to ~1 file)
    #   spread     — worst case: every file contains a touched entity
    w_frac = max(2000.0 / max(n_groups, 1), 1e-6)
    stats_row = spark.read.parquet(f"{src_pristine}/data/*").selectExpr(
        "max(event_id) AS hi",
        f"percentile_approx(event_id, array(0.40, {0.40 + w_frac}),"
        " 100000) AS cuts",
    ).first()
    hi = stats_row["hi"]
    cut0, cut1 = (int(c) for c in stats_row["cuts"])
    stride = max(n_groups // 2000, 1)
    base = spark.read.parquet(f"{src_pristine}/data/*")
    windows = {
        "contiguous": base.filter(
            f"event_id >= {cut0} AND event_id < {cut1}"),
        "spread": base.filter(f"event_id % {stride} = 0"),
    }
    out: dict = {
        "sf_dir": sf_dir,
        "events_rows": n_rows,
        "rollup_groups": n_groups,
        "rollup_bytes": roll_bytes,
        "rollup_files": n_files,
        "windows": {},
    }
    for wname, wdf in windows.items():
        upsert = wdf.withColumn(
            "value", F.col("value") + F.lit(1000.0)
        ).localCheckpoint(eager=True)
        append = upsert.limit(2000).selectExpr(
            f"event_id + {hi + 1000} AS event_id", "value",
        ).localCheckpoint(eager=True)
        n_window = upsert.count() + append.count()

        # mutate the SOURCE once per window (restored pristine IN PLACE
        # — same path, the identity check's contract); each timed rep
        # restores only the rollup (the refresh is what's measured)
        restore(src_pristine, src)
        t = VersionedTable(spark, src)
        t.upsert(upsert, key="event_id")
        t.commit(append, mode="append")

        times: dict[str, list[float]] = {"classic": [], "cow": []}
        states = {}
        ops = {}
        for _rep in range(REPS):
            for tag, cow in (("classic", False), ("cow", True)):
                restore(roll, roll0)
                t0 = time.perf_counter()
                with warnings.catch_warnings():
                    warnings.simplefilter("ignore")
                    refresh_rollup(spark, src, roll0, DIMS, measures,
                                   cow=cow)
                times[tag].append(time.perf_counter() - t0)
                if tag not in states:
                    states[tag] = snap(spark, roll0, measures)
                    states[tag + "_r"] = snap(spark, roll0, measures,
                                              exact=False)
                    ops[tag] = {
                        k: v for k, v in
                        VersionedTable(spark, roll0).manifest()["op"]
                        .items() if k != "source"
                    }
        # equality gate: classic == cow == from-scratch rebuild
        rebuild = str(work / "rebuild")
        shutil.rmtree(rebuild, ignore_errors=True)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            refresh_rollup(spark, src, rebuild, DIMS, measures)
        ref = snap(spark, rebuild, measures, exact=False)
        assert states["classic"] == states["cow"], (wname, states)
        assert states["classic_r"] == states["cow_r"] == ref, (
            wname, states, ref)
        med = {k: round(statistics.median(v), 3) for k, v in times.items()}
        out["windows"][wname] = {
            "window_rows": n_window,
            "classic_s": med["classic"],
            "cow_s": med["cow"],
            "speedup": round(med["classic"] / med["cow"], 2),
            "cow_op": ops["cow"],
            "equal_to_rebuild": True,
            "runs": {k: [round(x, 3) for x in v]
                     for k, v in times.items()},
        }
        print(json.dumps({wname: out["windows"][wname]}), flush=True)
    shutil.rmtree(work, ignore_errors=True)
    return out


def main() -> None:
    wide = "--wide" in sys.argv
    measures = MEASURES_WIDE if wide else MEASURES
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dirs = args or [
        "/root/testdata/sf0.1", f"{REPO}/.scale/sf1", f"{REPO}/.scale/sf10"
    ]
    work = Path("/tmp/cow_measure")
    spark = get_spark(app_name="measure-cow-refresh", cpus=32,
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    for sf in sf_dirs:
        if not os.path.isdir(sf):
            print(f"skip {sf}: not found", file=sys.stderr)
            continue
        results.append(measure_scale(spark, sf, work, measures))
    print(json.dumps({
        "load1": os.getloadavg()[0],
        "spec": "wide" if wide else "narrow",
        "scales": results,
    }, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
