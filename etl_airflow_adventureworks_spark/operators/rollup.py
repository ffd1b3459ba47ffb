"""Incremental rollup refresh — continuous aggregates maintained from
the VersionedTable change feed at delta cost.

The materialized-view shape every event warehouse runs: a rollup table
(`dims × additive measures`) kept current as the source table receives
appends. A naive refresh re-aggregates the WHOLE source per run; at
100 TB that is the difference between a refresh that reads yesterday's
partition and one that reads the lake. This operator does the
incremental algebra instead:

    delta   = source.changes(v_reflected)          # ONLY the new files
    partial = delta.groupBy(dims).agg(measures)    # delta-sized
    rollup' = re-agg( current_rollup ∪ partial )   # rollup-sized merge

which is exact for DECOMPOSABLE aggregates — count/sum re-merge with
SUM, min/max with MIN/MAX (avg = sum+count, derived at read time).
COUNT DISTINCT is not decomposable, which is the classic continuous-
aggregate limitation; the ``approx_distinct`` measure closes it with
the mergeable form: the rollup stores a DataSketches HLL sketch
(binary) per (dims) row — `hll_sketch_agg` on the delta, `hll_union_agg`
on the merge — and `finalize_rollup` projects point estimates at read
time. Sketch union is register-wise max, so the incremental estimate
EQUALS the from-scratch estimate (order-insensitive), at the usual HLL
error vs the true distinct count (~1.6% rsd at the default lgK=12).
"Exact" means up to SUM's reassociation: integer and decimal sums are
bit-identical to a from-scratch aggregate; double sums can differ in
the last ulp because incremental merging changes the addition order
(sum money as exact decimal — `functions/money.py` — if that matters). The
version of the source each rollup state reflects rides in the rollup
commit's idempotency token (`rollup-of:v<N>`), so refresh is
self-describing, idempotent when already current, and crash-safe: a
refresh that dies before its commit leaves the old token, and the
retry recomputes the same delta.

If the source history was rewritten in the window with a rowset
change (overwrite / matched upsert / delete), `changes` fails loud;
pass ``full_rebuild=True`` to re-aggregate from the current snapshot
(same result, full-scan cost). A pure COMPACTION (`optimize`) is
rowset-preserving and the feed skips it since r9, so continuous
refresh survives periodic OPTIMIZE with no rebuild
(tests/test_rollup.py::test_refresh_survives_optimize_reading_only_the_delta).

No reference counterpart (the reference recomputes KPIs from scratch
per run — `KPIs.sql` over the whole warehouse); this is the charter's
scale posture applied to exactly that recompute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..table import VersionedTable

#: measure fn -> (per-delta aggregate, merge aggregate); the measured
#: column is an arbitrary SQL expression (e.g. "length(text)")
_FNS = {
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "sum": (lambda c: F.sum(F.expr(c)), F.sum),
    "min": (lambda c: F.min(F.expr(c)), F.min),
    "max": (lambda c: F.max(F.expr(c)), F.max),
    # mergeable COUNT DISTINCT: the rollup row holds the HLL sketch
    # (binary); estimates are projected by finalize_rollup at read time
    "approx_distinct": (
        lambda c: F.hll_sketch_agg(F.expr(c)),
        F.hll_union_agg,
    ),
}


def finalize_rollup(df: DataFrame, measures: dict) -> DataFrame:
    """Project read-time values from a rollup's mergeable state: every
    ``approx_distinct`` sketch column becomes its point estimate (long);
    all other measures are already final. Keep the STORED rollup in
    sketch form — estimating is lossy and kills mergeability."""
    out = df
    for name, (fn, _col) in measures.items():
        if fn == "approx_distinct":
            out = out.withColumn(name, F.hll_sketch_estimate(F.col(name)))
    return out


def _aggregate(df: DataFrame, dims: list[str], measures: dict) -> DataFrame:
    aggs = [
        _FNS[fn][0](col).alias(name) for name, (fn, col) in measures.items()
    ]
    return df.groupBy(*[F.expr(d) for d in dims]).agg(*aggs)


def _merge(parts: DataFrame, dim_names: list[str], measures: dict) -> DataFrame:
    aggs = [
        _FNS[fn][1](name).alias(name) for name, (fn, _col) in measures.items()
    ]
    return parts.groupBy(*dim_names).agg(*aggs)


def _reflected_version(rollup: VersionedTable) -> int | None:
    man = rollup.manifest()
    if man is None:
        return None
    token = man.get("token") or ""
    if not token.startswith("rollup-of:v"):
        raise ValueError(
            f"{rollup.path} is not a rollup table (token {token!r}); "
            "refresh_rollup only maintains tables it created"
        )
    return int(token[len("rollup-of:v"):])


def refresh_rollup(
    spark: SparkSession,
    source_path: str,
    rollup_path: str,
    dims: list[str],
    measures: dict[str, tuple[str, str | None]],
    full_rebuild: bool = False,
) -> int:
    """Bring the rollup at ``rollup_path`` up to the source's latest
    version and return the rollup version committed (or current).

    ``dims`` are SQL expressions (aliased ones become the rollup's key
    columns — e.g. ``["event_type", "date_trunc('hour', ts) AS hour"]``);
    ``measures`` maps output column -> (fn, source column), fn one of
    count/sum/min/max/approx_distinct (col ignored for count;
    approx_distinct stores a mergeable HLL sketch — read through
    ``finalize_rollup``). First call bootstraps
    from the full source snapshot; later calls read ONLY the delta files
    plus the current rollup. Refreshing an already-current rollup is a
    no-op returning the existing version.
    """
    for name, (fn, _col) in measures.items():
        if fn not in _FNS:
            raise ValueError(f"measure {name}: fn must be one of {sorted(_FNS)}")
        if fn == "approx_distinct" and not _col:
            raise ValueError(f"measure {name}: approx_distinct needs a column")
    src = VersionedTable(spark, source_path)
    roll = VersionedTable(spark, rollup_path)
    src_latest = src.manifest()
    if src_latest is None:
        raise FileNotFoundError(f"no committed source at {source_path}")
    v_src = src_latest["version"]
    token = f"rollup-of:v{v_src}"

    reflected = _reflected_version(roll)
    if reflected == v_src:
        return roll.manifest()["version"]
    if reflected is None or full_rebuild:
        state = _aggregate(src.read(), dims, measures)
        return roll.commit(state, mode="overwrite", idempotency_token=token)

    delta = src.changes(reflected, v_src)  # fails loud across rewrites
    partial = _aggregate(delta, dims, measures)
    dim_names = partial.columns[: len(dims)]
    current = roll.read()
    merged = _merge(
        current.unionByName(partial), dim_names, measures
    ).localCheckpoint(eager=True)  # don't derive the new files from a
    # plan that still reads the rollup version being replaced
    return roll.commit(merged, mode="overwrite", idempotency_token=token)
