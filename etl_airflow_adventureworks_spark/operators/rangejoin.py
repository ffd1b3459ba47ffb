"""Range (interval) join — points matched to the intervals containing them
— and its sibling ``interval_join`` (round 8): interval × interval overlap
with both sides exploded and a dedup-free meeting rule.

An operator Spark lacks natively (the charter names it beside the as-of
join). Expressed naively, ``points JOIN intervals ON p BETWEEN s AND e``
is a non-equi join: with a ``by`` key Spark runs it as an equi-join whose
range residual re-scans every same-key pair (quadratic in the hot key);
without one it plans BroadcastNestedLoopJoin — O(|P|·|I|) and undriveable
at 100 TB. The default plan here is the standard shard-bucketing rewrite
(the same family as Databricks' range-join binning and Flink's interval
join, built from public DataFrame primitives):

1. pick a shard width ``w`` on the point axis (``"auto"`` probes one
   AVG(interval length) aggregate — width ≈ mean length keeps the
   expected exploded copies per interval at ~2);
2. each interval explodes to the shards it covers
   (``sequence(g(start), g(end-1))`` for half-open bounds, with
   ``g = basis div w`` — ``div`` is monotone for any sign, and a step
   function with unit steps, so that sequence is EXACTLY the set of
   shards containing points of the interval: every true (point,
   interval) pair meets in the point's single shard, no pair meets
   twice, hence no post-join dedup);
3. points bucket to their one shard; ONE shuffle co-locates both sides
   on (by…, shard); the exact range predicate runs as the join residual
   inside each co-partition.

Shuffle volume is |points| + Σ(len/w + 1) interval copies; the residual
scans only same-shard candidates instead of same-key pairs. A pathological
interval spanning more than ``max_shards_per_interval`` shards fails loud
with the remedy (raise the width) rather than silently materializing a
million-row explode.

``range_join_naive`` is the readable non-equi twin the sharded default is
equality-tested against (`tests/test_rangejoin.py`), and the right plan
when one side is small enough to broadcast anyway.

No ``*_auto`` skew dispatcher here (unlike ``session_gap_auto``): the
sessionizer's sharded form costs a measured ~2x on uniform corpora, so a
probe can pay for itself — the sharded range join's only overhead is the
bounded interval explode (~2 copies at width = mean length) and it ties
the naive plan even on the uniform sf0.1 corpus, so there is no regime
where probing buys anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..sources import load_table

#: axis types the shard bucketing can map to integers (same set as
#: operators.asof — an interval join needs a real numeric axis)
_SHARDABLE = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
)


def _basis_expr(col: str, dtype: T.DataType):
    """Integer basis for an axis column: micros for timestamps, days for
    dates, the value itself for integers (same convention as asof_join)."""
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(F.col(col).cast("timestamp"))
    if isinstance(dtype, T.DateType):
        return F.datediff(F.col(col), F.lit("1970-01-01")).cast("long")
    return F.col(col).cast("long")


def _axis_type(df: DataFrame, col: str, side: str) -> T.DataType:
    dtype = dict(zip(df.columns, [f.dataType for f in df.schema.fields]))[col]
    if not isinstance(dtype, _SHARDABLE):
        raise ValueError(
            f"range_join: {side} axis column {col!r} has type "
            f"{dtype.simpleString()}; a range join needs a numeric, date, "
            "or timestamp axis (cast or derive a numeric order key first)"
        )
    return dtype


_RESERVED = {"__p_b", "__lo_b", "__hi_b", "__shard", "__s_b", "__e_b",
             "__rlo_b", "__rhi_b"}


def _validate_cols(points: DataFrame, intervals: DataFrame, by: list[str], suffix: str):
    """Collision check mirroring asof_join._validate: every interval
    column except the ``by`` keys surfaces with ``suffix``; a point column
    already bearing a suffixed name would silently shadow it, and a column
    named like an internal working column would be overwritten."""
    pcols = list(points.columns)
    ivals = [c for c in intervals.columns if c not in by]
    clash = {f"{c}{suffix}" for c in ivals} & set(pcols)
    if clash:
        raise ValueError(
            f"range_join: point column(s) {sorted(clash)} collide with the "
            f"suffixed interval output; pick a different suffix"
        )
    internal = _RESERVED & (set(pcols) | set(intervals.columns))
    if internal:
        raise ValueError(
            f"range_join: column(s) {sorted(internal)} collide with internal "
            "working names; rename them first"
        )
    return pcols, ivals


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_on: str,
    start: str,
    end: str,
    by: str | list[str] | None = None,
    how: str = "inner",
    suffix: str = "_iv",
    bounds: str = "[)",
    shard_width: int | str | None = "auto",
    max_shards_per_interval: int = 4096,
) -> DataFrame:
    """Join each point row to every interval row containing it.

    ``point_on``: axis column on ``points``; ``start``/``end``: axis
    columns on ``intervals`` (all three numeric, date, or timestamp —
    mixed kinds are fine as long as their integer bases are comparable,
    e.g. timestamp points against timestamp intervals). ``by``: optional
    equality key(s) present on both sides (standard join semantics: a
    NULL key never matches). ``bounds``: ``"[)"`` (default) or ``"[]"``.
    ``how``: ``"inner"`` or ``"left"`` (left keeps pointless… pointless
    points — points with no covering interval — null-extended).

    Interval columns surface with ``suffix`` (keys excluded). Intervals
    that are empty under ``bounds`` (end ≤ start for ``[)``, end < start
    for ``[]``) or have a NULL endpoint match nothing; points with a NULL
    axis match nothing (and survive null-extended under ``"left"``).

    ``shard_width``: ``"auto"`` (one AVG-length probe), an explicit int in
    basis units (micros/days/value — probe-free, the declared-query
    choice), or ``None`` for the naive non-equi plan."""
    by_keys = [by] if isinstance(by, str) else list(by or [])
    if how not in ("inner", "left"):
        raise ValueError(f"range_join: how={how!r}; use 'inner' or 'left'")
    if bounds not in ("[)", "[]"):
        raise ValueError(f"range_join: bounds={bounds!r}; use '[)' or '[]'")
    if shard_width is None:
        return range_join_naive(
            points, intervals, point_on, start, end,
            by=by_keys, how=how, suffix=suffix, bounds=bounds,
        )
    p_type = _axis_type(points, point_on, "point")
    s_type = _axis_type(intervals, start, "interval start")
    e_type = _axis_type(intervals, end, "interval end")
    pcols, ivals = _validate_cols(points, intervals, by_keys, suffix)

    s_basis = _basis_expr(start, s_type)
    e_basis = _basis_expr(end, e_type)
    if shard_width == "auto":
        # probe only intervals the join itself keeps (non-NULL endpoints,
        # non-empty under `bounds`): backward/empty intervals match nothing
        # but would drag the average toward the max(...,1) clamp and shred
        # the valid long intervals into thousands of shards
        adj_hi = e_basis - (1 if bounds == "[)" else 0)
        row = (
            intervals.where(s_basis.isNotNull() & (adj_hi >= s_basis))
            .agg(F.avg(e_basis - s_basis).alias("w"))
            .first()
        )
        width = max(int(row["w"]), 1) if row["w"] is not None else 1
    else:
        width = max(int(shard_width), 1)

    # last covered shard: g(end-1) for [), g(end) for [] — intervals whose
    # span is empty under `bounds` get hi < lo → sequence invalid, so they
    # are dropped up front (they can match nothing)
    iv = intervals.withColumn("__lo_b", s_basis).withColumn(
        "__hi_b", e_basis - (1 if bounds == "[)" else 0)
    )
    iv = iv.filter(F.col("__lo_b").isNotNull() & (F.col("__hi_b") >= F.col("__lo_b")))
    # fail-loud explosion guard BEFORE the sequence materializes: a caller
    # passing width=1micro over year-long intervals would otherwise build
    # ~3e13-element arrays per row; raise_error evaluates inside the
    # sequence bound so it cannot be optimized past
    n_shards = F.expr(f"(__hi_b div {width}) - (__lo_b div {width}) + 1")
    guarded_hi = F.when(
        n_shards <= max_shards_per_interval, F.expr(f"__hi_b div {width}")
    ).otherwise(
        F.expr(
            "CAST(raise_error(concat('range_join: an interval spans ', "
            f"CAST((__hi_b div {width}) - (__lo_b div {width}) + 1 AS STRING), "
            f"' shards (> max_shards_per_interval={max_shards_per_interval}); "
            "raise shard_width (basis units) or max_shards_per_interval')) "
            "AS BIGINT)"
        )
    )
    iv_sharded = iv.select(
        *by_keys,
        F.col("__lo_b"),
        F.col("__hi_b"),
        *[F.col(c).alias(f"{c}{suffix}") for c in ivals],
        F.explode(F.sequence(F.expr(f"__lo_b div {width}"), guarded_hi)).alias(
            "__shard"
        ),
    )

    p_basis = _basis_expr(point_on, p_type)
    pt = points.withColumn("__p_b", p_basis).withColumn(
        "__shard", F.expr(f"__p_b div {width}")
    )
    # the [] / [) distinction is already folded into __hi_b; the residual
    # is basis-inclusive on both ends of the adjusted span
    in_range = (F.col("__p_b") >= F.col("__lo_b")) & (F.col("__p_b") <= F.col("__hi_b"))
    cond = in_range
    for k in by_keys:
        cond = (pt[k] == iv_sharded[k]) & cond
    cond = (pt["__shard"] == iv_sharded["__shard"]) & cond
    joined = pt.join(iv_sharded, cond, how)
    return joined.select(
        *[pt[c] for c in pcols],
        *[iv_sharded[f"{c}{suffix}"] for c in ivals],
    )


def _sharded_interval_side(df, lo_b, hi_b, width, max_shards, keep_cols, op):
    """Filter to valid intervals (non-NULL endpoints, non-empty under the
    caller's bounds folding) and explode each to the shards it covers,
    guarded the same way range_join guards its interval side."""
    iv = df.withColumn("__lo_b", lo_b).withColumn("__hi_b", hi_b)
    iv = iv.filter(F.col("__lo_b").isNotNull() & (F.col("__hi_b") >= F.col("__lo_b")))
    n_shards = F.expr(f"(__hi_b div {width}) - (__lo_b div {width}) + 1")
    guarded_hi = F.when(
        n_shards <= max_shards, F.expr(f"__hi_b div {width}")
    ).otherwise(
        F.expr(
            f"CAST(raise_error(concat('{op}: an interval spans ', "
            f"CAST((__hi_b div {width}) - (__lo_b div {width}) + 1 AS STRING), "
            f"' shards (> max_shards_per_interval={max_shards}); "
            "raise shard_width (basis units) or max_shards_per_interval')) "
            "AS BIGINT)"
        )
    )
    return iv.select(
        *keep_cols,
        F.col("__lo_b"),
        F.col("__hi_b"),
        F.explode(F.sequence(F.expr(f"__lo_b div {width}"), guarded_hi)).alias(
            "__shard"
        ),
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    by: str | list[str] | None = None,
    how: str = "inner",
    left_id: str | None = None,
    suffix: str = "_iv",
    bounds: str = "[)",
    shard_width: int | str | None = "auto",
    max_shards_per_interval: int = 4096,
) -> DataFrame:
    """Interval × interval overlap join (VERDICT r7 #3): one row per
    (left, right) pair whose spans overlap — the sibling of ``range_join``
    for two interval tables (outage windows × maintenance windows,
    genomic features × reads).

    Same shard-bucketing rewrite with BOTH sides exploded to their covered
    shards, plus a dedup-free MEETING RULE: overlapping intervals both
    cover the shard of ``max(l_start, r_start)`` (that point lies inside
    both spans when they overlap), so the pair is accepted ONLY in that
    shard — each true pair matches in exactly one (by…, shard)
    co-partition and no post-join ``distinct`` is needed. Shuffle volume is
    Σ(len/w + 1) over both sides; the residual scans same-shard candidates
    only.

    ``bounds``: ``"[)"`` (overlap ⇔ l_s < r_e ∧ r_s < l_e) or ``"[]"``
    (≤). Intervals empty under ``bounds`` or with a NULL endpoint match
    nothing. ``by``: optional equality key(s), SQL NULL semantics.

    ``how``: ``"inner"`` (default) or ``"left"``. Because BOTH sides
    explode, a left join can't ride the shard join directly (an unmatched
    left would null-extend once per shard copy) — ``"left"`` therefore
    requires ``left_id``, a UNIQUE left column, and runs the sharded inner
    join plus an anti-join supplement keyed on it (cost ∝ matches, not
    pairs).

    ``shard_width``: ``"auto"`` (one AVG-length probe over the valid
    intervals of BOTH sides), an explicit int in basis units, or ``None``
    for the naive non-equi twin (``interval_join_naive``)."""
    by_keys = [by] if isinstance(by, str) else list(by or [])
    if how not in ("inner", "left"):
        raise ValueError(f"interval_join: how={how!r}; use 'inner' or 'left'")
    if how == "left" and left_id is None:
        raise ValueError(
            "interval_join: how='left' needs left_id (a unique left column) "
            "— both sides explode to shards, so unmatched lefts are found "
            "by an anti-join on that id, not by the shard join itself"
        )
    if bounds not in ("[)", "[]"):
        raise ValueError(f"interval_join: bounds={bounds!r}; use '[)' or '[]'")
    if shard_width is None:
        return interval_join_naive(
            left, right, left_start, left_end, right_start, right_end,
            by=by_keys, how=how, suffix=suffix, bounds=bounds,
        )
    ls_t = _axis_type(left, left_start, "left start")
    le_t = _axis_type(left, left_end, "left end")
    rs_t = _axis_type(right, right_start, "right start")
    re_t = _axis_type(right, right_end, "right end")
    lcols, rvals = _validate_cols(left, right, by_keys, suffix)
    if left_id is not None and left_id not in lcols:
        raise ValueError(f"interval_join: left_id {left_id!r} not a left column")

    adj = 1 if bounds == "[)" else 0
    l_lo, l_hi = _basis_expr(left_start, ls_t), _basis_expr(left_end, le_t) - adj
    r_lo, r_hi = _basis_expr(right_start, rs_t), _basis_expr(right_end, re_t) - adj

    if shard_width == "auto":
        # mean VALID interval length across both sides (same validity rule
        # the explode applies — see range_join's probe note)
        lens = left.where(l_lo.isNotNull() & (l_hi >= l_lo)).select(
            (l_hi - l_lo).alias("__len")
        ).unionByName(
            right.where(r_lo.isNotNull() & (r_hi >= r_lo)).select(
                (r_hi - r_lo).alias("__len")
            )
        )
        row = lens.agg(F.avg("__len").alias("w")).first()
        width = max(int(row["w"]), 1) if row["w"] is not None else 1
    else:
        width = max(int(shard_width), 1)

    lsh = _sharded_interval_side(
        left, l_lo, l_hi, width, max_shards_per_interval,
        [F.col(c) for c in lcols], "interval_join",
    )
    rsh = _sharded_interval_side(
        right, r_lo, r_hi, width, max_shards_per_interval,
        [*by_keys, *[F.col(c).alias(f"{c}{suffix}") for c in rvals]],
        "interval_join",
    ).withColumnRenamed("__lo_b", "__rlo_b").withColumnRenamed("__hi_b", "__rhi_b")

    # overlap on the adjusted (inclusive) bases + the meeting rule: accept
    # the pair only in the shard containing max(l_lo, r_lo)
    overlap = (F.col("__lo_b") <= F.col("__rhi_b")) & (
        F.col("__rlo_b") <= F.col("__hi_b")
    )
    meet = lsh["__shard"] == F.expr(
        f"greatest(__lo_b, __rlo_b) div {width}"
    )
    cond = overlap & meet
    for k in by_keys:
        cond = (lsh[k] == rsh[k]) & cond
    cond = (lsh["__shard"] == rsh["__shard"]) & cond
    matched = lsh.join(rsh, cond, "inner").select(
        *[lsh[c] for c in lcols],
        *[rsh[f"{c}{suffix}"] for c in rvals],
    )
    if how == "inner":
        return matched
    missing = left.join(
        matched.select(left_id).distinct(), on=left_id, how="left_anti"
    ).select(
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(dict(zip(right.columns, [f.dataType for f in right.schema.fields]))[c]).alias(f"{c}{suffix}") for c in rvals],
    )
    return matched.unionByName(missing)


def interval_join_naive(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    by: str | list[str] | None = None,
    how: str = "inner",
    suffix: str = "_iv",
    bounds: str = "[)",
) -> DataFrame:
    """The direct non-equi overlap plan (readable twin / broadcast-scale
    path): equality on ``by`` plus ``l_s < r_e AND r_s < l_e`` (``<=`` for
    ``"[]"``) AND per-side validity (``s ≤ e`` adjusted to ``bounds``) —
    the raw inequality alone would match a BACKWARD interval like [29, 27)
    whose point set is empty; overlap means non-empty intersection, so
    invalid intervals match nothing (under ``how='left'`` an invalid left
    still survives null-extended). Correct at any size, quadratic on hot
    keys. Unlike the sharded plan, ``how='left'`` needs no id here — each
    left row joins once."""
    by_keys = [by] if isinstance(by, str) else list(by or [])
    ls_t = _axis_type(left, left_start, "left start")
    le_t = _axis_type(left, left_end, "left end")
    rs_t = _axis_type(right, right_start, "right start")
    re_t = _axis_type(right, right_end, "right end")
    lcols, rvals = _validate_cols(left, right, by_keys, suffix)
    iv = right.select(
        *by_keys, *[F.col(c).alias(f"{c}{suffix}") for c in rvals]
    ).withColumn("__s_b", _basis_expr(f"{right_start}{suffix}", rs_t)).withColumn(
        "__e_b", _basis_expr(f"{right_end}{suffix}", re_t)
    )
    lt = left.withColumn("__lo_b", _basis_expr(left_start, ls_t)).withColumn(
        "__hi_b", _basis_expr(left_end, le_t)
    )
    if bounds == "[)":
        cond = (F.col("__lo_b") < F.col("__e_b")) & (F.col("__s_b") < F.col("__hi_b"))
        valid = (F.col("__lo_b") < F.col("__hi_b")) & (F.col("__s_b") < F.col("__e_b"))
    else:
        cond = (F.col("__lo_b") <= F.col("__e_b")) & (
            F.col("__s_b") <= F.col("__hi_b")
        )
        valid = (F.col("__lo_b") <= F.col("__hi_b")) & (
            F.col("__s_b") <= F.col("__e_b")
        )
    cond = cond & valid
    for k in by_keys:
        cond = (lt[k] == iv[k]) & cond
    joined = lt.join(iv, cond, how)
    return joined.select(
        *[lt[c] for c in lcols],
        *[iv[f"{c}{suffix}"] for c in rvals],
    )


def range_join_naive(
    points: DataFrame,
    intervals: DataFrame,
    point_on: str,
    start: str,
    end: str,
    by: str | list[str] | None = None,
    how: str = "inner",
    suffix: str = "_iv",
    bounds: str = "[)",
) -> DataFrame:
    """The direct non-equi plan (readable twin / broadcast-scale path):
    equality on ``by`` plus the range predicate, planned by Spark as an
    equi-join with a range residual (or BroadcastNestedLoopJoin with no
    ``by``). Correct at any size, quadratic on hot keys — the sharded
    default exists because of exactly that."""
    by_keys = [by] if isinstance(by, str) else list(by or [])
    p_type = _axis_type(points, point_on, "point")
    s_type = _axis_type(intervals, start, "interval start")
    e_type = _axis_type(intervals, end, "interval end")
    pcols, ivals = _validate_cols(points, intervals, by_keys, suffix)
    iv = intervals.select(
        *by_keys, *[F.col(c).alias(f"{c}{suffix}") for c in ivals]
    ).withColumn("__s_b", _basis_expr(f"{start}{suffix}", s_type)).withColumn(
        "__e_b", _basis_expr(f"{end}{suffix}", e_type)
    )
    pt = points.withColumn("__p_b", _basis_expr(point_on, p_type))
    upper = (
        F.col("__p_b") < F.col("__e_b")
        if bounds == "[)"
        else F.col("__p_b") <= F.col("__e_b")
    )
    cond = (F.col("__p_b") >= F.col("__s_b")) & upper
    for k in by_keys:
        cond = (pt[k] == iv[k]) & cond
    joined = pt.join(iv, cond, how)
    return joined.select(
        *[pt[c] for c in pcols],
        *[iv[f"{c}{suffix}"] for c in ivals],
    )


@query(
    "ext_range_join",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           epoch_us(p.ts) AS purchase_ts_us,
           e.event_id AS error_id, epoch_us(e.ts) AS win_start_us
    FROM events p JOIN events e
      ON p.user_id = e.user_id
     AND p.event_type = 'purchase' AND e.event_type = 'error'
     AND epoch_us(p.ts) >= epoch_us(e.ts)
     AND epoch_us(p.ts) < epoch_us(e.ts) + CAST(21600 AS BIGINT) * 1000000
    """,
)
def ext_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared range join (round 7): purchases matched to the 6-hour
    "error windows" the same user opened — one row per (purchase, window)
    containment pair, through the generic sharded ``range_join`` — gated
    by DuckDB's plain inequality join. Explicit 6 h shard width (= the
    interval length, so each interval explodes to exactly 2 shards and
    the plan is probe-free); plan-pinned python-free with no nested-loop
    or cartesian node in `tests/test_plan_shapes.py`."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts_us").alias("purchase_ts_us"),
    )
    win_us = 21600 * 1_000_000
    windows = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_id"),
        F.col("ts_us").alias("win_start_us"),
        (F.col("ts_us") + F.lit(win_us)).alias("win_end_us"),
    )
    joined = range_join(
        purchases,
        windows,
        point_on="purchase_ts_us",
        start="win_start_us",
        end="win_end_us",
        by="user_id",
        shard_width=win_us,
    )
    return joined.select(
        "purchase_id",
        "user_id",
        "purchase_ts_us",
        F.col("error_id_iv").alias("error_id"),
        F.col("win_start_us_iv").alias("win_start_us"),
    )
