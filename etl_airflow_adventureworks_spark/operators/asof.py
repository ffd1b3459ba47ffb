"""Two-table as-of join — an operator Spark lacks natively.

Preference order per the charter: (a) compose built-ins — the DEFAULT
``asof_join`` is now a pure-Catalyst time-sharded plan (tagged union +
within-shard running ``last() IGNORE NULLS`` window + per-shard carry-in),
zero Python — else (b) applyInPandas with ``pd.merge_asof`` per group
(``asof_join_grouped``, the readable twin and the fallback for
non-shardable ``on`` types). Left rows match the most recent right row
with right_on ≤ left_on within the same ``by`` key (backward as-of, the
default); ``direction="forward"|"nearest"`` and ``tolerance`` mirror
``pd.merge_asof``'s full surface on both plans (round 8, VERDICT r7 #2).

Scale shape of the default plan (the same skew prescription as
``sessionize.session_gap_sharded`` / ``asof_attribution_sharded``, which
it generalizes to a second table): one shuffle co-locates both sides on
(by, shard) — the hot entity's rows spread over range/shard_width
DIVISIBLE tasks instead of one indivisible per-entity window/pandas task
— plus a summary-sized window over one row per (by, shard) to carry the
latest right row across shard boundaries. Exact for any shard width: a
left row's as-of match is either in its own shard at or before it (the
within-shard window finds the max such) or it is the latest right row of
some earlier shard (the carry — shards are time-ordered, so the last
non-null per-shard latest IS the global latest among earlier shards).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..sources import load_table

#: `on` types the sharded plan can bucket into numeric shards
_SHARDABLE = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
)


#: internal working columns — user columns with these names would be
#: silently overwritten by withColumn (same guard as rangejoin/linededup)
_RESERVED = {
    "__side",
    "__basis",
    "__shard",
    "__match",
    "__latest",
    "__carry",
    "__match_f",
    "__latest_f",
    "__carry_f",
}

_DIRECTIONS = ("backward", "forward", "nearest")


def _validate(left: DataFrame, right: DataFrame, on: str, by: str, suffix: str):
    """Shared column-collision validation; returns (lcols, rvals, out_cols).

    Raises ValueError on column-name collisions: a shared non-key column
    would appear twice in the tagged union, a left column already named
    ``<rightcol><suffix>`` would collide with the suffixed output, and a
    column named like an internal working column would be overwritten —
    all silently corrupt results otherwise."""
    lcols = list(left.columns)
    rvals = [c for c in right.columns if c not in (on, by)]
    internal = _RESERVED & (set(lcols) | set(right.columns))
    if internal:
        raise ValueError(
            f"asof_join: column(s) {sorted(internal)} collide with internal "
            "working names; rename them first"
        )
    shared = set(rvals) & set(lcols)
    if shared:
        raise ValueError(
            f"asof_join: non-key column(s) {sorted(shared)} exist on both "
            f"sides; rename one side before joining"
        )
    suffixed = {f"{c}{suffix}" for c in [on] + rvals}
    clash = suffixed & set(lcols)
    if clash:
        raise ValueError(
            f"asof_join: left column(s) {sorted(clash)} collide with the "
            f"suffixed right output; pick a different suffix"
        )
    out_cols = lcols + [f"{on}{suffix}"] + [f"{c}{suffix}" for c in rvals]
    return lcols, rvals, out_cols


def _basis_col(col, dtype: T.DataType):
    """Numeric basis for an arbitrary axis Column: micros for timestamps,
    days for dates, the value itself for integers. ``tolerance`` and
    ``shard_width`` are expressed in these units."""
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(col.cast("timestamp"))
    if isinstance(dtype, T.DateType):
        return F.datediff(col, F.lit("1970-01-01")).cast("long")
    return col.cast("long")


def _shard_base_expr(on: str, dtype: T.DataType):
    return _basis_col(F.col(on), dtype)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    suffix: str = "_right",
    shard_width: int | str | None = "auto",
    max_group_rows: int = 5_000_000,
    direction: str = "backward",
    tolerance: int | None = None,
) -> DataFrame:
    """As-of join, hot-entity-safe by default. ``on``: orderable
    column in both sides (same name); ``by``: entity key in both sides.
    Right's ``on`` and non-key columns surface with ``suffix``. Left rows
    with no matching right row keep NULLs. ``on`` must be non-null on both
    sides — a NULL has no position on the time axis: the sharded plan
    excludes such rows, the grouped plan's ``merge_asof`` rejects them.

    ``direction`` (pd.merge_asof semantics, ties inclusive):

    - ``"backward"`` (default): most recent right row with r.on ≤ l.on —
      within-shard running ``last() IGNORE NULLS`` + latest-of-earlier-
      shards carry-in;
    - ``"forward"``: earliest right row with r.on ≥ l.on — the mirrored
      plan (within-shard running ``first()`` over the following frame +
      earliest-of-later-shards carry-in on the same single shuffle);
    - ``"nearest"``: whichever of the two is closest in |r.on − l.on|,
      backward winning ties (pandas' rule) — both window/carry pairs
      computed over the same union/summary frames, chosen per row.

    ``tolerance``: optional max |r.on − l.on| in basis units (micros for
    timestamps, days for dates, the raw value for ints); matches farther
    than that become NULL, exactly like ``pd.merge_asof(tolerance=...)``.
    Applied as a residual on the already-found match, so it never changes
    the plan shape.

    ``shard_width`` picks the plan:

    - ``"auto"`` (default): time-sharded pure-DataFrame plan; the width is
      left's ``on`` range / 256 — one cheap min/max aggregate (parquet
      footer stats make it near-free) buys a plan with no indivisible
      per-entity task. 256 shards ≈ plenty of divisibility without
      drowning the carry summary.
    - an int: the same plan with an explicit width in the ``on`` column's
      shard units (micros for timestamps, days for dates, raw value for
      ints) — no probe job.
    - ``None``: the per-group Arrow ``merge_asof`` plan
      (``asof_join_grouped``) with its ``max_group_rows`` fail-loud guard.

    ``on`` must be numeric, date, or timestamp — an as-of needs a real
    axis; non-orderable-as-number types (strings, decimals) raise
    ValueError up front (``pd.merge_asof`` rejects them too, so there is
    no slower-but-working fallback to route to).

    NULL ``by`` keys: a NULL entity is ONE group — NULL-keyed left rows
    match NULL-keyed right rows (groupBy/Window semantics, which the
    grouped ``merge_asof`` twin inherits from ``groupBy(by)``; the sharded
    plan's carry join is null-safe to agree). This differs deliberately
    from SQL join semantics (where NULL matches nothing — what
    ``range_join`` does): an as-of is a per-entity alignment, not a join
    predicate, and dropping un-keyed rows silently would lose data.

    Determinism caveat (both plans): if several right rows share the same
    (by, on) the one carried is engine/input-order dependent — pre-dedup
    the right side to one row per (by, on) when that matters (the declared
    ``ext_asof_twotable`` query does exactly that)."""
    if direction not in _DIRECTIONS:
        raise ValueError(
            f"asof_join: direction={direction!r}; use one of {_DIRECTIONS}"
        )
    if tolerance is not None and int(tolerance) < 0:
        raise ValueError(f"asof_join: tolerance must be >= 0, got {tolerance!r}")
    for side, df in (("left", left), ("right", right)):
        side_type = dict(zip(df.columns, [f.dataType for f in df.schema.fields]))[on]
        if not isinstance(side_type, _SHARDABLE):
            raise ValueError(
                f"asof_join: {side} `on` column {on!r} has type "
                f"{side_type.simpleString()}; an as-of join needs a numeric, "
                "date, or timestamp axis (pd.merge_asof rejects other types "
                "too — cast or derive a numeric order key first)"
            )
    on_type = dict(zip(right.columns, [f.dataType for f in right.schema.fields]))[on]
    if shard_width is None:
        return asof_join_grouped(
            left,
            right,
            on,
            by,
            suffix=suffix,
            max_group_rows=max_group_rows,
            direction=direction,
            tolerance=tolerance,
        )
    lcols, rvals, _ = _validate(left, right, on, by, suffix)

    if shard_width == "auto":
        base_probe = _shard_base_expr(on, on_type)
        lo, hi = left.agg(
            F.min(base_probe).alias("lo"), F.max(base_probe).alias("hi")
        ).first()
        if lo is None:  # empty left → any width; 1 keeps the plan valid
            width = 1
        else:
            width = max((int(hi) - int(lo)) // 256, 1)
    else:
        width = max(int(shard_width), 1)

    # tagged union so ONE (by, shard) shuffle co-locates both sides
    all_cols = [by, on] + [c for c in lcols if c not in (by, on)] + rvals
    l_tagged = left.select(
        *[F.col(c) if c in left.columns else F.lit(None).alias(c) for c in all_cols],
        F.lit(0).alias("__side"),
    )
    r_tagged = right.select(
        *[F.col(c) if c in right.columns else F.lit(None).alias(c) for c in all_cols],
        F.lit(1).alias("__side"),
    )
    # integer `div` bucketing (same as session_gap_sharded): monotone in
    # `on`, so an earlier shard's rows are all strictly before a later
    # shard's — the invariant the carry-in correctness proof rests on
    u = (
        l_tagged.unionByName(r_tagged)
        .filter(F.col(on).isNotNull())
        .withColumn("__basis", _shard_base_expr(on, on_type))
        .withColumn("__shard", F.expr(f"__basis div {width}"))
        .drop("__basis")
    )

    from pyspark.sql import Window

    need_b = direction in ("backward", "nearest")
    need_f = direction in ("forward", "nearest")

    # right row as one struct so the window/carry move whole rows
    rstruct = F.when(
        F.col("__side") == 1, F.struct(*[F.col(c) for c in [on] + rvals])
    )
    local = u
    if need_b:
        # within (by, shard): running latest right row at-or-before me.
        # Right sorts BEFORE left at equal `on` (__side DESC) — backward
        # as-of is inclusive of equal timestamps, like merge_asof/DuckDB.
        w1b = (
            Window.partitionBy(by, "__shard")
            .orderBy(F.col(on).asc(), F.col("__side").desc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        local = local.withColumn("__match", F.last(rstruct, ignorenulls=True).over(w1b))
    if need_f:
        # mirrored: earliest right row at-or-after me. Right sorts AFTER
        # left at equal `on` (__side ASC) so the frame starting at the
        # current row still sees an equal-timestamp right row (inclusive).
        w1f = (
            Window.partitionBy(by, "__shard")
            .orderBy(F.col(on).asc(), F.col("__side").asc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        local = local.withColumn(
            "__match_f", F.first(rstruct, ignorenulls=True).over(w1f)
        )

    # one summary row per (by, shard) — the shard's LATEST (backward) and/or
    # EARLIEST (forward) right row (null for right-less shards; max_by/
    # min_by skip null ordering keys) — then the carry-in is the last
    # non-null latest over all EARLIER shards (backward) / the first
    # non-null earliest over all LATER shards (forward). The summary frame
    # is ~|distinct (by, shard)| rows: the hot entity contributes one row
    # per shard here, not one row per event. Both directions ride the SAME
    # union, summary aggregate, and carry join — "nearest" costs no extra
    # shuffle over either single direction.
    r_on_key = F.when(F.col("__side") == 1, F.col(on))
    aggs = []
    if need_b:
        aggs.append(F.max_by(rstruct, r_on_key).alias("__latest"))
    if need_f:
        aggs.append(F.min_by(rstruct, r_on_key).alias("__latest_f"))
    summ = u.groupBy(by, "__shard").agg(*aggs)
    carry_cols = [by, "__shard"]
    if need_b:
        w2b = (
            Window.partitionBy(by)
            .orderBy("__shard")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        summ = summ.withColumn(
            "__carry", F.last("__latest", ignorenulls=True).over(w2b)
        )
        carry_cols.append("__carry")
    if need_f:
        w2f = (
            Window.partitionBy(by)
            .orderBy("__shard")
            .rowsBetween(1, Window.unboundedFollowing)
        )
        summ = summ.withColumn(
            "__carry_f", F.first("__latest_f", ignorenulls=True).over(w2f)
        )
        carry_cols.append("__carry_f")
    carry = summ.select(*carry_cols)

    # every left (by, shard) exists in summ by construction → inner join,
    # co-keyed with the heavy side's existing (by, shard) partitioning.
    # NULL-SAFE on `by`: groupBy/Window treat a NULL entity as one group
    # (so the grouped twin matches NULL-keyed rows among themselves), and a
    # plain equality here would silently DROP those left rows instead
    lhs = local.filter(F.col("__side") == 0)
    l_basis = _basis_col(lhs[on], on_type)

    def distance_filtered(match, is_backward):
        if tolerance is None:
            return match
        m_basis = _basis_col(match.getField(on), on_type)
        delta = (l_basis - m_basis) if is_backward else (m_basis - l_basis)
        return F.when(delta <= F.lit(int(tolerance)), match)

    b = (
        distance_filtered(F.coalesce(lhs["__match"], carry["__carry"]), True)
        if need_b
        else None
    )
    f = (
        distance_filtered(F.coalesce(lhs["__match_f"], carry["__carry_f"]), False)
        if need_f
        else None
    )
    if direction == "backward":
        best = b
    elif direction == "forward":
        best = f
    else:
        # nearest: closer side wins, backward wins exact-distance ties
        # (pandas' rule); a NULL on either side falls through to the other
        b_dist = l_basis - _basis_col(b.getField(on), on_type)
        f_dist = _basis_col(f.getField(on), on_type) - l_basis
        best = F.when(b.isNull(), f).when(f.isNull(), b).when(b_dist <= f_dist, b).otherwise(f)
    return (
        lhs
        .join(
            carry,
            lhs[by].eqNullSafe(carry[by]) & (lhs["__shard"] == carry["__shard"]),
        )
        .select(
            *[lhs[c] for c in lcols],
            best.getField(on).alias(f"{on}{suffix}"),
            *[best.getField(c).alias(f"{c}{suffix}") for c in rvals],
        )
    )


def asof_join_grouped(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    suffix: str = "_right",
    max_group_rows: int = 5_000_000,
    direction: str = "backward",
    tolerance: int | None = None,
) -> DataFrame:
    """Per-entity Arrow ``merge_asof`` as-of join — the readable twin the
    sharded default is equality-tested against, and the fallback for
    ``on`` types the shard bucketing can't handle (strings, decimals).

    ``direction``/``tolerance`` map straight onto ``pd.merge_asof``'s
    parameters; ``tolerance`` is in the engine's basis units (micros for
    timestamps, days for dates, the raw value for ints) and is converted
    to the ``Timedelta`` pandas wants for datetime axes.

    Skew guard: each ``by`` group becomes ONE pandas frame on one task, so
    a pathological entity (a bot user with 100M events) would OOM that
    executor quietly. Groups larger than ``max_group_rows`` fail loud with
    the remedy instead: use the default sharded ``asof_join`` (this guard
    predates it; the sharded plan has no per-entity frame at all), or
    raise the limit deliberately if your executors are sized for more."""
    if direction not in _DIRECTIONS:
        raise ValueError(
            f"asof_join: direction={direction!r}; use one of {_DIRECTIONS}"
        )
    on_type = dict(zip(right.columns, [f.dataType for f in right.schema.fields]))[on]
    if tolerance is None:
        pd_tol = None
    elif isinstance(on_type, (T.TimestampType, T.TimestampNTZType)):
        import pandas as pd

        pd_tol = pd.Timedelta(microseconds=int(tolerance))
    elif isinstance(on_type, T.DateType):
        import pandas as pd

        pd_tol = pd.Timedelta(days=int(tolerance))
    else:
        pd_tol = int(tolerance)
    types = {f.name: f.dataType.simpleString() for f in left.schema.fields}
    rtypes = {f.name: f.dataType.simpleString() for f in right.schema.fields}
    lcols, rvals, out_cols = _validate(left, right, on, by, suffix)
    out_schema = ", ".join(
        [f"{c} {types[c]}" for c in lcols]
        + [f"{on}{suffix} {rtypes[on]}"]
        + [f"{c}{suffix} {rtypes[c]}" for c in rvals]
    )

    # tagged union so ONE grouped shuffle co-locates both sides per key
    all_cols = [by, on] + [c for c in lcols if c not in (by, on)] + rvals
    l_tagged = left.select(
        *[F.col(c) if c in left.columns else F.lit(None).alias(c) for c in all_cols],
        F.lit(0).alias("__side"),
    )
    r_tagged = right.select(
        *[F.col(c) if c in right.columns else F.lit(None).alias(c) for c in all_cols],
        F.lit(1).alias("__side"),
    )

    def merge(pdf):
        import pandas as _pd

        if len(pdf) > max_group_rows:
            key_val = pdf[by].iloc[0]
            raise ValueError(
                f"asof_join: group {by}={key_val!r} has {len(pdf)} rows "
                f"(> max_group_rows={max_group_rows}); one pandas frame per "
                "group would exhaust task memory. Use the default sharded "
                "asof_join (shard_width='auto') which has no per-entity "
                "frame, or raise max_group_rows if executors are sized "
                "for it."
            )
        l = (
            pdf[pdf["__side"] == 0][lcols]
            .sort_values(on, kind="mergesort")
            .reset_index(drop=True)
        )
        r = (
            pdf[pdf["__side"] == 1][[on] + rvals]
            .rename(columns={c: f"{c}{suffix}" for c in [on] + rvals})
            .dropna(subset=[f"{on}{suffix}"])
            .sort_values(f"{on}{suffix}", kind="mergesort")
            .reset_index(drop=True)
        )
        if len(r) == 0:
            out = l.copy()
            for c in [on] + rvals:
                out[f"{c}{suffix}"] = None
        else:
            kwargs = {} if pd_tol is None else {"tolerance": pd_tol}
            out = _pd.merge_asof(
                l,
                r,
                left_on=on,
                right_on=f"{on}{suffix}",
                direction=direction,
                **kwargs,
            )
        return out[out_cols]

    return (
        l_tagged.unionByName(r_tagged)
        .groupBy(by)
        .applyInPandas(merge, schema=out_schema)
    )


@query(
    "ext_asof_twotable",
    oracle="""
    WITH p AS (
      SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS purchase_ts_us,
             value AS purchase_value
      FROM events WHERE event_type = 'purchase'
    ),
    v AS (
      SELECT user_id, epoch_us(ts) AS price_ts_us, max(event_id) AS price_id
      FROM events WHERE event_type = 'view'
      GROUP BY user_id, epoch_us(ts)
    )
    SELECT p.purchase_id, p.user_id, p.purchase_ts_us, p.purchase_value,
           v.price_ts_us AS price_ts_us, v.price_id AS price_id
    FROM p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND p.purchase_ts_us >= v.price_ts_us
    """,
)
def ext_asof_twotable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared two-table as-of (round 7, VERDICT r6 #3): purchases joined
    to the most recent prior row of a SECOND table (a per-user "price list"
    derived from view events, payload-bearing and deduped to one row per
    (user, ts) so the carried row is deterministic), through the generic
    ``asof_join`` operator — gated by DuckDB's native ``ASOF LEFT JOIN``.
    Unlike ``ext_asof_attribution`` (one stream, window form), this row
    exercises the two-input operator: tagged union, within-shard running
    match, carry-in of whole right rows across shard boundaries.

    Slot provenance: freed by folding ``ext_lang_id`` into
    ``ext_quality_score`` (COVERAGE.md fold log, policy (b)). Explicit
    24 h shard width — the declared corpus spans ~30 days, and a fixed
    width keeps the plan probe-free (``"auto"`` adds one min/max job)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "value", F.unix_micros("ts").alias("ts_us")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        "ts_us",
        F.col("value").alias("purchase_value"),
    )
    pricelist = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts_us")
        .agg(F.max("event_id").alias("price_id"))
    )
    joined = asof_join(
        purchases,
        pricelist,
        on="ts_us",
        by="user_id",
        shard_width=24 * 3600 * 1_000_000,
    )
    return joined.select(
        "purchase_id",
        "user_id",
        F.col("ts_us").alias("purchase_ts_us"),
        "purchase_value",
        F.col("ts_us_right").alias("price_ts_us"),
        F.col("price_id_right").alias("price_id"),
    )
