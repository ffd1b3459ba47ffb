"""Sessionization / event-window / JSON operators over events (E5, E6).

Charter extension: the reference has no streaming or event semantics
(SURVEY.md §2.8); the driver's events table (event_id, ts, user_id,
event_type, value, props) exists for exactly this. Batch forms here are
oracle-checked; the Structured Streaming twins live in ``streaming.events``.

Scale notes: gap-sessionization is one shuffle on user_id; the window
functions reuse that partitioning (no second shuffle). Event-time windows
aggregate with map-side partials. Monetary-style SUMs over the double
``value`` column go through decimal(18,6) pinning for order-independence
(same reasoning as functions.money).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

#: exact, order-independent sum over the double `value` column.
_VAL_SPARK = "CAST(value AS DECIMAL(18,6))"
_VAL_DUCK = "CAST(value AS DECIMAL(18,6))"

SESSION_GAP_MIN = 30


@query(
    "ext_json_extract",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
    FROM events
    """,
)
def ext_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction (E6): get_json_object on the props string —
    native, codegen'd, no UDF."""
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
    )


def ext_event_window_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregation (E5): batch form of the
    streaming groupBy(window(ts, '1 hour')) — identical semantics. Window
    bounds surface as epoch seconds (exact integers; raw nanosecond
    timestamps don't round-trip identically across engines).

    Library twin since round 3: the driver slot is ``ext_stream_window_equiv``
    (streaming/events.py), which runs the SAME math through the Structured
    Streaming engine against the SAME DuckDB oracle — one oracle now gates
    both; this batch form stays in the bench headline set and is
    result-identity-tested against the streaming run."""
    ev = load_table(spark, sf_dir, "events")
    w = F.window("ts", "1 hour")
    return (
        ev.groupBy(w, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.expr(_VAL_SPARK)).cast("double").alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).cast("long").alias("window_start_s"),
            F.unix_timestamp(F.col("window.end")).cast("long").alias("window_end_s"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "ext_session_gap",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_id, value, epoch_us(ts) AS ts_us FROM events
    ),
    flagged AS (
      SELECT user_id, ts_us, event_id, value,
             CASE WHEN lag(ts_us) OVER w IS NULL
                       OR ts_us - lag(ts_us) OVER w > {SESSION_GAP_MIN} * 60 * 1000000
                  THEN 1 ELSE 0 END AS new_session
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ),
    sess AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                       ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
           CAST(max(ts_us) - min(ts_us) AS DOUBLE) / 1000000.0 AS duration_sec,
           CAST(SUM({_VAL_DUCK}) AS DOUBLE) AS total_value
    FROM sess
    GROUP BY user_id, session_id
    """,
)
def ext_session_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (E5, SURVEY.md §2.9): declared plan is the
    TIME-SHARDED form (``session_gap_sharded``) — the classic
    user-partitioned-window form puts a 30%-hot user's 2.4M events on ONE
    indivisible window task (measured r6, idle machine, warmup +
    median-of-5, 32 cores: 1.17×/2.04×/2.64× slower than sharded at
    2M/8M/32M events — monotone in corpus size;
    ``tools/measure_hot_sessions.py``, SCALING.md). The sharded plan is exact for any shard width and
    result-identical to the textbook form (``session_gap_user_window``,
    kept as the equality twin; proven on the adversarial hot-user corpus
    in tests/test_skew_zipf.py), so the scale-safe plan is the default."""
    return session_gap_sharded(load_table(spark, sf_dir, "events"))


def session_gap_user_window(ev: DataFrame, gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """Textbook gap sessionizer (library twin): lag-gap flag + running sum
    over a user-partitioned window, then per-session aggregates
    (pyspark_guide 'Sessionization'). One shuffle on user_id; both windows
    and the final groupBy reuse it. Correct everywhere but a measured
    straggler on hot-key streams — a window partition is one indivisible
    task — so the DECLARED ``ext_session_gap`` uses the sharded form; this
    twin remains the N-line readable spec the tests compare against."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
                > gap_min * 60 * 1_000_000
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.unix_micros("ts")).alias("session_start_us"),
        F.max(F.unix_micros("ts")).alias("session_end_us"),
        (
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).cast("double")
            / F.lit(1000000.0)
        ).alias("duration_sec"),
        F.sum(F.expr(_VAL_SPARK)).cast("double").alias("total_value"),
    )


def session_gap_sharded(
    ev: DataFrame,
    gap_min: int = SESSION_GAP_MIN,
    shard_hours: int = 24,
) -> DataFrame:
    """Hot-user-safe gap sessionization — the DECLARED ``ext_session_gap``
    plan since round 6 (SCALING.md skew prescription, VERDICT r5 #1). The
    textbook form (``session_gap_user_window``) partitions its windows on
    user_id, so one ultra-hot user (Zipf head holding 30% of a 100 TB
    stream) lands on ONE task — the straggler shape no AQE setting can
    split, because a window's partition is indivisible; measured
    1.17×/2.04×/2.64× slower at 2M/8M/32M events, 30% hot (idle machine,
    warmup + median-of-5) — monotone in corpus size. This form shards
    the heavy pass by TIME as well:

    1. sessionize within (user_id, shard = ts div shard_hours) — the hot
       user's events spread over time_range/shard_hours tasks;
    2. re-run the same lag-gap merge per user over the MINI-SESSION
       summaries (one row per mini-session — orders of magnitude smaller
       than events; a user emits ≤ a few sessions per shard), stitching
       sessions that span shard boundaries.

    Exact for ANY shard width: within a shard, consecutive mini-sessions
    are > gap apart by construction (phase 2 never re-merges them), and a
    boundary-spanning session's inter-event gap equals exactly
    (next mini start − prev mini end), which phase 2 tests against the
    same threshold. Result-identical to ``session_gap_user_window``
    (asserted in tests, including on an adversarial hot-user corpus) with
    the same schema and per-user 1-based session numbering. Decimal sums
    merge exactly (decimal partials, double only at the boundary)."""
    from pyspark.sql import Window

    gap_us = gap_min * 60 * 1_000_000
    shard_us = shard_hours * 3600 * 1_000_000
    base = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.expr(_VAL_SPARK).alias("val_dec"),
    ).withColumn("shard", F.expr(f"ts_us div {shard_us}"))
    w1 = Window.partitionBy("user_id", "shard").orderBy("ts_us", "event_id")
    mini = (
        base.withColumn(
            "new_mini",
            F.when(
                F.lag("ts_us").over(w1).isNull()
                | (F.col("ts_us") - F.lag("ts_us").over(w1) > gap_us),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "mini_id",
            F.sum("new_mini").over(w1.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "shard", "mini_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_us").alias("start_us"),
            F.max("ts_us").alias("end_us"),
            F.sum("val_dec").alias("val_sum"),
        )
    )
    # phase 2 runs on mini-session summaries: per-user windows again, but
    # over a frame ~|sessions| not ~|events| — the hot user's row count here
    # is its session count, not its event count
    w2 = Window.partitionBy("user_id").orderBy("start_us")
    merged = mini.withColumn(
        "new_session",
        F.when(
            F.lag("end_us").over(w2).isNull()
            | (F.col("start_us") - F.lag("end_us").over(w2) > gap_us),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "session_id",
        F.sum("new_session").over(w2.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return merged.groupBy("user_id", "session_id").agg(
        F.sum("n_events").alias("n_events"),
        F.min("start_us").alias("session_start_us"),
        F.max("end_us").alias("session_end_us"),
        ((F.max("end_us") - F.min("start_us")).cast("double") / F.lit(1000000.0)).alias(
            "duration_sec"
        ),
        F.sum("val_sum").cast("double").alias("total_value"),
    )


@query(
    "ext_asof_attribution",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
    ),
    attributed AS (
      SELECT user_id, event_id, event_type, ts_us,
             last_value(CASE WHEN event_type = 'view' THEN ts_us END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_view_us
      FROM ev
    )
    SELECT event_id AS purchase_id, user_id, ts_us AS purchase_ts_us,
           last_view_us,
           CAST(ts_us - last_view_us AS DOUBLE) / 1000000.0 AS view_to_purchase_sec
    FROM attributed
    WHERE event_type = 'purchase'
    """,
)
def ext_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of attribution (the as-of-join shape, pyspark_guide §Common OLAP
    patterns): each purchase matched to the user's most recent PRIOR view.
    Declared plan is the TIME-SHARDED form since round 6: on a 30%-hot
    corpus (idle machine, warmup + median-of-5) the user-window twin's
    indivisible hot task costs 1.00/2.57/10.05 s at 2M/8M/32M events vs
    sharded 0.89/1.47/4.76 s — 1.11×/1.75×/2.11×, monotone and widening
    as the hot task grows (tools/measure_hot_asof.py, SCALING.md). Result-identical to ``asof_attribution_user_window``
    (equality-tested)."""
    return asof_attribution_sharded(load_table(spark, sf_dir, "events"))


def asof_attribution_user_window(ev: DataFrame) -> DataFrame:
    """Textbook single-stream as-of (library twin): because both sides live
    in one event stream, the as-of join collapses to a last_value(...
    IGNORE NULLS) window — one shuffle on user_id, no range join needed.
    Purchases with no prior view keep NULL (left as-of semantics). A
    single cheap pass, so the hot-user straggler penalty is milder than
    session_gap's — but still super-linear in the hot user's history (one
    indivisible window task); the DECLARED query uses the sharded form."""
    from pyspark.sql import Window

    ev = ev.select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    attributed = ev.withColumn(
        "last_view_us",
        F.last(
            F.when(F.col("event_type") == "view", F.col("ts_us")), ignorenulls=True
        ).over(w),
    )
    return attributed.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts_us").alias("purchase_ts_us"),
        "last_view_us",
        ((F.col("ts_us") - F.col("last_view_us")).cast("double") / 1e6).alias(
            "view_to_purchase_sec"
        ),
    )


def asof_attribution_sharded(ev: DataFrame, shard_hours: int = 24) -> DataFrame:
    """Hot-user-safe as-of attribution (same skew prescription as
    ``session_gap_sharded``): the window form's user-partitioned
    last_value(...) puts a hot user's whole history on one indivisible
    task. Shard by time instead:

    1. within (user_id, shard), the running last-prior-view is the same
       last_value(... IGNORE NULLS) window — heavy pass, now divisible;
    2. the carry-in from earlier shards is the running max of each
       shard's last view ts over the per-(user, shard) SUMMARY rows (one
       row per user-shard — orders of magnitude smaller than events; max
       ≡ latest because shards are time-ordered);
    3. a purchase's attributed view = its within-shard prior view, else
       the shard's carry-in.

    Exact for any shard width (a prior view is either in my shard before
    me — case 1 — or the latest view of some earlier shard — case 2);
    result-identical to ``asof_attribution_user_window`` (asserted in
    tests, including the hot-user corpus; measured up to 2.1× faster on
    it, monotone in corpus size through 32M events). The summary join is co-keyed on (user_id, shard) with
    the heavy side's existing partitioning."""
    from pyspark.sql import Window

    shard_us = shard_hours * 3600 * 1_000_000
    base = ev.select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    ).withColumn("shard", F.expr(f"ts_us div {shard_us}"))
    w1 = (
        Window.partitionBy("user_id", "shard")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = base.withColumn(
        "local_last_view",
        F.last(
            F.when(F.col("event_type") == "view", F.col("ts_us")), ignorenulls=True
        ).over(w1),
    )
    # one summary row per (user, shard): the shard's latest view ts (NULL
    # for view-less shards — max-over-window skips them in the carry)
    shard_summary = base.groupBy("user_id", "shard").agg(
        F.max(F.when(F.col("event_type") == "view", F.col("ts_us"))).alias(
            "shard_last_view"
        )
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = shard_summary.withColumn("carry_in", F.max("shard_last_view").over(w2)).select(
        "user_id", "shard", "carry_in"
    )
    return (
        local.filter(F.col("event_type") == "purchase")
        .join(carry, ["user_id", "shard"])
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts_us").alias("purchase_ts_us"),
            F.coalesce("local_last_view", "carry_in").alias("last_view_us"),
            (
                (F.col("ts_us") - F.coalesce("local_last_view", "carry_in")).cast("double")
                / 1e6
            ).alias("view_to_purchase_sec"),
        )
    )


def ext_event_funnel_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user funnel via the native pivot() API (E5 shape, long→wide):
    counts per event type plus purchase value, in ONE shuffle.

    Library/bench twin since round 9: its registry slot became
    ``ext_event_analytics_suite`` (operators/funnel.py), which carries
    these exact pivot columns next to the ordered-funnel columns under
    one oracle (fold policy (b), COVERAGE.md); this standalone form stays
    benched and result-equality-tested against the absorber
    (tests/test_funnel.py::test_pivot_twin_matches_suite_absorber)."""
    return event_funnel_pivot_frame(load_table(spark, sf_dir, "events"))


def event_funnel_pivot_frame(ev: DataFrame) -> DataFrame:
    """The pivot plan on a frame (shared by the twin and the suite).

    The pivot carries an EXPLICIT value list — without it Spark runs an
    extra distinct scan to discover values, which at 100 TB is a full pass
    you didn't ask for. Two aggregates per pivot cell (count + decimal sum)
    come out as `<type>_n`/`<type>_v`; the projection keeps the funnel
    columns. Missing cells are NULL from pivot → counts filled to 0 (DuckDB
    FILTER count yields 0); the value sum keeps NULL-when-absent on both
    engines."""
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", ["view", "click", "purchase", "signup", "error"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr(_VAL_SPARK)).alias("v"),
        )
    )
    return wide.select(
        "user_id",
        F.coalesce(F.col("view_n"), F.lit(0)).alias("n_view"),
        F.coalesce(F.col("click_n"), F.lit(0)).alias("n_click"),
        F.coalesce(F.col("purchase_n"), F.lit(0)).alias("n_purchase"),
        F.coalesce(F.col("signup_n"), F.lit(0)).alias("n_signup"),
        F.coalesce(F.col("error_n"), F.lit(0)).alias("n_error"),
        F.col("purchase_v").cast("double").alias("purchase_value"),
    )


def max_key_share(df: DataFrame, key: str, fraction: float = 0.01, seed: int = 7) -> float:
    """Sampled share of the hottest ``key`` value — the skew probe behind
    the ``*_auto`` dispatchers. One cheap job: a single-column sample
    (column-pruned scan, no full-data shuffle — only the sample crosses),
    groupBy, max/sum. Returns 0.0 on an empty sample."""
    s = df.select(key).sample(fraction=fraction, seed=seed)
    row = (
        s.groupBy(key)
        .count()
        .agg(F.max("count").alias("mx"), F.sum("count").alias("n"))
        .first()
    )
    if row is None or not row["n"]:
        return 0.0
    return float(row["mx"]) / float(row["n"])


def _skew_threshold(df: DataFrame, threshold: float | None) -> float:
    """Default dispatch threshold: 1/defaultParallelism. Rationale: a
    user-partitioned window puts the hottest key on ONE indivisible task,
    so skew starts hurting once that key holds more rows than an even
    core-share — below it the stage is balanced anyway and the textbook
    plan's single pass is cheaper (the sharded forms cost ~2x on the
    uniform sf0.1 bench corpus). On a 1000-executor cluster the threshold
    is tiny and the dispatch lands on sharded almost always — which is the
    posture the declared queries hard-code."""
    if threshold is not None:
        return threshold
    return 1.0 / max(df.sparkSession.sparkContext.defaultParallelism, 2)


def session_gap_auto(
    ev: DataFrame,
    gap_min: int = SESSION_GAP_MIN,
    shard_hours: int = 24,
    threshold: float | None = None,
    sample_fraction: float = 0.01,
    share: float | None = None,
) -> DataFrame:
    """Skew-dispatched sessionizer for library callers (VERDICT r6 #4): a
    sampled max-key-share probe picks ``session_gap_user_window`` (one
    pass, cheaper on uniform data) below ``threshold`` and
    ``session_gap_sharded`` (divisible hot-key tasks) at or above it.
    Both forms are result-identical (proven in tests), so the dispatch is
    a pure cost decision and cannot change answers. The DECLARED
    ``ext_session_gap`` stays hard-wired to the sharded form: the driver
    corpus is uniform, but a declared plan must be the one that survives
    the adversarial case without a probe job in front.

    Decision table (sf0.1, measured r7, warmup + median-of-5 — see
    SCALING.md): probe 0.32 s; user-window 0.61 s; sharded 0.83 s. So for
    a ONE-SHOT call at this size the probe does not pay (0.32 + 0.61 >
    0.83) — use the dispatcher when the corpus is bigger (the hot-corpus
    saving is 0.2-6 s at 2M-32M events and grows with data, while the
    probe is one column-pruned sample scan), when skew is unknown and an
    indivisible-task stall is worse than +0.3 s, or when the probed share
    is reused across several windowed queries on the same frame — pass a
    pre-computed ``share`` (from one ``max_key_share`` call) to amortize
    the probe over every dispatched query on the frame (the CLI
    ``sessionize`` subcommand does exactly that)."""
    if share is None:
        share = max_key_share(ev, "user_id", sample_fraction)
    if share >= _skew_threshold(ev, threshold):
        return session_gap_sharded(ev, gap_min=gap_min, shard_hours=shard_hours)
    return session_gap_user_window(ev, gap_min=gap_min)


def asof_attribution_auto(
    ev: DataFrame,
    shard_hours: int = 24,
    threshold: float | None = None,
    sample_fraction: float = 0.01,
    share: float | None = None,
) -> DataFrame:
    """Skew-dispatched as-of attribution (same contract as
    ``session_gap_auto``, including the pre-computed ``share`` reuse):
    user-window form below the sampled hot-share threshold, time-sharded
    form at or above it; result-identical either way. The DECLARED
    ``ext_asof_attribution`` stays the sharded form."""
    if share is None:
        share = max_key_share(ev, "user_id", sample_fraction)
    if share >= _skew_threshold(ev, threshold):
        return asof_attribution_sharded(ev, shard_hours=shard_hours)
    return asof_attribution_user_window(ev)
