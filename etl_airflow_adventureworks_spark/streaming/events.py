"""Structured Streaming over the events table (SURVEY.md §2.8 [EXT]).

The reference has no streaming; the charter maps the events table to
Structured Streaming: readStream → watermarked windowed aggregations /
session windows / custom stateful ops → writeStream. Batch twins of the
window math live in ``operators.sessionize`` and are DuckDB-oracle-checked;
these builders produce the *same plans* against an unbounded source.

Local testing drives a parquet directory through the memory sink with
``processAllAvailable()`` (pyspark_guide §Structured Streaming); in
production the source swaps to Kafka with identical downstream plans.
"""

from __future__ import annotations

import itertools
import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.sessionize import SESSION_GAP_MIN
from ..registry import query
from ..sources.parquet import events_ts_physical_type, normalize_events_ts


def events_schema(ts_type: T.DataType) -> T.StructType:
    """events schema with the caller-chosen ``ts`` storage type — streaming
    sources need an explicit schema, and the driver's snapshots have shipped
    ``ts`` as both TIMESTAMP(NANOS) (read as long) and TIMESTAMP(MICROS)
    NTZ, so the right type is data-dependent (see sources.parquet)."""
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def raw_events_schema(sf_dir: str, spark: SparkSession | None = None) -> T.StructType:
    """Schema matching ``{sf_dir}/events.parquet`` as physically stored.

    For non-local URIs (s3://, hdfs://) the pyarrow footer peek returns
    "unknown"; streaming binds its schema UP FRONT (the batch path
    normalizes post-read), so with a session available we resolve the
    stored ``ts`` class through a Spark batch footer read of the same
    path — works on every Hadoop filesystem and distinguishes NTZ from
    tz-aware micros (both encodings this repo itself produces). Only when
    no session is passed does "unknown" fall back to NTZ micros (what
    current warehouse snapshots store), failing loudly on the first
    micro-batch if the remote files disagree."""
    kind = events_ts_physical_type(sf_dir)
    if kind == "unknown" and spark is not None:
        # the probe read itself must tolerate TIMESTAMP(NANOS) footers —
        # without nanosAsLong a NANOS file makes the probe throw, leaving
        # one of the two encodings this docstring promises to distinguish
        # unresolvable over s3://-style paths (r6 ADVICE). Set it for the
        # probe, restore after: NANOS then resolves to LongType (the
        # nanos-as-long schema), MICROS paths are unaffected by the flag.
        key = "spark.sql.legacy.parquet.nanosAsLong"
        prev = spark.conf.get(key, None)
        spark.conf.set(key, "true")
        try:
            ts_type = spark.read.parquet(f"{sf_dir}/events.parquet").schema[
                "ts"
            ].dataType
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
        return events_schema(ts_type)
    if kind == "timestamp[ns]":
        return events_schema(T.LongType())  # nanos-as-long
    if kind in ("timestamp[us]", "unknown"):
        return events_schema(T.TimestampNTZType())
    return events_schema(T.TimestampType())


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbounded scan of the events table (one-file-per-trigger so a local
    run exercises multiple micro-batches)."""
    schema = raw_events_schema(sf_dir, spark)
    # key the session conf off the RESOLVED schema, not the local peek —
    # a remote NANOS file resolves to LongType through the probe above and
    # needs the same flag for the streaming read itself (r6 ADVICE)
    if isinstance(schema["ts"].dataType, T.LongType):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_events_ts(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


def windowed_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window counts — the streaming twin of
    ext_event_window_1h (late data beyond the watermark is dropped;
    state is bounded by watermark horizon × window count)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp(F.col("window.start")).cast("long").alias("window_start_s"),
            "event_type",
            "n_events",
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native session windows (gap-merged) per user — the streaming twin of
    the batch lag-gap sessionizer ext_session_gap."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            "n_events",
        )
    )


def deduped_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id — the ingestion-side twin of the
    batch E1 dedup: duplicates arriving within the watermark horizon are
    dropped with BOUNDED state (dropDuplicatesWithinWatermark evicts ids
    older than the watermark; plain dropDuplicates would grow state
    forever on an unbounded stream)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user running
    event count + value total, emitted once per micro-batch (update mode).

    This is the charter's 'custom stateful operator' path — state the
    built-in window aggs can't express (a monotonically updated per-key
    accumulator surfaced every batch). State is two numbers per user:
    bounded, no watermark needed. The worker function is self-contained
    (local imports only) so Python workers need no repo sys.path.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as _pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield _pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_upsert_to_parquet(
    events: DataFrame, out_path: str, checkpoint: str
) -> "object":
    """Incremental load: foreachBatch merges each micro-batch's per-user
    aggregates into a parquet state table via SCD1 upsert — the
    streaming→warehouse ingestion pattern (pyspark_guide: 'For exactly-once
    sinks: foreachBatch'). Returns the started StreamingQuery.

    Atomicity caveat: plain parquet overwrite is NOT transactional — a
    crash mid-rewrite can leave the state table truncated (restart replays
    the micro-batch and rewrites it, so the steady state self-heals, but a
    reader in that window sees partial data). Production deployments point
    this at a lakehouse table format with atomic commit (Delta/Iceberg
    MERGE) for true exactly-once; the merge logic is unchanged."""
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    from ..operators.upsert import scd1_upsert

    per_batch = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value")
    )

    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        # update-mode emissions are CUMULATIVE per key (streaming state holds
        # the running aggregate), so the merge is a plain SCD1 replace.
        spark = batch_df.sparkSession
        batch_df = batch_df.localCheckpoint(eager=True)  # detach from stream plan
        try:
            current = spark.read.parquet(out_path)
        except AnalysisException:
            # path-not-found on the first batch ONLY; any other failure
            # (corrupt footer, transient IO) re-raises instead of silently
            # discarding the accumulated state with an overwrite.
            current = None
        if current is None:
            batch_df.write.mode("overwrite").parquet(out_path)
        else:
            merged = scd1_upsert(current, batch_df, "user_id").localCheckpoint(eager=True)
            merged.write.mode("overwrite").parquet(out_path)

    return (
        per_batch.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(merge)
        .start()
    )


@query(
    "ext_stream_window_equiv",
    oracle="""
    SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS window_start_s,
           CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) + 3600 AS BIGINT) AS window_end_s,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def ext_stream_window_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming↔batch equivalence, driver-checked: the watermarked
    Structured Streaming tumbling-window aggregation runs THROUGH the
    streaming engine (readStream → withWatermark → window agg → memory
    sink, complete mode, processAllAvailable) and its result is compared to
    the SAME DuckDB oracle as the batch twin ``ext_event_window_1h`` — so
    the streaming engine itself is correctness-gated, not just the batch
    re-expression of its math. Since round 3 this row also carries SURVEY
    op-style coverage for the batch twin ``ext_event_window_1h`` (folded —
    same math, same oracle; the batch form remains a library function,
    result-identity-tested against this one).

    Deliberately eager (as is ext_stream_session_equiv): a streaming query
    has no lazy batch plan to hand back — the builder drives the stream to
    completion once per (session, sf_dir) and returns the materialized
    memory-sink table (memoized; see _run_stream_memoized). The parquet
    source is a single file → one micro-batch → the 2h watermark drops
    nothing (late-data semantics are exercised separately in
    tests/test_streaming.py)."""
    def build() -> DataFrame:
        return (
            stream_events(spark, sf_dir)
            .withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.expr("CAST(value AS DECIMAL(18,6))")).cast("double").alias("total_value"),
            )
            .select(
                F.unix_timestamp(F.col("window.start")).cast("long").alias("window_start_s"),
                F.unix_timestamp(F.col("window.end")).cast("long").alias("window_end_s"),
                "event_type",
                "n_events",
                "total_value",
            )
        )

    return _run_stream_memoized(spark, sf_dir, "stream_window_equiv", build)


@query(
    "ext_stream_session_equiv",
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
    SELECT user_id,
           min(ts_us) AS session_start_us,
           max(ts_us) AS session_end_us,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM sess
    GROUP BY user_id, session_id
    """,
)
def ext_stream_session_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SESSION-WINDOW equivalence, driver-checked: gap-merged
    ``session_window`` sessions run THROUGH the streaming engine (readStream
    → withWatermark → session_window agg → memory sink, complete mode) and
    the result is compared to the same lag-gap DuckDB oracle family as the
    batch sessionizer ``ext_session_gap`` — this row gates the streaming
    session-state machinery itself (merging/expiring session state), which
    ``ext_stream_window_equiv`` (keyed tumbling windows) does not exercise.

    Boundary convention verified empirically: ``session_window`` merges an
    event exactly ``gap`` after the previous one (diff ≤ gap ⇒ same
    session), identical to the oracle's ``diff > gap ⇒ new session``.
    ``session_window.end`` is last-event-ts + gap, so the last event time
    is recovered by subtracting the gap — the output surfaces exact epoch
    integers on both sides (nanos don't round-trip; see memory rules)."""
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000

    def build() -> DataFrame:
        return (
            stream_events(spark, sf_dir)
            .withWatermark("ts", "2 hours")
            .groupBy(F.session_window("ts", f"{SESSION_GAP_MIN} minutes"), "user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.expr("CAST(value AS DECIMAL(18,6))")).cast("double").alias("total_value"),
            )
            .select(
                "user_id",
                F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
                (F.unix_micros(F.col("session_window.end")) - F.lit(gap_us)).alias(
                    "session_end_us"
                ),
                "n_events",
                "total_value",
            )
        )

    return _run_stream_memoized(spark, sf_dir, "stream_session_equiv", build)


#: materialized memory-sink table per (session, sf_dir, query) — the two
#: declared streaming queries are necessarily eager (a stream has no lazy
#: batch plan to hand back), so repeated builder calls return the already-
#: materialized table instead of re-driving the stream; the itertools
#: counter keeps sink names unique across sessions/sf_dirs (no collisions
#: when builds overlap).
_STREAM_MEMO: dict[tuple[int, str, str], str] = {}
_STREAM_UID = itertools.count()


def clear_stream_memo() -> None:
    """Forget materialized streaming results (bench uses this so repeated
    timings re-drive the engine instead of reading the memo) AND release
    the two driver-heap anchors that otherwise leak result-set-sized heap
    per repetition (each measured as an 8 GB-driver stall/OOM at 100×
    data): the memory-sink temp views, and the STOPPED StreamingQuery
    objects — ``StreamingQueryManager`` keeps every terminated query (and
    through it the MemorySink's full row set) referenced until
    ``resetTerminated()``, so dropping the view alone frees nothing."""
    seen: set[int] = set()
    for spark, table in _STREAM_MEMO.values():
        try:
            spark.catalog.dropTempView(table)
            if id(spark) not in seen:
                seen.add(id(spark))
                spark.streams.resetTerminated()
        except Exception:
            pass  # session already stopped — nothing to free
    _STREAM_MEMO.clear()


#: target source bytes per stateful shuffle partition for the local
#: equivalence harness (r16). Each stateful partition is a RocksDB
#: instance that must be opened, committed and checkpointed EVERY
#: micro-batch — with the session's 32 shuffle partitions over a 2 MB
#: events file, state-store lifecycle was ~75% of the harness wall time
#: (measured 6.2 s → 1.6 s per run at sf0.1 after sizing). Overridable
#: per deployment via SPARK_GRAFT_STREAM_STATE_PARTITIONS.
_STATE_PARTITION_BYTES = 64 * 1024 * 1024


def _harness_state_partitions(spark: SparkSession, sf_dir: str) -> int | None:
    """Scale-adaptive stateful-partition count for the equivalence harness:
    ~one state store per 64 MiB of source (floor 4), capped at the
    session's shuffle partitions. A constant 32 was tuned for neither
    local mode (32 RocksDB opens for 2 MB of events) nor a cluster (a
    real stream wants state partitions ~ executor cores, set via the
    session conf this derives from). Non-local sources return None — the
    session default stands, since file size isn't POSIX-visible there."""
    env = os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS")
    if env:
        try:
            return int(env)
        except ValueError:
            raise ValueError(
                "SPARK_GRAFT_STREAM_STATE_PARTITIONS must be an integer "
                f"partition count, got {env!r}"
            ) from None
    try:
        path = f"{sf_dir}/events.parquet"
        if os.path.isdir(path):  # multi-file table (r17 bench layout)
            size = sum(
                e.stat().st_size
                for e in os.scandir(path)
                if e.name.endswith(".parquet")
            )
        else:
            size = os.path.getsize(path)
    except OSError:
        return None
    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return max(4, min(cap, math.ceil(size / _STATE_PARTITION_BYTES)))


def _run_stream_memoized(
    spark: SparkSession, sf_dir: str, key: str, build
) -> DataFrame:
    memo_key = (id(spark), sf_dir, key)
    hit = _STREAM_MEMO.get(memo_key)
    if hit is None:
        table = f"{key}_{next(_STREAM_UID)}"
        run_to_memory(
            build(),
            table,
            state_partitions=_harness_state_partitions(spark, sf_dir),
        )
        _STREAM_MEMO[memo_key] = (spark, table)
    else:
        _, table = hit
    return spark.table(table)


def run_to_memory(
    df: DataFrame,
    name: str,
    output_mode: str = "complete",
    state_partitions: int | None = None,
) -> None:
    """Drive a streaming plan to completion over a static source: memory
    sink + processAllAvailable (synchronous; test-only).

    ``state_partitions`` (r16) sizes the stateful shuffle for the run —
    the conf is bound at query start, so it is set before ``start()`` and
    restored after the drive completes. The set/restore mutates the
    SESSION's conf: this harness assumes the single-threaded test/bench
    driver (nothing else plans queries on the session mid-drive); a
    concurrent planner on the same session would inherit the harness
    sizing for plans built inside this window. In complete mode the trailing
    no-data micro-batch is also skipped: complete-mode output is a pure
    function of final state, so the extra batch re-commits every state
    store (one RocksDB checkpoint per partition) and can never change the
    result. Append/update modes keep no-data batches — watermark-driven
    eviction/emission there is the thing under test."""
    spark = df.sparkSession
    scoped: dict[str, str | None] = {}
    if state_partitions is not None:
        scoped["spark.sql.shuffle.partitions"] = str(state_partitions)
    if output_mode == "complete":
        scoped["spark.sql.streaming.noDataMicroBatches.enabled"] = "false"
    old: dict[str, str | None] = {}
    for k, v in scoped.items():
        old[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        q = (
            df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def session_state_per_batch(
    spark: SparkSession,
    files_dir: str,
    output_mode: str,
    gap_min: int = SESSION_GAP_MIN,
    watermark: str = "2 hours",
) -> list[dict]:
    """Bounded-state EVIDENCE probe (VERDICT r4 #4): replay a time-ordered
    multi-file events directory one file per micro-batch through the
    session aggregation in the given output mode and return, per non-empty
    micro-batch, the session operator's state-store footprint:

      {rows: numRowsTotal, removed: numRowsRemoved, input: numInputRows}

    The production claim under test: with ``append`` + watermark, state
    holds only sessions the watermark hasn't closed — the per-batch row
    count PLATEAUS as the stream advances (eviction ≈ admission) — while
    ``complete`` retains every session ever seen and numRowsTotal grows
    monotonically with the stream. The sf10 scaling number for
    ``ext_stream_session_equiv`` is the complete-mode harness shape; this
    probe is the measured counterpart showing the production shape is
    bounded. Files must carry ``ts`` as TimestampType (what
    ``_split_events_at``-style Spark rewrites produce)."""
    agg = (
        spark.readStream.schema(events_schema(T.TimestampType()))
        .option("maxFilesPerTrigger", 1)
        .parquet(files_dir)
        .withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", f"{gap_min} minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("noop")
        .start()
    )
    try:
        q.processAllAvailable()
        progress = [
            p if isinstance(p, dict) else p.asDict() for p in q.recentProgress
        ]
    finally:
        q.stop()
    out = []
    for p in progress:
        if p["numInputRows"] <= 0 or not p.get("stateOperators"):
            continue
        op = p["stateOperators"][0]
        out.append(
            {
                "rows": op["numRowsTotal"],
                "removed": op.get("numRowsRemoved", 0),
                "input": p["numInputRows"],
            }
        )
    return out
