"""Stream-stream interval joins (watermarked, state-bounded).

The canonical shape is impressions ⋈ clicks: two unbounded event streams,
matched on a shared key, with the right-side timestamp constrained to an
interval anchored at the left-side timestamp (``click within 1 h after the
impression``).  Structured Streaming supports this natively when BOTH sides
carry an event-time watermark and the join condition includes the time
range — the engine then derives a per-side state-retention horizon and
evicts rows the range can no longer match, so state is bounded by
``arrival rate × (watermark delay + interval width)`` per key, not by the
length of the streams.

100-TB posture: both sides hash-partition on the join key (one shuffle
each, the same exchange a batch equi-join would do); state lives in the
per-partition state store (RocksDB in production) and is keyed by the
equi-join key, so a 1000-executor cluster shards it the same way it shards
the join itself.  The interval bound is what makes eviction possible —
an unbounded-time stream-stream join would hold every row forever, which
is why this module refuses to build one.

Batch parity: ``interval_join_batch`` is the same join expressed over two
static frames — the strict oracles in ``tests/test_stream_join.py`` assert
the streamed result equals it exactly (inner: all pairs; left-outer: all
pairs plus NULL-extensions for precisely the watermark-closed unmatched
rows), including across a checkpoint kill-and-restart.

Reference scope note: the reference (Cgmc18/ETL-AirFlow-AdventureWorks)
is batch-only Airflow DAGs — stream-stream joins are charter breadth
(SURVEY §2 E5's streaming leg), not reference parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_VALID_HOW = ("inner", "left_outer", "right_outer", "full_outer")


def _interval_expr(ts_col: str, offset: str) -> Column:
    """``ts + INTERVAL <offset>`` with the offset validated as a day-time
    interval literal (signed values like ``-30 minutes`` are fine)."""
    offset = offset.strip()
    # fail at plan-build time with a clear message, not deep in analysis
    head = offset.split(None, 1)[0].lstrip("+-") if offset else ""
    if not head or not head.replace(".", "", 1).isdigit():
        raise ValueError(
            f"interval offset must look like '[-]N unit' (got {offset!r})"
        )
    return F.expr(f"`{ts_col}` + interval {offset}")


def _has_watermark(df: DataFrame, ts_col: str) -> bool:
    """True if ``ts_col`` already carries the engine's watermark-delay
    metadata (set by withWatermark, preserved through renames/joins)."""
    for f in df.schema.fields:
        if f.name == ts_col:
            return "spark.watermarkDelayMs" in (f.metadata or {})
    return False


def _demote_extra_event_time(df: DataFrame, keep: str) -> DataFrame:
    """Strip watermark metadata from every event-time column except
    ``keep``: a stream feeding a stateful operator may carry at most ONE
    event-time column, but a stream-stream join's output carries one per
    side. Re-aliasing with EXPLICIT empty metadata overrides the
    propagated metadata, so the values are untouched and only the
    event-time tag is dropped."""
    for f in df.schema.fields:
        if f.name != keep and "spark.watermarkDelayMs" in (f.metadata or {}):
            df = df.withColumn(f.name, F.col(f.name).alias(f.name, metadata={}))
    return df


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
    rsuffix: str = "_r",
) -> DataFrame:
    """Join two watermarked streams on ``on`` with
    ``left.left_ts + lower <= right.right_ts <= left.left_ts + upper``.

    Right-side columns whose names collide with a left-side column
    (including the key and timestamp columns) are suffixed with
    ``rsuffix`` in the output, pandas-style, so two streams of the same
    schema join without caller-side renames.  The watermark delay applies
    to both sides; choose it larger than the interval width or cross-batch
    matches near the horizon may be dropped (the strict-oracle tests run
    with delay = 2 h over a 1 h interval for exactly this reason).
    """
    if how not in _VALID_HOW:
        raise ValueError(f"how must be one of {_VALID_HOW}, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if not keys:
        raise ValueError("stream_interval_join needs at least one equi-key")
    for c in keys + [left_ts]:
        if c not in left.columns:
            raise ValueError(f"left stream lacks column {c!r}")
    for c in keys + [right_ts]:
        if c not in right.columns:
            raise ValueError(f"right stream lacks column {c!r}")

    # A side that is ALREADY watermarked on its event-time column (e.g.
    # the output of a previous stream_interval_join in a chained funnel)
    # must not be re-stamped: since multi-stateful-operator support,
    # redefining a watermark is an error and the engine propagates the
    # upstream watermark through the join instead.
    lw = left if _has_watermark(left, left_ts) else left.withWatermark(left_ts, watermark)
    rw = right if _has_watermark(right, right_ts) else right.withWatermark(right_ts, watermark)
    lw = _demote_extra_event_time(lw, left_ts)
    rw = _demote_extra_event_time(rw, right_ts)

    # pandas-style disambiguation: suffix every colliding right column
    taken = set(left.columns)
    renames = {c: f"{c}{rsuffix}" for c in right.columns if c in taken}
    clash = [v for v in renames.values() if v in taken or v in right.columns]
    if clash:
        raise ValueError(
            f"rsuffix {rsuffix!r} still collides on {sorted(clash)}; "
            "pick another suffix"
        )
    for old, new in renames.items():
        rw = rw.withColumnRenamed(old, new)
    r_keys = [renames.get(k, k) for k in keys]
    r_ts = renames.get(right_ts, right_ts)

    cond = F.lit(True)
    for lk, rk in zip(keys, r_keys):
        cond = cond & (lw[lk] == rw[rk])
    # the range condition MUST be on the raw event-time columns so the
    # engine's watermark analysis can derive state-eviction bounds
    cond = (
        cond
        & (rw[r_ts] >= _interval_expr(left_ts, lower))
        & (rw[r_ts] <= _interval_expr(left_ts, upper))
    )
    joined = lw.join(rw, on=cond, how=how)
    # keys appear on both sides post-join; for inner/left_outer the left
    # copy is authoritative (equal, or the right copy is NULL) so the
    # right copy is dropped; for right/full outer keep both (the left copy
    # is NULL on right-only rows and the caller coalesces)
    if how in ("inner", "left_outer"):
        joined = joined.drop(*[rw[rk] for rk in r_keys])
    return joined


def join_state_per_batch(
    spark,
    left_dir: str,
    right_dir: str,
    *,
    left_schema: str,
    right_schema: str,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> list[dict]:
    """Bounded-state EVIDENCE probe for the stream-stream join (the join
    twin of ``events.session_state_per_batch``): replay two time-ordered
    multi-file directories one file per micro-batch through
    ``stream_interval_join`` and return, per non-empty batch, the join
    operator's state-store footprint:

      {rows: numRowsTotal, removed: numRowsRemoved, input: numInputRows}

    The production claim under test: with the interval bound + watermark,
    the engine derives per-side eviction horizons (the ``state cleanup``
    predicates visible in the physical plan), so state holds only rows the
    range can still match — at a steady arrival rate the per-batch row
    count PLATEAUS (eviction ≈ admission) instead of growing with stream
    length. Gated by ``tests/test_stream_join.py::
    test_inner_join_state_plateaus``; curve committed in
    STREAM_STATE.json."""
    left = (
        spark.readStream.schema(left_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(left_dir)
    )
    right = (
        spark.readStream.schema(right_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(right_dir)
    )
    joined = stream_interval_join(
        left,
        right,
        on,
        left_ts=left_ts,
        right_ts=right_ts,
        lower=lower,
        upper=upper,
        watermark=watermark,
        how=how,
    )
    q = joined.writeStream.outputMode("append").format("noop").start()
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


def interval_join_batch(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "1 hour",
    how: str = "inner",
    rsuffix: str = "_r",
) -> DataFrame:
    """The identical join over two STATIC frames — the oracle twin of
    ``stream_interval_join`` (no watermark: batch results are complete by
    construction).  For the scale path over large static corpora use
    ``operators.rangejoin.range_join`` / ``interval_join``, which rewrite
    the non-equi condition into a sharded equi-join; this twin keeps the
    plan literally identical to the streamed one so the equality oracle
    compares like with like."""
    keys = [on] if isinstance(on, str) else list(on)
    taken = set(left.columns)
    renames = {c: f"{c}{rsuffix}" for c in right.columns if c in taken}
    rr = right
    for old, new in renames.items():
        rr = rr.withColumnRenamed(old, new)
    r_keys = [renames.get(k, k) for k in keys]
    r_ts = renames.get(right_ts, right_ts)
    cond = F.lit(True)
    for lk, rk in zip(keys, r_keys):
        cond = cond & (left[lk] == rr[rk])
    cond = (
        cond
        & (rr[r_ts] >= _interval_expr(left_ts, lower))
        & (rr[r_ts] <= _interval_expr(left_ts, upper))
    )
    joined = left.join(rr, on=cond, how=how)
    if how in ("inner", "left_outer"):
        joined = joined.drop(*[rr[rk] for rk in r_keys])
    return joined


_STATIC_HOW = ("inner", "left", "left_semi", "left_anti")


def stream_static_join(
    stream: DataFrame,
    static: DataFrame,
    on: str | list[str],
    *,
    how: str = "left",
    broadcast: bool = True,
    rsuffix: str = "_r",
) -> DataFrame:
    """Enrich an unbounded stream with a STATIC dimension table — the
    everyday streaming shape (events ⋈ campaign/user/product dims).

    Stateless by construction: Structured Streaming plans a stream-static
    join as an ordinary per-micro-batch join, so there is NO state store,
    no watermark requirement, and the static side is re-resolved per
    batch.  With ``broadcast=True`` (the default — dims are small) the
    dim ships to every executor once per batch and the stream side never
    shuffles; set ``broadcast=False`` for a dim too large to broadcast
    and the batch planner falls back to a shuffled join per micro-batch.

    ``how`` is restricted to the shapes Spark supports with the stream on
    the left (``inner``, ``left``, ``left_semi``, ``left_anti``) —
    right/full outer against a stream-left would need unbounded state and
    is refused by the engine anyway.  Colliding non-key static columns
    get ``rsuffix``, pandas-style; key columns merge (plain column-name
    join), so no duplicate key copies appear in the output.

    Dim-freshness caveat: "re-resolved per batch" means the static
    side's PLAN re-executes each micro-batch, but a plain parquet
    DataFrame pins its file listing when it is created — an overwritten
    dim is NOT picked up mid-query (and may fail the scan once the old
    files vanish).  To follow a changing dim, restart the query with a
    fresh dim frame (cheap under AvailableNow-style periodic runs) or
    read the dim through a table format whose snapshot resolution is
    per-batch.
    """
    if how not in _STATIC_HOW:
        raise ValueError(f"how must be one of {_STATIC_HOW}, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if not keys:
        raise ValueError("stream_static_join needs at least one equi-key")
    for c in keys:
        if c not in stream.columns:
            raise ValueError(f"stream lacks key column {c!r}")
        if c not in static.columns:
            raise ValueError(f"static side lacks key column {c!r}")

    taken = set(stream.columns)
    renames = {
        c: f"{c}{rsuffix}"
        for c in static.columns
        if c in taken and c not in keys
    }
    clash = [v for v in renames.values() if v in taken or v in static.columns]
    if clash:
        raise ValueError(
            f"rsuffix {rsuffix!r} still collides on {sorted(clash)}; "
            "pick another suffix"
        )
    st = static
    for old, new in renames.items():
        st = st.withColumnRenamed(old, new)
    if broadcast:
        st = F.broadcast(st)
    return stream.join(st, on=keys, how=how)
