"""Skew hardening (VERDICT r3 #3): the guarded paths must hold on a
Zipfian / hot-key corpus, not just the uniform bench tables.

Two adversarial datasets, seeded + deterministic:

- a Zipfian document corpus (token frequency ∝ 1/rank^s) where common
  shingles appear in thousands of docs — the regime where a naive
  inverted-index pair join detonates quadratically and where the AllPairs
  prefix + length filters must keep candidates bounded;
- a hot-key events table (one user holds ~30% of all rows) joined to a
  dimension — the salted-join guard's target shape.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

N_DOCS = 20_000
VOCAB = 5_000
ZIPF_S = 1.4


@pytest.fixture(scope="module")
def zipf_docs_dir(spark, tmp_path_factory):
    rng = np.random.default_rng(7)
    ranks = np.arange(1, VOCAB + 1)
    p = 1.0 / ranks**ZIPF_S
    p /= p.sum()
    lengths = np.clip(rng.lognormal(3.3, 0.7, N_DOCS).astype(int), 5, 400)
    toks = rng.choice(VOCAB, size=int(lengths.sum()), p=p)
    words = np.array([f"w{i}" for i in range(VOCAB)])
    rows, pos = [], 0
    for i, ln in enumerate(lengths):
        rows.append((i, " ".join(words[toks[pos : pos + ln]])))
        pos += ln
    # plant near-dup pairs: for 100 random docs of ≥20 tokens add a copy
    # with one middle token replaced (a one-token edit in a short doc can
    # legitimately fall below the Jaccard threshold — 3 shingles change)
    long_enough = np.flatnonzero(lengths >= 20)
    planted = rng.choice(long_enough, 100, replace=False)
    next_id = N_DOCS
    for src in planted:
        t = rows[src][1].split()
        t[len(t) // 2] = "wMUT"
        rows.append((next_id, " ".join(t)))
        next_id += 1
    out = str(tmp_path_factory.mktemp("zipf") / "sf")
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(4).write.parquet(
        f"{out}/documents.parquet"
    )
    return out


def test_prefix_and_length_filters_bound_zipf_candidates(spark, zipf_docs_dir):
    from etl_airflow_adventureworks_spark.operators.dedup import (
        ngram_prefix_candidates,
        xxhash_shingle_sets,
    )

    sh = xxhash_shingle_sets(spark, zipf_docs_dir).localCheckpoint(eager=True)
    # what a naive inverted-index pair join would generate: Σ df·(df−1)/2
    # over shingle document frequencies (cheap to COUNT, catastrophic to
    # materialize)
    inv = sh.select("doc_id", F.explode(F.array_compact("hh")).alias("h"))
    naive_pairs = (
        inv.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(F.sum(F.expr("df * (df - 1) / 2")).alias("n"))
        .collect()[0]["n"]
    )
    cand_all = ngram_prefix_candidates(
        sh, length_filter=False, positional_filter=False
    ).count()
    cand_len = ngram_prefix_candidates(
        sh, length_filter=True, positional_filter=False
    ).count()
    cand_pos = ngram_prefix_candidates(
        sh, length_filter=True, positional_filter=True
    ).count()
    # prefix filtering must collapse the quadratic term (measured r4:
    # 226.7M naive → 5.49M prefix candidates, 41×), the length filter
    # must measurably cut what remains (measured: −20%), and the PPJoin
    # positional filter must cut meaningfully beyond the length prune
    assert naive_pairs > 100_000_000, f"corpus not adversarial enough: {naive_pairs}"
    assert cand_all < naive_pairs / 30, (cand_all, naive_pairs)
    assert cand_len < 0.85 * cand_all, (cand_len, cand_all)
    assert cand_pos < 0.7 * cand_len, (cand_pos, cand_len)
    print(f"[zipf] naive={naive_pairs} prefix={cand_all} +len={cand_len} +pos={cand_pos}")


def test_length_filter_is_exact_on_zipf_corpus(spark, zipf_docs_dir):
    # the filtered candidate set must lose NO true pair: verified results
    # from filtered vs unfiltered candidates are identical, and every
    # planted twin is found
    from etl_airflow_adventureworks_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        ngram_prefix_candidates,
        xxhash_shingle_sets,
    )

    sh = xxhash_shingle_sets(spark, zipf_docs_dir).localCheckpoint(eager=True)

    def verify(cand):
        sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("hh").alias("sh_a"))
        sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("hh").alias("sh_b"))
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        jac = inter.cast("double") / (F.size("sh_a") + F.size("sh_b") - inter)
        return (
            cand.join(sa, "doc_a")
            .join(sb, "doc_b")
            .filter(jac >= JACCARD_THRESHOLD)
            .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        )

    with_f = sorted(
        map(
            tuple,
            verify(
                ngram_prefix_candidates(sh, length_filter=True, positional_filter=True)
            ).collect(),
        )
    )
    without_f = sorted(
        map(
            tuple,
            verify(
                ngram_prefix_candidates(sh, length_filter=False, positional_filter=False)
            ).collect(),
        )
    )
    assert with_f == without_f
    found = {(a, b) for a, b, _ in with_f}
    # all 100 planted twins recovered (copy ↔ source, one token changed)
    planted_found = sum(1 for a, b in found if b >= N_DOCS)
    assert planted_found >= 100, planted_found


@pytest.fixture(scope="module")
def hot_events_dir(spark, tmp_path_factory):
    """Events table with a Zipf-head user: user 0 holds ~30% of 150k events
    over a 30-day range — the straggler shape for user-partitioned windows.
    Written as a SINGLE driver-layout events.parquet file (pyarrow, NTZ µs
    ts — the shape stream_events's pathGlobFilter expects) so the declared
    queries and streaming twins load it unchanged."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(23)
    n = 150_000
    hot = rng.random(n) < 0.3
    user = np.where(hot, 0, 1 + (rng.zipf(1.8, n) % 4000))
    epoch_2025_us = 1_735_689_600_000_000
    offs_us = epoch_2025_us + np.sort(rng.integers(0, 30 * 86400 * 1_000_000, n))
    kinds = np.array(["view", "click", "purchase", "signup", "error"])
    table = pa.table(
        {
            "event_id": pa.array(np.arange(n), type=pa.int64()),
            "ts": pa.array(offs_us, type=pa.timestamp("us")),
            "user_id": pa.array(user.astype(np.int64)),
            "event_type": pa.array(kinds[np.arange(n) % 5]),
            "value": pa.array(rng.random(n)),
            "props": pa.array(['{"k": %d}' % (i % 97) for i in range(n)]),
        }
    )
    out = tmp_path_factory.mktemp("hotev") / "sf"
    out.mkdir()
    pq.write_table(table, out / "events.parquet", row_group_size=20_000)
    return str(out)


def test_sharded_sessionizer_exact_on_hot_user_corpus(spark, hot_events_dir):
    """The DECLARED sessionizer (time-sharded since round 6) must return
    EXACTLY the textbook user-window twin's rows on the hot-user corpus
    (sessions that span shard boundaries stitch back together), while its
    heavy pass keys on (user, shard) — the hot user's maximum per-task
    group shrinks by ~the shard count instead of landing on one window
    task."""
    import __spark_entry__ as entrymod
    from etl_airflow_adventureworks_spark.operators.sessionize import (
        session_gap_user_window,
    )
    from etl_airflow_adventureworks_spark.sources import load_table

    ev = load_table(spark, hot_events_dir, "events")
    want = sorted(map(tuple, session_gap_user_window(ev).collect()))
    got = sorted(
        map(tuple, entrymod.queries()["ext_session_gap"](spark, hot_events_dir).collect())
    )
    assert got == want
    # skew evidence: the declared form's window partition (user) vs the
    # sharded form's (user, shard) — max group size drops ~shard-count-fold,
    # which IS the max-task-input ratio for an indivisible window partition
    by_user = ev.groupBy("user_id").count().agg(F.max("count")).collect()[0][0]
    by_user_shard = (
        ev.selectExpr("user_id", "unix_micros(ts) div 86400000000 AS shard")
        .groupBy("user_id", "shard")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert by_user > 0.25 * 150_000  # the corpus really is hot
    assert by_user_shard < by_user / 10, (by_user_shard, by_user)


def test_sharded_asof_exact_on_hot_user_corpus(spark, hot_events_dir):
    """The DECLARED as-of attribution (time-sharded since round 6) must
    return EXACTLY the textbook user-window twin's rows on the hot-user
    corpus — including purchases whose most recent prior view sits in an
    EARLIER time shard (the carry-in stitch)."""
    import __spark_entry__ as entrymod
    from etl_airflow_adventureworks_spark.operators.sessionize import (
        asof_attribution_user_window,
    )
    from etl_airflow_adventureworks_spark.sources import load_table

    ev = load_table(spark, hot_events_dir, "events")
    want = sorted(map(tuple, asof_attribution_user_window(ev).collect()))
    got = sorted(
        map(
            tuple,
            entrymod.queries()["ext_asof_attribution"](spark, hot_events_dir).collect(),
        )
    )
    assert got == want and len(got) > 0


def test_declared_session_queries_green_on_hot_user_corpus(spark, hot_events_dir):
    """The declared batch sessionizer and the Structured Streaming twin must
    agree on the adversarial corpus too (r4 proved them equal on uniform
    events only)."""
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    # the streaming form carries no per-user session ordinal — compare the
    # session identity tuple both emit
    batch = sorted(
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in q["ext_session_gap"](spark, hot_events_dir).collect()
    )
    stream = sorted(
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in q["ext_stream_session_equiv"](spark, hot_events_dir).collect()
    )
    assert len(batch) > 0
    assert batch == stream


def test_salted_join_on_hot_key_events(spark, tmp_path):
    """One user holds ~30% of 200k events (a single hash partition would
    carry 60k rows — the straggler shape). The salted join must return
    exactly the plain join's rows; checksum-compared, not sampled."""
    from etl_airflow_adventureworks_spark.operators.skew import salted_join

    rng = np.random.default_rng(11)
    n = 200_000
    hot = rng.random(n) < 0.3
    user = np.where(hot, 0, rng.integers(1, 5000, n))
    value = rng.integers(0, 1_000_000, n)
    events = spark.createDataFrame(
        list(zip(range(n), user.tolist(), value.tolist())),
        "event_id long, user_id long, value long",
    )
    dim = spark.range(5000).select(
        F.col("id").alias("uid"), (F.col("id") % 7).alias("segment")
    )

    def checksum(df):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("event_id", "user_id", "value", "segment").cast("decimal(38,0)")).alias("x"),
        ).collect()[0]
        return row["n"], row["x"]

    plain = events.join(dim, events.user_id == dim.uid, "inner").select(
        "event_id", "user_id", "value", "segment"
    )
    salted = salted_join(events, dim, "user_id", "uid", "inner", n_salts=16).select(
        "event_id", "user_id", "value", "segment"
    )
    assert checksum(salted) == checksum(plain)
    # the hot key really is spread: max rows per (key, salt) task input ≈
    # hot_rows / n_salts, asserted via the salted frame's group sizes
    groups = (
        events.withColumn("__salt", (F.rand(seed=0) * 16).cast("int"))
        .groupBy("user_id", "__salt")
        .count()
        .agg(F.max("count").alias("mx"))
        .collect()[0]["mx"]
    )
    hot_rows = int(hot.sum())
    assert groups < hot_rows * 0.12  # ≈1/16 + slack, vs 1.0 unsalted


def test_skew_dispatch_routes_by_sampled_hot_share(spark, hot_events_dir):
    """r7 dispatcher (VERDICT r6 #4): on the 30%-hot corpus the sampled
    probe must route to the sharded forms; on a uniform corpus it must
    pick the user-window twins (cheaper there). Either way results are
    identical to the declared queries, so dispatch is pure cost."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from etl_airflow_adventureworks_spark.operators.sessionize import (
        asof_attribution_auto,
        max_key_share,
        session_gap_auto,
    )
    from etl_airflow_adventureworks_spark.sources import load_table

    ev_hot = load_table(spark, hot_events_dir, "events")
    share_hot = max_key_share(ev_hot, "user_id", fraction=0.05)
    assert share_hot > 0.2  # the probe sees the hot user

    # hot corpus → sharded plan (windows partitioned on (user, shard))
    plan = session_gap_auto(ev_hot)._jdf.queryExecution().optimizedPlan().toString()
    assert "shard" in plan
    plan = asof_attribution_auto(ev_hot)._jdf.queryExecution().optimizedPlan().toString()
    assert "shard" in plan

    # uniform corpus → user-window plan (no shard column anywhere)
    ev_uni = ev_hot.withColumn(
        "user_id", F.xxhash64("event_id") % 10_000
    )
    assert max_key_share(ev_uni, "user_id", fraction=0.05) < 0.01
    plan = session_gap_auto(ev_uni)._jdf.queryExecution().optimizedPlan().toString()
    assert "shard" not in plan
    plan = asof_attribution_auto(ev_uni)._jdf.queryExecution().optimizedPlan().toString()
    assert "shard" not in plan

    # and the dispatched result equals the declared sharded query (hot path)
    got = sorted(map(tuple, session_gap_auto(ev_hot).collect()))
    want = sorted(
        map(tuple, entrymod.queries()["ext_session_gap"](spark, hot_events_dir).collect())
    )
    assert got == want
