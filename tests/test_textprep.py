"""Gates for the training-data prep operators (textprep): deterministic
splits, context-window chunking, sequence packing."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_ORACLE

from etl_airflow_adventureworks_spark.operators.textprep import (
    chunk_documents,
    pack_sequences,
    split_by_hash,
)
from etl_airflow_adventureworks_spark.sources import load_table


def test_split_disjoint_exhaustive_stable(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = split_by_hash(docs, "doc_id", w, seed=13).select("doc_id", "split")
    rows = out.collect()
    assert len(rows) == docs.count()  # exhaustive, one split per row
    by_split = {}
    for r in rows:
        by_split.setdefault(r["split"], set()).add(r["doc_id"])
    assert set(by_split) <= set(w)
    # proportions near weights (hash-uniform; 500 docs → generous tolerance)
    n = len(rows)
    assert abs(len(by_split["train"]) / n - 0.8) < 0.08
    # deterministic: same assignment when input order is scrambled
    again = {
        r["doc_id"]: r["split"]
        for r in split_by_hash(
            docs.orderBy(F.desc("doc_id")), "doc_id", w, seed=13
        ).collect()
    }
    assert all(again[r["doc_id"]] == r["split"] for r in rows)
    # different seed → different partitioning (sanity that seed matters)
    other = {
        r["doc_id"]: r["split"]
        for r in split_by_hash(docs, "doc_id", w, seed=14).collect()
    }
    assert any(other[r["doc_id"]] != r["split"] for r in rows)


def test_chunks_cover_and_overlap_exactly(spark):
    docs = load_table(spark, SF_ORACLE, "documents").limit(50)
    m, ov = 64, 16
    chunks = chunk_documents(docs, max_tokens=m, overlap=ov).collect()
    texts = {r["doc_id"]: r["text"].strip().split() for r in docs.collect()}
    by_doc = {}
    for r in chunks:
        assert r["n_tokens"] <= m
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(texts)
    stride = m - ov
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r["chunk_idx"])
        toks = texts[doc_id]
        rebuilt = []
        for i, r in enumerate(rs):
            got = r["chunk_text"].split(" ") if r["chunk_text"] else [""]
            start = i * stride
            assert got == toks[start : start + m] or (toks == [] and got == [""])
            rebuilt.extend(got if i == 0 else got[ov:])
        assert rebuilt == toks or toks == []


def test_pack_sequences_exact_partition_within_budget(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    budget, shards = 512, 16
    seqs = pack_sequences(docs, budget=budget, n_shards=shards).collect()
    # every doc exactly once
    packed = [d for r in seqs for d in r["doc_ids"]]
    assert sorted(packed) == sorted(r["doc_id"] for r in docs.collect())
    # budget respected and bookkeeping consistent
    sizes = {
        r["doc_id"]: r["n"]
        for r in docs.selectExpr(
            "doc_id", "size(split(trim(text), '\\\\s+')) AS n"
        ).collect()
    }
    for r in seqs:
        assert r["total_tokens"] <= budget
        assert r["n_docs"] == len(r["doc_ids"])
        assert r["total_tokens"] == min(budget, sum(sizes[d] for d in r["doc_ids"]))
    # packing actually packs: strictly fewer sequences than documents, and
    # at most one under-half-full tail sequence per shard
    assert len(seqs) < len(packed)
    loose = [r for r in seqs if r["total_tokens"] < budget // 2]
    assert len(loose) <= shards
    # deterministic across runs
    again = sorted(
        (r["seq_id"], tuple(r["doc_ids"]))
        for r in pack_sequences(docs, budget=budget, n_shards=shards).collect()
    )
    assert again == sorted((r["seq_id"], tuple(r["doc_ids"])) for r in seqs)


def test_text_col_parameter_actually_used(spark):
    # ADVICE r3: text_col was accepted but the tokenizer hardcoded 'text' —
    # chunking/packing a renamed column must give the identical result
    docs = load_table(spark, SF_ORACLE, "documents")
    renamed = docs.withColumnRenamed("text", "body")
    base = sorted(
        map(tuple, chunk_documents(docs, max_tokens=64, overlap=16).collect())
    )
    via_body = sorted(
        map(
            tuple,
            chunk_documents(renamed, max_tokens=64, overlap=16, text_col="body").collect(),
        )
    )
    assert via_body == base
    pack_base = sorted(
        (r["seq_id"], tuple(r["doc_ids"]))
        for r in pack_sequences(docs, budget=512, n_shards=8).collect()
    )
    pack_body = sorted(
        (r["seq_id"], tuple(r["doc_ids"]))
        for r in pack_sequences(renamed, budget=512, n_shards=8, text_col="body").collect()
    )
    assert pack_body == pack_base


def test_pack_sequences_seq_id_shard_stride_is_wide(spark):
    # ADVICE r3: seq_id = shard*1e6 collided once a shard packed >=1M
    # sequences; the 2^40 stride makes ids (shard, idx)-recoverable
    docs = load_table(spark, SF_ORACLE, "documents")
    seqs = pack_sequences(docs, budget=512, n_shards=8).collect()
    assert len({r["seq_id"] for r in seqs}) == len(seqs)
    for r in seqs:
        shard, idx = r["seq_id"] >> 40, r["seq_id"] & ((1 << 40) - 1)
        assert 0 <= shard < 8
        assert idx < 1 << 20  # tiny corpus: far from the stride


def test_sample_to_mixture_hits_target_shares(spark):
    from etl_airflow_adventureworks_spark.operators.textprep import sample_to_mixture
    from etl_airflow_adventureworks_spark.sources import load_table

    docs = load_table(spark, SF_ORACLE, "documents")
    weights = {"src0": 0.6, "src1": 0.2, "src2": 0.2}
    out = sample_to_mixture(docs, weights)
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) <= set(weights)
    src_n = {r["source"]: r["n"] for r in
             docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    # expected keep per source: r_s·n_s with N = min(n_s / w_s); the hash
    # threshold is binomial, so allow 4σ (sources here are only 25 docs)
    n_total = min(src_n[s] / w for s, w in weights.items())
    for s, w in weights.items():
        exp = min(1.0, n_total * w / src_n[s]) * src_n[s]
        sigma = (exp * max(1e-9, 1 - exp / src_n[s])) ** 0.5
        assert abs(counts.get(s, 0) - exp) <= 4 * sigma + 1, (s, counts, exp)
    # the binding source keeps everything (its keep-rate is exactly 1)
    binding = min(weights, key=lambda s: src_n.get(s, 0) / weights[s])
    assert counts[binding] == src_n[binding]


def test_sample_to_mixture_deterministic_and_pure(spark):
    from etl_airflow_adventureworks_spark.operators.textprep import sample_to_mixture
    from etl_airflow_adventureworks_spark.sources import load_table

    docs = load_table(spark, SF_ORACLE, "documents")
    # asymmetric weights so the minority source's keep-rate is < 1 (equal
    # weights over equal-sized sources keep everything — seed would be moot)
    weights = {"src0": 0.7, "src1": 0.3}
    a = {r["doc_id"] for r in sample_to_mixture(docs, weights).select("doc_id").collect()}
    b = {r["doc_id"] for r in
         sample_to_mixture(docs.repartition(13), weights).select("doc_id").collect()}
    assert a == b  # pure function of (key, seed) — layout-independent
    c = {r["doc_id"] for r in
         sample_to_mixture(docs, weights, seed=1).select("doc_id").collect()}
    assert a != c  # seed actually matters


def test_mixture_then_split_same_seed_decorrelated(spark):
    """sample_to_mixture and split_by_hash both hash the key with the caller's
    seed; the mixture salt must make the two buckets independent. Without it,
    mixture survivors all have split-bucket < keep_rate·1e6, so a downstream
    0.9/0.1 split assigns every survivor to 'train' (val silently empty)."""
    from collections import Counter

    from etl_airflow_adventureworks_spark.operators.textprep import (
        sample_to_mixture,
        split_by_hash,
    )

    docs = spark.range(20_000).selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 2 = 0 THEN 'big' ELSE 'small' END AS source",
    )
    # big keeps ~50% of its rows (keep-rate well under the 0.9 train cutoff)
    mixed = sample_to_mixture(
        docs, {"big": 0.5, "small": 0.5}, key="doc_id", seed=7
    )
    out = split_by_hash(mixed, "doc_id", {"train": 0.9, "val": 0.1}, seed=7)
    c = Counter(r["split"] for r in out.select("split").collect())
    n = sum(c.values())
    assert c["val"] > 0
    sigma = (0.1 * 0.9 / n) ** 0.5
    assert abs(c["val"] / n - 0.1) < 5 * sigma, c


def test_sample_to_mixture_quote_in_source_name(spark):
    """Source names are data, not SQL text — a single quote must not break
    the weight-map expression at plan time."""
    from etl_airflow_adventureworks_spark.operators.textprep import sample_to_mixture

    docs = spark.range(100).selectExpr(
        "id AS doc_id", "\"o'reilly\" AS source"
    )
    out = sample_to_mixture(docs, {"o'reilly": 1.0}, key="doc_id")
    assert out.count() == 100


def test_sample_to_mixture_rejects_bad_weights(spark):
    import pytest as _pytest

    from etl_airflow_adventureworks_spark.operators.textprep import sample_to_mixture
    from etl_airflow_adventureworks_spark.sources import load_table

    docs = load_table(spark, SF_ORACLE, "documents")
    with _pytest.raises(ValueError):
        sample_to_mixture(docs, {})
    with _pytest.raises(ValueError):
        sample_to_mixture(docs, {"src0": -0.5, "src1": 1.5})


def test_weighted_sample_per_group_matches_duckdb_pick_for_pick(spark):
    """r8: Efraimidis–Spirakis weighted sampling with a hash-derived
    uniform — DuckDB replays the EXACT same picks (md5 agrees across
    engines, −ln(u)/w on identical operands is IEEE-identical), plus
    the structural contracts: weight bias, zero/NULL-weight exclusion,
    and seed sensitivity."""
    import duckdb

    from etl_airflow_adventureworks_spark.operators.textops import (
        weighted_sample_per_group,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = sorted(
        (r["source"], r["doc_id"])
        for r in weighted_sample_per_group(
            docs, ["source"], "doc_id", "n_chars", n_per_group=10, seed=7
        ).collect()
    )
    want = sorted(tuple(r) for r in duckdb.sql("""
        WITH d AS (SELECT source, doc_id, n_chars,
                   (-ln((('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':7'), 1, 8))::UBIGINT + 1)
                        / 4294967296.0)) / n_chars AS es_key
                   FROM read_parquet('/root/testdata/sf0.001/documents.parquet')
                   WHERE n_chars IS NOT NULL AND n_chars > 0)
        SELECT source, doc_id FROM (
          SELECT source, doc_id,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY es_key ASC, doc_id ASC) AS rn
          FROM d) WHERE rn <= 10
    """).fetchall())
    assert got == want and len(got) > 0

    # weight bias: heavy rows are overrepresented vs their population share
    big = docs.approxQuantile("n_chars", [0.8], 0.0)[0]
    picked = weighted_sample_per_group(
        docs, ["source"], "doc_id", "n_chars", n_per_group=20, seed=7)
    frac_pop = docs.filter(f"n_chars >= {big}").count() / docs.count()
    frac_pick = (picked.filter(f"n_chars >= {big}").count() / picked.count())
    assert frac_pick > frac_pop  # ∝-weight inclusion really biases

    # zero/NULL weights can never win; different seed = different picks
    from pyspark.sql import functions as F

    rigged = docs.withColumn(
        "w", F.when(F.col("doc_id") % 2 == 0, F.lit(0.0)).otherwise(F.lit(1.0))
    )
    zs = weighted_sample_per_group(rigged, ["source"], "doc_id", "w", 5)
    assert zs.filter("doc_id % 2 = 0").count() == 0
    s7 = {r["doc_id"] for r in weighted_sample_per_group(
        docs, ["source"], "doc_id", "n_chars", 10, seed=7).collect()}
    s8 = {r["doc_id"] for r in weighted_sample_per_group(
        docs, ["source"], "doc_id", "n_chars", 10, seed=8).collect()}
    assert s7 != s8
    import pytest as _pytest

    with _pytest.raises(ValueError, match=">= 1"):
        weighted_sample_per_group(docs, ["source"], "doc_id", "n_chars", 0)
