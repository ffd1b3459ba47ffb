"""Deduplication operators (SURVEY.md §2.9 E1/E2 + charter dedup family).

The LLM-pipeline dedup ladder over ``documents``:

- exact      — hash-groupBy on content digest (E1); one shuffle on the hash.
- n-gram     — exact Jaccard over 3-token shingles via an inverted-index
               self-join (the scalable exact algorithm: shuffle on shingle,
               never a cross join); DuckDB-oracle-checked.
- MinHash    — 32-permutation signatures, 16 bands × 2 rows LSH banding,
               band-key self-join for candidates, exact-Jaccard verify (E2).
- SimHash    — 64-bit fingerprints from token multisets, 16-bit band join,
               Hamming-distance filter.
- embedding  — blocked exact cosine over the embeddings table (label
               blocking ≈ cluster blocking; the shuffle key is the block).

Every signature/banding step is a native Catalyst expression (crc32 /
xxhash64 / higher-order functions) — zero Python UDFs. MinHash/SimHash use
Spark-side hash primitives DuckDB lacks, so those two are declared without
oracles (rows-only check, per the driver contract); their ground truth is
``ext_ngram_jaccard``, which IS oracle-checked and finds the same planted
near-dup pairs.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import cosine, to_double_array
from ..registry import query
from ..sources import load_table

#: tokenize + 3-token shingle set (distinct) — same fragments as textops.
_TOK = r"split(trim(text), '\\s+')"
_SHINGLES = (
    "array_distinct(transform(sequence(0, greatest(size(t) - 3, 0)),"
    " i -> concat_ws(' ', slice(t, i + 1, 3))))"
)
_TOK_DUCK = r"string_split_regex(trim(text), '\s+')"
_SHINGLES_DUCK = (
    "list_distinct([array_to_string(t[i + 1 : i + 3], ' ')"
    " for i in range(0, greatest(len(t) - 3, 0) + 1)])"
)

JACCARD_THRESHOLD = 0.3

# MinHash parameters — fixed seed, generated once at import (deterministic).
_MERSENNE_P = 4294967311  # prime > 2^32
_N_PERM = 32
_N_BANDS = 16  # 16 bands x 2 rows → LSH threshold ≈ (1/16)^(1/2) ≈ 0.25
_rng = random.Random(42)
# coefficients < 2^31 so a*crc32(s)+b stays under 2^63 (ANSI overflow-safe):
# max product (2^31-1)(2^32-1) + 2^31 < Long.MAX.
_PERM_A = [_rng.randrange(1, 1 << 31) for _ in range(_N_PERM)]
_PERM_B = [_rng.randrange(0, 1 << 31) for _ in range(_N_PERM)]


@query(
    "ext_exact_dedup_docs",
    oracle="""
    SELECT doc_id, md5(text) AS content_hash FROM documents
    QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
    """,
)
def ext_exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup (E1): keep the lowest doc_id per content digest.
    Hash-groupBy shape — one shuffle on the 128-bit digest, which is also
    the 100 TB strategy (hash first, never compare full text twice)."""
    from pyspark.sql import Window

    w = Window.partitionBy("content_hash").orderBy("doc_id")
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.md5("text").alias("content_hash"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def _shingle_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .selectExpr("doc_id", f"{_TOK} AS t")
        .selectExpr("doc_id", f"{_SHINGLES} AS shingles")
    )


@query(
    "ext_ngram_jaccard",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {_SHINGLES_DUCK} AS shingles
      FROM (SELECT doc_id, {_TOK_DUCK} AS t FROM documents)
    ),
    sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
    inv AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 6) AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= {JACCARD_THRESHOLD}
    """,
)
def ext_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted-index self-join —
    the scalable exact algorithm: explode distinct shingles, shuffle on
    shingle (never a cross join), count shared shingles per pair, then
    |A∩B| / (|A|+|B|-|A∩B|) ≥ threshold."""
    sh = _shingle_sets(spark, sf_dir)
    sizes = sh.select("doc_id", F.size("shingles").alias("n"))
    inv = sh.select("doc_id", F.explode("shingles").alias("s"))
    a, b = inv.alias("a"), inv.alias("b")
    pairs = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        pairs.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


def minhash_signature_expr() -> str:
    """32-permutation MinHash signature over the ``shingles`` column as one
    native expression: sig[i] = min over shingles of (a_i*crc32(s)+b_i) mod p
    (the standard (a*x+b) mod p universal-hash family)."""
    perms = ", ".join(
        f"named_struct('a', {a}L, 'b', {b}L)" for a, b in zip(_PERM_A, _PERM_B)
    )
    return (
        f"transform(array({perms}), p -> aggregate(shingles, 9223372036854775807L,"
        f" (acc, s) -> least(acc, pmod(p.a * crc32(s) + p.b, {_MERSENNE_P}L))))"
    )


@query("ext_minhash_neardup")  # Spark-side hashes (crc32) → rows-only check
def ext_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs (E2): shingle → 32-perm signature →
    16×2 banding → band-key self-join for candidates → exact-Jaccard
    verification. The banding join is the scale path: candidates shuffle on
    (band_idx, band_key), so work is proportional to collisions, not n².
    Ground truth twin: ext_ngram_jaccard (oracle-checked)."""
    sh = _shingle_sets(spark, sf_dir)
    sig = sh.selectExpr("doc_id", "shingles", f"{minhash_signature_expr()} AS sig")
    bands = sig.selectExpr(
        "doc_id",
        f"posexplode(transform(sequence(0, {_N_BANDS - 1}),"
        f" b -> concat_ws(',', slice(sig, b * 2 + 1, 2)))) AS (band_idx, band_key)",
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter.cast("double") / (F.size("sh_a") + F.size("sh_b") - inter)
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


def simhash_expr() -> str:
    """64-bit SimHash over the token multiset ``t`` as one native
    expression: per-bit votes (+1/−1 per token occurrence, weighted by the
    token's xxhash64 bits), sign → bit."""
    return (
        "aggregate(zip_with("
        "  aggregate(t, array_repeat(0L, 64),"
        "    (acc, tok) -> zip_with(acc, transform(sequence(0, 63),"
        "      j -> CASE WHEN (shiftright(xxhash64(tok), j) & 1) = 1 THEN 1L ELSE -1L END),"
        "      (a, v) -> a + v)),"
        "  sequence(0, 63),"
        "  (v, j) -> CASE WHEN v > 0 THEN shiftleft(1L, j) ELSE 0L END),"
        " 0L, (acc, x) -> acc | x)"
    )


@query("ext_simhash_neardup")  # Spark-side xxhash64 → rows-only check
def ext_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 64-bit fingerprints, 4×16-bit band join for
    candidates (a doc pair within Hamming distance 3 shares ≥1 exact 16-bit
    band by pigeonhole), bit_count(xor) ≤ 12 verify. All JVM-native."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .selectExpr("doc_id", f"{_TOK} AS t")
        .selectExpr("doc_id", f"{simhash_expr()} AS simhash")
    )
    bands = docs.selectExpr(
        "doc_id",
        "simhash",
        "posexplode(transform(sequence(0, 3),"
        " i -> (shiftright(simhash, i * 16) & 65535))) AS (band_idx, band_key)",
    )
    a, b = bands.alias("a"), bands.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(ham <= 12)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.cast("long").alias("hamming"),
        )
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


@query(
    "ext_embedding_neardup",
    oracle="""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
                 6) AS cos_sim
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v)
          / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.35
    """,
)
def ext_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by cluster label: exact
    cosine within blocks only — the blocked-dedup shape (block key = the
    shuffle key; n² only within a block, never globally)."""
    e = (
        load_table(spark, sf_dir, "embeddings")
        .selectExpr("vec_id", "label", f"{to_double_array('embedding')} AS v")
    )
    a, b = e.alias("a"), e.alias("b")
    cos = F.expr(cosine("a.v", "b.v"))
    return (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .filter(cos >= 0.35)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cos, 6).alias("cos_sim"),
        )
    )
