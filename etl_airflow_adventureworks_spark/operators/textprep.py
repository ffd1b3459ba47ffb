"""Training-data preparation operators (charter: large-scale training-data
pipeline) — the steps between a cleaned corpus and a tokenizer-ready
dataset: deterministic splits, context-window chunking, sequence packing.

All three are library operators (the 50-slot registry is at cap; gates in
``tests/test_textprep.py``) and follow the house rules: splits and chunking
are pure Catalyst expressions (zero Python), packing is the one
applyInPandas step because bin-packing is inherently sequential per shard —
and is sharded so no task ever sees more than corpus/n_shards rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _tok(col: str) -> str:
    """Whitespace tokenizer shared with textops (same token count
    semantics), parameterised on the source column name."""
    return rf"split(trim({col}), '\\s+')"


def split_by_hash(
    df: DataFrame,
    key: str,
    weights: dict[str, float],
    seed: int = 0,
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket = xxhash64(key, seed)
    mod 1e6 against cumulative weight cutoffs. Properties a random split
    does NOT give you at 100 TB:

    - stable under re-runs, retries, AQE re-planning and data re-ordering
      (the split is a pure function of the key, not of partition layout);
    - adding rows later never moves an existing row between splits;
    - join-free leakage checks: the same key always lands in the same split
      (dedup/near-dup BEFORE splitting remains the pipeline's job).

    Weights must sum to ~1. Adds a ``split`` column."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    # positive bucket in [0, 1e6): pmod of the 64-bit hash
    bucket = F.pmod(F.xxhash64(F.col(key), F.lit(seed)), F.lit(1_000_000))
    expr = None
    acc = 0.0
    for name, w in weights.items():
        acc += w
        cutoff = int(round(acc * 1_000_000))
        cond = bucket < F.lit(cutoff)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    # float-rounding tail guard: the last named split absorbs bucket==cutoff
    last = list(weights)[-1]
    return df.withColumn("split", expr.otherwise(F.lit(last)))


def sample_to_mixture(
    df: DataFrame,
    weights: dict[str, float],
    key: str = "doc_id",
    source_col: str = "source",
    seed: int = 0,
) -> DataFrame:
    """Downsample to a target source mixture: the largest corpus satisfying
    ``share(s) == weights[s]`` keeps N = min_s(n_s / w_s) total rows, i.e.
    per-source keep-rate r_s = N·w_s / n_s ≤ 1. Rows are kept by the same
    deterministic hash-threshold as ``split_by_hash`` (stable under re-runs,
    re-ordering and AQE; per-source counts land within binomial noise of
    N·w_s, the standard trade at scale — an exact-count variant would need
    a per-source global sort).

    Sources absent from ``weights`` are dropped. Lazy end to end: the
    per-source counts are a tiny aggregate broadcast back onto the frame,
    never collected to the driver.

    The keep/drop bucket is salted with a ``'mixture'`` literal so it is
    statistically independent of ``split_by_hash``'s bucket even when the
    caller passes the same seed to both — without the salt, mixture keeps
    exactly the rows with bucket < r_s·1e6, and a later split over the
    truncated bucket range assigns every survivor to the first split
    (val/test silently empty)."""
    if not weights:
        raise ValueError("need at least one source weight")
    total = sum(weights.values())
    if any(w < 0 for w in weights.values()) or total <= 0:
        raise ValueError(f"weights must be non-negative and sum > 0, got {weights}")
    norm = {s: w / total for s, w in weights.items()}
    # weight lookup as a literal map — never f-string source names into SQL
    # text (a quote in a source value would break the expression at plan time)
    w_map = F.create_map(
        *[lit for s, w in norm.items() for lit in (F.lit(s), F.lit(float(w)))]
    )
    from pyspark.sql import Window

    counts = (
        df.filter(F.col(source_col).isin(*norm))
        .groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__w", w_map[F.col(source_col)])
    )
    # N = min over sources of n_s / w_s (w_s == 0 → source contributes 0
    # rows). Unpartitioned window is fine HERE: the frame is one row per
    # source (#sources rows total), never data-sized.
    n_expr = F.min(
        F.when(F.col("__w") > 0, F.col("__n") / F.col("__w"))
    ).over(Window.partitionBy())
    rates = counts.select(
        source_col,
        F.least(F.lit(1.0), n_expr * F.col("__w") / F.col("__n")).alias("__keep"),
    )
    bucket = F.pmod(
        F.xxhash64(F.col(key), F.lit("mixture"), F.lit(seed)), F.lit(1_000_000)
    )
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(bucket < F.col("__keep") * 1_000_000)
        .drop("__keep")
    )


def chunk_documents(
    df: DataFrame,
    max_tokens: int = 512,
    overlap: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Context-window chunking: split each document's token stream into
    windows of ``max_tokens`` with ``overlap`` tokens of left context
    (stride = max_tokens − overlap; the standard LM data window). Pure
    Catalyst — tokenize once, posexplode a sequence of slice starts, slice
    the token array per chunk; no Python, no shuffle (chunking is row-local;
    the explode only multiplies rows ~len/stride×).

    Output: (id_col, chunk_idx, chunk_text, n_tokens); short docs yield one
    chunk. Every token index appears in ≥1 chunk and consecutive chunks
    overlap by exactly ``overlap`` (asserted in tests)."""
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    toks = df.selectExpr(f"{id_col}", f"{_tok(text_col)} AS t")
    # chunk starts: 0, stride, 2*stride, ... while start < n (≥1 chunk even
    # for empty text); array_compact barrier per the explode-inlining gotcha
    starts = (
        f"sequence(0, greatest(CAST(ceil((size(t) - {max_tokens})"
        f" / CAST({stride} AS DOUBLE)) AS INT), 0) * {stride}, {stride})"
    )
    return toks.selectExpr(
        id_col,
        "size(t) AS doc_tokens",
        f"posexplode(array_compact(transform({starts},"
        f" s -> slice(t, s + 1, {max_tokens})))) AS (chunk_idx, chunk)",
    ).selectExpr(
        id_col,
        "chunk_idx",
        "array_join(chunk, ' ') AS chunk_text",
        "size(chunk) AS n_tokens",
    )


def pack_sequences(
    df: DataFrame,
    budget: int = 2048,
    n_shards: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sequence packing: greedily concatenate documents into training
    sequences of at most ``budget`` tokens (first-fit over a size-desc
    order), the standard trick that removes padding waste when examples are
    much shorter than the context window.

    Bin packing is inherently sequential, so the corpus is sharded by
    xxhash64(id) mod n_shards and packed greedily WITHIN each shard via
    applyInPandas — one shuffle, tasks see ~corpus/n_shards rows, and the
    result is deterministic (shard is a pure key function; packing order is
    (tokens desc, id)). Cross-shard packing slack is bounded: each shard
    wastes at most one partially-filled tail sequence.

    Output: (seq_id, doc_ids array, n_docs, total_tokens ≤ budget). Docs
    longer than ``budget`` get a sequence of their own (chunk first with
    ``chunk_documents`` if that is not what you want)."""
    import pandas as pd

    sized = df.selectExpr(
        f"{id_col} AS doc_id",
        f"size({_tok(text_col)}) AS n_tokens",
    ).withColumn("shard", F.pmod(F.xxhash64("doc_id"), F.lit(n_shards)))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        import pandas as _pd

        pdf = pdf.sort_values(["n_tokens", "doc_id"], ascending=[False, True])
        shard = int(pdf["shard"].iloc[0])
        bins: list[tuple[int, list[int]]] = []  # (used, doc_ids)
        for doc_id, n in zip(pdf["doc_id"], pdf["n_tokens"]):
            n = int(n)
            for i, (used, ids) in enumerate(bins):
                if used + n <= budget:
                    bins[i] = (used + n, ids + [int(doc_id)])
                    break
            else:
                bins.append((min(n, budget), [int(doc_id)]))
        # shard-safe id composition: 2^40 per-shard stride means a shard
        # would need >1e12 packed sequences to collide with its neighbour
        # (the old 1e6 stride was plausible to overflow at target scale)
        return _pd.DataFrame(
            {
                "seq_id": [(shard << 40) + i for i in range(len(bins))],
                "doc_ids": [ids for _, ids in bins],
                "n_docs": [len(ids) for _, ids in bins],
                "total_tokens": [used for used, _ in bins],
            }
        )

    return sized.groupBy("shard").applyInPandas(
        pack, schema="seq_id long, doc_ids array<long>, n_docs long, total_tokens long"
    )
