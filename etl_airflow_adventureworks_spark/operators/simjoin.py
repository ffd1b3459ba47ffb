"""Two-table text similarity join (record linkage / fuzzy matching).

The cross-table sibling of the ``ext_ngram_jaccard`` self-join: match a
noisy table against a canonical one (product titles ⋈ catalog, scraped
docs ⋈ licensed corpus) on token-shingle Jaccard ≥ t. A plain equi-join
can't express it and a cross join is quadratic — the scale path is the
same AllPairs/PPJoin prefix-filter machinery the near-dup dedup already
uses (``dedup.ngram_prefix_candidates``), reused verbatim over the
UNION of both sides with a composite (side, id) key:

1. both tables tokenize → distinct n-token shingles → xxhash64 longs;
2. the union's inverted index ranks shingles rare-first (document
   frequency over BOTH tables — the prefix guarantee needs one global
   order, which is why the union is built before ranking);
3. candidate pairs come from the shared prefix buckets, with the
   cross-table-only rule applied as a codegen'd ``pair_filter`` AT pair
   expansion — within-table pairs never reach the candidate shuffle;
4. candidates verify with the FULL exact Jaccard via array_intersect,
   forced sort-merge on the doc keys (same AQE-mis-sizing rationale as
   the self-join: long-array payloads deserialize 10-50× larger than
   their compressed shuffle size).

100 TB posture: shuffle ∝ shared-prefix collisions (never |L|×|R|), all
stages codegen'd built-ins, no Python, no cartesian. Same reference
scope note as the dedup module: charter breadth (SURVEY §2 E2), no
counterpart in the batch-only reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _tok_expr, ngram_prefix_candidates


def _hashed_sets(
    df: DataFrame, id_col: str, text_col: str, width: int, side: int
) -> DataFrame:
    """(doc_id=struct(side,id), hh) — distinct ``width``-token shingles as
    xxhash64 longs, side-tagged for the cross-only candidate rule."""
    sh = (
        f"array_distinct(transform(sequence(0, greatest(size(t) - {width}, 0)),"
        f" i -> concat_ws(' ', slice(t, i + 1, {width}))))"
    )
    return df.selectExpr(
        f"named_struct('side', {side}, 'id', `{id_col}`) AS doc_id",
        f"{_tok_expr(f'`{text_col}`')} AS t",
    ).selectExpr("doc_id", f"transform({sh}, x -> xxhash64(x)) AS hh")


def text_similarity_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_id: str = "doc_id",
    right_id: str = "doc_id",
    left_text: str = "text",
    right_text: str = "text",
    threshold: float = 0.5,
    shingle_width: int = 3,
) -> DataFrame:
    """All (left, right) pairs with shingle-Jaccard ≥ ``threshold``.

    Returns ``(<left_id>, <right_id>, jaccard)`` — the right id column is
    suffixed ``_r`` when both sides use the same id name. Exact (the
    prefix filter is lossless by the pigeonhole argument; final truth is
    the full Jaccard verify), deterministic, inner semantics — an
    unmatched-left anti join is ``left.join(result, ...) how='left_anti'``.

    Contracts: ids must be unique within each side (duplicates fan out in
    the verify join), and the two id columns must be union-compatible
    types (cast beforehand if not — the union fails loud otherwise).
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if shingle_width < 1:
        raise ValueError(f"shingle_width must be >= 1, got {shingle_width}")
    for df_, cols, side in ((left, (left_id, left_text), "left"),
                            (right, (right_id, right_text), "right")):
        for c in cols:
            if c not in df_.columns:
                raise ValueError(f"{side} side lacks column {c!r}")

    la = _hashed_sets(left, left_id, left_text, shingle_width, 0)
    rb = _hashed_sets(right, right_id, right_text, shingle_width, 1)
    cand = ngram_prefix_candidates(
        la.unionByName(rb),
        threshold=threshold,
        pair_filter="pair.doc_a.side <> pair.doc_b.side",
    ).selectExpr(
        # orient: the side-0 key is always the left one
        "CASE WHEN doc_a.side = 0 THEN doc_a ELSE doc_b END AS lk",
        "CASE WHEN doc_a.side = 0 THEN doc_b ELSE doc_a END AS rk",
    )
    sa = la.select(F.col("doc_id").alias("lk"), F.col("hh").alias("sh_a"))
    sb = rb.select(F.col("doc_id").alias("rk"), F.col("hh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter.cast("double") / (F.size("sh_a") + F.size("sh_b") - inter)
    out_r = right_id if right_id != left_id else f"{right_id}_r"
    return (
        # sort-merge verify (r4-r15; shuffle_hash in r16 only — REVERTED
        # r17 with ext_ngram_jaccard's verify joins, same measurement:
        # SHJ parity at sf0.1, 1.29/1.06 at sf1/sf10). This is a LIBRARY
        # entry point over arbitrary corpora — the caller controls the
        # corpus/partition ratio, so the spill-safe strategy is the only
        # defensible default here (ADVICE r16). No broadcast ever: the
        # array side deserializes far above its compressed estimate.
        cand.join(sa.hint("merge"), "lk")
        .join(sb.hint("merge"), "rk")
        .filter(jac >= threshold)
        .select(
            F.col("lk.id").alias(left_id),
            F.col("rk.id").alias(out_r),
            F.round(jac, 6).alias("jaccard"),
        )
    )
