"""Benchmark decontamination (charter: large-scale training-data pipeline).

The standard pretraining hygiene step the dedup family does NOT cover:
remove training documents that share any long n-gram with an *evaluation*
set (cross-set overlap, not within-set duplication). Library operator —
the 50-slot declared-query registry is at the driver's cap (COVERAGE.md);
gated by ``tests/test_decontam.py`` including a DuckDB parity check of the
driver-gate strictness.

Scale posture (the asymmetry IS the design): the eval side is
benchmark-sized (thousands of docs — tiny next to a 100 TB corpus), so its
distinct shingle set broadcasts and the contamination check is a
broadcast-semi-join against every training shingle — zero shuffle of the
big side beyond the per-doc aggregation, which is keyed by doc id with
map-side combine. Shingles compare as xxhash64 ids (fixed-width join keys;
the parity test pins count-equality against the string-join oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textprep import _tok


def _shingle_hashes(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, shingle_hash) — distinct n-token shingles per document as
    xxhash64 ids. Documents shorter than n tokens contribute their single
    clamped partial shingle (consistent with the dedup family)."""
    g = (
        f"array_distinct(transform(sequence(0, greatest(size(__t) - {n}, 0)),"
        f" i -> xxhash64(concat_ws(' ', slice(__t, i + 1, {n})))))"
    )
    return (
        df.selectExpr(f"{id_col}", f"{_tok(text_col)} AS __t")
        .selectExpr(id_col, f"explode(array_compact({g})) AS shingle_hash")
    )


def contamination_report(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str | None = None,
) -> DataFrame:
    """Per-training-document overlap with the eval set: (id, n_overlap) —
    the count of distinct training-doc n-grams that appear anywhere in the
    eval set, for every training doc with n_overlap ≥ 1.

    The eval shingle set is deduplicated then broadcast (benchmark-sized by
    contract — for an eval side that is NOT small, use the dedup family's
    shuffle join instead)."""
    eval_id = eval_id_col or id_col
    train_sh = _shingle_hashes(train, id_col, text_col, n)
    eval_sh = (
        _shingle_hashes(eval_df, eval_id, text_col, n)
        .select("shingle_hash")
        .distinct()
    )
    return (
        train_sh.join(F.broadcast(eval_sh), "shingle_hash")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    min_overlap: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str | None = None,
) -> DataFrame:
    """Drop training documents sharing ≥ ``min_overlap`` distinct n-grams
    with the eval set, keeping all input columns (anti-join on the
    contaminated-id set)."""
    doomed = (
        contamination_report(train, eval_df, n, id_col, text_col, eval_id_col)
        .filter(F.col("n_overlap") >= min_overlap)
        .select(id_col)
    )
    return train.join(doomed, id_col, "left_anti")
