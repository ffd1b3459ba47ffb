"""Line-level corpus dedup (boilerplate removal) — the C4/CCNet-style
pretraining step the charter's dedup family implies but document-level
dedup can't express: a line (paragraph) that recurs across many DISTINCT
documents is boilerplate (cookie banners, nav bars, license headers) and
is removed from every document, while each document's unique lines
survive in their original order.

Spark-first shape (all built-in, zero Python):

1. ``posexplode(split(text, sep))`` — per-partition narrow explode, no
   shuffle; position kept for order-preserving reassembly;
2. normalized line key → ONE groupBy shuffle computing, per distinct
   line, the distinct-document count (map-side partial aggregation makes
   a million repeats of one banner combine to one row per input
   partition before the exchange);
3. the boilerplate SET (lines with ``n_docs >= min_docs``) is joined
   back to the exploded lines. That set is one row per distinct
   boilerplate line — in real corpora orders of magnitude smaller than
   the corpus — so AQE broadcasts it and the hot line's million copies
   are filtered map-side with NO shuffle of the line table; should the
   set ever outgrow the broadcast threshold the join degrades to a
   shuffled join whose hot keys AQE's skew-join splits (the hot side
   rows are dropped, not multiplied: the counts side is unique per key);
4. surviving lines reassemble per document via one more groupBy —
   ``array_join(transform(array_sort(collect_list(struct(pos, line))),
   x -> x.line), sep)`` — and re-join to the input frame so non-text
   columns pass through untouched.

Total: two aggregation shuffles proportional to line count plus one
(usually broadcast) membership join. No per-row Python, no driver
collect, no window over an unbounded key. Gated by an exact DuckDB
parity oracle on planted-boilerplate corpora in
``tests/test_linededup.py`` (scrub/decontam precedent: driver-gate
strictness with no registry slot — the 50-slot registry is at cap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _line_key(line, normalize: bool):
    return F.lower(F.trim(line)) if normalize else line


def _split_literal(text_col: str, sep: str):
    # F.split takes a Java regex; \Q...\E quotes the separator so any
    # literal string (".", "||", …) works without surprise regex semantics
    return F.split(F.col(text_col), "\\Q" + sep + "\\E")


def boilerplate_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_docs: int = 2,
    normalize: bool = True,
) -> DataFrame:
    """The corpus's boilerplate set: one row per distinct (normalized)
    line occurring in at least ``min_docs`` DISTINCT documents, with its
    document frequency and the smallest document id containing it
    (``first_doc``, the deterministic survivor ``keep_first`` mode
    preserves). Lines that normalize to the empty string are never
    boilerplate — they are document structure, not content."""
    lines = docs.select(
        F.col(id_col), F.explode(_split_literal(text_col, sep)).alias("__line")
    ).select(F.col(id_col), _line_key(F.col("__line"), normalize).alias("line_key"))
    return _boiler_counts(lines, id_col, min_docs)


def _boiler_counts(lines: DataFrame, id_col: str, min_docs: int) -> DataFrame:
    # trim() so whitespace-only lines count as structure even under
    # normalize=False (where line_key is the raw line): they must never be
    # boilerplate or the byte-identical round-trip guarantee breaks
    return (
        lines.select(id_col, "line_key")
        .filter(F.trim(F.col("line_key")) != "")
        .groupBy("line_key")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.min(id_col).alias("first_doc"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def remove_boilerplate_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_docs: int = 2,
    normalize: bool = True,
    keep_first: bool = False,
) -> DataFrame:
    """Rewrite ``text_col`` with boilerplate lines removed; every other
    column passes through unchanged, every document survives (a document
    that was ALL boilerplate comes back with empty text — dropping rows
    is the caller's policy, e.g. a quality re-filter downstream). A NULL
    text stays NULL (it has no lines): collapsing it to ``''`` would make
    downstream exact-dedup merge never-had-text docs with emptied ones.

    ``normalize``: match lines case- and edge-whitespace-insensitively
    (the removed text is still the document's ORIGINAL line). ``sep`` is
    a literal separator, not a regex. ``keep_first`` keeps each
    boilerplate line's occurrence in the smallest containing ``id_col``
    (deterministic — CCNet-style keep-one) instead of removing all.
    Empty and whitespace-only lines always survive (under either
    ``normalize``), so unaffected documents round-trip byte-identically
    through split + reassemble.

    CONTRACT: ``id_col`` must be unique per row. The reassembly groupBy
    keys on it, so duplicate ids would merge two documents' lines and
    then fan the interleaved text back out to both rows. Run exact dedup
    (or mint a surrogate key) first; uniqueness is not re-validated here
    because asserting it would force an extra full aggregation per call."""
    reserved = {"__pos", "__line", "__new_text", "line_key", "n_docs", "first_doc"}
    clash = reserved & set(docs.columns)
    if clash:
        raise ValueError(
            f"remove_boilerplate_lines: column(s) {sorted(clash)} collide "
            "with internal names; rename them first"
        )
    lines = docs.select(
        F.col(id_col),
        F.posexplode(_split_literal(text_col, sep)).alias("__pos", "__line"),
    ).withColumn("line_key", _line_key(F.col("__line"), normalize))
    boiler = _boiler_counts(lines, id_col, min_docs)
    joined = lines.join(boiler, "line_key", "left")
    keep = F.col("n_docs").isNull()
    if keep_first:
        keep = keep | (F.col(id_col) == F.col("first_doc"))
    rebuilt = (
        joined.filter(keep | (F.trim(F.col("line_key")) == ""))
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                    lambda s: s["__line"],
                ),
                sep,
            ).alias("__new_text")
        )
    )
    new_text = F.when(
        F.col(text_col).isNull(), F.lit(None).cast("string")
    ).otherwise(F.coalesce(F.col("__new_text"), F.lit("")))
    out_cols = [
        new_text.alias(c) if c == text_col else F.col(c) for c in docs.columns
    ]
    return docs.join(rebuilt, id_col, "left").select(*out_cols)
