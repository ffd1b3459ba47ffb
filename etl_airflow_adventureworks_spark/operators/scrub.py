"""Corpus scrubbing operators (charter: large-scale training-data pipeline):
Gopher-style repetition statistics and PII redaction.

Both are library operators — the 50-slot declared-query registry is at the
driver's cap (see COVERAGE.md) — gated by ``tests/test_scrub.py``, which
includes a DuckDB parity check of the same strictness as the driver's
oracle gate (exact value equality on the same frames in both engines).

Scale posture:

- ``repetition_stats`` shuffles once on (id, token) with map-side combine
  (the explode never materializes corpus-wide) and once more to join the
  row-local n-gram fractions back; both keys are the document id, so AQE
  coalesces them into one exchange reuse where sizes allow.
- ``redact_pii`` is a pure codegen'd projection (sequential
  ``regexp_replace`` / ``regexp_count`` chain) — zero shuffle, linear scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textprep import _tok

#: PII patterns, applied in this order (more-specific first so the generic
#: phone pattern can't eat an SSN). Alternation + classes + \b only — the
#: same pattern text compiles identically under Java regex (Spark) and
#: RE2 (DuckDB), which the parity test pins.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
    # two phone shapes, both requiring real phone STRUCTURE rather than "any
    # long digit/separator run" (the earlier {6,}-run form redacted dates,
    # timestamps and version strings wholesale):
    #   1. NANP-style: [+cc] [(]aaa[)] sep bbb sep cccc (3-3-4 blocks)
    #   2. international: literal '+' country code then 2-4 grouped blocks
    #   3. bare standalone 11-15 digit runs (cc+NANP with no separators,
    #      e.g. 15551234567; 15 = the E.164 maximum) — these ARE phone
    #      shapes; 16+ digit standalone runs (card/serial ids) stay whole
    # Residual false positives (documented, accepted): standalone 10-15
    # digit runs (indistinguishable from bare phone numbers — this class
    # INCLUDES 13-digit epoch-millisecond timestamps; callers embedding
    # raw epoch-millis in prose should redact-then-restore or pick
    # epoch-seconds/ISO forms), a '+'-prefixed grouped run up to the
    # grammar's 19-digit max, and decimals shaped like ddd ddd.dddd.
    # YYYY-MM-DD dates, HH:MM:SS times and dotted versions do not match
    # (no 3-digit + 3-digit + 4-digit runs). Every alternative is
    # WORD-BOUNDED on both sides (\b is RE2-compatible; lookbehind is
    # not): alternative 1's optional country code is anchored via the
    # (?:\+...|\b...) split — bare cc digits require a leading boundary,
    # a '+' is its own anchor ('A1 555 123 4567' no longer matches
    # starting mid-token at the '1'; the 3-3-4 tail still redacts on its
    # own \b) — the area-code \b sits after the optional '(' so '(555)'
    # still matches, and a digit preceded by a digit or letter fails it;
    # so no alternative can start or stop mid-token, and over-long
    # numeric ids are left whole instead of partially redacted.
    ("phone", r"(?:\+[0-9]{0,2}|\b[0-9]{1,2})?[\s.-]?\(?\b[0-9]{3}\)?[\s.-]?[0-9]{3}[\s.-]?[0-9]{4}\b|\+[0-9]{1,3}([\s.-]?[0-9]{2,4}){2,4}\b|\b[0-9]{11,15}\b", "[PHONE]"),
)


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Redact emails / SSNs / IPv4s / phone-shaped digit runs from
    ``text_col``, appending ``n_<kind>`` count columns and the redacted
    text (default: in place). Counts are taken on the progressively
    redacted text, so overlapping patterns never double-count — the
    sequential-replace semantics are the definition, identical in both
    engines. One projection; no shuffle."""
    out_col = out_col or text_col
    cur = F.col(text_col)
    counted = []
    for kind, pat, token in PII_PATTERNS:
        counted.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{kind}"))
        cur = F.regexp_replace(cur, pat, token)
    keep = [c for c in df.columns if c != out_col]
    return df.select(*keep, *counted, cur.alias(out_col))


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition metrics (the Gopher repetition rules):

    - ``dup_2gram_frac`` / ``dup_3gram_frac`` — fraction of n-gram
      occurrences that are repeats (1 − distinct/total), row-local;
    - ``top_token_frac`` — most frequent token's share of the document,
      via explode → (id, token) count → per-id max/sum (shuffle ∝ tokens,
      map-side combined — never the O(len·vocab) per-row form, which dies
      on long documents);
    - ``n_tokens``.

    Filter downstream with e.g. ``dup_2gram_frac <= 0.2 AND
    top_token_frac <= 0.1`` (thresholds are corpus policy, not code).
    """
    t = _tok(text_col)

    def dup_frac(n: int) -> str:
        g = (
            f"transform(sequence(0, greatest(size(__t) - {n}, 0)),"
            f" i -> concat_ws(' ', slice(__t, i + 1, {n})))"
        )
        return (
            f"CASE WHEN size(__t) >= {n} THEN"
            f" 1.0D - CAST(size(array_distinct({g})) AS DOUBLE) / size({g})"
            f" ELSE 0.0D END"
        )

    rowlocal = df.selectExpr(f"{id_col}", f"{t} AS __t").selectExpr(
        id_col,
        f"{dup_frac(2)} AS dup_2gram_frac",
        f"{dup_frac(3)} AS dup_3gram_frac",
    )
    toks = df.selectExpr(f"{id_col}", f"explode({t}) AS __tok")
    per_tok = toks.groupBy(id_col, "__tok").agg(F.count(F.lit(1)).alias("__c"))
    agg = per_tok.groupBy(id_col).agg(
        F.sum("__c").cast("long").alias("n_tokens"),
        (F.max("__c").cast("double") / F.sum("__c")).alias("top_token_frac"),
    )
    return rowlocal.join(agg, id_col).select(
        id_col, "n_tokens", "dup_2gram_frac", "dup_3gram_frac", "top_token_frac"
    )


def repetition_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_2gram_frac: float = 0.2,
    max_dup_3gram_frac: float = 0.18,
    max_top_token_frac: float = 0.3,
) -> DataFrame:
    """Drop documents over any repetition threshold (Gopher-rule defaults),
    keeping all input columns. One aggregation pipeline + a co-keyed join."""
    keep = (
        repetition_stats(df, id_col, text_col)
        .filter(
            (F.col("dup_2gram_frac") <= max_dup_2gram_frac)
            & (F.col("dup_3gram_frac") <= max_dup_3gram_frac)
            & (F.col("top_token_frac") <= max_top_token_frac)
        )
        .select(id_col)
    )
    return df.join(keep, id_col, "left_semi")
