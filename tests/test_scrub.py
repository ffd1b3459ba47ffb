"""Gates for operators/scrub.py (repetition stats + PII redaction).

``repetition_stats`` gets the driver-gate treatment: exact value parity
against a DuckDB oracle over the same sf0.01 documents table (the 50-slot
declared registry is at cap, so the gate lives here — COVERAGE.md).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from conftest import SF_ORACLE

from etl_airflow_adventureworks_spark.operators.scrub import (
    PII_PATTERNS,
    redact_pii,
    repetition_filter,
    repetition_stats,
)
from etl_airflow_adventureworks_spark.sources import load_table

from test_oracle_parity import canon


REPETITION_ORACLE = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents
),
grams AS (
  SELECT doc_id, tk,
    [array_to_string(tk[i + 1 : i + 2], ' ')
     FOR i IN range(0, greatest(len(tk) - 2, 0) + 1)] AS g2,
    [array_to_string(tk[i + 1 : i + 3], ' ')
     FOR i IN range(0, greatest(len(tk) - 3, 0) + 1)] AS g3
  FROM t
),
rowlocal AS (
  SELECT doc_id,
    CASE WHEN len(tk) >= 2
         THEN 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2)
         ELSE 0.0 END AS dup_2gram_frac,
    CASE WHEN len(tk) >= 3
         THEN 1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3)
         ELSE 0.0 END AS dup_3gram_frac
  FROM grams
),
tok AS (SELECT doc_id, unnest(tk) AS tok FROM t),
per_tok AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2),
agg AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_token_frac
  FROM per_tok GROUP BY 1
)
SELECT r.doc_id, n_tokens, dup_2gram_frac, dup_3gram_frac, top_token_frac
FROM rowlocal r JOIN agg USING (doc_id)
"""


def test_repetition_stats_duckdb_parity(spark):
    got = canon(
        repetition_stats(load_table(spark, SF_ORACLE, "documents")).toPandas()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_ORACLE}/documents.parquet')"
    )
    want = canon(con.execute(REPETITION_ORACLE).df())
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want.reset_index(drop=True))


def test_repetition_stats_planted(spark):
    rows = [
        (1, "a b c d e f g h"),          # no repeats
        (2, "spam spam spam spam spam"),  # degenerate
        (3, "x y x y x y x y"),           # all 2-grams repeat after first two
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert out[1]["dup_2gram_frac"] == 0.0
    assert out[1]["top_token_frac"] == pytest.approx(1 / 8)
    assert out[2]["dup_2gram_frac"] == pytest.approx(1 - 1 / 4)
    assert out[2]["top_token_frac"] == 1.0
    # doc 3: 7 bigrams, 2 distinct ("x y", "y x")
    assert out[3]["dup_2gram_frac"] == pytest.approx(1 - 2 / 7)
    assert out[3]["top_token_frac"] == pytest.approx(0.5)


def test_repetition_filter_drops_degenerate_keeps_clean(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "buy buy buy buy buy buy buy buy buy buy"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = [r["doc_id"] for r in repetition_filter(df).collect()]
    assert kept == [1]


PLANTED_PII = [
    (1, "contact bob.smith+x@example.co.uk or call +1 (555) 123-4567 now"),
    (2, "ssn 123-45-6789 leaked from 10.0.255.3 twice: 123-45-6789"),
    (3, "clean text with no sensitive content at all"),
    (4, ""),
]


def test_redact_pii_counts_and_text(spark):
    df = spark.createDataFrame(PLANTED_PII, "doc_id long, text string")
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    r1 = out[1]
    assert r1["n_email"] == 1 and r1["n_phone"] == 1
    assert "[EMAIL]" in r1["text"] and "[PHONE]" in r1["text"]
    assert "example.co.uk" not in r1["text"] and "555" not in r1["text"]
    r2 = out[2]
    # SSNs counted as SSNs (pattern order), not phones; both occurrences hit
    assert r2["n_ssn"] == 2 and r2["n_ipv4"] == 1 and r2["n_phone"] == 0
    assert r2["text"] == "ssn [SSN] leaked from [IP] twice: [SSN]"
    r3 = out[3]
    assert (r3["n_email"], r3["n_ssn"], r3["n_ipv4"], r3["n_phone"]) == (0, 0, 0, 0)
    assert r3["text"] == PLANTED_PII[2][1]
    assert out[4]["text"] == ""


def test_phone_pattern_spares_dates_times_versions(spark):
    """The r4 phone pattern matched any 8+-char digit/separator run, so
    dates, timestamps and version strings were rewritten to [PHONE] —
    heavy benign-text corruption for a pretraining corpus. The structured
    3-3-4 / +cc-grouped pattern must leave these shapes alone while still
    catching real phone formats."""
    benign = [
        (1, "released on 2026-08-14 at 08:14:33 under v2.10.3-rc.1"),
        (2, "range 100-2000, build 2026.08.14, pi is 3.14159 26535"),
        (3, "date 14.08.2026 and iso 2026-08-14T08:14:33"),
    ]
    phones = [
        (10, "call 555-123-4567 today"),
        (11, "call (555) 123 4567 today"),
        (12, "call +1 (555) 123-4567 today"),
        (13, "call +44 20 7946 0958 today"),
        (14, "call 5551234567 today"),
    ]
    df = spark.createDataFrame(benign + phones, "doc_id long, text string")
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    for i, text in benign:
        assert out[i]["n_phone"] == 0, (i, out[i]["text"])
        assert out[i]["text"] == text
    for i, _ in phones:
        assert out[i]["n_phone"] == 1, (i, out[i]["text"])
        assert "[PHONE]" in out[i]["text"]


def test_phone_pattern_never_matches_mid_token(spark):
    """ADVICE r5 + review fix: the international alternative lacked a
    trailing \\b (its leading slice of a long digit run got redacted
    mid-token), and the NANP alternative could start mid-run and clip a
    12-digit suffix. With every alternative word-bounded, a digit run
    longer than 15 (E.164 max) or glued to letters stays fully intact;
    real phones — including bare cc+NANP runs like 15551234567, which the
    first boundary fix briefly stopped catching — redact as whole
    tokens."""
    df = spark.createDataFrame(
        [
            (1, "ref +123456789012345678901 is an id, not a phone"),
            (2, "serial ABC5551234567 tail"),
            (3, "but +49 151 2345 6789 is one"),
            (4, "run +12345678901234567 reads as a bare number"),
            (5, "call me at 15551234567 now"),
            (6, "card 4111111111111111 on file"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[1]["n_phone"] == 0 and "+123456789012345678901" in out[1]["text"]
    assert out[2]["n_phone"] == 0 and "ABC5551234567" in out[2]["text"]
    assert out[3]["n_phone"] == 1 and "[PHONE]" in out[3]["text"]
    # documented residual: a '+'-prefixed 17-digit run redacts WHOLE — no
    # leftover digit fragments on either side of the token
    assert out[4]["n_phone"] == 1
    assert "[PHONE] reads" in out[4]["text"] and "run +" not in out[4]["text"]
    # bare 11-digit cc+NANP run is a phone (the review-caught regression)
    assert out[5]["n_phone"] == 1 and "[PHONE] now" in out[5]["text"]
    # 16-digit standalone runs (cards/serials) are ids, left whole
    assert out[6]["n_phone"] == 0 and "4111111111111111" in out[6]["text"]


def test_redact_pii_duckdb_dialect_parity(spark):
    """The regexes must mean the same thing under Java regex and RE2 —
    sequential replace+count in DuckDB over the planted frame must equal
    Spark's output exactly."""
    df = spark.createDataFrame(PLANTED_PII, "doc_id long, text string")
    got = canon(redact_pii(df).toPandas())

    pdf = pd.DataFrame(PLANTED_PII, columns=["doc_id", "text"])
    con = duckdb.connect()
    con.register("planted", pdf)
    cur = "text"
    cols = []
    for kind, pat, token in PII_PATTERNS:
        # standard SQL single-quoted strings pass backslashes through to RE2
        pat_sql = pat.replace("'", "''")
        cols.append(
            f"CAST(len(regexp_extract_all({cur}, '{pat_sql}')) AS INT) AS n_{kind}"
        )
        cur = f"regexp_replace({cur}, '{pat_sql}', '{token}', 'g')"
    sql = f"SELECT doc_id, {', '.join(cols)}, {cur} AS text FROM planted"
    want = canon(con.execute(sql).df())
    got["doc_id"] = got["doc_id"].astype("int64")
    for k, _, _ in PII_PATTERNS:
        got[f"n_{k}"] = got[f"n_{k}"].astype(want[f"n_{k}"].dtype)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want.reset_index(drop=True))


def test_redact_pii_keeps_other_columns_and_out_col(spark):
    df = spark.createDataFrame(
        [(1, "src", "mail me a@b.io")], "doc_id long, source string, text string"
    )
    out = redact_pii(df, out_col="clean").collect()[0]
    assert out["source"] == "src" and out["text"] == "mail me a@b.io"
    assert out["clean"] == "mail me [EMAIL]"
