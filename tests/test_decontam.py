"""Gates for operators/decontam.py (benchmark decontamination).

The contamination count gets the driver-gate treatment: exact parity
against a DuckDB string-join oracle on the same sf0.01 documents split
(the Spark side joins on xxhash64 shingle ids — count-equality against
the raw-string join also certifies the hashing loses nothing here).
"""

from __future__ import annotations

import duckdb
import pandas as pd

from conftest import SF_ORACLE

from etl_airflow_adventureworks_spark.operators.decontam import (
    contamination_report,
    decontaminate,
)
from etl_airflow_adventureworks_spark.sources import load_table

from test_oracle_parity import canon

#: eval set = every 29th doc — benchmark-sized next to the rest.
EVAL_PRED = "doc_id % 29 = 0"
N = 5  # short shingles so the tiny-vocab corpus has real cross-set overlap


CONTAM_ORACLE = rf"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents
),
sh AS (
  SELECT doc_id,
    list_distinct([array_to_string(tk[i + 1 : i + {N}], ' ')
                   FOR i IN range(0, greatest(len(tk) - {N}, 0) + 1)]) AS g
  FROM t
),
train AS (SELECT doc_id, unnest(g) AS s FROM sh WHERE NOT (doc_id % 29 = 0)),
ev AS (SELECT DISTINCT unnest(g) AS s FROM sh WHERE doc_id % 29 = 0)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
FROM train JOIN ev USING (s)
GROUP BY doc_id
"""


def _split(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    return docs.filter(f"NOT ({EVAL_PRED})"), docs.filter(EVAL_PRED)


def test_contamination_report_duckdb_parity(spark):
    train, ev = _split(spark)
    got = canon(contamination_report(train, ev, n=N).toPandas())
    assert len(got) > 0, "no cross-set overlap — test corpus changed?"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_ORACLE}/documents.parquet')"
    )
    want = canon(con.execute(CONTAM_ORACLE).df())
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want.reset_index(drop=True))


def test_decontaminate_drops_exactly_flagged(spark):
    train, ev = _split(spark)
    flagged = {
        r["doc_id"] for r in contamination_report(train, ev, n=N).collect()
    }
    kept = {r["doc_id"] for r in decontaminate(train, ev, n=N).select("doc_id").collect()}
    all_train = {r["doc_id"] for r in train.select("doc_id").collect()}
    assert kept == all_train - flagged
    assert flagged and kept  # both sides non-trivial


def test_decontaminate_planted(spark):
    ev = spark.createDataFrame(
        [(100, "the secret benchmark answer is forty two exactly here")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "prefix words the secret benchmark answer is forty two exactly here suffix"),
            (2, "completely unrelated text about parquet shuffles and joins today"),
            (3, "short"),  # shorter than n → single clamped shingle, no match
        ],
        "doc_id long, text string",
    )
    rep = {r["doc_id"]: r["n_overlap"] for r in contamination_report(train, ev, n=8).collect()}
    assert 1 in rep and 2 not in rep and 3 not in rep
    kept = [r["doc_id"] for r in decontaminate(train, ev, n=8).select("doc_id").collect()]
    assert sorted(kept) == [2, 3]


def test_min_overlap_threshold(spark):
    train, ev = _split(spark)
    rep = contamination_report(train, ev, n=N)
    hi = rep.agg({"n_overlap": "max"}).collect()[0][0]
    strict = decontaminate(train, ev, n=N, min_overlap=hi + 1)
    assert strict.count() == train.count()  # nothing reaches the bar
