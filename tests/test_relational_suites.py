"""Fold contracts for the relational suites (COVERAGE.md eviction policy):
every evicted query must stay result-equal to the section of its absorber
that carries it, and the registry must hold at its 50-slot cap."""

from __future__ import annotations

from conftest import SF_ORACLE

import __spark_entry__ as entrymod
from etl_airflow_adventureworks_spark.operators.relational import ext_table_profile


def test_table_profile_matches_absorber_profile_rows(spark):
    # round-7 fold: ext_table_profile → ext_distribution_suite 'profile'
    # rows (same orders scan). The standalone library form must equal the
    # absorber's section exactly, column-for-column.
    standalone = {
        r["col"]: (
            float(r["n_rows"]),
            float(r["n_null"]),
            float(r["n_distinct"]),
            r["min_val"],
            r["max_val"],
        )
        for r in ext_table_profile(spark, SF_ORACLE).collect()
    }
    absorbed = {
        r["k"]: (r["v1"], r["v2"], r["v3"], r["v4"], r["v5"])
        for r in entrymod.queries()["ext_distribution_suite"](spark, SF_ORACLE)
        .filter("stat = 'profile'")
        .collect()
    }
    assert standalone == absorbed
    assert len(standalone) == 3


def test_registry_holds_at_cap():
    # the driver verifies at most 50 declared queries; the fold policy
    # exists to keep the registry exactly there — a 51st query would fall
    # off the correctness gate silently
    q = entrymod.queries()
    assert len(q) == 50, sorted(q)
    assert "ext_range_join" in q and "ext_table_profile" not in q


def test_bpe_twin_matches_absorber(spark):
    # r9 fold: ext_bpe_token_count → ext_token_stats. Same scan, same
    # per-doc granularity; the twin's n_ws_tokens is the absorber's
    # n_tokens by definition (same expression).
    from etl_airflow_adventureworks_spark.operators.textops import (
        ext_bpe_token_count,
    )

    twin = {r["doc_id"]: (r["n_bpe_tokens"], r["n_ws_tokens"])
            for r in ext_bpe_token_count(spark, SF_ORACLE).collect()}
    absorber = {r["doc_id"]: (r["n_bpe_tokens"], r["n_tokens"])
                for r in entrymod.queries()["ext_token_stats"](spark, SF_ORACLE)
                .select("doc_id", "n_bpe_tokens", "n_tokens").collect()}
    assert twin == absorber and len(twin) > 0


def test_fingerprint_twin_matches_absorber(spark):
    # r9 fold: ext_fingerprint → ext_token_stats.
    from etl_airflow_adventureworks_spark.operators.textops import (
        ext_fingerprint,
    )

    twin = {r["doc_id"]: (r["content_hash"], r["min_shingle_hash"])
            for r in ext_fingerprint(spark, SF_ORACLE).collect()}
    absorber = {r["doc_id"]: (r["content_hash"], r["min_shingle_hash"])
                for r in entrymod.queries()["ext_token_stats"](spark, SF_ORACLE)
                .collect()}
    assert twin == absorber and len(twin) > 0


def test_r9_fold_slots():
    # the r9 slot changes: three folds in, three new declared rows
    q = entrymod.queries()
    for gone in ("ext_bpe_token_count", "ext_fingerprint",
                 "ext_event_funnel_pivot"):
        assert gone not in q
    for new in ("ext_event_analytics_suite", "ext_gapfill",
                "ext_cohort_retention"):
        assert new in q and new in entrymod.oracle_sql()
