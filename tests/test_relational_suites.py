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
