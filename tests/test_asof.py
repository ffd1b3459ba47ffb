"""Two-table as-of join verified against the window-form attribution query."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_ORACLE

import __spark_entry__ as entrymod
from etl_airflow_adventureworks_spark.operators.asof import asof_join
from etl_airflow_adventureworks_spark.sources import load_table


def test_asof_join_matches_window_form(spark):
    ev = load_table(spark, SF_ORACLE, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts_us"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts_us")
    joined = asof_join(purchases, views, on="ts_us", by="user_id")
    got = {
        r["purchase_id"]: r["ts_us_right"] for r in joined.collect()
    }
    want = {
        r["purchase_id"]: r["last_view_us"]
        for r in entrymod.queries()["ext_asof_attribution"](spark, SF_ORACLE).collect()
    }
    assert got == want


def test_asof_join_no_right_rows(spark):
    left = spark.createDataFrame([(1, 10), (1, 20)], "k int, t int")
    right = spark.createDataFrame([], "k int, t int, v string")
    out = asof_join(left, right, on="t", by="k").collect()
    assert len(out) == 2
    assert all(r["v_right"] is None for r in out)


def test_asof_join_skew_guard_fails_loud(spark):
    """A group over max_group_rows must raise the documented remedy error
    instead of quietly building an oversized pandas frame."""
    import pytest
    from pyspark.errors import PythonException

    left = spark.range(50).selectExpr("1 AS ent", "id AS t", "id AS lv")
    right = spark.range(10).selectExpr("1 AS ent", "id * 5 AS t", "id AS rv")
    out = asof_join(left, right, on="t", by="ent", max_group_rows=20)
    with pytest.raises(PythonException, match="max_group_rows"):
        out.collect()
