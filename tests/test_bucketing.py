"""Bucketed-table co-located join: the 100 TB layout that removes the
fact-side shuffle entirely (pyspark_guide §Partitioning; SURVEY.md §4 —
bucketing replaces the reference's b-tree indexes for join locality)."""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE

from etl_airflow_adventureworks_spark.sources import load_table


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("bucketed_wh")
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    (
        li.write.mode("overwrite")
        .option("path", str(wh / "li_bucketed"))  # external table: explicit path
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
    )
    (
        orders.write.mode("overwrite")
        .option("path", str(wh / "orders_bucketed"))
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_bucketed")
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_bucketed_join_avoids_shuffle(bucketed):
    spark = bucketed
    joined = spark.sql(
        """
        SELECT l.l_orderkey, l.l_quantity, o.o_totalprice
        FROM li_bucketed l JOIN orders_bucketed o ON l.l_orderkey = o.o_orderkey
        """
    )
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located: both sides scan their buckets, no Exchange feeds the join
    assert "Exchange hashpartitioning" not in plan, plan
    # and the result matches the plain (shuffled) join
    li = load_table(spark, SF_SMOKE, "lineitem")
    orders = load_table(spark, SF_SMOKE, "orders")
    expected = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).count()
    assert joined.count() == expected
