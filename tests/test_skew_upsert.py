"""Salted-join equivalence and SCD upsert semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMOKE

from etl_airflow_adventureworks_spark.operators.skew import salted_join
from etl_airflow_adventureworks_spark.operators.upsert import scd1_upsert, scd2_upsert
from etl_airflow_adventureworks_spark.sources import load_table


def test_salted_join_equals_plain_join(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, SF_SMOKE, "part").select("p_partkey", "p_name")
    plain = li.join(part, li["l_partkey"] == part["p_partkey"], "inner")
    salted = salted_join(li, part, "l_partkey", "p_partkey", "inner", n_salts=4)
    assert salted.count() == plain.count()
    a = sorted(map(tuple, plain.select("l_orderkey", "p_name").collect()))
    b = sorted(map(tuple, salted.select("l_orderkey", "p_name").collect()))
    assert a == b


def test_salted_left_join_keeps_unmatched(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_partkey")
    part = (
        load_table(spark, SF_SMOKE, "part")
        .filter(F.col("p_partkey") < 50)
        .select("p_partkey", "p_name")
    )
    plain = li.join(part, li["l_partkey"] == part["p_partkey"], "left").count()
    salted = salted_join(li, part, "l_partkey", "p_partkey", "left", n_salts=4).count()
    assert salted == plain


def test_scd1_upsert(spark):
    cur = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    upd = spark.createDataFrame([(2, "B"), (3, "C")], "k int, v string")
    out = {r["k"]: r["v"] for r in scd1_upsert(cur, upd, "k").collect()}
    assert out == {1: "a", 2: "B", 3: "C"}


def test_scd2_upsert(spark):
    cur = spark.createDataFrame(
        [(1, "a", "2024-01-01 00:00:00", None), (2, "b", "2024-01-01 00:00:00", None)],
        "k int, v string, valid_from string, valid_to string",
    ).select(
        "k",
        "v",
        F.to_timestamp("valid_from").alias("valid_from"),
        F.to_timestamp("valid_to").alias("valid_to"),
    )
    upd = spark.createDataFrame(
        [(2, "B", "2024-06-01 00:00:00")], "k int, v string, change_ts string"
    ).select("k", "v", F.to_timestamp("change_ts").alias("change_ts"))
    out = scd2_upsert(cur, upd, "k").collect()
    by_kv = {(r["k"], r["v"]): (r["valid_from"], r["valid_to"]) for r in out}
    assert len(out) == 3
    assert by_kv[(1, "a")][1] is None  # untouched, still open
    assert by_kv[(2, "b")][1] is not None  # closed at change_ts
    assert by_kv[(2, "B")][1] is None  # new open version


def test_as_of_snapshot_point_in_time(spark):
    from etl_airflow_adventureworks_spark.operators.upsert import as_of_snapshot

    cur = spark.createDataFrame(
        [(1, "a", "2024-01-01 00:00:00", None), (2, "b", "2024-01-01 00:00:00", None)],
        "k int, v string, valid_from string, valid_to string",
    ).select(
        "k", "v",
        F.to_timestamp("valid_from").alias("valid_from"),
        F.to_timestamp("valid_to").alias("valid_to"),
    )
    upd = spark.createDataFrame(
        [(2, "B", "2024-06-01 00:00:00")], "k int, v string, change_ts string"
    ).select("k", "v", F.to_timestamp("change_ts").alias("change_ts"))
    hist = scd2_upsert(cur, upd, "k")

    import datetime as dt

    before = {(r["k"], r["v"]) for r in as_of_snapshot(hist, dt.datetime(2024, 3, 1)).collect()}
    after = {(r["k"], r["v"]) for r in as_of_snapshot(hist, dt.datetime(2024, 7, 1)).collect()}
    boundary = {(r["k"], r["v"]) for r in as_of_snapshot(hist, dt.datetime(2024, 6, 1)).collect()}
    assert before == {(1, "a"), (2, "b")}
    assert after == {(1, "a"), (2, "B")}
    assert boundary == after  # valid_to is exclusive, valid_from inclusive
