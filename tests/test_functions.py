"""Unit tests for the scalar/expression layer on tiny hand-built frames —
the edge cases the reference handles (FIXTURES.md §5)."""

from __future__ import annotations

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_airflow_adventureworks_spark.functions.money import (
    discount_amount,
    net_amount,
)
from etl_airflow_adventureworks_spark.functions.scalar import (
    classify_nullable,
    default_if_empty,
    full_name,
    month_name_pt,
    semester,
    surrogate_key,
    yyyymmdd_key,
)


def test_full_name_null_and_middle(spark):
    # NULL middle name must not leave a double space (etl_dim_vendedor.py:42-46)
    df = spark.createDataFrame(
        [("Ana", None, "Silva"), ("Bo", "Li", "Chen"), (None, None, None), ("  X ", "", "Y")],
        "first string, middle string, last string",
    )
    out = df.select(
        full_name(F.col("first"), F.col("middle"), F.col("last")).alias("n")
    ).collect()
    assert out[0]["n"] == "Ana Silva"
    assert out[1]["n"] == "Bo Li Chen"
    assert out[2]["n"] == ""  # all-null → empty (then default_if_empty applies)
    assert out[3]["n"] == "X Y"


def test_default_if_empty_and_classify(spark):
    df = spark.createDataFrame([("", 1), ("Maria", None)], "nome string, pid int")
    out = df.select(
        default_if_empty(F.col("nome"), "Cliente Corporativo / Loja").alias("nome"),
        classify_nullable(F.col("pid"), "Individual", "Store").alias("tipo"),
    ).collect()
    assert out[0]["nome"] == "Cliente Corporativo / Loja"
    assert out[0]["tipo"] == "Individual"
    assert out[1]["nome"] == "Maria"
    assert out[1]["tipo"] == "Store"


def test_month_name_and_semester(spark):
    df = spark.createDataFrame([(m,) for m in range(1, 13)], "m int")
    out = df.select("m", month_name_pt(F.col("m")).alias("nome"), semester(F.col("m")).alias("s")).collect()
    names = {r["m"]: r["nome"] for r in out}
    assert names[1] == "Janeiro" and names[3] == "Março" and names[12] == "Dezembro"
    assert all(r["s"] == (1 if r["m"] <= 6 else 2) for r in out)


def test_yyyymmdd_bijective_exhaustive(spark):
    # property: date ↔ YYYYMMDD key is bijective over the full reference
    # range 2010-2025 (op 34; stronger than sampling — all 5,844 days)
    df = spark.sql(
        "SELECT explode(sequence(date'2010-01-01', date'2025-12-31', interval 1 day)) AS d"
    ).select("d", yyyymmdd_key(F.col("d")).alias("k"))
    assert df.count() == 5844
    assert df.select("k").distinct().count() == 5844  # injective
    bad = df.filter(
        F.col("k")
        != F.year("d") * 10000 + F.month("d") * 100 + F.dayofmonth("d")
    ).count()
    assert bad == 0


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=0, max_value=10**10))
def test_money_decimal_roundtrip(cents):
    # pure-python property: any 2-decimal money value survives the
    # double→decimal(18,2) pin exactly (the cast path in functions.money)
    import decimal

    v = cents / 100.0
    assert decimal.Decimal(str(round(v, 2))) == decimal.Decimal(f"{cents // 100}.{cents % 100:02d}")


def test_money_exactness(spark):
    # 0.1+0.2-style float traps must not leak: decimals are exact
    df = spark.createDataFrame(
        [(100.10, 0.30), (0.01, 0.0), (99999999.99, 0.25)], "price double, disc double"
    )
    out = df.select(
        net_amount("price", "disc").cast("string").alias("net"),
        discount_amount("price", "disc").cast("string").alias("d"),
    ).collect()
    assert out[0]["net"] == "70.0700"
    assert out[0]["d"] == "30.0300"
    assert out[1]["net"] == "0.0100"
    assert out[2]["net"] == "74999999.9925"


def test_surrogate_key_deterministic(spark):
    df = spark.createDataFrame([("b",), ("a",), ("c",)], "k string")
    out1 = {r["k"]: r["sk"] for r in df.select("k", surrogate_key("k").alias("sk")).collect()}
    out2 = {r["k"]: r["sk"] for r in df.repartition(3).select("k", surrogate_key("k").alias("sk")).collect()}
    assert out1 == {"a": 1, "b": 2, "c": 3}
    assert out1 == out2  # partition-layout independent
