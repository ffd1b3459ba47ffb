"""Data-quality expectations (`operators/quality.py`): DuckDB parity per
check kind on the real testdata tables, planted-violation quarantine
semantics, and the one-scan compilation contract."""

from __future__ import annotations

import duckdb
import pytest

from etl_airflow_adventureworks_spark.operators import quality as Q
from etl_airflow_adventureworks_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _duck(sql: str) -> int:
    con = duckdb.connect()
    for t in ("orders", "lineitem", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(sql).fetchone()[0]


def test_validate_duckdb_parity_real_tables(spark):
    lineitem = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders")
    checks = [
        Q.not_null("l_shipdate"),
        Q.in_range("l_discount", 0, 0.05),
        Q.in_range("l_quantity", lo=10),
        Q.in_set("l_returnflag", ["A", "N"]),
        Q.matches("l_linestatus", "^[OF]$"),
        Q.expression("qty_price", "l_extendedprice >= l_quantity"),
        Q.unique("l_orderkey"),
        Q.unique("l_orderkey", "l_linenumber"),
        Q.foreign_key("l_orderkey", orders, "o_orderkey"),
    ]
    report = {r["check"]: r for r in Q.validate(lineitem, checks).collect()}
    want = {
        "not_null(l_shipdate)":
            "SELECT count(*) FROM lineitem WHERE l_shipdate IS NULL",
        "in_range(l_discount)":
            "SELECT count(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 0.05",
        "in_range(l_quantity)":
            "SELECT count(*) FROM lineitem WHERE l_quantity < 10",
        "in_set(l_returnflag)":
            "SELECT count(*) FROM lineitem WHERE l_returnflag IS NOT NULL"
            " AND l_returnflag NOT IN ('A','N')",
        "matches(l_linestatus)":
            "SELECT count(*) FROM lineitem WHERE l_linestatus IS NOT NULL"
            " AND NOT regexp_matches(l_linestatus, '^[OF]$')",
        "expression(qty_price)":
            "SELECT count(*) FROM lineitem WHERE l_extendedprice >= l_quantity"
            " IS NOT TRUE",
        "unique(l_orderkey)":
            "SELECT count(*) - count(DISTINCT l_orderkey) FROM lineitem",
        "unique(l_orderkey,l_linenumber)":
            "SELECT count(*) - count(DISTINCT (l_orderkey, l_linenumber))"
            " FROM lineitem",
        "foreign_key(l_orderkey->o_orderkey)":
            "SELECT count(*) FROM lineitem WHERE l_orderkey IS NOT NULL AND"
            " l_orderkey NOT IN (SELECT o_orderkey FROM orders)",
    }
    assert set(report) == set(want)
    n = lineitem.count()
    for name, sql in want.items():
        row = report[name]
        assert row["violations"] == _duck(sql), name
        assert row["n_rows"] == n and row["passed"] == (row["violations"] == 0)
    # the multi-line-order corpus really exercises the interesting cases
    assert report["unique(l_orderkey)"]["violations"] > 0
    assert report["in_range(l_discount)"]["violations"] > 0
    assert report["foreign_key(l_orderkey->o_orderkey)"]["violations"] == 0


def test_validate_fk_violations_detected(spark):
    orders = load_table(spark, SF, "orders")
    customer = load_table(spark, SF, "customer").filter("c_custkey <= 50")
    got = Q.validate(orders, [Q.foreign_key("o_custkey", customer, "c_custkey")])
    want = _duck(
        "SELECT count(*) FROM orders WHERE o_custkey IS NOT NULL AND o_custkey"
        " NOT IN (SELECT c_custkey FROM customer WHERE c_custkey <= 50)"
    )
    assert got.first()["violations"] == want > 0


@pytest.fixture()
def planted(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "ok", 100),
            (2, None, "ok", 100),        # null price
            (3, -5.0, "ok", 100),        # range
            (3, 20.0, "bad pat", 100),   # dup id + pattern
            (3, 20.0, "ok", 999),        # dup id + fk miss
            (4, 10.0, "ok", None),       # null FK is LEGAL
        ],
        "id long, price double, label string, ref long",
    )


def test_split_valid_quarantine(spark, planted):
    ref = spark.createDataFrame([(100,), (200,)], "k long")
    checks = [
        Q.not_null("price"),
        Q.in_range("price", 0, 100),
        Q.matches("label", "^[a-z]+$"),
        Q.unique("id"),
        Q.foreign_key("ref", ref, "k"),
    ]
    good, bad = Q.split_valid(planted, checks)
    assert sorted(good.columns) == sorted(planted.columns)
    # ids 1 and 4 survive (null FK legal); the whole duplicated id=3
    # group is quarantined, as are the null-price and range offenders
    assert {r["id"] for r in good.collect()} == {1, 4}
    failed = {
        (r["id"], r["price"], r["ref"]): set(r["_failed"])
        for r in bad.collect()
    }
    assert failed[(2, None, 100)] == {"not_null(price)"}
    assert failed[(3, -5.0, 100)] == {"in_range(price)", "unique(id)"}
    assert failed[(3, 20.0, 100)] == {"matches(label)", "unique(id)"}
    assert failed[(3, 20.0, 999)] == {"unique(id)", "foreign_key(ref->k)"}
    # split and report agree: every row is in exactly one side
    assert good.count() + bad.count() == planted.count()


def test_report_matches_split_counts(spark, planted):
    ref = spark.createDataFrame([(100,), (200,)], "k long")
    checks = [
        Q.not_null("price"),
        Q.in_range("price", 0, 100),
        Q.unique("id"),
        Q.foreign_key("ref", ref, "k"),
    ]
    report = {r["check"]: r["violations"]
              for r in Q.validate(planted, checks).collect()}
    _, bad = Q.split_valid(planted, checks)
    per_check: dict[str, int] = {}
    for r in bad.collect():
        for name in r["_failed"]:
            per_check[name] = per_check.get(name, 0) + 1
    # row-local + FK counts line up 1:1; unique's report counts EXTRA
    # rows (count - distinct) while quarantine holds the WHOLE group
    assert per_check["not_null(price)"] == report["not_null(price)"] == 1
    assert per_check["in_range(price)"] == report["in_range(price)"] == 1
    assert per_check["foreign_key(ref->k)"] == report["foreign_key(ref->k)"] == 1
    assert report["unique(id)"] == 2 and per_check["unique(id)"] == 3


def test_row_local_checks_compile_to_one_scan(spark):
    lineitem = load_table(spark, SF, "lineitem")
    checks = [
        Q.not_null("l_shipdate"),
        Q.in_range("l_discount", 0, 0.05),
        Q.in_set("l_returnflag", ["A", "N"]),
        Q.matches("l_linestatus", "^[OF]$"),
        Q.unique("l_orderkey"),
    ]
    # rebuild exactly the aggregate validate() compiles (validate itself
    # eagerly collects the one report row, so pin the plan of its agg)
    import io
    from contextlib import redirect_stdout

    agg_cols = []
    for i, c in enumerate(checks[:4]):
        agg_cols.append(Q.F.sum(Q._violation_pred(c).cast("long")).alias(f"v{i}"))
    agg_cols.append(
        (Q.F.count(Q.F.lit(1)) - Q.F.count_distinct("l_orderkey")).alias("v4")
    )
    df = lineitem.agg(*agg_cols)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()
    # ONE scan feeds all five checks; everything stays JVM-side
    # (formatted explain lists each node in the tree AND the detail
    # section — count numbered nodes)
    import re

    assert len(re.findall(r"\(\d+\) Scan parquet", text)) == 1
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text


def test_bad_specs_fail_loud(spark, planted):
    with pytest.raises(ValueError, match="at least one bound"):
        Q.in_range("price")
    with pytest.raises(ValueError, match="at least one column"):
        Q.unique()
    with pytest.raises(ValueError, match="unknown check kind"):
        Q.validate(planted, [{"kind": "nope", "col": "x"}])
    with pytest.raises(ValueError, match="helper names"):
        Q.split_valid(
            planted.withColumnRenamed("id", "_q0"), [Q.not_null("price")]
        )
