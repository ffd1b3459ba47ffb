"""Local replica of the driver's DuckDB oracle gate (strictest form).

Runs every declared query at sf0.01 against its oracle SQL and demands
EXACT value equality (bit-exact floats) after order-insensitive row sort —
if this passes, the driver's order-insensitive value-hash compare passes.
"""

from __future__ import annotations

import datetime
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd
import pytest

from conftest import SF_ORACLE

import __spark_entry__ as entrymod

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize for order-insensitive compare: sort columns by name,
    normalize cell types, sort rows by all columns."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None).astype("datetime64[us]")
        elif s.dtype == object:
            def norm(v):
                if isinstance(v, Decimal):
                    return float(v)
                if isinstance(v, datetime.datetime):
                    return pd.Timestamp(v).tz_localize(None).to_datetime64()
                if isinstance(v, datetime.date):
                    return pd.Timestamp(v).to_datetime64()
                if isinstance(v, (list, np.ndarray)):
                    return tuple(np.asarray(v).tolist())
                return v
            df[c] = s.map(norm)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def assert_parity(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    a, b = canon(spark_pdf), canon(duck_pdf)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True, obj=name)


def _oracle_names():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q), "oracle without query"
    return sorted(o)


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF_ORACLE)
    yield con
    con.close()


@pytest.mark.parametrize("name", _oracle_names())
def test_parity(spark, duck, name):
    spark_pdf = entrymod.queries()[name](spark, SF_ORACLE).toPandas()
    duck_pdf = duck.execute(entrymod.oracle_sql()[name]).df()
    assert_parity(spark_pdf, duck_pdf, name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None
