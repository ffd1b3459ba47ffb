"""Declared-query registry behind __spark_entry__.py.

Every implemented operator/query registers itself here via the ``query``
decorator; ``__spark_entry__.queries()`` / ``oracle_sql()`` read these dicts.
A query is a ``Callable[[SparkSession, str], DataFrame]`` taking
``(spark, sf_dir)``; its oracle is ANSI SQL DuckDB runs over the same
parquet tables (views: region nation customer supplier part orders lineitem
events documents embeddings).

Parity rules (see SURVEY.md §7 risk register):
- alias every computed column identically in Spark and SQL;
- money/metric aggregates: exact DECIMAL arithmetic internally, cast to
  DOUBLE at the output boundary (bit-identical across engines; a double
  SUM would differ in final ulps by accumulation order);
- int-ish computed columns cast to BIGINT on both sides;
- any LIMIT/top-k query carries a total-order sort key (ties broken).
"""

from __future__ import annotations

import functools
import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Registration (= driver check) order. The driver verifies at most 50
# declared queries per round in this order, so the LLM-pipeline families
# (text / dedup / similarity / events / multimodal / streaming) register
# FIRST; the reference-parity families follow. The whole registry is kept
# at exactly 50 queries (COVERAGE.md maps SURVEY §2 ops → query names).
_MODULES = [
    "etl_airflow_adventureworks_spark.operators.textops",
    "etl_airflow_adventureworks_spark.operators.dedup",
    "etl_airflow_adventureworks_spark.operators.similarity",
    "etl_airflow_adventureworks_spark.operators.sessionize",
    "etl_airflow_adventureworks_spark.operators.funnel",
    "etl_airflow_adventureworks_spark.operators.timeseries",
    "etl_airflow_adventureworks_spark.operators.multimodal",
    "etl_airflow_adventureworks_spark.streaming.events",
    "etl_airflow_adventureworks_spark.plans.kpis",
    "etl_airflow_adventureworks_spark.plans.star",
    "etl_airflow_adventureworks_spark.operators.relational",
    "etl_airflow_adventureworks_spark.operators.functions_suite",
    "etl_airflow_adventureworks_spark.operators.asof",
    "etl_airflow_adventureworks_spark.operators.rangejoin",
]

_loaded = False


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as declared query ``name`` with optional DuckDB oracle.

    Every registered query runs under session timeZone=UTC (runtime-set on
    the caller's session): DuckDB timestamps are UTC-naive, so a driver
    session in any other zone would shift every date-derived value
    (pyspark_guide §Pitfalls). Harmless when already UTC.
    """

    def deco(fn: QueryFn) -> QueryFn:
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


def load_all() -> None:
    """Import every registering module (idempotent)."""
    global _loaded
    if _loaded:
        return
    for mod in _MODULES:
        importlib.import_module(mod)
    _loaded = True
