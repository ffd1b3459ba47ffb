"""Parquet table source — the warehouse scan (SURVEY.md §2 op 1/2).

Reference behavior: ``pd.read_csv``/``pd.read_sql`` with inferred schemas
(`dags/etl_dim_produto.py:14-16`, `dags/etl_fato_vendas.py:21-24`).
Spark-first mapping: columnar parquet scans; Catalyst pushes filters and
prunes columns down to the scan, so callers just ``.select``/``.filter``
declaratively. At 100 TB the scan is the dominant cost — everything here
keeps pushdown intact (no eager cache, no schema-mangling reads).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Every driver-provided testdata table (TESTDATA.md).
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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table. Parquet embeds the schema — no inference race.

    ``events.ts`` is written as TIMESTAMP(NANOS), which Spark's vectorized
    parquet reader refuses by default; we read nanos as long (runtime legacy
    conf) and floor-divide to microseconds — exact integer arithmetic, no
    double rounding (SparkSession TimestampType is µs everywhere).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register temp views so SQL-form queries can run against the same scans."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
