"""SQL-text entry point (SURVEY.md §3 entry point C).

The reference's analytical surface is raw SQL submitted to Postgres
(KPIs.sql via DBeaver, README.md:15). This module preserves that interface:
the same 10 KPIs as SQL strings over registered temp views, executed by
``spark.sql`` — Catalyst produces the same plans as the DataFrame forms in
``plans.kpis`` (asserted in tests/test_sql_entrypoint.py).

The SQL dialect here is Spark SQL; the DuckDB oracles in ``plans.kpis``
remain the cross-engine checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.scalar import MONTH_NAMES_PT
from ..sources import register_views

_NET = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)
_MONTH_PT = (
    "CASE CAST(month(o_orderdate) AS BIGINT) "
    + " ".join(f"WHEN {m} THEN '{n}'" for m, n in MONTH_NAMES_PT.items())
    + " END"
)

#: KPI name → Spark SQL text (same aliases as the DataFrame forms).
KPI_SQL: dict[str, str] = {
    "kpi01_gross_revenue": (
        "SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)"
        " AS gross_revenue FROM lineitem"
    ),
    "kpi02_net_revenue": f"SELECT CAST(SUM({_NET}) AS DOUBLE) AS net_revenue FROM lineitem",
    "kpi03_total_discount": (
        "SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
        " * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS total_discount FROM lineitem"
    ),
    "kpi04_total_volume": (
        "SELECT CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty FROM lineitem"
    ),
    "kpi05_top5_products": f"""
        SELECT p_name, CAST(SUM({_NET}) AS DOUBLE) AS net_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_name ORDER BY net_revenue DESC, p_name LIMIT 5
    """,
    "kpi06_sales_by_category": f"""
        SELECT p_brand AS category, CAST(SUM({_NET}) AS DOUBLE) AS net_revenue,
               COUNT(*) AS n_sales
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand ORDER BY net_revenue DESC, category
    """,
    "kpi09_top10_suppliers": f"""
        SELECT s_name, CAST(SUM({_NET}) AS DOUBLE) AS net_revenue
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        WHERE s_name IS NOT NULL
        GROUP BY s_name ORDER BY net_revenue DESC, s_name LIMIT 10
    """,
    "kpi07_sales_by_country": f"""
        SELECT n_name AS country, CAST(SUM({_NET}) AS DOUBLE) AS net_revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY net_revenue DESC, country
    """,
    "kpi08_seasonality": f"""
        SELECT CAST(year(o_orderdate) AS BIGINT) AS ano,
               CAST(month(o_orderdate) AS BIGINT) AS mes,
               {_MONTH_PT} AS nome_mes,
               CAST(SUM({_NET}) AS DOUBLE) AS net_revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2, 3 ORDER BY ano, mes
    """,
    "kpi10_avg_ticket": (
        f"SELECT CAST(SUM({_NET}) AS DOUBLE) / COUNT(*) AS avg_ticket FROM lineitem"
    ),
}


def run_kpi_sql(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Execute a KPI by SQL text over registered views — the DBeaver-style
    interface a reference user would migrate to."""
    register_views(spark, sf_dir)
    return spark.sql(KPI_SQL[name])
