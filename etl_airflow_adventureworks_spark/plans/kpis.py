"""The 10 KPI analytical queries (reference: KPIs.sql:1-83) over testdata.

The reference delegates these to b-tree-indexed Postgres (SURVEY.md §3 entry
point C); here each is a lazy DataFrame plan — Catalyst plans broadcast hash
joins for the small dimensions and partial+final hash aggregation, which is
the 100 TB-correct shape (one shuffle on the group key, map-side combine).

Schema mapping reference → testdata (FIXTURES.md):
  fato_vendas → orders ⋈ lineitem,   dim_produto → part,
  dim_vendedor → supplier,           dim_localidade/cliente geo → customer ⋈ nation ⋈ region,
  dim_tempo → derived from o_orderdate.

KPI ↔ reference line map: kpi01 gross revenue KPIs.sql:4-6 · kpi02 net
revenue :9-11 · kpi03 discounts :14-16 · kpi04 volume :19-21 · kpi05 top-5
products :27-34 · kpi06 by category+count :37-44 · kpi07 by country :49-56 ·
kpi08 seasonality :59-67 · kpi09 top-10 sellers (IS NOT NULL) :69-78 ·
kpi10 avg ticket :81-83.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import davg, discount_amount, dsum, money, net_amount
from ..functions.scalar import MONTH_NAMES_PT, month_name_pt
from ..registry import query
from ..sources import load_table

# ---------------------------------------------------------------------------
# shared expression fragments — single source of truth for Spark AND oracle
# ---------------------------------------------------------------------------

#: DuckDB twin of functions.money.net_amount / discount_amount.
SQL_NET = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)
SQL_DISC = "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))"

#: DuckDB twin of functions.scalar.month_name_pt (op 33 — data, not locale).
SQL_MONTH_PT = (
    "CASE CAST(month(o_orderdate) AS BIGINT) "
    + " ".join(f"WHEN {m} THEN '{n}'" for m, n in MONTH_NAMES_PT.items())
    + " END"
)


def _net(df: DataFrame) -> F.Column:
    return net_amount(df["l_extendedprice"], df["l_discount"])


def _sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ lineitem — the header×detail fact grain (op 17,
    dags/etl_fato_vendas.py:30).

    The join is pinned sort-merge (r16, guide §3.1): orders is the OTHER
    fact-side table — at production scale it can never broadcast, so SMJ
    (bucketed co-partition shuffle-free, tests/test_bucketing.py) is the
    real plan. Un-hinted, the local bench's small files sat under the
    auto-broadcast threshold and Spark built + shipped a 150k-row hash
    relation per run AND pipelined the whole downstream agg into the
    single-row-group scan task; pinning merge measured 1.69s → 0.94s
    (kpi07 fresh-plan median) and removes the local/cluster plan split."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.hint("merge").join(
        orders, lineitem["l_orderkey"] == orders["o_orderkey"], "inner"
    )


# ---------------------------------------------------------------------------
# KPI 1-4, 10 — global aggregates (ops 19-21)
# ---------------------------------------------------------------------------


def kpi01_gross_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global SUM — gross revenue (KPIs.sql:4-6)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(dsum(money("l_extendedprice"), "gross_revenue"))


def kpi02_net_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global SUM of computed money expr — net revenue (KPIs.sql:9-11)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(dsum(net_amount("l_extendedprice", "l_discount"), "net_revenue"))


def kpi03_total_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total discounts granted (KPIs.sql:14-16)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(dsum(discount_amount("l_extendedprice", "l_discount"), "total_discount"))


def kpi04_total_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Units sold (KPIs.sql:19-21). Quantities are integral → exact BIGINT sum."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("total_qty"))


def kpi10_avg_ticket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average line value (KPIs.sql:81-83) — order-independent AVG
    (exact decimal SUM ÷ COUNT, see functions.money.davg)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(davg(net_amount("l_extendedprice", "l_discount"), "avg_ticket"))


@query(
    "kpi_globals",
    oracle=f"""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS gross_revenue,
           CAST(SUM({SQL_NET}) AS DOUBLE) AS net_revenue,
           CAST(SUM({SQL_DISC}) AS DOUBLE) AS total_discount,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
           CAST(SUM({SQL_NET}) AS DOUBLE) / COUNT(*) AS avg_ticket
    FROM lineitem
    """,
)
def kpi_globals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The five global KPIs (KPIs.sql:4-21,81-83 — gross/net revenue, total
    discounts, unit volume, average ticket; ops 19-21) in ONE aggregation
    pass: five aggregates share a single scan + single-row reduce, instead
    of the reference's five separate Postgres queries. Each aggregate is an
    exact decimal/bigint reduction cast to double at the boundary
    (order-independent under AQE re-planning — functions.money).

    The individual single-KPI DataFrame forms remain above (KPI_DF) for the
    SQL-text entry-point equivalence tests."""
    li = load_table(spark, sf_dir, "lineitem")
    net = net_amount("l_extendedprice", "l_discount")
    return li.agg(
        dsum(money("l_extendedprice"), "gross_revenue"),
        dsum(net, "net_revenue"),
        dsum(discount_amount("l_extendedprice", "l_discount"), "total_discount"),
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("total_qty"),
        davg(net, "avg_ticket"),
    )


# ---------------------------------------------------------------------------
# KPI 5-9 — grouped aggregates, top-k, seasonality (ops 22-26)
# ---------------------------------------------------------------------------


@query(
    "kpi05_top5_products",
    oracle=f"""
    SELECT p_name, CAST(SUM({SQL_NET}) AS DOUBLE) AS net_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_name
    ORDER BY net_revenue DESC, p_name
    LIMIT 5
    """,
)
def kpi05_top5_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 products by net revenue (KPIs.sql:27-34). Broadcast lookup join
    (op 18) + TakeOrderedAndProject top-k (op 26); p_name tie-break gives a
    total order."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"], "inner")
        .groupBy("p_name")
        .agg(dsum(net_amount("l_extendedprice", "l_discount"), "net_revenue"))
        .orderBy(F.desc("net_revenue"), F.asc("p_name"))
        .limit(5)
    )


@query(
    "kpi06_sales_by_category",
    oracle=f"""
    SELECT p_brand AS category, CAST(SUM({SQL_NET}) AS DOUBLE) AS net_revenue,
           COUNT(*) AS n_sales
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    ORDER BY net_revenue DESC, category
    """,
)
def kpi06_sales_by_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue + sale count by category (KPIs.sql:37-44; op 23 multi-agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"], "inner")
        .groupBy(F.col("p_brand").alias("category"))
        .agg(
            dsum(net_amount("l_extendedprice", "l_discount"), "net_revenue"),
            F.count(F.lit(1)).alias("n_sales"),
        )
        .orderBy(F.desc("net_revenue"), F.asc("category"))
    )


@query(
    "kpi07_sales_by_country",
    oracle=f"""
    SELECT n_name AS country, CAST(SUM({SQL_NET}) AS DOUBLE) AS net_revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY net_revenue DESC, country
    """,
)
def kpi07_sales_by_country(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by customer country (KPIs.sql:49-56) — the geo snowflake
    (ops 16+18): fact ⋈ orders ⋈ customer ⋈ broadcast(nation)."""
    sales = _sales(spark, sf_dir)
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        sales.join(customer, sales["o_custkey"] == customer["c_custkey"], "inner")
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"], "inner")
        .groupBy(F.col("n_name").alias("country"))
        .agg(dsum(net_amount("l_extendedprice", "l_discount"), "net_revenue"))
        .orderBy(F.desc("net_revenue"), F.asc("country"))
    )


@query(
    "kpi08_seasonality",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS ano,
           CAST(month(o_orderdate) AS BIGINT) AS mes,
           {SQL_MONTH_PT} AS nome_mes,
           CAST(SUM({SQL_NET}) AS DOUBLE) AS net_revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1, 2, 3
    ORDER BY ano, mes
    """,
)
def kpi08_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly seasonality (KPIs.sql:59-67; op 24 composite-key groupBy with
    pt-BR month names, op 33)."""
    sales = _sales(spark, sf_dir)
    mes = F.month("o_orderdate").cast("long")
    return (
        sales.groupBy(
            F.year("o_orderdate").cast("long").alias("ano"),
            mes.alias("mes"),
            month_name_pt(mes).alias("nome_mes"),
        )
        .agg(dsum(net_amount("l_extendedprice", "l_discount"), "net_revenue"))
        .orderBy("ano", "mes")
    )


@query(
    "kpi09_top10_suppliers",
    oracle=f"""
    SELECT s_name, CAST(SUM({SQL_NET}) AS DOUBLE) AS net_revenue
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    WHERE s_name IS NOT NULL
    GROUP BY s_name
    ORDER BY net_revenue DESC, s_name
    LIMIT 10
    """,
)
def kpi09_top10_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 sellers excluding NULL names (KPIs.sql:69-78; op 25 filtered
    group-agg + op 11 IS NOT NULL + op 26 top-k)."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        li.join(F.broadcast(supplier), li["l_suppkey"] == supplier["s_suppkey"], "inner")
        .filter(F.col("s_name").isNotNull())
        .groupBy("s_name")
        .agg(dsum(net_amount("l_extendedprice", "l_discount"), "net_revenue"))
        .orderBy(F.desc("net_revenue"), F.asc("s_name"))
        .limit(10)
    )


#: name → DataFrame builder for all ten reference KPIs — the SQL-text entry
#: point (plans.kpis_sql) is asserted equal to these forms in tests even
#: though the registry declares the five global KPIs as one merged query.
KPI_DF = {
    "kpi01_gross_revenue": kpi01_gross_revenue,
    "kpi02_net_revenue": kpi02_net_revenue,
    "kpi03_total_discount": kpi03_total_discount,
    "kpi04_total_volume": kpi04_total_volume,
    "kpi05_top5_products": kpi05_top5_products,
    "kpi06_sales_by_category": kpi06_sales_by_category,
    "kpi07_sales_by_country": kpi07_sales_by_country,
    "kpi08_seasonality": kpi08_seasonality,
    "kpi09_top10_suppliers": kpi09_top10_suppliers,
    "kpi10_avg_ticket": kpi10_avg_ticket,
}
