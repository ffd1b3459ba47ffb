"""Relational core operators (SURVEY.md §2 ops 7-18, 26-27, 36 + window rank).

Each declared query re-expresses one reference operator shape over the
testdata tables, with its DuckDB oracle twin. The reference implements these
with eager pandas (`merge`/`dropna`/`drop_duplicates`/ORDER BY+LIMIT —
citations per function); here each is a lazy Catalyst plan, so pushdown,
pruning and join-strategy selection are free.

Scale notes (100 TB posture):
- lookup joins broadcast the dimension side explicitly (op 18) — at scale
  AQE would also pick this under the broadcast threshold;
- dedup/window ops shuffle ONCE on the partition key; no driver loops;
- top-k compiles to TakeOrderedAndProject (no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.money import discount_amount, dsum, net_amount
from ..functions.scalar import full_name, surrogate_key, yyyymmdd_key
from ..registry import query
from ..sources import load_table

# ---------------------------------------------------------------------------
# projections / filters / predicates (ops 7-13)
# ---------------------------------------------------------------------------


@query(
    "op07_projection",
    oracle="SELECT p_partkey, p_name, p_retailprice FROM part",
)
def op07_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column selection (op 7; reference `df[['A','B']].copy()`,
    etl_dim_produto.py:27). Catalyst prunes the parquet scan to 3 columns."""
    return load_table(spark, sf_dir, "part").select("p_partkey", "p_name", "p_retailprice")


@query(
    "op09_rename",
    oracle="""
    SELECT c_custkey AS id_cliente_original, c_name AS nome_completo,
           c_mktsegment AS segmento
    FROM customer
    """,
)
def op09_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column rename (op 9; reference wholesale `df.columns = [...]`,
    etl_dim_produto.py:29-35) — select+alias, no data movement."""
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id_cliente_original"),
        F.col("c_name").alias("nome_completo"),
        F.col("c_mktsegment").alias("segmento"),
    )


def _customer_nation_restricted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer LEFT JOIN nation restricted to regions 0-1 — manufactures the
    nullable-FK shape the reference gets from unmatched lookups
    (etl_fato_vendas.py:60-67)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") <= 1)
    return customer.join(
        F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"], "left"
    )


_SQL_CUST_NATION_RESTRICTED = (
    "customer LEFT JOIN (SELECT * FROM nation WHERE n_regionkey <= 1) n"
    " ON c_nationkey = n.n_nationkey"
)


@query(
    "op10_null_drop",
    oracle=f"""
    SELECT c_custkey, c_name, n_name
    FROM {_SQL_CUST_NATION_RESTRICTED}
    WHERE n_name IS NOT NULL AND n_nationkey IS NOT NULL
    """,
)
def op10_null_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity null-drop (op 10; `dropna(subset=[...])`,
    etl_fato_vendas.py:99-101). The isNotNull filter is pushed below the
    join by Catalyst, turning the left join into an inner join."""
    return (
        _customer_nation_restricted(spark, sf_dir)
        .na.drop(subset=["n_name", "n_nationkey"])
        .select("c_custkey", "c_name", "n_name")
    )


@query(
    "op11_isnotnull_filter",
    oracle=f"""
    SELECT c_custkey, n_name
    FROM {_SQL_CUST_NATION_RESTRICTED}
    WHERE n_name IS NOT NULL
    """,
)
def op11_isnotnull_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NOT NULL predicate (op 11; KPIs.sql:75)."""
    return (
        _customer_nation_restricted(spark, sf_dir)
        .filter(F.col("n_name").isNotNull())
        .select("c_custkey", "n_name")
    )


@query(
    "op12_case_empty_default",
    oracle="""
    SELECT doc_id,
           CASE WHEN trim(text) = '' THEN '<empty>' ELSE substr(trim(text), 1, 10) END
             AS head
    FROM documents
    """,
)
def op12_case_empty_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional update of empty values (op 12;
    `df.loc[df[c]=='', c] = default`, etl_dim_cliente.py:31) as native CASE."""
    t = F.trim(F.col("text"))
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(t == "", F.lit("<empty>")).otherwise(t.substr(1, 10)).alias("head"),
    )


@query(
    "op13_classify_nullable",
    oracle=f"""
    SELECT c_custkey,
           CASE WHEN n_name IS NOT NULL THEN 'Individual' ELSE 'Store' END AS tipo
    FROM {_SQL_CUST_NATION_RESTRICTED}
    """,
)
def op13_classify_nullable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-wise conditional on nullability (op 13; pandas .apply lambda at
    etl_dim_cliente.py:35) lifted to a Catalyst CASE — not a UDF."""
    df = _customer_nation_restricted(spark, sf_dir)
    return df.select(
        "c_custkey",
        F.when(F.col("n_name").isNotNull(), F.lit("Individual"))
        .otherwise(F.lit("Store"))
        .alias("tipo"),
    )


# ---------------------------------------------------------------------------
# joins (ops 14-18)
# ---------------------------------------------------------------------------


@query(
    "op14_join_left_shared_key",
    oracle="""
    SELECT n_nationkey, n_name, r_name
    FROM nation LEFT JOIN region ON n_regionkey = r_regionkey
    """,
)
def op14_join_left_shared_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left equi-join on a shared key name (op 14; `pd.merge(..., on=k)`,
    etl_dim_produto.py:20,23). Rename-then-join-on-name, the reference's
    own idiom."""
    nation = load_table(spark, sf_dir, "nation").withColumnRenamed("n_regionkey", "regionkey")
    region = load_table(spark, sf_dir, "region").withColumnRenamed("r_regionkey", "regionkey")
    return nation.join(F.broadcast(region), "regionkey", "left").select(
        "n_nationkey", "n_name", "r_name"
    )


@query(
    "op15_join_left_diff_key",
    oracle="""
    SELECT c_custkey, c_name, n_name
    FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
    """,
)
def op15_join_left_diff_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left equi-join with differing key names (op 15;
    `pd.merge(left_on=, right_on=)`, etl_dim_cliente.py:16-22)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return customer.join(
        F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"], "left"
    ).select("c_custkey", "c_name", "n_name")


@query(
    "op17_join_inner",
    oracle="""
    SELECT o_orderkey, l_linenumber, o_custkey, l_partkey, l_quantity
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    """,
)
def op17_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner header×detail join (op 17; etl_fato_vendas.py:30) — the fact
    grain expansion. At 100 TB this is the big shuffle; both sides hash on
    the order key and AQE handles skew."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return orders.join(li, orders["o_orderkey"] == li["l_orderkey"], "inner").select(
        "o_orderkey", "l_linenumber", "o_custkey", "l_partkey", "l_quantity"
    )


@query(
    "op18_broadcast_lookup",
    oracle="""
    SELECT l_orderkey, l_linenumber, p_name, p_brand
    FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
    """,
)
def op18_broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension lookup join with explicit small build side (op 18;
    etl_fato_vendas.py:42-76) — broadcast-hash, zero shuffle of the fact."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"], "left").select(
        "l_orderkey", "l_linenumber", "p_name", "p_brand"
    )


# ---------------------------------------------------------------------------
# top-k / dedup / window (ops 26, 27, + rank capability)
# ---------------------------------------------------------------------------


@query(
    "op26_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def op26_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY DESC LIMIT k (op 26; KPIs.sql:33-34,77-78). Spark plans
    TakeOrderedAndProject — per-partition heaps, no global sort. The
    o_orderkey tie-break makes the ordering total (SURVEY §7 risk)."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "op27_dedup_keyed",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM orders
    QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) = 1
    """,
)
def op27_dedup_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup, deterministic keep-first (op 27;
    `drop_duplicates(subset=[k])`, etl_dim_cliente.py:47). pandas keeps the
    first row in file order; distributed engines have no file order, so
    'first' is defined by an explicit tie-break (lowest o_orderkey) via
    row_number — one shuffle on the key."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "op_window_rank",
    oracle="""
    WITH rev AS (
      SELECT s_nationkey, s_name,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS net_revenue
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY s_nationkey, s_name
    )
    SELECT s_nationkey, s_name, net_revenue,
           CAST(rank() OVER (PARTITION BY s_nationkey
                             ORDER BY net_revenue DESC, s_name) AS BIGINT) AS rk
    FROM rev
    QUALIFY rk <= 3
    """,
)
def op_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-ranked top-3 suppliers per nation — the ranking capability the
    reference does with ORDER BY+LIMIT (SURVEY §2.8): one shuffle for the
    agg, window reuses the partitioning."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    rev = (
        li.join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"], "inner")
        .groupBy("s_nationkey", "s_name")
        .agg(dsum(net_amount("l_extendedprice", "l_discount"), "net_revenue"))
    )
    w = Window.partitionBy("s_nationkey").orderBy(F.desc("net_revenue"), F.asc("s_name"))
    return (
        rev.withColumn("rk", F.rank().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
    )


# ---------------------------------------------------------------------------
# scalar-layer queries (ops 29-31, 34, 35, 36)
# ---------------------------------------------------------------------------


@query(
    "op28_null_fill",
    oracle=f"""
    SELECT c_custkey, COALESCE(n_name, 'Desconhecida') AS pais
    FROM {_SQL_CUST_NATION_RESTRICTED}
    """,
)
def op28_null_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null default fill (op 28; fillna('Desconhecida') etc.,
    etl_dim_localidade.py:50-52) over a manufactured unmatched-lookup null."""
    return (
        _customer_nation_restricted(spark, sf_dir)
        .select("c_custkey", F.col("n_name").alias("pais"))
        .na.fill({"pais": "Desconhecida"})
    )


@query(
    "op29_name_concat",
    oracle="""
    SELECT p_partkey,
           trim(regexp_replace(concat_ws(' ', p_brand, p_type), ' +', ' ', 'g'))
             AS nome_completo
    FROM part
    """,
)
def op29_name_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trimmed name concat with whitespace collapse (op 29;
    etl_dim_vendedor.py:42-46)."""
    return load_table(spark, sf_dir, "part").select(
        "p_partkey",
        full_name(F.col("p_brand"), F.col("p_type")).alias("nome_completo"),
    )


@query(
    "op30_datetime_parse",
    oracle="""
    SELECT o_orderkey,
           CAST(epoch(strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
                               '%Y-%m-%d %H:%M:%S')) AS BIGINT) AS ts_epoch
    FROM orders
    """,
)
def op30_datetime_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String→timestamp parse (op 30; pd.to_datetime of
    '2011-05-31 00:00:00' strings, etl_fato_vendas.py:33-34), exercised as a
    format→parse round trip. Surfaced as epoch seconds: raw timestamps
    render with different pandas datetime64 resolutions per engine."""
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.unix_timestamp(
            F.to_timestamp(
                F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
                "yyyy-MM-dd HH:mm:ss",
            )
        )
        .cast("long")
        .alias("ts_epoch"),
    )


@query(
    "op31_date_parts",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS ano,
           CAST(month(o_orderdate) AS BIGINT) AS mes,
           CAST(day(o_orderdate) AS BIGINT) AS dia,
           CAST(quarter(o_orderdate) AS BIGINT) AS trimestre
    FROM orders
    """,
)
def op31_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction (op 31; .dt.year/month/day/quarter,
    etl_dim_tempo.py:21-24)."""
    d = F.col("o_orderdate")
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year(d).cast("long").alias("ano"),
        F.month(d).cast("long").alias("mes"),
        F.dayofmonth(d).cast("long").alias("dia"),
        F.quarter(d).cast("long").alias("trimestre"),
    )


@query(
    "op34_yyyymmdd_key",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate)*10000 + month(o_orderdate)*100 + day(o_orderdate)
                AS BIGINT) AS sk_tempo
    FROM orders
    """,
)
def op34_yyyymmdd_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """YYYYMMDD smart-key arithmetic (op 34; etl_dim_tempo.py:39-43,
    etl_fato_vendas.py:35-39)."""
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", yyyymmdd_key(F.col("o_orderdate")).cast("long").alias("sk_tempo")
    )


@query(
    "op35_money_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS valor_total,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(l_discount AS DECIMAL(18,2)) AS DOUBLE) AS valor_desconto
    FROM lineitem
    """,
)
def op35_money_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row money metrics (op 35; valor_total/valor_desconto formulas,
    etl_fato_vendas.py:83,96) in exact decimals, double at the boundary."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net_amount("l_extendedprice", "l_discount").cast("double").alias("valor_total"),
        discount_amount("l_extendedprice", "l_discount").cast("double").alias("valor_desconto"),
    )


@query(
    "ext_distinct_counts",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def ext_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count aggregate (capability beyond the reference,
    which has no DISTINCT aggregates — SURVEY.md §2.4 note). Spark plans
    a two-phase expand+agg; at scale prefer ext_approx_distinct."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query("ext_approx_distinct")  # HLL sketch is engine-specific → rows-only
def ext_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct (the 100 TB path: one pass, no
    expand, mergeable sketches; rsd 1%). Engine-specific sketch values, so
    no cross-engine oracle — the exact twin is ext_distinct_counts."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.approx_count_distinct("o_custkey", rsd=0.01).alias("n_customers_approx"))
        .orderBy("o_orderpriority")
    )


@query(
    "ext_histogram",
    oracle="""
    SELECT CAST(least(floor(o_totalprice / 50000.0), 11) AS BIGINT) AS bucket,
           COUNT(*) AS n
    FROM orders
    GROUP BY 1
    ORDER BY bucket
    """,
)
def ext_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (12 × 50k buckets, top-clamped) — the profiling
    aggregate for distribution audits. Bucket = floor division, identical
    IEEE ops both engines, exact integer ids."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.expr("CAST(least(floor(o_totalprice / 50000.0), 11) AS BIGINT)").alias(
                "bucket"
            )
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )


@query(
    "ext_percentiles",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def ext_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (both engines sort and
    linearly interpolate — identical up to float rounding, pinned at 4
    decimals). The 100 TB path is percentile_approx (one-pass sketch);
    this exact form is the audit twin."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        )
    )


@query(
    "ext_table_profile",
    oracle="""
    SELECT 'o_custkey' AS col, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(o_custkey) AS n_null,
           COUNT(DISTINCT o_custkey) AS n_distinct,
           CAST(min(o_custkey) AS DOUBLE) AS min_val,
           CAST(max(o_custkey) AS DOUBLE) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
           COUNT(DISTINCT o_totalprice),
           CAST(min(o_totalprice) AS DOUBLE), CAST(max(o_totalprice) AS DOUBLE)
    FROM orders
    UNION ALL
    SELECT 'o_orderkey', COUNT(*), COUNT(*) - COUNT(o_orderkey),
           COUNT(DISTINCT o_orderkey),
           CAST(min(o_orderkey) AS DOUBLE), CAST(max(o_orderkey) AS DOUBLE)
    FROM orders
    """,
)
def ext_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile (ETL audit surface the reference does by eye,
    README.md:62 'validadas via SQL'): per-column row/null/distinct/min/max
    in ONE scan — all three columns' aggregates computed in a single pass
    then unpivoted, instead of one scan per column."""
    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_custkey", "o_totalprice", "o_orderkey"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__null"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
        ]
    wide = orders.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__null, {c}__distinct, {c}__min, {c}__max" for c in cols
    )
    return wide.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {stack}) AS (col, n_null, n_distinct, min_val, max_val)",
    ).select("col", "n_rows", "n_null", "n_distinct", "min_val", "max_val")


@query(
    "ext_semi_anti_join",
    oracle="""
    SELECT c_custkey,
           CASE WHEN EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
                THEN 'active' ELSE 'dormant' END AS status
    FROM customer
    """,
)
def ext_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti join capability (pyspark_guide: left_semi ≡ EXISTS,
    left_anti ≡ NOT EXISTS): customers split into active (semi) and
    dormant (anti) against orders, unioned back. Each side is one
    broadcast-able existence join — no row multiplication ever."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    active = customer.join(orders, "c_custkey", "left_semi").withColumn(
        "status", F.lit("active")
    )
    dormant = customer.join(orders, "c_custkey", "left_anti").withColumn(
        "status", F.lit("dormant")
    )
    return active.unionByName(dormant)


@query(
    "ext_pivot_event_types",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'view') AS view,
           COUNT(*) FILTER (WHERE event_type = 'click') AS click,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
           COUNT(*) FILTER (WHERE event_type = 'error') AS error
    FROM events
    GROUP BY user_id
    """,
)
def ext_pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide) via the native pivot() API with an EXPLICIT value
    list — without it Spark runs an extra distinct scan to discover values,
    which at 100 TB is a full pass you didn't ask for."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", ["view", "click", "purchase", "signup", "error"])
        .count()
        .na.fill(0)
    )


@query(
    "ext_cube_revenue",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS ano,
           o_orderpriority,
           CAST(SUM({{net}}) AS DOUBLE) AS net_revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY CUBE(1, 2)
    """.format(
        net="CAST(l_extendedprice AS DECIMAL(18,2))"
        " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
    ),
)
def ext_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (year, priority) — all four grouping sets in one
    expand+aggregate pass (2^n expansion is the cost model: fine for 2-3
    dims, use explicit grouping sets beyond that)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "inner")
        .cube(
            F.year("o_orderdate").cast("long").alias("ano"),
            F.col("o_orderpriority"),
        )
        .agg(dsum(net_amount("l_extendedprice", "l_discount"), "net_revenue"))
    )


@query(
    "ext_rollup_revenue",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS ano,
           CAST(quarter(o_orderdate) AS BIGINT) AS trimestre,
           CAST(SUM({{net}}) AS DOUBLE) AS net_revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY ROLLUP(1, 2)
    """.format(
        net="CAST(l_extendedprice AS DECIMAL(18,2))"
        " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
    ),
)
def ext_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP(year, quarter) — grouping-set
    capability beyond the reference (SURVEY.md §2.4: none there). One
    expand+aggregate pass; the year and grand-total rows carry NULL group
    keys identically in both engines."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "inner")
        .rollup(
            F.year("o_orderdate").cast("long").alias("ano"),
            F.quarter("o_orderdate").cast("long").alias("trimestre"),
        )
        .agg(
            dsum(net_amount("l_extendedprice", "l_discount"), "net_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "ext_set_ops",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    UNION
    SELECT o_custkey FROM orders WHERE o_totalprice > 400000
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    """,
)
def ext_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / EXCEPT set operations (capability beyond the reference —
    SURVEY.md §2.6: none there): rich customers ∪ big spenders ∖ one
    segment. Distinct set semantics, single column, hash-based."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    rich = customer.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey")
    )
    big = orders.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    auto = customer.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    # subtract == EXCEPT DISTINCT, matching SQL's left-assoc (A∪B)∖C
    return rich.union(big).distinct().subtract(auto)


@query(
    "op36_surrogate_key",
    oracle="""
    SELECT CAST(row_number() OVER (ORDER BY r_name) AS BIGINT) AS sk_region,
           r_name
    FROM region
    """,
)
def op36_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic surrogate key (op 36) replacing Postgres SERIAL
    (create_dw_tables.sql:15 etc.) — row_number over the business key."""
    return load_table(spark, sf_dir, "region").select(
        surrogate_key("r_name").alias("sk_region"), "r_name"
    )
