"""Relational core operators (SURVEY.md §2 ops 7-18, 26-28, 35-36 + beyond-
reference analytics: distinct counts, distributions, profiling, set ops,
grouping sets).

Each declared query re-expresses reference operator shapes over the testdata
tables with a DuckDB oracle twin. The reference implements these with eager
pandas (`merge`/`dropna`/`drop_duplicates`/ORDER BY+LIMIT — citations per
function); here each is a lazy Catalyst plan, so pushdown, pruning and
join-strategy selection are free.

Registry budget note: the driver verifies at most 50 declared queries per
round, so closely-related operator demos are merged into combined suites —
one plan that exercises every constituent op with the full row-level oracle
(COVERAGE.md maps SURVEY §2 op numbers → declared query names). The merge
is strictly stronger engineering too: e.g. the four join shapes now chain in
one plan exactly like the real fact pipeline does.

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
from ..functions.scalar import full_name, surrogate_key
from ..registry import query
from ..sources import load_table

# ---------------------------------------------------------------------------
# projections / scalar expressions (ops 7, 29)
# ---------------------------------------------------------------------------


@query(
    "op_project_concat",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice,
           trim(regexp_replace(concat_ws(' ', p_brand, p_type), ' +', ' ', 'g'))
             AS nome_completo
    FROM part
    """,
)
def op_project_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column selection (op 7; reference `df[['A','B']].copy()`,
    etl_dim_produto.py:27) + trimmed name concat with whitespace collapse
    (op 29; etl_dim_vendedor.py:42-46) in one projection — Catalyst prunes
    the parquet scan to exactly the referenced columns (asserted in
    tests/test_plan_shapes.py)."""
    return load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        "p_retailprice",
        full_name(F.col("p_brand"), F.col("p_type")).alias("nome_completo"),
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
    "op_rename_case_fill",
    oracle=f"""
    SELECT c_custkey AS id_cliente_original,
           c_name AS nome_completo,
           c_mktsegment AS segmento,
           CASE WHEN n_name IS NOT NULL THEN 'Individual' ELSE 'Store' END AS tipo,
           COALESCE(n_name, 'Desconhecida') AS pais
    FROM {_SQL_CUST_NATION_RESTRICTED}
    """,
)
def op_rename_case_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column rename (op 9; wholesale `df.columns = [...]`,
    etl_dim_produto.py:29-35), row-wise conditional on nullability lifted
    from a pandas .apply lambda to native CASE (op 13,
    etl_dim_cliente.py:35), and null-default fill (op 28;
    fillna('Desconhecida'), etl_dim_localidade.py:50-52) — one projection
    over the manufactured unmatched-lookup nulls, no UDF anywhere."""
    df = _customer_nation_restricted(spark, sf_dir)
    return df.select(
        F.col("c_custkey").alias("id_cliente_original"),
        F.col("c_name").alias("nome_completo"),
        F.col("c_mktsegment").alias("segmento"),
        F.when(F.col("n_name").isNotNull(), F.lit("Individual"))
        .otherwise(F.lit("Store"))
        .alias("tipo"),
        F.coalesce(F.col("n_name"), F.lit("Desconhecida")).alias("pais"),
    )


@query(
    "op_null_filters",
    oracle=f"""
    SELECT c_custkey, c_name, n_name
    FROM {_SQL_CUST_NATION_RESTRICTED}
    WHERE n_name IS NOT NULL AND n_nationkey IS NOT NULL
    """,
)
def op_null_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity null-drop (op 10; `dropna(subset=[...])`,
    etl_fato_vendas.py:99-101) composed with the IS NOT NULL predicate
    (op 11; KPIs.sql:75). Catalyst pushes the null filters below the join,
    turning the left join into an inner join (asserted in
    tests/test_plan_shapes.py)."""
    return (
        _customer_nation_restricted(spark, sf_dir)
        .na.drop(subset=["n_name", "n_nationkey"])
        .filter(F.col("n_name").isNotNull())
        .select("c_custkey", "c_name", "n_name")
    )


# ---------------------------------------------------------------------------
# joins (ops 14-18) + money math (op 35) — one chained plan, the real
# fact-pipeline shape
# ---------------------------------------------------------------------------


@query(
    "op_join_shapes",
    oracle="""
    SELECT o_orderkey, l_linenumber, l_quantity,
           p_name, c_name, n_name, r_name,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                AS DOUBLE) AS valor_total,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(l_discount AS DECIMAL(18,2)) AS DOUBLE) AS valor_desconto
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    LEFT JOIN part     ON l_partkey = p_partkey
    LEFT JOIN customer ON o_custkey = c_custkey
    LEFT JOIN nation   ON c_nationkey = n_nationkey
    LEFT JOIN region   ON n_regionkey = r_regionkey
    """,
)
def op_join_shapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four reference join shapes chained in one plan, exactly like the
    composite fact pipeline (dags/etl_fato_vendas.py:30-76):

    - inner header×detail join (op 17) — the fact grain expansion; at 100 TB
      this is the big shuffle, both sides hash on the order key, AQE skew;
    - broadcast dimension lookup with differing key names (ops 15+18;
      `pd.merge(left_on=, right_on=)`, etl_dim_cliente.py:16-22);
    - 2-level snowflake flattening via chained left joins (op 16,
      etl_dim_localidade.py:23-37);
    - shared-key-name join via the reference's own rename-then-join idiom
      (op 14; etl_dim_produto.py:20,23) on nation→region;
    - per-row money metrics in exact decimals, double at the boundary
      (op 35; valor formulas, etl_fato_vendas.py:83,96).

    Only the orders⋈lineitem join shuffles; every dimension side broadcasts,
    so the fact rows move exactly once."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    customer = load_table(spark, sf_dir, "customer")
    # op 14 idiom: rename to the shared key name, join on the name
    nation = load_table(spark, sf_dir, "nation").withColumnRenamed("n_regionkey", "regionkey")
    region = load_table(spark, sf_dir, "region").withColumnRenamed("r_regionkey", "regionkey")
    geo = nation.join(F.broadcast(region), "regionkey", "left")
    return (
        # merge-pinned (r16): the header×detail join is fact×fact — see
        # plans.kpis._sales for the measured rationale.
        orders.hint("merge")
        .join(li, orders["o_orderkey"] == li["l_orderkey"], "inner")
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"], "left")
        .join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"], "left")
        .join(F.broadcast(geo), customer["c_nationkey"] == geo["n_nationkey"], "left")
        .select(
            "o_orderkey",
            "l_linenumber",
            "l_quantity",
            "p_name",
            "c_name",
            "n_name",
            "r_name",
            net_amount("l_extendedprice", "l_discount").cast("double").alias("valor_total"),
            discount_amount("l_extendedprice", "l_discount")
            .cast("double")
            .alias("valor_desconto"),
        )
    )


# ---------------------------------------------------------------------------
# top-k / dedup / surrogate keys (ops 26, 27, 36)
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
    "op_dedup_surrogate",
    oracle="""
    SELECT CAST(row_number() OVER (ORDER BY o_custkey) AS BIGINT) AS sk_cliente,
           o_custkey, o_orderkey, o_totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice FROM orders
      QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) = 1
    )
    """,
)
def op_dedup_surrogate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup with deterministic keep-first (op 27;
    `drop_duplicates(subset=[k])`, etl_dim_cliente.py:47) followed by
    deterministic surrogate-key assignment (op 36; replaces Postgres SERIAL,
    create_dw_tables.sql:15 etc.) — the real dimension-build sequence:
    dedup on the business key, then number the survivors.

    pandas keeps the first row in file order; distributed engines have no
    file order, so 'first' is the lowest o_orderkey via row_number — one
    shuffle on the key. The surrogate row_number is a single-partition
    window over the deduped (dimension-sized) result — acceptable for dims
    by definition (see plans.star scale note)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    deduped = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return deduped.select(
        surrogate_key("o_custkey").alias("sk_cliente"),
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
    )


# ---------------------------------------------------------------------------
# beyond-reference analytics: distinct counts, distributions, profiling,
# set ops, grouping sets
# ---------------------------------------------------------------------------


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
    "ext_distribution_suite",
    oracle="""
    SELECT 'hist' AS stat,
           CAST(CAST(least(floor(o_totalprice / 50000.0), 11) AS BIGINT) AS VARCHAR) AS k,
           CAST(COUNT(*) AS DOUBLE) AS v1,
           CAST(NULL AS DOUBLE) AS v2,
           CAST(NULL AS DOUBLE) AS v3,
           CAST(NULL AS DOUBLE) AS v4,
           CAST(NULL AS DOUBLE) AS v5
    FROM orders
    GROUP BY 2
    UNION ALL
    SELECT 'pct', o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4),
           round(quantile_cont(o_totalprice, 0.9), 4),
           NULL, NULL, NULL
    FROM orders
    GROUP BY 2
    UNION ALL
    SELECT 'rhist', CAST(g.i AS VARCHAR), CAST(COALESCE(c.n, 0) AS DOUBLE),
           NULL, NULL, NULL, NULL
    FROM generate_series(0, 9) g(i)
    LEFT JOIN (
      SELECT CASE WHEN CAST(o_totalprice AS DOUBLE) < 50000.0 THEN 0
                  WHEN CAST(o_totalprice AS DOUBLE) >= 450000.0 THEN 9
                  ELSE CAST(floor((CAST(o_totalprice AS DOUBLE) - 50000.0)
                                  / 50000.0) AS INT) + 1 END AS i,
             COUNT(*) AS n
      FROM orders WHERE o_totalprice IS NOT NULL
      GROUP BY 1
    ) c ON g.i = c.i
    UNION ALL
    SELECT 'profile', col, CAST(n_rows AS DOUBLE), CAST(n_null AS DOUBLE),
           CAST(n_distinct AS DOUBLE), min_val, max_val
    FROM (
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
    )
    """,
)
def ext_distribution_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution + profile suite in one declared query over ONE scan
    source: an equi-width histogram (12 × 50k top-clamped buckets — floor
    division, identical IEEE ops both engines) unioned with exact
    interpolated per-group percentiles (both engines sort + linearly
    interpolate; pinned at 4 decimals) and — since the round-7 fold
    (COVERAGE.md policy (b)) — the per-column row/null/distinct/min/max
    profile rows that used to be the standalone ``ext_table_profile``
    (which stays in the library, equality-tested against this absorber's
    'profile' rows in `tests/test_relational_suites.py`). The 100 TB path
    for the percentile half is percentile_approx (one-pass sketch); this
    exact form is the audit twin.

    Since r10 (VERDICT r9 #4) the suite also carries the 'rhist' section:
    the incremental-rollup HISTOGRAM measure's bin counts
    (`operators.rollup._histogram_agg` — the same mergeable equi-width
    state `refresh_rollup` maintains), over a declared [50k, 450k) range
    in 8 bins + underflow(0)/overflow(9), exploded to one row per bin so
    DuckDB's explicit floor-bucket SQL hashes the exact integer counts —
    the driver gate for the r9 histogram measure (its quantile projection
    stays property-tested in tests/test_rollup.py)."""
    orders = load_table(spark, sf_dir, "orders")
    nulls3 = [
        F.lit(None).cast("double").alias("v3"),
        F.lit(None).cast("double").alias("v4"),
        F.lit(None).cast("double").alias("v5"),
    ]
    # The four sections deliberately keep FOUR dedicated (column-pruned)
    # scans. r17 measured both fold candidates (VERDICT r16 #6) and
    # reverted them: a GROUPING SETS fold of hist+pct ran ~10% slower
    # (Expand feeds the value-buffering exact-percentile aggregate to the
    # bucket groups), and merging rhist into the profile aggregate made
    # its 10 filtered sums ride the multi-countDistinct Expand (4× rows)
    # for more than the saved scan — 5-pair fresh-JVM A/Bs in
    # plans/r17/ab_distribution_suite{,_final}.json. A persist would fold
    # the scans for real but re-serves cached results across bench reps
    # through the CacheManager — result caching, banned.
    hist = (
        orders.groupBy(
            F.expr("CAST(least(floor(o_totalprice / 50000.0), 11) AS BIGINT)").alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("hist").alias("stat"),
            F.col("bucket").cast("string").alias("k"),
            F.col("n").cast("double").alias("v1"),
            F.lit(None).cast("double").alias("v2"),
            *nulls3,
        )
    )
    pct = (
        orders.groupBy("o_orderpriority")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        )
        .select(
            F.lit("pct").alias("stat"),
            F.col("o_orderpriority").alias("k"),
            F.col("p50").alias("v1"),
            F.col("p90").alias("v2"),
            *nulls3,
        )
    )
    from .rollup import _histogram_agg

    rhist = (
        orders.agg(_histogram_agg(("o_totalprice", 50000.0, 450000.0, 8)).alias("h"))
        .select(F.posexplode("h").alias("i", "n"))
        .select(
            F.lit("rhist").alias("stat"),
            F.col("i").cast("string").alias("k"),
            F.col("n").cast("double").alias("v1"),
            F.lit(None).cast("double").alias("v2"),
            *nulls3,
        )
    )
    profile = _profile_frame(orders).select(
        F.lit("profile").alias("stat"),
        F.col("col").alias("k"),
        F.col("n_rows").cast("double").alias("v1"),
        F.col("n_null").cast("double").alias("v2"),
        F.col("n_distinct").cast("double").alias("v3"),
        F.col("min_val").alias("v4"),
        F.col("max_val").alias("v5"),
    )
    return hist.unionByName(pct).unionByName(rhist).unionByName(profile)


def ext_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile (ETL audit surface the reference does by eye,
    README.md:62 'validadas via SQL'): per-column row/null/distinct/min/max
    in ONE scan — all three columns' aggregates computed in a single pass
    then unpivoted, instead of one scan per column.

    De-registered round 7 (COVERAGE.md fold policy (b)): its rows are now
    the 'profile' section of ``ext_distribution_suite`` (same orders scan),
    which carries the oracle for both; the freed slot declares
    ``ext_range_join``. This standalone form remains the library surface
    and is equality-tested against the absorber."""
    return _profile_frame(load_table(spark, sf_dir, "orders"))


def _profile_frame(orders: DataFrame) -> DataFrame:
    """Shared profile body over an already-loaded frame, so the absorber
    (`ext_distribution_suite`) reuses its own orders scan source instead
    of issuing a third independent load."""
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
    "ext_set_relational",
    oracle="""
    SELECT c_custkey,
           CASE WHEN EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
                THEN 'active' ELSE 'dormant' END AS tag
    FROM customer
    UNION ALL
    SELECT c_custkey, 'vip_set' AS tag FROM (
      SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      UNION
      SELECT o_custkey FROM orders WHERE o_totalprice > 400000
      EXCEPT
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    )
    """,
)
def ext_set_relational(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-relational suite in one declared query:

    - semi/anti join capability (pyspark_guide: left_semi ≡ EXISTS,
      left_anti ≡ NOT EXISTS): customers split into active/dormant against
      orders — each side one broadcast-able existence join, no row
      multiplication ever;
    - UNION / EXCEPT set operations (beyond the reference — SURVEY.md §2.6:
      none there): rich customers ∪ big spenders ∖ one segment, distinct
      set semantics, hash-based.

    Tagged union keeps each sub-result row-level oracle-checked."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cust_keys = customer.select("c_custkey")
    order_keys = orders.select(F.col("o_custkey").alias("c_custkey"))
    active = cust_keys.join(order_keys, "c_custkey", "left_semi").withColumn(
        "tag", F.lit("active")
    )
    dormant = cust_keys.join(order_keys, "c_custkey", "left_anti").withColumn(
        "tag", F.lit("dormant")
    )
    rich = customer.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    big = orders.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    auto = customer.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    # subtract == EXCEPT DISTINCT, matching SQL's left-assoc (A∪B)∖C
    vip = rich.union(big).distinct().subtract(auto).withColumn("tag", F.lit("vip_set"))
    return active.unionByName(dormant).unionByName(vip)


_GROUPING_SETS_SQL = """
    SELECT ano, trimestre, o_orderpriority,
           CAST(SUM({net}) AS DOUBLE) AS net_revenue,
           COUNT(*) AS n_lines
    FROM (
      SELECT {hint}CAST(year(o_orderdate) AS BIGINT) AS ano,
             CAST(quarter(o_orderdate) AS BIGINT) AS trimestre,
             o_orderpriority, l_extendedprice, l_discount
      FROM {li} JOIN {orders} ON l_orderkey = o_orderkey
    )
    GROUP BY GROUPING SETS ((ano, o_orderpriority), (ano), (o_orderpriority), (),
                            (ano, trimestre))
""".format(
    net="CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))",
    li="{li}",
    orders="{orders}",
    hint="{hint}",
)


@query(
    "ext_grouping_sets",
    oracle=_GROUPING_SETS_SQL.format(li="lineitem", orders="orders", hint=""),
)
def ext_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets suite — CUBE(ano, priority) ∪ the ROLLUP(ano, trimestre)
    drill level, expressed as explicit GROUPING SETS (capability beyond the
    reference, SURVEY.md §2.4: no grouping sets/cube/rollup there). One
    expand+aggregate pass computes all five groupings; NULL group keys are
    produced identically by both engines.

    Executed via the spark.sql TEXT entry point over temp views (SURVEY §3
    entry point C) — same Catalyst plan as the DataFrame cube()/rollup()
    forms, and the SQL surface a migrating reference user would write."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("gs_lineitem")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("gs_orders")
    # merge-pinned fact×fact join (r16, Spark text only — the oracle keeps
    # no hint): same rationale as plans.kpis._sales, and here the 5-way
    # Expand multiplies the joined rows BEFORE the partial aggregate, so
    # leaving the join broadcast pipelined a 5× expansion into the single
    # split-starved scan task.
    return spark.sql(
        _GROUPING_SETS_SQL.format(
            li="gs_lineitem", orders="gs_orders",
            hint="/*+ MERGE(gs_lineitem) */ ",
        )
    )
