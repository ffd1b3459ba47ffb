"""Function-breadth suites: window family, string functions, date arithmetic.

The reference's scalar surface is narrow (SURVEY.md §2.7: +,*,−, concat,
date parts, one regex). An engine a reference user migrates TO needs the
standard library around it; these three declared queries pin the window /
string / date function families against the DuckDB oracle so the breadth
is verified, not just available.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import yyyymmdd_key
from ..registry import query
from ..sources import load_table


@query(
    "ext_window_suite",
    oracle="""
    SELECT s_nationkey, s_suppkey,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(rank() OVER w AS BIGINT) AS rk,
           CAST(dense_rank() OVER w AS BIGINT) AS drk,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           percent_rank() OVER w AS prk,
           cume_dist() OVER w AS cd,
           lag(s_suppkey) OVER w AS prev_supp,
           lead(s_suppkey) OVER w AS next_supp
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    """,
)
def ext_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-window family over one partitioned order — one
    shuffle on the partition key serves all eight functions (SURVEY §2.8:
    the reference has none of these; ORDER BY+LIMIT was its only ranking).
    percent_rank/cume_dist are exact integer ratios → deterministic."""
    from pyspark.sql import Window

    w = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return load_table(spark, sf_dir, "supplier").select(
        "s_nationkey",
        "s_suppkey",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rk"),
        F.dense_rank().over(w).cast("long").alias("drk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("prk"),
        F.cume_dist().over(w).alias("cd"),
        F.lag("s_suppkey").over(w).alias("prev_supp"),
        F.lead("s_suppkey").over(w).alias("next_supp"),
    )


@query(
    "ext_string_suite",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           lower(p_name) AS name_lower,
           CAST(length(p_name) AS BIGINT) AS name_len,
           substr(p_name, 1, 5) AS name_head,
           lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key,
           replace(p_type, ' ', '_') AS type_snake,
           reverse(p_brand) AS brand_rev,
           CAST(levenshtein(p_brand, p_type) AS BIGINT) AS brand_type_dist,
           split_part(p_name, ' ', 1) AS first_word,
           CAST(strpos(p_name, 'a') AS BIGINT) AS first_a
    FROM part
    """,
)
def ext_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function family (case, length, substring, padding, replace,
    reverse, edit distance, token extraction, search) — all codegen'd
    row-local expressions, zero shuffle."""
    return load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_name").alias("name_lower"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded_key"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.reverse("p_brand").alias("brand_rev"),
        F.levenshtein("p_brand", "p_type").cast("long").alias("brand_type_dist"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.instr(F.col("p_name"), "a").cast("long").alias("first_a"),
    )


@query(
    "ext_date_suite",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus_30d,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                AS BIGINT) AS days_since_epoch_start,
           CAST(dayofweek(o_orderdate) AS BIGINT) AS dow,
           CAST(weekofyear(o_orderdate) AS BIGINT) AS woy,
           CAST(epoch(strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
                               '%Y-%m-%d %H:%M:%S')) AS BIGINT) AS ts_epoch,
           CAST(year(o_orderdate) AS BIGINT) AS ano,
           CAST(month(o_orderdate) AS BIGINT) AS mes,
           CAST(day(o_orderdate) AS BIGINT) AS dia,
           CAST(quarter(o_orderdate) AS BIGINT) AS trimestre,
           CAST(year(o_orderdate)*10000 + month(o_orderdate)*100 + day(o_orderdate)
                AS BIGINT) AS sk_tempo
    FROM orders
    """,
)
def ext_date_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family in one projection:

    - date arithmetic breadth (interval add, month boundaries, truncation,
      day differences, ISO week/day numbers) — surfaced as ISO strings /
      integers per the no-raw-temporal output rule;
    - string→timestamp parse round trip as epoch seconds (op 30;
      pd.to_datetime of '2011-05-31 00:00:00' strings,
      etl_fato_vendas.py:33-34 — raw timestamps render with different
      pandas datetime64 resolutions per engine, hence epoch ints);
    - date-part extraction ano/mes/dia/trimestre (op 31; .dt.year etc.,
      etl_dim_tempo.py:21-24);
    - YYYYMMDD smart-key arithmetic (op 34; etl_dim_tempo.py:39-43).

    dayofweek convention: DuckDB is 0=Sunday..6, Spark is 1=Sunday..7;
    the Spark side subtracts 1 to match DuckDB's 0-based convention."""
    d = F.col("o_orderdate")
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.date_format(F.date_add(d.cast("date"), 30), "yyyy-MM-dd").alias("plus_30d"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch_start"),
        (F.dayofweek(d) - 1).cast("long").alias("dow"),
        F.weekofyear(d).cast("long").alias("woy"),
        F.unix_timestamp(
            F.to_timestamp(
                F.date_format(d, "yyyy-MM-dd HH:mm:ss"), "yyyy-MM-dd HH:mm:ss"
            )
        )
        .cast("long")
        .alias("ts_epoch"),
        F.year(d).cast("long").alias("ano"),
        F.month(d).cast("long").alias("mes"),
        F.dayofmonth(d).cast("long").alias("dia"),
        F.quarter(d).cast("long").alias("trimestre"),
        yyyymmdd_key(d).cast("long").alias("sk_tempo"),
    )
