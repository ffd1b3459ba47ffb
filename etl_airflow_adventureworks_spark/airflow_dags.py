"""Thin Airflow DAG wrappers — orchestration stays OUTSIDE the engine.

BASELINE.json approach: "Spark jobs orchestrated by Airflow". The reference
buries pandas transforms inside PythonOperator callables
(dags/etl_dim_produto.py:78-81) and leaves the dims→fact ordering as a
README instruction (README.md:113, SURVEY.md §3 entry point B). Here each
task is a thin call into the engine's plans, and the dependency is a real
DAG edge: ``[dims...] >> fact``.

Airflow is not installed in the build image, so everything is gated behind
an import-try; ``build_dag()`` returns None without Airflow. Deployments
put this module on the dags/ path and configure via env vars:
SPARK_GRAFT_SF_DIR (input tables), SPARK_WAREHOUSE_DIR (parquet warehouse).
"""

from __future__ import annotations

import os

try:  # pragma: no cover - exercised only where Airflow is installed
    from airflow import DAG
    from airflow.operators.python import PythonOperator

    HAS_AIRFLOW = True
except ImportError:
    DAG = None
    PythonOperator = None
    HAS_AIRFLOW = False

DIM_TASKS = (
    "etl_dim_date",
    "etl_dim_part",
    "etl_dim_customer_geo",
    "etl_dim_supplier",
    "etl_dim_locality",
)


def _run_dim(name: str) -> int:
    """One dimension build+load: its own short-lived SparkSession per task
    (the Airflow-worker equivalent of the reference's per-DAG process)."""
    from .plans.pipeline import DIMS  # noqa: F401 (documents the task set)
    from .registry import QUERIES, load_all
    from .session import get_spark
    from .sinks import write_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/spark_warehouse")
    # getOrCreate: reuse the worker's session. An Airflow task runs in its
    # own forked process, so the session's lifetime is the task's — no
    # explicit stop() (which would tear down a shared session in-process).
    spark = get_spark(app_name=name)
    load_all()
    table = name.removeprefix("etl_")
    df = QUERIES[name](spark, sf_dir)
    write_table(df, f"{out_dir}/{table}.parquet")
    n = spark.read.parquet(f"{out_dir}/{table}.parquet").count()
    print(f"Carga concluída! {n} registros em {table}.")
    return n


def _run_fact() -> int:
    from pyspark.sql import functions as F

    from .plans.pipeline import fact_from_warehouse
    from .session import get_spark
    from .sinks import write_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/spark_warehouse")
    spark = get_spark(app_name="etl_fact_sales")
    fact = fact_from_warehouse(spark, sf_dir, out_dir)
    write_table(
        fact.withColumn("ano", (F.col("sk_tempo") / 10000).cast("int")),
        f"{out_dir}/fact_sales.parquet",
        partition_by=["ano"],
    )
    n = spark.read.parquet(f"{out_dir}/fact_sales.parquet").count()
    print(f"Carga concluída! {n} registros em fact_sales.")
    return n


def build_dag(dag_id: str = "etl_star_schema"):
    """The warehouse DAG: all dimension loads in parallel, then the fact —
    the reference's implicit ordering made an explicit edge."""
    if not HAS_AIRFLOW:
        return None
    from datetime import datetime

    with DAG(
        dag_id,
        start_date=datetime(2023, 1, 1),
        schedule=None,
        catchup=False,
        default_args={"owner": "airflow", "retries": 1},
        tags=["dw", "spark", "adventureworks"],
    ) as dag:
        dims = [
            PythonOperator(
                task_id=name,
                python_callable=_run_dim,
                op_args=[name],
            )
            for name in DIM_TASKS
        ]
        fact = PythonOperator(task_id="etl_fact_sales", python_callable=_run_fact)
        dims >> fact
    return dag


dag = build_dag()
