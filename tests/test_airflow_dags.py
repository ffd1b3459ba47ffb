"""Airflow wrapper tests: import-gated module + task callables run without
Airflow installed (the callables ARE the engine surface the DAG schedules)."""

from __future__ import annotations

import os

from conftest import SF_SMOKE

from etl_airflow_adventureworks_spark import airflow_dags


def test_module_imports_without_airflow():
    # in this image Airflow is absent: the module must still import and
    # build_dag must degrade to None rather than raise
    if not airflow_dags.HAS_AIRFLOW:
        assert airflow_dags.build_dag() is None


def test_task_callables_run(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", SF_SMOKE)
    monkeypatch.setenv("SPARK_WAREHOUSE_DIR", str(tmp_path / "wh"))
    n_dim = airflow_dags._run_dim("etl_dim_supplier")
    assert n_dim > 0
    for name in (
        "etl_dim_date",
        "etl_dim_part",
        "etl_dim_customer_geo",
        "etl_dim_locality",
    ):
        airflow_dags._run_dim(name)
    n_fact = airflow_dags._run_fact()
    assert n_fact > 0
    assert os.path.exists(tmp_path / "wh" / "fact_sales.parquet")
