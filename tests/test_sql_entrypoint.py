"""SQL-text forms must equal the DataFrame forms value-for-value."""

from __future__ import annotations

import pytest

from conftest import SF_ORACLE

from etl_airflow_adventureworks_spark.plans.kpis import KPI_DF
from etl_airflow_adventureworks_spark.plans.kpis_sql import KPI_SQL, run_kpi_sql


@pytest.mark.parametrize("name", sorted(KPI_SQL))
def test_sql_equals_dataframe_form(spark, name):
    sql_rows = sorted(map(tuple, run_kpi_sql(spark, SF_ORACLE, name).collect()))
    df_rows = sorted(map(tuple, KPI_DF[name](spark, SF_ORACLE).collect()))
    assert sql_rows == df_rows
