from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from etl_airflow_adventureworks_spark.session import get_spark  # noqa: E402

import os

SF_SMOKE = "/root/testdata/sf0.001"
# override to stress parity at another scale: SPARK_GRAFT_ORACLE_SF=sf0.1
SF_ORACLE = f"/root/testdata/{os.environ.get('SPARK_GRAFT_ORACLE_SF', 'sf0.01')}"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cpus=8, shuffle_partitions=8)
    yield s
