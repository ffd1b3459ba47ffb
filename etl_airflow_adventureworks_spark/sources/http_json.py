"""HTTP/JSON source (SURVEY.md §2 op 4 — vestigial in the reference).

Reference: ``requests.get(url).json()`` in a never-scheduled sample DAG
(dags/my_dag_sample.py:10). Spark-first mapping: fetch on the driver (a
config-sized payload, NOT data-plane traffic), then parallelize through
``spark.read.json`` so schema handling matches every other source. For
data-scale HTTP ingestion you'd land payloads to object storage and scan
them — the driver fetch is deliberately only for small lookup/config feeds.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def read_json_payload(spark: SparkSession, payload: Any) -> DataFrame:
    """Turn an already-fetched JSON value (list or object) into a DataFrame
    via the JSON datasource (inference identical to file-based reads)."""
    records = payload if isinstance(payload, list) else [payload]
    rdd = spark.sparkContext.parallelize([json.dumps(r) for r in records])
    return spark.read.json(rdd)


def read_http_json(spark: SparkSession, url: str, timeout: float = 10.0) -> DataFrame:
    """Fetch ``url`` on the driver and load the JSON payload. Gated on
    urllib (stdlib); no network in the build/test image — covered by unit
    tests through ``read_json_payload``."""
    from urllib.request import urlopen  # stdlib; no extra deps

    with urlopen(url, timeout=timeout) as resp:  # noqa: S310 (caller-supplied URL)
        payload = json.loads(resp.read().decode("utf-8"))
    return read_json_payload(spark, payload)
