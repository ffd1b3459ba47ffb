"""Empty-input robustness: every declared query must run (and return an
empty or well-defined result) over zero-row tables — at 100 TB, empty
partitions, empty date ranges, and freshly-truncated tables are routine,
and an operator that throws on them takes the pipeline down."""

from __future__ import annotations

import glob
import shutil

import pytest

from conftest import SF_SMOKE

import __spark_entry__ as entrymod

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    """Zero-row mirror of the testdata layout (same schemas, same one-file-
    per-table naming the loaders expect)."""
    d = tmp_path_factory.mktemp("empty_sf")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in TABLES:
        df = spark.read.parquet(f"{SF_SMOKE}/{t}.parquet").limit(0).coalesce(1)
        df.write.mode("overwrite").parquet(str(d / f"tmp_{t}"))
        part = glob.glob(str(d / f"tmp_{t}" / "part-*.parquet"))[0]
        shutil.move(part, str(d / f"{t}.parquet"))
        shutil.rmtree(str(d / f"tmp_{t}"))
    return str(d)


def test_every_declared_query_survives_empty_tables(spark, empty_sf_dir):
    failures = []
    for name, fn in entrymod.queries().items():
        try:
            fn(spark, empty_sf_dir).collect()
        except Exception as ex:  # noqa: BLE001 — collecting a full report
            failures.append(f"{name}: {type(ex).__name__}")
    assert not failures, failures
