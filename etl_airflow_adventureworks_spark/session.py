"""SparkSession factory tuned for the engine.

Local-mode defaults match the test/bench environment (local[N], single JVM);
the same config block is what we would ship to a real cluster, minus
``master`` — AQE, UTC session time, Arrow, and shuffle partitions sized to
the parallelism rather than the default 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "etl_airflow_adventureworks_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    - AQE on (runtime coalescing, skew-join splitting) — at 100 TB this is
      what re-plans shuffles to actual data sizes.
    - ``spark.sql.session.timeZone=UTC`` — required for oracle parity
      (DuckDB timestamps are UTC-naive).
    - Arrow enabled for any toPandas()/pandas_udf boundary.
    - shuffle partitions ~ cores locally; on a real cluster this would be
      set to ~2-3x total executor cores (AQE coalesces the excess).
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # RocksDB state store: streaming state lives on local disk instead
        # of executor heap. The default HDFS-backed provider keeps every
        # key's state in a JVM map — measured OOM at 100x data (10M events'
        # session windows blew a 16 GB heap inside
        # SessionWindowStateStoreSaveExec.putToStore); with RocksDB the
        # same query runs in the default heap. This is also the production
        # posture: state size bounded by disk, not executor memory.
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
