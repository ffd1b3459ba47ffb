"""Parquet table source — the warehouse scan (SURVEY.md §2 op 1/2).

Reference behavior: ``pd.read_csv``/``pd.read_sql`` with inferred schemas
(`dags/etl_dim_produto.py:14-16`, `dags/etl_fato_vendas.py:21-24`).
Spark-first mapping: columnar parquet scans; Catalyst pushes filters and
prunes columns down to the scan, so callers just ``.select``/``.filter``
declaratively. At 100 TB the scan is the dominant cost — everything here
keeps pushdown intact (no eager cache, no schema-mangling reads).
"""

from __future__ import annotations

import glob
import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Every driver-provided testdata table (TESTDATA.md).
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


def events_ts_physical_type(sf_dir: str) -> str:
    """Arrow type string of ``events.ts`` as stored (file-metadata peek, no
    scan): ``timestamp[ns]`` (older driver snapshots), ``timestamp[us]``
    (current — parquet NTZ micros), or ``timestamp[us, tz=UTC]`` (our own
    rewrites). Loaders branch on this so every encoding normalizes to the
    same Spark ``TimestampType`` micros column.

    The pyarrow footer peek only works for local POSIX paths; on a
    Hadoop-compatible URI (``s3://``, ``hdfs://``) the caller falls back to
    ``"unknown"`` and the Spark-side read handles the type (TIMESTAMP(NANOS)
    files are a local-testdata artifact — cluster warehouses write µs)."""
    import pyarrow.parquet as pq

    path = f"{sf_dir}/events.parquet"
    if "://" in sf_dir and not sf_dir.startswith("file://"):
        return "unknown"  # non-local URI: let spark.read decide
    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            raise FileNotFoundError(f"no parquet part-files under {path}")
        path = parts[0]
    return str(pq.read_schema(path).field("ts").type)


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Bring any stored ``ts`` encoding to ``TimestampType`` (µs, session-TZ
    UTC): nanos-as-long floor-divides with exact integer arithmetic; NTZ µs
    casts (identity on the stored integer under a UTC session); TZ µs is
    already canonical."""
    kind = dict(df.dtypes)["ts"]
    if kind == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if kind == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


#: per-session memo of LAZY scan handles (r16, guide §1.2/§7.3): every
#: ``spark.read.parquet`` is driver-side work — a py4j round trip, a file
#: listing, and a footer read for the schema (~80 ms/table measured) —
#: repeated identically for every query that touches the same table. The
#: memo stores the unexecuted DataFrame *plan*; every action on it still
#: scans the parquet from disk (this is metadata caching, NOT result
#: caching — nothing is persisted, ``.cache()`` is never called).
#:
#: Lifecycle (r17, ADVICE r16): the r16 WeakKeyDictionary never actually
#: freed anything — each memoized DataFrame strongly references its
#: SparkSession, so the weak key stayed reachable through its own value.
#: The memo is now a plain dict keyed by ``id(session)`` holding the
#: session alongside its entries; ``load_table`` sweeps entries whose
#: session has been STOPPED (a stopped session can never serve a scan
#: again) the first time it sees a new session, and
#: ``invalidate_scan_memo`` evicts by directory for callers that
#: overwrite a table in place (VERDICT r16 #4/#7). Entries of a stopped
#: session therefore live only until the next session's first load —
#: bounded by construction, instead of "until interpreter exit".
_SCAN_MEMO: dict[int, tuple[SparkSession, dict[tuple[str, str], DataFrame]]] = {}


def _session_live(spark: SparkSession) -> bool:
    sc = getattr(spark, "_sc", None)
    return sc is not None and getattr(sc, "_jsc", None) is not None


def invalidate_scan_memo(sf_dir: str | None = None) -> None:
    """Evict memoized scan handles for ``sf_dir`` (every session), or ALL
    handles when called without arguments. Required when a table directory
    is overwritten in place and re-read through ``load_table`` within the
    same session — the memoized plan would otherwise serve the old file
    listing. Writers that target a warehouse dir (sinks.write_table) call
    this themselves."""
    for sid, (_, entries) in list(_SCAN_MEMO.items()):
        if sf_dir is None:
            entries.clear()
        else:
            for key in [k for k in entries if k[0] == sf_dir]:
                del entries[key]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table. Parquet embeds the schema — no inference race.

    ``events.ts`` has shipped as TIMESTAMP(NANOS) (which Spark's vectorized
    reader refuses by default — read nanos as long via the runtime legacy
    conf) and as TIMESTAMP(MICROS) NTZ in newer driver snapshots; either way
    it normalizes to the session-UTC µs TimestampType every downstream
    query assumes.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    sid = id(spark)
    hit = _SCAN_MEMO.get(sid)
    if hit is None:
        # first sighting of this session: drop stopped sessions' entries
        # (their py4j handles are dead weight and can never be served)
        for dead in [s for s, (sess, _) in _SCAN_MEMO.items()
                     if not _session_live(sess)]:
            del _SCAN_MEMO[dead]
        per_session: dict[tuple[str, str], DataFrame] = {}
        _SCAN_MEMO[sid] = (spark, per_session)
    else:
        per_session = hit[1]
    key = (sf_dir, name)
    cached = per_session.get(key)
    if cached is not None:
        return cached
    if name == "events":
        if events_ts_physical_type(sf_dir) == "timestamp[ns]":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = normalize_events_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    per_session[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register temp views so SQL-form queries can run against the same scans."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
