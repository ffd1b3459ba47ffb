"""Multimodal (binary) column operators (charter: multimodal columns).

Design per the charter: image/audio/video travel as opaque ``binary``
columns with typed metadata; decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas functions over ``mapInPandas``
(the codec libraries aren't in this container, so the actual decode is
STUBBED — ``NotImplementedError`` on the real path, a deterministic fake
under ``fake=True`` — while the Spark-side plumbing (schema, batch shape,
partition flow) is real and tested).

The testdata has no binary table, so ``with_binary_payload`` manufactures
one from ``documents.text`` (UTF-8 bytes) — byte-level semantics are
identical to any other blob.

Scale notes: mapInPandas streams Arrow batches — constant memory per task
regardless of table size; decode parallelism == partition count, so a
100 TB media table is sized by ``spark.sql.files.maxPartitionBytes``, not
by row count. Metadata-only transforms (length, digest) stay in codegen.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

#: schema of the feature-extraction output — the contract downstream
#: training-data jobs consume.
FEATURES_SCHEMA = (
    "doc_id long, n_bytes long, content_md5 string, feature array<double>"
)


def with_binary_payload(df: DataFrame) -> DataFrame:
    """Attach the opaque binary column + typed metadata (modality tag)."""
    return df.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
    )


def decode_media(payload: bytes, media_type: str):
    """Real decode path — requires codec libs not present in this image.

    A production deployment plugs PIL/librosa/pyav here; the engine-side
    contract (bytes in, feature rows out) is unchanged.
    """
    raise NotImplementedError(
        f"no codec available for {media_type}; install an image/audio lib "
        "or run with fake=True"
    )


def _fake_features(payload: bytes, dim: int = 4) -> list[float]:
    """Deterministic fake 'decoder': fixed-dim feature from byte stats."""
    n = len(payload)
    return [
        float(n),
        float(payload[0]) if n else 0.0,
        float(payload[-1]) if n else 0.0,
        float(sum(payload[:64]) % 997),
    ][:dim]


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas (Arrow
    batches). ``fake=False`` routes to the stubbed real decoder.

    The worker function is fully self-contained (local imports, no
    module-global references): cloudpickle ships local closures by value,
    so Python workers need neither this package installed nor repo paths
    on sys.path — required for running under an external driver harness.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        def _features(b: bytes, dim: int = 4) -> list[float]:
            n = len(b)
            return [
                float(n),
                float(b[0]) if n else 0.0,
                float(b[-1]) if n else 0.0,
                float(sum(b[:64]) % 997),
            ][:dim]

        for pdf in batches:
            payloads = pdf["payload"]
            if not fake:
                for mt in pdf["media_type"]:
                    raise NotImplementedError(
                        f"no codec available for {mt}; install an image/audio "
                        "lib or run with fake=True"
                    )
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_md5": payloads.map(
                        lambda b: _hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "feature": payloads.map(lambda b: _features(bytes(b))),
                }
            )

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)


@query(
    "ext_multimodal_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    """,
)
def ext_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction (metadata projection): the
    mapInPandas pandas path computes byte length + digest per payload; the
    DuckDB oracle recomputes both from the raw text — so the Arrow/pandas
    batch plumbing itself is correctness-gated, not just the schema."""
    docs = with_binary_payload(load_table(spark, sf_dir, "documents"))
    return extract_features(docs, fake=True).select("doc_id", "n_bytes", "content_md5")
