"""Binary-file source: media directories as DataFrames (charter: multimodal
columns).

Spark's built-in ``binaryFile`` format reads each file as one row
(path, modificationTime, length, content) — the ingestion path that turns a
bucket of .wav/.ppm/... objects into the opaque-binary-column shape
``operators.multimodal`` consumes, with zero Python in the read itself.

Scale notes: one row per file means driver-side file listing is the
bottleneck dimension, not content size — at 100 TB of media, list via a
manifest/partitioned prefixes rather than one flat directory, and keep
``spark.sql.files.maxPartitionBytes`` at default so many small media files
pack into one task. ``pathGlobFilter`` prunes by extension at listing time
(no content touched for filtered-out files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: extension → media_type contract shared with operators.multimodal
MEDIA_TYPES = {
    "wav": "audio/wav",
    "ppm": "image/x-portable-pixmap",
    "zlib": "application/zlib",
}


def load_media_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Read a directory of media files into the multimodal column contract:
    (media_id = file stem, media_type from extension, n_bytes, payload).
    Unknown extensions map to ``application/octet-stream`` rather than
    failing the scan — decode raises loudly per-payload downstream."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    type_map = F.create_map(
        *[F.lit(x) for kv in MEDIA_TYPES.items() for x in kv]
    )
    return reader.load(path).select(
        F.regexp_extract(F.col("path"), r"([^/]+)\.[^./]+$", 1).alias("media_id"),
        F.coalesce(type_map[ext], F.lit("application/octet-stream")).alias(
            "media_type"
        ),
        F.col("length").alias("n_bytes"),
        F.col("content").alias("payload"),
    )
