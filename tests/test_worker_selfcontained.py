"""Every Python-boundary operator (applyInPandas / mapInPandas) must ship a
SELF-CONTAINED worker closure: cloudpickle serializes module-level function
references by module path, so a closure that touches one only works when
executors have the repo on sys.path. The grading driver imports the repo
with a driver-side sys.path insert — workers get nothing — which is exactly
what this test reproduces (it caught resize_media's by-reference closure)."""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)

_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})  # driver-only: workers do NOT inherit this
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[2]").appName("selfcontained")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

sfd = "/root/testdata/sf0.001"
import __spark_entry__ as E
q = E.queries()

# declared Python-boundary queries
assert len(q["ext_embedding_neardup"](spark, sfd).collect()) >= 0
assert q["ext_multimodal_features"](spark, sfd).count() > 0

# library Python-boundary operators
import numpy as np
from etl_airflow_adventureworks_spark.operators.multimodal import (
    make_ppm, make_wav, resize_media, sample_audio_frames)
img = spark.createDataFrame(
    [(1, "image/x-portable-pixmap",
      bytearray(make_ppm(4, 4, bytes(48))))],
    "doc_id long, media_type string, payload binary")
assert resize_media(img, 2, 2).count() == 1
wav = spark.createDataFrame(
    [(1, "audio/wav", bytearray(make_wav(bytes(10))))],
    "doc_id long, media_type string, payload binary")
assert sample_audio_frames(wav, 2).count() == 1

from etl_airflow_adventureworks_spark.operators.textprep import pack_sequences
from etl_airflow_adventureworks_spark.sources import load_table
docs = load_table(spark, sfd, "documents").limit(50)
assert pack_sequences(docs, budget=512, n_shards=4).count() > 0

from etl_airflow_adventureworks_spark.operators.asof import asof_join
left = spark.range(20).selectExpr("id % 3 AS ent", "id AS t", "id AS lv")
right = spark.range(5).selectExpr("id % 3 AS ent", "id * 3 AS t", "id AS rv")
# shard_width=None forces the GROUPED merge_asof plan — the default is
# pure Catalyst now (r7), and this test exists to ship the Python closure
assert asof_join(left, right, on="t", by="ent", shard_width=None).count() == 20

print("SELFCONTAINED_OK")
"""


def test_python_boundary_ops_need_no_worker_syspath(tmp_path):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    r = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=REPO)],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # not the repo: imports resolve via sys.path only
        env=env,
        timeout=480,
    )
    assert "SELFCONTAINED_OK" in r.stdout, r.stdout[-2000:] + r.stderr[-4000:]
