"""Measure incremental near-dup dedup vs the full-corpus re-run (round 8).

The scenario the operator exists for: a corpus of N documents already
deduped and indexed; a new batch of B documents arrives and must be
checked against everything. Without the index you re-run the full
MinHash pass over corpus+batch; with it you run
`minhash_neardup_incremental` against the persisted `VersionedTable`.
Both must emit the SAME pairs touching the batch (asserted by checksum).

Corpus = the documents table of the given sf dir; batch = every 100th
document re-issued under a fresh id, half verbatim (exact dups the run
must find) and half with one word mutated (near dups). Also reports the
one-time index build cost so the amortization math is visible.

Usage: python tools/measure_incremental_dedup.py [sf_dir] [cpus] [full_reps]
full_reps=0 checksums the full re-run without timing it. Prints one JSON
line; recorded in SCALING.md.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    full_reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from pyspark.sql import functions as F

    from etl_airflow_adventureworks_spark.operators.dedup import (
        hashed_shingle_sets_df,
        minhash_neardup_pairs,
    )
    from etl_airflow_adventureworks_spark.operators.dedup_incremental import (
        build_neardup_index,
        minhash_neardup_incremental,
    )
    from etl_airflow_adventureworks_spark.session import get_spark
    from etl_airflow_adventureworks_spark.sources import load_table

    spark = get_spark(app_name="inc-dedup", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_corpus = docs.count()
    max_id = docs.agg(F.max("doc_id")).first()[0]

    # batch: every 100th doc under a fresh id; odd picks get one word
    # swapped for a sentinel token (near dup), even picks stay verbatim
    batch = (
        docs.filter(F.col("doc_id") % 100 == 0)
        .select(
            (F.col("doc_id") + max_id + 1).alias("doc_id"),
            F.when(
                F.col("doc_id") % 200 == 100,
                F.regexp_replace("text", r"^\S+", "zqx_mutant"),
            ).otherwise(F.col("text")).alias("text"),
        )
        .localCheckpoint(eager=True)
    )
    n_batch = batch.count()  # every batch id is > max_id by construction

    def checksum(df) -> tuple:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("doc_a", "doc_b").cast("decimal(38,0)")).alias("x"),
        ).first()
        return row["n"], row["x"]

    with tempfile.TemporaryDirectory() as tmp:
        idx = f"{tmp}/index"
        t0 = time.perf_counter()
        build_neardup_index(spark, docs, idx)
        build_sec = time.perf_counter() - t0

        # warmup + median-of-3 for the incremental path
        samples = []
        for i in range(4):
            t0 = time.perf_counter()
            inc = minhash_neardup_incremental(spark, batch, idx)
            inc_cs = checksum(inc)
            dt = time.perf_counter() - t0
            if i:
                samples.append(dt)
        inc_sec = sorted(samples)[len(samples) // 2]

        result = {
            "sf_dir": sf_dir,
            "n_corpus": n_corpus,
            "n_batch": n_batch,
            "cpus": cpus,
            "index_build_sec": round(build_sec, 2),
            "incremental_sec": round(inc_sec, 2),
            "pairs": inc_cs[0],
        }
        if full_reps >= 0:
            full = minhash_neardup_pairs(
                hashed_shingle_sets_df(docs.unionByName(batch))
            )
            touching = full.filter(
                (F.col("doc_a") > max_id) | (F.col("doc_b") > max_id)
            )
            if full_reps > 0:
                samples = []
                for _ in range(full_reps):
                    t0 = time.perf_counter()
                    cs = checksum(touching)
                    samples.append(time.perf_counter() - t0)
                result["full_rerun_sec"] = round(
                    sorted(samples)[len(samples) // 2], 2
                )
                result["speedup"] = round(
                    result["full_rerun_sec"] / inc_sec, 2
                )
            result["checksums_equal"] = checksum(touching) == inc_cs
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
