"""Scale measurement for text_similarity_join (round 8).

Corpus: two tables of ``n`` docs each, ~30 tokens/doc drawn Zipf(1.3)
over a 20k-word vocab (realistic head-heavy text); 10% of the right
table are light perturbations of left docs (the true matches), the rest
independent. The naive baseline is the standard two-table inverted-index
join — explode shingles, equi-join on shingle hash, count intersections
per pair, filter Jaccard ≥ t. On head-heavy vocab its pair stream grows
with the square of common-shingle frequency; the prefix-filtered join
indexes only each doc's rarest shingles, so its candidate volume tracks
true matches. Checksums must be identical (both are exact).

Usage: python tools/measure_simjoin.py [n_docs] [cpus] [naive_reps]
naive_reps=0 skips naive timing but still checksums; -1 skips entirely.
Prints one JSON line; recorded in SCALING.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from tools.hotcorpus import median_timed  # noqa: E402

THRESHOLD = 0.5


def build_corpora(spark, n: int, seed: int = 19):
    import numpy as np

    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i}" for i in range(20_000)])

    def draw_doc():
        z = rng.zipf(1.3, size=30)
        return " ".join(vocab[np.minimum(z - 1, len(vocab) - 1)])

    lrows = [(i, draw_doc()) for i in range(n)]
    rrows = []
    n_match = n // 10
    for j in range(n_match):
        toks = lrows[j][1].split()
        for _ in range(int(rng.integers(0, 4))):
            toks[int(rng.integers(0, len(toks)))] = str(
                vocab[min(int(rng.zipf(1.3)) - 1, len(vocab) - 1)]
            )
        rrows.append((1_000_000 + j, " ".join(toks)))
    for j in range(n - n_match):
        rrows.append((2_000_000 + j, draw_doc()))
    left = spark.createDataFrame(lrows, "doc_id long, text string").repartition(32)
    right = spark.createDataFrame(rrows, "doc_id long, text string").repartition(32)
    # materialize so generation cost never lands inside a timed run
    left = left.localCheckpoint()
    right = right.localCheckpoint()
    return left, right


def naive_simjoin(left, right, threshold=THRESHOLD):
    """Two-table inverted-index Jaccard join WITHOUT the prefix filter —
    every shared shingle of every pair flows through the pair shuffle."""
    from pyspark.sql import functions as F

    from etl_airflow_adventureworks_spark.operators.simjoin import _hashed_sets

    la = _hashed_sets(left, "doc_id", "text", 3, 0)
    rb = _hashed_sets(right, "doc_id", "text", 3, 1)
    inv_l = la.select(F.col("doc_id.id").alias("l_id"), F.explode(F.array_compact("hh")).alias("s"))
    inv_r = rb.select(F.col("doc_id.id").alias("r_id"), F.explode(F.array_compact("hh")).alias("s"))
    pairs = (
        inv_l.join(inv_r, "s")
        .groupBy("l_id", "r_id")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = la.select(F.col("doc_id.id").alias("l_id"), F.size("hh").alias("na"))
    sb = rb.select(F.col("doc_id.id").alias("r_id"), F.size("hh").alias("nb"))
    jac = F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        pairs.join(sa.hint("merge"), "l_id")
        .join(sb.hint("merge"), "r_id")
        .filter(jac >= threshold)
        .select("l_id", F.col("r_id").alias("doc_id_r"), F.round(jac, 6).alias("jaccard"))
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    naive_reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from pyspark.sql import functions as F

    from etl_airflow_adventureworks_spark.operators.simjoin import (
        text_similarity_join,
    )
    from etl_airflow_adventureworks_spark.session import get_spark

    spark = get_spark(app_name="simjoin-bench", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    left, right = build_corpora(spark, n)

    def consume(df):
        return df.agg(F.count(F.lit(1)), F.sum("jaccard")).collect()

    def checksum(df):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64(df.columns[0], "doc_id_r").cast("decimal(38,0)")
            ).alias("x"),
        ).collect()[0]
        return row["n"], row["x"]

    prefix_fn = lambda: text_similarity_join(left, right, threshold=THRESHOLD)
    naive_fn = lambda: naive_simjoin(left, right)

    prefix = median_timed(prefix_fn, consume, reps=3)
    result = {
        "n_docs_per_side": n,
        "cpus": cpus,
        "threshold": THRESHOLD,
        "prefix_sec": round(prefix, 2),
    }
    if naive_reps >= 0:
        if naive_reps > 0:
            samples = []
            for _ in range(naive_reps):
                t0 = time.perf_counter()
                consume(naive_fn())
                samples.append(time.perf_counter() - t0)
            naive = sorted(samples)[len(samples) // 2]
            result["naive_inverted_sec"] = round(naive, 2)
            result["speedup"] = round(naive / prefix, 2)
        cs = checksum(prefix_fn())
        result["checksums_equal"] = cs == checksum(naive_fn())
        result["pairs"] = cs[0]
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
