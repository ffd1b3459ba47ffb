"""SHJ-vs-SMJ verify-join re-measure at 10x/100x data (r17, VERDICT r16 #3/#4).

Round 16 switched the dedup-family verify joins (ngram/minhash/simjoin)
from forced sort-merge to forced shuffle_hash. A hinted SHJ build side
cannot spill, so the r4 protocol applies: prove SHJ >= SMJ at sf1/sf10
AND that no build-side partition approaches executor memory before
trusting the hint as the 100 TB plan.

For each corpus and each query family this tool times BOTH verify-join
strategies (interleaved, same session, noop sink per guide §1.4) and
records the max per-partition build-side payload bytes (the doc->shingle
array table hashed by the join key into the session's shuffle-partition
count — the exact relation a hinted SHJ must hold in memory per task).

Usage: python tools/measure_shj_verify.py <sf_dir> [reps=3] [out.json]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from etl_airflow_adventureworks_spark.operators import dedup  # noqa: E402
from etl_airflow_adventureworks_spark.session import get_spark  # noqa: E402


def _noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _verify(cand, sh, hint: str):
    """The dedup verify join over candidate pairs, hint-parameterized —
    same shape as ext_ngram_jaccard / minhash_neardup_pairs (two attaches
    of the doc->shingle-array table, full exact-Jaccard filter)."""
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("hh").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("hh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter.cast("double") / (F.size("sh_a") + F.size("sh_b") - inter)
    return (
        cand.join(sa.hint(hint), "doc_a")
        .join(sb.hint(hint), "doc_b")
        .filter(jac >= dedup.JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="shj_vs_smj",
        cpus=cpus,
        shuffle_partitions=cpus,
        extra_conf={"spark.sql.files.maxPartitionBytes": "8m"},
    )
    record: dict = {"sf_dir": sf_dir, "cpus": cpus, "reps": reps,
                    "shuffle_partitions": cpus}
    try:
        l1, _, _ = os.getloadavg()
        record["load1_at_start"] = round(l1, 2)
    except OSError:
        pass

    families = {
        # candidates from the committed helpers — identical to the declared
        # queries' candidate stages; only the verify hint varies below
        "ngram": lambda: (
            dedup.ngram_prefix_candidates(
                dedup.xxhash_shingle_sets(spark, sf_dir)
            ),
            dedup.xxhash_shingle_sets(spark, sf_dir),
        ),
        "minhash": lambda: (
            _minhash_candidates(spark, sf_dir),
            dedup.hashed_shingle_sets(spark, sf_dir),
        ),
    }
    for fam, build in families.items():
        cand, sh = build()
        fam_rec: dict = {}
        # build-side payload: per-partition bytes of the doc->array table
        # hashed by the join key into the session's shuffle partitions —
        # what each SHJ build task must hold (x2: attached on both sides,
        # but the two joins build independently so per-task peak is one).
        part_bytes = (
            sh.repartition(cpus, "doc_id")
            .select(
                F.spark_partition_id().alias("p"),
                # 8 bytes per long + array overhead ~16B + row overhead ~32B
                (F.size("hh") * 8 + 48).alias("b"),
            )
            .groupBy("p")
            .agg(F.sum("b").alias("bytes"))
            .agg(F.max("bytes").alias("max"), F.avg("bytes").alias("avg"))
            .collect()[0]
        )
        fam_rec["build_side_partition_bytes"] = {
            "max": int(part_bytes["max"]), "avg": int(part_bytes["avg"]),
        }
        fam_rec["n_docs"] = sh.count()
        # interleave the two strategies rep-by-rep so host drift hits both
        times: dict[str, list[float]] = {"shuffle_hash": [], "merge": []}
        for hint in ("shuffle_hash", "merge"):  # untimed warmup each
            _noop(_verify(cand, sh, hint))
        for _ in range(reps):
            for hint in ("shuffle_hash", "merge"):
                times[hint].append(_noop(_verify(cand, sh, hint)))
        fam_rec["sec"] = {
            h: {"runs": [round(x, 3) for x in v],
                "median": round(statistics.median(v), 3)}
            for h, v in times.items()
        }
        fam_rec["shj_over_smj"] = round(
            statistics.median(times["shuffle_hash"])
            / statistics.median(times["merge"]), 3,
        )
        record[fam] = fam_rec
        print(f"[shj] {fam}: {json.dumps(fam_rec)}", file=sys.stderr)
    spark.stop()
    if out_path:
        Path(out_path).write_text(json.dumps(record, indent=1) + "\n")
    print(json.dumps(record, indent=1))


def _minhash_candidates(spark, sf_dir):
    """The minhash LSH candidate stage (signature -> banding -> in-bucket
    expansion), lifted verbatim from minhash_neardup_pairs so the verify
    join downstream is measured over the real candidate distribution."""
    sh = dedup.hashed_shingle_sets(spark, sf_dir)
    sig = dedup.minhash_signatures(sh)
    band_keys = ", ".join(
        f"concat(s{2 * b}, ',', s{2 * b + 1})" for b in range(dedup._N_BANDS)
    )
    bands = sig.selectExpr(
        "doc_id", f"posexplode(array({band_keys})) AS (band_idx, band_key)"
    )
    return (
        bands.groupBy("band_idx", "band_key")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
        .selectExpr(
            "explode(flatten(transform(sequence(1, size(ids) - 1),"
            " i -> transform(slice(ids, i + 1, size(ids) - i),"
            " y -> named_struct('doc_a', element_at(ids, i), 'doc_b', y))))) AS pair"
        )
        .select("pair.doc_a", "pair.doc_b")
        .distinct()
    )


if __name__ == "__main__":
    main()
