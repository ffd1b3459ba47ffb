"""Measure sync_neardup_index vs a full index rebuild (r10; r11 adds
the range-local window + key-clustered layout).

The scenario: a corpus maintained as a `VersionedTable` with a
versioned-base MinHash dedup index; routine maintenance rewrites part
of it (an upsert mutating ~1% of documents' text + ~1% fresh appends +
a keyed delete of ~0.5%). Before r10 the only correct response was a
full rebuild (recompute shingle sets + signatures for EVERY document);
`sync_neardup_index` instead consumes the corpus's row-level change
feed and CDC-applies just the changed docs' entries.

Two window shapes (r11, VERDICT r10 #3):
- ``scattered``: the changed doc_ids are hash-scattered across the key
  space — every index file's key range admits some changed key, so the
  CDC apply's cost term is an index rewrite (the r10 finding);
- ``local``: the changed doc_ids are one contiguous ~1% key range — on
  the r11 key-clustered index (range-partitioned + sorted by doc_id,
  per-file stats) the apply probes and rewrites only the files covering
  that range; ``files_probed``/``files_rewritten`` from the sync
  commit's op metrics are reported alongside the timing.

Both paths run from identical starting states (fresh copies per rep,
medians of 3) and their resulting index ROWSETS are asserted IDENTICAL
(doc_id, sorted shingle set, signature) before any ratio is reported —
the same no-silent-tradeoff rule as every measurement in SCALING.md.
The one-time base build is reported as context.

Run on an idle machine:
    python tools/measure_index_sync.py [sf_dir] [workdir] [scattered|local|both]
"""

from __future__ import annotations

import json
import shutil
import statistics
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from etl_airflow_adventureworks_spark.operators.dedup_incremental import (  # noqa: E402
    build_neardup_index,
    neardup_index_entries,
    sync_neardup_index,
)
from etl_airflow_adventureworks_spark.session import get_spark  # noqa: E402
from etl_airflow_adventureworks_spark.table import VersionedTable  # noqa: E402


def snap(spark, index_path):
    rows = VersionedTable(spark, index_path).read().select(
        "doc_id",
        F.sort_array("hh").alias("hh"),
        "sig",
    ).collect()
    return tuple(sorted(
        (r["doc_id"], tuple(r["hh"]), tuple(r["sig"])) for r in rows
    ))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else f"{REPO}/.scale/sf1"
    work = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/index_sync_measure")
    shutil.rmtree(work, ignore_errors=True)
    spark = get_spark(app_name="measure-index-sync", cpus=32,
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    kind_arg = sys.argv[3] if len(sys.argv) > 3 else "both"
    kinds = ("scattered", "local") if kind_arg == "both" else (kind_arg,)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    max_id = docs.agg(F.max("doc_id")).first()[0]
    corpus0 = str(work / "corpus0")
    VersionedTable(spark, corpus0).commit(docs.repartition(32))
    t0 = time.perf_counter()
    build_neardup_index(
        spark, VersionedTable(spark, corpus0).read(),
        str(work / "index_warm"), base_path=corpus0,
    )
    build_s = time.perf_counter() - t0  # context: the one-time base build

    def maintain(corpus_path: str, kind: str) -> dict:
        """The maintenance window applied to a fresh corpus copy:
        mutate ~1% (text changes -> stale signatures), append ~1% fresh
        ids, delete ~0.5% — with the changed keys either hash-scattered
        across the key space or packed into one contiguous range."""
        cvt = VersionedTable(spark, corpus_path)
        cur = cvt.read()
        if kind == "scattered":
            mut_pred = "pmod(xxhash64(doc_id), 100) = 0"
            app_pred = "pmod(xxhash64(doc_id), 100) = 1"
            del_pred = "pmod(xxhash64(doc_id), 200) = 5"
        else:
            # local: one contiguous ~1% key range (quantile-derived —
            # doc_ids are sparse) mutated; clones of it appended as a
            # contiguous high range; its bottom half deleted
            d_hi, m_hi = cur.approxQuantile("doc_id", [0.005, 0.01], 0.0)
            mut_pred = app_pred = f"doc_id <= {int(m_hi)}"
            del_pred = f"doc_id <= {int(d_hi)}"
        mutated = (
            cur.filter(mut_pred)
            .withColumn("text", F.concat(F.lit("revised edition "), "text"))
        )
        cvt.upsert(mutated, key="doc_id")
        appended = (
            cur.filter(app_pred)
            .withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000_000))
        )
        cvt.commit(appended, mode="append")
        cvt.delete_where(del_pred)
        return {
            "mutated": mutated.count(),
            "appended": appended.count(),
        }

    report: dict = {
        "sf_dir": sf_dir,
        "corpus_docs": n_docs,
        "base_build_s": round(build_s, 3),
    }
    for kind in kinds:
        results: dict = {}
        for mode in ("sync", "rebuild"):
            times = []
            for rep in range(3):
                # the index's recorded base must point at THIS rep's
                # corpus copy, so each rep builds its own
                # pre-maintenance index (untimed — identical starting
                # state both modes)
                corpus = str(work / f"corpus_{kind}_{mode}_{rep}")
                index = str(work / f"index_{kind}_{mode}_{rep}")
                shutil.copytree(corpus0, corpus)
                build_neardup_index(
                    spark, VersionedTable(spark, corpus).read(), index,
                    base_path=corpus,
                )
                counts = maintain(corpus, kind)
                results.setdefault("window", counts)
                t0 = time.perf_counter()
                if mode == "sync":
                    sync_neardup_index(spark, index)
                else:
                    build_neardup_index(
                        spark, VersionedTable(spark, corpus).read(), index,
                        base_path=corpus,
                    )
                times.append(time.perf_counter() - t0)
                results.setdefault(f"{mode}_chk", snap(spark, index))
                if mode == "sync":
                    op = VersionedTable(spark, index).manifest().get("op") or {}
                    results.setdefault("sync_files", {
                        k: op.get(k) for k in
                        ("files_probed", "files_rewritten", "files_carried")
                    })
            results[mode] = round(statistics.median(times), 3)
            results[f"{mode}_runs"] = [round(t, 3) for t in times]
        assert results["sync_chk"] == results["rebuild_chk"], (
            "synced index diverged from the rebuilt index — the speed "
            "ratio would be meaningless"
        )
        report[kind] = {
            "window": results["window"],
            "sync_s": results["sync"],
            "rebuild_s": results["rebuild"],
            "speedup": round(results["rebuild"] / results["sync"], 2),
            "sync_files": results["sync_files"],
            "index_rowsets_identical": True,
            "runs": {"sync": results["sync_runs"],
                     "rebuild": results["rebuild_runs"]},
        }
    print(json.dumps(report, indent=1))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
