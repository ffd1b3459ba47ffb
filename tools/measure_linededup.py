"""Scale measurement for line-level boilerplate removal (round 7).

Synthetic corpus: ``n`` documents of 10 lines each — a banner (one of 5
variants shared by ~n/5 documents: the extreme hot-line case, since every
copy of a hot line carries the same join key), a footer shared by ALL
documents, ~8 unique body lines, and a mid-frequency line shared by ~50
docs. Boilerplate is therefore a FEW DISTINCT keys with millions of
copies — exactly the regime the plan's broadcast membership join is
designed for (the hot copies are filtered map-side; only the counts
aggregation shuffles, with map-side partials collapsing each partition's
copies to one row).

Usage: python tools/measure_linededup.py [n_docs] [cpus]
Prints one JSON line; numbers recorded in SCALING.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from tools.hotcorpus import median_timed  # noqa: E402


def write_corpus(n: int) -> Path:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(61)
    banners = [f"Accept cookies variant {b} to continue" for b in range(5)]
    footer = "(c) 2024 Example Corp - all rights reserved"
    texts = []
    for d in range(n):
        mid = f"shared mid {d // 50}"
        body = [f"body {d} line {i} {rng.integers(1e9)}" for i in range(7)]
        texts.append("\n".join([banners[d % 5], mid, *body, footer]))
    out = Path(tempfile.mkdtemp(prefix="linededup")) / "docs.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        ),
        out,
        row_group_size=max(8_192, n // 64),
    )
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F

    from etl_airflow_adventureworks_spark.operators.linededup import (
        remove_boilerplate_lines,
    )
    from etl_airflow_adventureworks_spark.session import get_spark

    spark = get_spark(app_name="linededup-scale", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    path = write_corpus(n)
    docs = spark.read.parquet(str(path))

    def consume(df):
        return df.agg(F.sum(F.length("text")), F.count(F.lit(1))).collect()

    sec = median_timed(
        lambda: remove_boilerplate_lines(docs, min_docs=100), consume, reps=3
    )
    # sanity: hot boilerplate gone, unique bodies intact, every doc kept
    out = remove_boilerplate_lines(docs, min_docs=100)
    survived = out.filter(F.col("text").contains("Accept cookies")).count()
    rows = out.count()
    print(
        json.dumps(
            {
                "n_docs": n,
                "n_lines": n * 10,
                "cpus": cpus,
                "sec": round(sec, 2),
                "rows_preserved": rows == n,
                "boilerplate_residue": survived,
            }
        )
    )
    shutil.rmtree(path.parent, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
