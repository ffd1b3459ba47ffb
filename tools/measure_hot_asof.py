"""Hot-user as-of attribution straggler measurement (VERDICT r5 #5).

Same harness as measure_hot_sessions.py: a Zipf-head events corpus (one
user holds ~30% of N events over 30 days, view/purchase mix), timing the
user-window as-of twin against the time-sharded form (the DECLARED
ext_asof_attribution since round 6) on local[N]. The
window form's last_value(... IGNORE NULLS) partitions on user_id — one
indivisible task per user — so the hot user's history is the stage's
critical path; the sharded form's heavy window keys on (user, day) and
stitches the carry-in over per-shard summaries.

Usage: python tools/measure_hot_asof.py [n_events] [cpus]
Prints one JSON line; numbers are recorded in SCALING.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from etl_airflow_adventureworks_spark.operators.sessionize import (
        asof_attribution_sharded,
        asof_attribution_user_window,
    )
    from etl_airflow_adventureworks_spark.session import get_spark
    from etl_airflow_adventureworks_spark.sources import load_table

    spark = get_spark(app_name="hot-asof", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(43)
    hot = rng.random(n) < 0.3
    user = np.where(hot, 0, 1 + (rng.zipf(1.8, n) % 50_000)).astype(np.int64)
    epoch_us = 1_735_689_600_000_000 + np.sort(
        rng.integers(0, 30 * 86400 * 1_000_000, n)
    )
    # ~70% views / 10% purchases / 20% other — the attribution mix
    kind_draw = rng.random(n)
    kinds = np.where(kind_draw < 0.7, "view", np.where(kind_draw < 0.8, "purchase", "click"))
    out = Path(tempfile.mkdtemp(prefix="hotasof")) / "sf"
    out.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "ts": pa.array(epoch_us, type=pa.timestamp("us")),
                "user_id": pa.array(user),
                "event_type": pa.array(kinds.tolist()),
                "value": pa.array(rng.random(n)),
                "props": pa.array(["{}"] * n),
            }
        ),
        out / "events.parquet",
        row_group_size=max(8_192, n // 64),
    )

    from pyspark.sql import functions as F

    def consume(df):
        # NOT count(): the attributed column is cardinality-neutral, so a
        # bare count lets Catalyst eliminate the Window node entirely and
        # the "measurement" times a filtered scan. Aggregating the column
        # forces the full attribution compute on both forms.
        # avg, not sum: epoch-µs values overflow a long sum at ~10k rows
        return df.agg(F.avg("last_view_us"), F.count(F.lit(1))).collect()

    def timed(fn, reps=5):
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            consume(fn())
            samples.append(time.perf_counter() - t0)
        return sorted(samples)[len(samples) // 2]

    sf = str(out)
    ev = load_table(spark, sf, "events")
    user_window = timed(lambda: asof_attribution_user_window(ev))
    sharded = timed(lambda: asof_attribution_sharded(ev, shard_hours=24))
    # sanity: identical ATTRIBUTIONS, not just identical row counts — both
    # forms emit one row per purchase by construction, so a count compare
    # is vacuous; hash the full (purchase, attributed-view) mapping
    # order-insensitively instead (full tuple-equality lives in
    # tests/test_skew_zipf.py)
    def checksum(df):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64("purchase_id", "last_view_us").cast("decimal(38,0)")
            ).alias("x"),
        ).collect()[0]
        return row["n"], row["x"]

    a = checksum(asof_attribution_user_window(ev))
    b = checksum(asof_attribution_sharded(ev, shard_hours=24))
    print(
        json.dumps(
            {
                "n_events": n,
                "hot_share": 0.3,
                "cpus": cpus,
                "user_window_sec": round(user_window, 2),
                "sharded_user_day_sec": round(sharded, 2),
                "speedup": round(user_window / sharded, 2),
                "attribution_checksums_equal": a == b,
                "purchases": a[0],
            }
        )
    )
    shutil.rmtree(out.parent, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
