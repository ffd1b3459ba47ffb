"""Hot-user sessionization straggler measurement (VERDICT r4 #3).

Builds a Zipf-head events corpus (one user holds ~30% of N events over a
30-day span), then times the textbook user-window sessionizer against the
time-sharded form (the DECLARED ext_session_gap since round 6) on local[N]. A user-partitioned window is an indivisible
task, so the hot user's entire history lands on ONE core while the other
N−1 idle — the sharded form's heavy pass keys on (user, day) and spreads
it. The wall-clock ratio IS the straggler evidence: with 32 cores and a
30%-hot corpus, the window stage's critical path is the hot task.

Usage: python tools/measure_hot_sessions.py [n_events] [cpus]
Prints one JSON line; numbers are recorded in SCALING.md.
"""

from __future__ import annotations

import datetime as dt
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from etl_airflow_adventureworks_spark.operators.sessionize import (
        session_gap_sharded,
        session_gap_user_window,
    )
    from etl_airflow_adventureworks_spark.session import get_spark
    from etl_airflow_adventureworks_spark.sources import load_table

    spark = get_spark(app_name="hot-sessions", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(41)
    hot = rng.random(n) < 0.3
    user = np.where(hot, 0, 1 + (rng.zipf(1.8, n) % 50_000)).astype(np.int64)
    epoch_us = 1_735_689_600_000_000 + np.sort(
        rng.integers(0, 30 * 86400 * 1_000_000, n)
    )
    out = Path(tempfile.mkdtemp(prefix="hotsess")) / "sf"
    out.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "ts": pa.array(epoch_us, type=pa.timestamp("us")),
                "user_id": pa.array(user),
                "event_type": pa.array(["view"] * n),
                "value": pa.array(rng.random(n)),
                "props": pa.array(["{}"] * n),
            }
        ),
        out / "events.parquet",
        row_group_size=max(8_192, n // 64),
    )

    def timed(fn, reps=5):
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn().count()
            samples.append(time.perf_counter() - t0)
        return sorted(samples)[len(samples) // 2]

    sf = str(out)
    ev = load_table(spark, sf, "events")
    user_window = timed(lambda: session_gap_user_window(ev))
    sharded = timed(lambda: session_gap_sharded(ev, shard_hours=24))
    # sanity: identical results (cheap checksum)
    a = session_gap_user_window(ev).count()
    b = session_gap_sharded(ev, shard_hours=24).count()
    print(
        json.dumps(
            {
                "n_events": n,
                "hot_share": 0.3,
                "cpus": cpus,
                "user_window_sec": round(user_window, 2),
                "sharded_user_day_sec": round(sharded, 2),
                "speedup": round(user_window / sharded, 2),
                "sessions_equal": a == b,
                "sessions": a,
            }
        )
    )
    shutil.rmtree(out.parent, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
