"""Hot-user sessionization straggler measurement (VERDICT r4 #3).

Builds a Zipf-head events corpus (one user holds ~30% of N events over a
30-day span; shared recipe in tools/hotcorpus.py), then times the
textbook user-window sessionizer against the time-sharded form (the
DECLARED ext_session_gap since round 6) on local[N]. A user-partitioned
window is an indivisible task, so the hot user's entire history lands on
ONE core while the other N−1 idle — the sharded form's heavy pass keys
on (user, day) and spreads it. The wall-clock ratio IS the straggler
evidence: with 32 cores and a 30%-hot corpus, the window stage's
critical path is the hot task.

Measured round 6 (idle machine, 1 warmup + median-of-5): user-window
1.05 / 2.72 / 10.89 s at 2M / 8M / 32M events vs sharded 0.90 / 1.33 /
4.13 s = 1.17x / 2.04x / 2.64x, monotone in corpus size. Run on an IDLE
machine — concurrent load distorts the ratio.

Usage: python tools/measure_hot_sessions.py [n_events] [cpus]
Prints one JSON line; numbers are recorded in SCALING.md.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from tools.hotcorpus import cleanup, median_timed, write_hot_events  # noqa: E402


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

    out = write_hot_events(n, seed=41)

    def consume(df):
        # the session aggregate's cardinality depends on the whole window
        # chain, so count() is a valid consumer here (unlike as-of, where
        # the attributed column is cardinality-neutral)
        df.count()

    ev = load_table(spark, str(out), "events")
    user_window = median_timed(lambda: session_gap_user_window(ev), consume)
    sharded = median_timed(lambda: session_gap_sharded(ev, shard_hours=24), consume)
    # sanity: identical session sets (count is meaningful here — the count
    # genuinely differs if the boundary stitch is wrong; full
    # tuple-equality lives in tests/test_skew_zipf.py)
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
    cleanup(out)
    spark.stop()


if __name__ == "__main__":
    main()
