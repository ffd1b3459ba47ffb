"""Committed streaming bounded-state curve (VERDICT r5 #7).

Round 5 proved the append-mode session state plateaus as a pytest
assertion; this tool records the actual per-batch curve as a committed
artifact (STREAM_STATE.json) so it can be diffed round-over-round.

Corpus: 8 day-sliced files (one per micro-batch), 6k events/day over 120
users, seeded — the same shape `tests/test_streaming.py::
test_append_mode_session_state_plateaus_complete_grows` gates. For each
output mode the session aggregation replays the stream one file per
trigger and the state operator's footprint is sampled per batch:

  rows    = numRowsTotal   (state store size after the batch)
  removed = numRowsRemoved (watermark eviction this batch)
  input   = numInputRows

Append + 2 h watermark must plateau (eviction ≈ admission); complete
mode grows monotonically to the total session count.

Usage: python tools/measure_stream_state.py [out_json]
"""

from __future__ import annotations

import datetime as dt
import json
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def build_daily_corpus(spark, out: str, n_days=8, per_day=6_000, n_users=120) -> None:
    from pyspark.sql import functions as F

    rng = np.random.default_rng(31)
    t0 = dt.datetime(2025, 3, 1)
    rows = []
    eid = 0
    for d in range(n_days):
        offs = np.sort(rng.integers(0, 86400 * 1_000_000, per_day))
        users = rng.integers(0, n_users, per_day)
        for o, u in zip(offs.tolist(), users.tolist()):
            rows.append(
                (eid, t0 + dt.timedelta(days=d, microseconds=o), int(u), "view", 0.5, "{}")
            )
            eid += 1
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    df = spark.createDataFrame(rows, schema)
    for d in range(n_days):
        day0 = t0 + dt.timedelta(days=d)
        day1 = day0 + dt.timedelta(days=1)
        df.filter((F.col("ts") >= day0) & (F.col("ts") < day1)).coalesce(1).write.mode(
            "append"
        ).parquet(out)


def build_two_stream_corpus(
    spark, imp_out: str, clk_out: str, n_days=10, per_day=6_000, n_users=120
) -> None:
    """Impressions + clicks day-sliced dirs for the stream-stream join
    probe: ~30% of impressions spawn a click 0-90 min later (spilling
    past the last midnight into a trailing file), plus orphan clicks."""
    from pyspark.sql import functions as F

    rng = np.random.default_rng(47)
    t0 = dt.datetime(2025, 6, 1)
    imps, clks = [], []
    iid = cid = 0
    for d in range(n_days):
        offs = np.sort(rng.integers(0, 86400 * 1_000_000, per_day))
        users = rng.integers(0, n_users, per_day)
        for o, u in zip(offs.tolist(), users.tolist()):
            ts = t0 + dt.timedelta(days=d, microseconds=o)
            imps.append((iid, ts, int(u), f"c{iid % 7}"))
            if rng.random() < 0.3:
                delta = int(rng.integers(0, 90 * 60 * 1_000_000))
                clks.append((cid, ts + dt.timedelta(microseconds=delta), int(u), "m"))
                cid += 1
            iid += 1
    imp_df = spark.createDataFrame(
        imps, "imp_id long, ts timestamp, user_id long, campaign string"
    )
    clk_df = spark.createDataFrame(
        clks, "click_id long, ts timestamp, user_id long, device string"
    )
    for df, out in ((imp_df, imp_out), (clk_df, clk_out)):
        for d in range(n_days + 1):
            day0 = t0 + dt.timedelta(days=d)
            day1 = day0 + dt.timedelta(days=1)
            part = df.filter((F.col("ts") >= day0) & (F.col("ts") < day1))
            if part.limit(1).count():
                part.coalesce(1).write.mode("append").parquet(out)


def main() -> None:
    out_json = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "STREAM_STATE.json"

    from etl_airflow_adventureworks_spark.session import get_spark
    from etl_airflow_adventureworks_spark.streaming import events as se

    spark = get_spark(app_name="stream-state", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = tempfile.mkdtemp(prefix="streamstate")
    try:
        files_dir = f"{corpus}/daily"
        build_daily_corpus(spark, files_dir)
        curves = {
            mode: se.session_state_per_batch(spark, files_dir, mode)
            for mode in ("append", "complete")
        }

        from etl_airflow_adventureworks_spark.streaming.joins import (
            join_state_per_batch,
        )

        imp_dir, clk_dir = f"{corpus}/imp", f"{corpus}/clk"
        build_two_stream_corpus(spark, imp_dir, clk_dir)
        join_curve = join_state_per_batch(
            spark,
            imp_dir,
            clk_dir,
            left_schema="imp_id long, ts timestamp, user_id long, campaign string",
            right_schema="click_id long, ts timestamp, user_id long, device string",
            on="user_id",
            lower="0 seconds",
            upper="1 hour",
            watermark="2 hours",
        )
        commit = subprocess.run(
            ["git", "-C", str(REPO), "rev-parse", "--short", "HEAD"],
            capture_output=True,
            text=True,
        ).stdout.strip()
        doc = {
            "meta": {
                "corpus": "8 day-sliced files, 6k events/day, 120 users, seed 31",
                "watermark": "2 hours",
                "gap_min": se.SESSION_GAP_MIN,
                "commit": commit,
                "note": (
                    "append must plateau (eviction ~= admission); complete "
                    "grows to total session count. Gated by tests/"
                    "test_streaming.py::test_append_mode_session_state_"
                    "plateaus_complete_grows"
                ),
            },
            "append": curves["append"],
            "complete": curves["complete"],
            "join_meta": {
                "corpus": (
                    "10 day-sliced files/side, 6k impressions/day, ~30% "
                    "clicked within 90 min, 120 users, seed 47"
                ),
                "join": "inner, user_id, click in [imp ts, +1 h], watermark 2 h",
                "note": (
                    "StreamingSymmetricHashJoin state must plateau (the "
                    "watermark+interval eviction horizon ~= admission; the "
                    "evicting watermark lags one batch, so the plateau is "
                    "~one day + 3 h of rows). Gated by tests/"
                    "test_stream_join.py::test_inner_join_state_plateaus"
                ),
            },
            "join": join_curve,
            "summary": {
                "append_max_rows": max(h["rows"] for h in curves["append"]),
                "append_total_removed": sum(h["removed"] for h in curves["append"]),
                "complete_final_rows": curves["complete"][-1]["rows"],
                "join_max_rows": max(h["rows"] for h in join_curve),
                "join_total_removed": sum(h["removed"] for h in join_curve),
                "join_total_input": sum(h["input"] for h in join_curve),
            },
        }
        out_json.write_text(json.dumps(doc, indent=1) + "\n")
        print(json.dumps(doc["summary"]))
        print(f"wrote {out_json}")
    finally:
        shutil.rmtree(corpus, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
