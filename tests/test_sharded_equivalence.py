"""Randomized equivalence proofs for the round-6 declared sharded plans.

The fixed-corpus equality tests (test_skew_zipf.py, test_oracle_parity)
prove the sharded sessionizer / as-of on two corpora; these push the
claim "exact for ANY shard width" through adversarial generated inputs:

- timestamps COLLIDING exactly (tie-break order by event_id);
- gaps exactly AT the threshold (> is a session break, == is not);
- events exactly ON shard boundaries (ts_us % shard_us == 0);
- shard widths from 1 hour to wider-than-the-corpus (the degenerate
  single-shard case must equal the textbook form trivially);
- sessions spanning 2+ shard boundaries (multi-hop stitch).

Deterministic seeds — failures reproduce.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

GAP_MIN = 30
GAP_US = GAP_MIN * 60 * 1_000_000
DAY_US = 86_400 * 1_000_000


def _events_df(spark, rows):
    # rows: (event_id, ts_us, user_id, event_type, value)
    df = spark.createDataFrame(
        [(e, t, u, k, v, "{}") for e, t, u, k, v in rows],
        "event_id long, ts_us long, user_id long, event_type string,"
        " value double, props string",
    )
    return df.select(
        "event_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def _adversarial_rows(seed: int, n_users: int = 40, n_events: int = 4000):
    """Event stream stressing every boundary case at once."""
    rng = np.random.default_rng(seed)
    t0 = 1_735_689_600_000_000
    rows = []
    eid = 0
    for u in range(n_users):
        t = t0 + int(rng.integers(0, DAY_US))
        for _ in range(int(rng.integers(1, n_events // n_users * 2))):
            draw = rng.random()
            if draw < 0.15:
                step = 0  # exact timestamp collision
            elif draw < 0.3:
                step = GAP_US  # exactly at the gap: same session (> breaks)
            elif draw < 0.45:
                step = GAP_US + 1  # one past the gap: new session
            elif draw < 0.6:
                # land exactly on the next shard boundary (any width that
                # divides DAY_US hits this for 24h shards)
                step = DAY_US - (t % DAY_US)
            else:
                step = int(rng.integers(1, 2 * GAP_US))
            t += step
            kind = ["view", "purchase", "click"][int(rng.integers(0, 3))]
            rows.append((eid, t, u, kind, float(rng.random())))
            eid += 1
    return rows


@pytest.mark.parametrize("shard_hours", [1, 5, 24, 24 * 400])
def test_session_gap_sharded_equals_user_window_any_width(spark, shard_hours):
    from etl_airflow_adventureworks_spark.operators.sessionize import (
        session_gap_sharded,
        session_gap_user_window,
    )

    ev = _events_df(spark, _adversarial_rows(seed=shard_hours))
    want = sorted(map(tuple, session_gap_user_window(ev).collect()))
    got = sorted(
        map(tuple, session_gap_sharded(ev, shard_hours=shard_hours).collect())
    )
    assert got == want and len(got) > 0


@pytest.mark.parametrize("shard_hours", [1, 5, 24, 24 * 400])
def test_asof_sharded_equals_user_window_any_width(spark, shard_hours):
    from etl_airflow_adventureworks_spark.operators.sessionize import (
        asof_attribution_sharded,
        asof_attribution_user_window,
    )

    ev = _events_df(spark, _adversarial_rows(seed=100 + shard_hours))
    want = sorted(map(tuple, asof_attribution_user_window(ev).collect()))
    got = sorted(
        map(tuple, asof_attribution_sharded(ev, shard_hours=shard_hours).collect())
    )
    assert got == want and len(got) > 0


def test_session_multi_boundary_stitch(spark):
    """One user active continuously (every 10 min) for 5 days: with 24h
    shards that is ONE session spanning 5 shard boundaries — the stitch
    must merge all mini-sessions into a single row."""
    from etl_airflow_adventureworks_spark.operators.sessionize import (
        session_gap_sharded,
    )

    t0 = 1_735_689_600_000_000
    step = 10 * 60 * 1_000_000
    n = 5 * DAY_US // step
    rows = [(i, t0 + i * step, 7, "view", 0.5) for i in range(int(n))]
    out = session_gap_sharded(_events_df(spark, rows), shard_hours=24).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_events"] == int(n)
    assert r["session_start_us"] == t0
    assert r["session_end_us"] == t0 + (int(n) - 1) * step


def test_asof_carry_in_skips_viewless_shards(spark):
    """A purchase whose most recent prior view sits SEVERAL shards back
    (intervening shards have clicks but no views) must attribute through
    the running-max carry, not just the previous shard."""
    from etl_airflow_adventureworks_spark.operators.sessionize import (
        asof_attribution_sharded,
    )

    t0 = 1_735_689_600_000_000
    rows = [
        (0, t0, 1, "view", 1.0),  # day 0: the view to attribute
        (1, t0 + 1 * DAY_US, 1, "click", 1.0),  # day 1: no views
        (2, t0 + 2 * DAY_US, 1, "click", 1.0),  # day 2: no views
        (3, t0 + 3 * DAY_US, 1, "purchase", 1.0),  # day 3
        (4, t0 + 3 * DAY_US + 1, 2, "purchase", 1.0),  # user 2: no view ever
    ]
    out = {
        r["purchase_id"]: r
        for r in asof_attribution_sharded(_events_df(spark, rows), 24).collect()
    }
    assert out[3]["last_view_us"] == t0
    assert out[3]["view_to_purchase_sec"] == pytest.approx(3 * 86400.0)
    assert out[4]["last_view_us"] is None
