"""Shared harness for the hot-user straggler measurements.

One Zipf-head events corpus recipe + one median-of-5 timer, used by
measure_hot_sessions.py and measure_hot_asof.py so the corpus shape
(hot share, time span, row-group sizing) and the timing methodology
can never silently diverge between the two recorded SCALING.md numbers.
"""

from __future__ import annotations

import shutil
import tempfile
import time
from pathlib import Path

import numpy as np


def write_hot_events(
    n: int,
    seed: int,
    event_types: list[str] | None = None,
    hot_share: float = 0.3,
    days: int = 30,
) -> Path:
    """Write a single driver-layout events.parquet (NTZ µs ts) where user 0
    holds ~``hot_share`` of ``n`` events over ``days``; remaining rows are
    Zipf-distributed over 50k users. ``event_types``: None = all 'view'
    (sessionization); a list = iid mix by equal thirds/probabilities given
    as (type, prob) handled by the caller via per-row assignment.
    Returns the corpus dir (caller removes it)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    hot = rng.random(n) < hot_share
    user = np.where(hot, 0, 1 + (rng.zipf(1.8, n) % 50_000)).astype(np.int64)
    epoch_us = 1_735_689_600_000_000 + np.sort(
        rng.integers(0, days * 86400 * 1_000_000, n)
    )
    if event_types is None:
        kinds = ["view"] * n
    else:
        # caller passes [(type, cumulative_prob), ...]; draw once per row
        draw = rng.random(n)
        kinds = np.select(
            [draw < p for _, p in event_types],
            [t for t, _ in event_types],
            default=event_types[-1][0],
        ).tolist()
    out = Path(tempfile.mkdtemp(prefix="hotcorpus")) / "sf"
    out.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "ts": pa.array(epoch_us, type=pa.timestamp("us")),
                "user_id": pa.array(user),
                "event_type": pa.array(kinds),
                "value": pa.array(rng.random(n)),
                "props": pa.array(["{}"] * n),
            }
        ),
        out / "events.parquet",
        row_group_size=max(8_192, n // 64),
    )
    return out


def median_timed(fn, consume, reps: int = 5, warmup: int = 1) -> float:
    """Median wall-clock of ``consume(fn())`` over ``reps`` runs, after
    ``warmup`` untimed runs — codegen/JIT compilation of a fresh JVM was
    measured adding up to 2.5× to the first query of a session, which a
    5-rep median does not reliably absorb when it lands on the first
    form timed."""
    for _ in range(warmup):
        consume(fn())
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        consume(fn())
        samples.append(time.perf_counter() - t0)
    return sorted(samples)[len(samples) // 2]


def cleanup(corpus_dir: Path) -> None:
    shutil.rmtree(corpus_dir.parent, ignore_errors=True)
