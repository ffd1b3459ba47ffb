"""Ordered event funnels and transition matrices over the events table.

The reference's analytics have no event-sequence notion at all (KPIs are
set-level GROUP BYs — `/root/reference/KPIs.sql`); the engine's own
`ext_event_funnel_pivot` counts per-type events per user but ignores
ORDER. This module adds the two sequence primitives every product
analytics suite ships:

- `ordered_funnel`: "did the user do A, then B within T, then C within
  T" — greedy earliest-completion semantics (step i's timestamp is the
  FIRST event of type i at-or-after step i-1's timestamp, optionally
  within a per-hop window), the same first-occurrence rule the
  commercial funnel tools use. One filtered aggregate + one summary-
  sized join PER STEP: each hop shuffles only the events of that step's
  type (map-side combined), the per-key state is k timestamps, and a
  hot user costs an aggregate combine, never an indivisible task —
  there is deliberately NO per-key event-array collection (the hot-key
  OOM shape `sessionize`'s sharding exists to avoid).

- `transition_matrix`: (state -> next state) counts per key order, the
  Markov view of event flow. One window lead over (key, ts, tiebreak) +
  one summary-sized aggregate.

Greedy caveat (documented, inherent to the semantics): with bounded
hop windows, matching the EARLIEST step-1 event can miss a completion
that a later step-1 event would have allowed; commercial funnels share
this rule, and it is what makes the per-key state O(steps) instead of
a per-key sequence scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ordered_funnel(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within_seconds: int | None = None,
    allow_ties: bool = True,
) -> DataFrame:
    """Per-key funnel completion times: one row per key that completed
    step 1, with ``t_1 .. t_k`` (epoch microseconds; NULL from the first
    uncompleted step on) and ``steps_completed``.

    Step i matches the earliest event of ``steps[i]`` at-or-after step
    i-1's match (strictly after with ``allow_ties=False``), and within
    ``within_seconds`` of it when set (the per-hop conversion window).
    ``steps`` may repeat a type ("view then view again").

    Timestamps are compared as integer microseconds — exact, total-
    ordered, oracle-friendly."""
    if len(steps) < 1:
        raise ValueError("steps must name at least one event type")
    for c in ("steps_completed", *(f"t_{i + 1}" for i in range(len(steps)))):
        if c in events.columns:
            raise ValueError(f"column {c!r} collides with a funnel output")
    ev = events.select(
        F.col(key_col),
        F.col(type_col),
        F.unix_micros(F.col(ts_col)).alias("__us"),
    )
    cur = (
        ev.filter(F.col(type_col) == steps[0])
        .groupBy(key_col)
        .agg(F.min("__us").alias("t_1"))
    )
    for i, s in enumerate(steps[1:], start=2):
        prev = f"t_{i - 1}"
        cand = ev.filter(F.col(type_col) == s).join(cur, key_col)
        gate = (
            F.col("__us") >= F.col(prev)
            if allow_ties
            else F.col("__us") > F.col(prev)
        )
        if within_seconds is not None:
            gate = gate & (
                F.col("__us") <= F.col(prev) + within_seconds * 1_000_000
            )
        matched = (
            cand.filter(gate)
            .groupBy(key_col)
            .agg(F.min("__us").alias(f"t_{i}"))
        )
        # keys that stalled at step i-1 keep their earlier times (left)
        cur = cur.join(matched, key_col, "left")
    done = F.lit(0)
    for i in range(len(steps)):
        done = done + F.when(F.col(f"t_{i + 1}").isNotNull(), 1).otherwise(0)
    return cur.withColumn("steps_completed", done.cast("int"))


def funnel_counts(funnel: DataFrame, n_steps: int) -> DataFrame:
    """The funnel chart: how many keys reached step i (1-indexed),
    derived from `ordered_funnel`'s output in one summary aggregate."""
    aggs = [
        F.count(f"t_{i + 1}").alias(f"reached_{i + 1}") for i in range(n_steps)
    ]
    return funnel.agg(*aggs)


def transition_matrix(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """(state, next_state, n) counts over each key's time-ordered event
    sequence — the Markov transition view. The final event of each key
    has no successor and is not counted. ``tiebreak_col`` totally orders
    equal timestamps (recommended: the event id) so the matrix is
    deterministic, not partition luck."""
    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    return (
        events.withColumn("__next", F.lead(type_col).over(w))
        .filter(F.col("__next").isNotNull())
        .groupBy(F.col(type_col).alias("state"),
                 F.col("__next").alias("next_state"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
