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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table


def ordered_funnel(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within_seconds: int | None = None,
    allow_ties: bool = True,
    within_total_seconds: int | None = None,
) -> DataFrame:
    """Per-key funnel completion times: one row per key that completed
    step 1, with ``t_1 .. t_k`` (epoch microseconds; NULL from the first
    uncompleted step on) and ``steps_completed``.

    Step i matches the earliest event of ``steps[i]`` at-or-after step
    i-1's match (strictly after with ``allow_ties=False``), and within
    ``within_seconds`` of it when set (the per-hop conversion window).
    ``within_total_seconds`` additionally bounds EVERY step to land
    within that many seconds of step 1's match — the overall-window
    funnel ("completed the whole flow within a day"), the other half of
    the commercial funnel API; both windows may be set at once and a
    step must satisfy both. Same greedy first-occurrence semantics and
    the same per-key O(steps) state either way — the total window is
    one more predicate on the step-i gate (t_1 is already carried).
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
        if within_total_seconds is not None:
            gate = gate & (
                F.col("__us") <= F.col("t_1") + within_total_seconds * 1_000_000
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


def dual_window_funnel(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within_total_seconds: int,
) -> DataFrame:
    """The UNBOUNDED funnel and its overall-window variant in ONE chain
    (r10): each hop joins the step-type events to the accumulated
    per-key summary ONCE and takes BOTH greedy minima as conditional
    aggregates in the same map-side-combined groupBy —

        t_i  = min(us)  where us >= t_{i-1}                (unbounded)
        tt_i = min(us)  where us >= tt_{i-1}
                          and us <= t_1 + total             (windowed)

    so the two column sets cost one filtered scan + join + aggregate
    per step instead of two whole chains (`ext_event_analytics_suite`
    uses this; equality with two standalone `ordered_funnel` runs is
    pinned in tests/test_funnel.py). Step 1 is shared: no window can
    constrain it, so tt_1 == t_1 and the total window anchors there.
    A NULL gate input (stalled prior step) makes the WHEN null and the
    MIN ignore it — identical to the standalone left-join semantics.
    Output: t_1..t_k, tt_2..tt_k (tt_1 omitted — it IS t_1),
    steps_completed, steps_completed_total."""
    if len(steps) < 2:
        raise ValueError("dual_window_funnel needs at least two steps")
    outputs = (
        "steps_completed",
        "steps_completed_total",
        *(f"t_{i + 1}" for i in range(len(steps))),
        *(f"tt_{i + 2}" for i in range(len(steps) - 1)),
    )
    for c in outputs:  # same loud contract as ordered_funnel
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
    total_us = within_total_seconds * 1_000_000
    for i, s in enumerate(steps[1:], start=2):
        prev, prev_t = f"t_{i - 1}", ("t_1" if i == 2 else f"tt_{i - 1}")
        cand = ev.filter(F.col(type_col) == s).join(cur, key_col)
        gate = F.col("__us") >= F.col(prev)
        gate_t = (
            (F.col("__us") >= F.col(prev_t))
            & (F.col("__us") <= F.col("t_1") + total_us)
        )
        matched = cand.groupBy(key_col).agg(
            F.min(F.when(gate, F.col("__us"))).alias(f"t_{i}"),
            F.min(F.when(gate_t, F.col("__us"))).alias(f"tt_{i}"),
        )
        cur = cur.join(matched, key_col, "left")
    done = F.lit(0)
    done_t = F.lit(1)  # a key in `cur` completed step 1 by construction
    for i in range(len(steps)):
        done = done + F.when(F.col(f"t_{i + 1}").isNotNull(), 1).otherwise(0)
        if i > 0:
            done_t = done_t + F.when(
                F.col(f"tt_{i + 1}").isNotNull(), 1
            ).otherwise(0)
    return cur.withColumn("steps_completed", done.cast("int")).withColumn(
        "steps_completed_total", done_t.cast("int")
    )


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


#: the declared funnel path — the canonical view→click→purchase flow
FUNNEL_STEPS = ["view", "click", "purchase"]

#: the declared overall conversion window ("completed the whole flow
#: within 3 days") — discriminating on the test corpus: the median
#: unbounded completion takes ~88 h, so roughly half the completers
#: drop a step under this bound
TOTAL_WINDOW_SECONDS = 72 * 3600


@query(
    "ext_event_analytics_suite",
    oracle="""
    WITH p AS (
      SELECT user_id,
             COUNT(*) FILTER (WHERE event_type = 'view') AS n_view,
             COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
             COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
             COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup,
             COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
             CAST(SUM(CAST(value AS DECIMAL(18,6)))
                  FILTER (WHERE event_type = 'purchase') AS DOUBLE)
               AS purchase_value
      FROM events
      GROUP BY user_id
    ),
    f1 AS (
      SELECT user_id, min(epoch_us(ts)) AS t_1
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    f2 AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t_2
      FROM events e JOIN f1 ON e.user_id = f1.user_id
      WHERE e.event_type = 'click' AND epoch_us(e.ts) >= f1.t_1
      GROUP BY e.user_id
    ),
    f3 AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t_3
      FROM events e JOIN f2 ON e.user_id = f2.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= f2.t_2
      GROUP BY e.user_id
    ),
    -- overall-window funnel (within_total_seconds = 259200): the SAME
    -- greedy rule, every step additionally gated to land within 72 h of
    -- t_1 (t_1 itself is unchanged — the window is anchored there)
    f2t AS (
      SELECT e.user_id, f1.t_1, min(epoch_us(e.ts)) AS t_2t
      FROM events e JOIN f1 ON e.user_id = f1.user_id
      WHERE e.event_type = 'click' AND epoch_us(e.ts) >= f1.t_1
        AND epoch_us(e.ts) <= f1.t_1 + 259200000000
      GROUP BY e.user_id, f1.t_1
    ),
    f3t AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t_3t
      FROM events e JOIN f2t ON e.user_id = f2t.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= f2t.t_2t
        AND epoch_us(e.ts) <= f2t.t_1 + 259200000000
      GROUP BY e.user_id
    )
    SELECT p.user_id, p.n_view, p.n_click, p.n_purchase, p.n_signup,
           p.n_error, p.purchase_value, f1.t_1, f2.t_2, f3.t_3,
           CAST(CASE WHEN f1.t_1 IS NOT NULL THEN 1 ELSE 0 END
              + CASE WHEN f2.t_2 IS NOT NULL THEN 1 ELSE 0 END
              + CASE WHEN f3.t_3 IS NOT NULL THEN 1 ELSE 0 END
              AS BIGINT) AS steps_completed,
           CAST(CASE WHEN f1.t_1 IS NOT NULL THEN 1 ELSE 0 END
              + CASE WHEN f2t.t_2t IS NOT NULL THEN 1 ELSE 0 END
              + CASE WHEN f3t.t_3t IS NOT NULL THEN 1 ELSE 0 END
              AS BIGINT) AS steps_completed_total
    FROM p
    LEFT JOIN f1 ON p.user_id = f1.user_id
    LEFT JOIN f2 ON p.user_id = f2.user_id
    LEFT JOIN f3 ON p.user_id = f3.user_id
    LEFT JOIN f2t ON p.user_id = f2t.user_id
    LEFT JOIN f3t ON p.user_id = f3t.user_id
    """,
)
def ext_event_analytics_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-analytics suite (E5) — the r9 absorber row
    (COVERAGE.md fold policy (b)): ONE per-user result carrying

    - the per-type pivot counts + purchase value (absorbed from the
      former ``ext_event_funnel_pivot`` slot — the exact columns of the
      library twin ``sessionize.ext_event_funnel_pivot``), and
    - the ORDERED funnel view→click→purchase (``ordered_funnel``:
      greedy first-occurrence step times t_1..t_3 as epoch micros and
      steps_completed), previously pytest-only, and
    - since r10 (VERDICT r9 #3) the OVERALL-WINDOW funnel:
      ``steps_completed_total`` = the same steps under
      ``within_total_seconds=TOTAL_WINDOW_SECONDS`` (72 h anchored at
      t_1) — computed in the SAME chain as the unbounded funnel via
      ``dual_window_funnel`` (both greedy minima as conditional
      aggregates per hop, so the extra column set costs no extra scans
      or joins; equality with two standalone ``ordered_funnel`` runs is
      test-pinned). The greedy rule is mirrored hop-for-hop in the
      oracle's f2t/f3t CTEs (each hop takes the EARLIEST qualifying
      event, so a per-hop pick can foreclose a completion a later
      candidate would have allowed; that is the documented
      commercial-funnel semantics, see the module docstring).

    The driver's oracle hashes the values of ALL columns, so a drift in
    any absorbed column-set breaks this row (fold-strictness rule).

    Plan (r17, VERDICT r16 #9 — guide §2.4/§1.2): THREE scans of events
    and one raw join, down from five scans and ~15 exchanges. The old
    shape ran ``event_funnel_pivot_frame`` + ``dual_window_funnel`` side
    by side: one pivot scan, one step-1 scan, and PER HOP a fresh
    type-filtered scan joined to the accumulated summary, re-aggregated,
    and left-joined back. Now the two hops share ONE 3-column scan of
    click/purchase events joined once to the step-1 summary; hop 2 is a
    groupBy over that joined stream, hop 3 another groupBy gated by hop
    2's output re-attached via a summary join, and hop 2's columns ride
    hop 3's aggregate so the final assembly is a single left join. (A
    2-scan form that computed t_1 inside the pivot aggregate was built
    and rejected: the pivot subtree is consumed with two different
    prunings — full columns for the final join, (user_id, t_1) for the
    hop gate — so Catalyst plans TWO pivot aggregations and the plan
    came out at 5 scans.) Every per-hop quantity is a conditional MIN:
    partial aggregation combines map-side, a hot user costs aggregate
    combines, never an indivisible task (an AQE-skew-split join
    partition partial-aggregates per split and merges — same bound as
    before), and no event array or per-user window is anywhere in the
    plan (plan test pins 3 scans, no Window, no collect_list). Equality
    with the old assembly is pinned on a planted corpus with a hot key,
    gate ties, repeats and missing step types
    (tests/test_funnel.py::test_suite_restructure_matches_old_assembly)."""
    return event_analytics_suite_frame(load_table(spark, sf_dir, "events"))


def event_analytics_suite_frame(ev: DataFrame) -> DataFrame:
    """The suite plan on a frame (split out so planted-corpus tests can
    pin equality with the pivot ⟕ dual_window_funnel assembly)."""
    from .sessionize import event_funnel_pivot_frame

    base = event_funnel_pivot_frame(ev)
    total_us = TOTAL_WINDOW_SECONDS * 1_000_000
    us = F.col("__us")
    t1 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("t_1"))
    )
    step = ev.filter(F.col("event_type").isin(list(FUNNEL_STEPS[1:]))).select(
        "user_id", "event_type", F.unix_micros("ts").alias("__us")
    )
    rows = step.join(t1, "user_id")
    in_total = us <= F.col("t_1") + total_us
    is2 = F.col("event_type") == FUNNEL_STEPS[1]
    h2 = rows.groupBy("user_id").agg(
        F.min(F.when(is2 & (us >= F.col("t_1")), us)).alias("t_2"),
        F.min(F.when(is2 & (us >= F.col("t_1")) & in_total, us)).alias("tt_2"),
    )
    is3 = F.col("event_type") == FUNNEL_STEPS[2]
    fun = (
        rows.join(h2, "user_id")
        .groupBy("user_id")
        .agg(
            F.min(F.when(is3 & (us >= F.col("t_2")), us)).alias("t_3"),
            F.min(F.when(is3 & (us >= F.col("tt_2")) & in_total, us)).alias(
                "tt_3"
            ),
            F.first("t_2").alias("t_2"),
            F.first("tt_2").alias("tt_2"),
        )
    )

    def nn(c: str):
        return F.when(F.col(c).isNotNull(), 1).otherwise(0)

    return (
        base.join(t1, "user_id", "left")
        .join(fun, "user_id", "left")
        .select(
            "user_id",
            "n_view",
            "n_click",
            "n_purchase",
            "n_signup",
            "n_error",
            "purchase_value",
            "t_1",
            "t_2",
            "t_3",
            (nn("t_1") + nn("t_2") + nn("t_3")).cast("long").alias(
                "steps_completed"
            ),
            F.when(F.col("t_1").isNull(), F.lit(0))
            .otherwise(F.lit(1) + nn("tt_2") + nn("tt_3"))
            .cast("long")
            .alias("steps_completed_total"),
        )
    )
