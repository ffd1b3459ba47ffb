"""Two-table as-of join: sharded default vs grouped merge_asof twin vs the
window-form attribution query, including hot-entity and shard-boundary
corpora."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_ORACLE

import __spark_entry__ as entrymod
from etl_airflow_adventureworks_spark.operators.asof import (
    asof_join,
    asof_join_grouped,
)
from etl_airflow_adventureworks_spark.sources import load_table


def _purchases_views(spark):
    ev = load_table(spark, SF_ORACLE, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts_us"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts_us")
    return purchases, views


def test_asof_join_matches_window_form(spark):
    # the sharded DEFAULT must agree with the oracle-gated window form
    purchases, views = _purchases_views(spark)
    joined = asof_join(purchases, views, on="ts_us", by="user_id")
    got = {
        r["purchase_id"]: r["ts_us_right"] for r in joined.collect()
    }
    want = {
        r["purchase_id"]: r["last_view_us"]
        for r in entrymod.queries()["ext_asof_attribution"](spark, SF_ORACLE).collect()
    }
    assert got == want


def test_asof_join_sharded_equals_grouped_on_real_data(spark):
    purchases, views = _purchases_views(spark)
    a = sorted(
        map(tuple, asof_join(purchases, views, on="ts_us", by="user_id").collect())
    )
    b = sorted(
        map(
            tuple,
            asof_join_grouped(purchases, views, on="ts_us", by="user_id").collect(),
        )
    )
    assert a == b


def test_asof_join_no_right_rows(spark):
    left = spark.createDataFrame([(1, 10), (1, 20)], "k int, t int")
    right = spark.createDataFrame([], "k int, t int, v string")
    out = asof_join(left, right, on="t", by="k").collect()
    assert len(out) == 2
    assert all(r["v_right"] is None for r in out)


def test_asof_join_boundary_cases_every_width(spark):
    """Adversarial shard boundaries: right rows exactly AT shard edges,
    equal left/right timestamps (backward as-of is inclusive), carries
    across multiple right-less shards, and lefts before any right (NULL).
    The sharded result must be width-invariant and equal the grouped
    twin for every width."""
    rows_l = [(1, t) for t in [0, 5, 10, 15, 29, 30, 31, 90, 100]] + [
        (2, 50),
        (3, 7),
    ]
    # entity 1: rights at 0, 10 (== a width-10 edge), 30; entity 2: right
    # far earlier (carry across empty shards); entity 3: no rights at all
    rows_r = [(1, 0, "a"), (1, 10, "b"), (1, 30, "c"), (2, 3, "z")]
    left = spark.createDataFrame(rows_l, "k int, t long")
    right = spark.createDataFrame(rows_r, "k int, t long, v string")
    want = sorted(
        map(tuple, asof_join_grouped(left, right, on="t", by="k").collect())
    )
    assert [r for r in want if r[0] == 3] == [(3, 7, None, None)]
    for width in (1, 7, 10, 1000):
        got = sorted(
            map(
                tuple,
                asof_join(left, right, on="t", by="k", shard_width=width).collect(),
            )
        )
        assert got == want, f"width={width}"
    # auto width agrees too
    got_auto = sorted(map(tuple, asof_join(left, right, on="t", by="k").collect()))
    assert got_auto == want
    # spot-check the inclusive-equality semantics: left t=10 matches right
    # t=10, left t=30 matches right t=30, left t=29 matches right t=10
    m = {(r[0], r[1]): r[2] for r in want}
    assert m[(1, 10)] == 10 and m[(1, 30)] == 30 and m[(1, 29)] == 10


def test_asof_join_hot_entity_sharded_equals_grouped(spark):
    """The r6 fail-loud scenario, now HANDLED: one entity holds most of
    both streams. The sharded default must process it (no per-entity
    pandas frame to guard) and agree with the grouped twin row-for-row."""
    import numpy as np

    rng = np.random.default_rng(11)
    n = 6_000
    user = np.where(rng.random(n) < 0.5, 0, rng.integers(1, 40, n))
    ts = np.sort(rng.integers(0, 10**9, n))
    side = rng.random(n) < 0.6  # 60% rights ("price rows")
    rows = [
        (int(u), int(t), bool(s), i)
        for i, (u, t, s) in enumerate(zip(user.tolist(), ts.tolist(), side.tolist()))
    ]
    df = spark.createDataFrame(rows, "k long, t long, is_r boolean, rid long")
    left = df.filter(~F.col("is_r")).select("k", "t", F.col("rid").alias("lid"))
    # unique (k, t) on the right so the carried row is deterministic
    right = (
        df.filter(F.col("is_r"))
        .groupBy("k", "t")
        .agg(F.max("rid").alias("price"))
    )
    got = sorted(
        map(
            tuple,
            asof_join(left, right, on="t", by="k", shard_width=10**7).collect(),
        )
    )
    want = sorted(
        map(tuple, asof_join_grouped(left, right, on="t", by="k").collect())
    )
    assert got == want
    # the hot entity actually carries values across shards (not all local)
    hot_matched = [r for r in got if r[0] == 0 and r[3] is not None]
    assert len(hot_matched) > 100


def test_asof_join_string_on_rejected_up_front(spark):
    """Non-orderable-as-number `on` types fail loud at plan time — pandas
    merge_asof rejects them too, so a silent fallback would just move the
    error to a worker traceback."""
    left = spark.createDataFrame([(1, "b"), (1, "d")], "k int, t string")
    right = spark.createDataFrame([(1, "a", 10), (1, "c", 20)], "k int, t string, v int")
    with pytest.raises(ValueError, match="numeric, date, or timestamp"):
        asof_join(left, right, on="t", by="k")


def test_asof_join_timestamp_on_sharded(spark):
    """Timestamp `on` shards through unix_micros; result matches grouped."""
    import datetime as dt

    t0 = dt.datetime(2025, 1, 1)
    left = spark.createDataFrame(
        [(1, t0 + dt.timedelta(hours=h)) for h in (1, 30, 80)], "k int, t timestamp"
    )
    right = spark.createDataFrame(
        [(1, t0 + dt.timedelta(hours=h), h) for h in (0, 25, 79)],
        "k int, t timestamp, v int",
    )
    for sw in ("auto", 3_600_000_000):
        got = sorted(
            map(
                tuple,
                asof_join(left, right, on="t", by="k", shard_width=sw).collect(),
            )
        )
        want = sorted(
            map(tuple, asof_join_grouped(left, right, on="t", by="k").collect())
        )
        assert got == want
    vs = {r["t"]: r["v_right"] for r in asof_join(left, right, on="t", by="k").collect()}
    assert list(vs.values()) == [0, 25, 79]


def test_asof_join_grouped_skew_guard_fails_loud(spark):
    """The grouped FALLBACK keeps its guard: a group over max_group_rows
    raises the documented remedy (which now points at the sharded default)
    instead of quietly building an oversized pandas frame."""
    from pyspark.errors import PythonException

    left = spark.range(50).selectExpr("1 AS ent", "id AS t", "id AS lv")
    right = spark.range(10).selectExpr("1 AS ent", "id * 5 AS t", "id AS rv")
    out = asof_join(left, right, on="t", by="ent", shard_width=None, max_group_rows=20)
    with pytest.raises(PythonException, match="max_group_rows"):
        out.collect()
    # the sharded DEFAULT handles the same shape with no guard in the plan
    res = asof_join(left, right, on="t", by="ent", shard_width=5).collect()
    assert len(res) == 50


def test_asof_join_collision_validation(spark):
    left = spark.createDataFrame([(1, 10, "x")], "k int, t int, payload string")
    right = spark.createDataFrame([(1, 5, "y")], "k int, t int, payload string")
    with pytest.raises(ValueError, match="both sides"):
        asof_join(left, right, on="t", by="k")
    left2 = spark.createDataFrame([(1, 10, "x")], "k int, t int, t_right string")
    right2 = spark.createDataFrame([(1, 5)], "k int, t int")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left2, right2, on="t", by="k")


def test_asof_join_null_entity_keys_match_grouped_twin(spark):
    # r7 review finding: NULL `by` is ONE group (groupBy semantics, which
    # the grouped twin inherits); the sharded default's carry join must be
    # null-safe or those left rows silently vanish
    left = spark.createDataFrame(
        [(None, 10, 1), (None, 30, 2), (1, 20, 3)], "ent long, t long, lv long"
    )
    right = spark.createDataFrame(
        [(None, 5, 7), (None, 25, 8), (1, 15, 9)], "ent long, t long, rv long"
    )
    for width in [1, 7, "auto"]:
        got = {
            (r["ent"], r["t"]): (r["t_right"], r["rv_right"])
            for r in asof_join(left, right, on="t", by="ent", shard_width=width).collect()
        }
        assert got == {
            (None, 10): (5, 7),
            (None, 30): (25, 8),
            (1, 20): (15, 9),
        }, width
    want = {
        (r["ent"], r["t"]): (r["t_right"], r["rv_right"])
        for r in asof_join(left, right, on="t", by="ent", shard_width=None).collect()
    }
    assert want == got  # sharded == grouped twin on NULL-keyed rows


def test_asof_join_left_on_type_validated(spark):
    # r7 review finding: the axis-type check must cover BOTH sides — a
    # string left `on` used to die mid-execution (or silently null-drop
    # with ANSI off) instead of failing loud at plan time
    left = spark.createDataFrame([(1, "not-a-time", 1)], "k long, t string, lv long")
    right = spark.createDataFrame([(1, 5, 2)], "k long, t long, rv long")
    with pytest.raises(ValueError, match="left `on`"):
        asof_join(left, right, on="t", by="k")


def test_asof_join_internal_column_collision_raises(spark):
    left = spark.createDataFrame([(1, 10, 5)], "k long, t long, __shard long")
    right = spark.createDataFrame([(1, 5, 2)], "k long, t long, rv long")
    with pytest.raises(ValueError, match="internal"):
        asof_join(left, right, on="t", by="k")


# ---------------------------------------------------------------------------
# Directions + tolerance (round 8, VERDICT r7 #2): forward / nearest and the
# tolerance residual, on both plans, against three independent oracles —
# the grouped pd.merge_asof twin, a pure-python brute force, and DuckDB's
# native ASOF on a sign-flipped axis (forward).
# ---------------------------------------------------------------------------


def _brute_asof(rows_l, rows_r, direction, tolerance=None):
    """Pure-python oracle: rows_l (k, t, lid), rows_r (k, t, v) with unique
    (k, t). Tolerance filters candidates; nearest ties go backward."""
    out = []
    for k, t, lid in rows_l:
        cands = [(rt, rv) for rk, rt, rv in rows_r if rk == k]
        b = max(
            ((rt, rv) for rt, rv in cands
             if rt <= t and (tolerance is None or t - rt <= tolerance)),
            default=None,
        )
        f = min(
            ((rt, rv) for rt, rv in cands
             if rt >= t and (tolerance is None or rt - t <= tolerance)),
            default=None,
        )
        if direction == "backward":
            m = b
        elif direction == "forward":
            m = f
        elif b is None:
            m = f
        elif f is None:
            m = b
        else:
            m = b if (t - b[0]) <= (f[0] - t) else f
        out.append((k, t, lid, m[0] if m else None, m[1] if m else None))
    return sorted(out)


def _direction_corpus(spark, seed=7, n=3_000, n_keys=25):
    import numpy as np

    rng = np.random.default_rng(seed)
    ks = rng.integers(0, n_keys, n)
    ts = rng.integers(0, 100_000, n)
    seen = set()
    rows_l, rows_r = [], []
    for i, (k, t) in enumerate(zip(ks.tolist(), ts.tolist())):
        if i % 3 == 0:
            rows_l.append((int(k), int(t), i))
        elif (k, t) not in seen:  # unique (k, t) rights → deterministic
            seen.add((k, t))
            rows_r.append((int(k), int(t), i))
    left = spark.createDataFrame(rows_l, "k long, t long, lid long")
    right = spark.createDataFrame(rows_r, "k long, t long, v long")
    return rows_l, rows_r, left, right


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("tolerance", [None, 500])
def test_asof_directions_match_brute_force(spark, direction, tolerance):
    rows_l, rows_r, left, right = _direction_corpus(spark)
    want = _brute_asof(rows_l, rows_r, direction, tolerance)
    for plan_kw in ({"shard_width": 1_000}, {"shard_width": "auto"}, {"shard_width": None}):
        got = sorted(
            map(
                tuple,
                asof_join(
                    left, right, on="t", by="k",
                    direction=direction, tolerance=tolerance, **plan_kw,
                ).collect(),
            )
        )
        assert got == want, (direction, tolerance, plan_kw)
    # the scenario must exercise both matched and tolerance-nulled rows
    if tolerance is not None:
        assert any(r[3] is None for r in want) and any(r[3] is not None for r in want)


def test_asof_forward_boundary_semantics_every_width(spark):
    """Forward mirror of the backward boundary test: rights exactly at
    shard edges, equal timestamps (inclusive), carries across right-less
    LATER shards, lefts after the last right (NULL)."""
    rows_l = [(1, t) for t in [0, 5, 10, 15, 29, 30, 31, 90, 100]] + [
        (2, 1),
        (3, 7),
    ]
    rows_r = [(1, 0, "a"), (1, 10, "b"), (1, 30, "c"), (2, 70, "z")]
    left = spark.createDataFrame(rows_l, "k int, t long")
    right = spark.createDataFrame(rows_r, "k int, t long, v string")
    want = sorted(
        map(
            tuple,
            asof_join_grouped(left, right, on="t", by="k", direction="forward").collect(),
        )
    )
    assert [r for r in want if r[0] == 3] == [(3, 7, None, None)]
    for width in (1, 7, 10, 1000):
        got = sorted(
            map(
                tuple,
                asof_join(
                    left, right, on="t", by="k",
                    shard_width=width, direction="forward",
                ).collect(),
            )
        )
        assert got == want, f"width={width}"
    m = {(r[0], r[1]): r[2] for r in want}
    # inclusive equality forward; strictly-later otherwise; NULL after last
    assert m[(1, 10)] == 10 and m[(1, 30)] == 30 and m[(1, 15)] == 30
    assert m[(1, 31)] is None and m[(1, 100)] is None
    assert m[(2, 1)] == 70  # carried in from a later shard at every width


def test_asof_nearest_tie_goes_backward(spark):
    left = spark.createDataFrame([(1, 10)], "k int, t long")
    right = spark.createDataFrame(
        [(1, 5, "before"), (1, 15, "after")], "k int, t long, v string"
    )
    for kw in ({"shard_width": 3}, {"shard_width": None}):
        (row,) = asof_join(
            left, right, on="t", by="k", direction="nearest", **kw
        ).collect()
        assert row["v_right"] == "before", kw


def test_asof_hot_entity_directions_sharded_equals_grouped(spark):
    """Hot-entity corpus (one key holds ~half of both streams) through
    forward and nearest with a tolerance: sharded == grouped row-for-row."""
    import numpy as np

    rng = np.random.default_rng(13)
    n = 4_000
    user = np.where(rng.random(n) < 0.5, 0, rng.integers(1, 30, n))
    ts = np.sort(rng.integers(0, 10**8, n))
    side = rng.random(n) < 0.5
    rows = [
        (int(u), int(t), bool(s), i)
        for i, (u, t, s) in enumerate(zip(user.tolist(), ts.tolist(), side.tolist()))
    ]
    df = spark.createDataFrame(rows, "k long, t long, is_r boolean, rid long")
    left = df.filter(~F.col("is_r")).select("k", "t", F.col("rid").alias("lid"))
    right = df.filter(F.col("is_r")).groupBy("k", "t").agg(F.max("rid").alias("price"))
    for direction in ("forward", "nearest"):
        for tolerance in (None, 10**6):
            got = sorted(
                map(
                    tuple,
                    asof_join(
                        left, right, on="t", by="k", shard_width=10**6,
                        direction=direction, tolerance=tolerance,
                    ).collect(),
                )
            )
            want = sorted(
                map(
                    tuple,
                    asof_join_grouped(
                        left, right, on="t", by="k",
                        direction=direction, tolerance=tolerance,
                    ).collect(),
                )
            )
            assert got == want, (direction, tolerance)


def test_asof_forward_matches_duckdb_signflip_oracle(spark):
    """DuckDB has no forward ASOF; a backward ASOF on a NEGATED axis is the
    forward join (r >= l  ⇔  -r <= -l, and max(-r) picks min(r)) — the
    cross-engine oracle VERDICT r7 #2 asked for."""
    import duckdb

    rows_l, rows_r, left, right = _direction_corpus(spark, seed=23, n=2_000)
    got = sorted(
        map(
            tuple,
            asof_join(
                left, right, on="t", by="k", shard_width=5_000, direction="forward"
            ).select("k", "t", "lid", "t_right", "v_right").collect(),
        ),
        key=lambda r: tuple((x is None, x) for x in r),
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE l(k BIGINT, t BIGINT, lid BIGINT); "
        "CREATE TABLE r(k BIGINT, t BIGINT, v BIGINT)"
    )
    con.executemany("INSERT INTO l VALUES (?,?,?)", rows_l)
    con.executemany("INSERT INTO r VALUES (?,?,?)", rows_r)
    want_df = con.execute(
        """
        SELECT l.k, l.t, l.lid, -rn.neg_t AS t_right, rn.v AS v_right
        FROM l ASOF LEFT JOIN (SELECT k, -t AS neg_t, v FROM r) rn
          ON l.k = rn.k AND -l.t >= rn.neg_t
        """
    ).fetchall()
    con.close()
    want = sorted(
        (tuple(int(x) if x is not None else None for x in row) for row in want_df),
        key=lambda r: tuple((x is None, x) for x in r),
    )
    assert got == want


def test_asof_timestamp_axis_tolerance_micros(spark):
    """Tolerance on a timestamp axis is in MICROS on both plans (the
    grouped twin converts to the Timedelta pandas wants)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, t0 + dt.timedelta(seconds=s)) for s in (10, 100, 1000)],
        "k int, t timestamp",
    )
    right = spark.createDataFrame(
        [(1, t0, "x")], "k int, t timestamp, v string"
    )
    for kw in ({"shard_width": 60 * 1_000_000}, {"shard_width": None}):
        out = {
            int((r["t"] - t0).total_seconds()): r["v_right"]
            for r in asof_join(
                left, right, on="t", by="k",
                direction="backward", tolerance=120 * 1_000_000, **kw,
            ).collect()
        }
        assert out == {10: "x", 100: "x", 1000: None}, kw


def test_asof_direction_and_tolerance_validation(spark):
    left = spark.createDataFrame([(1, 10)], "k int, t long")
    right = spark.createDataFrame([(1, 5, "a")], "k int, t long, v string")
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on="t", by="k", direction="sideways")
    with pytest.raises(ValueError, match="direction"):
        asof_join_grouped(left, right, on="t", by="k", direction="sideways")
    with pytest.raises(ValueError, match="tolerance"):
        asof_join(left, right, on="t", by="k", tolerance=-1)


@pytest.mark.parametrize("direction", ["forward", "nearest"])
def test_asof_direction_plans_stay_catalyst_only(spark, direction):
    """The new directions ride the same pure-Catalyst shape as backward:
    no Python eval node, no nested-loop/cartesian join in the sharded
    plan (tolerance included — it is a residual, not a plan change)."""
    rows_l, rows_r, left, right = _direction_corpus(spark, n=300)
    df = asof_join(
        left, right, on="t", by="k", shard_width=1_000,
        direction=direction, tolerance=500,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    for bad in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas",
                "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in plan, (direction, bad)
