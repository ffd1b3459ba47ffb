"""range_join: sharded default ⇄ naive non-equi twin equivalence, edge
cases (boundaries, empty/null intervals, null keys), the explosion guard,
and a pure-python brute-force oracle on one corpus."""

from __future__ import annotations

import datetime as dt

import pytest

from conftest import SF_ORACLE

from etl_airflow_adventureworks_spark.operators.rangejoin import (
    ext_range_join,
    range_join,
    range_join_naive,
)


def _mk_points(spark, rows):
    return spark.createDataFrame(rows, "pid long, k long, p long")


def _mk_intervals(spark, rows):
    return spark.createDataFrame(rows, "iid long, k long, s long, e long")


def _pairs(df):
    return sorted(
        (r["pid"], r["iid_iv"]) for r in df.select("pid", "iid_iv").collect()
    )


@pytest.fixture(scope="module")
def corpus(spark):
    """Randomized corpus: 60 points / 40 intervals over a small axis so
    boundary collisions (p == s, p == e, p == e-1) occur by construction,
    2 keys plus a null key on each side, some empty/backward intervals."""
    import numpy as np

    rng = np.random.default_rng(11)
    pts = [
        (i, int(rng.integers(0, 2)) if rng.random() > 0.1 else None,
         int(rng.integers(0, 50)))
        for i in range(60)
    ] + [(60, 0, None)]  # null axis point
    ivs = []
    for i in range(40):
        s = int(rng.integers(0, 50))
        ln = int(rng.integers(-3, 12))  # negatives → empty/backward
        ivs.append(
            (i, int(rng.integers(0, 2)) if rng.random() > 0.1 else None, s, s + ln)
        )
    ivs.append((40, 1, 10, None))  # null endpoint
    return _mk_points(spark, pts), _mk_intervals(spark, ivs)


@pytest.mark.parametrize("width", [1, 3, 7, 100])
@pytest.mark.parametrize("bounds", ["[)", "[]"])
def test_sharded_equals_naive_keyed(spark, corpus, width, bounds):
    pts, ivs = corpus
    got = range_join(
        pts, ivs, "p", "s", "e", by="k", bounds=bounds, shard_width=width
    )
    want = range_join_naive(pts, ivs, "p", "s", "e", by="k", bounds=bounds)
    assert _pairs(got) == _pairs(want)
    assert _pairs(got)  # non-vacuous


@pytest.mark.parametrize("width", [1, 5, "auto"])
def test_sharded_equals_naive_global(spark, corpus, width):
    # no `by`: the naive plan is a nested-loop; the sharded plan must
    # still produce the identical pair set
    pts, ivs = corpus
    got = range_join(pts, ivs, "p", "s", "e", shard_width=width)
    want = range_join_naive(pts, ivs, "p", "s", "e")
    assert _pairs(got) == _pairs(want)


def test_left_join_keeps_uncovered_points(spark, corpus):
    pts, ivs = corpus
    got = range_join(pts, ivs, "p", "s", "e", by="k", how="left", shard_width=5)
    want = range_join_naive(pts, ivs, "p", "s", "e", by="k", how="left")
    key = lambda df: sorted(
        (r["pid"], r["iid_iv"]) for r in df.select("pid", "iid_iv").collect()
    )
    assert key(got) == key(want)
    # every point survives at least once, including null-key/null-axis ones
    assert got.select("pid").distinct().count() == pts.count()


def test_brute_force_oracle(spark, corpus):
    # independent of Spark's join machinery: pure-python containment
    pts, ivs = corpus
    prows = pts.collect()
    irows = ivs.collect()
    want = sorted(
        (p["pid"], i["iid"])
        for p in prows
        for i in irows
        if p["k"] is not None
        and i["k"] is not None
        and p["k"] == i["k"]
        and p["p"] is not None
        and i["s"] is not None
        and i["e"] is not None
        and i["s"] <= p["p"] < i["e"]
    )
    got = range_join(pts, ivs, "p", "s", "e", by="k", shard_width=4)
    assert _pairs(got) == want


def test_exact_boundaries_half_open_vs_inclusive(spark):
    pts = _mk_points(spark, [(1, 0, 10), (2, 0, 19), (3, 0, 20), (4, 0, 9)])
    ivs = _mk_intervals(spark, [(7, 0, 10, 20)])
    half = _pairs(range_join(pts, ivs, "p", "s", "e", by="k", shard_width=3))
    incl = _pairs(
        range_join(pts, ivs, "p", "s", "e", by="k", bounds="[]", shard_width=3)
    )
    assert half == [(1, 7), (2, 7)]  # p=20 excluded, p=9 below
    assert incl == [(1, 7), (2, 7), (3, 7)]  # [] admits p == e


def test_degenerate_and_empty_intervals(spark):
    # [s, s) is empty; [s, s] contains exactly p == s; e < s matches nothing
    pts = _mk_points(spark, [(1, 0, 5)])
    ivs = _mk_intervals(spark, [(1, 0, 5, 5), (2, 0, 5, 4)])
    assert _pairs(range_join(pts, ivs, "p", "s", "e", by="k", shard_width=2)) == []
    assert _pairs(
        range_join(pts, ivs, "p", "s", "e", by="k", bounds="[]", shard_width=2)
    ) == [(1, 1)]


def test_timestamp_axis_and_auto_width(spark):
    t0 = dt.datetime(2024, 5, 1)
    pts = spark.createDataFrame(
        [(i, 0, t0 + dt.timedelta(minutes=37 * i)) for i in range(20)],
        "pid long, k long, p timestamp",
    )
    ivs = spark.createDataFrame(
        [
            (j, 0, t0 + dt.timedelta(hours=2 * j), t0 + dt.timedelta(hours=2 * j + 1))
            for j in range(6)
        ],
        "iid long, k long, s timestamp, e timestamp",
    )
    got = range_join(pts, ivs, "p", "s", "e", by="k", shard_width="auto")
    want = range_join_naive(pts, ivs, "p", "s", "e", by="k")
    assert _pairs(got) == _pairs(want)
    assert _pairs(got)


def test_negative_axis_values(spark):
    # bases spanning zero: `div` truncates toward zero (non-uniform bucket
    # at the origin) — the shard-coverage proof only needs monotone step
    # bucketing, so results must still be exact
    pts = _mk_points(spark, [(i, 0, v) for i, v in enumerate(range(-25, 25, 3))])
    ivs = _mk_intervals(spark, [(1, 0, -20, -5), (2, 0, -3, 4), (3, 0, 5, 21)])
    got = range_join(pts, ivs, "p", "s", "e", by="k", shard_width=7)
    want = range_join_naive(pts, ivs, "p", "s", "e", by="k")
    assert _pairs(got) == _pairs(want)
    assert len(_pairs(got)) > 5


def test_auto_width_ignores_invalid_intervals(spark):
    # ADVICE r7: the auto probe must average only intervals the join keeps
    # — a corpus dominated by backward/NULL-endpoint intervals previously
    # dragged the average toward the max(...,1) clamp, shredding the valid
    # 1000-wide intervals into ~1000 shards each (here that would trip the
    # max_shards_per_interval=16 guard)
    ivs_rows = [(j, 0, j * 10_000, j * 10_000 - 1_000) for j in range(1, 60)]
    ivs_rows += [(100 + j, 0, j * 10_000, j * 10_000 + 1_000) for j in range(3)]
    ivs_rows += [(200, 0, None, 5), (201, 0, 5, None)]
    ivs = _mk_intervals(spark, ivs_rows)
    pts = _mk_points(spark, [(i, 0, j * 10_000 + 500) for i, j in enumerate(range(3))])
    got = range_join(
        pts, ivs, "p", "s", "e", by="k",
        shard_width="auto", max_shards_per_interval=16,
    )
    want = range_join_naive(pts, ivs, "p", "s", "e", by="k")
    assert _pairs(got) == _pairs(want)
    assert len(_pairs(got)) == 3


def test_explosion_guard_fails_loud(spark):
    pts = _mk_points(spark, [(1, 0, 5)])
    ivs = _mk_intervals(spark, [(1, 0, 0, 10_000_000)])
    df = range_join(
        pts, ivs, "p", "s", "e", by="k", shard_width=1, max_shards_per_interval=64
    )
    with pytest.raises(Exception, match="max_shards_per_interval"):
        df.collect()


def test_collision_validation(spark):
    pts = _mk_points(spark, [(1, 0, 5)]).withColumnRenamed("pid", "s_iv")
    ivs = _mk_intervals(spark, [(1, 0, 0, 10)])
    with pytest.raises(ValueError, match="collide"):
        range_join(pts, ivs, "p", "s", "e", by="k")
    with pytest.raises(ValueError, match="axis"):
        range_join(
            _mk_points(spark, [(1, 0, 5)]).withColumn("p", F_str()), ivs, "p", "s", "e"
        )


def F_str():
    from pyspark.sql import functions as F

    return F.lit("not-an-axis")


def test_hot_key_corpus(spark):
    # 80% of points and intervals on ONE key: the sharded plan's join keys
    # are (k, shard) so the hot key divides across shards; results equal
    # the naive plan exactly
    import numpy as np

    rng = np.random.default_rng(5)
    pts = _mk_points(
        spark,
        [
            (i, 0 if rng.random() < 0.8 else int(rng.integers(1, 5)),
             int(rng.integers(0, 2000)))
            for i in range(400)
        ],
    )
    ivs = _mk_intervals(
        spark,
        [
            (j, 0 if rng.random() < 0.8 else int(rng.integers(1, 5)),
             s := int(rng.integers(0, 2000)), s + int(rng.integers(1, 60)))
            for j in range(150)
        ],
    )
    got = range_join(pts, ivs, "p", "s", "e", by="k", shard_width=50)
    want = range_join_naive(pts, ivs, "p", "s", "e", by="k")
    assert _pairs(got) == _pairs(want)


def test_declared_query_matches_naive_twin(spark):
    # the declared plan re-derived with the naive operator — same result
    from pyspark.sql import functions as F

    from etl_airflow_adventureworks_spark.sources import load_table

    ev = load_table(spark, SF_ORACLE, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts_us").alias("purchase_ts_us"),
    )
    win_us = 21600 * 1_000_000
    windows = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_id"),
        F.col("ts_us").alias("win_start_us"),
        (F.col("ts_us") + F.lit(win_us)).alias("win_end_us"),
    )
    want = sorted(
        map(
            tuple,
            range_join_naive(
                purchases, windows, "purchase_ts_us", "win_start_us", "win_end_us",
                by="user_id",
            )
            .select("purchase_id", "error_id_iv")
            .collect(),
        )
    )
    got = sorted(
        map(tuple, ext_range_join(spark, SF_ORACLE).select("purchase_id", "error_id").collect())
    )
    assert got == want
    assert len(got) > 100  # the declared corpus has a real match set


def test_internal_column_collision_raises(spark):
    pts = _mk_points(spark, [(1, 0, 5)]).withColumnRenamed("pid", "__shard")
    ivs = _mk_intervals(spark, [(1, 0, 0, 10)])
    with pytest.raises(ValueError, match="internal"):
        range_join(pts, ivs, "p", "s", "e", by="k", shard_width=2)
    with pytest.raises(ValueError, match="internal"):
        range_join_naive(
            _mk_points(spark, [(1, 0, 5)]),
            ivs.withColumnRenamed("iid", "__e_b"),
            "p", "s", "e", by="k",
        )


# ---------------------------------------------------------------------------
# interval_join (VERDICT r7 #3): interval x interval overlap, both sides
# exploded, dedup-free meeting rule.
# ---------------------------------------------------------------------------

from etl_airflow_adventureworks_spark.operators.rangejoin import (  # noqa: E402
    interval_join,
    interval_join_naive,
)


def _mk_left_iv(spark, rows):
    return spark.createDataFrame(rows, "lid long, k long, ls long, le long")


def _mk_right_iv(spark, rows):
    return spark.createDataFrame(rows, "rid long, k long, rs long, re long")


def _iv_pairs(df):
    return sorted(
        (r["lid"], r["rid_iv"])
        for r in df.select("lid", "rid_iv").collect()
        if r["rid_iv"] is not None
    )


@pytest.fixture(scope="module")
def iv_corpus(spark):
    """Randomized two-interval-table corpus: small axis for boundary
    collisions (touching spans, contained spans, identical spans), 2 keys
    plus NULL keys, empty/backward intervals and NULL endpoints on both
    sides, negative axis values."""
    import numpy as np

    rng = np.random.default_rng(17)

    def mk(n, id0=0):
        rows = []
        for i in range(n):
            s = int(rng.integers(-20, 40))
            ln = int(rng.integers(-3, 15))  # negatives → empty/backward
            k = int(rng.integers(0, 2)) if rng.random() > 0.1 else None
            rows.append((id0 + i, k, s, s + ln))
        rows.append((id0 + n, 0, 5, None))  # null endpoint
        rows.append((id0 + n + 1, 1, None, 9))
        return rows
    return mk(50), mk(45, 1000)


def _brute_overlap(lrows, rrows, bounds, keyed=True):
    out = []
    for lid, lk, ls, le in lrows:
        for rid, rk, rs, re in rrows:
            if None in (ls, le, rs, re):
                continue
            if keyed and (lk is None or rk is None or lk != rk):
                continue
            if bounds == "[)":
                # empty/backward spans have an empty point set → no overlap
                if ls < le and rs < re and ls < re and rs < le:
                    out.append((lid, rid))
            else:
                if ls <= le and rs <= re and ls <= re and rs <= le:
                    out.append((lid, rid))
    return sorted(out)


@pytest.mark.parametrize("width", [1, 4, 9, 1000, "auto"])
@pytest.mark.parametrize("bounds", ["[)", "[]"])
def test_interval_join_matches_naive_and_brute(spark, iv_corpus, width, bounds):
    lrows, rrows = iv_corpus
    left, right = _mk_left_iv(spark, lrows), _mk_right_iv(spark, rrows)
    got = interval_join(
        left, right, "ls", "le", "rs", "re", by="k",
        bounds=bounds, shard_width=width,
    )
    rows = got.collect()
    pairs = sorted((r["lid"], r["rid_iv"]) for r in rows)
    # dedup-free meeting rule: every true pair appears EXACTLY once
    assert len(pairs) == len(set(pairs))
    want_naive = _iv_pairs(
        interval_join_naive(left, right, "ls", "le", "rs", "re", by="k", bounds=bounds)
    )
    want_brute = _brute_overlap(lrows, rrows, bounds)
    assert pairs == want_naive == want_brute, (width, bounds)
    assert len(pairs) > 20  # the corpus must actually exercise overlaps


def test_interval_join_global_no_key(spark, iv_corpus):
    lrows, rrows = iv_corpus
    left, right = _mk_left_iv(spark, lrows[:12]), _mk_right_iv(spark, rrows[:12])
    got = _iv_pairs(
        interval_join(left, right, "ls", "le", "rs", "re", shard_width=5)
    )
    want = _brute_overlap(lrows[:12], rrows[:12], "[)", keyed=False)
    assert got == want and got


def test_interval_join_left_how_needs_id_and_works(spark, iv_corpus):
    lrows, rrows = iv_corpus
    left, right = _mk_left_iv(spark, lrows), _mk_right_iv(spark, rrows)
    with pytest.raises(ValueError, match="left_id"):
        interval_join(left, right, "ls", "le", "rs", "re", by="k", how="left")
    got = interval_join(
        left, right, "ls", "le", "rs", "re", by="k",
        how="left", left_id="lid", shard_width=4,
    ).collect()
    want = interval_join_naive(
        left, right, "ls", "le", "rs", "re", by="k", how="left"
    ).collect()
    key = lambda r: (r["lid"], r["rid_iv"] if r["rid_iv"] is not None else -1)
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    # every left row survives at least once (unmatched → one null row)
    assert {r["lid"] for r in got} == {r[0] for r in lrows}
    unmatched = [r for r in got if r["rid_iv"] is None]
    assert unmatched  # corpus has overlap-less lefts (empty/null spans)


def test_interval_join_touching_spans_bounds_semantics(spark):
    # [0,10) and [10,20): touch but don't overlap half-open; DO meet under []
    left = _mk_left_iv(spark, [(1, 0, 0, 10)])
    right = _mk_right_iv(spark, [(2, 0, 10, 20)])
    for width in (3, 100):
        assert _iv_pairs(
            interval_join(left, right, "ls", "le", "rs", "re", by="k",
                          bounds="[)", shard_width=width)
        ) == []
        assert _iv_pairs(
            interval_join(left, right, "ls", "le", "rs", "re", by="k",
                          bounds="[]", shard_width=width)
        ) == [(1, 2)]


def test_interval_join_explosion_guard(spark):
    left = _mk_left_iv(spark, [(1, 0, 0, 10_000_000)])
    right = _mk_right_iv(spark, [(2, 0, 5, 6)])
    df = interval_join(
        left, right, "ls", "le", "rs", "re", by="k",
        shard_width=1, max_shards_per_interval=64,
    )
    with pytest.raises(Exception, match="max_shards_per_interval"):
        df.collect()


def test_interval_join_auto_width_ignores_invalid(spark):
    # same probe rule as range_join: backward/NULL intervals don't drag the
    # average into shredding valid ones (guard tripped at 16 shards if so)
    lrows = [(j, 0, j * 1_000, j * 1_000 - 900) for j in range(1, 50)]
    lrows += [(100 + j, 0, j * 1_000, j * 1_000 + 900) for j in range(3)]
    rrows = [(200 + j, 0, j * 1_000 + 100, j * 1_000 + 200) for j in range(3)]
    left, right = _mk_left_iv(spark, lrows), _mk_right_iv(spark, rrows)
    got = _iv_pairs(
        interval_join(left, right, "ls", "le", "rs", "re", by="k",
                      shard_width="auto", max_shards_per_interval=16)
    )
    assert got == _brute_overlap(lrows, rrows, "[)")
    assert len(got) == 3


def test_interval_join_hot_key(spark):
    """One key owns most intervals on both sides — the regime where the
    naive plan's same-key residual goes quadratic; results must agree."""
    import numpy as np

    rng = np.random.default_rng(29)
    n = 800

    def mk(id0):
        ks = np.where(rng.random(n) < 0.7, 0, rng.integers(1, 10, n))
        ss = rng.integers(0, 100_000, n)
        ln = rng.integers(20, 300, n)
        return [
            (id0 + i, int(k), int(s), int(s + l))
            for i, (k, s, l) in enumerate(zip(ks.tolist(), ss.tolist(), ln.tolist()))
        ]
    lrows, rrows = mk(0), mk(10_000)
    left, right = _mk_left_iv(spark, lrows), _mk_right_iv(spark, rrows)
    got = _iv_pairs(
        interval_join(left, right, "ls", "le", "rs", "re", by="k", shard_width=60)
    )
    want = _iv_pairs(
        interval_join_naive(left, right, "ls", "le", "rs", "re", by="k")
    )
    assert got == want and len(got) > 100


def test_interval_join_plan_catalyst_only(spark, iv_corpus):
    lrows, rrows = iv_corpus
    left, right = _mk_left_iv(spark, lrows), _mk_right_iv(spark, rrows)
    df = interval_join(left, right, "ls", "le", "rs", "re", by="k", shard_width=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for bad in ("BatchEvalPython", "ArrowEvalPython", "BroadcastNestedLoopJoin",
                "CartesianProduct"):
        assert bad not in plan, bad


def test_interval_join_validation(spark):
    left = _mk_left_iv(spark, [(1, 0, 0, 10)])
    right = _mk_right_iv(spark, [(2, 0, 5, 6)])
    with pytest.raises(ValueError, match="how"):
        interval_join(left, right, "ls", "le", "rs", "re", how="outer")
    with pytest.raises(ValueError, match="bounds"):
        interval_join(left, right, "ls", "le", "rs", "re", bounds="()")
    with pytest.raises(ValueError, match="left_id"):
        interval_join(left, right, "ls", "le", "rs", "re", how="left",
                      left_id="nope")
