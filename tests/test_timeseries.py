"""Gap-filled dense time series (`operators/timeseries.py`): DuckDB grid
parity for the locf/zero/null fills, pandas `interpolate` parity for
linear, the fail-loud guards, and the python-free plan pin. Values chosen
for cross-engine exactness: counts are longs, the carried double is
`min(value)` (order-independent), and locf/zero copy stored values without
arithmetic, so those compares are bit-exact; linear does real float math,
compared at 1e-9."""

from __future__ import annotations

import duckdb
import pytest

from conftest import SF_SMOKE

from pyspark.sql import functions as F

from etl_airflow_adventureworks_spark.operators.timeseries import (
    bucketize,
    cohort_retention,
    gapfill,
)
from etl_airflow_adventureworks_spark.sources import load_table

STEP = 6 * 3600  # 6 h buckets: real gaps, bounded grid


def _series(spark, max_user=40):
    ev = load_table(spark, SF_SMOKE, "events").filter(f"user_id < {max_user}")
    return bucketize(ev, "ts", STEP).groupBy("user_id", "bucket_ts").agg(
        F.count(F.lit(1)).alias("n"), F.min("value").alias("mv")
    )


def _oracle(fill_select: str, max_user=40) -> "object":
    return duckdb.sql(f"""
        WITH e AS (
          SELECT user_id,
                 (CAST(floor(epoch(ts)) AS BIGINT) // {STEP}) * {STEP} AS b,
                 count(*) AS n, min(value) AS mv
          FROM read_parquet('{SF_SMOKE}/events.parquet')
          WHERE user_id < {max_user} GROUP BY 1, 2),
        bounds AS (SELECT user_id, min(b) lo, max(b) hi FROM e GROUP BY 1),
        grid AS (SELECT user_id, unnest(generate_series(lo, hi, {STEP})) AS b
                 FROM bounds),
        j AS (SELECT g.user_id, g.b, e.n, e.mv
              FROM grid g LEFT JOIN e USING (user_id, b))
        SELECT user_id, b, {fill_select} FROM j
        WINDOW w AS (PARTITION BY user_id ORDER BY b
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY user_id, b
    """).df()


def _collect(df):
    return (
        df.orderBy("user_id", "bucket_ts")
        .toPandas()
        .reset_index(drop=True)
    )


def test_gapfill_locf_matches_duckdb(spark):
    got = _collect(
        gapfill(_series(spark), ["user_id"], "bucket_ts", STEP, ["n", "mv"],
                fill="locf")
    )
    want = _oracle(
        "last_value(n IGNORE NULLS) OVER w AS n, "
        "last_value(mv IGNORE NULLS) OVER w AS mv"
    )
    assert len(got) > 0
    assert list(got["user_id"]) == list(want["user_id"])
    assert list(got["bucket_ts"]) == list(want["b"])
    # pandas holds gaps as NaN floats; compare with NaN-aware equality
    import pandas as pd

    pd.testing.assert_series_equal(got["n"].astype("float64"),
                                   want["n"].astype("float64"),
                                   check_names=False)
    pd.testing.assert_series_equal(got["mv"], want["mv"], check_names=False)
    # gaps really exist and locf really fills: the dense grid is strictly
    # larger than the sparse series, and only LEADING buckets stay null
    sparse = _series(spark).count()
    assert len(got) > sparse
    lead_null = got[got["n"].isna()]
    firsts = got.groupby("user_id")["bucket_ts"].min()
    assert all(r["bucket_ts"] == firsts[r["user_id"]]
               for _, r in lead_null.iterrows())


def test_gapfill_zero_and_null_fills(spark):
    s = _series(spark)
    dense_null = _collect(
        gapfill(s, ["user_id"], "bucket_ts", STEP, ["n", "mv"], fill="null")
    )
    want = _oracle("n, mv")
    assert len(dense_null) == len(want)
    import pandas as pd

    pd.testing.assert_series_equal(dense_null["n"].astype("float64"),
                                   want["n"].astype("float64"),
                                   check_names=False)

    dense_zero = _collect(
        gapfill(s, ["user_id"], "bucket_ts", STEP, ["n"], fill="zero")
    )
    assert dense_zero["n"].isna().sum() == 0
    assert (dense_zero["n"] == 0).sum() == int(dense_null["n"].isna().sum())
    # observed rows untouched, and zero-fill preserves the column's type
    assert int(dense_zero["n"].sum()) == int(dense_null["n"].sum())
    assert dict(
        gapfill(s, ["user_id"], "bucket_ts", STEP, ["n"], fill="zero").dtypes
    )["n"] == "bigint"

    const = _collect(
        gapfill(s, ["user_id"], "bucket_ts", STEP, ["n"], fill="const",
                fill_value=-1)
    )
    assert (const["n"] == -1).sum() == int(dense_null["n"].isna().sum())


def test_gapfill_linear_matches_pandas_interpolate(spark):
    got = _collect(
        gapfill(_series(spark), ["user_id"], "bucket_ts", STEP, ["mv"],
                fill="linear")
    )
    import numpy as np

    sparse_pd = _series(spark).toPandas()
    assert len(got) > len(sparse_pd)  # gaps really got filled
    for uid, g in got.groupby("user_id"):
        g = g.sort_values("bucket_ts").set_index("bucket_ts")
        # rebuild the sparse observations pandas-side and interpolate on
        # the bucket axis; edges beyond first/last observation stay NaN
        obs = sparse_pd[sparse_pd["user_id"] == uid].set_index("bucket_ts")
        want = (
            obs["mv"].reindex(g.index)
            .interpolate(method="index", limit_area="inside")
        )
        assert np.allclose(g["mv"].fillna(np.inf), want.fillna(np.inf),
                           rtol=0, atol=1e-9), f"user {uid}"


def test_gapfill_window_start_end_and_guards(spark):
    s = _series(spark, max_user=10)
    lo, hi = s.agg(F.min("bucket_ts"), F.max("bucket_ts")).first()
    start = (lo // STEP) * STEP
    end = start + 9 * STEP
    dense = gapfill(s, ["user_id"], "bucket_ts", STEP, ["n"], fill="zero",
                    start=start, end=end)
    n_keys = s.select("user_id").distinct().count()
    assert dense.count() == n_keys * 10  # shared global grid

    with pytest.raises(ValueError, match="unknown fill"):
        gapfill(s, ["user_id"], "bucket_ts", STEP, ["n"], fill="nearest")
    with pytest.raises(ValueError, match="no such column"):
        gapfill(s, ["user_id"], "bucket_ts", STEP, ["nope"])
    with pytest.raises(ValueError, match="step-aligned"):
        gapfill(s, ["user_id"], "bucket_ts", STEP, ["n"], start=start + 1,
                end=end)
    # a misaligned END fails loud too (r9: it used to silently truncate
    # the grid at the last aligned bucket below it)
    with pytest.raises(ValueError, match="end must be step-aligned"):
        gapfill(s, ["user_id"], "bucket_ts", STEP, ["n"], start=start,
                end=end + 1)
    with pytest.raises(ValueError, match="reserved"):
        gapfill(s.withColumn("__prev", F.lit(1)), ["user_id"], "bucket_ts",
                STEP, ["n"])
    with pytest.raises(ValueError, match="positive"):
        gapfill(s, ["user_id"], "bucket_ts", 0, ["n"])

    # runtime guards fail loud inside the bounds aggregate
    with pytest.raises(Exception, match="duplicate"):
        gapfill(s.unionAll(s.limit(1)), ["user_id"], "bucket_ts", STEP,
                ["n"]).count()
    with pytest.raises(Exception, match="not aligned"):
        gapfill(s.withColumn("bucket_ts", F.col("bucket_ts") + 1),
                ["user_id"], "bucket_ts", STEP, ["n"]).count()
    with pytest.raises(Exception, match="buckets"):
        gapfill(s, ["user_id"], "bucket_ts", STEP, ["n"],
                max_buckets_per_key=3).count()


def test_gapfill_plan_is_python_free(spark):
    plan = gapfill(_series(spark), ["user_id"], "bucket_ts", STEP,
                   ["n", "mv"], fill="linear")._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Cartesian" not in plan
    assert "Generate explode" in plan  # the JVM-side grid


def test_cohort_retention_matches_duckdb(spark):
    """r8: the retention triangle equals an independent DuckDB build —
    counts exact, ratios IEEE-identical (same integer operands)."""
    got = cohort_retention(
        load_table(spark, SF_SMOKE, "events"), "user_id", "ts", STEP
    ).toPandas()
    want = duckdb.sql(f"""
        WITH a AS (SELECT DISTINCT user_id,
                   (CAST(floor(epoch(ts)) AS BIGINT) // {STEP}) * {STEP} AS b
                   FROM read_parquet('{SF_SMOKE}/events.parquet')),
        f AS (SELECT user_id, min(b) AS c FROM a GROUP BY 1),
        g AS (SELECT f.c AS cohort_ts, (a.b - f.c) // {STEP} AS "offset",
                     count(*) AS n_active
              FROM a JOIN f USING (user_id) GROUP BY 1, 2)
        SELECT cohort_ts, "offset", n_active,
               n_active / (max(CASE WHEN "offset" = 0 THEN n_active END)
                           OVER (PARTITION BY cohort_ts)) AS retention
        FROM g ORDER BY cohort_ts, "offset"
    """).df()
    assert len(got) == len(want) > 0
    assert list(got["cohort_ts"]) == list(want["cohort_ts"])
    assert list(got["offset"]) == list(want["offset"])
    assert list(got["n_active"]) == list(want["n_active"])
    assert list(got["retention"]) == list(want["retention"])  # bit-exact
    # structural invariants: offset 0 is the full cohort; max_offset trims
    z = got[got["offset"] == 0]
    assert (z["retention"] == 1.0).all()
    assert int(z["n_active"].sum()) == (
        load_table(spark, SF_SMOKE, "events").select("user_id").distinct().count()
    )
    trimmed = cohort_retention(
        load_table(spark, SF_SMOKE, "events"), "user_id", "ts", STEP,
        max_offset=2,
    ).toPandas()
    assert trimmed["offset"].max() <= 2
    with pytest.raises(ValueError, match="positive"):
        cohort_retention(load_table(spark, SF_SMOKE, "events"), "user_id",
                         "ts", 0)


def test_rolling_agg_matches_duckdb_range_frame(spark):
    """r8: value-RANGE moving aggregates == DuckDB's RANGE frame exactly
    (exact types only: counts, min/max copies, integer sums — the
    cross-engine float-sum caveat is documented on the operator)."""
    from etl_airflow_adventureworks_spark.operators.timeseries import (
        rolling_agg,
    )

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .selectExpr("user_id", "event_id",
                    "unix_micros(ts) AS us",
                    "CAST(floor(value * 1000) AS BIGINT) AS v_mil")
    )
    hour_us = 3600 * 1_000_000
    got = (
        rolling_agg(
            ev, ["user_id"], "us",
            {"n_1h": ("count", "event_id"), "sum_1h": ("sum", "v_mil"),
             "min_1h": ("min", "v_mil"), "max_1h": ("max", "v_mil")},
            preceding=hour_us,
        )
        .orderBy("user_id", "us", "event_id")
        .collect()
    )
    want = duckdb.sql(f"""
        WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
                          CAST(floor(value * 1000) AS BIGINT) AS v_mil
                   FROM read_parquet('{SF_SMOKE}/events.parquet'))
        SELECT user_id, event_id, us, v_mil,
               count(event_id) OVER w AS n_1h,
               sum(v_mil) OVER w AS sum_1h,
               min(v_mil) OVER w AS min_1h,
               max(v_mil) OVER w AS max_1h
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY us
                     RANGE BETWEEN {hour_us} PRECEDING AND CURRENT ROW)
        ORDER BY user_id, us, event_id
    """).fetchall()
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert (g["user_id"], g["event_id"], g["n_1h"], g["sum_1h"],
                g["min_1h"], g["max_1h"]) == (w[0], w[1], w[4], w[5], w[6], w[7])

    # centered frame parity (preceding + following)
    from etl_airflow_adventureworks_spark.operators.timeseries import (
        rolling_agg as ra,
    )

    got_c = (
        ra(ev, ["user_id"], "us", {"n_c": ("count", "event_id")},
           preceding=hour_us, following=hour_us)
        .orderBy("user_id", "us", "event_id")
        .collect()
    )
    want_c = duckdb.sql(f"""
        WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us
                   FROM read_parquet('{SF_SMOKE}/events.parquet'))
        SELECT count(event_id) OVER (PARTITION BY user_id ORDER BY us
               RANGE BETWEEN {hour_us} PRECEDING AND {hour_us} FOLLOWING)
        FROM e ORDER BY user_id, us, event_id
    """).fetchall()
    assert [g["n_c"] for g in got_c] == [w[0] for w in want_c]

    with pytest.raises(ValueError, match="fn must be"):
        ra(ev, ["user_id"], "us", {"x": ("median", "v_mil")}, 10)
    with pytest.raises(ValueError, match=">= 0"):
        ra(ev, ["user_id"], "us", {"x": ("count", "v_mil")}, -5)
