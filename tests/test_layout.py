"""Z-order layout (`operators/layout.py`): multi-dimension file
skipping that a linear sort cannot give, proven on the real events
table via per-file min/max stats — the same rule parquet footer pruning
and manifest skip-scans apply."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_airflow_adventureworks_spark.operators import layout as L

SF = "/root/testdata/sf0.01"
NFILES = 64


def _events(spark):
    return (
        spark.read.parquet(f"{SF}/events.parquet")
        .withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
        .select("event_id", "user_id", "ts_us", "value")
    )


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("layouts")
    ev = _events(spark)
    zpath = str(base / "zorder")
    lpath = str(base / "linear")
    L.write_zordered(ev, zpath, ["user_id", "ts_us"], num_files=NFILES)
    # the incumbent: linear sort by the leading column
    (
        ev.repartitionByRange(NFILES, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    lo, hi = ev.agg(F.min("ts_us"), F.max("ts_us")).first()
    return ev, zpath, lpath, (lo, hi)


def test_zorder_write_preserves_rows(spark, layouts):
    ev, zpath, _, _ = layouts
    back = spark.read.parquet(zpath)
    assert back.count() == ev.count()
    chk = "bit_xor(xxhash64(event_id, user_id, ts_us, value))"
    assert ev.selectExpr(chk).first() == back.selectExpr(chk).first()


def test_zorder_prunes_both_dimensions(spark, layouts):
    ev, zpath, lpath, (lo, hi) = layouts
    zstats = L.file_stats(spark, zpath, ["user_id", "ts_us"]).cache()
    lstats = L.file_stats(spark, lpath, ["user_id", "ts_us"]).cache()
    assert zstats.count() == NFILES and lstats.count() == NFILES

    span = hi - lo
    ts_box = {"ts_us": (lo + int(0.45 * span), lo + int(0.55 * span))}
    user_box = {"user_id": (10, 19)}
    both = {**ts_box, **user_box}

    # the linear-by-user layout answers user queries well but must open
    # EVERY file for a pure time-range query (measured: 64/64)
    assert L.files_overlapping(lstats, user_box) <= NFILES // 8
    assert L.files_overlapping(lstats, ts_box) >= int(0.95 * NFILES)

    # the z-ordered layout bounds BOTH dimensions (measured on this
    # corpus: ts 21/64, user 18/64, combined 6/64 — vs 64/64 for the
    # linear layout's non-leading column). Thresholds leave margin for
    # range-partitioner sampling jitter while still pinning the ~3x /
    # ~10x pruning the curve buys
    z_ts = L.files_overlapping(zstats, ts_box)
    z_user = L.files_overlapping(zstats, user_box)
    z_both = L.files_overlapping(zstats, both)
    assert z_ts <= int(0.4 * NFILES), z_ts
    assert z_user <= int(0.4 * NFILES), z_user
    assert z_both <= NFILES // 8, z_both
    assert z_both <= min(z_ts, z_user)


def test_zorder_filter_still_pushes_down(spark, layouts):
    _, zpath, _, (lo, hi) = layouts
    q = spark.read.parquet(zpath).filter(
        (F.col("user_id") >= 10) & (F.col("user_id") <= 19)
        & (F.col("ts_us") >= lo) & (F.col("ts_us") <= hi)
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(user_id,10)" in plan


def test_minmax_mode_and_guards(spark):
    ev = _events(spark).limit(1000)
    key = L.zorder_key(ev, ["user_id", "ts_us"], bits=4, mode="minmax")
    vals = ev.select(key.alias("z")).agg(F.min("z"), F.max("z")).first()
    assert 0 <= vals[0] <= vals[1] < (1 << 8)
    with pytest.raises(ValueError, match="2-4 columns"):
        L.zorder_key(ev, ["user_id"])
    with pytest.raises(ValueError, match="<= 48"):
        L.zorder_key(ev, ["user_id", "ts_us", "value"], bits=17)
    with pytest.raises(ValueError, match="minmax|quantile"):
        L.zorder_key(ev, ["user_id", "ts_us"], mode="nope")


def test_pruning_is_sound_for_random_boxes(spark, layouts):
    """Skipping never loses rows: for seeded random boxes, every row
    inside the box lives in a file whose min/max stats overlap the box —
    so a stats-pruned scan returns exactly the filter's rows."""
    import random

    _, zpath, _, (lo, hi) = layouts
    rng = random.Random(7)
    df = spark.read.parquet(zpath).withColumn("_file", F.input_file_name())
    stats = L.file_stats(spark, zpath, ["user_id", "ts_us"]).cache()
    for _ in range(8):
        u0 = rng.randint(0, 140)
        t0 = lo + rng.randint(0, (hi - lo) * 3 // 4)
        box = {"user_id": (u0, u0 + rng.randint(1, 30)),
               "ts_us": (t0, t0 + (hi - lo) // rng.choice([4, 8, 16]))}
        cond = (
            (F.col("user_id") >= box["user_id"][0])
            & (F.col("user_id") <= box["user_id"][1])
            & (F.col("ts_us") >= box["ts_us"][0])
            & (F.col("ts_us") <= box["ts_us"][1])
        )
        keep = {
            r["file"] for r in stats.filter(
                (F.col("max_user_id") >= box["user_id"][0])
                & (F.col("min_user_id") <= box["user_id"][1])
                & (F.col("max_ts_us") >= box["ts_us"][0])
                & (F.col("min_ts_us") <= box["ts_us"][1])
            ).collect()
        }
        rows = df.filter(cond).select("_file").collect()
        assert all(r["_file"] in keep for r in rows), box


def test_compact_with_zorder_reclusters(spark, tmp_path):
    """OPTIMIZE-with-ZORDER path: compaction into z-ordered files keeps
    every row and leaves each file tightly bounded on both columns."""
    from etl_airflow_adventureworks_spark.sinks import compact_table

    ev = _events(spark)
    out = str(tmp_path / "tbl")
    ev.repartition(40).write.parquet(out)  # the small-files mess
    n = compact_table(spark, out, target_file_bytes=32 * 1024,
                      zorder=["user_id", "ts_us"])
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    chk = "bit_xor(xxhash64(event_id, user_id, ts_us, value))"
    assert ev.selectExpr(chk).first() == back.selectExpr(chk).first()
    stats = L.file_stats(spark, out, ["user_id", "ts_us"])
    nf = stats.count()
    assert nf == n > 4
    lo, hi = ev.agg(F.min("ts_us"), F.max("ts_us")).first()
    span = hi - lo
    box = {"user_id": (10, 19), "ts_us": (lo + int(0.45 * span),
                                          lo + int(0.55 * span))}
    # with only ~8 files each box is coarse — the strong pruning ratios
    # are pinned by the 64-file test above; here: the combined box must
    # skip at least half the files
    assert L.files_overlapping(stats, box) <= nf // 2


def test_three_column_stride(spark):
    ev = _events(spark).limit(2000)
    key = L.zorder_key(ev, ["user_id", "ts_us", "value"], bits=4)
    stats = ev.select(key.alias("z")).agg(
        F.min("z"), F.max("z"), F.count_distinct("z")
    ).first()
    assert 0 <= stats[0] <= stats[1] < (1 << 12)
    assert stats[2] > 16  # the key really mixes all three dimensions


def test_bits_over_16_fail_loud(spark):
    ev = _events(spark).limit(100)
    with pytest.raises(ValueError, match="bits must be <= 16"):
        L.zorder_key(ev, ["user_id", "ts_us"], bits=24)


def test_zorder_over_timestamp_column(spark, tmp_path):
    """r13: temporal columns are stats-eligible, so a Z-order over
    (ts, user) both computes (epoch-ranked, monotone) and records
    prunable per-file stats through optimize(zorder=...); a time-boxed
    read_where then skips files."""
    import datetime as dt

    from etl_airflow_adventureworks_spark.table import VersionedTable

    rows = [
        (dt.datetime(2024, 3, 1 + d, h, 0), (d * 24 + h) % 50,
         float(d * 24 + h))
        for d in range(20) for h in range(24)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, user long, v double")
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(df)
    t.optimize(zorder=["ts", "user"], num_files=8)
    man = t.manifest()
    assert all("ts" in ent for ent in man["stats"].values())
    box = {"ts": (dt.datetime(2024, 3, 5, 0, 0),
                  dt.datetime(2024, 3, 6, 23, 0)),
           "user": (10, 20)}
    sub = t.read_where(box)
    want = df.filter(
        (F.col("ts").between(*box["ts"])) & (F.col("user").between(10, 20))
    )
    assert sub.count() == want.count() > 0
    assert len(sub.inputFiles()) < 8
