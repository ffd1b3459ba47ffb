"""Incremental rollup refresh (`operators/rollup.py`): exactness vs a
from-scratch aggregate after every refresh, delta-only reads, token
self-description, and the rewrite fail-loud path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_airflow_adventureworks_spark.operators.rollup import refresh_rollup
from etl_airflow_adventureworks_spark.table import VersionedTable

DIMS = ["event_type", "date_trunc('hour', ts) AS hour"]
MEASURES = {
    "n_events": ("count", None),
    "sum_value": ("sum", "value"),
    "max_value": ("max", "value"),
    "min_ts": ("min", "ts"),
}


def _events_slices(spark, n=3):
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("event_id", "ts", "event_type", "value")
    )
    return ev, [ev.filter(f"event_id % {n} = {i}") for i in range(n)]


def _snap(df):
    """Set snapshot; doubles rounded to 9 dp — incremental double-SUM is
    exact up to reassociation (see the operator docstring), and the test
    data's float values sum well inside 9 dp. The stored rollup's hidden
    ``__nn_*`` non-null counters (r11) are bookkeeping, not results —
    dropped before comparing against plain aggregates."""
    df = df.drop(*[c for c in df.columns if c.startswith("__nn_")])
    rows = df.collect()
    out = set()
    for r in rows:
        vals = []
        for c in df.columns:
            v = r[c]
            vals.append(str(round(v, 9)) if isinstance(v, float) else str(v))
        out.add(tuple(vals))
    return out


def _full_agg(df):
    return df.groupBy(*[F.expr(d) for d in DIMS]).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.max("value").alias("max_value"),
        F.min("ts").alias("min_ts"),
    )


def test_refresh_is_exact_and_reads_only_the_delta(spark, tmp_path):
    ev, slices = _events_slices(spark)
    src = VersionedTable(spark, str(tmp_path / "src"))
    roll_path = str(tmp_path / "roll")
    args = (spark, str(tmp_path / "src"), roll_path, DIMS, MEASURES)

    src.commit(slices[0])                         # v1: bootstrap
    v = refresh_rollup(*args)
    assert _snap(VersionedTable(spark, roll_path).read()) == _snap(
        _full_agg(slices[0])
    )

    # append, refresh: exact vs scratch, and the delta scan touches only
    # the new commit's files
    src.commit(slices[1], mode="append")          # v2
    n_v1_files = len(src.manifest(1)["files"])
    delta = src.changes(1)
    assert len(delta.inputFiles()) == len(src.manifest(2)["files"]) - n_v1_files
    v2 = refresh_rollup(*args)
    assert v2 > v
    two = slices[0].unionByName(slices[1])
    assert _snap(VersionedTable(spark, roll_path).read()) == _snap(_full_agg(two))

    # refreshing while already current is a version-stable no-op
    assert refresh_rollup(*args) == v2
    assert VersionedTable(spark, roll_path).manifest()["version"] == v2

    # third slice: still exact (merge of merge)
    src.commit(slices[2], mode="append")          # v3
    refresh_rollup(*args)
    assert _snap(VersionedTable(spark, roll_path).read()) == _snap(_full_agg(ev))


def test_refresh_fails_loud_across_rewrite_and_rebuilds(spark, tmp_path):
    ev, slices = _events_slices(spark)
    src = VersionedTable(spark, str(tmp_path / "src"))
    roll_path = str(tmp_path / "roll")
    args = (spark, str(tmp_path / "src"), roll_path, DIMS, MEASURES)

    src.commit(slices[0])
    refresh_rollup(*args)
    src.commit(slices[0].unionByName(slices[1]))  # OVERWRITE: history rewritten
    with pytest.raises(ValueError, match="replaced files"):
        refresh_rollup(*args)
    v = refresh_rollup(*args, full_rebuild=True)
    got = VersionedTable(spark, roll_path).read()
    assert _snap(got) == _snap(_full_agg(slices[0].unionByName(slices[1])))
    # and incremental service resumes after the rebuild
    src.commit(slices[2], mode="append")
    assert refresh_rollup(*args) > v
    assert _snap(VersionedTable(spark, roll_path).read()) == _snap(_full_agg(ev))


def test_refresh_rollup_subcommand(spark, tmp_path, capsys):
    import json

    from etl_airflow_adventureworks_spark.cli import main

    ev, slices = _events_slices(spark)
    src = VersionedTable(spark, str(tmp_path / "src"))
    src.commit(slices[0])
    spec = {"dims": DIMS,
            "measures": {k: [fn, col] for k, (fn, col) in MEASURES.items()}}
    spath = str(tmp_path / "spec.json")
    with open(spath, "w") as fh:
        json.dump(spec, fh)
    args = ["refresh-rollup", "--source", str(tmp_path / "src"),
            "--rollup", str(tmp_path / "roll"), "--spec", spath]
    assert main(args) == 0
    assert "version 1" in capsys.readouterr().out
    src.commit(slices[1], mode="append")
    assert main(args) == 0
    assert "version 2" in capsys.readouterr().out
    got = VersionedTable(spark, str(tmp_path / "roll")).read()
    assert _snap(got) == _snap(_full_agg(slices[0].unionByName(slices[1])))


def test_guards(spark, tmp_path):
    ev, slices = _events_slices(spark)
    src = VersionedTable(spark, str(tmp_path / "src"))
    src.commit(slices[0])
    with pytest.raises(ValueError, match="fn must be one of"):
        refresh_rollup(spark, str(tmp_path / "src"), str(tmp_path / "r"),
                       DIMS, {"x": ("avg", "value")})
    with pytest.raises(FileNotFoundError, match="no committed source"):
        refresh_rollup(spark, str(tmp_path / "nope"), str(tmp_path / "r"),
                       DIMS, MEASURES)
    # refuses to clobber a table it did not create
    other = VersionedTable(spark, str(tmp_path / "other"))
    other.commit(slices[0])
    with pytest.raises(ValueError, match="not a rollup table"):
        refresh_rollup(spark, str(tmp_path / "src"), str(tmp_path / "other"),
                       DIMS, MEASURES)


def test_rollup_composes_with_the_ingest_gate(spark, tmp_path):
    """r8 composition: the near-dup ingest gate's corpus table is an
    append-only history, so a corpus-stats rollup refreshes from it at
    delta cost — and reflects exactly the ACCEPTED documents."""
    from etl_airflow_adventureworks_spark.operators.dedup_incremental import (
        build_neardup_index,
    )
    from etl_airflow_adventureworks_spark.streaming.ingest import (
        ingest_batch_with_dedup,
    )

    def text(i, extra=""):
        base = " ".join(f"r{i}w{j}" for j in range(12))
        return f"{base} {extra}".strip()

    corpus = spark.createDataFrame(
        [(i, text(i)) for i in range(20)], "doc_id long, text string"
    )
    idx, cor, roll = (str(tmp_path / p) for p in ("idx", "cor", "roll"))
    build_neardup_index(spark, corpus, idx)
    VersionedTable(spark, cor).commit(corpus)

    dims = ["doc_id % 2 AS parity"]
    meas = {"n_docs": ("count", None),
            "total_len": ("sum", "length(text)")}
    refresh_rollup(spark, cor, roll, dims, meas)

    # epoch: one dup (rejected), two fresh (accepted)
    batch = spark.createDataFrame(
        [(100, text(7, "zz")), (101, text(101)), (102, text(102))],
        "doc_id long, text string",
    )
    stats = ingest_batch_with_dedup(batch, idx, cor, 1)
    assert stats == {"accepted": 2, "rejected": 1}
    refresh_rollup(spark, cor, roll, dims, meas)

    got = {r["parity"]: (r["n_docs"], r["total_len"])
           for r in VersionedTable(spark, roll).read().collect()}
    want_df = VersionedTable(spark, cor).read().groupBy(
        F.expr("doc_id % 2 AS parity")
    ).agg(F.count(F.lit(1)).alias("n"), F.expr("sum(length(text))").alias("t"))
    want = {r["parity"]: (r["n"], r["t"]) for r in want_df.collect()}
    assert got == want
    assert sum(n for n, _ in got.values()) == 22  # 20 + 2 accepted, not 23


def test_approx_distinct_measure_merges_as_hll_sketches(spark, tmp_path):
    """r8: mergeable COUNT DISTINCT — the rollup stores HLL sketches.
    At this corpus' per-group cardinality (15 users — sketches in exact
    LIST/SET mode) the incremental estimate equals the from-scratch
    estimate bit-for-bit; r9 measured that this equality is
    SCALE-BOUNDED: in estimation mode (thousands of distincts) the
    DataSketches estimate depends on the merge topology (direct
    1-partition build 5977 vs 4-partition 6035 vs 32-partition 6012 on
    the same 6000 distincts), so incremental-vs-scratch agree only
    within the HLL error band there — the contract the docstring and
    tools/measure_rollup_refresh.py state, and what the error-band
    assertion below actually gates."""
    from etl_airflow_adventureworks_spark.operators.rollup import (
        finalize_rollup,
    )

    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("event_id", "ts", "event_type", "user_id")
    )
    slices = [ev.filter(f"event_id % 2 = {i}") for i in range(2)]
    dims = ["event_type"]
    measures = {"n_users": ("approx_distinct", "user_id"),
                "n_events": ("count", None)}
    src = VersionedTable(spark, str(tmp_path / "src"))
    roll_path = str(tmp_path / "roll")

    src.commit(slices[0])
    refresh_rollup(spark, src.path, roll_path, dims, measures)
    src.commit(slices[1], mode="append")
    refresh_rollup(spark, src.path, roll_path, dims, measures)

    roll = VersionedTable(spark, roll_path).read()
    assert dict(roll.dtypes)["n_users"] == "binary"  # mergeable state
    got = {
        r["event_type"]: (r["n_users"], r["n_events"])
        for r in finalize_rollup(roll, measures).collect()
    }

    # from-scratch sketch over the SAME rows: estimates identical
    scratch = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("n"))
        .collect()
    }
    truth = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(scratch) == set(truth)
    for et in got:
        # exact-mode equality at this scale; the general contract is the
        # error band vs truth (next assert), which holds at EVERY scale
        assert got[et][0] == scratch[et], "incremental != from-scratch sketch"
        assert abs(got[et][0] - truth[et]) <= max(3, 0.05 * truth[et]), (
            et, got[et][0], truth[et])
    # the additive measure is unaffected by the sketch column riding along
    assert sum(v[1] for v in got.values()) == ev.count()

    # validation: approx_distinct requires a column
    with pytest.raises(ValueError, match="needs a column"):
        refresh_rollup(spark, src.path, str(tmp_path / "r2"), dims,
                       {"x": ("approx_distinct", None)})


def test_refresh_survives_optimize_reading_only_the_delta(spark, tmp_path):
    """r9 (VERDICT r8 #2): append -> refresh -> OPTIMIZE -> append ->
    refresh. The compaction is rowset-preserving, so the second refresh
    reads only the post-optimize delta instead of failing loud / paying
    a full rebuild."""
    ev, slices = _events_slices(spark)
    src = VersionedTable(spark, str(tmp_path / "src"))
    roll_path = str(tmp_path / "roll")
    args = (spark, str(tmp_path / "src"), roll_path, DIMS, MEASURES)

    src.commit(slices[0])                          # v1
    refresh_rollup(*args)
    src.commit(slices[1], mode="append")           # v2
    refresh_rollup(*args)
    v_opt = src.optimize(num_files=1)              # v3: pure rewrite
    assert src.manifest()["op"]["rowset_preserving"] is True
    # already-current refresh across the optimize: the delta is EMPTY,
    # so the rollup state is unchanged (possibly re-tokened) and exact
    refresh_rollup(*args)
    assert _snap(VersionedTable(spark, roll_path).read()) == _snap(
        _full_agg(slices[0].unionByName(slices[1]))
    )

    src.commit(slices[2], mode="append")           # v4
    # the incremental path reads ONLY v4's files (never the 1-file
    # optimize output NOR v1/v2's originals)
    delta = src.changes(v_opt)
    v4_files = set(src.manifest(4)["files"]) - set(src.manifest(3)["files"])
    scanned = {f.split(str(tmp_path / "src"))[-1].lstrip("/")
               for f in delta.inputFiles()}
    assert scanned == v4_files
    refresh_rollup(*args)
    assert _snap(VersionedTable(spark, roll_path).read()) == _snap(_full_agg(ev))


def test_concurrent_refreshers_never_step_backward(spark, tmp_path):
    """r9: two refreshers racing — the loser recomputes instead of
    blind-republishing its staler state over the winner's newer one;
    a refresher that finds the rollup already AT or PAST its source
    version no-ops."""
    from etl_airflow_adventureworks_spark.table import VersionedTable as VT

    ev, slices = _events_slices(spark)
    src = VersionedTable(spark, str(tmp_path / "src"))
    roll_path = str(tmp_path / "roll")
    args = (spark, str(tmp_path / "src"), roll_path, DIMS, MEASURES)

    src.commit(slices[0])                         # src v1
    refresh_rollup(*args)                         # rollup reflects v1
    src.commit(slices[1], mode="append")          # src v2

    # interloper: just before A's rollup commit publishes, B completes a
    # full refresh to v2 — A's conflict retry must detect reflected >= v2
    # and no-op, never overwrite B's state with its own v2 recompute
    orig = VT._publish_manifest
    armed = {"on": True}

    def racing_publish(self_, man):
        if armed["on"] and (man.get("token") or "").startswith("rollup-of:"):
            armed["on"] = False
            refresh_rollup(*args)  # B wins (publishes through this hook,
            # now disarmed -> original path)
        return orig(self_, man)

    VT._publish_manifest = racing_publish
    try:
        v = refresh_rollup(*args)  # A
    finally:
        VT._publish_manifest = orig
    roll = VersionedTable(spark, roll_path)
    # A returned B's version (no-op) — exactly one post-race commit
    assert v == roll.manifest()["version"]
    assert roll.manifest()["token"] == f"rollup-of:v{src.manifest()['version']}"
    two = slices[0].unionByName(slices[1])
    assert _snap(roll.read()) == _snap(_full_agg(two))

    # and a refresher against an OLDER source view can never regress the
    # rollup: reflected (v2) >= its target — no-op
    assert refresh_rollup(*args) == roll.manifest()["version"]


def test_histogram_measure_mergeable_and_quantile_bound(spark, tmp_path):
    """r9: the mergeable quantile measure — incremental histogram state
    is BIT-IDENTICAL to from-scratch after every refresh generation
    (integer bin counts, commutative merge), and the read-time quantile
    estimate sits within one bin width of the exact percentile."""
    from etl_airflow_adventureworks_spark.operators.rollup import (
        histogram_quantiles,
    )

    ev, slices = _events_slices(spark)
    lo, hi = [float(x) for x in ev.agg(F.min("value"), F.max("value")).first()]
    hi = hi + 1e-9  # right-open range: include the max
    NB = 64
    width = (hi - lo) / NB
    meas = {
        "n": ("count", None),
        "h_value": ("histogram", ("value", lo, hi, NB)),
    }
    src = VersionedTable(spark, str(tmp_path / "src"))
    roll_path = str(tmp_path / "roll")
    args = (spark, str(tmp_path / "src"), roll_path, ["event_type"], meas)

    src.commit(slices[0])
    refresh_rollup(*args)
    src.commit(slices[1], mode="append")
    refresh_rollup(*args)
    src.commit(slices[2], mode="append")
    refresh_rollup(*args)

    got = {
        r["event_type"]: (list(r["h_value"]), r["n"])
        for r in VersionedTable(spark, roll_path).read().collect()
    }
    want = {
        r["event_type"]: (list(r["h_value"]), r["n"])
        for r in _aggregate_hist(ev, meas).collect()
    }
    assert got == want  # bit-identical incremental state
    # totals reconcile: every non-null value landed in exactly one bin
    assert all(sum(h) == n for h, n in got.values())

    # quantile estimates within one bin width of the exact percentile
    q_df = histogram_quantiles(
        VersionedTable(spark, roll_path).read(),
        "h_value", ("value", lo, hi, NB), [0.5, 0.95],
    )
    est = {r["event_type"]: (r["h_value_p50"], r["h_value_p95"])
           for r in q_df.collect()}
    exact = {
        r["event_type"]: (r["p50"], r["p95"])
        for r in ev.groupBy("event_type").agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
        ).collect()
    }
    for et, (p50, p95) in exact.items():
        assert abs(est[et][0] - p50) <= width + 1e-9, (et, est[et][0], p50)
        assert abs(est[et][1] - p95) <= width + 1e-9, (et, est[et][1], p95)

    # out-of-range mass clamps loudly to the range edges
    narrow = ("value", lo, lo + (hi - lo) / 4, 8)
    from etl_airflow_adventureworks_spark.operators.rollup import (
        _aggregate as _agg,
    )
    nstate = _agg(ev, ["event_type"], {"h": ("histogram", narrow)})
    nq = histogram_quantiles(nstate, "h", narrow, [0.99]).collect()
    assert all(r["h_p99"] <= lo + (hi - lo) / 4 + 1e-9 for r in nq)

    # spec validation fails loud before any commit
    with pytest.raises(ValueError, match="hi must be > lo"):
        refresh_rollup(spark, str(tmp_path / "src"), str(tmp_path / "r2"),
                       ["event_type"], {"h": ("histogram", ("value", 5, 5, 4))})
    with pytest.raises(ValueError, match="nbins"):
        refresh_rollup(spark, str(tmp_path / "src"), str(tmp_path / "r2"),
                       ["event_type"], {"h": ("histogram", ("value", 0, 1, 0))})
    with pytest.raises(ValueError, match="col = "):
        refresh_rollup(spark, str(tmp_path / "src"), str(tmp_path / "r2"),
                       ["event_type"], {"h": ("histogram", "value")})


def _aggregate_hist(df, meas):
    from etl_airflow_adventureworks_spark.operators.rollup import _aggregate
    return _aggregate(df, ["event_type"], meas)


def test_refresh_rollup_show_quantiles_cli(spark, tmp_path, capsys):
    """r9: --show/--quantiles project the mergeable histogram measure to
    quantile estimates on the CLI read path."""
    import json

    from etl_airflow_adventureworks_spark.cli import main

    ev, slices = _events_slices(spark)
    src = VersionedTable(spark, str(tmp_path / "src"))
    src.commit(slices[0])
    spec = {
        "dims": ["event_type"],
        "measures": {"n": ["count", None],
                     "hv": ["histogram", ["value", 0.0, 120.0, 32]]},
    }
    spec_path = str(tmp_path / "spec.json")
    with open(spec_path, "w") as fh:
        json.dump(spec, fh)
    assert main(["refresh-rollup", "--source", str(tmp_path / "src"),
                 "--rollup", str(tmp_path / "roll"), "--spec", spec_path,
                 "--show", "10", "--quantiles", "0.5,0.95"]) == 0
    msg = capsys.readouterr().out
    assert "rollup at version 1" in msg
    assert "hv_p50" in msg and "hv_p95" in msg
    assert "hv " not in msg  # the raw bin-count array is dropped from --show


RETRACTABLE_MEASURES = {
    "n_events": ("count", None),
    "sum_value": ("sum", "value"),
    "hist_value": ("histogram", ("value", 0.0, 1000.0, 10)),
}


def _full_agg_retractable(df):
    from etl_airflow_adventureworks_spark.operators.rollup import _aggregate

    return _aggregate(df, DIMS, RETRACTABLE_MEASURES)


def test_refresh_survives_upsert_delete_cdc_with_retractions(spark, tmp_path):
    """r10 (VERDICT r9 #1): the refresh consumes the recorded row-level
    change rows — count/sum subtract, histogram bins decrement, emptied
    groups drop — and equals the from-scratch aggregate after an upsert
    (updates + inserts), a DELETE WHERE, and a mixed CDC batch, while
    reading only delta/change files (never the carried base)."""
    ev, slices = _events_slices(spark)
    src = VersionedTable(spark, str(tmp_path / "src"))
    roll_path = str(tmp_path / "roll")
    args = (spark, str(tmp_path / "src"), roll_path, DIMS,
            RETRACTABLE_MEASURES)

    src.commit(slices[0])                                         # v1
    refresh_rollup(*args)

    # UPSERT: mutate every 5th existing event (type AND value change
    # -> rows LEAVE one group and ENTER another) + append a new slice
    mutated = (
        slices[0].filter("event_id % 5 = 0")
        .withColumn("event_type", F.lit("mutated"))
        .withColumn("value", F.col("value") + 100.0)
    )
    updates = mutated.unionByName(slices[1])
    v_up = src.upsert(updates, key="event_id")                    # v2 rewrite
    assert src.manifest(v_up).get("changes")
    # the delta reads ONLY change files + (if any) appended files — the
    # rewrite step serves its rows from _changes, never the new rowset
    rc = src.row_changes(1)
    assert rc.take(1) and all("/_changes/" in f for f in rc.inputFiles())
    with pytest.warns(RuntimeWarning, match="full_rebuild=True for small"):
        v = refresh_rollup(*args)
    got = VersionedTable(spark, roll_path).read()
    assert _snap(got) == _snap(_full_agg_retractable(src.read()))

    # DELETE WHERE: retract a whole event type -> its groups vanish
    src.delete_where("event_type = 'mutated'")                    # v3
    with pytest.warns(RuntimeWarning):
        v2 = refresh_rollup(*args)
    assert v2 > v
    got = VersionedTable(spark, roll_path).read()
    assert got.filter("event_type = 'mutated'").count() == 0
    assert _snap(got) == _snap(_full_agg_retractable(src.read()))

    # CDC: one atomic batch of updates + inserts + deletes
    some = [r["event_id"] for r in src.read().limit(3).collect()]
    cdc = (
        src.read().filter(F.col("event_id").isin(some[:2]))
        .withColumn("value", F.col("value") * 2)
        .withColumn("op", F.lit("upsert"))
        .unionByName(
            src.read().filter(F.col("event_id") == some[2])
            .withColumn("op", F.lit("delete"))
        )
    )
    src.apply_cdc(cdc, key="event_id")                            # v4
    with pytest.warns(RuntimeWarning):
        refresh_rollup(*args)
    assert _snap(VersionedTable(spark, roll_path).read()) == _snap(
        _full_agg_retractable(src.read())
    )
    # incremental service continues with plain appends afterwards
    src.commit(slices[2], mode="append")                          # v5
    with pytest.warns(RuntimeWarning):
        refresh_rollup(*args)
    assert _snap(VersionedTable(spark, roll_path).read()) == _snap(
        _full_agg_retractable(src.read())
    )


def test_non_retractable_measures_refresh_group_local(spark, tmp_path):
    """min/max and the HLL sketch cannot un-see a value: a rewrite window
    touching them no longer full-rebuilds (the pre-r12 behavior) — only
    the change-feed-named groups are re-aggregated from the source
    snapshot and spliced into the untouched rollup rows, exact vs
    from-scratch; likewise a measure set with no count measure (the
    group-local path needs none — emptied groups simply have no source
    rows left)."""
    import warnings

    ev, slices = _events_slices(spark)
    src = VersionedTable(spark, str(tmp_path / "src"))
    src.commit(slices[0])
    args = (spark, str(tmp_path / "src"), str(tmp_path / "roll"),
            DIMS, MEASURES)  # MEASURES includes max/min -> non-retractable
    refresh_rollup(*args)
    src.upsert(
        slices[0].filter("event_id % 7 = 0").withColumn(
            "value", F.col("value") + 1.0),
        key="event_id",
    )
    with warnings.catch_warnings():
        # the old path warned "falling back to a full rebuild"; the only
        # warning the group-local path may emit is the measured
        # small-source advisory (this test corpus is tiny)
        warnings.simplefilter("error")
        warnings.filterwarnings(
            "ignore", message=".*full rebuild is typically faster.*")
        v = refresh_rollup(*args)
    assert v > 1
    roll = VersionedTable(spark, str(tmp_path / "roll"))
    assert _snap(roll.read()) == _snap(_full_agg(src.read()))
    op = roll.manifest()["op"]
    assert op["mode"] == "group_local"
    n_groups_total = _full_agg(src.read()).count()
    assert 0 < op["groups_touched"] < n_groups_total

    # sum-only measure set: no count measure — group-local handles it too
    args2 = (spark, str(tmp_path / "src"), str(tmp_path / "roll2"),
             DIMS, {"sum_value": ("sum", "value")})
    refresh_rollup(*args2)
    src.delete_where("event_id % 11 = 0")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        warnings.filterwarnings(
            "ignore", message=".*full rebuild is typically faster.*")
        refresh_rollup(*args2)
    roll2 = VersionedTable(spark, str(tmp_path / "roll2"))
    assert roll2.manifest()["op"]["mode"] == "group_local"
    got = roll2.read()
    exact = src.read().groupBy(*[F.expr(d) for d in DIMS]).agg(
        F.sum("value").alias("sum_value"))
    assert _snap(got) == _snap(exact)
    # incremental service resumes after the group-local window
    src.commit(slices[1], mode="append")
    refresh_rollup(*args2)
    assert roll2.manifest()["op"]["mode"] == "incremental"
    exact = src.read().groupBy(*[F.expr(d) for d in DIMS]).agg(
        F.sum("value").alias("sum_value"))
    assert _snap(roll2.read()) == _snap(exact)


def test_group_local_refresh_prunes_files_on_clustered_dim(spark, tmp_path):
    """VERDICT r11 #1's done-gate: an upsert touching k of N groups on a
    dim-clustered source refreshes bit-equal to ``full_rebuild=True``
    while the op metrics show the source read was pruned ∝ touched
    groups (per-file min/max stats + exact key bisect), and the HLL
    sketch column agrees with from-scratch (exact mode at this size)."""
    import warnings

    from etl_airflow_adventureworks_spark.operators.rollup import (
        _aggregate, finalize_rollup,
    )

    dims = ["g"]
    measures = {
        "n": ("count", None),
        "mx": ("max", "v"),
        "mn": ("min", "v"),
        "nd": ("approx_distinct", "u"),
    }
    tpath, rpath = str(tmp_path / "t"), str(tmp_path / "roll")
    t = VersionedTable(spark, tpath)
    rows = [(i, i % 16, float(i % 97), i % 37) for i in range(4000)]
    df = spark.createDataFrame(rows, "k long, g long, v double, u long")
    # key-clustered layout: one contiguous g-range per file, stats recorded
    t.commit(
        df.repartitionByRange(8, "g").sortWithinPartitions("g"),
        stats_cols=["g"],
    )
    refresh_rollup(spark, tpath, rpath, dims, measures)

    # touch exactly one group: every k ≡ 35 (mod 80) has k % 16 = 3, so
    # the delete retracts rows from g=3 only (one clustered file)
    t.delete_where("k % 80 = 35")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        warnings.filterwarnings(
            "ignore", message=".*full rebuild is typically faster.*")
        refresh_rollup(spark, tpath, rpath, dims, measures)
    roll = VersionedTable(spark, rpath)
    op = roll.manifest()["op"]
    assert op["mode"] == "group_local"
    assert op["groups_touched"] == 1
    # pruned ∝ touched groups: the delete's survivor file(s) plus at
    # most the one carried clustered file overlapping g=3 — never the
    # 7 untouched clustered files
    assert op["files_read"] <= op["files_total"] - 7
    assert op["files_read"] < op["files_total"]

    # bit-equal to a from-scratch rebuild, HLL estimates included
    got = finalize_rollup(roll.read(), measures).collect()
    want = finalize_rollup(
        _aggregate(t.read(), dims, measures), measures
    ).collect()
    assert sorted(
        [tuple(r) for r in got], key=lambda x: x[0]
    ) == sorted([tuple(r) for r in want], key=lambda x: x[0])


def test_group_local_null_keys_and_group_moves(spark, tmp_path):
    """Group-local edge cases: a NULL dim value is a real group (the
    touched-key joins are null-safe, and NULL touched keys disable file
    pruning rather than wrongly skipping files), and an upsert that
    MOVES a row between groups touches BOTH (preimage and postimage
    keys enter the touched set) — all asserted bit-equal to
    from-scratch with a min measure forcing the group-local path."""
    import warnings

    from etl_airflow_adventureworks_spark.operators.rollup import _aggregate

    dims = ["g"]
    measures = {"n": ("count", None), "mn": ("min", "v")}
    tpath, rpath = str(tmp_path / "t"), str(tmp_path / "roll")
    t = VersionedTable(spark, tpath)
    rows = [(1, None, 5.0), (2, None, 9.0), (3, 1, 7.0), (4, 2, 3.0),
            (5, 2, 8.0)]
    t.commit(
        spark.createDataFrame(rows, "k long, g long, v double"),
        stats_cols=["g"],  # stats exist; NULL touched keys must not
        # prune away the files holding the NULL group's rows
    )
    refresh_rollup(spark, tpath, rpath, dims, measures)

    def check():
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            refresh_rollup(spark, tpath, rpath, dims, measures)
        roll = VersionedTable(spark, rpath)
        assert roll.manifest()["op"]["mode"] == "group_local"
        got = {tuple(r) for r in roll.read().collect()}
        want = {tuple(r) for r in _aggregate(t.read(), dims, measures).collect()}
        assert got == want

    # retract the NULL group's min (k=1, v=5.0): NULL group recomputes
    t.delete_where("k = 1")
    check()

    # move a row BETWEEN groups: k=4 leaves g=2 (its min) and joins g=1
    t.upsert(
        spark.createDataFrame([(4, 1, 3.0)], "k long, g long, v double"),
        key="k",
    )
    check()

    # move a row INTO the NULL group
    t.upsert(
        spark.createDataFrame([(3, None, 7.0)], "k long, g long, v double"),
        key="k",
    )
    check()

    # empty a group entirely: g=2's last row leaves; the group vanishes
    t.delete_where("k = 5")
    check()
    assert VersionedTable(spark, rpath).read().filter("g = 2").count() == 0


def test_group_local_beyond_collect_cap_stays_exact(
    spark, tmp_path, monkeypatch
):
    """Above ``_GROUP_KEYS_COLLECT_MAX`` touched groups the group-local
    path must not broadcast or file-prune (the keys no longer fit the
    driver budget) — the joins shuffle and every file is read, but the
    result stays bit-equal to from-scratch. Cap monkeypatched to 1 so a
    3-group window exercises the big-keys branch."""
    import warnings

    from etl_airflow_adventureworks_spark.operators import rollup as R

    monkeypatch.setattr(R, "_GROUP_KEYS_COLLECT_MAX", 1)
    dims = ["g"]
    measures = {"n": ("count", None), "mn": ("min", "v")}
    tpath, rpath = str(tmp_path / "t"), str(tmp_path / "roll")
    t = VersionedTable(spark, tpath)
    rows = [(i, i % 8, float(i % 13)) for i in range(400)]
    t.commit(
        spark.createDataFrame(rows, "k long, g long, v double")
        .repartitionByRange(4, "g").sortWithinPartitions("g"),
        stats_cols=["g"],
    )
    R.refresh_rollup(spark, tpath, rpath, dims, measures)
    t.delete_where("k % 50 = 3")  # touches several groups
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        R.refresh_rollup(spark, tpath, rpath, dims, measures)
    roll = VersionedTable(spark, rpath)
    op = roll.manifest()["op"]
    assert op["mode"] == "group_local"
    assert op["groups_touched"] > 1
    assert op["files_read"] == op["files_total"]  # pruning declined
    got = {tuple(r) for r in roll.read().collect()}
    want = {
        tuple(r)
        for r in R._aggregate(t.read(), dims, measures).collect()
    }
    assert got == want


def test_fully_retracted_nullable_sum_reads_null(spark, tmp_path):
    """r11 (VERDICT r10 #1): a sum over a nullable expression reads NULL
    (not 0) once the group's last non-null value is retracted — bit-equal
    to the from-scratch aggregate (the hidden __nn_ counter hitting zero
    projects the stored sum to NULL) — and resurrects when a later commit
    brings a non-null value back. Closes the rollup layer's last
    incremental-vs-rebuild semantic gap."""
    import warnings

    from etl_airflow_adventureworks_spark.operators.rollup import _aggregate

    dims = ["g"]
    measures = {"n": ("count", None), "sv": ("sum", "v")}
    tpath, rpath = str(tmp_path / "t"), str(tmp_path / "roll")
    t = VersionedTable(spark, tpath)
    # group 1: one non-null + one NULL value; group 2: control
    t.commit(spark.createDataFrame(
        [(1, 1, 5.0), (2, 1, None), (3, 2, 7.0)],
        "k long, g long, v double"))
    refresh_rollup(spark, tpath, rpath, dims, measures)

    # retract group 1's only non-null value: the NULL row keeps the group
    # alive (count 1) but its sum must now read NULL, not 0
    t.delete_where("k = 1")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)  # size advisory
        refresh_rollup(spark, tpath, rpath, dims, measures)
    roll = VersionedTable(spark, rpath).read()
    row = roll.filter("g = 1").first()
    assert row["n"] == 1 and row["sv"] is None
    assert _snap(roll) == _snap(_aggregate(t.read(), dims, measures))

    # NULL->NULL update: retracting a NULL contributes nothing; stays NULL
    t.upsert(
        spark.createDataFrame([(2, 1, None)], "k long, g long, v double"),
        key="k",
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        refresh_rollup(spark, tpath, rpath, dims, measures)
    assert VersionedTable(spark, rpath).read().filter("g = 1").first()["sv"] is None

    # resurrection: a later non-null value flips the sum back from NULL
    t.commit(
        spark.createDataFrame([(4, 1, 3.0)], "k long, g long, v double"),
        mode="append",
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        refresh_rollup(spark, tpath, rpath, dims, measures)
    roll = VersionedTable(spark, rpath).read()
    assert roll.filter("g = 1").first()["sv"] == 3.0
    assert _snap(roll) == _snap(_aggregate(t.read(), dims, measures))


def test_pre_r11_rollup_without_counters_migrates_via_loud_rebuild(
    spark, tmp_path
):
    """A stored rollup lacking the hidden __nn_ columns (pre-r11 state)
    cannot merge incrementally — its next refresh warns and rebuilds once,
    after which the schema carries the counters and service resumes
    incrementally."""
    import warnings

    dims = ["g"]
    measures = {"n": ("count", None), "sv": ("sum", "v")}
    tpath, rpath = str(tmp_path / "t"), str(tmp_path / "roll")
    t = VersionedTable(spark, tpath)
    t.commit(spark.createDataFrame([(1, 1, 5.0), (2, 2, 6.0)],
                                   "k long, g long, v double"))
    refresh_rollup(spark, tpath, rpath, dims, measures)
    roll_vt = VersionedTable(spark, rpath)
    # simulate the pre-r11 layout: same state minus the hidden counters,
    # re-committed under the same rollup-of token
    tok = roll_vt.manifest()["token"]
    legacy = roll_vt.read().drop("__nn_sv").localCheckpoint(eager=True)
    roll_vt.commit(legacy, mode="overwrite", idempotency_token="tmp")
    roll_vt.commit(legacy, mode="overwrite", idempotency_token=tok)
    assert "__nn_sv" not in roll_vt.read().columns

    t.commit(spark.createDataFrame([(3, 1, 1.0)], "k long, g long, v double"),
             mode="append")
    with pytest.warns(RuntimeWarning, match="predates the hidden"):
        refresh_rollup(spark, tpath, rpath, dims, measures)
    got = VersionedTable(spark, rpath).read()
    assert "__nn_sv" in got.columns
    assert got.filter("g = 1").first()["sv"] == 6.0
    # and the next refresh is incremental again (no migration warning)
    t.commit(spark.createDataFrame([(4, 2, 2.0)], "k long, g long, v double"),
             mode="append")
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        refresh_rollup(spark, tpath, rpath, dims, measures,
                       rebuild_advisory_bytes=0)
    assert VersionedTable(spark, rpath).read().filter("g = 2").first()["sv"] == 8.0


def test_small_source_rebuild_advisory(spark, tmp_path):
    """r10 (VERDICT r9 #6): incremental refresh of a source below the
    measured rebuild-beats-refresh crossover emits the advisory; a
    caller modelling a large source (threshold 0) gets silence."""
    import warnings as _w

    ev, slices = _events_slices(spark)
    src = VersionedTable(spark, str(tmp_path / "src"))
    src.commit(slices[0])
    args = dict(
        spark=spark, source_path=str(tmp_path / "src"),
        rollup_path=str(tmp_path / "roll"), dims=DIMS, measures=MEASURES,
    )
    refresh_rollup(**args)  # bootstrap: no advisory path
    src.commit(slices[1], mode="append")
    with pytest.warns(RuntimeWarning, match="full rebuild is typically faster"):
        refresh_rollup(**args)
    src.commit(slices[2], mode="append")
    with _w.catch_warnings():
        _w.simplefilter("error", RuntimeWarning)   # sf10-shape: stays silent
        refresh_rollup(**args, rebuild_advisory_bytes=0)
    assert _snap(VersionedTable(spark, str(tmp_path / "roll")).read()) == \
        _snap(_full_agg(ev))


def test_rollup_composes_with_streaming_cdc(spark, tmp_path):
    """r10 end-to-end: a CDC stream replicated into a VersionedTable
    (exactly-once foreachBatch apply, epoch-token idempotent) feeds a
    continuous aggregate whose refresh consumes the recorded
    retractions — the rollup equals the from-scratch aggregate after
    the stream drains, with NO full rebuild (the pre-r10 behavior was
    a hard failure here)."""
    import warnings

    from etl_airflow_adventureworks_spark.operators.rollup import _aggregate
    from etl_airflow_adventureworks_spark.table import stream_cdc_to_versioned

    dims = ["pmod(k, 10) AS bucket"]
    measures = {
        "n": ("count", None),
        "sv": ("sum", "v"),
        "h": ("histogram", ("v", 0.0, 10.0, 5)),
    }
    tpath, rpath = str(tmp_path / "t"), str(tmp_path / "roll")
    t = VersionedTable(spark, tpath)
    t.commit(spark.range(1000).selectExpr(
        "id AS k", "CAST(id % 7 AS DOUBLE) AS v"))
    refresh_rollup(spark, tpath, rpath, dims, measures)

    src = str(tmp_path / "cdc_src")
    b1 = spark.createDataFrame(
        [("upsert", 100, 99.0), ("delete", 200, None),
         ("upsert", 5000, 1.0)],
        "op string, k long, v double")
    b2 = spark.createDataFrame(
        [("upsert", 100, -2.0), ("delete", 5000, None),
         ("upsert", 300, 42.0)],
        "op string, k long, v double")
    b1.coalesce(1).write.parquet(f"{src}/f0")
    b2.coalesce(1).write.parquet(f"{src}/f1")

    stream = (
        spark.readStream.schema("op string, k long, v double")
        .option("maxFilesPerTrigger", 1).parquet(f"{src}/*")
    )
    q = stream_cdc_to_versioned(stream, tpath, str(tmp_path / "ckpt"), key="k")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(t.versions()) >= 3  # bootstrap + >=2 CDC epochs

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)  # size advisory
        refresh_rollup(spark, tpath, rpath, dims, measures)
    got = VersionedTable(spark, rpath).read()
    assert _snap(got) == _snap(_aggregate(t.read(), dims, measures))
    # and the refresh consumed change rows, not a rescan: the rollup
    # token reflects the latest source version reached incrementally
    assert VersionedTable(spark, rpath).manifest()["token"] == \
        f"rollup-of:v{t.manifest()['version']}"


def test_refresh_random_maintenance_sequence(spark, tmp_path):
    """r10 soak: a seeded random interleaving of appends, upserts
    (mutations + inserts), keyed deletes and OPTIMIZEs, with a refresh
    after EVERY commit — the rollup must equal the from-scratch
    aggregate at each step (the invariant, not one lucky path)."""
    import random
    import warnings

    from etl_airflow_adventureworks_spark.operators.rollup import _aggregate

    rng = random.Random(42)
    dims = ["pmod(k, 7) AS bucket"]
    measures = {
        "n": ("count", None),
        "sv": ("sum", "v"),
        "h": ("histogram", ("v", 0.0, 50.0, 10)),
    }
    tpath, rpath = str(tmp_path / "t"), str(tmp_path / "roll")
    t = VersionedTable(spark, tpath)
    live = {k: float(k % 11) for k in range(300)}
    t.commit(spark.createDataFrame(
        sorted(live.items()), "k long, v double"))
    next_k = 1000

    def do_refresh():
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            refresh_rollup(spark, tpath, rpath, dims, measures)
        got = VersionedTable(spark, rpath).read()
        assert _snap(got) == _snap(_aggregate(t.read(), dims, measures))

    do_refresh()
    for step in range(6):
        op = rng.choice(["append", "upsert", "delete", "optimize"])
        if op == "append":
            rows = {next_k + i: float(rng.randrange(60)) for i in range(25)}
            next_k += 25
            live.update(rows)
            t.commit(spark.createDataFrame(
                sorted(rows.items()), "k long, v double"), mode="append")
        elif op == "upsert":
            muts = {k: float(rng.randrange(60))
                    for k in rng.sample(sorted(live), 20)}
            news = {next_k + i: float(rng.randrange(60)) for i in range(10)}
            next_k += 10
            live.update(muts); live.update(news)
            t.upsert(spark.createDataFrame(
                sorted({**muts, **news}.items()), "k long, v double"),
                key="k")
        elif op == "delete":
            doomed = rng.sample(sorted(live), 15)
            for k in doomed:
                live.pop(k)
            t.delete_where(f"k IN ({','.join(map(str, doomed))})")
        else:
            t.optimize(num_files=2)
        do_refresh()
        # the table layer agrees with the python mirror at every step
        assert {(r["k"], r["v"]) for r in t.read().collect()} == set(live.items())


def test_retraction_refresh_fails_loud_on_foreign_rollup_state(spark, tmp_path):
    """r10 invariant: if the change feed retracts rows the rollup state
    never contained (state forged/bootstrapped against a different
    snapshot), the merged row count goes negative and the refresh
    RAISES instead of committing impossible aggregates."""
    from etl_airflow_adventureworks_spark.operators.rollup import (
        _aggregate,
        _expand_measures,
    )

    dims = ["event_type"]
    measures = {"n": ("count", None), "sv": ("sum", "value")}
    ev, slices = _events_slices(spark)
    src = VersionedTable(spark, str(tmp_path / "src"))
    src.commit(slices[0])                                          # v1
    # forge a rollup claiming to reflect v1 but holding EMPTY state
    # (current schema, hidden counters included — the guard under test
    # is the negative count, not the r11 schema migration)
    roll = VersionedTable(spark, str(tmp_path / "roll"))
    empty_state = _aggregate(slices[0].limit(0), dims,
                             _expand_measures(measures))
    roll.commit(empty_state, idempotency_token="rollup-of:v1")
    # a rewrite that retracts v1 rows the forged state never saw
    src.delete_where("event_id % 2 = 0")                           # v2
    with pytest.raises(RuntimeError, match="negative"):
        refresh_rollup(spark, str(tmp_path / "src"), str(tmp_path / "roll"),
                       dims, measures)
    # full_rebuild recovers
    refresh_rollup(spark, str(tmp_path / "src"), str(tmp_path / "roll"),
                   dims, measures, full_rebuild=True)
    assert _snap(VersionedTable(spark, str(tmp_path / "roll")).read()) == \
        _snap(_aggregate(src.read(), dims, measures))


def test_stream_cdc_with_rollups_continuous_and_restart_exact(spark, tmp_path):
    """r10: the packaged continuous-aggregate pipeline — CDC stream ->
    apply_cdc -> per-epoch retraction-consuming refresh — equals the
    from-scratch aggregate after every drain, and a checkpoint restart
    applies only the new epoch (both layers idempotent)."""
    from etl_airflow_adventureworks_spark.operators.rollup import _aggregate
    from etl_airflow_adventureworks_spark.table import stream_cdc_with_rollups

    dims = ["pmod(k, 5) AS bucket"]
    measures = {
        "n": ("count", None),
        "sv": ("sum", "v"),
        "h": ("histogram", ("v", 0.0, 10.0, 5)),
    }
    tpath, rpath = str(tmp_path / "t"), str(tmp_path / "roll")
    t = VersionedTable(spark, tpath)
    t.commit(spark.range(500).selectExpr(
        "id AS k", "CAST(id % 7 AS DOUBLE) AS v"))

    src, ckpt = str(tmp_path / "cdc_src"), str(tmp_path / "ckpt")
    spark.createDataFrame(
        [("upsert", 10, 99.0), ("delete", 20, None), ("upsert", 900, 1.0)],
        "op string, k long, v double",
    ).coalesce(1).write.parquet(f"{src}/f0")

    def start():
        return stream_cdc_with_rollups(
            spark.readStream.schema("op string, k long, v double")
            .option("maxFilesPerTrigger", 1).parquet(f"{src}/*"),
            tpath, ckpt, key="k",
            # policy "auto" (r13): per-epoch the maintain_rollup policy
            # picks the verb — the drained result must stay exact
            # regardless of which side of the crossovers each epoch hit
            rollups=[{"path": rpath, "dims": dims, "measures": measures,
                      "policy": "auto"}],
        )

    q = start()
    try:
        q.processAllAvailable()
        # micro-batch duration guard (r11, VERDICT r10 #7): one spec's
        # epoch must stay inside the docstring's budget envelope — a
        # regression that turns the per-epoch refresh into a rescan
        # (or adds job chains) shows up here as a blown duration
        import json as _json

        progs = [
            _json.loads(p.json) if hasattr(p, "json") else p
            for p in q.recentProgress
        ]
        durs = [
            p["durationMs"]["triggerExecution"]
            for p in progs
            if p.get("numInputRows", 0) > 0
        ]
        assert durs and all(d < 60_000 for d in durs), durs
    finally:
        q.stop()
    roll = VersionedTable(spark, rpath)
    assert _snap(roll.read()) == _snap(_aggregate(t.read(), dims, measures))
    assert roll.manifest()["token"] == f"rollup-of:v{t.manifest()['version']}"

    # restart from the checkpoint with one NEW epoch: only it applies
    spark.createDataFrame(
        [("upsert", 10, -5.0), ("delete", 900, None)],
        "op string, k long, v double",
    ).coalesce(1).write.parquet(f"{src}/f1")
    n_vers = len(t.versions())
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert len(t.versions()) == n_vers + 1  # exactly one new epoch landed
    assert _snap(roll.read()) == _snap(_aggregate(t.read(), dims, measures))
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got[10] == -5.0 and 900 not in got and 20 not in got


def test_global_spec_with_nonretractable_measures_rebuilds(spark, tmp_path):
    """ADVICE r12: a GLOBAL spec (dims=[]) with a non-retractable measure
    used to die with TypeError inside the group-local join builder when a
    rewrite landed in the window — it now takes the equivalent full
    rebuild (one group IS the whole table), exact vs from-scratch."""
    import warnings

    ev, slices = _events_slices(spark)
    src = VersionedTable(spark, str(tmp_path / "src"))
    src.commit(slices[0])
    args = (spark, str(tmp_path / "src"), str(tmp_path / "roll"),
            [], MEASURES)
    refresh_rollup(*args)
    src.upsert(
        slices[0].filter("event_id % 7 = 0").withColumn(
            "value", F.col("value") + 1.0),
        key="event_id",
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        v = refresh_rollup(*args)
    assert v > 1
    roll = VersionedTable(spark, str(tmp_path / "roll"))
    assert roll.manifest()["op"]["mode"] == "rebuild"
    exact = src.read().agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.max("value").alias("max_value"),
        F.min("ts").alias("min_ts"),
    )
    assert _snap(roll.read()) == _snap(exact)


def _ts_events(spark, n_days=16, per_day=200):
    import datetime as dt

    rows = []
    for d in range(n_days):
        for i in range(per_day):
            rows.append((
                d * per_day + i,
                dt.datetime(2024, 1, 1 + d, i % 24, i % 60),
                float((d * per_day + i) % 97),
            ))
    return spark.createDataFrame(rows, "k long, ts timestamp, v double")


def test_group_local_prunes_on_monotone_expression_dim(spark, tmp_path):
    """VERDICT r12 #1's done-gate: a rollup over date_trunc('day', ts)
    on a ts-clustered source (timestamp stats, r13) refreshes a 1-day
    upsert group-locally reading files ∝ touched days — pruning on the
    EXPRESSION dim itself, no bare co-dim — bit-equal to rebuild."""
    import warnings

    from etl_airflow_adventureworks_spark.operators.rollup import _aggregate

    dims = ["date_trunc('day', ts) AS day"]
    measures = {"n": ("count", None), "mx": ("max", "v")}
    tpath, rpath = str(tmp_path / "t"), str(tmp_path / "roll")
    t = VersionedTable(spark, tpath)
    df = _ts_events(spark)
    # one contiguous ts-range per file, per-file timestamp stats
    t.commit(
        df.repartitionByRange(8, "ts").sortWithinPartitions("ts"),
        stats_cols=["ts"],
    )
    refresh_rollup(spark, tpath, rpath, dims, measures)

    # touch exactly one day (day index 5): k in [1000, 1200)
    t.upsert(
        t.read().filter("k >= 1000 and k < 1050").withColumn(
            "v", F.col("v") + 1000.0),
        key="k",
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        warnings.filterwarnings(
            "ignore", message=".*full rebuild is typically faster.*")
        refresh_rollup(spark, tpath, rpath, dims, measures)
    roll = VersionedTable(spark, rpath)
    op = roll.manifest()["op"]
    assert op["mode"] == "group_local"
    assert op["groups_touched"] == 1
    # 16 days over 8 clustered files = 2 days/file; one touched day ->
    # at most the one carried clustered file + the upsert's rewrite
    # files, never the 6+ untouched clustered files
    assert op["files_read"] <= op["files_total"] - 6
    assert _snap(roll.read()) == _snap(_aggregate(t.read(), dims, measures))


def test_monotone_dims_explicit_declaration_and_validation(spark, tmp_path):
    """A non-auto-recognized shape prunes when DECLARED monotone of a
    stats-covered column; unknown declaration keys fail loud (a silently
    ignored declaration would read as pruning)."""
    import warnings

    from etl_airflow_adventureworks_spark.operators.rollup import _aggregate

    dims = ["CAST(date_format(ts, 'yyyyMMdd') AS INT) AS day_key"]
    measures = {"n": ("count", None), "mx": ("max", "v")}
    tpath, rpath = str(tmp_path / "t"), str(tmp_path / "roll")
    t = VersionedTable(spark, tpath)
    t.commit(
        _ts_events(spark).repartitionByRange(8, "ts")
        .sortWithinPartitions("ts"),
        stats_cols=["ts"],
    )
    mono = {dims[0]: "ts"}
    refresh_rollup(spark, tpath, rpath, dims, measures,
                   monotone_dims=mono)
    t.upsert(
        t.read().filter("k >= 1000 and k < 1050").withColumn(
            "v", F.col("v") + 1000.0),
        key="k",
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        refresh_rollup(spark, tpath, rpath, dims, measures,
                       monotone_dims=mono)
    roll = VersionedTable(spark, rpath)
    op = roll.manifest()["op"]
    assert op["mode"] == "group_local"
    assert op["files_read"] <= op["files_total"] - 6
    assert _snap(roll.read()) == _snap(_aggregate(t.read(), dims, measures))

    # a declaration that names no dim fails loud
    with pytest.raises(ValueError, match="monotone_dims keys not found"):
        refresh_rollup(spark, tpath, rpath, dims, measures,
                       monotone_dims={"no_such_dim": "ts"})
    # a declaration whose inner is not a bare column fails loud
    with pytest.raises(ValueError, match="not a bare source column"):
        refresh_rollup(spark, tpath, rpath, dims, measures,
                       monotone_dims={dims[0]: "ts + 1"})


def test_maintain_rollup_policy_paths(spark, tmp_path):
    """r13 (VERDICT r12 #3): the measured rebuild-vs-refresh crossovers
    become an EXECUTED policy — bootstrap/small-source/unrecorded-
    rewrite pick rebuild, large sources refresh (incremental or
    group-local), dry_run plans without touching, and every executed
    path leaves the rollup exact vs from-scratch."""
    from etl_airflow_adventureworks_spark.operators.rollup import (
        maintain_rollup,
    )

    ev, slices = _events_slices(spark)
    spath, rpath = str(tmp_path / "src"), str(tmp_path / "roll")
    src = VersionedTable(spark, spath)
    src.commit(slices[0])
    args = (spark, spath, rpath, DIMS, MEASURES)

    # bootstrap: dry_run plans a rebuild and touches nothing
    plan = maintain_rollup(*args, dry_run=True)
    assert plan["actions"] == ["rebuild"] and plan["dry_run"]
    assert VersionedTable(spark, rpath).manifest() is None
    rep = maintain_rollup(*args)
    assert rep["actions"] == ["rebuild"] and rep["mode"] == "rebuild"
    roll = VersionedTable(spark, rpath)
    assert _snap(roll.read()) == _snap(_full_agg(src.read()))

    # current: no action
    rep = maintain_rollup(*args)
    assert rep["actions"] == [] and "current" in rep["reasons"][0]

    # append window on a SMALL source: the measured crossover rebuilds
    src.commit(slices[1], mode="append")
    plan = maintain_rollup(*args, dry_run=True)
    assert plan["actions"] == ["rebuild"] and "crossover" in \
        " ".join(plan["reasons"])
    rep = maintain_rollup(*args)
    assert rep["mode"] == "rebuild"
    assert roll.manifest()["op"]["mode"] == "rebuild"
    assert _snap(roll.read()) == _snap(_full_agg(src.read()))

    # append window with the crossover floored away: incremental
    src.commit(slices[2], mode="append")
    rep = maintain_rollup(*args, rebuild_below_bytes=0)
    assert rep["actions"] == ["refresh"] and rep["mode"] == "incremental"
    assert roll.manifest()["op"]["mode"] == "incremental"
    assert _snap(roll.read()) == _snap(_full_agg(src.read()))

    # recorded rewrite + non-retractable measures: group-local above
    # the crossover, rebuild below it
    src.upsert(
        slices[0].filter("event_id % 5 = 0").withColumn(
            "value", F.col("value") + 2.0),
        key="event_id",
    )
    plan = maintain_rollup(*args, dry_run=True)
    assert plan["actions"] == ["rebuild"]  # tiny corpus: below crossover
    rep = maintain_rollup(*args, group_local_below_bytes=0)
    assert rep["actions"] == ["refresh"] and rep["mode"] == "group_local"
    assert roll.manifest()["op"]["mode"] == "group_local"
    assert _snap(roll.read()) == _snap(_full_agg(src.read()))

    # UNRECORDED rewrite: refresh_rollup fails loud; the policy rebuilds
    # with the reason recorded
    src.commit(src.read().filter("event_id % 11 != 3"), mode="overwrite")
    with pytest.raises(ValueError, match="without recording change rows"):
        refresh_rollup(*args)
    plan = maintain_rollup(*args, dry_run=True)
    assert plan["actions"] == ["rebuild"]
    assert any("without recording change rows" in r for r in plan["reasons"])
    rep = maintain_rollup(*args)
    assert rep["mode"] == "rebuild"
    assert _snap(roll.read()) == _snap(_full_agg(src.read()))

    # vacuum leg sweeps the rollup's own history; retain<1 refuses first
    with pytest.raises(ValueError, match="vacuum_retain_last"):
        maintain_rollup(*args, vacuum_retain_last=0)
    assert len(roll.versions()) > 1
    rep = maintain_rollup(*args, vacuum_retain_last=1)
    assert rep["actions"] == ["vacuum"]  # content already current
    assert len(roll.versions()) == 1
    assert _snap(roll.read()) == _snap(_full_agg(src.read()))


def test_maintain_rollup_subcommand(spark, tmp_path, capsys):
    """CLI verb: dry-run prints the plan + reasons; the real run
    executes it and the rollup reads exact afterwards."""
    import json as _json

    from etl_airflow_adventureworks_spark.cli import main

    ev, slices = _events_slices(spark)
    spath, rpath = str(tmp_path / "src"), str(tmp_path / "roll")
    VersionedTable(spark, spath).commit(slices[0])
    spec = tmp_path / "spec.json"
    spec.write_text(_json.dumps({
        "dims": DIMS,
        "measures": {k: list(v) for k, v in MEASURES.items()},
    }))
    assert main(["maintain-rollup", "--source", spath, "--rollup", rpath,
                 "--spec", str(spec), "--dry-run"]) == 0
    out = capsys.readouterr().out
    assert "would run" in out and "rebuild" in out
    assert VersionedTable(spark, rpath).manifest() is None
    assert main(["maintain-rollup", "--source", spath, "--rollup", rpath,
                 "--spec", str(spec)]) == 0
    assert "ran" in capsys.readouterr().out
    roll = VersionedTable(spark, rpath)
    assert _snap(roll.read()) == _snap(_full_agg(
        VersionedTable(spark, spath).read()))
    assert main(["maintain-rollup", "--source", spath, "--rollup", rpath,
                 "--spec", str(spec)]) == 0
    assert "nothing" in capsys.readouterr().out
    assert main(["maintain-rollup", "--source", spath, "--rollup", rpath,
                 "--spec", str(spec), "--vacuum-retain", "0"]) == 2


def test_monotone_auto_shapes_unit():
    """The auto-recognized monotone dim shapes (pure parsing, no Spark):
    time-bucketing functions and the op-34 smart date key recognize and
    extract the inner column; cyclic shapes (month/hour) never match."""
    from etl_airflow_adventureworks_spark.operators.rollup import (
        _monotone_map,
    )

    auto = [
        ("date_trunc('day', ts) AS day", "ts"),
        ("to_date(ts)", "ts"),
        ("year(ts) AS y", "ts"),
        ("trunc(d, 'month') AS m", "d"),
        ("CAST(ts AS DATE) AS d", "ts"),
        ("unix_timestamp(ts)", "ts"),
        ("CAST(year(ts)*10000 + month(ts)*100 + dayofmonth(ts) AS INT)"
         " AS date_key", "ts"),
        ("year(ts) * 10000 + month(ts) * 100 + day(ts) AS date_key", "ts"),
    ]
    for dim, inner in auto:
        m = _monotone_map([dim], None)
        assert m == {0: inner}, (dim, m)
    cyclic = [
        "month(ts) AS m",            # cycles yearly
        "hour(ts)",                  # cycles daily
        "pmod(k, 5) AS bucket",      # cycles, not even temporal
        "year(ts)*100 + day(ts)",    # mixed significance: NOT monotone
        "event_type",                # bare column: prunes directly
    ]
    for dim in cyclic:
        assert _monotone_map([dim], None) == {}, dim


def test_maintain_rollup_rebuilds_when_reflected_version_vacuumed(
    spark, tmp_path
):
    """r13 review fix: a source vacuumed past the rollup's reflected
    version makes the catch-up window unwalkable — the policy chooses
    rebuild with the reason recorded instead of crashing in the
    classifier; a GLOBAL spec (dims=[]) under a rewrite window
    predicts rebuild (what refresh_rollup actually executes)."""
    from etl_airflow_adventureworks_spark.operators.rollup import (
        maintain_rollup,
    )

    ev, slices = _events_slices(spark)
    spath, rpath = str(tmp_path / "src"), str(tmp_path / "roll")
    src = VersionedTable(spark, spath)
    src.commit(slices[0])
    maintain_rollup(spark, spath, rpath, DIMS, MEASURES)
    src.commit(slices[1], mode="append")
    src.commit(slices[2], mode="append")
    src.vacuum(retain_last=1)  # drops v1, the rollup's reflected version
    plan = maintain_rollup(spark, spath, rpath, DIMS, MEASURES,
                           dry_run=True)
    assert plan["actions"] == ["rebuild"]
    assert any("vacuumed away" in r for r in plan["reasons"])
    rep = maintain_rollup(spark, spath, rpath, DIMS, MEASURES)
    assert rep["mode"] == "rebuild"
    roll = VersionedTable(spark, rpath)
    assert _snap(roll.read()) == _snap(_full_agg(src.read()))

    # GLOBAL spec + rewrite window: plan says rebuild (and matches the
    # executed mode), never a phantom "group_local"
    g_r = str(tmp_path / "groll")
    maintain_rollup(spark, spath, g_r, [], MEASURES)
    src.upsert(
        src.read().filter("event_id % 7 = 0").withColumn(
            "value", F.col("value") + 1.0),
        key="event_id",
    )
    plan = maintain_rollup(spark, spath, g_r, [], MEASURES, dry_run=True,
                           group_local_below_bytes=0)
    assert plan["actions"] == ["rebuild"] and plan["mode"] == "rebuild"
    rep = maintain_rollup(spark, spath, g_r, [], MEASURES,
                          group_local_below_bytes=0)
    assert rep["actions"] == ["rebuild"] and rep["mode"] == "rebuild"


def test_integral_narrowing_cast_never_auto_monotone():
    """r13 review fix: non-ANSI integral narrowing WRAPS (cast(2^31+k AS
    INT) goes negative), so integral-target casts must never
    auto-recognize as monotone — temporal/float/decimal targets (whose
    overflow yields NULL, kept candidate) still do."""
    from etl_airflow_adventureworks_spark.operators.rollup import (
        _monotone_map,
    )

    for dim in ["CAST(big_id AS INT)", "cast(x as bigint) AS b",
                "CAST(x AS SMALLINT)", "cast(x as long)"]:
        assert _monotone_map([dim], None) == {}, dim
    for dim, inner in [("CAST(ts AS DATE)", "ts"),
                       ("CAST(x AS DOUBLE)", "x"),
                       ("CAST(x AS DECIMAL(10,2)) AS d", "x")]:
        assert _monotone_map([dim], None) == {0: inner}, dim


def test_monotone_dim_random_maintenance_sequence(spark, tmp_path):
    """r13 soak: a seeded random interleaving of appends, upserts,
    keyed deletes and ts-clustered OPTIMIZEs on a TIMESTAMP-keyed
    source, with the rollup bucketed ONLY by date_trunc('day', ts)
    (non-retractable measures, so every rewrite window takes the
    group-local path with monotone expression-dim pruning) and the
    refresh driven through maintain_rollup's policy — the rollup must
    equal the from-scratch aggregate after EVERY step, and at least one
    step must have actually pruned files. r14: a replica OF the rollup
    follows every refresh from the recorded change rows and must mirror
    it after every step (the chain under churn)."""
    import datetime as dt
    import random
    import warnings

    from etl_airflow_adventureworks_spark.operators.rollup import (
        _aggregate,
        maintain_rollup,
    )
    from etl_airflow_adventureworks_spark.table import replicate_table

    rng = random.Random(13)
    dims = ["date_trunc('day', ts) AS day"]
    measures = {
        "n": ("count", None),
        "mx": ("max", "v"),
        "mn": ("min", "v"),
        "nd": ("approx_distinct", "u"),
    }
    tpath, rpath = str(tmp_path / "t"), str(tmp_path / "roll")
    t = VersionedTable(spark, tpath)

    def ts_of(k):
        return dt.datetime(2024, 1, 1) + dt.timedelta(
            days=k % 20, hours=(k // 20) % 24)

    live = {k: (float(k % 13), k % 9) for k in range(600)}

    def frame(d):
        return spark.createDataFrame(
            [(k, ts_of(k), v, u) for k, (v, u) in sorted(d.items())],
            "k long, ts timestamp, v double, u long",
        )

    t.commit(frame(live).repartitionByRange(6, "ts")
             .sortWithinPartitions("ts"), stats_cols=["ts"])
    next_k = 10_000
    pruned_steps = 0

    repl_path = str(tmp_path / "roll_replica")

    def do_refresh():
        nonlocal pruned_steps
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            maintain_rollup(spark, tpath, rpath, dims, measures,
                            group_local_below_bytes=0,
                            rebuild_below_bytes=0)
        roll = VersionedTable(spark, rpath)
        op = roll.manifest()["op"] or {}
        if op.get("mode") == "group_local" and \
                op["files_read"] < op["files_total"]:
            pruned_steps += 1
        got = finalize_and_snap(roll.read())
        want = finalize_and_snap(_aggregate(t.read(), dims, measures))
        assert got == want, f"diverged after {op}"
        # r14 chain: the replica consumes the refresh's recorded change
        # rows each step (the bootstrap re-seeds; a rebuild in the
        # window would fail loud -> full_copy recovers, same guidance
        # as production)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            try:
                replicate_table(spark, rpath, repl_path, key="day")
            except ValueError:
                replicate_table(spark, rpath, repl_path, key="day",
                                full_copy=True)
        # compare through finalize_rollup: the merge re-serializes HLL
        # sketch bytes of untouched groups (same content, different slot
        # order), so the replica is CONTENT-equal, not byte-equal — the
        # documented read path is the honest comparison
        assert finalize_and_snap(
            VersionedTable(spark, repl_path).read()
        ) == finalize_and_snap(roll.read()), f"replica diverged after {op}"

    def finalize_and_snap(df):
        from etl_airflow_adventureworks_spark.operators.rollup import (
            finalize_rollup,
        )

        return _snap(finalize_rollup(df, measures))

    do_refresh()
    for step in range(6):
        op = rng.choice(["append", "upsert", "delete", "optimize"])
        if op == "append":
            rows = {next_k + i: (float(rng.randrange(40)), rng.randrange(9))
                    for i in range(30)}
            next_k += 30
            live.update(rows)
            t.commit(frame(rows), mode="append")
        elif op == "upsert":
            # mutate a few keys INSIDE one day (the pruning-friendly
            # window) plus a couple of strays (the adversarial one)
            day_keys = [k for k in live if k % 20 == step][:15]
            muts = {k: (float(rng.randrange(40)), rng.randrange(9))
                    for k in day_keys}
            muts.update({k: (float(rng.randrange(40)), rng.randrange(9))
                         for k in rng.sample(sorted(live), 3)})
            live.update(muts)
            t.upsert(frame(muts), key="k")
        elif op == "delete":
            doomed = rng.sample(sorted(live), 10)
            for k in doomed:
                live.pop(k)
            t.delete_where(f"k IN ({','.join(map(str, doomed))})")
        else:
            t.optimize(cluster_by=["ts"], num_files=6)
        do_refresh()
    assert pruned_steps >= 1  # the monotone pruning actually engaged


def test_refresh_rollup_validates_source_identity(spark, tmp_path):
    """r14 (ADVICE r13): refreshing an existing rollup against the WRONG
    source fails loud BEFORE registering — a mistaken call must not
    plant a registry entry on that table (which would poison its
    vacuum("auto") until a manual retire) or read a nonsense delta
    window; maintain_rollup routes through the same check."""
    from etl_airflow_adventureworks_spark.operators.rollup import (
        maintain_rollup,
    )

    ev, slices = _events_slices(spark)
    a_p, b_p, r_p = (str(tmp_path / n) for n in ("a", "b", "roll"))
    VersionedTable(spark, a_p).commit(slices[0])
    VersionedTable(spark, b_p).commit(slices[1])
    refresh_rollup(spark, a_p, r_p, DIMS, MEASURES)

    for call in (
        lambda: refresh_rollup(spark, b_p, r_p, DIMS, MEASURES),
        lambda: refresh_rollup(spark, b_p, r_p, DIMS, MEASURES,
                               full_rebuild=True),
        lambda: maintain_rollup(spark, b_p, r_p, DIMS, MEASURES),
        lambda: maintain_rollup(spark, b_p, r_p, DIMS, MEASURES,
                                dry_run=True),
    ):
        with pytest.raises(ValueError, match="derived from"):
            call()
    # no phantom registry entry landed on the wrong source
    assert VersionedTable(spark, b_p).consumers() == []
    # the right source still refreshes fine
    VersionedTable(spark, a_p).commit(slices[2], mode="append")
    refresh_rollup(spark, a_p, r_p, DIMS, MEASURES)
    assert _snap(VersionedTable(spark, r_p).read()) == _snap(
        _full_agg(slices[0].unionByName(slices[2])))


def test_maintain_rollup_vacuum_respects_rollup_consumers(spark, tmp_path):
    """r14 (ADVICE r13): the vacuum leg passes respect_consumers="auto"
    — a replica OF THE ROLLUP (auto-registered by replicate_table) must
    not be stranded by the rollup's own retention sweep."""
    import warnings

    from etl_airflow_adventureworks_spark.operators.rollup import (
        maintain_rollup,
    )
    from etl_airflow_adventureworks_spark.table import replicate_table

    dims = ["event_type"]  # unique key -> the rollup is replicable
    measures = {"n": ("count", None), "sv": ("sum", "value")}
    ev, slices = _events_slices(spark)
    s_p, r_p = str(tmp_path / "src"), str(tmp_path / "roll")
    repl_p = str(tmp_path / "roll_replica")
    src = VersionedTable(spark, s_p)
    src.commit(slices[0])
    maintain_rollup(spark, s_p, r_p, dims, measures)        # rollup v1
    replicate_table(spark, r_p, repl_p, key="event_type")   # reflects v1
    src.commit(slices[1], mode="append")
    maintain_rollup(spark, s_p, r_p, dims, measures)        # rollup v2
    src.commit(slices[2], mode="append")
    # refresh to v3 AND vacuum retain_last=1: the lagging replica (v1)
    # clamps retention up loudly instead of being stranded
    roll = VersionedTable(spark, r_p)
    with pytest.warns(RuntimeWarning, match="strand a lagging"):
        maintain_rollup(spark, s_p, r_p, dims, measures,
                        vacuum_retain_last=1)
    assert roll.versions() == [1, 2, 3]
    # replica catches up; this rollup's window was REBUILT by the policy
    # (small source), and rebuild commits record no change rows, so the
    # replica re-seeds (incremental refreshes record their own changes
    # since r14 — see test_rollup_records_own_changes_*) -> sweep proceeds
    replicate_table(spark, r_p, repl_p, key="event_type", full_copy=True)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        maintain_rollup(spark, s_p, r_p, dims, measures,
                        vacuum_retain_last=1)
    assert len(roll.versions()) == 1


def test_maintain_rollup_tolerates_manifest_without_op(spark, tmp_path,
                                                       monkeypatch):
    """r14 (ADVICE r13): if the refresh returns via the already-current
    / token-replay path onto a manifest committed WITHOUT op_info (a
    concurrent legacy writer), maintain_rollup must not KeyError after
    the content action already ran — .get("op") with the predicted mode
    standing in."""
    import etl_airflow_adventureworks_spark.operators.rollup as rmod
    from etl_airflow_adventureworks_spark.operators.rollup import (
        _aggregate,
        _expand_measures,
        maintain_rollup,
    )

    ev, slices = _events_slices(spark)
    s_p, r_p = str(tmp_path / "src"), str(tmp_path / "roll")
    src = VersionedTable(spark, s_p)
    src.commit(slices[0])
    maintain_rollup(spark, s_p, r_p, DIMS, MEASURES)
    src.commit(slices[1], mode="append")

    def legacy_refresh(spark_, sp, rp, dims_, measures_, **kw):
        # a concurrent pre-op_info writer wins the refresh: valid token,
        # correct state, but NO "op" key in the manifest
        v_src = VersionedTable(spark_, sp).manifest()["version"]
        state = _aggregate(VersionedTable(spark_, sp).read(), dims_,
                           _expand_measures(measures_))
        return VersionedTable(spark_, rp).commit(
            state, mode="overwrite",
            idempotency_token=f"rollup-of:v{v_src}",
        )

    monkeypatch.setattr(rmod, "refresh_rollup", legacy_refresh)
    rep = maintain_rollup(spark, s_p, r_p, DIMS, MEASURES,
                          rebuild_below_bytes=0)
    assert rep["actions"] == ["refresh"]
    assert rep["mode"] == "incremental"  # the prediction stands in
    roll = VersionedTable(spark, r_p)
    assert "op" not in roll.manifest()
    assert _snap(roll.read()) == _snap(_full_agg(src.read()))


def test_maintain_dry_run_predicts_group_local_files_read(spark, tmp_path):
    """r14 (VERDICT r13 #7): dry_run on a group-local window runs the
    SAME pruning walk against the current delta (change rows + manifest
    stats, never the source files) and its predicted files_read /
    files_total / groups_touched equal what the real refresh records."""
    import warnings

    from etl_airflow_adventureworks_spark.operators.rollup import (
        _aggregate,
        maintain_rollup,
    )

    dims = ["date_trunc('day', ts) AS day"]
    measures = {"n": ("count", None), "mx": ("max", "v")}
    tpath, rpath = str(tmp_path / "t"), str(tmp_path / "roll")
    t = VersionedTable(spark, tpath)
    t.commit(
        _ts_events(spark).repartitionByRange(8, "ts")
        .sortWithinPartitions("ts"),
        stats_cols=["ts"],
    )
    refresh_rollup(spark, tpath, rpath, dims, measures)
    t.upsert(
        t.read().filter("k >= 1000 and k < 1050").withColumn(
            "v", F.col("v") + 1000.0),
        key="k",
    )
    plan = maintain_rollup(spark, tpath, rpath, dims, measures,
                           dry_run=True, group_local_below_bytes=0)
    assert plan["mode"] == "group_local" and plan["dry_run"]
    pred = plan["predicted"]
    assert pred["groups_touched"] == 1
    assert pred["files_read"] <= pred["files_total"] - 6
    assert any("would read" in r for r in plan["reasons"])
    # dry-run touched nothing
    roll = VersionedTable(spark, rpath)
    assert roll.manifest()["op"]["mode"] == "rebuild"

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        rep = maintain_rollup(spark, tpath, rpath, dims, measures,
                              group_local_below_bytes=0)
    assert rep["mode"] == "group_local"
    op = roll.manifest()["op"]
    assert op["files_read"] == pred["files_read"]
    assert op["files_total"] == pred["files_total"]
    assert op["groups_touched"] == pred["groups_touched"]
    assert _snap(roll.read()) == _snap(_aggregate(t.read(), dims, measures))


def test_declared_non_increasing_monotone_dim_prunes(spark, tmp_path):
    """r14 (VERDICT r13 #5): a declared NON-INCREASING transform
    (0 - unix_timestamp(ts)) prunes via the sorted endpoint images —
    this test fails if _monotone_file_bounds stops min/max'ing the two
    endpoint images (rollup.py's exactness promise for monotone
    transforms in EITHER direction)."""
    import warnings

    from etl_airflow_adventureworks_spark.operators.rollup import _aggregate

    dims = ["0 - unix_timestamp(ts) AS neg_ts"]
    mono = {dims[0]: "ts"}
    measures = {"n": ("count", None), "mx": ("max", "v")}
    tpath, rpath = str(tmp_path / "t"), str(tmp_path / "roll")
    t = VersionedTable(spark, tpath)
    t.commit(
        _ts_events(spark).repartitionByRange(8, "ts")
        .sortWithinPartitions("ts"),
        stats_cols=["ts"],
    )
    refresh_rollup(spark, tpath, rpath, dims, measures, monotone_dims=mono)
    t.upsert(
        t.read().filter("k >= 1000 and k < 1050").withColumn(
            "v", F.col("v") + 1000.0),
        key="k",
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        refresh_rollup(spark, tpath, rpath, dims, measures,
                       monotone_dims=mono)
    roll = VersionedTable(spark, rpath)
    op = roll.manifest()["op"]
    assert op["mode"] == "group_local"
    assert op["files_read"] <= op["files_total"] - 6
    assert _snap(roll.read()) == _snap(_aggregate(t.read(), dims, measures))


def test_unevaluable_declared_monotone_warns_and_reads_full(spark, tmp_path):
    """r14 (VERDICT r13 #6): a declared transform that references a
    SECOND column passes the bare-ident inner check but can never be
    evaluated at the inner column's bounds alone — it must warn (naming
    the expression) instead of silently reading everything forever, and
    fall back to the full (exact) read."""
    from etl_airflow_adventureworks_spark.operators.rollup import _aggregate

    dims = ["unix_timestamp(ts) + k AS weird"]
    mono = {dims[0]: "ts"}
    measures = {"n": ("count", None), "mx": ("max", "v")}
    tpath, rpath = str(tmp_path / "t"), str(tmp_path / "roll")
    t = VersionedTable(spark, tpath)
    t.commit(
        _ts_events(spark).repartitionByRange(8, "ts")
        .sortWithinPartitions("ts"),
        stats_cols=["ts"],
    )
    refresh_rollup(spark, tpath, rpath, dims, measures, monotone_dims=mono)
    t.upsert(
        t.read().filter("k >= 1000 and k < 1050").withColumn(
            "v", F.col("v") + 1000.0),
        key="k",
    )
    with pytest.warns(RuntimeWarning, match="could not be evaluated"):
        refresh_rollup(spark, tpath, rpath, dims, measures,
                       monotone_dims=mono)
    roll = VersionedTable(spark, rpath)
    op = roll.manifest()["op"]
    assert op["mode"] == "group_local"
    assert op["files_read"] == op["files_total"]  # fail-open: full read
    assert _snap(roll.read()) == _snap(_aggregate(t.read(), dims, measures))


def test_monotone_pruning_dst_session_zone_per_column(spark, tmp_path):
    """r14 (VERDICT r13 #1): under a DST SESSION zone, only dims whose
    INNER column is TimestampType decline pruning — a DATE inner column
    decodes zone-free and both comparison sides are computed in this
    (fixed-offset) process under the same session semantics, so the r13
    flagship date-bucket pruning stays ON in non-UTC deployments."""
    import datetime as dt
    import warnings

    from etl_airflow_adventureworks_spark.operators.rollup import _aggregate

    rows = []
    for d in range(16):
        for i in range(200):
            k = d * 200 + i
            rows.append((
                k,
                dt.date(2024, 1, 1 + d),
                dt.datetime(2024, 1, 1 + d, i % 24, i % 60),
                float(k % 97),
            ))
    df = spark.createDataFrame(
        rows, "k long, d date, ts timestamp, v double")
    tpath = str(tmp_path / "t")
    rd_p, rt_p = str(tmp_path / "roll_d"), str(tmp_path / "roll_ts")
    t = VersionedTable(spark, tpath)
    # stats recorded under the (fixed-offset) default session zone
    t.commit(df.repartitionByRange(8, "d").sortWithinPartitions("d"),
             stats_cols=["d", "ts"])

    dims_d = ["date_trunc('day', d) AS day"]       # DATE inner: prunes
    dims_ts = ["date_trunc('day', ts) AS tday"]    # TIMESTAMP inner: no
    measures = {"n": ("count", None), "mx": ("max", "v")}

    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/Sao_Paulo")
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            refresh_rollup(spark, tpath, rd_p, dims_d, measures)
            refresh_rollup(spark, tpath, rt_p, dims_ts, measures)
            # touch one day (day index 5)
            t.upsert(
                t.read().filter("k >= 1000 and k < 1050").withColumn(
                    "v", F.col("v") + 1000.0),
                key="k",
            )
            refresh_rollup(spark, tpath, rd_p, dims_d, measures)
            refresh_rollup(spark, tpath, rt_p, dims_ts, measures)

        op_d = VersionedTable(spark, rd_p).manifest()["op"]
        assert op_d["mode"] == "group_local"
        assert op_d["files_read"] <= op_d["files_total"] - 6  # still prunes
        assert _snap(VersionedTable(spark, rd_p).read()) == _snap(
            _aggregate(t.read(), dims_d, measures))

        op_ts = VersionedTable(spark, rt_p).manifest()["op"]
        assert op_ts["mode"] == "group_local"
        assert op_ts["files_read"] == op_ts["files_total"]  # declined
        assert _snap(VersionedTable(spark, rt_p).read()) == _snap(
            _aggregate(t.read(), dims_ts, measures))
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)


def test_rollup_records_own_changes_replica_syncs_incrementally(
    spark, tmp_path
):
    """r14: incremental/retract refresh commits carry the rollup's OWN
    Delta-CDF change rows (commit(changes_df=...)), so a replica OF the
    rollup syncs at delta cost across refreshes — no full_copy, no fail
    loud — including group inserts, value updates, and emptied-group
    deletes; an empty refresh window records a ZERO delta ("changes":
    []) that stays walkable."""
    import warnings

    from etl_airflow_adventureworks_spark.table import replicate_table

    dims = ["event_type"]
    measures = {"n": ("count", None), "sv": ("sum", "value")}
    ev, slices = _events_slices(spark)
    s_p, r_p = str(tmp_path / "src"), str(tmp_path / "roll")
    repl_p = str(tmp_path / "repl")
    src = VersionedTable(spark, s_p)
    src.commit(slices[0].filter("event_type <> 'view'"))
    refresh_rollup(spark, s_p, r_p, dims, measures)          # bootstrap
    replicate_table(spark, r_p, repl_p, key="event_type")    # seed
    roll = VersionedTable(spark, r_p)
    repl = VersionedTable(spark, repl_p)

    def assert_mirror():
        assert _snap(repl.read()) == _snap(roll.read())

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        # append window (value updates + a NEW group appears): the
        # replica consumes the rollup's recorded changes — no re-seed
        src.commit(slices[1], mode="append")
        refresh_rollup(spark, s_p, r_p, dims, measures)
        assert roll.manifest()["op"]["mode"] == "incremental"
        assert roll.manifest()["changes"]  # the delta was recorded
        replicate_table(spark, r_p, repl_p, key="event_type")
        assert_mirror()

        # retraction window emptying one group entirely: the change
        # rows carry the DELETE and the replica drops the group
        src.delete_where("event_type = 'click'")
        refresh_rollup(spark, s_p, r_p, dims, measures)
        assert roll.manifest()["op"]["mode"] == "retract"
        replicate_table(spark, r_p, repl_p, key="event_type")
        assert_mirror()
        assert repl.read().filter("event_type = 'click'").count() == 0

        # empty refresh window: zero delta recorded, still walkable
        src.commit(src.read().limit(0), mode="append")
        refresh_rollup(spark, s_p, r_p, dims, measures)
        assert roll.manifest()["changes"] == []
        replicate_table(spark, r_p, repl_p, key="event_type")
        assert_mirror()
    assert _snap(roll.read()) == _snap(
        src.read().groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"),
        ))


def test_rollup_of_rollup_refreshes_incrementally(spark, tmp_path):
    """r14: with the rollup recording its own change rows, a SECOND
    rollup built over the first refreshes via the retraction algebra
    (mode 'retract', delta cost) across the first's refresh commits —
    the continuous-aggregate chain base -> daily -> per-type stays
    incremental end to end and exact vs from-scratch."""
    import warnings

    from etl_airflow_adventureworks_spark.operators.rollup import _aggregate

    daily_dims = ["event_type", "to_date(ts) AS day"]
    daily_measures = {"n_events": ("count", None),
                      "sum_value": ("sum", "value")}
    top_dims = ["event_type"]
    top_measures = {"days": ("count", None),
                    "events": ("sum", "n_events"),
                    "val": ("sum", "sum_value")}
    ev, slices = _events_slices(spark)
    s_p = str(tmp_path / "src")
    d_p, t_p = str(tmp_path / "daily"), str(tmp_path / "per_type")
    src = VersionedTable(spark, s_p)
    src.commit(slices[0])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        refresh_rollup(spark, s_p, d_p, daily_dims, daily_measures)
        refresh_rollup(spark, d_p, t_p, top_dims, top_measures)

        # base append + upsert drive daily through incremental AND
        # retract refreshes; the top rollup consumes daily's recorded
        # changes each time — never a rebuild
        src.commit(slices[1], mode="append")
        refresh_rollup(spark, s_p, d_p, daily_dims, daily_measures)
        assert VersionedTable(spark, d_p).manifest()["op"]["mode"] == \
            "incremental"
        refresh_rollup(spark, d_p, t_p, top_dims, top_measures)
        top_man = VersionedTable(spark, t_p).manifest()
        assert top_man["op"]["mode"] == "retract"

        src.upsert(
            slices[0].filter("event_id % 4 = 1").withColumn(
                "value", F.col("value") + 5.0),
            key="event_id",
        )
        refresh_rollup(spark, s_p, d_p, daily_dims, daily_measures)
        assert VersionedTable(spark, d_p).manifest()["op"]["mode"] == \
            "retract"
        refresh_rollup(spark, d_p, t_p, top_dims, top_measures)
        assert VersionedTable(spark, t_p).manifest()["op"]["mode"] == \
            "retract"

    # end-to-end exactness: per-type equals a from-scratch aggregate of
    # the from-scratch daily aggregate of the base
    daily_scratch = _aggregate(src.read(), daily_dims, daily_measures)
    want = _snap(daily_scratch.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("days"),
        F.sum("n_events").alias("events"),
        F.sum("sum_value").alias("val"),
    ))
    assert _snap(VersionedTable(spark, t_p).read()) == want


def test_global_rollup_change_rows_are_one_update(spark, tmp_path):
    """r14 edge: a GLOBAL spec (dims=[]) is one group — each refresh
    records exactly one preimage and one postimage, and row_changes on
    the rollup reconstructs the value history."""
    import warnings

    from etl_airflow_adventureworks_spark.table import CHANGE_TYPE_COL

    ev, slices = _events_slices(spark)
    s_p, r_p = str(tmp_path / "src"), str(tmp_path / "roll")
    src = VersionedTable(spark, s_p)
    src.commit(slices[0])
    measures = {"n": ("count", None), "sv": ("sum", "value")}
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        # record_changes=True forced: this rollup has no registered
        # consumer, so the "auto" default would (correctly) skip it
        refresh_rollup(spark, s_p, r_p, [], measures, record_changes=True)
        src.commit(slices[1], mode="append")
        refresh_rollup(spark, s_p, r_p, [], measures, record_changes=True)
    roll = VersionedTable(spark, r_p)
    delta = roll.row_changes(1).collect()
    kinds = sorted(r[CHANGE_TYPE_COL] for r in delta)
    assert kinds == ["update_postimage", "update_preimage"]
    post = next(r for r in delta
                if r[CHANGE_TYPE_COL] == "update_postimage")
    n_all = slices[0].count() + slices[1].count()
    assert post["n"] == n_all


def test_rollup_survives_its_own_optimize(spark, tmp_path):
    """r14: OPTIMIZE on the ROLLUP table (read-layout clustering) no
    longer bricks the refresh — the sync token is found under the
    rowset-preserving commit, the next refresh stays incremental and
    exact, and the consumer floor still resolves; a FOREIGN content
    commit on the rollup still fails loud."""
    import warnings

    ev, slices = _events_slices(spark)
    s_p, r_p = str(tmp_path / "src"), str(tmp_path / "roll")
    src = VersionedTable(spark, s_p)
    src.commit(slices[0])
    refresh_rollup(spark, s_p, r_p, DIMS, MEASURES)
    roll = VersionedTable(spark, r_p)
    roll.optimize(cluster_by=["event_type"], num_files=2)
    assert not (roll.manifest().get("token") or "").startswith("rollup")

    src.commit(slices[1], mode="append")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        refresh_rollup(spark, s_p, r_p, DIMS, MEASURES)
    assert roll.manifest()["op"]["mode"] == "incremental"
    assert _snap(roll.read()) == _snap(
        _full_agg(slices[0].unionByName(slices[1])))
    # the registry floor resolves through the optimize too
    roll.optimize(cluster_by=["event_type"], num_files=2)
    src.commit(slices[2], mode="append")
    assert src.safe_retain_floor([r_p]) == 2  # rollup lags one version

    # a foreign overwrite is NOT walked past — content changed outside
    # the maintainer, so the refresh refuses exactly as before
    roll.commit(roll.read().limit(1), mode="overwrite")
    with pytest.raises(ValueError, match="not a rollup table"):
        refresh_rollup(spark, s_p, r_p, DIMS, MEASURES)


def test_replica_survives_its_own_optimize_and_validates_source(
    spark, tmp_path
):
    """r14: OPTIMIZE on a REPLICA (read-layout clustering) no longer
    bricks replication — the next sync finds the token under the
    preserving commit and stays incremental; and a replica refuses to
    sync against the WRONG source (the rollup A1 fix's replica twin),
    planting no registry entry there."""
    from etl_airflow_adventureworks_spark.table import replicate_table

    ev, slices = _events_slices(spark)
    s_p, b_p = str(tmp_path / "src"), str(tmp_path / "other")
    repl_p = str(tmp_path / "repl")
    src = VersionedTable(spark, s_p)
    src.commit(slices[0].select("event_id", "event_type", "value"))
    VersionedTable(spark, b_p).commit(
        slices[1].select("event_id", "event_type", "value"))
    replicate_table(spark, s_p, repl_p, key="event_id")
    repl = VersionedTable(spark, repl_p)
    repl.optimize(cluster_by=["event_id"], num_files=2)

    src.upsert(
        slices[0].select("event_id", "event_type", "value")
        .filter("event_id % 9 = 2").withColumn(
            "value", F.col("value") + 3.0),
        key="event_id",
    )
    v = replicate_table(spark, s_p, repl_p, key="event_id")  # no full_copy
    assert _snap_kv(repl.read()) == _snap_kv(src.read())
    assert v == repl.manifest()["version"]

    with pytest.raises(ValueError, match="derived from"):
        replicate_table(spark, b_p, repl_p, key="event_id")
    assert VersionedTable(spark, b_p).consumers() == []


def _snap_kv(df):
    return {tuple(str(r[c]) for c in sorted(df.columns))
            for r in df.collect()}


def test_record_changes_auto_gates_on_registered_consumers(spark, tmp_path):
    """r14: record_changes="auto" (the default) records the refresh's
    change rows exactly when the rollup HAS registered consumers — a
    consumer-less rollup pays nothing, and the chain turns itself on at
    the consumer's first reflect (it self-registers)."""
    import warnings

    from etl_airflow_adventureworks_spark.table import replicate_table

    ev, slices = _events_slices(spark)
    s_p, r_p = str(tmp_path / "src"), str(tmp_path / "roll")
    src = VersionedTable(spark, s_p)
    src.commit(slices[0])
    refresh_rollup(spark, s_p, r_p, ["event_type"],
                   {"n": ("count", None)})
    roll = VersionedTable(spark, r_p)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        # no consumers: the incremental refresh records NO change rows
        src.commit(slices[1], mode="append")
        refresh_rollup(spark, s_p, r_p, ["event_type"],
                       {"n": ("count", None)})
        assert "changes" not in roll.manifest()
        # a replica seeds (and self-registers on the rollup): from the
        # next refresh on, changes are recorded and the replica syncs
        replicate_table(spark, r_p, str(tmp_path / "repl"),
                        key="event_type")
        src.commit(slices[2], mode="append")
        refresh_rollup(spark, s_p, r_p, ["event_type"],
                       {"n": ("count", None)})
        assert roll.manifest().get("changes")
        replicate_table(spark, r_p, str(tmp_path / "repl"),
                        key="event_type")
    assert _snap(VersionedTable(spark, str(tmp_path / "repl")).read()) == \
        _snap(roll.read())
    with pytest.raises(ValueError, match="record_changes"):
        refresh_rollup(spark, s_p, r_p, ["event_type"],
                       {"n": ("count", None)}, record_changes="yes")


def test_maintain_rollup_validates_record_changes_up_front(spark, tmp_path):
    """ADVICE r14: an invalid record_changes fails at the entry point
    even when the policy would pick NO action (already-current rollup) —
    the vacuum_retain_last validation discipline."""
    src_p, roll_p = str(tmp_path / "src"), str(tmp_path / "roll")
    from etl_airflow_adventureworks_spark.operators.rollup import (
        maintain_rollup,
    )

    vt = VersionedTable(spark, src_p)
    vt.commit(spark.createDataFrame([(1, 10)], "g long, x long"))
    measures = {"n": ("count", None)}
    maintain_rollup(spark, src_p, roll_p, ["g"], measures)  # bootstrap
    with pytest.raises(ValueError, match="record_changes"):
        maintain_rollup(spark, src_p, roll_p, ["g"], measures,
                        record_changes="yes")


def test_cow_refresh_rewrites_only_touched_files(spark, tmp_path):
    """r15 (VERDICT r14 #1): with cow=True the refresh commits via
    merge_keyed — on a dims-clustered rollup a one-group window probes
    only the file whose stats admit the key and rewrites only it,
    carrying every other file verbatim; results stay bit-equal to a
    from-scratch rebuild and the sync token walk stays intact."""
    import warnings

    src_p, roll_p, ref_p = (str(tmp_path / n) for n in ("s", "r", "ref"))
    dims = ["g"]
    measures = {"n": ("count", None), "sx": ("sum", "x")}
    rows = [(g, float(g * 10 + i)) for g in range(1, 101) for i in range(5)]
    src = VersionedTable(spark, src_p)
    src.commit(spark.createDataFrame(rows, "g long, x double"),
               stats_cols=["g"])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        refresh_rollup(spark, src_p, roll_p, dims, measures)  # bootstrap
        roll = VersionedTable(spark, roll_p)
        # the bootstrap records per-file stats on the numeric dim
        assert any("g" in e for e in
                   (roll.manifest().get("stats") or {}).values())
        # cluster the rollup by its dim (allowed since r14 — the
        # maintainer-token walk survives OPTIMIZE) so file pruning has
        # disjoint ranges to work with
        roll.optimize(cluster_by=["g"], min_files=4)
        assert len(roll.manifest()["files"]) >= 4

        # one-group window -> only the file containing g=5 is rewritten
        src.commit(spark.createDataFrame([(5, 1.0)], "g long, x double"),
                   mode="append")
        refresh_rollup(spark, src_p, roll_p, dims, measures, cow=True)
        op = roll.manifest()["op"]
        assert op["cow"] is True and op["mode"] == "incremental"
        assert op["files_probed"] == 1          # stats-pruned probe
        assert op["files_rewritten"] == 1
        assert op["files_carried"] >= 3         # the rest carried verbatim

        # bit-equal to a from-scratch rebuild
        refresh_rollup(spark, src_p, ref_p, dims, measures)
        assert _snap(roll.read()) == _snap(VersionedTable(spark, ref_p).read())

        # token self-description: an immediate re-refresh is a no-op
        v = roll.manifest()["version"]
        assert refresh_rollup(spark, src_p, roll_p, dims, measures,
                              cow=True) == v

        # validation: a bad cow value fails loud
        with pytest.raises(ValueError, match="cow must be"):
            refresh_rollup(spark, src_p, roll_p, dims, measures, cow="yes")


def test_cow_retract_emptied_group_and_null_dim_key(spark, tmp_path):
    """CoW under the retraction algebra: a recorded rewrite window that
    empties one group (its rows vanish from the touched file) and
    touches the NULL group key (null-safe key equality end to end) stays
    bit-equal to a rebuild."""
    import warnings

    src_p, roll_p, ref_p = (str(tmp_path / n) for n in ("s", "r", "ref"))
    dims = ["g"]
    measures = {"n": ("count", None), "sx": ("sum", "x")}
    rows = [(g, float(g)) for g in range(1, 41) for _ in range(3)]
    rows += [(None, 7.0), (None, 8.0)]  # the NULL group is a real group
    src = VersionedTable(spark, src_p)
    src.commit(spark.createDataFrame(rows, "g long, x double"),
               stats_cols=["g"])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        refresh_rollup(spark, src_p, roll_p, dims, measures)
        roll = VersionedTable(spark, roll_p)

        src.delete_where("g = 9")                       # empties group 9
        src.upsert(spark.createDataFrame([(None, 100.0)],
                                         "g long, x double"), key="g")
        # NULL-key upsert inserts (SQL join semantics) — the NULL group
        # gains a row either way, which is all this test needs
        refresh_rollup(spark, src_p, roll_p, dims, measures, cow=True)
        op = roll.manifest()["op"]
        assert op["cow"] is True and op["mode"] == "retract"

        refresh_rollup(spark, src_p, ref_p, dims, measures)
        assert _snap(roll.read()) == _snap(VersionedTable(spark, ref_p).read())
        assert roll.read().filter("g = 9").count() == 0
        assert roll.read().filter("g IS NULL").count() == 1


def test_cow_group_local_minmax_hll(spark, tmp_path):
    """CoW on the GROUP-LOCAL path (non-retractable measures): only the
    touched groups re-aggregate from the source AND only the rollup
    files containing them are rewritten; deterministic measures are
    bit-equal to a rebuild and HLL estimates agree through
    finalize_rollup."""
    import warnings

    from etl_airflow_adventureworks_spark.operators.rollup import (
        finalize_rollup,
    )

    src_p, roll_p, ref_p = (str(tmp_path / n) for n in ("s", "r", "ref"))
    dims = ["g"]
    measures = {"n": ("count", None), "mx": ("max", "x"),
                "u": ("approx_distinct", "cast(x AS bigint)")}
    rows = [(g, float(g * 100 + i)) for g in range(1, 31) for i in range(4)]
    src = VersionedTable(spark, src_p)
    src.commit(spark.createDataFrame(rows, "g long, x double"),
               stats_cols=["g"])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        refresh_rollup(spark, src_p, roll_p, dims, measures)
        roll = VersionedTable(spark, roll_p)
        roll.optimize(cluster_by=["g"], min_files=4)

        src.upsert(spark.createDataFrame([(3, 2.5)],
                                         "g long, x double"), key="g")
        refresh_rollup(spark, src_p, roll_p, dims, measures, cow=True,
                       rebuild_advisory_bytes=0)
        op = roll.manifest()["op"]
        assert op["cow"] is True and op["mode"] == "group_local"
        assert op["files_rewritten"] <= 2  # only g=3's file(s)

        refresh_rollup(spark, src_p, ref_p, dims, measures)
        fin = lambda t: finalize_rollup(t.read(), measures)  # noqa: E731
        assert _snap(fin(roll)) == _snap(fin(VersionedTable(spark, ref_p)))


def test_cow_chain_replica_syncs_and_unchanged_pairs_drop(spark, tmp_path):
    """The r14 chain survives the CoW commit shape: a replica OF the
    rollup consumes the recorded change rows across CoW refreshes. And
    r15 (VERDICT r14 #7): a deterministic spec drops update pairs whose
    pre/post rows are value-identical — an upsert replacing a row with
    the SAME value touches the group but records no update pair."""
    import warnings

    from etl_airflow_adventureworks_spark.table import replicate_table

    dims = ["g"]
    measures = {"n": ("count", None), "sx": ("sum", "x")}
    src_p, roll_p, repl_p = (str(tmp_path / n) for n in ("s", "r", "rep"))
    rows = [(g, float(g)) for g in range(1, 21) for _ in range(2)]
    src = VersionedTable(spark, src_p)
    src.commit(spark.createDataFrame(rows, "g long, x double"),
               stats_cols=["g"])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        refresh_rollup(spark, src_p, roll_p, dims, measures)
        replicate_table(spark, roll_p, repl_p, key="g")      # registers
        roll = VersionedTable(spark, roll_p)
        repl = VersionedTable(spark, repl_p)

        # value-moving window: change rows recorded, replica mirrors
        src.commit(spark.createDataFrame([(1, 50.0), (99, 1.0)],
                                         "g long, x double"),
                   mode="append")
        refresh_rollup(spark, src_p, roll_p, dims, measures, cow=True)
        assert roll.manifest()["op"]["cow"] is True
        assert roll.manifest()["changes"]
        replicate_table(spark, roll_p, repl_p, key="g")
        assert _snap(repl.read()) == _snap(roll.read())

        # same-value upsert: group 5 is touched (change rows exist on
        # the SOURCE) but its aggregate is unchanged after the window —
        # replace one (5, 5.0) row with (5, 5.0): retract+insert nets
        # zero, so the deterministic equality filter drops the pair
        src.upsert(spark.createDataFrame([(5, 5.0)], "g long, x double"),
                   key="g")
        # the upsert REPLACED both (5,5.0),(5,5.0) rows with one -> the
        # aggregate DID move (n 2->1); also brush an untouched-value
        # group via a no-op-net window: append then delete the same row
        src.commit(spark.createDataFrame([(7, 123.0)],
                                         "g long, x double"),
                   mode="append")
        src.delete_where("g = 7 AND x = 123.0")
        refresh_rollup(spark, src_p, roll_p, dims, measures, cow=True)
        man = roll.manifest()
        ch = spark.read.parquet(
            *[f"{roll_p}/{f}" for f in man["changes"]]
        ) if man["changes"] else None
        if ch is not None:
            # group 7's net-zero window produced NO update pair
            assert ch.filter("g = 7").count() == 0
            # group 5's real change kept its pair
            assert ch.filter("g = 5").count() == 2
        replicate_table(spark, roll_p, repl_p, key="g")
        assert _snap(repl.read()) == _snap(roll.read())
    assert _snap(roll.read()) == _snap(
        src.read().groupBy("g").agg(
            F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx"))
    )


def test_merge_keyed_contract(spark, tmp_path):
    """VersionedTable.merge_keyed unit contract: validation fails loud
    (schema drift, wrong touch_keys columns, missing/empty keys,
    malformed changes_df, no table), token replay no-ops, and a pure
    token-advance (no touched keys, empty updates) publishes a new
    version carrying the same files."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    empty = df.limit(0)
    with pytest.raises(FileNotFoundError):
        t.merge_keyed(df, ["k"], df.select("k"))
    t.commit(df, stats_cols=["k"])

    with pytest.raises(ValueError, match="at least one key"):
        t.merge_keyed(df, [], df.select("k"))
    with pytest.raises(ValueError, match="exactly the key columns"):
        t.merge_keyed(df, ["k"], df)  # touch_keys carries v too
    with pytest.raises(ValueError, match="match the table schema"):
        t.merge_keyed(df.select("k"), ["k"], df.select("k"))
    with pytest.raises(ValueError, match="no such key column"):
        t.merge_keyed(df, ["nope"], df.select(F.col("k").alias("nope")))
    from etl_airflow_adventureworks_spark.table import CHANGE_TYPE_COL
    bad_ch = df.withColumn("extra", F.lit(1)).withColumn(
        CHANGE_TYPE_COL, F.lit("insert"))
    with pytest.raises(ValueError, match="changes_df"):
        t.merge_keyed(df, ["k"], df.select("k"), changes_df=bad_ch)

    # real merge: replace k=1, delete k=2, insert k=3
    ups = spark.createDataFrame([(1, "A"), (3, "c")], "k long, v string")
    touch = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    v = t.merge_keyed(ups, ["k"], touch, idempotency_token="mk:1")
    assert v == 2
    assert sorted(map(tuple, t.read().collect())) == [(1, "A"), (3, "c")]
    assert t.merge_keyed(ups, ["k"], touch, idempotency_token="mk:1") == 2

    # pure token-advance: same files, new version + token
    before = t.manifest()["files"]
    v = t.merge_keyed(empty, ["k"], empty.select("k"),
                      idempotency_token="mk:2")
    assert v == 3 and t.manifest()["files"] == before
    assert t.manifest()["op"]["files_rewritten"] == 0


def test_verify_replica_content_equality(spark, tmp_path, capsys):
    """r15 (VERDICT r14 #5): verify_replica compares FINALIZED content
    (HLL estimates, deterministic measures exactly) — it passes on a
    delta-synced replica whose FILES/hashes inevitably differ from the
    rollup's (the false-alarm a naive file diff raises), and catches a
    genuinely diverged replica with per-side row counts."""
    import hashlib
    import warnings
    from pathlib import Path

    from etl_airflow_adventureworks_spark.cli import main
    from etl_airflow_adventureworks_spark.operators.rollup import (
        verify_replica,
    )
    from etl_airflow_adventureworks_spark.table import replicate_table

    src_p, roll_p, repl_p = (str(tmp_path / n) for n in ("s", "r", "rep"))
    rows = [(g, gi * 100000 + i)
            for gi, g in enumerate(("a", "b", "c"))
            for i in range(2000)]
    src = VersionedTable(spark, src_p)
    src.commit(spark.createDataFrame(rows, "g string, v long"))
    dims = ["g"]
    measures = {"n": ("count", None), "u": ("approx_distinct", "v")}
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        refresh_rollup(spark, src_p, roll_p, dims, measures)
        replicate_table(spark, roll_p, repl_p, key="g")   # seed+register
        src.commit(spark.createDataFrame([("a", 42)], "g string, v long"),
                   mode="append")
        refresh_rollup(spark, src_p, roll_p, dims, measures)
        replicate_table(spark, roll_p, repl_p, key="g")   # delta sync

    # a file-level diff ALWAYS false-alarms: the two tables share no
    # data files at all
    def file_hashes(p):
        t = VersionedTable(spark, p)
        return {
            hashlib.sha256(
                Path(p, f).read_bytes()).hexdigest()
            for f in t.manifest()["files"]
        }
    assert file_hashes(roll_p) != file_hashes(repl_p)

    # ... while the content verifier passes
    rep = verify_replica(spark, roll_p, repl_p, measures)
    assert rep["equal"] is True
    assert rep["rows_rollup"] == rep["rows_replica"] == 3
    assert rep["only_in_rollup"] == rep["only_in_replica"] == 0

    # CLI twin: exit 0 and a JSON report
    spec = tmp_path / "spec.json"
    spec.write_text(
        '{"dims": ["g"], "measures": {"n": ["count", null], '
        '"u": ["approx_distinct", "v"]}}'
    )
    assert main(["verify-replica", "--rollup", roll_p,
                 "--replica", repl_p, "--spec", str(spec)]) == 0
    assert '"equal": true' in capsys.readouterr().out

    # genuinely diverged replica (a stray writer clobbered a value):
    # the verifier catches it and names the asymmetry
    repl = VersionedTable(spark, repl_p)
    bad = repl.read().withColumn(
        "n", F.when(F.col("g") == "b", F.lit(999)).otherwise(F.col("n"))
    ).localCheckpoint(eager=True)
    repl.commit(bad, mode="overwrite")
    rep = verify_replica(spark, roll_p, repl_p, measures)
    assert rep["equal"] is False
    assert rep["only_in_rollup"] == 1 and rep["only_in_replica"] == 1
    assert main(["verify-replica", "--rollup", roll_p,
                 "--replica", repl_p, "--spec", str(spec)]) == 1


def test_monotone_pruning_dst_process_zone_per_image(spark, tmp_path):
    """r15 (VERDICT r14 #6): under a DST PROCESS zone (AND a DST session
    zone — the branch where r14 declined ALL monotone dims), a dim whose
    inner column and image type are both zone-free (DATE -> INT via
    year()) keeps pruning bit-equal, while a timestamp-IMAGED dim
    (date_trunc over a DATE still returns TIMESTAMP) declines."""
    import datetime as dt
    import os
    import time as _time
    import warnings

    from etl_airflow_adventureworks_spark.operators.rollup import _aggregate

    rows = []
    for y in range(8):
        for i in range(200):
            k = y * 200 + i
            rows.append((k, dt.date(2010 + y, 1 + i % 12, 1 + i % 28),
                         float(k % 97)))
    df = spark.createDataFrame(rows, "k long, d date, v double")
    tpath = str(tmp_path / "t")
    ry_p, rd_p = str(tmp_path / "roll_y"), str(tmp_path / "roll_day")
    t = VersionedTable(spark, tpath)
    t.commit(df.repartitionByRange(8, "d").sortWithinPartitions("d"),
             stats_cols=["d"])

    dims_y = ["year(d) AS y"]                   # INT image: keeps pruning
    dims_day = ["date_trunc('year', d) AS yr"]  # TIMESTAMP image: declines
    measures = {"n": ("count", None), "mx": ("max", "v")}

    tz0 = spark.conf.get("spark.sql.session.timeZone")
    os_tz0 = os.environ.get("TZ")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/Sao_Paulo")
        os.environ["TZ"] = "America/New_York"
        _time.tzset()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            refresh_rollup(spark, tpath, ry_p, dims_y, measures)
            refresh_rollup(spark, tpath, rd_p, dims_day, measures)
            # touch one year (2012: k in [400, 600) — update a slice)
            t.upsert(
                t.read().filter("k >= 400 and k < 430").withColumn(
                    "v", F.col("v") + 1000.0),
                key="k",
            )
            refresh_rollup(spark, tpath, ry_p, dims_y, measures)
            refresh_rollup(spark, tpath, rd_p, dims_day, measures)

            op_y = VersionedTable(spark, ry_p).manifest()["op"]
            assert op_y["mode"] == "group_local"
            assert op_y["files_read"] < op_y["files_total"]  # still prunes
            assert _snap(VersionedTable(spark, ry_p).read()) == _snap(
                _aggregate(t.read(), dims_y, measures))

            op_d = VersionedTable(spark, rd_p).manifest()["op"]
            assert op_d["mode"] == "group_local"
            assert op_d["files_read"] == op_d["files_total"]  # declined
            assert _snap(VersionedTable(spark, rd_p).read()) == _snap(
                _aggregate(t.read(), dims_day, measures))
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
        if os_tz0 is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = os_tz0
        _time.tzset()


def test_cow_auto_policy_size_and_spread(spark, tmp_path, monkeypatch):
    """r15 "auto" CoW policy: below the measured size break-even the
    classic overwrite stays; above it a FILE-LOCAL window commits CoW;
    a SPREAD window (touched keys in most files — measured 0.40-0.81x
    under CoW) stands down to classic even above the size bar. All
    decisions are manifest-only."""
    import warnings

    import etl_airflow_adventureworks_spark.operators.rollup as R

    src_p, roll_p = str(tmp_path / "s"), str(tmp_path / "r")
    dims = ["g"]
    measures = {"n": ("count", None), "sx": ("sum", "x")}
    rows = [(g, float(g)) for g in range(1, 101) for _ in range(3)]
    src = VersionedTable(spark, src_p)
    src.commit(spark.createDataFrame(rows, "g long, x double"),
               stats_cols=["g"])
    roll = VersionedTable(spark, roll_p)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        refresh_rollup(spark, src_p, roll_p, dims, measures)

        # tiny rollup, auto: classic (no cow op marker) — and the
        # classic commit still records dim stats, so a later refresh
        # crossing the size bar is not stats-blind
        src.commit(spark.createDataFrame([(5, 1.0)], "g long, x double"),
                   mode="append")
        refresh_rollup(spark, src_p, roll_p, dims, measures)
        assert "cow" not in roll.manifest()["op"]
        assert any("g" in e for e in
                   (roll.manifest().get("stats") or {}).values())

        # size bar cleared + file-local window: auto commits CoW
        # (cluster first — the classic overwrite collapsed the layout)
        roll.optimize(cluster_by=["g"], min_files=4)
        monkeypatch.setattr(R, "COW_REFRESH_MIN_BYTES", 1)
        src.commit(spark.createDataFrame([(6, 1.0)], "g long, x double"),
                   mode="append")
        refresh_rollup(spark, src_p, roll_p, dims, measures)
        op = roll.manifest()["op"]
        assert op.get("cow") is True
        assert op["files_rewritten"] < op["files_carried"]

        # spread window (one key per file quarter): auto stands down
        src.commit(spark.createDataFrame(
            [(5, 1.0), (30, 1.0), (55, 1.0), (80, 1.0)],
            "g long, x double"), mode="append")
        refresh_rollup(spark, src_p, roll_p, dims, measures)
        assert "cow" not in roll.manifest()["op"]


def test_maintain_dry_run_predicts_cow_decision(spark, tmp_path, monkeypatch):
    """r15: maintain_rollup --dry-run predicts the COMMIT shape too —
    whether the refresh would take the CoW path and how many rollup
    files it would touch — and the prediction matches what the real run
    records."""
    import warnings

    import etl_airflow_adventureworks_spark.operators.rollup as R
    from etl_airflow_adventureworks_spark.operators.rollup import (
        maintain_rollup,
    )

    src_p, roll_p = str(tmp_path / "s"), str(tmp_path / "r")
    dims = ["g"]
    measures = {"n": ("count", None), "sx": ("sum", "x")}
    rows = [(g, float(g)) for g in range(1, 101) for _ in range(3)]
    src = VersionedTable(spark, src_p)
    src.commit(spark.createDataFrame(rows, "g long, x double"),
               stats_cols=["g"])
    roll = VersionedTable(spark, roll_p)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        refresh_rollup(spark, src_p, roll_p, dims, measures)
        roll.optimize(cluster_by=["g"], min_files=4)
        monkeypatch.setattr(R, "COW_REFRESH_MIN_BYTES", 1)

        # file-local window: dry-run predicts CoW with a small candidate
        # count, the real run commits CoW
        src.commit(spark.createDataFrame([(6, 1.0)], "g long, x double"),
                   mode="append")
        rep = maintain_rollup(spark, src_p, roll_p, dims, measures,
                              dry_run=True, rebuild_below_bytes=0)
        assert rep["mode"] == "incremental"
        assert rep["predicted"]["cow"] is True
        assert rep["predicted"]["rollup_files_candidates"] <= 2
        rep2 = maintain_rollup(spark, src_p, roll_p, dims, measures,
                               rebuild_below_bytes=0)
        assert rep2["actions"] == ["refresh"]
        assert roll.manifest()["op"].get("cow") is True

        # spread window: dry-run predicts the stand-down
        src.commit(spark.createDataFrame(
            [(5, 1.0), (30, 1.0), (55, 1.0), (80, 1.0)],
            "g long, x double"), mode="append")
        rep = maintain_rollup(spark, src_p, roll_p, dims, measures,
                              dry_run=True, rebuild_below_bytes=0)
        assert rep["predicted"]["cow"] is False
        assert rep["predicted"]["rollup_files_candidates"] > 2


def test_maintain_table_compacts_cow_rollup_layout(spark, tmp_path,
                                                   monkeypatch):
    """r15: the CoW refresh is a PATCH, not a re-layout — maintain_table
    must see through a run of cow-refresh commits to the optimize that
    recorded the dims clustering (spec + baseline depth), re-cluster
    once edge-group patch files stack past the floor, and the rollup
    must keep refreshing incrementally across the compaction."""
    import warnings

    import etl_airflow_adventureworks_spark.operators.rollup as R
    from etl_airflow_adventureworks_spark.table import maintain_table

    src_p, roll_p = str(tmp_path / "s"), str(tmp_path / "r")
    dims = ["g"]
    measures = {"n": ("count", None), "sx": ("sum", "x")}
    rows = [(g, float(g)) for g in range(1, 101) for _ in range(3)]
    src = VersionedTable(spark, src_p)
    src.commit(spark.createDataFrame(rows, "g long, x double"),
               stats_cols=["g"])
    roll = VersionedTable(spark, roll_p)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        refresh_rollup(spark, src_p, roll_p, dims, measures)
        roll.optimize(cluster_by=["g"], min_files=4)
        monkeypatch.setattr(R, "COW_REFRESH_MIN_BYTES", 1)
        rep0 = maintain_table(spark, roll_p, dry_run=True)
        assert rep0["actions"] == []
        floor = rep0["frag_floor"]

        # edge-group inserts: each CoW refresh lands one patch file
        # spanning [-i-1, 200+i] — outside every prior range, so they
        # stack instead of consolidating
        i = 0
        while maintain_table(spark, roll_p, dry_run=True)["frag_depth"] \
                <= floor:
            src.commit(spark.createDataFrame(
                [(-(i + 1), 1.0), (200 + i, 1.0)], "g long, x double"),
                mode="append")
            refresh_rollup(spark, src_p, roll_p, dims, measures)
            assert roll.manifest()["op"].get("cow") is True
            i += 1
            assert i <= 6, "CoW patches never accrued"

        rep = maintain_table(spark, roll_p)
        assert rep["actions"] == ["compact"]
        assert rep["frag_depth"] <= floor
        man = roll.manifest()
        assert man["op"].get("cluster_by") == ["g"]  # recorded spec
        # the rollup still refreshes incrementally across the optimize
        src.commit(spark.createDataFrame([(50, 2.0)], "g long, x double"),
                   mode="append")
        refresh_rollup(spark, src_p, roll_p, dims, measures)
        from etl_airflow_adventureworks_spark.operators.rollup import (
            finalize_rollup,
        )

        got = finalize_rollup(roll.read(), measures)
        assert got.filter("g = 50").first()["sx"] == 50.0 * 3 + 2.0
        assert got.filter("g = -1").first()["n"] == 1
        assert got.count() == 100 + 2 * i


def test_maintain_rollup_layout_leg_compacts_in_one_call(spark, tmp_path,
                                                         monkeypatch):
    """r15: maintain_rollup's layout leg — the same scheduled call that
    refreshes a CoW rollup also notices its stacked patch files
    (manifest-only probe) and re-clusters past the floor; dry-run
    predicts the compact; maintain_layout=False opts out."""
    import warnings

    import etl_airflow_adventureworks_spark.operators.rollup as R
    from etl_airflow_adventureworks_spark.operators.rollup import (
        maintain_rollup,
    )

    src_p, roll_p = str(tmp_path / "s"), str(tmp_path / "r")
    dims = ["g"]
    measures = {"n": ("count", None), "sx": ("sum", "x")}
    rows = [(g, float(g)) for g in range(1, 101) for _ in range(3)]
    src = VersionedTable(spark, src_p)
    src.commit(spark.createDataFrame(rows, "g long, x double"),
               stats_cols=["g"])
    roll = VersionedTable(spark, roll_p)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        refresh_rollup(spark, src_p, roll_p, dims, measures)
        roll.optimize(cluster_by=["g"], min_files=4)
        monkeypatch.setattr(R, "COW_REFRESH_MIN_BYTES", 1)

        # stack edge-group CoW patches until the NEXT call must compact
        i = 0
        while True:
            src.commit(spark.createDataFrame(
                [(-(i + 1), 1.0), (200 + i, 1.0)], "g long, x double"),
                mode="append")
            rep = maintain_rollup(spark, src_p, roll_p, dims, measures,
                                  rebuild_below_bytes=0,
                                  maintain_layout=False)
            assert rep["actions"] == ["refresh"]  # opted out: no compact
            i += 1
            assert i <= 6, "CoW patches never accrued"
            pred = maintain_rollup(spark, src_p, roll_p, dims, measures,
                                   dry_run=True, rebuild_below_bytes=0)
            if "compact" in pred["actions"]:
                break
        assert any(r.startswith("layout:") for r in pred["reasons"])

        # one more source append so the real call has BOTH legs to run
        src.commit(spark.createDataFrame([(50, 2.0)], "g long, x double"),
                   mode="append")
        rep = maintain_rollup(spark, src_p, roll_p, dims, measures,
                              rebuild_below_bytes=0)
        assert rep["actions"] == ["refresh", "compact"]
        man = roll.manifest()
        assert man["op"].get("cluster_by") == ["g"]  # recorded spec
        from etl_airflow_adventureworks_spark.table import maintain_table

        assert maintain_table(spark, roll_p, dry_run=True)["actions"] == []
        # content intact across refresh+compact
        from etl_airflow_adventureworks_spark.operators.rollup import (
            finalize_rollup,
        )

        got = finalize_rollup(roll.read(), measures)
        assert got.filter("g = 50").first()["sx"] == 50.0 * 3 + 2.0
        assert got.count() == 100 + 2 * i


def test_optimize_carries_sync_token_past_vacuum(spark, tmp_path,
                                                 monkeypatch):
    """r15: an optimize on a rollup (or replica) carries the replaced
    manifest's maintainer token + source in its op, so compact +
    vacuum(retain_last=1) — exactly what maintain_rollup's layout and
    retention legs do together — no longer sweeps the sync point and
    downgrades the next refresh to a full rebuild."""
    import warnings

    from etl_airflow_adventureworks_spark.operators.rollup import (
        _reflected_version, maintain_rollup,
    )
    from etl_airflow_adventureworks_spark.table import replicate_table

    src_p, roll_p = str(tmp_path / "s"), str(tmp_path / "r")
    dims = ["g"]
    measures = {"n": ("count", None), "sx": ("sum", "x")}
    src = VersionedTable(spark, src_p)
    src.commit(spark.createDataFrame(
        [(g, float(g)) for g in range(1, 51)], "g long, x double"),
        stats_cols=["g"])
    roll = VersionedTable(spark, roll_p)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        refresh_rollup(spark, src_p, roll_p, dims, measures)
        roll.optimize(cluster_by=["g"])
        roll.vacuum(retain_last=1)  # sweeps the token-bearing manifest
        assert roll.manifest().get("token") is None  # only the optimize
        assert _reflected_version(roll, src_p) == 1  # carried, not lost
        # double optimize: the carry propagates across chains
        roll.optimize(cluster_by=["g"])
        roll.vacuum(retain_last=1)
        assert _reflected_version(roll, src_p) == 1
        # the next maintenance call refreshes at delta cost — no rebuild
        src.commit(spark.createDataFrame([(7, 1.0)], "g long, x double"),
                   mode="append")
        rep = maintain_rollup(spark, src_p, roll_p, dims, measures,
                              rebuild_below_bytes=0)
        assert rep["actions"] == ["refresh"] and rep["mode"] != "rebuild"

    # replica twin: sync point survives compact + vacuum
    repl_p = str(tmp_path / "repl")
    replicate_table(spark, src_p, repl_p, key="g")
    repl = VersionedTable(spark, repl_p)
    repl.optimize(cluster_by=["g"])
    repl.vacuum(retain_last=1)
    src.commit(spark.createDataFrame([(1000, 2.0)], "g long, x double"),
               mode="append")
    replicate_table(spark, src_p, repl_p, key="g")  # delta sync, loud if
    # the token had been lost ("not a replica table")
    assert repl.read().count() == src.read().count()
