"""One-call index maintenance policies (r12, VERDICT r11 #5 + #6):
`maintain_neardup_index` / `maintain_ivf_index` read the staleness
probes and pick no-op / sync / compact / rebuild-refit from SCALING.md's
measured decision table — with a dry_run that reports the plan and why,
and a fragmentation probe (`table.stats_overlap_depth`) that closes the
repeated-sync layout-degradation loop by auto-compacting."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE

from etl_airflow_adventureworks_spark.operators.dedup_incremental import (
    build_neardup_index,
    maintain_neardup_index,
    neardup_index_entries,
)
from etl_airflow_adventureworks_spark.operators.similarity import (
    build_ivf_index,
    ivf_index_rowset_staleness,
    load_ivf_index,
    maintain_ivf_index,
)
from etl_airflow_adventureworks_spark.sources import load_table
from etl_airflow_adventureworks_spark.table import (
    VersionedTable,
    stats_overlap_depth,
)

_VOCAB = [f"w{i}" for i in range(50)]


def _docs(spark, rng, ids):
    rows = [(i, " ".join(rng.choice(_VOCAB) for _ in range(12)))
            for i in ids]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _entries_snap(df):
    return {(r["doc_id"], tuple(sorted(r["hh"])), tuple(r["sig"]))
            for r in df.collect()}


def test_stats_overlap_depth_probe():
    """The fragmentation probe: disjoint clustered ranges -> 1; a patch
    file spanning the whole range -> +1; files without stats count as
    full-range (never prunable)."""
    man = {
        "files": ["a", "b", "c"],
        "stats": {"a": {"k": [0, 9]}, "b": {"k": [10, 19]},
                  "c": {"k": [20, 29]}},
    }
    assert stats_overlap_depth(man, "k") == 1
    man["files"].append("patch")
    man["stats"]["patch"] = {"k": [0, 29]}
    assert stats_overlap_depth(man, "k") == 2
    man["files"].append("nostats")
    assert stats_overlap_depth(man, "k") == 3
    # touching ranges ([0,10],[10,19]) count as overlapping at the point
    man2 = {"files": ["a", "b"],
            "stats": {"a": {"k": [0, 10]}, "b": {"k": [10, 19]}}}
    assert stats_overlap_depth(man2, "k") == 2


def test_maintain_dedup_policy_paths(spark, tmp_path):
    """no-op when unchanged; REBUILD below the corpus-size crossover;
    SYNC above it (forced via rebuild_below_bytes=0); dry_run plans
    without touching; every executed path leaves the index row-identical
    to a from-scratch build."""
    rng = random.Random(3)
    cpath, idx = str(tmp_path / "corpus"), str(tmp_path / "idx")
    cvt = VersionedTable(spark, cpath)
    cvt.commit(_docs(spark, rng, range(40)))                       # v1
    build_neardup_index(spark, cvt.read(), idx, base_path=cpath,
                        base_version=1, num_files=4)

    rep = maintain_neardup_index(spark, idx)
    assert rep["actions"] == [] and rep["kind"] == "unchanged"

    # rewrite window on a SMALL corpus: the policy rebuilds (measured
    # crossover: re-shingling 50k docs beats sync's fixed job chain)
    cvt.upsert(_docs(spark, rng, [3, 7]), key="doc_id")
    v_before = VersionedTable(spark, idx).manifest()["version"]
    plan = maintain_neardup_index(spark, idx, dry_run=True)
    assert plan["actions"] == ["rebuild"] and plan["dry_run"]
    assert VersionedTable(spark, idx).manifest()["version"] == v_before

    rep = maintain_neardup_index(spark, idx)
    assert rep["actions"] == ["rebuild"]
    assert _entries_snap(VersionedTable(spark, idx).read()) == \
        _entries_snap(neardup_index_entries(cvt.read()))
    assert maintain_neardup_index(spark, idx)["actions"] == []

    # force the large-corpus arm: rebuild_below_bytes=0 -> sync
    cvt.delete_where("doc_id = 11")
    rep = maintain_neardup_index(spark, idx, rebuild_below_bytes=0)
    assert rep["actions"][0] == "sync"
    assert _entries_snap(VersionedTable(spark, idx).read()) == \
        _entries_snap(neardup_index_entries(cvt.read()))


def test_maintain_dedup_auto_compacts_fragmented_layout(spark, tmp_path):
    """VERDICT r11 #6's done-gate: scattered sync windows degrade the
    layout's key-range overlap depth toward all-files; the maintain call
    detects it post-sync and re-clusters, restoring depth ~1 — with the
    index rowset identical throughout."""
    rng = random.Random(5)
    cpath, idx = str(tmp_path / "corpus"), str(tmp_path / "idx")
    cvt = VersionedTable(spark, cpath)
    cvt.commit(_docs(spark, rng, range(64)))
    build_neardup_index(spark, cvt.read(), idx, base_path=cpath,
                        base_version=1, num_files=8)
    ivt = VersionedTable(spark, idx)
    assert stats_overlap_depth(ivt.manifest(), "doc_id") == 1

    # a SCATTERED window: doc_ids spanning the whole key range, so the
    # sync patch file straddles every clustered range
    cvt.upsert(_docs(spark, rng, [0, 30, 63]), key="doc_id")
    rep = maintain_neardup_index(spark, idx, rebuild_below_bytes=0,
                                 frag_depth_max=1)
    assert rep["actions"] == ["sync", "compact"]
    assert rep["frag_depth"] == 1  # restored
    assert _entries_snap(ivt.read()) == \
        _entries_snap(neardup_index_entries(cvt.read()))
    # and the compacted layout still syncs (rowset-preserving rewrite)
    cvt.delete_where("doc_id = 30")
    rep = maintain_neardup_index(spark, idx, rebuild_below_bytes=0)
    assert rep["actions"][0] == "sync"
    assert _entries_snap(ivt.read()) == \
        _entries_snap(neardup_index_entries(cvt.read()))


def test_maintain_ivf_policy_paths(spark, tmp_path):
    """sync below the refit threshold, rebuild-refit above it (count
    drift: sync repairs content, never centroid fit), dry_run plans
    without touching, loud refusal for non-versioned-base builds."""
    cpath, idx = str(tmp_path / "emb"), str(tmp_path / "ivf")
    cvt = VersionedTable(spark, cpath)
    cvt.commit(load_table(spark, SF_SMOKE, "embeddings"))
    build_ivf_index(spark, SF_SMOKE, idx, k_cells=4, base_path=cpath)

    rep = maintain_ivf_index(spark, idx)
    assert rep["actions"] == [] and rep["kind"] == "unchanged"

    # small rewrite: content repair via sync (growth << 0.5)
    cvt.upsert(
        cvt.read().filter("vec_id = 9").withColumn(
            "embedding", F.expr("transform(embedding, x -> float(-x))")
        ),
        key="vec_id",
    )
    plan = maintain_ivf_index(spark, idx, dry_run=True)
    assert plan["actions"] == ["sync"]
    with pytest.raises(ValueError, match="rebuild the index"):
        ivf_index_rowset_staleness(spark, idx)  # dry_run touched nothing
    rep = maintain_ivf_index(spark, idx)
    assert rep["actions"][0] == "sync"
    assert ivf_index_rowset_staleness(spark, idx)["kind"] == "unchanged"

    # drift path: the same state crosses a tiny refit threshold -> refit
    cvt.commit(
        cvt.read().limit(5).withColumn(
            "vec_id", F.col("vec_id") + F.lit(900000)),
        mode="append",
    )
    plan = maintain_ivf_index(spark, idx, refit_staleness=0.005,
                              dry_run=True)
    assert plan["actions"] == ["rebuild"]
    rep = maintain_ivf_index(spark, idx, refit_staleness=0.005)
    assert rep["actions"] == ["rebuild"]
    _, meta = load_ivf_index(spark, idx)
    assert meta["n_vectors_at_build"] == cvt.read().count()
    assert rep["growth"] >= 0.005
    assert maintain_ivf_index(spark, idx)["actions"] == []

    # plain-dir builds refuse loud
    plain = str(tmp_path / "plain")
    build_ivf_index(spark, SF_SMOKE, plain, k_cells=4)
    with pytest.raises(ValueError, match="not built with base_path"):
        maintain_ivf_index(spark, plain)


def test_maintain_ivf_auto_compacts_fragmented_layout(spark, tmp_path):
    """Scattered sync patches straddle the cell range; the maintain call
    re-probes AFTER its sync and re-clusters, so one call both repairs
    content and restores per-cell pruning. Since r15's bounded-batch
    coalesce, ONE sync lands a single straddling patch file (depth ==
    floor, no churn) — fragmentation accrues across syncs, so the
    compact triggers on a later maintenance pass."""
    cpath, idx = str(tmp_path / "emb"), str(tmp_path / "ivf")
    cvt = VersionedTable(spark, cpath)
    cvt.commit(load_table(spark, SF_SMOKE, "embeddings"))
    build_ivf_index(spark, SF_SMOKE, idx, k_cells=4, base_path=cpath)
    # mutations spread across the id space -> the patch spans cells
    base_rep = maintain_ivf_index(spark, idx, dry_run=True)
    floor = base_rep["frag_floor"]  # the build's legitimate shape
    rep = None
    for i in range(floor + 1):  # each spread sync adds one straddling file
        cvt.upsert(
            cvt.read().filter(f"vec_id % 40 = {3 + i}").withColumn(
                "embedding", F.expr("transform(embedding, x -> float(-x))")
            ),
            key="vec_id",
        )
        rep = maintain_ivf_index(spark, idx)
        assert rep["actions"][0] == "sync"
        if rep["actions"] == ["sync", "compact"]:
            break
        # pre-compact syncs must not churn the layout
        assert rep["actions"] == ["sync"] and rep["frag_depth"] <= floor
    assert rep["actions"] == ["sync", "compact"]
    # restored to (at most) the clustered shape — never churns below it
    assert rep["frag_depth"] <= floor
    assert ivf_index_rowset_staleness(spark, idx)["kind"] == "unchanged"
    # immediately re-running maintains nothing (no compaction churn on a
    # layout already at its clustered shape)
    assert maintain_ivf_index(spark, idx)["actions"] == []


def test_maintain_vacuum_leg_sweeps_index_storage(spark, tmp_path):
    """r12: the optional vacuum leg completes the lifecycle in the same
    call — dedup: the index table's internal versions sweep to the
    newest N with the rowset intact; ivf: centroid versions + old
    layout dirs sweep (age window zeroed for the test) with serving
    unchanged."""
    from etl_airflow_adventureworks_spark.operators.similarity import (
        ann_ivf_topk_from_index,
    )

    rng = random.Random(11)
    cpath, idx = str(tmp_path / "corpus"), str(tmp_path / "idx")
    cvt = VersionedTable(spark, cpath)
    cvt.commit(_docs(spark, rng, range(40)))
    build_neardup_index(spark, cvt.read(), idx, base_path=cpath,
                        base_version=1, num_files=4)
    for i in range(2):
        cvt.delete_where(f"doc_id = {i}")
        maintain_neardup_index(spark, idx, rebuild_below_bytes=0)
    ivt = VersionedTable(spark, idx)
    assert len(ivt.versions()) >= 3
    rep = maintain_neardup_index(spark, idx, vacuum_retain_last=1)
    assert rep["actions"] == ["vacuum"]  # base unchanged: retention only
    assert len(ivt.versions()) == 1
    assert _entries_snap(ivt.read()) == \
        _entries_snap(neardup_index_entries(cvt.read()))

    epath, ivf = str(tmp_path / "emb"), str(tmp_path / "ivf")
    evt = VersionedTable(spark, epath)
    evt.commit(load_table(spark, SF_SMOKE, "embeddings"))
    build_ivf_index(spark, SF_SMOKE, ivf, k_cells=4, base_path=epath)
    evt.delete_where("vec_id = 30")
    maintain_ivf_index(spark, ivf)                 # sync patch lands
    before = sorted(map(tuple, ann_ivf_topk_from_index(
        spark, ivf, nprobe=4).collect()))
    cvt_cent = VersionedTable(spark, f"{ivf}/centroids")
    assert len(cvt_cent.versions()) >= 2
    rep = maintain_ivf_index(spark, ivf, vacuum_retain_last=1,
                             vacuum_min_age_sec=0)
    assert rep["actions"] == ["vacuum"]
    assert len(cvt_cent.versions()) == 1
    assert sorted(map(tuple, ann_ivf_topk_from_index(
        spark, ivf, nprobe=4).collect())) == before


def test_fit_drift_probe_catches_upsert_blind_spot(spark, tmp_path):
    """r12: an upsert-heavy base mutates vectors WITHOUT moving the
    count, so the count probe reads 0 growth forever — the fit-drift
    probe (mean assigned-centroid distance vs the build's recorded
    baseline, same deterministic sample) reads the decay, and
    maintain(check_fit_drift=True) refits where the default policy
    would sync forever. After the refit the drift baseline resets."""
    from etl_airflow_adventureworks_spark.operators.similarity import (
        ivf_fit_drift,
        ivf_index_staleness,
    )

    cpath, idx = str(tmp_path / "emb"), str(tmp_path / "ivf")
    cvt = VersionedTable(spark, cpath)
    cvt.commit(load_table(spark, SF_SMOKE, "embeddings"))
    build_ivf_index(spark, SF_SMOKE, idx, k_cells=4, base_path=cpath)
    _, meta = load_ivf_index(spark, idx)
    assert meta["fit"] and meta["fit"]["mean_dist"] > 0

    d0 = ivf_fit_drift(spark, idx)
    assert abs(d0["rel_drift"]) < 1e-9  # same snapshot, same sample

    # blast every vector far from the fitted centroids: count unchanged
    cvt.upsert(
        cvt.read().withColumn(
            "embedding",
            F.expr("transform(embedding, x -> float(x * 50.0 + 25.0))"),
        ),
        key="vec_id",
    )
    assert ivf_index_staleness(spark, idx, SF_SMOKE) == 0.0  # blind
    drift = ivf_fit_drift(spark, idx)["rel_drift"]
    assert drift > 0.25

    # scheduler disabled (pre-r13 behavior): syncs — correct content,
    # stale quantizer — and the sync CARRIES the fit baseline forward
    rep = maintain_ivf_index(spark, idx, fit_probe_churn=None)
    assert rep["actions"][0] == "sync" and rep["fit_drift"] is None
    _, meta = load_ivf_index(spark, idx)
    assert meta["fit"]["mean_dist"] == pytest.approx(
        d0["mean_dist_at_build"])
    assert meta["fit"]["sample_mod"] == d0["sample_mod"]
    assert meta["fit"]["base_version"] == 1  # the FIT point, not the sync
    assert ivf_fit_drift(spark, idx)["rel_drift"] > 0.25

    # opt-in fit probe: refits, after which the drift baseline resets
    rep = maintain_ivf_index(spark, idx, check_fit_drift=True,
                             fit_probe_churn=None)
    assert rep["actions"] == ["rebuild"]
    assert rep["fit_drift"] > 0.25
    assert abs(ivf_fit_drift(spark, idx)["rel_drift"]) < 1e-9


def test_maintain_index_subcommand(spark, tmp_path, capsys):
    """CLI verb: dry-run prints the plan + reasons, the real run
    executes it and the index reads level afterwards."""
    from etl_airflow_adventureworks_spark.cli import main

    rng = random.Random(9)
    cpath, idx = str(tmp_path / "corpus"), str(tmp_path / "idx")
    cvt = VersionedTable(spark, cpath)
    cvt.commit(_docs(spark, rng, range(30)))
    build_neardup_index(spark, cvt.read(), idx, base_path=cpath,
                        base_version=1, num_files=2)
    cvt.upsert(_docs(spark, rng, [4]), key="doc_id")
    assert main(["maintain-index", "--index", idx, "--kind", "dedup",
                 "--dry-run"]) == 0
    out = capsys.readouterr().out
    assert "would run" in out and "rebuild" in out
    assert main(["maintain-index", "--index", idx,
                 "--kind", "dedup"]) == 0
    assert "ran" in capsys.readouterr().out
    assert _entries_snap(VersionedTable(spark, idx).read()) == \
        _entries_snap(neardup_index_entries(cvt.read()))
    assert main(["maintain-index", "--index", idx,
                 "--kind", "dedup"]) == 0
    assert "nothing" in capsys.readouterr().out
    # --check-fit-drift is an ivf-only probe
    assert main(["maintain-index", "--index", idx, "--kind", "dedup",
                 "--check-fit-drift"]) == 2
    assert "ivf only" in capsys.readouterr().out


def test_maintain_validates_vacuum_retain_before_any_action(spark, tmp_path):
    """ADVICE r12: --vacuum-retain 0 used to surface as an unhandled
    vacuum() traceback AFTER the content actions already ran, losing the
    report of what executed — both policies now refuse up front, before
    touching anything."""
    rng = random.Random(21)
    cpath, idx = str(tmp_path / "corpus"), str(tmp_path / "idx")
    cvt = VersionedTable(spark, cpath)
    cvt.commit(_docs(spark, rng, range(30)))
    build_neardup_index(spark, cvt.read(), idx, base_path=cpath,
                        base_version=1, num_files=2)
    cvt.upsert(_docs(spark, rng, [5]), key="doc_id")  # content action due
    v_before = VersionedTable(spark, idx).manifest()["version"]
    with pytest.raises(ValueError, match="vacuum_retain_last must be >= 1"):
        maintain_neardup_index(spark, idx, vacuum_retain_last=0)
    # nothing ran: the pending content action is still pending
    assert VersionedTable(spark, idx).manifest()["version"] == v_before
    assert maintain_neardup_index(spark, idx, dry_run=True)["actions"]

    epath, ivf = str(tmp_path / "emb"), str(tmp_path / "ivf")
    evt = VersionedTable(spark, epath)
    evt.commit(load_table(spark, SF_SMOKE, "embeddings"))
    build_ivf_index(spark, SF_SMOKE, ivf, k_cells=4, base_path=epath)
    with pytest.raises(ValueError, match="vacuum_retain_last must be >= 1"):
        maintain_ivf_index(spark, ivf, vacuum_retain_last=-1)

    # CLI arg refuses before any Spark work
    from etl_airflow_adventureworks_spark.cli import main
    assert main(["maintain-index", "--index", idx, "--kind", "dedup",
                 "--vacuum-retain", "0"]) == 2


def test_ivf_rebuild_never_also_syncs(spark, tmp_path):
    """VERDICT r12 #6: one content action per maintenance call — a state
    that mandates the refit (count drift over threshold AND pending
    content repair) runs ONLY the rebuild; a sync of the layout the
    rebuild just replaced can never follow it."""
    cpath, idx = str(tmp_path / "emb"), str(tmp_path / "ivf")
    cvt = VersionedTable(spark, cpath)
    cvt.commit(load_table(spark, SF_SMOKE, "embeddings"))
    build_ivf_index(spark, SF_SMOKE, idx, k_cells=4, base_path=cpath)
    # rewrite (pending content repair) + append (count drift) together
    cvt.upsert(
        cvt.read().filter("vec_id = 3").withColumn(
            "embedding", F.expr("transform(embedding, x -> float(-x))")
        ),
        key="vec_id",
    )
    cvt.commit(
        cvt.read().limit(5).withColumn(
            "vec_id", F.col("vec_id") + F.lit(700000)),
        mode="append",
    )
    plan = maintain_ivf_index(spark, idx, refit_staleness=0.005,
                              dry_run=True)
    assert plan["actions"] == ["rebuild"]
    rep = maintain_ivf_index(spark, idx, refit_staleness=0.005)
    assert rep["actions"] == ["rebuild"]
    assert "sync" not in rep["actions"]
    # the rebuild subsumed the repair: base reads unchanged afterwards
    assert ivf_index_rowset_staleness(spark, idx)["kind"] == "unchanged"


def test_fit_probe_auto_scheduled_by_manifest_churn(spark, tmp_path):
    """r13 (VERDICT r12 #7): the DEFAULT policy now catches the
    upsert-heavy blind spot — when the manifest-only churn walk reads
    >= 50% of the corpus rewritten since the fit, the fit-drift probe
    runs (and refits) WITHOUT check_fit_drift=True; below the churn
    threshold no data pass happens at all."""
    from etl_airflow_adventureworks_spark.operators.similarity import (
        ivf_base_churn_since_fit,
        ivf_fit_drift,
    )

    cpath, idx = str(tmp_path / "emb"), str(tmp_path / "ivf")
    cvt = VersionedTable(spark, cpath)
    cvt.commit(load_table(spark, SF_SMOKE, "embeddings"))
    build_ivf_index(spark, SF_SMOKE, idx, k_cells=4, base_path=cpath)
    _, meta = load_ivf_index(spark, idx)
    assert ivf_base_churn_since_fit(spark, meta) == 0.0

    # small rewrite: churn below the threshold -> plain sync, NO probe
    cvt.upsert(
        cvt.read().filter("vec_id = 5").withColumn(
            "embedding", F.expr("transform(embedding, x -> float(-x))")
        ),
        key="vec_id",
    )
    rep = maintain_ivf_index(spark, idx)
    assert rep["actions"] == ["sync"]
    assert rep["fit_drift"] is None
    assert 0 < rep["churn_since_fit"] < 0.5

    # blast upsert: every vector rewritten, count unchanged — churn
    # crosses the threshold, the probe auto-runs, the policy refits
    cvt.upsert(
        cvt.read().withColumn(
            "embedding",
            F.expr("transform(embedding, x -> float(x * 50.0 + 25.0))"),
        ),
        key="vec_id",
    )
    _, meta = load_ivf_index(spark, idx)
    assert ivf_base_churn_since_fit(spark, meta) >= 1.0
    plan = maintain_ivf_index(spark, idx, dry_run=True)
    assert plan["actions"] == ["rebuild"]
    assert plan["fit_drift"] > 0.25 and plan["churn_since_fit"] >= 1.0
    assert any("auto-scheduled" in r for r in plan["reasons"])
    rep = maintain_ivf_index(spark, idx)
    assert rep["actions"] == ["rebuild"]
    # the refit reset both the fit baseline and the churn origin
    assert abs(ivf_fit_drift(spark, idx)["rel_drift"]) < 1e-9
    _, meta = load_ivf_index(spark, idx)
    assert ivf_base_churn_since_fit(spark, meta) == 0.0
    assert maintain_ivf_index(spark, idx)["actions"] == []

    # unwalkable window (fit version vacuumed) reads as UNKNOWN churn
    # (inf) — the probe must run, not silently skip
    cvt.upsert(
        cvt.read().filter("vec_id = 7").withColumn(
            "embedding", F.expr("transform(embedding, x -> float(-x))")
        ),
        key="vec_id",
    )
    cvt.vacuum(retain_last=1)
    _, meta = load_ivf_index(spark, idx)
    assert ivf_base_churn_since_fit(spark, meta) == float("inf")
