"""Incremental IVF index repair (r11, VERDICT r10 #2): a versioned-base
build writes a repairable VersionedTable layout, and `sync_ivf_index`
consumes the base's row-level change feed — re-assigning changed vectors
to their existing cells, retracting deleted ones — as ONE atomic CDC
apply, after which staleness reads 'unchanged' and the served top-k is
row-identical to brute force at covering nprobe (the quantizer-free
comparison: at nprobe = k_cells every IVF serve IS the exact answer)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from conftest import SF_SMOKE

from etl_airflow_adventureworks_spark.functions.vectors import (
    dot,
    norm,
    to_double_array,
)
from etl_airflow_adventureworks_spark.operators.similarity import (
    N_QUERIES,
    TOP_K,
    ann_ivf_topk_from_index,
    build_ivf_index,
    ivf_index_rowset_staleness,
    load_ivf_index,
    sync_ivf_index,
)
from etl_airflow_adventureworks_spark.sources import load_table
from etl_airflow_adventureworks_spark.table import VersionedTable

K_CELLS = 8


def _brute_topk(df):
    """Exact cosine top-k over an embeddings frame — the oracle every
    covering-nprobe serve must equal (same rounding and tie-break as the
    serving path)."""
    e = df.selectExpr(
        "vec_id", f"{to_double_array('embedding')} AS v"
    ).selectExpr("vec_id", "v", f"{norm('v')} AS nrm")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    cos_r = F.round(F.expr(dot("qv", "v")) / (F.col("qnrm") * F.col("nrm")), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        e.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                cos_r.alias("cos_sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .drop("rn")
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _maintain(spark, cvt):
    """Mixed base maintenance: mutate two indexed vectors (one of them a
    QUERY vector), delete one, append five fresh ones, then compact."""
    emb = cvt.read()
    mutated = emb.filter("vec_id IN (1, 17)").withColumn(
        "embedding", F.expr("transform(embedding, x -> float(-x + 0.25))")
    )
    cvt.upsert(mutated, key="vec_id")
    cvt.delete_where("vec_id = 23")
    appended = (
        emb.filter("vec_id >= 30 AND vec_id < 35")
        .withColumn("vec_id", F.col("vec_id") + F.lit(100000))
        .withColumn("embedding",
                    F.expr("transform(embedding, x -> float(x * 0.5))"))
    )
    cvt.commit(appended, mode="append")
    cvt.optimize(num_files=1)


def test_vt_layout_build_serves_identically_and_prunes(spark, tmp_path):
    """A versioned-base build's VersionedTable layout serves the same
    rows as the brute-force answer at covering nprobe, and a small
    nprobe's executed scans read fewer files than the layout holds
    (stats pruning standing in for directory pruning)."""
    from test_bucketing import scan_num_files

    cpath, idx = str(tmp_path / "emb"), str(tmp_path / "ivf")
    cvt = VersionedTable(spark, cpath)
    cvt.commit(load_table(spark, SF_SMOKE, "embeddings"))
    build_ivf_index(spark, SF_SMOKE, idx, k_cells=K_CELLS, base_path=cpath)
    _, meta = load_ivf_index(spark, idx)
    assert meta["layout_kind"] == "vt"
    layout = VersionedTable(spark, f"{idx}/{meta['layout_dir']}")
    man = layout.manifest()
    assert man.get("stats") and all(
        "cell" in (man["stats"].get(f) or {}) for f in man["files"]
    )

    got = ann_ivf_topk_from_index(spark, idx, nprobe=K_CELLS)
    assert _rows(got) == _rows(_brute_topk(cvt.read()))

    pruned = ann_ivf_topk_from_index(spark, idx, nprobe=2)
    pruned.collect()
    total = len(man["files"])
    counts = scan_num_files(pruned)
    assert counts and all(c < total for c in counts if c > 0), (
        counts, total)


def test_sync_ivf_index_repairs_across_base_maintenance(spark, tmp_path):
    """upsert + delete + append + optimize on the base: staleness goes
    'rewritten' (loud) -> ONE sync -> 'unchanged', the layout rowset
    matches the base, and the served top-k equals brute force over the
    CURRENT base at covering nprobe — including the mutated query
    vector's new neighbors and the deleted vector's absence."""
    cpath, idx = str(tmp_path / "emb"), str(tmp_path / "ivf")
    cvt = VersionedTable(spark, cpath)
    cvt.commit(load_table(spark, SF_SMOKE, "embeddings"))          # v1
    build_ivf_index(spark, SF_SMOKE, idx, k_cells=K_CELLS, base_path=cpath)

    _maintain(spark, cvt)                                          # v2..v5
    with pytest.raises(ValueError, match="rebuild the index"):
        ivf_index_rowset_staleness(spark, idx)

    v = sync_ivf_index(spark, idx, idempotency_token="sync:1")
    assert ivf_index_rowset_staleness(spark, idx)["kind"] == "unchanged"
    # re-sync while level: version-stable no-op
    assert sync_ivf_index(spark, idx) == v

    _, meta = load_ivf_index(spark, idx)
    layout = VersionedTable(spark, f"{idx}/{meta['layout_dir']}")
    assert layout.read().count() == cvt.read().count()
    assert layout.read().filter("vec_id = 23").count() == 0

    got = ann_ivf_topk_from_index(spark, idx, nprobe=K_CELLS)
    assert _rows(got) == _rows(_brute_topk(cvt.read()))

    # continued maintenance keeps working incrementally
    cvt.delete_where("vec_id = 17")                                # v6
    sync_ivf_index(spark, idx)
    got = ann_ivf_topk_from_index(spark, idx, nprobe=K_CELLS)
    assert _rows(got) == _rows(_brute_topk(cvt.read()))


def test_sync_ivf_pq_index_reencodes_with_stored_quantizer(spark, tmp_path):
    """A PQ (IVFADC residual) build syncs too: changed vectors re-encode
    with the STORED codebooks (no refit), and the PQ serve at covering
    nprobe + covering refine still degenerates to the exact answer over
    the post-maintenance base."""
    from etl_airflow_adventureworks_spark.operators.pq import (
        ann_ivf_pq_topk_from_index,
    )

    cpath, idx = str(tmp_path / "emb"), str(tmp_path / "ivf")
    cvt = VersionedTable(spark, cpath)
    cvt.commit(load_table(spark, SF_SMOKE, "embeddings"))
    build_ivf_index(spark, SF_SMOKE, idx, k_cells=K_CELLS, pq_m=16,
                    pq_k=64, base_path=cpath)
    _maintain(spark, cvt)
    sync_ivf_index(spark, idx)
    assert ivf_index_rowset_staleness(spark, idx)["kind"] == "unchanged"

    _, meta = load_ivf_index(spark, idx)
    layout = VersionedTable(spark, f"{idx}/{meta['layout_dir']}")
    n = layout.read().count()
    assert layout.read().filter("codes IS NULL").count() == 0
    got = ann_ivf_pq_topk_from_index(
        spark, idx, nprobe=K_CELLS, refine=(n // TOP_K) + 1
    )
    assert _rows(got) == _rows(_brute_topk(cvt.read()))


def test_vacuum_sweeps_synced_layout_versions(spark, tmp_path):
    """r11: vacuum_ivf_index also vacuums a repairable layout's internal
    versions (sync patches accumulate them) — after the sweep only the
    newest layout state remains on disk and serving is unchanged."""
    from etl_airflow_adventureworks_spark.operators.similarity import (
        vacuum_ivf_index,
    )

    cpath, idx = str(tmp_path / "emb"), str(tmp_path / "ivf")
    cvt = VersionedTable(spark, cpath)
    cvt.commit(load_table(spark, SF_SMOKE, "embeddings"))
    build_ivf_index(spark, SF_SMOKE, idx, k_cells=4, base_path=cpath)
    for i in range(2):
        cvt.delete_where(f"vec_id = {40 + i}")
        sync_ivf_index(spark, idx)
    _, meta = load_ivf_index(spark, idx)
    layout = VersionedTable(spark, f"{idx}/{meta['layout_dir']}")
    assert len(layout.versions()) == 3  # build + 2 sync patches
    before = _rows(ann_ivf_topk_from_index(spark, idx, nprobe=4))

    vacuum_ivf_index(spark, idx, retain_last=1, min_age_sec=0)
    assert len(layout.versions()) == 1
    assert _rows(ann_ivf_topk_from_index(spark, idx, nprobe=4)) == before
    assert _rows(_brute_topk(cvt.read())) == before


def test_optimize_ivf_layout_restores_cell_pruning(spark, tmp_path):
    """Sync patches fragment the layout (a patch file's cell range
    straddles cells, so per-cell read_where must open it for every
    probe); optimize_ivf_layout re-clusters hierarchically — after it,
    one cell's read opens strictly fewer files, serving is unchanged,
    and the next sync still applies (rowset-preserving compaction)."""
    from etl_airflow_adventureworks_spark.operators.similarity import (
        optimize_ivf_layout,
    )

    cpath, idx = str(tmp_path / "emb"), str(tmp_path / "ivf")
    cvt = VersionedTable(spark, cpath)
    cvt.commit(load_table(spark, SF_SMOKE, "embeddings"))
    build_ivf_index(spark, SF_SMOKE, idx, k_cells=K_CELLS, base_path=cpath)
    # spread mutations across the key space so the patch file's cell
    # range is wide — the fragmentation case
    cvt.upsert(
        cvt.read().filter("vec_id % 40 = 3").withColumn(
            "embedding", F.expr("transform(embedding, x -> float(-x))")
        ),
        key="vec_id",
    )
    sync_ivf_index(spark, idx)
    _, meta = load_ivf_index(spark, idx)
    layout = VersionedTable(spark, f"{idx}/{meta['layout_dir']}")

    def files_for_cell(c):
        return len(layout.read_where({"cell": (c, c)}).inputFiles())

    before_serve = _rows(ann_ivf_topk_from_index(spark, idx, nprobe=K_CELLS))
    frag = max(files_for_cell(c) for c in range(K_CELLS))
    assert frag >= 2  # at least one cell must also open a patch file

    optimize_ivf_layout(spark, idx, num_files=K_CELLS)
    after = max(files_for_cell(c) for c in range(K_CELLS))
    assert after < frag
    assert _rows(
        ann_ivf_topk_from_index(spark, idx, nprobe=K_CELLS)
    ) == before_serve

    # the compaction is rowset-preserving: a later sync still applies
    cvt.delete_where("vec_id = 7")
    sync_ivf_index(spark, idx)
    assert _rows(
        ann_ivf_topk_from_index(spark, idx, nprobe=K_CELLS)
    ) == _rows(_brute_topk(cvt.read()))


def test_rebuild_ivf_index_refits_from_current_base(spark, tmp_path):
    """r11: the refit leg — after base maintenance, rebuild_ivf_index
    retrains the quantizer on the CURRENT base snapshot (the sf_dir
    mirror is stale by then), recovering directly from 'rewritten'
    without a sync; a PQ build retrains codebooks with the same
    (m, k, residual) shape and still degenerates to the exact answer
    at covering settings."""
    from etl_airflow_adventureworks_spark.operators.pq import (
        ann_ivf_pq_topk_from_index,
        load_pq_quantizer,
    )
    from etl_airflow_adventureworks_spark.operators.similarity import (
        rebuild_ivf_index,
    )

    cpath, idx = str(tmp_path / "emb"), str(tmp_path / "ivf")
    cvt = VersionedTable(spark, cpath)
    cvt.commit(load_table(spark, SF_SMOKE, "embeddings"))
    build_ivf_index(spark, SF_SMOKE, idx, k_cells=K_CELLS, base_path=cpath)
    _maintain(spark, cvt)
    with pytest.raises(ValueError, match="rebuild the index"):
        ivf_index_rowset_staleness(spark, idx)

    # the count probe measures the BASE (the sf_dir mirror is frozen):
    # net +4 vectors since the build -> nonzero drift
    from etl_airflow_adventureworks_spark.operators.similarity import (
        ivf_index_staleness,
    )

    assert ivf_index_staleness(spark, idx, SF_SMOKE) > 0

    rebuild_ivf_index(spark, idx)
    st = ivf_index_rowset_staleness(spark, idx)
    assert st["kind"] == "unchanged"
    assert ivf_index_staleness(spark, idx, SF_SMOKE) == 0.0
    _, meta = load_ivf_index(spark, idx)
    assert meta["layout_kind"] == "vt"
    assert meta["n_vectors_at_build"] == cvt.read().count()
    got = ann_ivf_topk_from_index(spark, idx, nprobe=K_CELLS)
    assert _rows(got) == _rows(_brute_topk(cvt.read()))

    # PQ refit: same quantizer shape, exact at covering nprobe + refine
    c2, idx2 = str(tmp_path / "emb2"), str(tmp_path / "ivf2")
    cvt2 = VersionedTable(spark, c2)
    cvt2.commit(load_table(spark, SF_SMOKE, "embeddings"))
    build_ivf_index(spark, SF_SMOKE, idx2, k_cells=K_CELLS, pq_m=16,
                    pq_k=64, base_path=c2)
    _maintain(spark, cvt2)
    rebuild_ivf_index(spark, idx2)
    _, meta2 = load_ivf_index(spark, idx2)
    books, residual = load_pq_quantizer(spark, idx2, meta2)
    assert len(books) == 16 and len(books[0]) == 64 and residual
    n = VersionedTable(spark, f"{idx2}/{meta2['layout_dir']}").read().count()
    got = ann_ivf_pq_topk_from_index(
        spark, idx2, nprobe=K_CELLS, refine=(n // TOP_K) + 1
    )
    assert _rows(got) == _rows(_brute_topk(cvt2.read()))


def test_sync_carries_additive_base_schema_evolution(spark, tmp_path):
    """r12 (VERDICT r11 #2): a base that additively grew a payload column
    in the sync window stays incremental — the layout is widened first by
    a zero-row schema append (pre-evolution rows surface NULL, exactly
    like the base's own old files), the synced rows carry the new
    column's values, and serving still equals brute force over the
    current base."""
    cpath, idx = str(tmp_path / "emb"), str(tmp_path / "ivf")
    cvt = VersionedTable(spark, cpath)
    cvt.commit(load_table(spark, SF_SMOKE, "embeddings"))
    build_ivf_index(spark, SF_SMOKE, idx, k_cells=K_CELLS, base_path=cpath)

    # additive evolution: append fresh vectors carrying a NEW column,
    # then mutate an old vector under the widened schema
    appended = (
        cvt.read().filter("vec_id < 5")
        .withColumn("vec_id", F.col("vec_id") + F.lit(200000))
        .withColumn("lang", F.lit("en"))
    )
    cvt.commit(appended, mode="append")
    cvt.upsert(
        cvt.read().filter("vec_id = 1").withColumn(
            "embedding", F.expr("transform(embedding, x -> float(-x))")
        ),
        key="vec_id",
    )

    sync_ivf_index(spark, idx)
    assert ivf_index_rowset_staleness(spark, idx)["kind"] == "unchanged"
    _, meta = load_ivf_index(spark, idx)
    lay = VersionedTable(spark, f"{idx}/{meta['layout_dir']}").read()
    assert "lang" in lay.columns
    assert lay.filter("vec_id >= 200000 AND lang = 'en'").count() == 5
    old = lay.filter("vec_id < 200000")
    assert old.filter("lang IS NULL").count() == old.count()  # NULL backfill
    got = ann_ivf_topk_from_index(spark, idx, nprobe=K_CELLS)
    assert _rows(got) == _rows(
        _brute_topk(cvt.read().select("vec_id", "embedding"))
    )
    # replaying the same window (crash between widen and stamp) no-ops
    v = sync_ivf_index(spark, idx)
    assert sync_ivf_index(spark, idx) == v


def test_sync_restamp_conflict_repairs_with_older_stamp(
    spark, tmp_path, monkeypatch
):
    """r12 (review finding): when a concurrent centroid writer lands
    between a sync's CDC apply and its re-stamp, the two writers'
    layout patches may have interleaved — so the loser must re-stamp
    with the OLDER of the two base versions (the next sync then replays
    the union window, whose per-key finals land idempotently) instead
    of trusting the winner's stamp over possibly-mixed layout content.
    The pre-fix behavior returned the winner's newer stamp, silently
    stranding the loser's overwrites forever."""
    from etl_airflow_adventureworks_spark.table import (
        VersionedTable as VT,
        latest_base_stamp,
    )

    cpath, idx = str(tmp_path / "emb"), str(tmp_path / "ivf")
    cvt = VersionedTable(spark, cpath)
    cvt.commit(load_table(spark, SF_SMOKE, "embeddings"))          # v1
    build_ivf_index(spark, SF_SMOKE, idx, k_cells=4, base_path=cpath)
    cvt.upsert(
        cvt.read().filter("vec_id = 5").withColumn(
            "embedding", F.expr("transform(embedding, x -> float(-x))")
        ),
        key="vec_id",
    )                                                              # v2

    orig = VT._publish_manifest
    injected = {}

    def racy(self, man):
        op = man.get("op") or {}
        if op.get("op") == "ivf_sync" and "done" not in injected:
            injected["done"] = True
            # the competitor: a concurrent writer that already stamped
            # an OLDER base version (e.g. a rebuild that started before
            # our window) — lands first, taking our target version
            comp = dict(man)
            comp["token"] = "competitor"
            comp["op"] = dict(op, base={"path": cpath, "version": 1})
            orig(self, comp)
        return orig(self, man)

    monkeypatch.setattr(VT, "_publish_manifest", racy)
    sync_ivf_index(spark, idx, idempotency_token="job:7")
    monkeypatch.setattr(VT, "_publish_manifest", orig)
    assert injected  # the conflict really fired

    # the loser re-stamped with min(ours=2, winner=1) = 1 — conservative
    stamp = latest_base_stamp(VersionedTable(spark, f"{idx}/centroids"))
    assert stamp == {"path": cpath, "version": 1}

    # an at-least-once orchestrator RETRY with the SAME token must still
    # repair: the layout apply's token is window-scoped, so the repaired
    # stamp's union window is never mistaken for a replay of the
    # original (the pre-fix silent-corruption case), and the re-stamp
    # advances past the +occ marker
    sync_ivf_index(spark, idx, idempotency_token="job:7")
    assert ivf_index_rowset_staleness(spark, idx)["kind"] == "unchanged"
    got = ann_ivf_topk_from_index(spark, idx, nprobe=4)
    assert _rows(got) == _rows(_brute_topk(cvt.read()))

    # and a LATER window under the same flow stays incremental + exact
    cvt.delete_where("vec_id = 9")
    sync_ivf_index(spark, idx)
    assert ivf_index_rowset_staleness(spark, idx)["kind"] == "unchanged"
    got = ann_ivf_topk_from_index(spark, idx, nprobe=4)
    assert _rows(got) == _rows(_brute_topk(cvt.read()))


def test_sync_refuses_plain_and_pre_r11_indexes(spark, tmp_path):
    """No base stamp -> loud; a base-stamped index whose layout is the
    immutable directory kind (pre-r11 build) -> loud with rebuild
    advice, never a partial patch."""
    plain = str(tmp_path / "plain")
    build_ivf_index(spark, SF_SMOKE, plain, k_cells=4)
    with pytest.raises(ValueError, match="not built with base_path"):
        sync_ivf_index(spark, plain)

    cpath, idx = str(tmp_path / "emb"), str(tmp_path / "ivf")
    cvt = VersionedTable(spark, cpath)
    cvt.commit(load_table(spark, SF_SMOKE, "embeddings"))
    build_ivf_index(spark, SF_SMOKE, idx, k_cells=4, base_path=cpath)
    # simulate a pre-r11 manifest: same centroid rows, op without the
    # layout_kind marker (the r10 shape)
    cvt_cent = VersionedTable(spark, f"{idx}/centroids")
    cvt_cent.commit(
        cvt_cent.read().localCheckpoint(eager=True),
        mode="overwrite",
        op_info={"op": "ivf_build",
                 "base": {"path": cpath, "version": 1}},
    )
    cvt.upsert(cvt.read().limit(1), key="vec_id")
    with pytest.raises(ValueError, match="immutable directory layout"):
        sync_ivf_index(spark, idx)
