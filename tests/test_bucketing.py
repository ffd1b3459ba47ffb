"""Bucketed-table co-located join: the 100 TB layout that removes the
fact-side shuffle entirely (pyspark_guide §Partitioning; SURVEY.md §4 —
bucketing replaces the reference's b-tree indexes for join locality)."""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE

from etl_airflow_adventureworks_spark.sources import load_table


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("bucketed_wh")
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    (
        li.write.mode("overwrite")
        .option("path", str(wh / "li_bucketed"))  # external table: explicit path
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
    )
    (
        orders.write.mode("overwrite")
        .option("path", str(wh / "orders_bucketed"))
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_bucketed")
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_bucketed_join_avoids_shuffle(bucketed):
    spark = bucketed
    joined = spark.sql(
        """
        SELECT l.l_orderkey, l.l_quantity, o.o_totalprice
        FROM li_bucketed l JOIN orders_bucketed o ON l.l_orderkey = o.o_orderkey
        """
    )
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located: both sides scan their buckets, no Exchange feeds the join
    assert "Exchange hashpartitioning" not in plan, plan
    # and the result matches the plain (shuffled) join
    li = load_table(spark, SF_SMOKE, "lineitem")
    orders = load_table(spark, SF_SMOKE, "orders")
    expected = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).count()
    assert joined.count() == expected


def test_ann_layout_prunes_to_probed_buckets(spark, tmp_path):
    """The ANN multiprobe docstring's claim, proven end to end: write the
    collection partitioned by the LSH bucket, probe it, and assert the scan
    (a) carries a bucket PartitionFilter, (b) reads ONLY the probed buckets'
    files, and (c) returns exactly the declared query's rows."""
    from etl_airflow_adventureworks_spark.operators.similarity import (
        N_PLANES,
        N_QUERIES,
        ann_lsh_topk_over_layout,
        write_embeddings_layout,
    )
    from etl_airflow_adventureworks_spark.registry import QUERIES

    layout = str(tmp_path / "emb_layout")
    write_embeddings_layout(spark, SF_SMOKE, layout)

    out = ann_lsh_topk_over_layout(spark, layout)
    rows = out.collect()

    # (a) partition pruning visible in the executed scan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan, plan

    # (b) the executed scan's numFiles metric == files in the probed bucket
    # dirs actually present on disk, and strictly fewer than the whole table
    # (inputFiles() is relation-level/pre-pruning, so count via metrics)
    probed = set()
    q = QUERIES["ext_ann_lsh_topk"]  # recompute probe set independently
    qdf = spark.read.parquet(layout).where(f"vec_id < {N_QUERIES}").select("bucket").collect()
    for r in qdf:
        probed |= {int(r["bucket"]) ^ f for f in [0] + [1 << i for i in range(N_PLANES)]}

    import os

    def bucket_files(want_buckets=None):
        n = 0
        for d in os.listdir(layout):
            if not d.startswith("bucket="):
                continue
            if want_buckets is not None and int(d.split("=")[1]) not in want_buckets:
                continue
            n += sum(1 for f in os.listdir(os.path.join(layout, d)) if f.endswith(".parquet"))
        return n

    files_read = scan_num_files(out)
    # the collection scan(s): every one must stay within the probed dirs
    assert files_read, "no FileScan leaf with a numFiles metric found"
    assert max(files_read) <= bucket_files(probed), (files_read, sorted(probed))
    assert max(files_read) < bucket_files()  # genuinely pruned

    # (c) result-identical to the declared multiprobe query
    want = sorted(map(tuple, q(spark, SF_SMOKE).collect()))
    assert sorted(map(tuple, rows)) == want


def scan_num_files(df) -> list:
    """numFiles metric of every executed FileScan (AQE hides scans inside
    query stages → descend .plan(); df.inputFiles() is pre-pruning)."""
    ep = df._jdf.queryExecution().executedPlan()
    if ep.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        ep = ep.executedPlan()
    out = []

    def walk(node):
        m = node.metrics()
        if m.contains("numFiles"):
            out.append(m.apply("numFiles").value())
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))
        try:
            walk(node.plan())
        except Exception:
            pass

    walk(ep)
    return out


def test_ivf_layout_prunes_to_probed_cells(spark, tmp_path):
    """IVF analogue of the LSH layout proof: the cell-partitioned layout
    must scan only the nprobe probed cells' files and return exactly the
    unpartitioned IVF result."""
    import os

    import numpy as np

    from etl_airflow_adventureworks_spark.operators.similarity import (
        N_QUERIES,
        ann_ivf_topk,
        ann_ivf_topk_over_layout,
        fit_ivf_centroids,
        write_embeddings_ivf_layout,
    )

    cents = fit_ivf_centroids(spark, SF_SMOKE, k_cells=16)
    layout = str(tmp_path / "emb_ivf")
    write_embeddings_ivf_layout(spark, SF_SMOKE, layout, cents)

    nprobe = 3
    out = ann_ivf_topk_over_layout(spark, layout, cents, nprobe=nprobe)
    rows = out.collect()

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan, plan

    # probe set recomputed independently: nprobe nearest cells per query
    c = np.asarray(cents)
    probed = set()
    for r in spark.read.parquet(layout).where(f"vec_id < {N_QUERIES}").collect():
        qv = np.asarray(r["embedding"], dtype=np.float64)
        d2 = (c @ qv) - 0.5 * (c * c).sum(axis=1)
        probed |= {int(x) for x in np.argsort(-d2)[:nprobe]}

    def cell_files(want=None):
        n = 0
        for d in os.listdir(layout):
            if not d.startswith("cell="):
                continue
            if want is not None and int(d.split("=")[1]) not in want:
                continue
            n += sum(1 for f in os.listdir(os.path.join(layout, d)) if f.endswith(".parquet"))
        return n

    files_read = scan_num_files(out)
    assert files_read, "no FileScan leaf with a numFiles metric found"
    assert max(files_read) <= cell_files(probed), (files_read, sorted(probed))
    assert max(files_read) < cell_files()

    want = sorted(map(tuple, ann_ivf_topk(spark, SF_SMOKE, cents, nprobe=nprobe).collect()))
    assert sorted(map(tuple, rows)) == want


def test_ivf_persisted_index_round_trip(spark, tmp_path):
    """The IVF index is a SERVING ARTIFACT: build once (k-means + layout +
    manifest-committed centroid table), query many times with no refit.
    The persisted path must return exactly the in-memory result, expose
    honest staleness, and version rebuilds atomically."""
    from etl_airflow_adventureworks_spark.operators.similarity import (
        ann_ivf_topk,
        ann_ivf_topk_from_index,
        build_ivf_index,
        fit_ivf_centroids,
        ivf_index_staleness,
        load_ivf_index,
    )

    idx = str(tmp_path / "ivf_index")
    v1 = build_ivf_index(spark, SF_SMOKE, idx, k_cells=16)
    assert v1 == 1

    # loaded centroids == a fresh deterministic fit (same seed)
    cents, meta = load_ivf_index(spark, idx)
    fresh = fit_ivf_centroids(spark, SF_SMOKE, k_cells=16)
    assert len(cents) == 16
    for a, b in zip(cents, fresh):
        assert a == pytest.approx(b)
    assert meta["built_from"] == SF_SMOKE and meta["version"] == 1

    # serving path: no refit, file-pruned layout, identical results
    got = sorted(
        map(tuple, ann_ivf_topk_from_index(spark, idx, nprobe=3).collect())
    )
    want = sorted(map(tuple, ann_ivf_topk(spark, SF_SMOKE, cents, nprobe=3).collect()))
    assert got == want

    # index built from this collection is fresh; staleness is a count ratio
    assert ivf_index_staleness(spark, idx, SF_SMOKE) == 0.0

    # a rebuild is a NEW committed version (old one stays time-travelable)
    v2 = build_ivf_index(spark, SF_SMOKE, idx, k_cells=16)
    assert v2 == 2
    assert load_ivf_index(spark, idx, version=1)[1]["version"] == 1


def test_ivf_rebuild_keeps_pinned_version_layout_consistent(spark, tmp_path):
    """ADVICE r5 (medium): the layout is versioned WITH the centroids. A
    rebuild under a DIFFERENT quantizer (other k_cells → other cell
    assignment) must not disturb a pinned version-1 query: version-1
    centroids must pair with the version-1 layout, not the latest one —
    mixing them probes cells assigned by the wrong quantizer and silently
    drops neighbors. Vacuum then sweeps the unreferenced layout."""
    from etl_airflow_adventureworks_spark.operators.similarity import (
        ann_ivf_topk_from_index,
        build_ivf_index,
        load_ivf_index,
        vacuum_ivf_index,
    )

    idx = str(tmp_path / "ivf_index")
    assert build_ivf_index(spark, SF_SMOKE, idx, k_cells=16) == 1
    before = sorted(map(tuple, ann_ivf_topk_from_index(spark, idx, nprobe=3).collect()))

    # rebuild with a different quantizer: new immutable layout dir, new cells
    assert build_ivf_index(spark, SF_SMOKE, idx, k_cells=8, seed=11) == 2
    m1 = load_ivf_index(spark, idx, version=1)[1]
    m2 = load_ivf_index(spark, idx, version=2)[1]
    assert m1["layout_dir"] != m2["layout_dir"]

    # the pinned version-1 serving query is byte-identical to its pre-rebuild
    # answer (same centroids AND same layout)
    after = sorted(
        map(tuple, ann_ivf_topk_from_index(spark, idx, nprobe=3, version=1).collect())
    )
    assert after == before
    # the latest version serves from ITS layout
    assert ann_ivf_topk_from_index(spark, idx, nprobe=3).count() > 0

    # retention sweep: with the default age guard a just-written layout is
    # NOT swept (it could be an in-flight build's uncommitted layout) ...
    assert vacuum_ivf_index(spark, idx, retain_last=1) == 0
    import os

    assert m1["layout_dir"] in set(os.listdir(idx))
    # ... with the guard waived, keep only the newest version; v1's goes
    assert vacuum_ivf_index(spark, idx, retain_last=1, min_age_sec=0) == 1
    assert load_ivf_index(spark, idx)[1]["layout_dir"] == m2["layout_dir"]
    names = set(os.listdir(idx))
    assert m2["layout_dir"] in names and m1["layout_dir"] not in names


def test_ivf_index_rowset_staleness_across_base_maintenance(spark, tmp_path):
    """r10 (VERDICT r9 #8): an IVF index built against a declared
    versioned base survives the base's OPTIMIZE (rowset-preserving —
    the layout holds its own copy), classifies appends as gradual
    staleness, and LOUDLY rejects serving after an upsert rewrote rows
    the layout already copied."""
    from pyspark.sql import functions as F

    from etl_airflow_adventureworks_spark.sources import load_table
    from etl_airflow_adventureworks_spark.operators.similarity import (
        ann_ivf_topk_from_index,
        build_ivf_index,
        ivf_index_rowset_staleness,
        load_ivf_index,
    )
    from etl_airflow_adventureworks_spark.table import VersionedTable

    emb = load_table(spark, SF_SMOKE, "embeddings")
    cpath, idx = str(tmp_path / "emb_table"), str(tmp_path / "ivf_index")
    cvt = VersionedTable(spark, cpath)
    cvt.commit(emb)                                               # v1
    build_ivf_index(spark, SF_SMOKE, idx, k_cells=8, base_path=cpath)
    _, meta = load_ivf_index(spark, idx)
    assert meta["base"] == {"path": cpath, "version": 1}
    assert ivf_index_rowset_staleness(spark, idx, meta=meta)["kind"] == "unchanged"

    before = sorted(
        map(tuple, ann_ivf_topk_from_index(spark, idx, nprobe=3).collect())
    )
    cvt.optimize(num_files=1)                                     # v2: compaction
    assert ivf_index_rowset_staleness(spark, idx)["kind"] == "unchanged"
    after = sorted(
        map(tuple, ann_ivf_topk_from_index(spark, idx, nprobe=3).collect())
    )
    assert after == before  # serving untouched by base compaction

    # new vectors the index has never seen: gradual decay, not invalid
    cvt.commit(
        emb.limit(5).withColumn("vec_id", F.col("vec_id") + 100000),
        mode="append",
    )                                                             # v3
    assert ivf_index_rowset_staleness(spark, idx)["kind"] == "appended"

    # an upsert rewrites copied rows -> the cell assignment is invalid
    cvt.upsert(
        emb.limit(1).withColumn(
            "embedding", F.expr("transform(embedding, x -> float(0.0))")
        ),
        key="vec_id",
    )                                                             # v4
    with pytest.raises(ValueError, match="rebuild the index"):
        ivf_index_rowset_staleness(spark, idx)
    st = ivf_index_rowset_staleness(spark, idx, allow_rewritten=True)
    assert st["kind"] == "rewritten" and st["current_base_version"] == 4

    # plain-dir builds keep the count-based probe; no base to walk
    plain = str(tmp_path / "plain")
    build_ivf_index(spark, SF_SMOKE, plain, k_cells=4)
    with pytest.raises(ValueError, match="not built with base_path"):
        ivf_index_rowset_staleness(spark, plain)
