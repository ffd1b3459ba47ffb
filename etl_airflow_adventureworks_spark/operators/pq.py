"""Product quantization (PQ) for embedding search — the byte-sized scan.

E3's existing paths (exact BLAS, LSH buckets, IVF cells) all score the
FULL float vectors; at 100 TB the embedding column itself is the cost
(a 64-dim f64 vector is 512 B — a billion of them is half a terabyte
per replica). PQ is the standard answer (Jégou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011, and every FAISS
deployment): split the vector into ``m`` subspaces, k-means each
subspace to ``k`` codes, store each vector as ``m`` small ints (8 B at
m=8 — a **64× scan-size reduction** here), and score a query against
the codes via ADC (asymmetric distance computation): per query, an
``m × k`` table of subspace inner products is computed ONCE driver-side,
and each candidate costs ``m`` table lookups instead of a ``d``-wide
dot product.

Spark-first shape:
- **training** (`fit_pq_codebooks`) is driver-side numpy Lloyd's over a
  bounded sample — the one deliberately-collected step, same contract
  as `fit_ivf_centroids` (constant-size, index-build time only);
- **encoding** (`pq_code_expr`) is a NATIVE Catalyst expression — the
  per-subspace argmin lowers to the same array_max/array_position trick
  as `ivf_cell_expr`, so codes are computed inside whole-stage codegen
  with zero Python on the scan;
- **scoring** (`ann_pq_topk`) broadcasts the per-query ADC tables and
  scores candidates with ``m`` `element_at` lookups (codegen'd), takes
  the top ``k_top × refine`` PQ candidates, then **re-ranks them with
  the exact cosine** — so the approximation only affects which
  candidates reach the (cheap, tiny) exact stage. ``refine`` is the
  honest recall knob: large enough to cover the collection, the result
  degenerates to the exact answer (asserted in tests, the same
  discipline as IVF's nprobe == k_cells).

Composes with the IVF layout (encode the codes as extra columns of a
cell-partitioned table) — orthogonal: IVF prunes WHICH vectors are
scored, PQ shrinks WHAT is read to score them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import dot, norm, to_double_array
from ..sources import load_table
from .similarity import N_QUERIES, TOP_K, _lit_array


def fit_pq_codebooks(
    spark: SparkSession,
    sf_dir: str,
    m: int = 8,
    k: int = 16,
    iters: int = 10,
    seed: int = 7,
    sample_rows: int = 100_000,
    centroids: list[list[float]] | None = None,
    embeddings: DataFrame | None = None,
) -> list[list[list[float]]]:
    """Train ``m`` per-subspace codebooks of ``k`` centroids each over a
    bounded sample of the embeddings (driver-side numpy Lloyd's,
    deterministic seed/init — index-build time only). The embedding dim
    must divide evenly into ``m`` subspaces. ``embeddings`` (r11)
    overrides the ``sf_dir`` mirror with an explicit collection frame —
    what ``rebuild_ivf_index`` passes so a refit trains on the CURRENT
    base table, not a stale directory snapshot.

    ``centroids`` (r9, VERDICT r8 #6): train on RESIDUALS v − c(v)
    against the given coarse IVF centroids — the standard IVFADC
    refinement (Jégou et al. 2011 §IV). Residuals have strictly smaller
    magnitude than the raw vectors (the coarse quantizer absorbed the
    cell mean), so the same (m, k) budget spends its codes on a tighter
    distribution and the quantization error drops; ADC adds the exact
    q·c(v) term back per probed cell (see ``ann_ivf_pq_topk_from_index``),
    so the approximation error is ONLY the residual's."""
    import numpy as np

    src = (
        embeddings
        if embeddings is not None
        else load_table(spark, sf_dir, "embeddings")
    )
    rows = (
        src.selectExpr(f"{to_double_array('embedding')} AS v")
        .limit(sample_rows)
        .collect()
    )
    x = np.asarray([r["v"] for r in rows], dtype=np.float64)
    n, d = x.shape
    if d % m != 0:
        raise ValueError(f"dim {d} does not split into m={m} subspaces")
    if n < k:
        raise ValueError(f"need >= k={k} sample vectors, have {n}")
    if centroids is not None:
        cents = np.asarray(centroids, dtype=np.float64)
        d2 = (x @ cents.T) - 0.5 * (cents * cents).sum(axis=1)[None, :]
        x = x - cents[d2.argmax(axis=1)]
    dsub = d // m
    rng = np.random.default_rng(seed)
    books = []
    for j in range(m):
        sub = x[:, j * dsub:(j + 1) * dsub]
        cents = sub[rng.choice(n, size=k, replace=False)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cents[c] = sub[mask].mean(axis=0)
        books.append([[float(v) for v in c] for c in cents])
    return books


def pq_code_expr(vec_col: str, codebooks: list[list[list[float]]]) -> str:
    """PQ codes of an array<double> column as ONE native expression:
    array of ``m`` subspace code ids (0-based argmin-L2 == argmax of
    IP − ‖c‖²/2, the `ivf_cell_expr` lowering per subspace). Encode-time
    cost is m × k short dot folds per vector, inside codegen."""
    dsub = len(codebooks[0][0])
    subs = []
    for j, book in enumerate(codebooks):
        sub = f"slice({vec_col}, {j * dsub + 1}, {dsub})"
        scores = ", ".join(
            f"({dot(sub, _lit_array(c))} - {sum(v * v for v in c) / 2.0!r}D)"
            for c in book
        )
        subs.append(
            f"(array_position(array({scores}), array_max(array({scores}))) - 1)"
        )
    return "array(" + ", ".join(subs) + ")"


def _adc_score_expr(tables_col: str, codes_col: str, m: int) -> str:
    """Σ_j tables[j][codes[j]] — m element_at lookups, codegen'd."""
    return " + ".join(
        f"element_at(element_at({tables_col}, {j + 1}), "
        f"CAST(element_at({codes_col}, {j + 1}) + 1 AS INT))"
        for j in range(m)
    )


def residual_expr(vec_col: str, cell_col: str, centroids: list[list[float]]) -> str:
    """v − centroid[cell] as ONE native expression (`zip_with` over the
    vector and the cell's centroid looked up from a literal
    array<array<double>>) — the residual the IVFADC codes quantize.
    Stage it as its own column before `pq_code_expr` so the centroid
    literal appears once, not once per (subspace × code) dot fold."""
    cents = "array(" + ", ".join(_lit_array(c) for c in centroids) + ")"
    return (
        f"zip_with({vec_col}, "
        f"element_at({cents}, CAST({cell_col} + 1 AS INT)), "
        "(a, b) -> a - b)"
    )


def load_pq_quantizer(
    spark: SparkSession, index_path: str, meta: dict
) -> tuple[list[list[list[float]]], bool]:
    """(codebooks, residual?) of a PQ-enabled IVF index build — read from
    the ``_pq_codebooks.json`` INSIDE that version's immutable layout dir
    (version-coupled to the cell assignment by construction). r9 builds
    serialize ``{"residual": bool, "books": [...]}``; pre-r9 files are a
    bare codebook list (raw-vector encoding). Raises FileNotFoundError
    for a plain (non-PQ) build."""
    import json

    from .similarity import _read_fs_text

    try:
        text = _read_fs_text(
            spark, f"{index_path}/{meta['layout_dir']}/_pq_codebooks.json"
        )
    except FileNotFoundError:
        raise FileNotFoundError(
            f"index build at {index_path} (layout {meta['layout_dir']}) has "
            "no PQ codebooks — rebuild with build_ivf_index(..., pq_m=...)"
        ) from None
    parsed = json.loads(text)
    if isinstance(parsed, dict):
        return parsed["books"], bool(parsed.get("residual", False))
    return parsed, False


def load_pq_codebooks(
    spark: SparkSession, index_path: str, meta: dict
) -> list[list[list[float]]]:
    """Codebooks only (see ``load_pq_quantizer`` for the residual flag)."""
    return load_pq_quantizer(spark, index_path, meta)[0]


def ann_ivf_pq_topk_from_index(
    spark: SparkSession,
    index_path: str,
    nprobe: int = 4,
    refine: int = 4,
    version: int | None = None,
) -> DataFrame:
    """Serving-path IVF × PQ top-k over the persisted index: the probe
    prunes to ``nprobe`` cells' FILES (directory pruning, as in
    ``ann_ivf_topk_from_index``) and the candidate stage inside those
    cells reads (vec_id, cell, codes) only — both effects at once. The
    TOP_K × refine ADC survivors per query are re-ranked with the exact
    cosine fetched by id from the same layout. With ``nprobe`` = all
    cells and ``refine`` covering them, degenerates to the exact answer
    restricted to nothing — i.e. the brute-force result (asserted in
    tests).

    Residual builds (r9 default — see ``build_ivf_index(pq_residual=)``):
    codes quantize v − c(v), so the ADC inner product decomposes as
    q·v ≈ q·c(cell) + Σ_j tables[j][codes[j]] — the exact coarse term
    q·c(cell) is computed once per (query, probed cell) driver-side and
    rides the probe row (``qc_ip``); candidates in one cell share it.
    Raw builds carry qc_ip = 0 and the same plan serves both."""
    import numpy as np

    from .similarity import load_ivf_index

    cents, meta = load_ivf_index(spark, index_path, version)
    books, residual = load_pq_quantizer(spark, index_path, meta)
    m = len(books)
    nb = [np.asarray(b, dtype=np.float64) for b in books]
    dsub = nb[0].shape[1]
    layout = f"{index_path}/{meta['layout_dir']}"
    if meta.get("layout_kind") == "vt":
        # r11 repairable layout: per-cell read_where stats pruning in
        # place of directory pruning (see similarity._vt_layout_frames)
        from .similarity import _vt_layout_frames

        coll, coll_probe = _vt_layout_frames(spark, layout, with_codes=True)
    else:
        coll = spark.read.parquet(layout).selectExpr(
            "vec_id", "cell", "codes", f"{to_double_array('embedding')} AS v"
        ).selectExpr("vec_id", "cell", "codes", "v", f"{norm('v')} AS nrm")

        def coll_probe(cells):
            return coll.filter(F.col("cell").isin(cells))  # dir pruning

    cents_np = np.asarray(cents, dtype=np.float64)
    q_rows = (
        coll.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "v", "nrm")
        .collect()
    )
    probes = []
    for r in q_rows:
        qv = np.asarray(r["v"], dtype=np.float64)
        tables = [
            [float(t) for t in nb[j] @ qv[j * dsub:(j + 1) * dsub]]
            for j in range(m)
        ]
        d2 = (cents_np @ qv) - 0.5 * (cents_np * cents_np).sum(axis=1)
        for cell in np.argsort(-d2)[:nprobe]:
            qc_ip = float(cents_np[cell] @ qv) if residual else 0.0
            probes.append(
                (r["vec_id"], list(r["v"]), float(r["nrm"]), int(cell),
                 qc_ip, tables)
            )
    q = spark.createDataFrame(
        probes,
        "query_id long, qv array<double>, qnrm double, qcell long, "
        "qc_ip double, tables array<array<double>>",
    )
    probed_cells = sorted({p[3] for p in probes})
    w_pq = Window.partitionBy("query_id").orderBy(
        F.desc("pq_ip"), F.asc("neighbor_id")
    )
    cand = (
        coll_probe(probed_cells)
        .select("vec_id", "cell", "codes")
        .join(
            F.broadcast(q.select("query_id", "qcell", "qc_ip", "tables")),
            (F.col("qcell") == F.col("cell"))
            & (F.col("query_id") != F.col("vec_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                F.col("qc_ip")
                + F.expr(_adc_score_expr("tables", "codes", m))
            ).alias("pq_ip"),
        )
        .withColumn("rn", F.row_number().over(w_pq))
        .filter(F.col("rn") <= TOP_K * refine)
        .select("query_id", "neighbor_id")
    )
    cos_r = F.round(F.expr(dot("qv", "v")) / (F.col("qnrm") * F.col("nrm")), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    # survivors live in probed cells by construction — the exact-fetch
    # scan keeps the same pruning as the candidate scan
    fetch = coll_probe(probed_cells).select(
        F.col("vec_id").alias("neighbor_id"), "v", "nrm"
    )
    return (
        cand.join(fetch, "neighbor_id")
        .join(
            F.broadcast(
                q.select("query_id", "qv", "qnrm").dropDuplicates(["query_id"])
            ),
            "query_id",
        )
        .select("query_id", "neighbor_id", cos_r.alias("cos_sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .orderBy("query_id", "rn")
        .drop("rn")
    )


def ann_pq_topk(
    spark: SparkSession,
    sf_dir: str,
    codebooks: list[list[list[float]]],
    refine: int = 4,
) -> DataFrame:
    """Approximate top-k neighbors via PQ-ADC + exact re-rank, output-
    compatible with ``ext_ann_cosine_topk`` (query_id, neighbor_id,
    cos_sim). The CANDIDATE scan reads codes (m small ints), not
    vectors; only the ``TOP_K × refine`` PQ survivors per query are
    re-scored with the exact cosine.

    Honest scale note for this FLAT form: the survivor fetch is an
    id-join against the collection, so without a pruned layout that
    stage still scans the vector column — the deployment shape is the
    IVF composition (``ann_ivf_pq_topk_from_index``), where both the
    candidate scan AND the fetch keep the probed cells' directory
    pruning."""
    import numpy as np

    m = len(codebooks)
    e = (
        load_table(spark, sf_dir, "embeddings")
        .selectExpr("vec_id", f"{to_double_array('embedding')} AS v")
        .selectExpr(
            "vec_id", "v", f"{norm('v')} AS nrm",
            f"{pq_code_expr('v', codebooks)} AS codes",
        )
    )
    q_rows = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "v", "nrm")
        .collect()
    )
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    dsub = books[0].shape[1]
    probes = []
    for r in q_rows:
        qv = np.asarray(r["v"], dtype=np.float64)
        tables = [
            [float(t) for t in books[j] @ qv[j * dsub:(j + 1) * dsub]]
            for j in range(m)
        ]
        probes.append((r["vec_id"], list(r["v"]), float(r["nrm"]), tables))
    q = spark.createDataFrame(
        probes,
        "query_id long, qv array<double>, qnrm double, "
        "tables array<array<double>>",
    )
    # candidate stage touches ONLY (vec_id, codes) — m small ints per
    # row, never the vectors; survivors fetch their vectors by id below
    w_pq = Window.partitionBy("query_id").orderBy(
        F.desc("pq_ip"), F.asc("neighbor_id")
    )
    cand = (
        e.select("vec_id", "codes")
        .join(
            F.broadcast(q.select("query_id", "tables")),
            F.col("query_id") != F.col("vec_id"),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.expr(_adc_score_expr("tables", "codes", m)).alias("pq_ip"),
        )
        .withColumn("rn", F.row_number().over(w_pq))
        .filter(F.col("rn") <= TOP_K * refine)
        .select("query_id", "neighbor_id")
    )
    cos_r = F.round(F.expr(dot("qv", "v")) / (F.col("qnrm") * F.col("nrm")), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        cand.join(e.select(F.col("vec_id").alias("neighbor_id"), "v", "nrm"),
                  "neighbor_id")
        .join(F.broadcast(q.select("query_id", "qv", "qnrm")), "query_id")
        .select("query_id", "neighbor_id", cos_r.alias("cos_sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .orderBy("query_id", "rn")
        .drop("rn")
    )
