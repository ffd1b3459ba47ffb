"""Connected components over pair graphs (dedup cluster resolution).

The near-dup operators emit verified pairs; turning pairs into KEEP/DROP
decisions needs the transitive closure when chains occur (a~b, b~c ⇒
{a,b,c} is one duplicate cluster even if (a,c) was never emitted).
``curate_corpus`` defaults to greedy pair-drop (documented trade —
components cost an iterative job); this module IS that job for when the
corpus warrants it.

Algorithm: iterative min-label propagation — each node adopts the
minimum label in its closed neighborhood until a fixed point. Per
iteration: one join of labels onto edges + one groupBy min — both keyed
on node id, so AQE reuses the exchange; lineage is cut every iteration
with ``localCheckpoint`` (an iterative plan would otherwise grow
exponentially and re-execute the whole history each pass). Iterations ≈
graph diameter, and near-dup clusters are shallow (pairs come from
banding buckets, so components are quasi-cliques of diameter ~2-3);
``max_iter`` guards pathological chains. At 100 TB the shuffle per
iteration is ∝ edges — the standard alternating large-star/small-star
optimization only pays on power-law web graphs, not on bounded dup
clusters (noted so the upgrade path is explicit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _release_checkpoint(df: DataFrame) -> None:
    """Free the block-manager storage behind a ``localCheckpoint``ed frame.

    ``DataFrame.unpersist()`` is a no-op here — a checkpointed frame is a
    ``LogicalRDD`` over a persisted RDD, not a cache-manager entry — so the
    blocks must be released on the underlying RDD (verified: storage-info
    count drops to zero). Best-effort: reaches through the JVM plan, and a
    failure just means the blocks age out with the session."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:  # pragma: no cover - py4j internals are best-effort
        pass


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve an undirected pair graph to components: returns
    ``(node, component)`` where ``component`` is the MINIMUM node id in
    the component (a stable canonical representative — deterministic, no
    sequence numbers). Nodes appear iff they occur in an edge.

    Raises ``RuntimeError`` if ``max_iter`` passes don't converge (the
    result would be silently wrong)."""
    sym = (
        edges.selectExpr(f"{src} AS a", f"{dst} AS b")
        .union(edges.selectExpr(f"{dst} AS a", f"{src} AS b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev = labels  # previous iteration's checkpointed labels, freed each pass
    for _ in range(max_iter):
        # min label among neighbors (via edges) and self
        neighbor_min = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nmin"))
        )
        updated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    "component", F.coalesce("nmin", F.col("component"))
                ).alias("component"),
                (F.coalesce("nmin", F.col("component")) < F.col("component")).alias(
                    "__changed"
                ),
            )
            .localCheckpoint(eager=True)
        )
        # the new checkpoint materialized from the old one just above —
        # release the old blocks now, or every iteration's label frame
        # stays pinned in executor storage for the life of the job
        _release_checkpoint(prev)
        prev, labels = updated, updated.drop("__changed")
        changed = updated.filter("__changed").limit(1).count()
        if changed == 0:
            _release_checkpoint(sym)  # labels' checkpoint is the result — kept
            return labels
    _release_checkpoint(sym)
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations"
    )


def near_dup_components(pairs: DataFrame) -> DataFrame:
    """(doc_id, component) for every doc in a verified near-dup pair frame
    (``ext_ngram_jaccard`` / ``minhash_neardup_pairs`` / SimHash output
    shape: doc_a < doc_b)."""
    return connected_components(pairs).withColumnRenamed("node", "doc_id")


def drop_near_dup_components(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Keep exactly ONE document (the minimum id — the component label)
    per near-dup cluster, resolving transitive chains that greedy
    pair-drop can miss (pairs (1,3),(2,3) greedy-drop only 3; the
    component {1,2,3} keeps 1 alone). Anti-join of the non-representative
    members."""
    doomed = (
        near_dup_components(pairs)
        .filter(F.col("doc_id") != F.col("component"))
        .select(F.col("doc_id").alias(id_col))
    )
    return docs.join(doomed, id_col, "left_anti")
