"""Gates for operators/graph.py (connected components over pair graphs),
checked against a pure-python union-find oracle."""

from __future__ import annotations

import random

import pytest

from conftest import SF_ORACLE

import __spark_entry__ as entrymod
from etl_airflow_adventureworks_spark.operators.graph import (
    connected_components,
    drop_near_dup_components,
)
from etl_airflow_adventureworks_spark.sources import load_table


def _uf_components(pairs):
    """Union-find oracle: node -> min id of its component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_components_match_union_find_on_minhash_pairs(spark):
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in entrymod.queries()["ext_minhash_neardup"](spark, SF_ORACLE).collect()
    ]
    assert pairs
    edges = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {
        r["node"]: r["component"] for r in connected_components(edges).collect()
    }
    assert got == _uf_components(pairs)


def test_components_on_random_graph_with_chains(spark):
    rng = random.Random(7)
    # long chains + stars + singleton pairs: exercises multi-iteration
    # propagation (diameter > 1) and the convergence check
    pairs = []
    base = 0
    for chain_len in (2, 5, 9, 17):
        ids = list(range(base, base + chain_len))
        pairs += list(zip(ids, ids[1:]))
        base += chain_len + 3
    for _ in range(30):
        a = rng.randrange(1000, 1100)
        b = rng.randrange(1000, 1100)
        if a != b:
            pairs.append((min(a, b), max(a, b)))
    edges = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {
        r["node"]: r["component"] for r in connected_components(edges).collect()
    }
    assert got == _uf_components(pairs)


def test_drop_components_resolves_transitive_chain(spark):
    # pairs (1,3),(2,3): greedy pair-drop keeps {1,2}; components keep {1}
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 9)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 3), (2, 3)], "doc_a long, doc_b long")
    kept = {r["doc_id"] for r in drop_near_dup_components(docs, pairs).collect()}
    assert kept == {1, 9}


def test_iteration_checkpoints_released(spark):
    # every iteration localCheckpoints a new label frame; the previous
    # iteration's blocks must be released as it goes (a 17-node chain runs
    # ~5 propagation passes — without the release, 5+ label frames stay
    # pinned in executor storage for the life of the job). Only the result
    # frame's checkpoint may remain.
    sc = spark.sparkContext

    def persisted():
        return len(list(sc._jsc.sc().getRDDStorageInfo()))

    ids = list(range(17))
    edges = spark.createDataFrame(
        list(zip(ids, ids[1:])), "doc_a long, doc_b long"
    )
    before = persisted()
    res = connected_components(edges)
    res.count()
    assert persisted() - before <= 1, "iteration checkpoints leaked"


def test_nonconvergence_raises(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError):
        connected_components(edges, max_iter=2)


def test_curate_component_policy(spark):
    from etl_airflow_adventureworks_spark.operators.curate import drop_near_dups

    docs = load_table(spark, SF_ORACLE, "documents")
    greedy = {r["doc_id"] for r in drop_near_dups(docs).select("doc_id").collect()}
    comp = {
        r["doc_id"]
        for r in drop_near_dups(docs, policy="components").select("doc_id").collect()
    }
    # components policy is at least as aggressive as greedy
    assert comp <= greedy
    # and keeps EXACTLY the min id of each component (union-find oracle)
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in entrymod.queries()["ext_minhash_neardup"](spark, SF_ORACLE).collect()
    ]
    uf = _uf_components(pairs)
    in_graph = set(uf)
    reps = set(uf.values())
    assert in_graph & comp == reps
    with pytest.raises(ValueError):
        drop_near_dups(docs, policy="nope")
