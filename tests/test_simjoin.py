"""Two-table text similarity join: brute-force oracle + plan pins.

The oracle recomputes tokenize → distinct 3-token shingles → Jaccard in
pure python over the collected corpora and the join must reproduce its
pair set EXACTLY at every tested threshold — the prefix filter is
lossless or these fail.
"""

from __future__ import annotations

import random

import pytest

from etl_airflow_adventureworks_spark.operators.simjoin import (
    text_similarity_join,
)


def _shingles(text: str, width: int = 3) -> set[str]:
    toks = text.strip().split()
    n = len(toks)
    return {
        " ".join(toks[i : i + width]) for i in range(0, max(n - width, 0) + 1)
    }


def _brute(lrows, rrows, threshold, width=3):
    out = {}
    for lid, ltext in lrows:
        sa = _shingles(ltext, width)
        for rid, rtext in rrows:
            sb = _shingles(rtext, width)
            inter = len(sa & sb)
            union = len(sa | sb)
            if union and inter / union >= threshold:
                out[(lid, rid)] = inter / union
    return out


@pytest.fixture(scope="module")
def corpora(spark):
    """Left: 40 random-token docs. Right: perturbed copies of the first
    15 (0-8 token replacements → a spread of true Jaccards straddling
    every tested threshold) + 10 unrelated decoys."""
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(50)]
    lrows = [
        (i, " ".join(rng.choice(vocab) for _ in range(20))) for i in range(40)
    ]
    rrows = []
    for j in range(15):
        toks = lrows[j][1].split()
        # j < 2: exact copies, so the high-threshold cases have matches
        for _ in range(0 if j < 2 else rng.randint(1, 8)):
            toks[rng.randrange(len(toks))] = rng.choice(vocab)
        rrows.append((100 + j, " ".join(toks)))
    for j in range(10):
        rrows.append((200 + j, " ".join(rng.choice(vocab) for _ in range(20))))
    left = spark.createDataFrame(lrows, "doc_id long, text string")
    right = spark.createDataFrame(rrows, "doc_id long, text string")
    return left, right, lrows, rrows


@pytest.mark.parametrize("threshold", [0.2, 0.5, 0.8])
def test_matches_brute_force_exactly(spark, corpora, threshold):
    left, right, lrows, rrows = corpora
    expect = _brute(lrows, rrows, threshold)
    got = {
        (r["doc_id"], r["doc_id_r"]): r["jaccard"]
        for r in text_similarity_join(
            left, right, threshold=threshold
        ).collect()
    }
    assert set(got) == set(expect), (threshold, set(got) ^ set(expect))
    for k, v in expect.items():
        assert abs(got[k] - v) < 1e-6, (k, got[k], v)
    # the corpus must exercise both regimes at this threshold
    assert expect and len(expect) < len(lrows) * len(rrows)


def test_identical_corpus_self_matches(spark, corpora):
    """Joining a corpus against itself finds every doc at jaccard 1.0
    (plus whatever true near-dups exist)."""
    left, _, lrows, _ = corpora
    got = {
        (r["doc_id"], r["doc_id_r"]): r["jaccard"]
        for r in text_similarity_join(left, left, threshold=0.9).collect()
    }
    for i, _ in lrows:
        assert got.get((i, i)) == 1.0, (i, got.get((i, i)))


def test_distinct_id_and_text_names_and_width(spark, corpora):
    left, right, lrows, rrows = corpora
    l2 = left.withColumnRenamed("doc_id", "lid").withColumnRenamed("text", "title")
    r2 = right.withColumnRenamed("doc_id", "rid").withColumnRenamed("text", "name")
    got = {
        (r["lid"], r["rid"])
        for r in text_similarity_join(
            l2, r2,
            left_id="lid", right_id="rid",
            left_text="title", right_text="name",
            threshold=0.4, shingle_width=2,
        ).collect()
    }
    expect = set(_brute(lrows, rrows, 0.4, width=2))
    assert got == expect


def test_plan_is_catalyst_only(spark, corpora):
    left, right, _, _ = corpora
    plan = (
        text_similarity_join(left, right, threshold=0.5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython",
                "ArrowEvalPython", "FlatMapsInPandas"):
        assert bad not in plan, bad


def test_rejects_bad_arguments(spark, corpora):
    left, right, _, _ = corpora
    with pytest.raises(ValueError, match="threshold"):
        text_similarity_join(left, right, threshold=0.0)
    with pytest.raises(ValueError, match="shingle_width"):
        text_similarity_join(left, right, shingle_width=0)
    with pytest.raises(ValueError, match="left side lacks"):
        text_similarity_join(left.drop("text"), right)
    with pytest.raises(ValueError, match="right side lacks"):
        text_similarity_join(left, right, right_id="nope")
