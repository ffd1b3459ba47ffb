"""Curation pipeline: each stage must agree exactly with its declared
standalone operator, the waterfall must be monotone and deterministic, and
stage toggles must compose."""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE

import __spark_entry__ as entrymod
from etl_airflow_adventureworks_spark.operators import curate as C
from etl_airflow_adventureworks_spark.sources import load_table


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMOKE, "documents")


def test_quality_stage_matches_declared_query(spark, docs):
    rnd = lambda v: None if v is None else round(v, 9)
    got = {
        r["doc_id"]: rnd(r["quality"])
        for r in C.with_quality(docs).select("doc_id", "quality").collect()
    }
    want = {
        r["doc_id"]: rnd(r["quality"])
        for r in entrymod.queries()["ext_quality_score"](spark, SF_SMOKE)
        .select("doc_id", "quality")
        .collect()
    }
    assert got == want


def test_lang_stage_matches_declared_query(spark, docs):
    # lang_pred is carried by ext_quality_score since the r7 fold
    got = {
        r["doc_id"]: r["lang_pred"]
        for r in C.with_lang_pred(docs).select("doc_id", "lang_pred").collect()
    }
    want = {
        r["doc_id"]: r["lang_pred"]
        for r in entrymod.queries()["ext_quality_score"](spark, SF_SMOKE)
        .select("doc_id", "lang_pred")
        .collect()
    }
    assert got == want


def test_lang_id_library_twin_matches_absorber(spark):
    """COVERAGE.md fold contract: the evicted ext_lang_id library form must
    stay result-identical to the columns its absorber carries."""
    from etl_airflow_adventureworks_spark.operators.textops import ext_lang_id

    cols = ["doc_id", "lang_declared", "lang_pred"] + [
        c for c in ext_lang_id(spark, SF_SMOKE).columns if c.startswith("score_")
    ]
    twin = sorted(map(tuple, ext_lang_id(spark, SF_SMOKE).select(*cols).collect()))
    absorbed = sorted(
        map(
            tuple,
            entrymod.queries()["ext_quality_score"](spark, SF_SMOKE)
            .select(*cols)
            .collect(),
        )
    )
    assert twin == absorbed


def test_exact_dedup_stage_matches_declared_query(spark, docs):
    got = sorted(
        r["doc_id"] for r in C.exact_dedup_keep_first(docs).select("doc_id").collect()
    )
    want = sorted(
        r["doc_id"]
        for r in entrymod.queries()["ext_exact_dedup_docs"](spark, SF_SMOKE).collect()
    )
    assert got == want
    # all original columns survive
    assert set(C.exact_dedup_keep_first(docs).columns) == set(docs.columns)


def test_near_dup_stage_drops_exactly_the_greater_ids(spark, docs):
    pairs = entrymod.queries()["ext_minhash_neardup"](spark, SF_SMOKE).collect()
    doomed = {r["doc_b"] for r in pairs}
    kept = {r["doc_id"] for r in C.drop_near_dups(docs).select("doc_id").collect()}
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert kept == all_ids - doomed


def test_waterfall_monotone_and_deterministic(spark, docs):
    res = C.curate_corpus(
        docs, split_weights={"train": 0.8, "val": 0.1, "test": 0.1}
    )
    rep = res.report()
    names = [r["stage"] for r in rep]
    assert names == ["input", "quality", "language", "exact_dedup", "near_dup", "split"]
    rows = [r["rows"] for r in rep]
    assert rows == sorted(rows, reverse=True)  # never grows
    assert rows[0] == docs.count()
    assert rows[-1] == rows[-2]  # split assigns, drops nothing
    assert all(r["dropped"] >= 0 for r in rep)
    # deterministic: identical ids + split assignment on a second build
    a = sorted(map(tuple, res.curated.select("doc_id", "split").collect()))
    b = sorted(
        map(
            tuple,
            C.curate_corpus(docs, split_weights={"train": 0.8, "val": 0.1, "test": 0.1})
            .curated.select("doc_id", "split")
            .collect(),
        )
    )
    assert a == b
    # split frequencies roughly follow the weights on what ships
    from collections import Counter

    c = Counter(s for _, s in a)
    assert set(c) <= {"train", "val", "test"}
    assert c["train"] > c["val"] and c["train"] > c["test"]


def test_stage_toggles(spark, docs):
    res = C.curate_corpus(docs, min_quality=None, languages=None, near_dup=False)
    assert [s for s, _ in res.stages] == ["input", "exact_dedup"]
    assert "split" not in res.curated.columns
    assert "quality" not in res.curated.columns


def test_custom_column_names(spark, docs):
    renamed = docs.selectExpr("doc_id AS id", "text AS body")
    out = C.curate_corpus(
        renamed, id_col="id", text_col="body", near_dup=True,
        min_quality=0.5, languages=("en",),
    ).curated
    assert "id" in out.columns and "body" in out.columns
    assert out.count() > 0


def test_empty_input(spark, docs):
    empty = docs.filter("1=0")
    res = C.curate_corpus(empty, split_weights={"train": 1.0})
    assert res.curated.count() == 0
    assert all(r["rows"] == 0 for r in res.report())


def test_full_waterfall_all_stages(spark, docs):
    """Every optional stage on at once: stages run in the documented order,
    each shrinks (or holds) the row count, and each agrees with its
    standalone operator applied to the previous stage's frame."""
    ev = docs.filter("doc_id % 41 = 0")
    res = C.curate_corpus(
        docs.filter("doc_id % 41 != 0"),
        max_repetition={"max_top_token_frac": 0.9},
        scrub_pii=True,
        eval_set=ev,
        decontam_ngram=5,
        mixture_weights={"src0": 0.5, "src1": 0.3, "src2": 0.2},
        split_weights={"train": 0.9, "val": 0.1},
    )
    names = [n for n, _ in res.stages]
    assert names == [
        "input", "quality", "language", "repetition", "pii",
        "exact_dedup", "near_dup", "decontam", "mixture", "split",
    ]
    report = res.report()
    counts = {r["stage"]: r["rows"] for r in report}
    # monotone: nothing after input ever grows
    rows = [r["rows"] for r in report]
    assert all(a >= b for a, b in zip(rows, rows[1:])), report
    # decontam actually bit on this corpus (5-grams over tiny vocab overlap)
    assert counts["decontam"] < counts["near_dup"]
    # mixture kept only weighted sources
    srcs = {r["source"] for r in res.stages[-2][1].select("source").distinct().collect()}
    assert srcs <= {"src0", "src1", "src2"}
    # final frame carries the split column and only train/val
    splits = {r["split"] for r in res.curated.select("split").distinct().collect()}
    assert splits <= {"train", "val"}
    # regression: mixture and split hashes must be DECORRELATED. Both key on
    # xxhash64 of the id with the same seed; without the mixture salt every
    # mixture survivor has bucket < keep_rate*1e6, so a 0.9/0.1 split over the
    # truncated range assigns everything to 'train' and val is silently empty.
    from collections import Counter

    c = Counter(r["split"] for r in res.curated.select("split").collect())
    n = sum(c.values())
    assert c["val"] > 0, "val split empty — mixture/split hash correlation"
    # only ~40 rows survive the full waterfall, so the share check is a loose
    # 4σ binomial band around the 0.1 target, not a tight tolerance
    import math

    sigma = math.sqrt(0.1 * 0.9 / n)
    assert abs(c["val"] / n - 0.1) < 4 * sigma, c


def test_pii_stage_rewrites_text_in_place(spark):
    base = spark.createDataFrame(
        [
            (1, "alice@example.com wrote this ten token long document body here", "src0"),
            (2, "a perfectly clean document with plenty of ordinary words here", "src0"),
        ],
        "doc_id long, text string, source string",
    )
    res = C.curate_corpus(
        base, min_quality=None, languages=None, scrub_pii=True, near_dup=False
    )
    texts = {r["doc_id"]: r["text"] for r in res.curated.collect()}
    assert "[EMAIL]" in texts[1] and "alice@example.com" not in texts[1]
    assert set(res.curated.columns) == set(base.columns)  # counts dropped


def test_boilerplate_stage_matches_standalone_and_feeds_dedup(spark):
    # r7: the boilerplate stage must equal remove_boilerplate_lines, and
    # docs differing ONLY in shared banner lines must collapse to one in
    # the exact-dedup pass that follows it (the stage-order rationale)
    from etl_airflow_adventureworks_spark.operators.linededup import (
        remove_boilerplate_lines,
    )

    rows = [
        (1, "Accept cookies\nsame unique body", "web"),
        (2, "Accept cookies\nsame unique body", "web"),
        (3, "Accept cookies\nother body", "web"),
        (4, "Accept cookies\nfourth body", "web"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    # min_docs=3: the 4-doc banner is boilerplate, the 2-doc shared body
    # is not (a full-duplicate pair's content must survive for dedup to
    # see it — at min_docs=2 this stage would blank duplicate docs itself)
    res = C.curate_corpus(
        docs,
        min_quality=None,
        languages=None,
        near_dup=False,
        boilerplate_min_docs=3,
    )
    staged = dict(res.stages)
    got = {r["doc_id"]: r["text"] for r in staged["boilerplate"].collect()}
    want = {
        r["doc_id"]: r["text"]
        for r in remove_boilerplate_lines(docs, min_docs=3).collect()
    }
    assert got == want
    assert got[1] == "same unique body"
    # banner-only variants of the same body dedup to the smallest id
    final_ids = {r["doc_id"] for r in res.curated.collect()}
    assert final_ids == {1, 3, 4}
