"""Compositional maintenance soak (r11, VERDICT r10 #6; r12 extended):
ONE seeded interleaving of appends / upserts / keyed deletes / OPTIMIZE
/ vacuum on a source table driving THREE derived consumers
simultaneously — an incremental rollup, a replica, and a near-dup index
— each asserted equal to its from-scratch twin after EVERY step, plus a
SECOND maintained table (embeddings) driving a versioned-base IVF index
through the same step kinds. The consumers exercise different
change-feed contracts (signed aggregation, key-collapse CDC apply,
content-derived entry recompute, cell re-assignment) over the same
histories, so a regression in the writer's recorded change rows cannot
hide behind any single consumer's tolerance. Since r12 both index
families are driven through ONE ``maintain_*_index`` policy call per
step (VERDICT r11 #5) and the vacuum uses the consumer-aware retention
floor instead of a hand-sized constant (VERDICT r11 #3)."""

from __future__ import annotations

import random
import warnings

import pytest
from pyspark.sql import functions as F

from etl_airflow_adventureworks_spark.operators.dedup_incremental import (
    build_neardup_index,
    maintain_neardup_index,
    neardup_index_entries,
)
from etl_airflow_adventureworks_spark.operators.rollup import (
    _aggregate,
    refresh_rollup,
)
from etl_airflow_adventureworks_spark.table import (
    VersionedTable,
    replicate_table,
)

_VOCAB = [f"w{i}" for i in range(50)]

DIMS = ["pmod(doc_id, 5) AS g"]
MEASURES = {
    "n": ("count", None),
    "s": ("sum", "score"),
    "h": ("histogram", ("score", 0.0, 100.0, 8)),
}


def _text(rng):
    return " ".join(rng.choice(_VOCAB) for _ in range(12))


def _rows(rng, ids):
    # ~1 in 6 scores NULL — keeps the NULL-sum path hot in the soak
    return [
        (i, _text(rng),
         None if rng.random() < 0.17 else float(rng.randrange(100)))
        for i in ids
    ]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, score double")


def _snap(df):
    df = df.drop(*[c for c in df.columns if c.startswith("__nn_")])
    out = set()
    for r in df.collect():
        vals = []
        for c in df.columns:
            v = r[c]
            vals.append(str(round(v, 9)) if isinstance(v, float) else str(v))
        out.add(tuple(vals))
    return out


def _entries_snap(df):
    return {
        (r["doc_id"], tuple(sorted(r["hh"])), tuple(r["sig"]))
        for r in df.collect()
    }


def test_three_consumers_stay_exact_over_one_maintained_history(
    spark, tmp_path
):
    rng = random.Random(7)
    src_p = str(tmp_path / "src")
    roll_p = str(tmp_path / "roll")
    repl_p = str(tmp_path / "replica")
    idx_p = str(tmp_path / "dedup_idx")
    src = VersionedTable(spark, src_p)

    live = {i: None for i in range(60)}  # ids only; values live in the table
    src.commit(_df(spark, _rows(rng, sorted(live))))               # v1
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        refresh_rollup(spark, src_p, roll_p, DIMS, MEASURES)
    replicate_table(spark, src_p, repl_p, key="doc_id")
    build_neardup_index(spark, src.read(), idx_p, base_path=src_p,
                        base_version=1, num_files=4)
    next_id = 1000

    def check_all(skip_index=False):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            refresh_rollup(spark, src_p, roll_p, DIMS, MEASURES)
            replicate_table(spark, src_p, repl_p, key="doc_id")
            if not skip_index:
                # ONE policy call per step (r12): rebuild_below_bytes=0
                # forces the sync arm so the soak keeps exercising the
                # change-feed contract (the tiny corpus would otherwise
                # always take the measured small-corpus rebuild arm);
                # the policy auto-compacts when patches fragment the
                # key-clustered layout
                maintain_neardup_index(spark, idx_p, rebuild_below_bytes=0)
        cur = src.read()
        assert _snap(VersionedTable(spark, roll_p).read()) == _snap(
            _aggregate(cur, DIMS, MEASURES)
        )
        assert sorted(
            map(tuple, VersionedTable(spark, repl_p).read().collect())
        ) == sorted(map(tuple, cur.collect()))
        if not skip_index:
            assert _entries_snap(
                VersionedTable(spark, idx_p).read()
            ) == _entries_snap(neardup_index_entries(cur))

    # --- second maintained table + its versioned-base IVF index (r12):
    # the ANN family goes through the same step kinds, repaired by ONE
    # maintain_ivf_index policy call per step
    from etl_airflow_adventureworks_spark.operators.similarity import (
        build_ivf_index,
        load_ivf_index,
        maintain_ivf_index,
    )
    from etl_airflow_adventureworks_spark.sources import load_table

    emb_p, ivf_p = str(tmp_path / "emb"), str(tmp_path / "ivf")
    emb = VersionedTable(spark, emb_p)
    emb.commit(load_table(spark, "/root/testdata/sf0.001", "embeddings"))
    build_ivf_index(spark, "/root/testdata/sf0.001", ivf_p, k_cells=4,
                    base_path=emb_p, base_version=1)
    next_vec = 10_000

    def mutate_embeddings(op, step):
        nonlocal next_vec
        if op == "append":
            emb.commit(
                emb.read().limit(3).withColumn(
                    "vec_id", F.col("vec_id") + F.lit(next_vec)),
                mode="append",
            )
            next_vec += 1000
        elif op == "upsert":
            emb.upsert(
                emb.read().filter(f"pmod(vec_id, 83) = {step}").limit(4)
                .withColumn(
                    "embedding",
                    F.expr("transform(embedding, x -> float(-x + 0.1))"),
                ),
                key="vec_id",
            )
        elif op == "delete":
            emb.delete_where(f"vec_id = {step * 7 + 1}")
        elif op == "optimize":
            emb.optimize(num_files=2)
        else:  # vacuum: the consumer-aware floor, never a hand-sized guess
            # "auto" (r13): the IVF build self-registered on emb — no
            # enumeration needed
            assert emb.consumers() == [ivf_p]
            emb.vacuum(retain_last=1, respect_consumers="auto")

    def check_ivf():
        maintain_ivf_index(spark, ivf_p)
        _, meta = load_ivf_index(spark, ivf_p)
        lay = VersionedTable(spark, f"{ivf_p}/{meta['layout_dir']}")
        got = {
            (r["vec_id"], tuple(r["embedding"]))
            for r in lay.read().select("vec_id", "embedding").collect()
        }
        want = {
            (r["vec_id"], tuple(r["embedding"]))
            for r in emb.read().collect()
        }
        assert got == want

    check_all()
    check_ivf()
    lagging = 0  # commits the dedup index has deliberately not synced
    for step in range(8):
        op = ["append", "upsert", "delete", "optimize",
              "upsert", "vacuum", "append", "delete"][step]
        if op == "append":
            ids = range(next_id, next_id + 8)
            next_id += 8
            live.update(dict.fromkeys(ids))
            src.commit(_df(spark, _rows(rng, ids)), mode="append")
        elif op == "upsert":
            ids = rng.sample(sorted(live), 6)
            new_ids = [next_id, next_id + 1]
            next_id += 2
            live.update(dict.fromkeys(new_ids))
            src.upsert(_df(spark, _rows(rng, ids + new_ids)), key="doc_id")
        elif op == "delete":
            doomed = rng.sample(sorted(live), 4)
            for k in doomed:
                live.pop(k)
            src.delete_where(
                f"doc_id IN ({','.join(map(str, doomed))})"
            )
        elif op == "optimize":
            src.optimize(num_files=2)
        else:  # vacuum: the consumer-aware floor replaces hand-sizing
            # (r12, VERDICT r11 #3) — the lagging index's recorded sync
            # point computes exactly the lag the old constant encoded
            assert lagging == 2
            # r13 (VERDICT r12 #2): every consumer self-registered at
            # its first reflect, so "auto" sees all three without the
            # operator enumerating them — the forgotten-consumer strand
            # the floor exists to prevent is now structurally closed
            assert set(src.consumers()) == {roll_p, repl_p, idx_p}
            floor = src.safe_retain_floor("auto")
            assert floor == lagging + 1
            # an under-sized request is clamped up, loudly
            with pytest.warns(RuntimeWarning, match="strand a lagging"):
                src.vacuum(retain_last=1, respect_consumers="auto")
        if op in ("optimize", "upsert") and step in (3, 4):
            # let the index lag across steps 3-4, then vacuum at step 5
            # must retain its catch-up window
            lagging += 1
            check_all(skip_index=True)
        else:
            check_all()
            lagging = 0
        # the table itself agrees with the python id mirror at every step
        assert {r["doc_id"] for r in src.read().collect()} == set(live)
        # the embeddings table takes the same step kind; one maintain
        # call repairs (and, when patches fragment, re-clusters) the IVF
        # index, whose layout rowset must equal the base after every step
        mutate_embeddings(op, step)
        check_ivf()

    # end-to-end ANN correctness over the fully-maintained base: covering
    # nprobe degenerates to the exact brute-force answer
    from test_ivf_sync import _brute_topk, _rows as _ivf_rows

    from etl_airflow_adventureworks_spark.operators.similarity import (
        ann_ivf_topk_from_index,
    )

    got = ann_ivf_topk_from_index(spark, ivf_p, nprobe=4)
    assert _ivf_rows(got) == _ivf_rows(_brute_topk(emb.read()))
