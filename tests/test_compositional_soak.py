"""Compositional maintenance soak (r11, VERDICT r10 #6): ONE seeded
interleaving of appends / upserts / keyed deletes / OPTIMIZE / vacuum on
a single source table driving THREE derived consumers simultaneously —
an incremental rollup, a replica, and a synced near-dup index — each
asserted equal to its from-scratch twin after EVERY step. The three
consumers exercise three different change-feed contracts (signed
aggregation, key-collapse CDC apply, content-derived entry recompute)
over the same history, so a regression in the writer's recorded change
rows cannot hide behind any single consumer's tolerance. Includes a
vacuum sized to the longest consumer lag (one consumer deliberately
lags two commits across it)."""

from __future__ import annotations

import random
import warnings

import pytest
from pyspark.sql import functions as F

from etl_airflow_adventureworks_spark.operators.dedup_incremental import (
    build_neardup_index,
    neardup_index_entries,
    sync_neardup_index,
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
                sync_neardup_index(spark, idx_p)
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

    check_all()
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
        else:  # vacuum sized to the longest consumer lag (index: 2 back)
            assert lagging == 2
            src.vacuum(retain_last=lagging + 1)
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
