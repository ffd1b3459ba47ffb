"""Physical-plan audits: the scale properties SURVEY.md §4 claims must be
visible in the executed plans (pushdown, pruning, broadcast, partial agg,
top-k operator) — not just hoped for."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_ORACLE

import __spark_entry__ as entrymod
from etl_airflow_adventureworks_spark.sources import load_table


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_parquet(spark):
    df = (
        load_table(spark, SF_ORACLE, "lineitem")
        .filter(F.col("l_quantity") > 30)
        .select("l_orderkey", "l_quantity")
    )
    plan = plan_of(df)
    assert "PushedFilters: [" in plan and "GreaterThan(l_quantity" in plan


def test_column_pruning_reaches_parquet(spark):
    # op 8: the reference prunes columns by hand ("Trazendo só o necessário");
    # Catalyst must do it automatically — scan schema contains ONLY the two
    # projected columns.
    df = load_table(spark, SF_ORACLE, "lineitem").select("l_orderkey", "l_quantity")
    plan = plan_of(df)
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_dim_lookup_joins_are_broadcast(spark):
    df = entrymod.queries()["kpi05_top5_products"](spark, SF_ORACLE)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_fact_pipeline_broadcasts_all_dims(spark):
    df = entrymod.queries()["etl_fact_sales"](spark, SF_ORACLE)
    plan = plan_of(df)
    # three dim lookups broadcast; only the header×detail join may shuffle
    assert plan.count("BroadcastHashJoin") >= 3


def test_topk_plans_take_ordered(spark):
    df = entrymod.queries()["op26_topk"](spark, SF_ORACLE)
    assert "TakeOrderedAndProject" in plan_of(df)


def test_aggregation_has_partial_phase(spark):
    # map-side combine: partial_sum before the exchange, final after
    df = entrymod.queries()["kpi07_sales_by_country"](spark, SF_ORACLE)
    plan = plan_of(df)
    assert "partial_sum" in plan or "partial" in plan.lower()
    assert "HashAggregate" in plan


def test_whole_stage_codegen_covers_kpis(spark):
    df = entrymod.queries()["kpi_globals"](spark, SF_ORACLE)
    df.collect()  # AQE: codegen spans only visible in the final executed plan
    # whole-stage-codegen'd operators carry the `*(n)` marker in the tree
    plan = plan_of(df)
    assert "*(1)" in plan, plan


def test_integrity_filter_pushed_below_join(spark):
    # op 10/SURVEY §4: isNotNull on the join key is pushed into the scan side
    df = entrymod.queries()["op_null_filters"](spark, SF_ORACLE)
    plan = optimized_of(df)
    # the left join must have been rewritten: null-drop on right-side keys
    # turns the outer join into an inner join
    assert "LeftOuter" not in plan


def test_no_python_udfs_in_reference_queries(spark):
    # SURVEY §2.8 policy: zero Python evaluation in reference-semantics plans
    q = entrymod.queries()
    for name in [k for k in q if k.startswith(("kpi", "op", "etl"))]:
        plan = plan_of(q[name](spark, SF_ORACLE))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_interleave_has_no_global_window(spark):
    # round-1 defect (VERDICT item 2): the interleave position was a
    # row_number over a GLOBAL Window.orderBy — a single-partition sort of
    # the whole corpus. The closed-form rewrite must leave no Window node
    # with an empty partition spec in the optimized plan.
    import re

    df = entrymod.queries()["ext_interleave_sources"](spark, SF_ORACLE)
    plan = optimized_of(df)
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        # spec = partition exprs..., order exprs..., frame; a global window
        # starts with an order expression (ASC/DESC) instead of a partition
        first = spec.split(",")[0]
        assert "ASC" not in first and "DESC" not in first, plan


def test_ngram_prefix_build_single_h_exchange_and_no_broadcasts(spark):
    # round-2 defect (VERDICT item 1): the prefix build paid two doc_id
    # Window sorts and a full re-shuffle of the inverted index on the df
    # join. Round 16: document frequency is ONE window over h — the same
    # exchange the old join's probe side paid, with no aggregate table
    # and no join-back — so the optimized plan has exactly the two VERIFY
    # joins and no per-doc_id window. The r4 broadcast ban stands (AQE's
    # compressed-size estimate of the shingle-array side OOM'd an 8 GB
    # driver at sf10): no broadcast join at any scale; the verify joins
    # are sort-merge again (r17 — the r16 shuffle_hash switch measured
    # parity at sf0.1 and 1.29/1.06 at sf1/sf10, and SMJ spills instead
    # of OOMing; see dedup.py's verify-join note. The minhash verify is
    # the one that KEEPS shuffle_hash — measured faster at scale there).
    df = entrymod.queries()["ext_ngram_jaccard"](spark, SF_ORACLE)
    opt = optimized_of(df)
    assert opt.count("Join") == 2, opt  # verify joins only — df is a window
    assert "windowspecdefinition(doc_id" not in opt, opt  # the r2 defect
    df.count()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in final, final
    assert "SortMergeJoin" in final, final


def test_tfidf_df_is_window_not_broadcast_join(spark):
    # round-5 (VERDICT r4 item 2): the df (document-frequency) table is one
    # row per DISTINCT TERM — it grows ~linearly with the corpus, so a forced
    # broadcast hint bypasses AQE's size check and hits the 8 GB broadcast
    # cap at scale. Round 16: df is a count window over term on the tf
    # aggregate (one row per (doc, term) ⇒ the window count IS
    # countDistinct(doc_id)) — no term join remains to mis-plan; the only
    # broadcast allowed is the 1-row corpus-count crossJoin
    # (BroadcastNestedLoopJoin — cannot grow).
    df = entrymod.queries()["ext_tfidf_top_terms"](spark, SF_ORACLE)
    df.count()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in final, final
    assert "SortMergeJoin" not in final, final  # the term join is gone
    assert "ShuffledHashJoin" not in final, final
    assert final.count("Window") >= 2, final  # df window + top-3 ranking


def test_ngram_naive_twin_size_joins_not_forced_broadcast(spark):
    # the naive library twin's per-doc size tables are corpus-growing too;
    # its verify joins must not carry an explicit broadcast HINT (AQE is
    # still free to broadcast genuinely-small runtime sides — the defect is
    # forcing it past the size check, not broadcasting per se)
    from etl_airflow_adventureworks_spark.operators.dedup import ngram_jaccard_naive

    df = ngram_jaccard_naive(spark, SF_ORACLE)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "broadcast" not in analyzed.lower(), analyzed
    # the size joins themselves are pinned to sort-merge
    final_opt = optimized_of(df)
    assert final_opt.lower().count("merge") >= 2, final_opt


def test_declared_sessionizer_heavy_windows_are_time_sharded(spark):
    # round-6 (VERDICT r5 #1): the declared ext_session_gap must be the
    # time-sharded plan — no window over RAW EVENTS may partition on
    # user_id alone (that partition is one indivisible task; a 30%-hot
    # user measured 1.17x/2.04x/2.64x slower at 2M/8M/32M). In the optimized
    # tree, windows ABOVE the mini-session Aggregate run on per-session
    # summaries (user-only partitioning is fine: |rows| ~ session count);
    # every window BELOW it touches raw events and must include the time
    # shard in its partition spec.
    import re

    df = entrymod.queries()["ext_session_gap"](spark, SF_ORACLE)
    plan = optimized_of(df)
    agg = re.search(r"Aggregate \[[^\]]*shard[^\]]*mini_id[^\]]*\]", plan)
    assert agg, plan  # the mini-session aggregate exists
    below = plan[agg.end() :]
    # Window nodes print as `Window [exprs], [partition], [order]`
    for m in re.finditer(r"Window \[.*\], \[([^\]]*)\], \[[^\]]*\]", below):
        part = m.group(1)
        assert "shard" in part, plan
    assert "Window" in below, plan  # the heavy pass really is below


def test_declared_asof_heavy_window_is_time_sharded(spark):
    # round-6 (VERDICT r5 #5): same skew contract as the sessionizer —
    # measured on the 30%-hot corpus, idle machine, warmup + median-of-5:
    # sharded wins 1.11x/1.75x/2.11x at 2M/8M/32M events, monotone and
    # widening as the indivisible hot window task grows. The only window allowed to
    # partition on user_id alone is the carry-in stitch, which ORDERS BY
    # the shard — i.e. it runs over per-(user, shard) summary rows, never
    # raw events.
    import re

    df = entrymod.queries()["ext_asof_attribution"](spark, SF_ORACLE)
    plan = optimized_of(df)
    specs = re.findall(r"Window \[.*\], \[([^\]]*)\], \[([^\]]*)\]", plan)
    assert specs, plan
    assert any("shard" in part for part, _ in specs), plan  # heavy pass sharded
    for part, order in specs:
        if "shard" not in part:
            assert "shard" in order, plan  # summary stitch, not raw events


def test_declared_twotable_asof_is_sharded_and_python_free(spark):
    # round-7 (VERDICT r6 #2/#3): the generic two-table asof_join's declared
    # query must run the pure-Catalyst sharded plan — no Python eval nodes
    # (the grouped merge_asof twin is FlatMapGroupsInPandas; measured
    # 3.2x/3.5x slower on the 30%-hot corpus at 2M/8M events), and the same
    # window-partitioning contract as the single-stream as-of: every window
    # over raw rows keys on (entity, shard); an entity-only window may only
    # run over per-shard summaries (ordered by the shard).
    import re

    df = entrymod.queries()["ext_asof_twotable"](spark, SF_ORACLE)
    plan = optimized_of(df)
    assert "FlatMapGroupsInPandas" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    specs = re.findall(r"Window \[.*\], \[([^\]]*)\], \[([^\]]*)\]", plan)
    assert specs, plan
    assert any("shard" in part for part, _ in specs), plan  # heavy pass sharded
    for part, order in specs:
        if "shard" not in part:
            assert "shard" in order, plan  # summary stitch, not raw rows


def test_group_cap_has_partial_window_group_limit(spark):
    # round-6 skew audit: ext_group_cap_sample windows on `source`
    # (single-digit cardinality) — safe ONLY because Spark's rank-limit
    # pushdown inserts a map-side Partial WindowGroupLimit BEFORE the
    # exchange, so each input split top-20s locally and the per-group
    # final sort sees <= 20 x partitions rows instead of the whole
    # corpus. Pin that physical shape: if a regression (or a rewrite to
    # rank-over-expression this rule can't serve) drops the Partial
    # phase, this query becomes a terabyte-sort-per-source straggler.
    # Same contract for the ANN top-k family: its rank window partitions
    # on query_id (|queries| partitions over |collection| x |queries|
    # joined rows) — only the Partial phase keeps that from being a few
    # full-collection sort tasks. Spark emits the `Partial` mode marker
    # exclusively in the pre-shuffle position, so its presence IS the
    # map-side-prune proof (a positional check on the printed tree is
    # fragile across multi-branch plans).
    import re

    for name in ["ext_group_cap_sample", "ext_ann_cosine_topk", "ext_ann_lsh_topk"]:
        df = entrymod.queries()[name](spark, SF_ORACLE)
        df.count()
        final = df._jdf.queryExecution().executedPlan().toString()
        assert re.search(r"WindowGroupLimit .*Partial", final), (name, final)


def test_textprep_catalyst_ops_have_no_python(spark):
    # splits and chunking are pure Catalyst by design (packing is the one
    # declared applyInPandas step)
    from etl_airflow_adventureworks_spark.operators.textprep import (
        chunk_documents,
        split_by_hash,
    )

    docs = load_table(spark, SF_ORACLE, "documents")
    for df in [
        split_by_hash(docs, "doc_id", {"train": 0.9, "val": 0.1}),
        chunk_documents(docs, max_tokens=64, overlap=16),
    ]:
        plan = plan_of(df)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_declared_range_join_is_sharded_and_python_free(spark):
    # round-7: ext_range_join must run the shard-bucketing rewrite — an
    # equi-join on (user_id, shard) with the range residual, never a
    # nested-loop/cartesian (the naive no-`by` plan) and never Python.
    # The explode of intervals into covered shards is the plan's signature.
    df = entrymod.queries()["ext_range_join"](spark, SF_ORACLE)
    plan = optimized_of(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert "Generate explode" in plan, plan  # interval → covered shards
    df.count()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in final and "Cartesian" not in final, final
    # the join is a real equi-join on (user_id, __shard) with the range
    # containment left as its residual condition
    assert ("SortMergeJoin" in final) or ("ShuffledHashJoin" in final) or (
        "BroadcastHashJoin" in final  # AQE may broadcast the small side at sf0.01
    ), final
    assert "__shard" in final, final


def test_zorder_key_and_quality_checks_are_python_free(spark):
    # round-8: the z-order key (rank + bit-spread) and the quality gate's
    # compiled aggregate are pure Catalyst column algebra; the write's
    # only exchange is the range partition on the key
    from etl_airflow_adventureworks_spark.operators import layout as L
    from etl_airflow_adventureworks_spark.operators import quality as Q

    ev = (
        load_table(spark, SF_ORACLE, "events")
        .withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
        .select("event_id", "user_id", "ts_us")
    )
    keyed = (
        ev.withColumn("_z", L.zorder_key(ev, ["user_id", "ts_us"], bits=8))
        .repartitionByRange(8, "_z")
        .sortWithinPartitions("_z")
    )
    plan = plan_of(keyed)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert plan.count("Exchange rangepartitioning") == 1, plan

    li = load_table(spark, SF_ORACLE, "lineitem")
    checks = [
        Q.not_null("l_shipdate"),
        Q.in_range("l_discount", 0, 0.05),
        Q.unique("l_orderkey"),
    ]
    report = Q.validate(li, checks)  # driver-side single-row collect inside
    assert report.count() == len(checks)
    good, bad = Q.split_valid(li, checks)
    for df in (good, bad):
        plan = plan_of(df)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
