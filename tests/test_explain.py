"""Physical-plan audits: the properties that make these queries viable
at 100 TB are asserted here, not assumed — filter pushdown to the
parquet scan, column pruning, broadcast joins for fitted models, no
Python evaluation in JVM-expressible paths, whole-stage codegen."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from web_attack_detection_spark.functions.feature import (
    apply_string_indexer,
    fit_string_indexer,
)
from web_attack_detection_spark.io.sources import load_table

from .conftest import SF_SMOKE


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_filter_pushdown_reaches_parquet_scan(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").filter(F.col("l_orderkey") < 50)
    plan = plan_of(li.select("l_orderkey", "l_quantity"))
    assert "PushedFilters: [IsNotNull(l_orderkey), LessThan(l_orderkey,50)]" in plan


def test_column_pruning_reaches_parquet_scan(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    plan = plan_of(li.select("l_orderkey", "l_quantity"))
    # ReadSchema must carry ONLY the projected columns — a scan reading
    # all 16 lineitem columns for a 2-column projection is wrong.
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:" in plan
    assert "l_extendedprice" not in plan


def test_indexer_transform_is_broadcast_join(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    model = fit_string_indexer(ev, "event_type")
    out = apply_string_indexer(ev, model, "event_type", "idx")
    plan = plan_of(out)
    # the fitted model (O(cardinality) rows) broadcasts; the fact side
    # must NOT shuffle — no Exchange hashpartitioning on the probe side.
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_no_python_eval_in_jvm_paths(spark):
    """Relational, feature, dedup, text, similarity plans must stay
    JVM-side: any BatchEvalPython/ArrowEvalPython node means a Python
    UDF crept into a path built-ins can express."""
    from web_attack_detection_spark.plans import all_plans  # noqa: F401
    from web_attack_detection_spark.plans.registry import QUERIES

    python_ok = {
        "mm_extract_features",  # mapInPandas by design
        "mm_frame_sample",  # mapInPandas by design
        # the battery's processed prep projects through fitted PCA —
        # the ONE Arrow-vectorized gemm node the flagship plan test
        # pins exactly (same documented model boundary)
        "ref_unsw_battery_summary",
    }
    for name, spec in sorted(QUERIES.items()):
        if name in python_ok or name.startswith("ml_"):
            continue
        plan = plan_of(spec.fn(spark, SF_SMOKE), "extended")
        assert "EvalPython" not in plan, f"{name} fell off the JVM path"


def test_flagship_transform_is_map_only_no_joins(spark):
    """Round 2/3: the fitted pipeline's scoring path must be a pure
    map stage — literal-map indexer lookups (no join nodes, no
    shuffle). With PCA fitted, the projection is ONE Arrow-vectorized
    gemm node (ArrowEvalPython) — never a per-row BatchEvalPython;
    without PCA the plan contains no Python at all."""
    from pyspark.sql import functions as F

    from web_attack_detection_spark.functions.feature import fit_feature_pipeline

    ev = load_table(spark, SF_SMOKE, "events")
    events = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.get_json_object("props", "$.k").cast("double").alias("k"),
        F.pmod(F.col("user_id"), F.lit(8)).cast("string").alias("user_shard"),
    )
    train = events.filter(F.col("event_id") % 4 != 1)
    model = fit_feature_pipeline(train, label_col="event_type", pca_k=5)
    plan = plan_of(model.transform(events).select("features", "label"))
    for node in ("Join", "BatchEvalPython", "MapInPandas", "Exchange"):
        assert node not in plan, f"flagship transform plan contains {node}:\n{plan}"
    # exactly one vectorized-gemm node (formatted plans name each node
    # twice: once in the tree, once in the details section)
    import re

    assert len(re.findall(r"\(\d+\) ArrowEvalPython", plan)) == 1

    model.pca_model = None
    plan_nopca = plan_of(model.transform(events).select("features", "label"))
    for node in ("Join", "EvalPython", "MapInPandas", "Exchange"):
        assert node not in plan_nopca, f"pre-PCA transform contains {node}"


def test_aggregation_uses_whole_stage_codegen(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    agg = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    agg.collect()  # AQE only materializes the final plan after execution
    plan = plan_of(agg, "simple")
    # whole-stage-codegen'd operators carry a *(codegen-stage-id) prefix;
    # both the partial and final HashAggregate must be inside a codegen span
    assert "*(1) HashAggregate" in plan and "*(2) HashAggregate" in plan


def test_unpivot_is_single_expand_no_shuffle(spark):
    """unpivot must compile to ONE Expand over one scan — no Exchange,
    no per-column union re-scans."""
    from web_attack_detection_spark.plans.relational3 import rel_unpivot

    plan = plan_of(rel_unpivot(spark, SF_SMOKE), "simple")
    assert "Expand" in plan
    assert "Exchange" not in plan
    assert plan.count("FileScan") == 1


def test_grouping_sets_one_expand_one_shuffle(spark):
    """All grouping sets must share one Expand pass + one aggregation
    shuffle — never one job per set."""
    from web_attack_detection_spark.plans.relational3 import rel_grouping_sets

    plan = plan_of(rel_grouping_sets(spark, SF_SMOKE), "simple")
    assert plan.count("Expand") == 1
    assert plan.count("Exchange") == 1


def test_full_outer_join_runs_on_preaggregates(spark):
    """The full outer join must see two pre-aggregated inputs: both
    join children aggregate BEFORE the join (aggregate-then-join), and
    the join itself is a sort-merge FullOuter."""
    from web_attack_detection_spark.plans.relational3 import rel_full_outer_join

    plan = plan_of(rel_full_outer_join(spark, SF_SMOKE), "formatted")
    assert "FullOuter" in plan
    assert "SortMergeJoin" in plan


def test_ivf_assignment_corpus_side_is_map_only(spark):
    """IVF cell assignment must not shuffle the corpus: the only
    Exchange in the plan is the SinglePartition collect of the (tiny)
    centroid array; the corpus scan feeds the broadcast join directly."""
    from web_attack_detection_spark.io.sources import load_table
    from web_attack_detection_spark.operators.similarity import ivf_assign

    emb = load_table(spark, SF_SMOKE, "embeddings")
    _, assigned = ivf_assign(emb, 16)
    plan = plan_of(assigned, "simple")
    assert "BroadcastNestedLoopJoin" in plan
    # every Exchange is the centroid-side SinglePartition collect —
    # no hash-partitioning shuffle of corpus rows anywhere
    assert "Exchange hashpartitioning" not in plan


def test_profile_columns_is_single_scan(spark):
    """The one-scan claim of pipe_profile_columns: all per-column
    stats (including 4 COUNT DISTINCTs) compile to aggregates over ONE
    parquet scan — Expand handles the multi-distinct, never a second
    read of the fact table."""
    from web_attack_detection_spark.plans.pipelineq import pipe_profile_columns

    plan = plan_of(pipe_profile_columns(spark, SF_SMOKE), "simple")
    assert plan.count("Scan parquet") == 1


def test_quantized_topk_corpus_never_shuffles_for_scoring(spark):
    """Quantized top-k scoring: the 10 probes broadcast (nested-loop,
    the join key is an inequality), the corpus is scanned map-side;
    the only hash exchange is the per-query top-k window over scalar
    score triples — never the vectors."""
    from web_attack_detection_spark.plans.similarity2 import sim_quantized_topk

    plan = plan_of(sim_quantized_topk(spark, SF_SMOKE), "simple")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q17_dimension_broadcasts(spark):
    """Q17's part filter must broadcast onto lineitem — the fact table
    shuffles only for the per-part stats join, never for the dimension."""
    from web_attack_detection_spark.plans.relational7 import q17_small_qty_revenue

    plan = plan_of(q17_small_qty_revenue(spark, SF_SMOKE), "simple")
    assert "BroadcastHashJoin" in plan


def test_q21_single_lineitem_pass_per_branch(spark):
    """Q21 rewrites EXISTS/NOT-EXISTS self-joins into one per-order
    aggregate joined back: supplier and nation must broadcast, and no
    nested-loop join may appear anywhere."""
    from web_attack_detection_spark.plans.relational7 import q21_waiting_suppliers

    plan = plan_of(q21_waiting_suppliers(spark, SF_SMOKE), "simple")
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan


def test_decontamination_broadcasts_eval_shingles(spark):
    """text_decontaminate: the eval shingle table must be broadcast —
    a shuffled join here would move the whole corpus's shingles."""
    from web_attack_detection_spark.plans.text3 import text_decontaminate

    plan = plan_of(text_decontaminate(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_corpus_build_has_no_sort_merge_join(spark):
    """pipe_training_corpus plan regression: dedup is the window form
    (one shuffle, no join-back) and the contamination anti-join is
    broadcast — the plan must stay free of SortMergeJoin."""
    from web_attack_detection_spark.plans.pipelineq import pipe_training_corpus

    plan = plan_of(pipe_training_corpus(spark, SF_SMOKE))
    assert "SortMergeJoin" not in plan


def test_matryoshka_queries_are_broadcast(spark):
    """sim_matryoshka_rerank: both retrieval stages broadcast the query
    side; the corpus scan must never shuffle before the top-k window."""
    from web_attack_detection_spark.plans.similarity3 import sim_matryoshka_rerank

    plan = plan_of(sim_matryoshka_rerank(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_zorder_interleave_is_map_side_single_exchange(spark):
    """rel_zorder_layout: the 40-term Morton interleave is a Project
    directly over the 2-column scan (map-side, no pre-shuffle), and the
    ONLY exchange in the plan is the final bucket aggregate."""
    from web_attack_detection_spark.plans.relational10 import rel_zorder_layout

    plan = plan_of(rel_zorder_layout(spark, SF_SMOKE))
    # one exchange NODE in the tree (formatted mode also repeats the
    # name in the node-detail section, so count the tree form)
    assert plan.count("+- Exchange") == 1
    assert "ReadSchema: struct<l_partkey:bigint,l_suppkey:bigint>" in plan
    # partial agg before the exchange -> map-side combine is in place
    assert plan.index("HashAggregate") < plan.index("Exchange")


def test_change_data_plans_read_bucketed_no_key_exchange(spark):
    """VERDICT r2 #6: CDC apply and snapshot diff consume the key
    distribution from the bucketed storage layout — the plans must
    contain NO Exchange on the key. (The only allowed exchanges are the
    final tiny summary aggregations: SinglePartition for the CDC
    totals, hashpartitioning on the 3-value change class.)"""
    from web_attack_detection_spark.plans.relational10 import (
        rel_cdc_apply,
        rel_snapshot_diff,
    )

    cdc = plan_of(rel_cdc_apply(spark, SF_SMOKE))
    assert "hashpartitioning(k#" not in cdc
    assert "Scan parquet spark_catalog.default.cdc_log" in cdc

    diff = plan_of(rel_snapshot_diff(spark, SF_SMOKE))
    assert "hashpartitioning(k#" not in diff
    assert "SortMergeJoin" in diff  # the full outer join itself
    # both join sides read the same bucketed layout
    import re

    assert len(re.findall(r"Scan parquet spark_catalog.default.orders_bkt", diff)) >= 2


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """Runtime filtering at 100 TB: a selective dim-side predicate
    should inject a bloom filter (bloom_filter_agg -> might_contain)
    onto the FACT side of a shuffle join, pruning fact rows before the
    exchange. Locally the size thresholds are far above fixture scale,
    so the test pins them down — on a real cluster the defaults fire
    for exactly the big-fact/selective-dim shape this asserts."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, SF_SMOKE, "lineitem")
        o = load_table(spark, SF_SMOKE, "orders").filter(
            F.col("o_totalprice") > 400000
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.sum("l_quantity").alias("q"))
        )
        plan = plan_of(j, "extended").lower()
        assert "might_contain" in plan  # the fact-side probe
        assert "bloom_filter_agg" in plan  # the dim-side build
        # and the result still matches the unfiltered-plan answer
        rows_bf = {(r["o_orderstatus"], float(r["q"])) for r in j.collect()}
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    li = load_table(spark, SF_SMOKE, "lineitem")
    o = load_table(spark, SF_SMOKE, "orders").filter(F.col("o_totalprice") > 400000)
    plain = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.sum("l_quantity").alias("q"))
    )
    assert rows_bf == {(r["o_orderstatus"], float(r["q"])) for r in plain.collect()}


def test_fuzzy_match_plan_is_blocked_no_cartesian(spark):
    """VERDICT r3 #3: text_fuzzy_match must be the BLOCKED operator —
    name-level candidate generation through a length-bucket equi-join,
    never an unblocked crossJoin over keys."""
    from web_attack_detection_spark.plans.text import text_fuzzy_match

    plan = plan_of(text_fuzzy_match(spark, SF_SMOKE), "formatted")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_incremental_indexed_no_index_side_exchange(spark):
    """VERDICT r3 #6: dedup against the STORED shingle index must not
    shuffle index rows — the batch side broadcasts, the index tables
    stream map-only. The only allowed exchanges partition CANDIDATE
    rows (b_id/c_id tuples), never the index join keys."""
    from web_attack_detection_spark.plans.dedup import (
        _corpus_index,
        dedup_incremental_indexed,
    )

    plan = plan_of(dedup_incremental_indexed(spark, SF_SMOKE))
    assert "Scan parquet spark_catalog.default.docsh_idx" in plan
    assert "Scan parquet spark_catalog.default.doctext_idx" in plan
    # no Exchange on the index join keys
    assert "hashpartitioning(shingle#" not in plan
    assert "hashpartitioning(text#" not in plan
    assert "BroadcastHashJoin" in plan

    # the bucketed layout also serves index MAINTENANCE shuffle-free:
    # a per-shingle posting-list aggregation consumes the storage
    # distribution directly (no Exchange at all in the plan)
    sh_name, _ = _corpus_index(spark, SF_SMOKE)
    agg_plan = plan_of(
        spark.table(sh_name).groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    )
    assert "Exchange" not in agg_plan


def test_ivf_indexed_scan_is_dpp_pruned(spark):
    """Round 4: ANN against the STORED cell-partitioned IVF index must
    prune to the probed cells — the index scan carries a
    dynamicpruningexpression on the partition column, so per-batch
    query cost is |probed partitions|, not |corpus|."""
    from web_attack_detection_spark.plans.similarity3 import sim_ivf_indexed

    plan = plan_of(sim_ivf_indexed(spark, SF_SMOKE), "formatted")
    assert "Scan parquet spark_catalog.default.ivf_cells" in plan
    assert "dynamicpruningexpression(cell#" in plan


def test_bm25_plan_is_inverted_index_no_cartesian(spark):
    """Round 4: BM25 retrieval must candidate-generate through the
    term equi-join — no CartesianProduct / BroadcastNestedLoopJoin
    anywhere in the plan (the all-pairs trap for retrieval)."""
    from web_attack_detection_spark.plans.registry import QUERIES
    from web_attack_detection_spark.plans import all_plans  # noqa: F401

    plan = plan_of(QUERIES["sim_bm25_topk"].fn(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    # the only BNLJ allowed is the 1-row global-stats broadcast
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_orc_roundtrip_reads_orc_with_pushdown(spark):
    """Round 4: the roundtrip's read side must be a native ORC
    columnar scan (proving the interop path, not a parquet fallback),
    with the aggregate reading only the projected columns."""
    from web_attack_detection_spark.plans.registry import QUERIES
    from web_attack_detection_spark.plans import all_plans  # noqa: F401

    plan = plan_of(QUERIES["io_orc_roundtrip"].fn(spark, SF_SMOKE))
    assert "Scan orc" in plan
    assert "event_type" in plan and "value" in plan


def test_anomaly_zscore_stats_join_is_broadcast(spark):
    """Round 4: the per-user moment statistics must broadcast back
    onto the event scan — a sort-merge join here would shuffle the
    full fact table twice."""
    from web_attack_detection_spark.plans.registry import QUERIES
    from web_attack_detection_spark.plans import all_plans  # noqa: F401

    plan = plan_of(QUERIES["ml_anomaly_zscore"].fn(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_markov_single_user_partition_sort(spark):
    """Round 4: the transition matrix needs exactly one shuffle for
    the per-user window (plus tiny aggregate exchanges) and no global
    sort of raw events."""
    from web_attack_detection_spark.plans.registry import QUERIES
    from web_attack_detection_spark.plans import all_plans  # noqa: F401

    plan = plan_of(QUERIES["rel_markov_transitions"].fn(spark, SF_SMOKE))
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan  # row totals broadcast back


def test_topk_per_group_uses_window_group_limit(spark):
    """Spark 4 rewrites rank<=k into WindowGroupLimit (per-partition
    top-k heaps BEFORE the shuffle and sort) — the optimization that
    makes per-group top-k viable on wide groups; a regression to a
    full window sort would show here as the node vanishing."""
    from web_attack_detection_spark.plans import all_plans  # noqa: F401
    from web_attack_detection_spark.plans.registry import QUERIES

    df = QUERIES["rel_topk_per_group"].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_index_merge_probe_no_index_side_exchange(spark):
    """Round 5: serving from the MERGED index must keep the
    incremental-probe contract — index tables stream map-only (no
    Exchange on the index join keys), the batch side broadcasts."""
    from web_attack_detection_spark.plans.dedup import dedup_index_merge

    plan = plan_of(dedup_index_merge(spark, SF_SMOKE))
    assert "Scan parquet spark_catalog.default.docsh_mrg" in plan
    assert "Scan parquet spark_catalog.default.doctext_mrg" in plan
    assert "hashpartitioning(shingle#" not in plan
    assert "hashpartitioning(text#" not in plan
    assert "BroadcastHashJoin" in plan


def test_ivf_indexed_serving_plan_no_index_side_exchange(spark):
    """Round 6: the SERVING half of the stored IVF index (probe-join +
    score + per-query top-k) must keep index rows map-only — the probe
    set broadcasts, so the only Exchange partitions per-query candidate
    SCORE rows (query_id), never the index's cell key or its vectors."""
    from pyspark.sql import functions as F  # noqa: F811

    from web_attack_detection_spark.io.sources import load_table
    from web_attack_detection_spark.operators.similarity import ivf_topk_from_index
    from web_attack_detection_spark.plans.similarity3 import _ivf_store

    a_name, c_name = _ivf_store(spark, SF_SMOKE)
    emb = load_table(spark, SF_SMOKE, "embeddings")
    served = ivf_topk_from_index(
        spark.table(c_name),
        spark.table(a_name),
        emb.filter(F.col("vec_id") < 10),
        k=5,
        n_probe=4,
    )
    plan = plan_of(served)
    assert "Scan parquet spark_catalog.default.ivf_cells" in plan
    assert "BroadcastHashJoin" in plan
    # no shuffle keyed on the index layout or its stored vectors
    assert "hashpartitioning(cell#" not in plan
    assert "SortMergeJoin" not in plan
