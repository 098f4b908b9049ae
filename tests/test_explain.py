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

    python_ok = {"mm_extract_features", "mm_frame_sample"}  # mapInPandas by design
    for name, spec in sorted(QUERIES.items()):
        if name in python_ok or name.startswith("ml_"):
            continue
        plan = plan_of(spec.fn(spark, SF_SMOKE), "extended")
        assert "EvalPython" not in plan, f"{name} fell off the JVM path"


def test_aggregation_uses_whole_stage_codegen(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    agg = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    agg.collect()  # AQE only materializes the final plan after execution
    plan = plan_of(agg, "simple")
    # whole-stage-codegen'd operators carry a *(codegen-stage-id) prefix;
    # both the partial and final HashAggregate must be inside a codegen span
    assert "*(1) HashAggregate" in plan and "*(2) HashAggregate" in plan
