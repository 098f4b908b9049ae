"""Every registered oracle-checked query must match DuckDB exactly —
a local mirror of the driver's per-round CORRECTNESS gate, run at
sf0.001 for speed (the driver runs sf0.01; set SPARK_GRAFT_TEST_SF to
override)."""

from __future__ import annotations

import os

import pytest

from web_attack_detection_spark.plans import all_plans  # noqa: F401
from web_attack_detection_spark.plans.audit import unbounded_global_windows
from web_attack_detection_spark.plans.registry import QUERIES

from .oracle_harness import compare

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

ORACLE_QUERIES = sorted(name for name, spec in QUERIES.items() if spec.oracle is not None)
ROWS_ONLY_QUERIES = sorted(name for name, spec in QUERIES.items() if spec.oracle is None)


from web_attack_detection_spark.plans.audit import GLOBAL_WINDOW_OK


def _assert_scale_safe(name, df):
    """Verdict r4 #1: no registry plan may contain an empty-partition
    Window over an sf-proportional input (single-task global sort).
    Windows over contracted relations (aggregates, limits) pass;
    plans/audit.py documents the streaming-sink whitelist."""
    if name in GLOBAL_WINDOW_OK:
        return
    bad = unbounded_global_windows(df)
    assert not bad, f"{name} has unbounded global window(s): {bad}"


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, name):
    spec = QUERIES[name]
    df = spec.fn(spark, SF_DIR)
    _assert_scale_safe(name, df)
    compare(spark, SF_DIR, lambda s, d: df, spec.oracle, exact=True)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, name):
    df = QUERIES[name].fn(spark, SF_DIR)
    _assert_scale_safe(name, df)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
