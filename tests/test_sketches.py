"""HLL sketch accuracy: estimates must track the exact distinct count.

Since round 2 the registered query is oracle-backed: it emits exact
counts plus in-bound booleans (est_ok asserts ≤8% error — lgK=12 gives
~1.6% standard error, so that is ≈5σ), and the driver hash-checks them.
This test exercises the same surface plus the union-dedup property the
booleans can't express: the merged sketch must estimate the GLOBAL
cardinality, far below the sum of per-group exacts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE as SF_DIR
from web_attack_detection_spark.io.sources import load_table
from web_attack_detection_spark.plans.relational6 import ml_hll_sketch


def test_hll_estimates_within_tolerance(spark):
    rows = {r.l_returnflag: r for r in ml_hll_sketch(spark, SF_DIR).collect()}
    # every row (per-group AND union) self-asserts its error bound
    assert set(rows) == {"A", "N", "R", "ALL"}
    for flag, r in rows.items():
        assert r.est_ok, (flag, r)

    # the ALL row's exact twin must equal the global distinct count —
    # i.e. merging per-group sketches is judged against real dedup
    li = load_table(spark, SF_DIR, "lineitem")
    exact_all = li.select(F.countDistinct("l_partkey")).first()[0]
    assert rows["ALL"].exact_parts == exact_all

    # and the global count is far below the sum of per-group exacts
    # (keys overlap across groups), so est_ok on ALL is a real test of
    # sketch UNION semantics, not of a trivially-distinct keyspace
    summed = sum(r.exact_parts for f, r in rows.items() if f != "ALL")
    assert exact_all < 0.7 * summed
