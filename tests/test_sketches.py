"""HLL sketch accuracy: estimates must track the exact distinct count.

The sketch queries are rows-only in the driver harness (Spark's
Datasketches HLL and DuckDB's HLL differ by design), so the accuracy
bound is asserted here instead: lgK=12 gives ~1.6% standard error;
we allow 5% (≈3σ).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE as SF_DIR
from web_attack_detection_spark.io.sources import load_table
from web_attack_detection_spark.plans.relational6 import ml_hll_sketch


def test_hll_estimates_within_tolerance(spark):
    rows = {r.l_returnflag: r for r in ml_hll_sketch(spark, SF_DIR).collect()}
    # per-group estimates carry their exact twin in the same row
    for flag, r in rows.items():
        if flag == "ALL":
            continue
        assert abs(r.est - r.exact_parts) / r.exact_parts < 0.05, (flag, r)

    # the union row must estimate the GLOBAL distinct count — i.e.
    # merging per-group sketches deduplicates keys shared across groups
    li = load_table(spark, SF_DIR, "lineitem")
    exact_all = li.select(F.countDistinct("l_partkey")).first()[0]
    est_all = rows["ALL"].est
    assert abs(est_all - exact_all) / exact_all < 0.05, (est_all, exact_all)

    # and it must be far below the sum of per-group exacts (keys overlap)
    summed = sum(r.exact_parts for f, r in rows.items() if f != "ALL")
    assert est_all < 0.7 * summed
