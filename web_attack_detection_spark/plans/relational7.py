"""Seventh relational wave: the six TPC-H queries whose canonical form
needs the ``partsupp`` table or late-ship columns the fixtures lack
(relational5.py covers the other sixteen). Each is ADAPTED, not
skipped: ``partsupp`` is derived from lineitem as the distinct
``(l_partkey, l_suppkey)`` relation with

    ps_supplycost_c = MIN(ROUND(l_extendedprice / l_quantity * 100))
    ps_availqty     = SUM(CAST(l_quantity AS BIGINT))

and "late" (Q21) = shipped >60 days after the order date, matching the
substitution relational5.py's Q4 already uses. The point is the PLAN
SHAPES the originals exercise — correlated min against a derived
relation (Q2), HAVING vs a scalar-subquery fraction of a total (Q11),
NOT IN + COUNT(DISTINCT) (Q16), per-group avg correlated predicate
(Q17), nested semi-joins against derived aggregates (Q20), and the
EXISTS / NOT-EXISTS self-join rewritten as one per-order aggregate
(Q21) — so the full 22-query battery is represented.

The reference (huunhan1804/web-attack-detection, SURVEY.md §2.2) has no
joins or subqueries anywhere; this battery exists for engine
completeness, same rationale as relational5.py.

Determinism: l_quantity is integral (FIXTURES.md) so BIGINT casts and
sums are exact; money follows the registry's integer-cents discipline;
``ps_supplycost_c`` rounds the SAME double expression text on both
sides, then everything downstream is exact integer min/sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from web_attack_detection_spark.io.sources import load_table
from web_attack_detection_spark.plans.registry import register

# Shared derived-partsupp CTE text (DuckDB side). The Spark side builds
# the same relation with _partsupp() below.
_PARTSUPP_CTE = """
partsupp AS (
  SELECT l_partkey AS ps_partkey,
         l_suppkey AS ps_suppkey,
         MIN(CAST(ROUND(l_extendedprice / l_quantity * 100) AS BIGINT)) AS ps_supplycost_c,
         SUM(CAST(l_quantity AS BIGINT)) AS ps_availqty
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
)
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived part-supplier relation. One shuffle on the composite
    key; at 100 TB this is the natural pre-aggregation that shrinks
    lineitem (billions of rows) to the distinct pair relation
    (~|part|×avg-suppliers rows) before any dimension join, and AQE
    coalesces the post-agg partitions."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(
            F.round(F.col("l_extendedprice") / F.col("l_quantity") * 100).cast("long")
        ).alias("ps_supplycost_c"),
        F.sum(F.col("l_quantity").cast("long")).alias("ps_availqty"),
    )


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier: correlated MIN against the derived
# relation, restricted to one region.
# ---------------------------------------------------------------------------

_Q2_ORACLE = f"""
WITH {_PARTSUPP_CTE},
cost AS (
  SELECT ps_partkey, ps_supplycost_c, s_suppkey, s_acctbal, s_name, n_name
  FROM partsupp
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       ROUND(ps_supplycost_c / 100.0, 2) AS supplycost
FROM part JOIN cost ON p_partkey = ps_partkey
WHERE p_size = 15 AND p_type = 'LARGE'
  AND ps_supplycost_c = (
    SELECT MIN(c2.ps_supplycost_c) FROM cost c2
    WHERE c2.ps_partkey = p_partkey
  )
"""


@register(
    "q2_min_cost_supplier",
    _Q2_ORACLE,
    doc="TPC-H Q2 (adapted): min-supplycost supplier per part in region",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated ``= (SELECT MIN ...)`` decorrelates to a window
    min over ps_partkey on the region-restricted cost relation — one
    extra sort within the partkey shuffle already paid for, instead of
    a second aggregate + self-join. Supplier/nation/region broadcast;
    ties on exact integer cents all surface (no LIMIT, so the result
    is order-free for the hash compare)."""
    from pyspark.sql import Window

    ps = _partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cost = (
        ps.join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("ps_partkey", "ps_supplycost_c", "s_acctbal", "s_name", "n_name")
    )
    w = Window.partitionBy("ps_partkey")
    best = cost.withColumn("min_c", F.min("ps_supplycost_c").over(w)).filter(
        F.col("ps_supplycost_c") == F.col("min_c")
    )
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    )
    return best.join(F.broadcast(part), F.col("p_partkey") == F.col("ps_partkey")).select(
        "s_acctbal",
        "s_name",
        "n_name",
        "p_partkey",
        "p_name",
        F.round(F.col("ps_supplycost_c") / 100.0, 2).alias("supplycost"),
    )


# ---------------------------------------------------------------------------
# Q11 — important stock: per-part value vs a scalar fraction of the
# national total.
# ---------------------------------------------------------------------------

_Q11_ORACLE = f"""
WITH {_PARTSUPP_CTE},
natps AS (
  SELECT ps_partkey, ps_supplycost_c * ps_availqty AS value_c
  FROM partsupp
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
)
SELECT ps_partkey, ROUND(SUM(value_c) / 100.0, 2) AS part_value
FROM natps
GROUP BY ps_partkey
HAVING SUM(value_c) > (SELECT SUM(value_c) * 0.001 FROM natps)
"""


@register(
    "q11_important_stock",
    _Q11_ORACLE,
    doc="TPC-H Q11 (adapted): parts above a fraction of national stock value",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """natps is computed once; the per-part aggregate and the grand
    total both derive from it (Catalyst reuses the exchange — the
    scalar total is a one-row broadcast cross join, not a second scan).
    value_c is an exact bigint product, so the HAVING threshold —
    bigint sum compared against bigint-sum × 0.001 promoted to double
    — is engine- and order-independent."""
    ps = _partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    natps = (
        ps.join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "ps_partkey",
            (F.col("ps_supplycost_c") * F.col("ps_availqty")).alias("value_c"),
        )
    )
    per_part = natps.groupBy("ps_partkey").agg(F.sum("value_c").alias("sum_c"))
    total = natps.agg((F.sum("value_c") * F.lit(0.001)).alias("threshold"))
    return (
        per_part.join(F.broadcast(total), F.col("sum_c") > F.col("threshold"))
        .select("ps_partkey", F.round(F.col("sum_c") / 100.0, 2).alias("part_value"))
    )


# ---------------------------------------------------------------------------
# Q16 — parts/supplier relationship: NOT IN exclusion + COUNT(DISTINCT).
# Substitution: no supplier comments in the fixture, so "complaint"
# suppliers = negative account balance.
# ---------------------------------------------------------------------------

_Q16_ORACLE = f"""
WITH {_PARTSUPP_CTE}
SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM partsupp JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 24, 35, 45)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


@register(
    "q16_supplier_cnt",
    _Q16_ORACLE,
    doc="TPC-H Q16 (adapted): distinct suppliers per part attribute, NOT IN exclusion",
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """s_suppkey is non-null, so NOT IN is safely a left-anti join
    (relational6.py's rel_not_in_nulls covers the null-poisoned case).
    The excluded-supplier set and the filtered part dimension both
    broadcast; COUNT(DISTINCT) shuffles the pair relation once on the
    grouping key with partial distinct on the map side."""
    ps = _partsupp(spark, sf_dir)
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 35, 45)
    )
    return (
        ps.join(F.broadcast(bad), ps.ps_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("p_partkey") == F.col("ps_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("ps_suppkey")).alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue: per-part avg as a correlated
# predicate, restated in exact integer arithmetic
# (qty < 0.2·avg  ⟺  5·qty·cnt < sum).
# ---------------------------------------------------------------------------

_Q17_ORACLE = """
WITH pq AS (
  SELECT l_partkey AS pk,
         SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
         COUNT(*) AS cnt
  FROM lineitem
  GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) // 7 AS BIGINT) / 100.0
         AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pq   ON pk = l_partkey
WHERE p_brand = 'Brand#3' AND p_size < 5
  AND CAST(l_quantity AS BIGINT) * 5 * cnt < sum_qty
"""


@register(
    "q17_small_qty_revenue",
    _Q17_ORACLE,
    doc="TPC-H Q17 (adapted): revenue of below-avg-quantity lines",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated AVG subquery becomes a per-part aggregate joined
    back — and since l_quantity is integral, ``qty < 0.2·avg`` is the
    exact bigint predicate ``5·qty·cnt < sum``: no float threshold to
    disagree on. Stats are computed over lineitem restricted to the
    qualifying parts first (the correlation key is the part, so the
    restriction commutes); part broadcasts twice, lineitem shuffles
    once on l_partkey for the stats join."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_size") < 5)
    )
    li = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(part.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    pq = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        li.join(pq, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity").cast("long") * 5 * F.col("cnt") < F.col("sum_qty"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "_cents"
            )
        )
        # yearly average to whole cents by exact floor division — a
        # ROUND of cents/7/100 sits on the engine-divergent .xx5 repr
        # boundary (the ml_gini_coefficient ADVICE class)
        .select(
            (
                ((F.col("_cents") - F.pmod(F.col("_cents"), F.lit(7))) / 7)
                .cast("long")
                / 100.0
            ).alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# Q20 — potential part promotion: nested IN-subqueries over derived
# aggregates → chained semi-joins.
# ---------------------------------------------------------------------------

_Q20_ORACLE = f"""
WITH {_PARTSUPP_CTE},
shipped AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         SUM(CAST(l_quantity AS BIGINT)) AS qty96
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey
)
SELECT s_name, s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (
    SELECT ps_suppkey
    FROM partsupp
    JOIN shipped ON pk = ps_partkey AND sk = ps_suppkey
    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'SMALL')
      AND ps_availqty * 2 > qty96
  )
"""


@register(
    "q20_promotion_suppliers",
    _Q20_ORACLE,
    doc="TPC-H Q20 (adapted): suppliers with excess stock of SMALL parts",
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inside-out: the part IN-list broadcasts as a semi-join onto the
    derived pair relation, the 1996-shipment aggregate joins on the
    composite key (both sides already partitioned on it from their
    groupBys — Catalyst reuses the partitioning, no extra shuffle),
    and the surviving supplier keys semi-join the nation-filtered
    supplier dimension. Nothing materializes wider than the pair
    relation."""
    ps = _partsupp(spark, sf_dir)
    small = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "SMALL")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty96"))
    )
    excess = (
        ps.join(F.broadcast(small), F.col("ps_partkey") == F.col("p_partkey"), "left_semi")
        .join(shipped, (F.col("ps_partkey") == F.col("pk")) & (F.col("ps_suppkey") == F.col("sk")))
        .filter(F.col("ps_availqty") * 2 > F.col("qty96"))
        .select("ps_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        supp.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(excess, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting: EXISTS + NOT EXISTS self-joins
# rewritten as ONE per-order aggregate. Substitution: "late" = shipped
# >60 days after order date (no commit/receipt dates in the fixture).
# ---------------------------------------------------------------------------

_Q21_ORACLE = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders    ON o_orderkey = l1.l_orderkey
JOIN nation    ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND n_name = 'NATION_1'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s_name
"""


@register(
    "q21_waiting_suppliers",
    _Q21_ORACLE,
    doc="TPC-H Q21 (adapted): sole-late supplier per multi-supplier order",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instead of two correlated self-joins over the fact table (the
    oracle's literal EXISTS / NOT EXISTS — three lineitem scans), one
    per-order aggregate computes distinct-supplier and distinct-LATE-
    supplier counts; 'l1 is late AND late-supplier-count == 1' is
    exactly 'no OTHER supplier was late', and 'supplier-count ≥ 2' is
    the EXISTS. Lineitem is scanned once and shuffled once on
    l_orderkey (the join and the window-style aggregate share it);
    orders, nation, supplier broadcast."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").join(
        orders, F.col("l_orderkey") == F.col("o_orderkey")
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    flagged = li.withColumn("is_late", late)
    per_order = flagged.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.count_distinct("l_suppkey").alias("supp_cnt"),
        F.count_distinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "late_supp_cnt"
        ),
    )
    culprits = (
        flagged.join(per_order, F.col("l_orderkey") == F.col("ok"))
        .filter(F.col("is_late") & (F.col("supp_cnt") >= 2) & (F.col("late_supp_cnt") == 1))
        .select("l_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    return (
        culprits.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
