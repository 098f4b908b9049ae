"""Fifth relational wave: the classic TPC-H plan-shape battery, adapted
to the fixture star schema (FIXTURES.md — no partsupp table, no
l_shipmode/l_commitdate/l_receiptdate, no c_phone/o_comment, so Q2/Q11/
Q16/Q17/Q20/Q21 have no faithful analogue and the others substitute
equivalent predicates over existing columns; each docstring states the
substitution).

The reference (huunhan1804/web-attack-detection, SURVEY.md §2.2) has no
relational layer at all — this battery exists because the engine we
ship must cover the standard analytical plan shapes: semi-join
decorrelation (Q4), multi-dim volume joins (Q7/Q8/Q9), outer-join
distributions (Q13), single-pass conditional ratios (Q12/Q14), scalar
subquery against a derived aggregate (Q15/Q22), HAVING-filtered
re-joins (Q18), and OR-of-conjuncts pushdown (Q19).

Determinism: the registry's integer-scaled money discipline throughout
(see plans/registry.py docstring); ratios are ONE double division of
two exact integer sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from web_attack_detection_spark.io.sources import load_table
from web_attack_detection_spark.plans.registry import (
    money_sum,
    register,
    sql_money_sum,
)

_CENTS = "CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"


def _rev_cents() -> F.Column:
    return F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")


# ---------------------------------------------------------------------------
# Q4 — order-priority checking: EXISTS decorrelated to a semi-join.
# Substitution: the fixture lineitem has no l_commitdate/l_receiptdate,
# so "late line" = shipped more than 60 days after the order date.
# ---------------------------------------------------------------------------

_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""


@register(
    "q4_order_priority",
    _Q4_ORACLE,
    doc="TPC-H Q4: EXISTS → left-semi join, count by priority",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalyst decorrelates nothing here — we hand it the semi-join
    directly: orders (date-filtered at the scan) LEFT SEMI lineitem on
    key + the late-ship condition. The semi join shuffles both sides on
    l_orderkey once; at 100 TB the date filter prunes orders partitions
    first, and the semi join never materializes lineitem columns."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, on=late, how="left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations, both directions, by year.
# ---------------------------------------------------------------------------

_Q7_ORACLE = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       {sql_money_sum('l_extendedprice * (1 - l_discount)', 10000, 4)} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, CAST(year(l_shipdate) AS INTEGER)
"""


@register(
    "q7_nation_volume",
    _Q7_ORACLE,
    doc="TPC-H Q7: bidirectional two-nation trade volume by year",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nation pair predicate is applied AFTER both broadcast joins
    (it references both sides), but customer/supplier/nation all
    broadcast, so lineitem⋈orders stays the only shuffle. At 100 TB
    the l_shipdate range prunes the fact scan; the OR-pair filter
    reduces rows before the aggregate's exchange."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            money_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 10000, 4
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q8 — national market share within a region for one part type.
# Substitution: p_type = 'PROMO' (fixture types are single words).
# ---------------------------------------------------------------------------

_Q8_ORACLE = f"""
WITH all_nations AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         {_CENTS} AS volume_c,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA'
    AND p_type = 'PROMO'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
)
SELECT o_year,
       ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume_c ELSE 0 END)
             / CAST(SUM(volume_c) AS DOUBLE), 6) AS mkt_share
FROM all_nations
GROUP BY o_year
"""


@register(
    "q8_market_share",
    _Q8_ORACLE,
    doc="TPC-H Q8: national market share — conditional-sum ratio",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eight-way join where every dimension broadcasts — the fact table
    moves once (lineitem⋈orders shuffle) and the share is a single
    conditional aggregate, NOT two separate scans. The ratio divides
    two exact integer cent-sums; one IEEE division both engines
    perform identically."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("volume_c")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _rev_cents().alias("volume_c"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0))
                / F.sum(vol).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit by supplier nation and year.
# Substitution: no partsupp/ps_supplycost in the fixtures, so cost is
# modeled as 10% of p_retailprice per unit; profit stays an exact
# integer (tenth-of-a-cent scale) so the sum is order-independent.
# ---------------------------------------------------------------------------

_Q9_ORACLE = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1000) AS BIGINT)
                 - CAST(ROUND(p_retailprice * 100) AS BIGINT)
                   * CAST(l_quantity AS BIGINT)) / 1000.0, 3) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, CAST(year(o_orderdate) AS INTEGER)
"""


@register(
    "q9_product_profit",
    _Q9_ORACLE,
    doc="TPC-H Q9: profit by supplier nation × year, LIKE-filtered part",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part is LIKE-filtered then broadcast (the filter cannot push to
    a parquet row-group stat, but it prunes the broadcast build side);
    supplier/nation broadcast; lineitem⋈orders is the one shuffle.
    Profit per row is an exact integer in tenth-cents: 1000×revenue
    minus (retail cents × integer quantity × 10¢ cost share), summed
    as BIGINT."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    profit_milli = (
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1000).cast("long")
        - F.round(F.col("p_retailprice") * 100).cast("long")
        * F.col("l_quantity").cast("long")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.round(F.sum(profit_milli) / 1000.0, 3).alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q12 — shipping-delay buckets × order priority (single-pass counts).
# Substitution: no l_shipmode/l_receiptdate — buckets derive from the
# ship delay (days between order and ship date).
# ---------------------------------------------------------------------------

_Q12_ORACLE = """
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30 THEN 'on-time'
            WHEN date_diff('day', o_orderdate, l_shipdate) <= 90 THEN 'late'
            ELSE 'very-late' END AS delay_bucket,
       COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
         AS high_line_count,
       COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
         AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1
"""


@register(
    "q12_shipping_delay",
    _Q12_ORACLE,
    doc="TPC-H Q12: delay buckets × priority split, one pass",
)
def q12_shipping_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both priority counts come out of ONE aggregate over the joined
    rows (conditional count_if), not two passes. The delay bucket is a
    computed group key — Catalyst evaluates it map-side before the
    exchange, so the shuffle carries 3 distinct keys."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay <= 30, "on-time").when(delay <= 90, "late").otherwise("very-late")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.count_if(is_high).alias("high_line_count"),
            F.count_if(~is_high).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution via outer join.
# Substitution: no o_comment — the excluded subset is urgent-priority
# orders instead, so some customers legitimately count zero.
# ---------------------------------------------------------------------------

_Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority = '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


@register(
    "q13_customer_distribution",
    _Q13_ORACLE,
    doc="TPC-H Q13: left-outer join → per-customer count → distribution",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The join predicate (priority filter) lives in the OUTER join
    condition, not a WHERE — a WHERE would silently convert the outer
    join to inner and drop the zero bucket. COUNT(o_orderkey) counts
    non-null matches only. Two aggregates: the first shuffles on
    c_custkey, the second on the tiny c_count domain."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# ---------------------------------------------------------------------------
# Q14 — promotion revenue share for one ship-month.
# ---------------------------------------------------------------------------

_Q14_ORACLE = f"""
SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO' THEN {_CENTS} ELSE 0 END)
             / CAST(SUM({_CENTS}) AS DOUBLE), 6) AS promo_ratio,
       {sql_money_sum('l_extendedprice * (1 - l_discount)', 100, 2)} AS total_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
"""


@register(
    "q14_promo_revenue",
    _Q14_ORACLE,
    doc="TPC-H Q14: promo revenue share — conditional ratio, part broadcast",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One month of lineitem (scan-pruned) ⋈ broadcast part; the ratio
    numerator and denominator are computed in the SAME single
    aggregate. 100.0 × an exact cents ratio — one multiply + one
    divide on doubles, identical across engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    cents = _rev_cents()
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", cents).otherwise(0))
                / F.sum(cents).cast("double"),
                6,
            ).alias("promo_ratio"),
            F.round(F.sum(cents) / 100.0, 2).alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier(s): scalar-subquery max over a derived aggregate.
# ---------------------------------------------------------------------------

_Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
           AS total_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, ROUND(total_c / 100.0, 2) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_c = (SELECT MAX(total_c) FROM revenue)
"""


@register(
    "q15_top_supplier",
    _Q15_ORACLE,
    doc="TPC-H Q15: supplier(s) at max quarterly revenue",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived revenue aggregate is computed ONCE and reused for
    both the max and the equality filter (in SQL this needs a CTE or
    the view the spec uses). The single-row max cross-joins back in —
    a broadcast nested loop over one row. Ties all surface; the
    equality is on exact integer cents, so 'max' is unambiguous."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev_cents()).alias("total_c"))
    )
    top = revenue.agg(F.max("total_c").alias("max_c"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(top), F.col("total_c") == F.col("max_c"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_c") / 100.0, 2).alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume orders: HAVING over a fact aggregate, re-joined.
# ---------------------------------------------------------------------------

_Q18_ORACLE = """
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) / 100.0 AS totalprice,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
HAVING SUM(CAST(l_quantity AS BIGINT)) > 300
"""


@register(
    "q18_large_orders",
    _Q18_ORACLE,
    doc="TPC-H Q18: orders whose total quantity exceeds 300",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate lineitem by order FIRST (map-side partials shrink the
    shuffle to one row per order), filter > 300, THEN join orders and
    broadcast customer — the classic pre-aggregate-before-join
    rewrite; grouping the 3-way join output directly would shuffle
    every lineitem row with its order/customer payload attached."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            (F.round(F.col("o_totalprice") * 100).cast("long") / 100.0).alias(
                "totalprice"
            ),
            "sum_qty",
        )
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue over OR-of-conjuncts brackets.
# Substitution: no p_container/l_shipmode — brackets pair brand with
# p_size and quantity ranges only.
# ---------------------------------------------------------------------------

_Q19_ORACLE = f"""
SELECT {sql_money_sum('l_extendedprice * (1 - l_discount)', 10000, 4)} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


@register(
    "q19_bracket_revenue",
    _Q19_ORACLE,
    doc="TPC-H Q19: OR-of-conjuncts bracket predicate across the join",
)
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OR references both join sides, so it can't become the join
    key — but Catalyst derives the single-side residuals (quantity ≤ 30
    on lineitem, brand∈{1,2,3} ∧ size ≤ 15 on part) and pushes them to
    the scans, shrinking both inputs before the broadcast hash join
    evaluates the full bracket."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    bracket = (
        ((b == "Brand#1") & s.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#2") & s.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#3") & s.between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(bracket)
        .agg(
            money_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 10000, 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q22 — dormant high-balance customers per nation.
# Substitution: no c_phone country codes — grouped by c_nationkey; the
# anti-join excludes customers with any RECENT order (≥ 2000-01-01)
# rather than any order at all (every fixture customer has orders).
# ---------------------------------------------------------------------------

_Q22_ORACLE = """
WITH thresh AS (
  SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) * 1.0 / COUNT(*) AS avg_c
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS totacctbal_c
FROM customer, thresh
WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) > avg_c
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
  )
GROUP BY c_nationkey
"""


@register(
    "q22_dormant_customers",
    _Q22_ORACLE,
    doc="TPC-H Q22: above-average-balance customers with no recent orders",
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three classic shapes in one: a scalar aggregate broadcast back
    as a cross-join threshold, a NOT EXISTS as a left-anti join on the
    date-filtered orders, and the final regroup. The threshold compare
    is exact-integer cents vs one exact division; the anti join's
    build side (recent orders, keys only) broadcasts at any SF because
    it's projected to the join key before the exchange."""
    cust = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    thresh = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg((F.sum(cents) * 1.0 / F.count(F.lit(1))).alias("avg_c"))
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(thresh))
        .filter(cents > F.col("avg_c"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(cents).alias("totacctbal_c"),
        )
    )
