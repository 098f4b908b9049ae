"""Fourth relational-coverage wave: conditional aggregation (FILTER
semantics), exact regression aggregates, bitwise aggregates,
try-arithmetic null safety, and map-typed columns.

As with relational3.py, nothing here maps 1:1 to a reference call site
(the reference — huunhan1804/web-attack-detection, SURVEY.md §2.2 —
has no relational layer); these close the remaining scalar/aggregate
surface a production user expects from the engine.

Determinism: every floating output is either an integer-scaled sum or
a single IEEE double expression evaluated identically by both engines
(long/decimal → double casts are exact round-to-nearest in both).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from web_attack_detection_spark.io.sources import load_table, register_views
from web_attack_detection_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Conditional aggregation — SQL FILTER clause semantics: count_if,
# filtered sums, bool_and / bool_or. One shuffle on the group key; the
# predicates evaluate map-side inside the partial aggregate, so at
# scale this costs exactly one pass over the fact table regardless of
# how many conditions are stacked.
# ---------------------------------------------------------------------------

_CONDITIONAL_ORACLE = """
SELECT l_returnflag,
       COUNT(*) AS n,
       COUNT(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
       CAST(COALESCE(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                FILTER (WHERE l_discount > 0.05), 0) AS BIGINT) AS disc_rev_c,
       bool_and(l_quantity > 0) AS all_positive,
       bool_or(l_discount > 0.09) AS any_deep_discount
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "rel_conditional_agg",
    _CONDITIONAL_ORACLE,
    doc="FILTER-clause conditional aggregates: count_if, filtered sum, bool_and/bool_or",
)
def rel_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``count_if`` / conditional ``sum`` / ``bool_and`` / ``bool_or``
    — the DataFrame spellings of SQL's ``FILTER (WHERE ...)``. All
    four fold into ONE partial+final aggregate (check: a single
    HashAggregate pair in the plan), so adding conditions is free at
    scale — the anti-pattern is N self-joins, one per condition."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("l_quantity") > 25).alias("n_bulk"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("l_discount") > 0.05,
                    F.round(F.col("l_extendedprice") * 100).cast("long"),
                )
            ),
            F.lit(0).cast("long"),
        ).alias("disc_rev_c"),
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
    )


# ---------------------------------------------------------------------------
# Exact linear-regression aggregates (slope / intercept per group).
# Same co-moment discipline as rel_correlation: all sums are exact
# integers (quantity as long, price in cents), combined in 128-bit
# arithmetic (Spark DECIMAL(38,0), DuckDB HUGEINT), and only the FINAL
# slope/intercept are doubles — one exact-integer→double cast and one
# IEEE division, identical in both engines. A bare regr_slope() over
# doubles would differ in the last ulp per partition order.
# ---------------------------------------------------------------------------

_REGR_ORACLE = """
WITH m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM(CAST(l_quantity AS BIGINT)) AS sx,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS sy,
         SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
         SUM(CAST(l_quantity AS BIGINT) * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS sxy
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
         / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS slope,
       (CAST(sy AS DOUBLE)
          - (CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
             / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
            * CAST(sx AS DOUBLE))
         / CAST(n AS DOUBLE) AS intercept
FROM m
"""


@register(
    "rel_regr_aggregates",
    _REGR_ORACLE,
    doc="exact per-group OLS slope/intercept from integer co-moments",
)
def rel_regr_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group simple linear regression (price-cents on quantity)
    computed from exact integer co-moments — the deterministic twin of
    ``regr_slope``/``regr_intercept``. The five sums fit one map-side
    partial aggregate; the 128-bit combination happens once per group
    AFTER aggregation (3 rows), so the wide arithmetic costs nothing
    at scale. Long sums stay far under 2^63 at any SF because the
    per-row product is bounded (qty ≤ 50 × cents ≤ 1e7); the n*sxy
    cross terms are what need 128 bits."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    x = F.col("l_quantity").cast("long")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(cents).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * cents).alias("sxy"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    num = (dec("n") * dec("sxy") - dec("sx") * dec("sy")).cast("double")
    den = (dec("n") * dec("sxx") - dec("sx") * dec("sx")).cast("double")
    slope = num / den
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return m.select(
        "l_returnflag", "n", slope.alias("slope"), intercept.alias("intercept")
    )


# ---------------------------------------------------------------------------
# Bitwise aggregates — bit_and / bit_or / bit_xor. Niche but cheap to
# support (one partial aggregate) and genuinely useful at scale for
# permission-mask rollups and parity checks over key sets.
# ---------------------------------------------------------------------------

_BITWISE_ORACLE = """
SELECT l_returnflag,
       bit_and(CAST(l_partkey AS BIGINT)) AS mask_and,
       bit_or(CAST(l_partkey AS BIGINT)) AS mask_or,
       bit_xor(CAST(l_partkey AS BIGINT)) AS parity_xor,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "rel_bitwise_agg",
    _BITWISE_ORACLE,
    doc="bitwise aggregates bit_and/bit_or/bit_xor per group",
)
def rel_bitwise_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR aggregates over the part keys per return
    flag. Commutative + associative → perfect map-side partials; XOR
    additionally gives an order-independent set fingerprint (used by
    the dedup reconciliation pattern in SCALE.md)."""
    li = load_table(spark, sf_dir, "lineitem")
    pk = F.col("l_partkey").cast("long")
    return li.groupBy("l_returnflag").agg(
        F.bit_and(pk).alias("mask_and"),
        F.bit_or(pk).alias("mask_or"),
        F.bit_xor(pk).alias("parity_xor"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# try_* arithmetic — ANSI mode is ON engine-wide (Spark 4 default;
# overflow/bad-cast/div-zero THROW). The try_* family is the per-
# expression escape hatch: failures become NULL instead of killing a
# 1000-executor job 3 hours in. This query proves the NULL semantics
# line up with SQL's NULLIF/TRY_CAST forms.
# ---------------------------------------------------------------------------

_TRY_ORACLE = """
SELECT l_returnflag,
       COUNT(*) AS n,
       COUNT(*) FILTER (WHERE CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                              / NULLIF(l_linenumber - 1, 0) IS NULL) AS n_div_null,
       CAST(COALESCE(SUM(CAST(ROUND(
           CAST(ROUND(l_extendedprice * 100) AS BIGINT) / NULLIF(l_linenumber - 1, 0)
         ) AS BIGINT)), 0) AS BIGINT) AS sum_ratio_c,
       COUNT(TRY_CAST(substring(CAST(l_shipdate AS VARCHAR), 1, 4) AS BIGINT))
         AS n_year_parses,
       COUNT(*) FILTER (WHERE TRY_CAST(l_returnflag AS BIGINT) IS NULL) AS n_bad_casts
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "rel_try_arithmetic",
    _TRY_ORACLE,
    doc="try_divide/try_cast null-on-failure semantics under ANSI mode",
)
def rel_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``try_divide`` (NULL on /0) and ``try_cast`` (NULL on bad
    parse) aggregated per return flag. ``l_linenumber - 1`` is zero
    for every first line item, so ~quarter of the divisions hit /0 —
    the point is the expression yields NULL instead of killing the job
    under ANSI mode. The shipdate-year substring is the succeed path
    for try_cast, the returnflag letter the fail path. NULL behavior
    is asserted via counts, keeping the output small and
    engine-comparable."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    ratio = F.try_divide(cents, F.col("l_linenumber") - 1)
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(ratio.isNull()).alias("n_div_null"),
        F.coalesce(F.sum(F.round(ratio).cast("long")), F.lit(0).cast("long")).alias(
            "sum_ratio_c"
        ),
        F.count(
            F.substring(F.col("l_shipdate").cast("string"), 1, 4).try_cast("long")
        ).alias("n_year_parses"),
        F.count_if(F.col("l_returnflag").try_cast("long").isNull()).alias(
            "n_bad_casts"
        ),
    )


# ---------------------------------------------------------------------------
# Map-typed columns — map_from_entries / try_element_at / map_keys.
# The map is BUILT in Spark (per-user event_type→count) and consumed
# with map functions; the oracle computes the same scalars relationally
# (DuckDB's map surface differs too much to compare maps directly, and
# the driver hashes scalar columns anyway).
# ---------------------------------------------------------------------------

_MAP_ORACLE = """
SELECT user_id,
       CASE WHEN COUNT(*) FILTER (WHERE event_type = 'click') > 0
            THEN COUNT(*) FILTER (WHERE event_type = 'click') END AS n_click,
       COUNT(DISTINCT event_type) AS n_types,
       string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_csv
FROM events
WHERE user_id < 200
GROUP BY user_id
"""


@register(
    "rel_map_funcs",
    _MAP_ORACLE,
    doc="map column build + lookup: map_from_entries, try_element_at, map_keys",
)
def rel_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Builds a per-user ``map<event_type, count>`` with
    ``map_from_entries(sort_array(collect_list(struct(...))))`` and
    reads it back with ``try_element_at`` (ANSI-safe NULL on missing
    key — plain ``element_at`` THROWS under ANSI), ``map_keys``, and
    ``size``. Sorting entries before building makes map iteration
    order deterministic, so the keys-csv matches the oracle's ordered
    string_agg. At scale the map stays a per-group value (bounded by
    event-type cardinality), never a shuffle key."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    m = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("m")
    )
    return m.select(
        "user_id",
        F.try_element_at("m", F.lit("click")).alias("n_click"),
        F.size("m").cast("long").alias("n_types"),
        F.array_join(F.map_keys("m"), ",").alias("types_csv"),
    )


# ---------------------------------------------------------------------------
# MERGE INTO / upsert — operators/merge.merge_upsert driven end-to-end.
# The update set is derived deterministically from orders (CDC-style:
# recomputed balances for a third of the customers, plus brand-new
# keys), so the oracle can rebuild the identical merge with a FULL
# OUTER JOIN.
# ---------------------------------------------------------------------------

_MERGE_ORACLE = """
WITH ub AS (
  SELECT o_custkey, CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS acctbal_c
  FROM orders WHERE o_custkey % 3 = 0 GROUP BY o_custkey
), u AS (
  SELECT o_custkey AS c_custkey, CAST(o_custkey % 25 AS BIGINT) AS c_nationkey,
         acctbal_c FROM ub
  UNION ALL
  SELECT o_custkey + 10000000, CAST(o_custkey % 25 AS BIGINT), acctbal_c FROM ub
), t AS (
  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_c
  FROM customer
)
SELECT COALESCE(t.c_custkey, u.c_custkey) AS c_custkey,
       COALESCE(t.c_nationkey, u.c_nationkey) AS c_nationkey,
       COALESCE(u.acctbal_c, t.acctbal_c) AS acctbal_c
FROM t FULL OUTER JOIN u ON t.c_custkey = u.c_custkey
"""


@register(
    "rel_merge_upsert",
    _MERGE_ORACLE,
    doc="MERGE INTO semantics (update-matched + insert-unmatched) in one full-outer join",
)
def rel_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style upsert: recomputed balances for customers with
    ``custkey % 3 = 0`` update in place (keeping the customer's own
    nation), shifted keys insert as new rows. ``merge_upsert`` executes
    the whole MERGE as ONE full-outer join + per-column coalesce — the
    plan a table format (Delta/Iceberg) generates for the same
    statement, minus the transaction log. Broadcast the delta when it
    fits; here both sides shuffle on the key once."""
    from web_attack_detection_spark.operators.merge import merge_upsert

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("acctbal_c"),
    )
    ub = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 3 == 0)
        .groupBy("o_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("acctbal_c"))
    )
    nk = (F.col("o_custkey") % 25).cast("long").alias("c_nationkey")
    updates = (
        ub.select(F.col("o_custkey").alias("c_custkey"), nk, "acctbal_c")
    ).unionByName(
        ub.select(
            (F.col("o_custkey") + 10000000).alias("c_custkey"), nk, "acctbal_c"
        )
    )
    return merge_upsert(cust, updates, ["c_custkey"], update_cols=["acctbal_c"])


# ---------------------------------------------------------------------------
# SCD2 dimension maintenance — operators/merge.scd2_apply end-to-end:
# close changed current versions, append new ones, insert new keys.
# ---------------------------------------------------------------------------

_SCD2_ORACLE = """
WITH t AS (
  SELECT c_custkey, CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_c,
         DATE '1990-01-01' AS vf FROM customer
), u AS (
  SELECT o_custkey AS c_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS acctbal_c,
         CAST(MAX(o_orderdate) AS DATE) AS eff
  FROM orders GROUP BY o_custkey
)
SELECT t.c_custkey, t.acctbal_c,
       strftime(t.vf, '%Y-%m-%d') AS valid_from,
       CASE WHEN u.c_custkey IS NOT NULL AND u.acctbal_c <> t.acctbal_c
            THEN strftime(u.eff, '%Y-%m-%d') END AS valid_to
FROM t LEFT JOIN u ON t.c_custkey = u.c_custkey
UNION ALL
SELECT u.c_custkey, u.acctbal_c, strftime(u.eff, '%Y-%m-%d'), NULL
FROM u LEFT JOIN t ON t.c_custkey = u.c_custkey
WHERE t.c_custkey IS NULL OR u.acctbal_c <> t.acctbal_c
"""


@register(
    "rel_scd2_upsert",
    _SCD2_ORACLE,
    doc="SCD type-2 merge: close changed versions, append new, one shuffle",
)
def rel_scd2_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 over the customer balance:
    every customer starts as one open version (valid_from 1990-01-01);
    the update batch (recomputed balance + last order date per
    customer) closes changed versions at the effective date and
    appends the new open version. ``scd2_apply`` does it in one
    full-outer join + inline generator — history never reshuffles.
    Dates are emitted as formatted strings for engine-neutral
    comparison."""
    from web_attack_detection_spark.operators.merge import scd2_apply

    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("acctbal_c"),
        F.lit("1990-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    upd = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("acctbal_c"),
            F.max(F.col("o_orderdate")).cast("date").alias("effective_date"),
        )
        .withColumnRenamed("o_custkey", "c_custkey")
    )
    res = scd2_apply(dim, upd, "c_custkey", ["acctbal_c"])
    return res.select(
        "c_custkey",
        "acctbal_c",
        F.date_format("valid_from", "yyyy-MM-dd").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd").alias("valid_to"),
    )


# ---------------------------------------------------------------------------
# String-function battery 2 — padding, repetition, splitting, and
# positional functions (battery 1 = rel_scalar_funcs: case, substring,
# concat, length). All JVM-side, whole-stage-codegen'd.
# ---------------------------------------------------------------------------

_STRING2_ORACLE = """
SELECT p_partkey,
       lpad(p_brand, 12, '*') AS brand_lpad,
       rpad(p_brand, 12, '_') AS brand_rpad,
       repeat(p_mfgr_tag, 2) AS tag_twice,
       reverse(p_brand) AS brand_rev,
       replace(p_type, ' ', '-') AS type_dashed,
       split_part(p_type, ' ', 2) AS type_mid,
       CAST(instr(p_type, 'BRASS') AS BIGINT) AS brass_pos,
       left(p_name, 5) AS name_head,
       right(p_name, 4) AS name_tail,
       translate(p_brand, '#', '№') AS brand_tr
FROM (SELECT *, substring(p_brand, 7) AS p_mfgr_tag FROM part)
WHERE p_partkey < 500
"""


@register(
    "rel_string_funcs2",
    _STRING2_ORACLE,
    doc="string battery 2: lpad/rpad/repeat/reverse/replace/split_part/instr/left/right/translate",
)
def rel_string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding, repetition, reversal, replacement, token extraction
    (1-based ``split_part``), substring position (1-based ``instr``, 0
    = absent), prefix/suffix slices, and character translation — all
    built-in JVM expressions inside one WholeStageCodegen projection
    over the pruned scan."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    tag = F.substring("p_brand", 7, 99)
    return p.select(
        "p_partkey",
        F.lpad("p_brand", 12, "*").alias("brand_lpad"),
        F.rpad("p_brand", 12, "_").alias("brand_rpad"),
        F.repeat(tag, 2).alias("tag_twice"),
        F.reverse("p_brand").alias("brand_rev"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("-")).alias("type_dashed"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(2)).alias("type_mid"),
        F.instr("p_type", "BRASS").cast("long").alias("brass_pos"),
        F.left(F.col("p_name"), F.lit(5)).alias("name_head"),
        F.right(F.col("p_name"), F.lit(4)).alias("name_tail"),
        F.translate("p_brand", "#", "№").alias("brand_tr"),
    )


# ---------------------------------------------------------------------------
# Recursive CTE (Spark 4's WITH RECURSIVE): a month spine generated by
# recursion, left-joined to monthly order revenue. The recursion is a
# driver-cheap 84-row series; the fact-side aggregate is the real work
# and stays one shuffle. (rel_gap_fill_locf builds the same spine with
# sequence()+explode — two engine mechanisms, one semantic.)
# ---------------------------------------------------------------------------

_RECURSIVE_SPARK = """
WITH RECURSIVE months(m) AS (
  SELECT DATE '1992-01-01'
  UNION ALL
  SELECT CAST(m + INTERVAL '1' MONTH AS DATE) FROM months WHERE m < DATE '1998-12-01'
), rev AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
         COUNT(*) AS n_orders,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_c
  FROM orders GROUP BY 1
)
SELECT date_format(months.m, 'yyyy-MM') AS month,
       CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
       CAST(COALESCE(rev_c, 0) AS BIGINT) AS rev_c
FROM months LEFT JOIN rev ON months.m = rev.m
"""

_RECURSIVE_ORACLE = """
WITH RECURSIVE months(m) AS (
  SELECT DATE '1992-01-01'
  UNION ALL
  SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months WHERE m < DATE '1998-12-01'
), rev AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
         COUNT(*) AS n_orders,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_c
  FROM orders GROUP BY 1
)
SELECT strftime(months.m, '%Y-%m') AS month,
       CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
       CAST(COALESCE(rev_c, 0) AS BIGINT) AS rev_c
FROM months LEFT JOIN rev ON months.m = rev.m
"""


@register(
    "rel_recursive_cte",
    _RECURSIVE_ORACLE,
    doc="WITH RECURSIVE month spine left-joined to monthly revenue",
)
def rel_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 recursive CTE: the month spine recurses 84 rows (one
    UnionLoop iteration each — bounded, terminating), then joins the
    aggregated fact side. At scale recursion depth — not data volume —
    is the knob to watch: each iteration is a plan execution, so keep
    recursive members O(spine), never O(fact). Spine bounds are
    literals covering the fixture's full order-date range; empty
    months survive via the left join (COALESCE 0)."""
    register_views(spark, sf_dir, "orders")
    return spark.sql(_RECURSIVE_SPARK)


# ---------------------------------------------------------------------------
# Cross join — the one join type not yet in the registry. Both sides
# tiny dimensions (the only place a cartesian product belongs).
# ---------------------------------------------------------------------------

_CROSS_ORACLE = """
SELECT n.n_name, r.r_name,
       CASE WHEN n.n_regionkey = r.r_regionkey THEN 1 ELSE 0 END AS is_home
FROM nation n CROSS JOIN region r
"""


@register(
    "rel_cross_join",
    _CROSS_ORACLE,
    doc="explicit cartesian product of two dimensions (BroadcastNestedLoopJoin)",
)
def rel_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product (``crossJoin`` — Spark refuses
    implicit ones) between the two smallest dimensions, flagging each
    nation's home region. Plans as BroadcastNestedLoopJoin with the
    5-row side broadcast. The scale rule: a cross join is only ever
    legal when one side is O(constant) — anything else is a bug the
    explicit API surface makes visible."""
    n = load_table(spark, sf_dir, "nation").select("n_name", "n_regionkey")
    r = load_table(spark, sf_dir, "region").select("r_name", "r_regionkey")
    return n.crossJoin(r).select(
        "n_name",
        "r_name",
        F.when(F.col("n_regionkey") == F.col("r_regionkey"), 1)
        .otherwise(0)
        .alias("is_home"),
    )


# ---------------------------------------------------------------------------
# NOT IN vs NOT EXISTS under three-valued logic — the classic silent-
# wrong-answer trap: one NULL in the subquery makes NOT IN return
# nothing, while NOT EXISTS keeps working.
# ---------------------------------------------------------------------------

_NOT_IN_SQL = """
SELECT
  (SELECT COUNT(*) FROM customer
   WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)) AS not_in_clean,
  (SELECT COUNT(*) FROM customer
   WHERE c_custkey NOT IN
     (SELECT CASE WHEN o_custkey % 100 = 0 THEN NULL ELSE o_custkey END
      FROM orders)) AS not_in_nullable,
  (SELECT COUNT(*) FROM customer c
   WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey))
    AS not_exists
"""


@register(
    "rel_not_in_nulls",
    _NOT_IN_SQL,
    doc="NOT IN three-valued logic vs NOT EXISTS (same SQL text on both engines)",
)
def rel_not_in_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identical ANSI text on both engines. ``not_in_clean`` counts
    customers without orders; ``not_in_nullable`` is 0 — one NULL in
    the NOT IN set makes every predicate UNKNOWN — and ``not_exists``
    matches the clean count because EXISTS is two-valued. Catalyst
    plans NOT IN as a null-aware anti join (an extra null-check per
    probe); prefer NOT EXISTS at scale unless the null semantics are
    the point."""
    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(_NOT_IN_SQL)


# ---------------------------------------------------------------------------
# VARIANT (Spark 4's semi-structured type): parse_json once into an
# open-schema binary value, extract typed paths with variant_get. The
# scale pitch over from_json: no schema declaration to maintain when
# producers add fields, and the encoding is columnar-shreddable.
# ---------------------------------------------------------------------------

_VARIANT_ORACLE = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(*) FILTER (WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) < 50)
         AS n_small,
       'OBJECT<k: BIGINT>' AS schema_str
FROM events
GROUP BY event_type
"""


@register(
    "rel_variant_json",
    _VARIANT_ORACLE,
    doc="VARIANT type: parse_json + variant_get typed path extraction",
)
def rel_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``parse_json`` → VARIANT → ``variant_get(v, '$.k', 'long')``,
    aggregated per event type, with ``schema_of_variant`` proving the
    inferred per-row schema. Parse ONCE into a column and extract many
    paths from it — same rule as from_json, but the VARIANT keeps
    untyped fields available without a declared schema (the
    schema-drift-proof ingestion path for 100 TB of heterogeneous
    event logs). DuckDB has no VARIANT; the oracle extracts the same
    values through its JSON type."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "v", F.parse_json("props")
    )
    k = F.variant_get("v", "$.k", "long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.count_if(k < 50).alias("n_small"),
        F.min(F.schema_of_variant(F.col("v"))).alias("schema_str"),
    )
