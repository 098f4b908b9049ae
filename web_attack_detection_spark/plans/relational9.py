"""Ninth relational wave: collation-aware grouping and incremental
aggregate maintenance.

Collations are Spark 4's engine-level answer to the lower()-wrapper
anti-pattern (a lower() around the group key disables any future
index/statistics use of the column; a collation keeps the column as
the key). Incremental aggregate maintenance is THE pattern behind
every materialized rollup at 100 TB: never recompute history — merge
yesterday's partials with today's delta, and the merge must equal the
full recompute exactly, which is precisely what the oracle checks.

The reference (huunhan1804/web-attack-detection) has neither grouping
nor any notion of incremental computation (SURVEY.md §2.2);
engine-completeness additions, same rationale as relational5.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from web_attack_detection_spark.io.sources import load_table
from web_attack_detection_spark.plans.registry import register

# ---------------------------------------------------------------------------
# collation-aware grouping (UTF8_LCASE) — case-insensitive equivalence
# as an engine collation, not a lower() rewrite
# ---------------------------------------------------------------------------

_COLLATION_ORACLE = """
WITH mixed AS (
  SELECT p_brand FROM part
  UNION ALL
  SELECT upper(p_brand) FROM part
)
SELECT lower(p_brand) AS brand_lc, COUNT(*) AS n
FROM mixed
GROUP BY lower(p_brand)
"""


@register(
    "rel_collation_group",
    _COLLATION_ORACLE,
    doc="UTF8_LCASE collation grouping merges case variants of a key",
)
def rel_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The input is deliberately case-perturbed (each brand unioned
    with its uppercase form); grouping on the UTF8_LCASE-collated
    column merges the variants WITHOUT rewriting the key through
    lower() — at scale that matters because the collated column
    remains the storage column (statistics, bucketing, and future
    partition layouts still apply), where a lower() wrapper makes the
    key an expression no layout can serve. Output is normalized to the
    lowercase form since which variant survives as the group key is
    collation-internal."""
    p = load_table(spark, sf_dir, "part").select("p_brand")
    mixed = p.unionByName(p.select(F.upper("p_brand").alias("p_brand")))
    return (
        mixed.groupBy(F.collate(F.col("p_brand"), "UTF8_LCASE").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            # every member of a UTF8_LCASE group lowercases to the same
            # string, so min(lower(raw)) IS the normalized key
            F.min(F.lower(F.col("p_brand"))).alias("brand_lc"),
        )
        .select("brand_lc", "n")
    )


# ---------------------------------------------------------------------------
# incremental aggregate maintenance: partials(history) ⊎ delta == full
# ---------------------------------------------------------------------------

_INCR_ORACLE = """
SELECT o_orderstatus,
       strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c,
       MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS max_c
FROM orders
GROUP BY 1, 2
"""


@register(
    "rel_incremental_agg_merge",
    _INCR_ORACLE,
    doc="incremental rollup maintenance: history partials + delta == recompute",
)
def rel_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized-rollup update path, oracle-pinned: history
    (orders before 1997) is aggregated to PARTIALS, the delta (1997+)
    is aggregated separately, and the two partial sets merge by
    re-aggregating the mergeable states (sum of counts, sum of sums,
    max of maxes). The oracle recomputes from scratch — the merge must
    be indistinguishable. Works because every aggregate here is
    algebraic; a non-mergeable aggregate (exact median) would force
    the recompute, which is why the registry keeps sketch twins for
    those. At 100 TB, history partials are read from the rollup table
    (tiny), only the delta partition is scanned."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    month = F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "o_orderstatus", month.alias("month")
        ).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents).alias("total_c"),
            F.max(cents).alias("max_c"),
        )

    cut = F.lit("1997-01-01 00:00:00").cast("timestamp")
    history = partials(o.filter(F.col("o_orderdate") < cut))
    delta = partials(o.filter(F.col("o_orderdate") >= cut))
    return (
        history.unionByName(delta)
        .groupBy("o_orderstatus", "month")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("total_c").alias("total_c"),
            F.max("max_c").alias("max_c"),
        )
    )


# ---------------------------------------------------------------------------
# explicit NULLS FIRST/LAST ordering — Spark (ASC ⇒ NULLS FIRST) and
# DuckDB/Postgres (ASC ⇒ NULLS LAST) DISAGREE on the default, so any
# cross-engine sort over nullable keys must pin it explicitly
# ---------------------------------------------------------------------------

_NULL_ORDER_ORACLE = """
WITH c AS (
  SELECT c_custkey, c_nationkey,
         NULLIF(c_acctbal, c_acctbal) AS bal_nulled
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey, c_nationkey, c_acctbal FROM customer WHERE c_custkey % 7 != 0
),
ranked AS (
  SELECT c_custkey, c_nationkey, bal_nulled,
         ROW_NUMBER() OVER (
           PARTITION BY c_nationkey
           ORDER BY bal_nulled DESC NULLS LAST, c_custkey ASC
         ) AS rn
  FROM c
)
SELECT c_nationkey, CAST(rn AS INT) AS rn, c_custkey,
       CAST(CASE WHEN bal_nulled IS NULL THEN 1 ELSE 0 END AS INT) AS is_null
FROM ranked WHERE rn <= 3 OR bal_nulled IS NULL
"""


@register(
    "rel_null_ordering",
    _NULL_ORDER_ORACLE,
    doc="explicit DESC NULLS LAST ranking over an injected-null key",
)
def rel_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 7th customer's balance is nulled (the fixture has no
    nulls), then ranked DESC NULLS LAST per nation. The explicit null
    placement is the whole point: Spark's ASC default puts nulls
    FIRST, DuckDB/Postgres put them LAST, so an unpinned ORDER BY over
    a nullable key silently returns different rows from each engine —
    this query would hash-mismatch the moment either side dropped the
    explicit modifier. Output keeps all null rows plus the top-3 per
    nation to pin both ends of the ordering."""
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer")
    c = cust.select(
        "c_custkey",
        "c_nationkey",
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("c_acctbal"))
        .alias("bal_nulled"),
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("bal_nulled").desc_nulls_last(), F.col("c_custkey").asc()
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") <= 3) | F.col("bal_nulled").isNull())
        .select(
            "c_nationkey",
            F.col("rn").cast("int").alias("rn"),
            "c_custkey",
            F.when(F.col("bal_nulled").isNull(), 1).otherwise(0).cast("int").alias("is_null"),
        )
    )


# ---------------------------------------------------------------------------
# array set operations (union / intersect / except over per-group sets)
# ---------------------------------------------------------------------------

_ARRAY_SETOPS_ORACLE = """
WITH per_order AS (
  SELECT l_orderkey,
         -- DuckDB's filtered list() is NULL (not []) when no row
         -- qualifies; Spark's collect_set is [] — normalize to []
         list_sort(list_distinct(COALESCE(
           list(l_linenumber) FILTER (l_quantity > 25), CAST([] AS INTEGER[])
         ))) AS big_lines,
         list_sort(list_distinct(COALESCE(
           list(l_linenumber) FILTER (l_discount > 0.05), CAST([] AS INTEGER[])
         ))) AS disc_lines
  FROM lineitem
  WHERE l_orderkey < 2000
  GROUP BY l_orderkey
)
SELECT l_orderkey,
       -- to_json: list outputs crash the driver's canonicalizer
       CAST(to_json(list_sort(list_distinct(big_lines || disc_lines))) AS VARCHAR) AS union_lines,
       CAST(to_json(list_sort(list_filter(big_lines, x -> list_contains(disc_lines, x)))) AS VARCHAR)
         AS common_lines,
       CAST(to_json(list_sort(list_filter(big_lines, x -> NOT list_contains(disc_lines, x)))) AS VARCHAR)
         AS only_big,
       CAST(len(list_distinct(big_lines || disc_lines)) AS INTEGER) AS n_union,
       list_contains(big_lines, 1) AS has_line1
FROM per_order
"""


@register(
    "rel_array_setops",
    _ARRAY_SETOPS_ORACLE,
    doc="array_union/intersect/except over per-group sets, canonical sorted output",
)
def rel_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set algebra directly on array columns — per-entity tag/feature
    sets at 100 TB live as arrays precisely so set ops stay ROW-LOCAL
    (one codegen'd projection) instead of re-exploding into a join.
    Engines disagree on element ORDER inside set-op results (Spark
    keeps first occurrence, DuckDB varies), so every array output is
    canonicalized through array_sort — the set, not the sequence, is
    the semantics being checked."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    per_order = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_set(F.when(F.col("l_quantity") > 25, F.col("l_linenumber")))
        ).alias("big_lines"),
        F.array_sort(
            F.collect_set(F.when(F.col("l_discount") > 0.05, F.col("l_linenumber")))
        ).alias("disc_lines"),
    )
    return per_order.select(
        "l_orderkey",
        F.to_json(F.array_sort(F.array_union("big_lines", "disc_lines"))).alias(
            "union_lines"
        ),
        F.to_json(F.array_sort(F.array_intersect("big_lines", "disc_lines"))).alias(
            "common_lines"
        ),
        F.to_json(F.array_sort(F.array_except("big_lines", "disc_lines"))).alias(
            "only_big"
        ),
        F.size(F.array_union("big_lines", "disc_lines")).alias("n_union"),
        F.array_contains("big_lines", 1).alias("has_line1"),
    )


# ---------------------------------------------------------------------------
# discrete percentiles (exact, element-selecting — vs rel_percentiles'
# interpolating continuous form)
# ---------------------------------------------------------------------------

_PCTL_DISC_ORACLE = """
WITH grouped AS (
  SELECT l_returnflag, list_sort(list(CAST(l_quantity AS BIGINT))) AS vals
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(len(vals) AS BIGINT) AS n,
       vals[CAST(ceil(0.5 * len(vals)) AS INTEGER)] AS p50_disc,
       vals[CAST(ceil(0.9 * len(vals)) AS INTEGER)] AS p90_disc
FROM grouped
"""


@register(
    "rel_percentile_disc",
    _PCTL_DISC_ORACLE,
    doc="discrete percentiles: element at ceil(p*n) of the sorted group",
)
def rel_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENTILE_DISC semantics — an actual data value (the element at
    ceil(p·n) in sort order), never an interpolated number that exists
    in no row; required whenever the percentile must be a legal value
    (latency buckets, ordinal codes). Both sides compute the SAME
    index formula on the sorted group, pinning the off-by-one that
    engine-native quantile_disc definitions disagree on. The collected
    per-group array is the oracle formulation; at 100 TB the same
    element is found without materializing the group via the
    row_number = ceil(p·n) window (rel_median's pattern)."""
    li = load_table(spark, sf_dir, "lineitem")
    grouped = li.groupBy("l_returnflag").agg(
        F.array_sort(F.collect_list(F.col("l_quantity").cast("long"))).alias("vals")
    )
    n = F.size("vals")
    return grouped.select(
        "l_returnflag",
        n.cast("long").alias("n"),
        F.element_at("vals", F.ceil(n * 0.5).cast("int")).alias("p50_disc"),
        F.element_at("vals", F.ceil(n * 0.9).cast("int")).alias("p90_disc"),
    )


# ---------------------------------------------------------------------------
# explode_outer: generators that PRESERVE empty-collection rows
# ---------------------------------------------------------------------------

_EXPLODE_OUTER_ORACLE = """
WITH per_order AS (
  SELECT l_orderkey,
         COALESCE(list_sort(list_distinct(
           list(l_linenumber) FILTER (l_quantity > 45)
         )), CAST([] AS INTEGER[])) AS big_lines
  FROM lineitem
  WHERE l_orderkey < 2000
  GROUP BY l_orderkey
)
SELECT l_orderkey,
       u.line AS line_no,
       CAST(CASE WHEN u.line IS NULL THEN 1 ELSE 0 END AS INT) AS no_big_lines
FROM per_order,
     UNNEST(CASE WHEN len(big_lines) = 0
                 THEN [CAST(NULL AS INTEGER)] ELSE big_lines END) AS u(line)
"""


@register(
    "rel_explode_outer",
    _EXPLODE_OUTER_ORACLE,
    doc="explode_outer: empty-array rows survive with a NULL element",
)
def rel_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain explode DROPS rows whose collection is empty — silently
    deleting every order with no qualifying line from the output, the
    classic fan-out bug. explode_outer keeps them with a NULL element
    so downstream aggregates still see every parent row (the LEFT JOIN
    of generators). The oracle normalizes empty lists to [NULL] before
    UNNEST, which is exactly the semantics. At most orders qualify
    here (quantity > 45 is rare), making the preserved-row path the
    dominant case, not the corner."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    per_order = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_set(F.when(F.col("l_quantity") > 45, F.col("l_linenumber")))
        ).alias("big_lines")
    )
    return per_order.select(
        "l_orderkey",
        F.explode_outer("big_lines").alias("line_no"),
    ).withColumn(
        "no_big_lines",
        F.when(F.col("line_no").isNull(), 1).otherwise(0).cast("int"),
    )


# ---------------------------------------------------------------------------
# approx_top_k frequency sketch (Spark 4.1) with an exact oracle
# ---------------------------------------------------------------------------

_APPROX_TOPK_ORACLE = """
SELECT p_brand, COUNT(*) AS cnt
FROM part
GROUP BY p_brand
"""


@register(
    "rel_approx_topk",
    _APPROX_TOPK_ORACLE,
    doc="approx_top_k heavy-hitter sketch, exact-count oracle (k >= NDV regime)",
)
def rel_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via Spark 4.1's ``approx_top_k`` sketch. The
    sketch tracks ``maxItemsTracked`` counters and is MERGEABLE —
    map-side partials combine like any agg, so the full scan never
    shuffles raw values, only fixed-size counter maps (the reason this
    beats exact GROUP BY + ORDER BY at 100 TB: the exact form shuffles
    every distinct key).

    Oracle trick: p_brand has ~25 distinct values, far below
    maxItemsTracked=1024, so every counter is EXACT and k=200 >= NDV
    returns the complete frequency table — the sketch's merge/explode
    plumbing is fully value-checked against exact GROUP BY counts. At
    real scale (NDV >> counters) the counts become estimates with the
    documented Space-Saving error bound; the plumbing is identical.
    """
    p = load_table(spark, sf_dir, "part")
    sk = p.agg(F.expr("approx_top_k(p_brand, 200, 1024)").alias("tk"))
    return sk.select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias("p_brand"),
        F.col("e.count").alias("cnt"),
    )
