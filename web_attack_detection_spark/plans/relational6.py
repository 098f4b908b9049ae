"""Sixth relational wave: generator/table functions (posexplode,
inline), URL parsing, timezone conversion, and HyperLogLog sketch
aggregation.

The reference (huunhan1804/web-attack-detection) has none of these —
SURVEY.md §2.2 records its empty relational surface; these close out
the scalar/generator/sketch functions a production analytics user
expects. Sketches are the 100 TB path for distinct-count questions:
a merged HLL is a few KB per group regardless of input size, versus a
full shuffle of every distinct key for the exact answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from web_attack_detection_spark.io.sources import load_table
from web_attack_detection_spark.plans.registry import register

# ---------------------------------------------------------------------------
# posexplode — generator with ordinality.
# ---------------------------------------------------------------------------

_POSEXPLODE_ORACLE = """
SELECT p_partkey,
       CAST(generate_subscripts(string_split(p_name, ' '), 1) - 1 AS INTEGER) AS pos,
       unnest(string_split(p_name, ' ')) AS word
FROM part
WHERE p_partkey <= 200
"""


@register(
    "rel_posexplode",
    _POSEXPLODE_ORACLE,
    doc="posexplode: generator with ordinality (UNNEST WITH ORDINALITY)",
)
def rel_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``posexplode`` emits (position, element) pairs — the SQL
    standard's UNNEST WITH ORDINALITY (DuckDB spells the ordinality
    ``generate_subscripts``, zipped positionally with ``unnest``).
    Generators run inside whole-stage codegen, one output row per
    element, no shuffle; the p_partkey filter pushes to the scan."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200)
    return part.select(
        "p_partkey",
        F.posexplode(F.split(F.col("p_name"), " ")).alias("pos", "word"),
    )


# ---------------------------------------------------------------------------
# inline — explode an array of structs into columns.
# ---------------------------------------------------------------------------

_INLINE_ORACLE = """
SELECT n_nationkey, 'prefix' AS tag, substr(n_name, 1, 6) AS val FROM nation
UNION ALL
SELECT n_nationkey, 'length' AS tag, CAST(length(n_name) AS VARCHAR) AS val FROM nation
"""


@register(
    "rel_inline_structs",
    _INLINE_ORACLE,
    doc="inline(array<struct>): struct generator ≡ stacked UNION ALL",
)
def rel_inline_structs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``inline`` turns an array of structs into rows × columns — the
    engine-side equivalent of N stacked UNION ALL branches, but with
    ONE scan of the input instead of N (the oracle pays two scans;
    at scale the generator form wins linearly in branch count)."""
    nation = load_table(spark, sf_dir, "nation")
    return nation.selectExpr(
        "n_nationkey",
        "inline(array("
        "  struct('prefix' AS tag, substr(n_name, 1, 6) AS val),"
        "  struct('length' AS tag, CAST(length(n_name) AS STRING) AS val)))",
    )


# ---------------------------------------------------------------------------
# parse_url — structured URL decomposition.
# ---------------------------------------------------------------------------

_URL_ORACLE = """
WITH urls AS (
  SELECT doc_id,
         'https://' || source || '.example.org/' || lang || '/doc/' || doc_id
           || '?q=' || lang || '&page=' || (doc_id % 10) AS url
  FROM documents WHERE doc_id <= 300
)
SELECT doc_id,
       regexp_extract(url, 'https://([^/]+)/', 1) AS host,
       regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
       regexp_extract(url, '\\?(.*)$', 1) AS query,
       regexp_extract(url, '[?&]q=([^&]*)', 1) AS q_param
FROM urls
"""


@register(
    "rel_url_funcs",
    _URL_ORACLE,
    doc="parse_url HOST/PATH/QUERY + query-param extraction",
)
def rel_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``parse_url`` is a real URI parser (java.net.URI under the
    hood); the oracle re-derives each component with regexes over the
    same constructed URL. All JVM-side scalar work — no shuffle, and
    the doc_id filter prunes the scan."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 300)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.org/"),
        F.col("lang"),
        F.lit("/doc/"),
        F.col("doc_id"),
        F.lit("?q="),
        F.col("lang"),
        F.lit("&page="),
        F.col("doc_id") % 10,
    )
    return docs.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("q")).alias("q_param"),
    )


# ---------------------------------------------------------------------------
# Timezone conversion — UTC event times to a local civil clock.
# ---------------------------------------------------------------------------

_TZ_ORACLE = """
SELECT strftime(timezone('America/New_York', CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC'),
                '%Y-%m-%d %H') AS ny_hour,
       COUNT(*) AS n,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1
"""


@register(
    "rel_timezone_convert",
    _TZ_ORACLE,
    doc="from_utc_timestamp: IANA-zone conversion, grouped by local hour",
)
def rel_timezone_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``from_utc_timestamp`` shifts instants into a civil clock via
    the IANA tzdb — both engines consult the same rules, so DST
    arithmetic agrees. Output is a formatted STRING: a zoned timestamp
    type would compare by session zone and break cross-engine parity.
    The local-hour key is computed map-side; one aggregate shuffle."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(
                F.from_utc_timestamp(F.col("ts"), "America/New_York"), "yyyy-MM-dd HH"
            ).alias("ny_hour")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# ---------------------------------------------------------------------------
# HyperLogLog sketch aggregation — the 100 TB distinct-count path.
# Rows-only: Spark's Datasketches HLL and DuckDB's HLL implementation
# produce different estimates for the same input by design.
# ---------------------------------------------------------------------------


# Same oracle pattern as rel_approx_aggregates: exact counts hash-match,
# and the sketch estimates are pinned through their accuracy contract
# (lgK=12 → ~1.6% standard error; the boolean asserts 5× that).
_HLL_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       TRUE AS est_ok
FROM lineitem
GROUP BY l_returnflag
UNION ALL
SELECT 'ALL',
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT),
       TRUE
FROM lineitem
"""


@register(
    "ml_hll_sketch",
    _HLL_ORACLE,
    doc="hll_sketch_agg/estimate/union: mergeable distinct-count sketches, accuracy-pinned",
)
def ml_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group HLL sketches + a union across groups, estimated in
    the same query. Sketches are the scale answer for distinct
    counts: partial aggregates are a few KB each and MERGE (unlike
    exact countDistinct, whose shuffle carries every distinct key);
    the union sketch gives the global cardinality WITHOUT a second
    pass over the data. The registered output carries the exact counts
    (including the global one, so the union estimate has a real
    baseline) plus in-bound booleans; the raw estimate magnitudes stay
    engine-internal. Accuracy also unit-tested in
    tests/test_sketches.py."""
    li = load_table(spark, sf_dir, "lineitem")
    # localCheckpoint the |flags|-row partial: it feeds BOTH the
    # per-group output and the union re-aggregate — without the pin the
    # lineage re-scans (and re-sketches) lineitem once per consumer.
    # Total cost: 2 scans (sketch+exact per flag; global exact, which
    # cannot derive from per-flag exacts because keys overlap).
    per_flag = (
        li.groupBy("l_returnflag")
        .agg(
            F.hll_sketch_agg("l_partkey", 12).alias("sk"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .localCheckpoint()
    )
    global_exact = li.agg(
        F.countDistinct("l_partkey").alias("exact_parts")
    )
    union_row = (
        per_flag.agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .crossJoin(F.broadcast(global_exact))
        .select(F.lit("ALL").alias("l_returnflag"), "est", "exact_parts")
    )
    ok = (
        F.abs(F.col("est").cast("double") - F.col("exact_parts").cast("double"))
        <= F.lit(0.08) * F.col("exact_parts").cast("double")
    ).alias("est_ok")
    return (
        per_flag.select(
            "l_returnflag", F.hll_sketch_estimate("sk").alias("est"), "exact_parts"
        )
        .unionByName(union_row)
        .select("l_returnflag", "exact_parts", ok)
    )


# ---------------------------------------------------------------------------
# incremental sketch maintenance: HLL partials (history ⊎ delta) must be
# LOSSLESS under merge — the sketch twin of rel_incremental_agg_merge.
# ---------------------------------------------------------------------------

_HLL_INCR_ORACLE = """
SELECT o_orderstatus,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_custkeys,
       TRUE AS merge_consistent,
       TRUE AS est_ok
FROM orders
GROUP BY o_orderstatus
"""


@register(
    "ml_hll_incremental_merge",
    _HLL_INCR_ORACLE,
    doc="HLL partial merge (history ⊎ delta) tracks the full-scan sketch within sketch error",
)
def ml_hll_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch side of the continuous-rollup pattern
    (rel_incremental_agg_merge): distinct-count state kept as HLL
    partials per (status, period) unions into an estimate that tracks
    the single-pass full sketch. NOT bit-identical — DataSketches HLL
    unions go through mode/level promotions, so the merged registers
    can differ (measured ~0.6% apart at sf0.01) — which is exactly why
    the check is a BOUND, not equality: ``merge_consistent`` requires
    the merged and full estimates within 2% of the exact count of each
    other, ``est_ok`` bounds the merged estimate against the exact
    count (lgK=12 → ~1.6% standard error, 5σ). At 100 TB only the
    delta partition is ever re-sketched; history partials are a few KB
    per group in the rollup table."""
    o = load_table(spark, sf_dir, "orders")
    cut = F.lit("1997-01-01 00:00:00").cast("timestamp")
    partials = (
        o.withColumn("part", (F.col("o_orderdate") < cut).cast("int"))
        .groupBy("o_orderstatus", "part")
        .agg(F.hll_sketch_agg("o_custkey", 12).alias("sk"))
    )
    merged = partials.groupBy("o_orderstatus").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_merged")
    )
    full = o.groupBy("o_orderstatus").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey", 12)).alias("est_full"),
        F.countDistinct("o_custkey").alias("exact_custkeys"),
    )
    joined = full.join(merged, "o_orderstatus")
    return joined.select(
        "o_orderstatus",
        "exact_custkeys",
        (
            F.abs(F.col("est_merged").cast("double") - F.col("est_full").cast("double"))
            <= F.lit(0.02) * F.col("exact_custkeys").cast("double")
        ).alias("merge_consistent"),
        (
            F.abs(
                F.col("est_merged").cast("double")
                - F.col("exact_custkeys").cast("double")
            )
            <= F.lit(0.08) * F.col("exact_custkeys").cast("double")
        ).alias("est_ok"),
    )


# ---------------------------------------------------------------------------
# approximate set intersection by sketch inclusion-exclusion
# ---------------------------------------------------------------------------

_HLL_INTERSECT_ORACLE = """
WITH a AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01'
),
b AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
)
SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS exact_a,
       CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS exact_b,
       CAST((SELECT COUNT(*) FROM a JOIN b USING (o_custkey)) AS BIGINT)
         AS exact_intersection,
       TRUE AS est_in_bound
"""


@register(
    "ml_hll_intersection",
    _HLL_INTERSECT_ORACLE,
    doc="approx set intersection: |A|+|B|-|A∪B| on HLL sketches, bound-checked",
)
def ml_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set overlap without materializing either set: sketch A, sketch
    B, union-merge them, and estimate |A∩B| = est(A)+est(B)-est(A∪B) —
    audience-overlap / retention arithmetic at 100 TB, where A and B
    are distinct-key sets from different time ranges and the exact
    join (shipped here as the oracle's ground truth) would shuffle
    both key sets. Inclusion-exclusion ERROR grows with |A∪B|, not
    |A∩B| — the known caveat, so the in-bound boolean is written
    against the union size (±10%), which is the honest contract.
    ONE scan builds both sketches (conditional sketch aggs)."""
    o = load_table(spark, sf_dir, "orders")
    in_a = F.when(
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"), F.col("o_custkey")
    )
    in_b = F.when(
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"), F.col("o_custkey")
    )
    sk = o.agg(
        F.hll_sketch_agg(in_a, 12).alias("sk_a"),
        F.hll_sketch_agg(in_b, 12).alias("sk_b"),
    )
    # exact ground truth: a key is in A∩B when it has SOME order in A
    # and SOME order in B — not necessarily the same order, so the
    # intersection needs per-key membership flags, not a conditional
    # distinct over single rows
    flags = o.groupBy("o_custkey").agg(
        F.max(
            F.when(F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"), 1).otherwise(0)
        ).alias("ia"),
        F.max(
            F.when(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"), 1).otherwise(0)
        ).alias("ib"),
    )
    exact = flags.agg(
        F.sum("ia").cast("long").alias("exact_a"),
        F.sum("ib").cast("long").alias("exact_b"),
        F.sum(F.col("ia") * F.col("ib")).cast("long").alias("exact_intersection"),
    )
    est = sk.crossJoin(F.broadcast(exact)).select(
        "exact_a",
        "exact_b",
        "exact_intersection",
        F.hll_sketch_estimate("sk_a").alias("ea"),
        F.hll_sketch_estimate("sk_b").alias("eb"),
        F.hll_sketch_estimate(
            F.hll_union("sk_a", "sk_b")
        ).alias("eu"),
    )
    approx_inter = F.col("ea") + F.col("eb") - F.col("eu")
    union_exact = F.col("exact_a") + F.col("exact_b") - F.col("exact_intersection")
    return est.select(
        "exact_a",
        "exact_b",
        "exact_intersection",
        (
            F.abs(approx_inter.cast("double") - F.col("exact_intersection"))
            <= F.lit(0.10) * union_exact.cast("double")
        ).alias("est_in_bound"),
    )
