"""Oracle-checked queries for the feature operators (SURVEY.md §2.3).

Each query exercises one transformer from
``web_attack_detection_spark.functions.feature`` and pairs it with the
DuckDB SQL "twin" of its semantic contract (the twins named in
SURVEY.md §2.3's table). Where a fit statistic is a floating aggregate
(imputer mean, scaler stddev), the query computes it with the exact
integer-scaled formulation (registry docstring) so Spark and DuckDB
agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from web_attack_detection_spark.functions.feature import (
    apply_one_hot,
    apply_string_indexer,
    assemble_array,
    fit_string_indexer,
)
from web_attack_detection_spark.io.sources import load_table
from web_attack_detection_spark.plans.registry import register

# ---------------------------------------------------------------------------
# F1 — StringIndexer fit (frequencyDesc, ties by value asc)
# ---------------------------------------------------------------------------

_F1_ORACLE = """
WITH counts AS (
  SELECT event_type AS value, COUNT(*) AS cnt FROM events GROUP BY event_type
)
SELECT value,
       CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, value ASC) - 1 AS DOUBLE) AS idx
FROM counts
"""


@register("f1_string_indexer", _F1_ORACLE, doc="StringIndexer fit model (F1)")
def f1_string_indexer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fit IS an aggregation query: groupBy-count + rank over the
    aggregated (tiny) relation. Matches Spark ML StringIndexer's
    default frequencyDesc order with ascending-value tie-break."""
    ev = load_table(spark, sf_dir, "events")
    return fit_string_indexer(ev, "event_type")


# ---------------------------------------------------------------------------
# F2 — OneHotEncoder (dropLast=True)
# ---------------------------------------------------------------------------

_F2_ORACLE = """
WITH counts AS (
  SELECT o_orderpriority AS v, COUNT(*) AS cnt FROM orders GROUP BY o_orderpriority
),
m AS (
  SELECT v, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, v ASC) - 1 AS DOUBLE) AS idx
  FROM counts
)
SELECT o_orderkey,
       CAST(CASE WHEN idx = 0 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS oh_0,
       CAST(CASE WHEN idx = 1 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS oh_1,
       CAST(CASE WHEN idx = 2 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS oh_2,
       CAST(CASE WHEN idx = 3 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS oh_3
FROM orders JOIN m ON o_orderpriority = m.v
WHERE o_orderkey < 100
"""


@register("f2_one_hot", _F2_ORACLE, doc="StringIndexer + OneHotEncoder dropLast (F1+F2)")
def f2_one_hot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index o_orderpriority (5 values) then one-hot with dropLast →
    4 indicator slots; the last category encodes all-zero, exactly
    Spark ML OneHotEncoder's default. Transform = broadcast join +
    codegen'd CASE columns."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    model = fit_string_indexer(load_table(spark, sf_dir, "orders"), "o_orderpriority")
    out = apply_string_indexer(orders, model, "o_orderpriority", "pidx")
    out = apply_one_hot(out, "pidx", "oh", size=5, drop_last=True)
    return out.select(
        "o_orderkey",
        F.col("oh")[0].alias("oh_0"),
        F.col("oh")[1].alias("oh_1"),
        F.col("oh")[2].alias("oh_2"),
        F.col("oh")[3].alias("oh_3"),
    )


# ---------------------------------------------------------------------------
# F3 — Imputer(mean) over a deterministically null-injected column
# ---------------------------------------------------------------------------

# fixture tables have no NULLs (FIXTURES.md "Oracle notes") → both
# engines null the same id-determined subset, impute with the exact
# integer-scaled mean, and checksum per group.
_F3_ORACLE = """
WITH injected AS (
  SELECT l_returnflag,
         CASE WHEN l_orderkey % 97 = 0 THEN NULL ELSE l_quantity END AS q
  FROM lineitem
),
stats AS (
  SELECT SUM(CAST(ROUND(q * 100) AS BIGINT)) / CAST(COUNT(q) AS DOUBLE) / 100.0 AS mean_q
  FROM injected
)
SELECT l_returnflag,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN q IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_imputed,
       ROUND(SUM(CAST(ROUND(COALESCE(q, mean_q) * 10000) AS BIGINT)) / 10000.0, 4) AS sum_imputed
FROM injected CROSS JOIN stats
GROUP BY l_returnflag
"""


@register("f3_impute_mean", _F3_ORACLE, doc="Imputer strategy=mean (F3), checksummed")
def f3_impute_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit = one AVG aggregation (computed integer-scaled for
    engine-exact determinism), transform = coalesce. The checksum
    groups by l_returnflag so the oracle verifies imputed AND
    preserved values together."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.when(F.col("l_orderkey") % 97 == 0, F.lit(None)).otherwise(F.col("l_quantity")).alias("q"),
    )
    mean_q = (
        li.agg(
            (
                F.sum(F.round(F.col("q") * 100).cast("long"))
                / F.count("q").cast("double")
                / F.lit(100.0)
            ).alias("m")
        ).first()["m"]
    )
    return (
        li.withColumn("imputed", F.coalesce(F.col("q"), F.lit(mean_q)))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("q").isNull(), 1).otherwise(0)).cast("long").alias("n_imputed"),
            F.round(
                F.sum(F.round(F.col("imputed") * 10000).cast("long")) / F.lit(10000.0), 4
            ).alias("sum_imputed"),
        )
    )


# ---------------------------------------------------------------------------
# F4 — VectorAssembler array twin
# ---------------------------------------------------------------------------

# Array outputs crash the driver's pandas canonicalizer (CORRECTNESS_r01:
# "unhashable type: 'list'"), so the registry entry serializes the vector
# to JSON of integer cent-units — dtype-stable across Spark/DuckDB and
# sortable as a scalar. The array<double> operator itself is unchanged
# (assemble_array, tested in tests/test_ml.py).
_F4_ORACLE = """
SELECT l_orderkey, l_linenumber,
       CAST(to_json([CAST(ROUND(l_quantity * 100) AS BIGINT),
                     CAST(ROUND(l_extendedprice * 100) AS BIGINT),
                     CAST(ROUND(l_discount * 100) AS BIGINT)]) AS VARCHAR) AS features
FROM lineitem
WHERE l_orderkey < 50
"""


@register("f4_assemble_array", _F4_ORACLE, doc="VectorAssembler → array<double> twin (F4)")
def f4_assemble_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-wise feature packing as ``array<double>`` — the oracle-visible
    twin of VectorUDT (FIXTURES.md "Oracle notes"). Pure projection; the
    registry output serializes the array to JSON of exact cent-units so
    the driver can sort/hash it as a scalar."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 50)
    asm = assemble_array(li, ["l_quantity", "l_extendedprice", "l_discount"], "features")
    return asm.select(
        "l_orderkey",
        "l_linenumber",
        F.to_json(
            F.transform(F.col("features"), lambda x: F.round(x * 100).cast("long"))
        ).alias("features"),
    )


# ---------------------------------------------------------------------------
# F5 — StandardScaler (withStd only, sample stddev)
# ---------------------------------------------------------------------------

# sample stddev from exact integer sums:
#   var = (sum_sq/s² - sum²/(s²·n)) / (n-1);  both engines share the
#   formula textually, so every double op happens in the same order.
_F5_ORACLE = """
WITH scaled AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS v100 FROM events
),
stats AS (
  SELECT
    SQRT(
      (SUM(CAST(v100 * v100 AS DOUBLE)) - SUM(v100) * (SUM(v100) / CAST(COUNT(*) AS DOUBLE)))
      / (COUNT(*) - 1.0)
    ) / 100.0 AS sd
  FROM scaled
)
SELECT event_type,
       COUNT(*) AS n,
       ROUND(SUM(CAST(ROUND((v100 / 100.0) / sd * 10000) AS BIGINT)) / 10000.0, 4) AS sum_scaled
FROM scaled CROSS JOIN stats
GROUP BY event_type
"""


@register("f5_standard_scale", _F5_ORACLE, doc="StandardScaler withStd (F5), checksummed")
def f5_standard_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale events.value by the sample stddev (Spark ML default:
    withMean=False, withStd=True) and checksum per event_type. The
    stddev is derived from exact integer sums so both engines compute
    the identical double."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("v100")
    )
    n = F.count(F.lit(1)).cast("double")
    stats = ev.agg(
        (
            F.sqrt(
                (
                    F.sum((F.col("v100") * F.col("v100")).cast("double"))
                    - F.sum("v100") * (F.sum("v100") / n)
                )
                / (n - F.lit(1.0))
            )
            / F.lit(100.0)
        ).alias("sd")
    ).first()
    sd = stats["sd"]
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.round((F.col("v100") / F.lit(100.0)) / F.lit(sd) * 10000).cast("long"))
                / F.lit(10000.0),
                4,
            ).alias("sum_scaled"),
        )
    )


# ---------------------------------------------------------------------------
# F8 — label cardinality
# ---------------------------------------------------------------------------

_F8_ORACLE = "SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_classes FROM events"


@register("f8_label_cardinality", _F8_ORACLE, doc="countDistinct labels (F8)")
def f8_label_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference computes ``len(np.unique(y_train))`` on the driver
    (``/root/reference/models/mlp_model.py:61``); in-engine it is one
    distinct-aggregate. (At 100 TB: ``approx_count_distinct`` unless
    exactness is required.)"""
    return load_table(spark, sf_dir, "events").agg(
        F.countDistinct("event_type").alias("n_classes")
    )


# ---------------------------------------------------------------------------
# M5 — accuracy of the majority-class baseline
# ---------------------------------------------------------------------------

_M5_ORACLE = """
WITH majority AS (
  SELECT event_type AS pred FROM events
  GROUP BY event_type ORDER BY COUNT(*) DESC, event_type ASC LIMIT 1
)
SELECT ROUND(
         SUM(CASE WHEN e.event_type = m.pred THEN 1.0 ELSE 0.0 END) / COUNT(*), 6
       ) AS accuracy
FROM events e CROSS JOIN majority m
"""


@register("m5_accuracy", _M5_ORACLE, doc="accuracy metric (M5) on majority-class baseline")
def m5_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy = AVG(label == prediction) (the evaluator twin from
    SURVEY.md §2.4 M5), demonstrated on the deterministic
    majority-class predictor; the MLlib path reuses the same metric in
    ml/evaluation.py."""
    ev = load_table(spark, sf_dir, "events")
    majority = (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("event_type").asc())
        .limit(1)
        .select(F.col("event_type").alias("pred"))
    )
    return (
        ev.crossJoin(F.broadcast(majority))
        .agg(
            F.round(
                F.sum(F.when(F.col("event_type") == F.col("pred"), 1.0).otherwise(0.0))
                / F.count(F.lit(1)),
                6,
            ).alias("accuracy")
        )
    )


# ---------------------------------------------------------------------------
# V4 — confusion matrix, computed in-engine
# ---------------------------------------------------------------------------

_V4_ORACLE = """
SELECT event_type AS label,
       CASE WHEN value >= 100 THEN 'high' ELSE 'low' END AS prediction,
       COUNT(*) AS n
FROM events
GROUP BY 1, 2
"""


@register("v4_confusion_matrix", _V4_ORACLE, doc="confusion matrix groupBy (V4)")
def v4_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's confusion-matrix plot is dead code with no
    producer (``/root/reference/utils/visualization.py:128-161``); here
    the matrix is computed in-engine as groupBy(label, prediction) —
    the scalable form (|classes|² output rows regardless of data size).
    Prediction is a deterministic threshold rule for oracle purposes."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.col("event_type").alias("label"),
            F.when(F.col("value") >= 100, "high").otherwise("low").alias("prediction"),
        )
        .groupBy("label", "prediction")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# F9 (extension) — feature hashing: the vocabulary-free categorical
# encoder that replaces StringIndexer at 100 TB.
# ---------------------------------------------------------------------------

_F9_ORACLE = """
WITH hashed AS (
  SELECT o_orderkey,
         CAST(('0x' || substr(md5('status=' || o_orderstatus), 1, 8)) AS BIGINT) % 64
           AS b_status,
         CAST(('0x' || substr(md5('prio=' || o_orderpriority), 1, 8)) AS BIGINT) % 64
           AS b_prio
  FROM orders WHERE o_orderkey <= 2000
)
SELECT b_status AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_status,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum
FROM hashed GROUP BY b_status
"""


@register(
    "f9_feature_hashing",
    _F9_ORACLE,
    doc="hashing-trick categorical encoding (md5-portable buckets, no vocabulary)",
)
def f9_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: categorical value → fixed bucket via a hash,
    no fitted vocabulary at all. This is what replaces StringIndexer
    (F1) when cardinality explodes at 100 TB — the indexer's fit is a
    full groupBy over every distinct value and its model is
    O(cardinality); the hashed encoder is a stateless row-local
    expression with zero fit jobs, zero model state, and a documented
    collision rate (n_values/64 per bucket here). Feature NAME is
    salted into the hash ('status=' prefix) so identical values in
    different columns land independently — the standard
    HashingTF/VW convention.

    md5 (not xxhash64) keeps the bucket assignment engine-portable, so
    the oracle re-derives identical buckets; on a cluster xxhash64 is
    the cheaper choice and the plan is unchanged. Output: per-bucket
    occupancy + key checksum for the status feature (the prio feature
    exercises the second hashed column in-plan).
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    bucket = lambda prefix, col: (
        F.conv(F.substring(F.md5(F.concat(F.lit(prefix), F.col(col))), 1, 8), 16, 10)
        .cast("long")
        % 64
    )
    hashed = o.select(
        "o_orderkey",
        bucket("status=", "o_orderstatus").alias("b_status"),
        bucket("prio=", "o_orderpriority").alias("b_prio"),
    )
    return hashed.groupBy(F.col("b_status").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_status"),
        F.sum("o_orderkey").alias("key_checksum"),
    )


# ---------------------------------------------------------------------------
# M5b — per-class precision / recall / F1 (the evaluation battery
# beyond scalar accuracy)
# ---------------------------------------------------------------------------

_M5B_ORACLE = """
WITH scored AS (
  SELECT event_type AS label,
         CASE WHEN value >= 100 THEN 'high' ELSE 'low' END AS prediction
  FROM events
),
tp AS (
  SELECT label AS cls,
         SUM(CASE WHEN prediction = label THEN 1 ELSE 0 END) AS n_tp,
         COUNT(*) AS n_actual
  FROM scored GROUP BY label
),
pp AS (
  SELECT prediction AS cls, COUNT(*) AS n_predicted
  FROM scored GROUP BY prediction
)
SELECT tp.cls AS label,
       CAST(tp.n_tp AS BIGINT) AS n_tp,
       CAST(tp.n_actual AS BIGINT) AS n_actual,
       CAST(COALESCE(pp.n_predicted, 0) AS BIGINT) AS n_predicted,
       ROUND(tp.n_tp / CAST(NULLIF(pp.n_predicted, 0) AS DOUBLE), 6) AS precision,
       ROUND(tp.n_tp / CAST(tp.n_actual AS DOUBLE), 6) AS recall
FROM tp LEFT JOIN pp ON tp.cls = pp.cls
"""


@register(
    "m5b_per_class_metrics",
    _M5B_ORACLE,
    doc="per-class precision/recall from the confusion counts (M5 extension)",
)
def m5b_per_class_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class evaluation beyond the reference's single accuracy
    scalar (M5): precision = TP / predicted-positive, recall =
    TP / actual-positive, from two tiny aggregates over the scored
    frame — |classes| output rows regardless of data size, the same
    scale shape as the confusion matrix (V4). NULL precision for a
    class never predicted is surfaced as NULL, not 0 — the honest
    undefined case. Ratios are one double division of exact longs +
    one round, engine-identical."""
    ev = load_table(spark, sf_dir, "events")
    scored = ev.select(
        F.col("event_type").alias("label"),
        F.when(F.col("value") >= 100, "high").otherwise("low").alias("prediction"),
    )
    tp = scored.groupBy(F.col("label").alias("cls")).agg(
        F.sum(F.when(F.col("prediction") == F.col("label"), 1).otherwise(0)).alias("n_tp"),
        F.count(F.lit(1)).alias("n_actual"),
    )
    pp = scored.groupBy(F.col("prediction").alias("cls")).agg(
        F.count(F.lit(1)).alias("n_predicted")
    )
    return tp.join(pp, "cls", "left").select(
        F.col("cls").alias("label"),
        F.col("n_tp").cast("long").alias("n_tp"),
        F.col("n_actual").cast("long").alias("n_actual"),
        F.coalesce("n_predicted", F.lit(0)).cast("long").alias("n_predicted"),
        F.round(
            F.col("n_tp") / F.nullif(F.col("n_predicted"), F.lit(0)).cast("double"), 6
        ).alias("precision"),
        F.round(F.col("n_tp") / F.col("n_actual").cast("double"), 6).alias("recall"),
    )


# ---------------------------------------------------------------------------
# F10 — exact-quantile bucketizer (QuantileDiscretizer with exact splits)
# ---------------------------------------------------------------------------

_F10_ORACLE = """
WITH v AS (
  SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v FROM orders
),
s AS (SELECT list_sort(list(v)) AS vals, COUNT(*) AS n FROM v),
q AS (
  SELECT vals[CAST(ceil(0.25 * n) AS INTEGER)] AS q1,
         vals[CAST(ceil(0.50 * n) AS INTEGER)] AS q2,
         vals[CAST(ceil(0.75 * n) AS INTEGER)] AS q3
  FROM s
),
b AS (
  SELECT CASE WHEN v.v <= q.q1 THEN 0
              WHEN v.v <= q.q2 THEN 1
              WHEN v.v <= q.q3 THEN 2
              ELSE 3 END AS bucket, v.v
  FROM v, q
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       ROUND(MIN(v) / 100.0, 2) AS min_price,
       ROUND(MAX(v) / 100.0, 2) AS max_price
FROM b GROUP BY bucket
"""


@register(
    "f10_quantile_bucketize",
    _F10_ORACLE,
    doc="QuantileDiscretizer twin with EXACT quartile splits (percentile_disc rule)",
)
def f10_quantile_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib's QuantileDiscretizer binned on APPROXIMATE quantiles
    (relativeError > 0), which an oracle can't pin; this is the exact
    twin — quartile boundaries are real data values at ceil(p*n) of
    the sorted column (the rel_percentile_disc rule), then a
    stateless CASE bucketing. The boundary pass is the DISTRIBUTED
    two-phase rank (operators/ranking.py: range-bucketed prefix sum —
    the biggest sort is one range bucket, never the whole column), so
    the fit side survives 100 TB as-is; the oracle keeps the
    sorted-list exact form, proving the scale plan equal bit-for-bit.
    The apply side (the part that touches every row) is map-only. Bucket populations are NOT n/4 exactly: duplicate boundary
    values all fall in the lower bucket, which is exactly what the
    <= split rule promises."""
    from web_attack_detection_spark.operators.ranking import ranged_row_number

    o = load_table(spark, sf_dir, "orders")
    v = o.select(F.round(F.col("o_totalprice") * 100).cast("long").alias("v"))
    ranked = ranged_row_number(
        v, "v", [F.col("v").asc()], total_col="n"
    )
    q = (
        ranked.filter(
            (F.col("rn") == F.ceil(0.25 * F.col("n")))
            | (F.col("rn") == F.ceil(0.50 * F.col("n")))
            | (F.col("rn") == F.ceil(0.75 * F.col("n")))
        )
        .groupBy()
        .agg(
            F.min(F.when(F.col("rn") == F.ceil(0.25 * F.col("n")), F.col("v"))).alias("q1"),
            F.min(F.when(F.col("rn") == F.ceil(0.50 * F.col("n")), F.col("v"))).alias("q2"),
            F.min(F.when(F.col("rn") == F.ceil(0.75 * F.col("n")), F.col("v"))).alias("q3"),
        )
    )
    b = v.crossJoin(F.broadcast(q)).select(
        F.when(F.col("v") <= F.col("q1"), 0)
        .when(F.col("v") <= F.col("q2"), 1)
        .when(F.col("v") <= F.col("q3"), 2)
        .otherwise(3)
        .alias("bucket"),
        "v",
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.round(F.min("v") / 100.0, 2).alias("min_price"),
        F.round(F.max("v") / 100.0, 2).alias("max_price"),
    )


# ---------------------------------------------------------------------------
# F11 twin-surface extension: leakage-free K-fold target encoding
# ---------------------------------------------------------------------------

# Fold = o_orderkey % 5 (deterministic); encoding for (fold f, cat c)
# averages the target over the OTHER four folds only:
# (sum_c - sum_cf) / (n_c - n_cf), with cents-integer sums so the
# subtraction is exact and the single division engine-identical.
_TARGET_ENCODE_ORACLE = """
WITH base AS (
  SELECT o_orderpriority AS category,
         CAST(o_orderkey % 5 AS BIGINT) AS fold,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
per_fold AS (
  SELECT category, fold,
         CAST(COUNT(*) AS BIGINT) AS n_cf,
         CAST(SUM(cents) AS BIGINT) AS s_cf
  FROM base GROUP BY category, fold
),
per_cat AS (
  SELECT category,
         CAST(SUM(n_cf) AS BIGINT) AS n_c,
         CAST(SUM(s_cf) AS BIGINT) AS s_c
  FROM per_fold GROUP BY category
)
SELECT f.category, f.fold, f.n_cf AS n_in_fold,
       ROUND((c.s_c - f.s_cf) / (100.0 * (c.n_c - f.n_cf)), 6) AS encoding
FROM per_fold f JOIN per_cat c USING (category)
"""


@register(
    "f11_target_encode",
    _TARGET_ENCODE_ORACLE,
    doc="K-fold leave-fold-out mean target encoding, cents-exact",
)
def f11_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target (mean) encoding done the leakage-free way: each fold's
    encoding for a category averages the target over the OTHER folds,
    so a row never sees its own label — the K-fold scheme CatBoost
    popularized, and the one feature transform the F1-F10 family was
    missing for high-cardinality categoricals (a StringIndexer feeds
    a tree; target encoding feeds ANY model one dense column).
    Computed from one per-(category, fold) aggregate: the per-category
    totals are a second tiny rollup, and every leave-fold-out mean is
    a SUBTRACTION of exact cents sums — never a re-scan per fold. At
    100 TB this is one map-side-combinable groupBy over cat x 5 cells
    plus a broadcast join back; rows never shuffle twice."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderpriority").alias("category"),
        (F.col("o_orderkey") % 5).cast("long").alias("fold"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    per_fold = base.groupBy("category", "fold").agg(
        F.count(F.lit(1)).cast("long").alias("n_cf"),
        F.sum("cents").cast("long").alias("s_cf"),
    )
    per_cat = per_fold.groupBy("category").agg(
        F.sum("n_cf").cast("long").alias("n_c"),
        F.sum("s_cf").cast("long").alias("s_c"),
    )
    return per_fold.join(F.broadcast(per_cat), "category").select(
        "category",
        "fold",
        F.col("n_cf").alias("n_in_fold"),
        F.round(
            (F.col("s_c") - F.col("s_cf"))
            / (100.0 * (F.col("n_c") - F.col("n_cf"))),
            6,
        ).alias("encoding"),
    )


# ---------------------------------------------------------------------------
# F12 twin-surface extension: cyclic time encoding with pinned literals
# ---------------------------------------------------------------------------

# sin/cos of the 24 hour angles pinned as 6-decimal literals (the -0.0
# at cos(18h) normalized to 0.0) — neither engine evaluates trig, so
# the encoded features are identical by construction.
_CYC_SIN = {0: 0.0, 1: 0.258819, 2: 0.5, 3: 0.707107, 4: 0.866025, 5: 0.965926, 6: 1.0, 7: 0.965926, 8: 0.866025, 9: 0.707107, 10: 0.5, 11: 0.258819, 12: 0.0, 13: -0.258819, 14: -0.5, 15: -0.707107, 16: -0.866025, 17: -0.965926, 18: -1.0, 19: -0.965926, 20: -0.866025, 21: -0.707107, 22: -0.5, 23: -0.258819}
_CYC_COS = {0: 1.0, 1: 0.965926, 2: 0.866025, 3: 0.707107, 4: 0.5, 5: 0.258819, 6: 0.0, 7: -0.258819, 8: -0.5, 9: -0.707107, 10: -0.866025, 11: -0.965926, 12: -1.0, 13: -0.965926, 14: -0.866025, 15: -0.707107, 16: -0.5, 17: -0.258819, 18: 0.0, 19: 0.258819, 20: 0.5, 21: 0.707107, 22: 0.866025, 23: 0.965926}

_CYCLIC_ORACLE = """
WITH hours AS (
  SELECT CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hour,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
)
SELECT hour, n,
       CAST(CASE hour WHEN 0 THEN 0.0 WHEN 1 THEN 0.258819 WHEN 2 THEN 0.5 WHEN 3 THEN 0.707107 WHEN 4 THEN 0.866025 WHEN 5 THEN 0.965926 WHEN 6 THEN 1.0 WHEN 7 THEN 0.965926 WHEN 8 THEN 0.866025 WHEN 9 THEN 0.707107 WHEN 10 THEN 0.5 WHEN 11 THEN 0.258819 WHEN 12 THEN 0.0 WHEN 13 THEN -0.258819 WHEN 14 THEN -0.5 WHEN 15 THEN -0.707107 WHEN 16 THEN -0.866025 WHEN 17 THEN -0.965926 WHEN 18 THEN -1.0 WHEN 19 THEN -0.965926 WHEN 20 THEN -0.866025 WHEN 21 THEN -0.707107 WHEN 22 THEN -0.5 WHEN 23 THEN -0.258819 END AS DOUBLE) AS hour_sin,
       CAST(CASE hour WHEN 0 THEN 1.0 WHEN 1 THEN 0.965926 WHEN 2 THEN 0.866025 WHEN 3 THEN 0.707107 WHEN 4 THEN 0.5 WHEN 5 THEN 0.258819 WHEN 6 THEN 0.0 WHEN 7 THEN -0.258819 WHEN 8 THEN -0.5 WHEN 9 THEN -0.707107 WHEN 10 THEN -0.866025 WHEN 11 THEN -0.965926 WHEN 12 THEN -1.0 WHEN 13 THEN -0.965926 WHEN 14 THEN -0.866025 WHEN 15 THEN -0.707107 WHEN 16 THEN -0.5 WHEN 17 THEN -0.258819 WHEN 18 THEN 0.0 WHEN 19 THEN 0.258819 WHEN 20 THEN 0.5 WHEN 21 THEN 0.707107 WHEN 22 THEN 0.866025 WHEN 23 THEN 0.965926 END AS DOUBLE) AS hour_cos
FROM hours
"""


@register(
    "f12_cyclic_encode",
    _CYCLIC_ORACLE,
    doc="cyclic hour-of-day encoding (sin/cos) from pinned literal tables",
)
def f12_cyclic_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cyclic feature encoding — the fix for hour 23 and hour 0 being
    'far apart' to a linear model: map the hour onto the unit circle
    (sin, cos) so midnight wraps. The 24 angle values are PINNED
    6-decimal literals in BOTH engines (no trig evaluated at query
    time — the rel_benford_digits discipline), applied as a broadcast
    literal map, so encoded features are bit-identical everywhere.
    The same two columns attach per ROW in a feature pipeline (join
    on hour or inline the CASE); the hourly rollup here is the
    compact oracle-checkable statement. Completes the F1-F11 feature
    family with the temporal encoder every time-aware detector
    needs."""
    e = load_table(spark, sf_dir, "events")
    hours = e.groupBy(F.hour("ts").cast("long").alias("hour")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    sin_map = F.create_map(*[F.lit(x) for kv in _CYC_SIN.items() for x in kv])
    cos_map = F.create_map(*[F.lit(x) for kv in _CYC_COS.items() for x in kv])
    return hours.select(
        "hour",
        "n",
        sin_map[F.col("hour")].alias("hour_sin"),
        cos_map[F.col("hour")].alias("hour_cos"),
    )
