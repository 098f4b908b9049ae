"""Corpus-curation grid evaluation: many thresholds, one scan.

Choosing a quality-filter cutoff for a training corpus means knowing,
for every candidate threshold, how much data survives and what it
looks like. The naive loop — one filtered aggregation per threshold —
scans the corpus N times; at 100 TB that is N×100 TB of IO for one
tuning decision. The grid formulation computes the ENTIRE sweep in a
single pass: each row contributes a conditional aggregate per
threshold (pure codegen CASE arithmetic, map-side combined), so the
scan cost is flat in N and the output is N rows regardless of corpus
size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from web_attack_detection_spark.io.sources import load_table
from web_attack_detection_spark.plans.registry import register

# quality score: deterministic, engine-portable arithmetic over doc
# statistics (a simplified text_quality signal — length ratio and
# word-length shape), so the oracle reproduces it exactly
_SCORE_SQL = """
  1.0 * LEAST(n_chars, 800) / 800.0
  - 0.5 * ABS(1.0 * n_chars / (1 + LENGTH(text) - LENGTH(REPLACE(text, ' ', ''))) - 6.0) / 6.0
"""

_THRESHOLDS = [0.0, 0.2, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]

_SWEEP_ORACLE = f"""
WITH scored AS (
  SELECT source, n_chars, ({_SCORE_SQL}) AS q FROM documents
),
grid AS (SELECT CAST(UNNEST({_THRESHOLDS}) AS DOUBLE) AS threshold)
SELECT g.threshold,
       CAST(COUNT(CASE WHEN s.q >= g.threshold THEN 1 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN s.q >= g.threshold THEN s.n_chars END) AS BIGINT)
         AS chars_kept,
       CAST(COUNT(DISTINCT CASE WHEN s.q >= g.threshold THEN s.source END)
            AS BIGINT) AS n_sources_surviving
FROM scored s CROSS JOIN grid g
GROUP BY g.threshold
"""


@register(
    "text_quality_threshold_sweep",
    _SWEEP_ORACLE,
    doc="quality-cutoff tuning grid: every threshold's survivor stats in ONE corpus scan",
)
def text_quality_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole cutoff-tuning sweep in one pass: per threshold, the
    surviving doc count, surviving char volume (the token-budget
    proxy), and how many sources still contribute (a mixture-collapse
    warning). Spark side expresses the grid as N conditional aggregates
    over one scan — no cross join, no re-scan per threshold; the
    DuckDB twin uses the equivalent grid cross join. Output is
    |thresholds| rows at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    n_words = (
        F.lit(1) + F.length("text") - F.length(F.regexp_replace("text", " ", ""))
    )
    q = (
        F.least(F.col("n_chars"), F.lit(800)) / F.lit(800.0)
        - F.lit(0.5)
        * F.abs(F.col("n_chars") / n_words.cast("double") - F.lit(6.0))
        / F.lit(6.0)
    )
    scored = docs.select("source", "n_chars", q.alias("q"))
    aggs = []
    for t in _THRESHOLDS:
        keep = F.col("q") >= F.lit(t)
        aggs.append(
            F.struct(
                F.lit(float(t)).alias("threshold"),
                F.count(F.when(keep, 1)).alias("n_kept"),
                F.sum(F.when(keep, F.col("n_chars"))).alias("chars_kept"),
                F.countDistinct(F.when(keep, F.col("source"))).alias(
                    "n_sources_surviving"
                ),
            ).alias(f"t{int(t * 10)}")
        )
    row = scored.agg(*aggs)
    return row.select(
        F.explode(F.array(*[F.col(f"t{int(t * 10)}") for t in _THRESHOLDS])).alias(
            "g"
        )
    ).select("g.threshold", "g.n_kept", "g.chars_kept", "g.n_sources_surviving")


# ---------------------------------------------------------------------------
# cross-source contamination matrix: who shares text with whom
# ---------------------------------------------------------------------------

_XSOURCE_ORACLE = """
WITH toks AS (
  SELECT source, string_split_regex(text, '\\s+') AS t FROM documents
),
sh AS (
  SELECT DISTINCT source,
         CASE WHEN len(t) <= 4 THEN array_to_string(t, ' ')
              ELSE array_to_string(t[i:i+4], ' ') END AS shingle
  FROM toks, UNNEST(range(1, greatest(len(t) - 4, 1) + 1)) AS r(i)
),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_shared
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.source < b.source
  GROUP BY 1, 2
),
sizes AS (SELECT source, COUNT(*) AS sz FROM sh GROUP BY source)
SELECT source_a, source_b,
       CAST(n_shared AS BIGINT) AS shared_shingles,
       ROUND(n_shared / CAST(LEAST(sa.sz, sb.sz) AS DOUBLE), 6) AS containment
FROM pairs
JOIN sizes sa ON source_a = sa.source
JOIN sizes sb ON source_b = sb.source
"""


@register(
    "text_cross_source_contamination",
    _XSOURCE_ORACLE,
    doc="source x source 5-gram overlap matrix: shared shingles + containment",
)
def text_cross_source_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Who copies whom: for every pair of corpus sources, the count of
    distinct 5-gram shingles they share and the containment ratio
    (shared / smaller source's shingle set) — the pre-training audit
    that catches a source mirroring another (or an eval set) before
    mixture weights are chosen. Same inverted-index shape as the dedup
    pair join, but keyed at SOURCE granularity, so the join input is
    |distinct (source, shingle)| and the output |sources|² — both tiny
    relative to the corpus. The skew guard for corpus-wide boilerplate
    shingles (max document frequency) applies unchanged at scale."""
    from web_attack_detection_spark.operators.dedup import shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = (
        shingles(docs.select("source", "text"), "text", "source", n=5)
        .select(F.col("id").alias("source"), "shingle")
        .distinct()
    )
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (
        a.join(b, "shingle")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("sz").alias("sz_b"))
    return (
        pairs.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("n_shared").cast("long").alias("shared_shingles"),
            F.round(
                F.col("n_shared") / F.least("sz_a", "sz_b").cast("double"), 6
            ).alias("containment"),
        )
    )
