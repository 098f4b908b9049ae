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


# ---------------------------------------------------------------------------
# winnowing fingerprints (MOSS) — local fingerprint selection with a
# matching guarantee, then doc-pair overlap
# ---------------------------------------------------------------------------

_WINNOW_ORACLE = """
WITH toks AS (
  SELECT doc_id, i AS pos,
         (CAST(length(t[i]) AS BIGINT) * 131 + ascii(t[i]) * 31
          + ascii(substr(t[i], length(t[i]), 1))) AS th
  FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents),
       UNNEST(range(1, len(t) + 1)) AS r(i)
),
grams AS (
  SELECT doc_id, pos,
         ((th * 1000003 + LEAD(th, 1) OVER w) % 2147483647 * 1000003
           + LEAD(th, 2) OVER w) % 2147483647 AS g
  FROM toks
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY LEAD(th, 2) OVER w IS NOT NULL
),
wins AS (
  SELECT doc_id, pos AS p,
         MIN(g) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh,
         COUNT(*) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wlen
  FROM grams
  QUALIFY wlen = 4
),
sel AS (
  SELECT g.doc_id, MAX(g.pos) AS pos, w.mh AS g
  FROM wins w JOIN grams g
    ON g.doc_id = w.doc_id AND g.pos BETWEEN w.p AND w.p + 3 AND g.g = w.mh
  GROUP BY g.doc_id, w.p, w.mh
),
fp AS (SELECT DISTINCT doc_id, g FROM sel)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM fp a JOIN fp b ON a.g = b.g AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= 3
"""


@register(
    "text_winnow_fingerprints",
    _WINNOW_ORACLE,
    doc="winnowing (MOSS) fingerprint selection + doc-pair overlap report",
)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (Schleimer, Wilkerson & Aiken, SIGMOD 2003 — the MOSS
    algorithm): hash every token 3-gram, slide a window of 4 hashes,
    keep the RIGHTMOST minimum of each window. The selected
    fingerprints carry the winnowing guarantee — any shared substring
    of >= w+k-1 = 6 tokens produces at least one shared fingerprint —
    while storing only ~2/(w+1) of the grams, which is what makes
    all-corpus overlap detection joinable at scale: the pair report is
    an EQUI-join on fingerprint hash over the thinned set, never a
    document cross join.

    Everything is integer arithmetic (token hash = len·131 +
    31·first-char + last-char; gram hash = a base-1000003 polynomial
    mod 2^31−1), so the DuckDB twin matches exactly. The rightmost-min
    selection is expressed relationally: a forward window MIN per
    window start, then argmax(pos) among the window's rows at that
    minimum — at 100 TB the same selection runs as the identical
    window plan (one sort-within-doc, no shuffle beyond the doc
    repartition), and only the thinned fingerprint set ever joins.
    Returns (doc_a, doc_b, n_shared) for pairs sharing >= 3 selected
    fingerprints."""
    docs = load_table(spark, sf_dir, "documents")
    return winnow_pair_report(docs)


def winnow_pair_report(
    docs: DataFrame, k: int = 3, w: int = 4, min_shared: int = 3
) -> DataFrame:
    """The winnowing core over any (doc_id, text) DataFrame, factored
    out so tests can assert the w+k-1-token matching guarantee on
    planted data.  NOTE: k is fixed at 3 by the gram construction
    below; it is a parameter only for documentation."""
    from pyspark.sql import Window

    M = 2147483647
    B = 1000003
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", r"\s+")).alias("pos", "t")
    ).select(
        "doc_id",
        "pos",
        (
            F.length("t").cast("long") * 131
            + F.ascii("t").cast("long") * 31
            + F.expr("ascii(substr(t, length(t), 1))").cast("long")
        ).alias("th"),
    )
    lw = Window.partitionBy("doc_id").orderBy("pos")
    grams = (
        toks.select(
            "doc_id",
            "pos",
            "th",
            F.lead("th", 1).over(lw).alias("th1"),
            F.lead("th", 2).over(lw).alias("th2"),
        )
        .filter(F.col("th2").isNotNull())
        .select(
            "doc_id",
            "pos",
            (
                ((F.col("th") * B + F.col("th1")) % M * B + F.col("th2")) % M
            ).alias("g"),
        )
    )
    fwd = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    wins = (
        grams.select(
            "doc_id",
            F.col("pos").alias("p"),
            F.min("g").over(fwd).alias("mh"),
            F.count(F.lit(1)).over(fwd).alias("wlen"),
        )
        .filter(F.col("wlen") == w)
        .drop("wlen")
    )
    sel = (
        wins.join(grams, "doc_id")
        .filter(
            (F.col("pos") >= F.col("p"))
            & (F.col("pos") <= F.col("p") + w - 1)
            & (F.col("g") == F.col("mh"))
        )
        .groupBy("doc_id", "p", "mh")
        .agg(F.max("pos").alias("pos"))
    )
    fp = sel.select("doc_id", F.col("mh").alias("g")).distinct()
    a = fp.select(F.col("doc_id").alias("doc_a"), "g")
    b = fp.select(F.col("doc_id").alias("doc_b"), "g")
    return (
        a.join(b, "g")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
