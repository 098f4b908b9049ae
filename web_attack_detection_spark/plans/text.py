"""Oracle-checked queries for the text-analysis operators over the
``documents`` fixture (north-star set: token counting, language ID,
quality scoring, fingerprinting)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from web_attack_detection_spark.functions.text import (
    BPE_ISH_PATTERN,
    LANG_MARKERS,
    STOPWORDS,
    avg_token_len,
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    punct_count,
    quality_score,
    stopword_ratio,
    token_count,
)
from web_attack_detection_spark.io.sources import load_table
from web_attack_detection_spark.plans.registry import register

# ---------------------------------------------------------------------------
# token counting (whitespace + BPE-ish), aggregated per lang
# ---------------------------------------------------------------------------

_TOKENS_ORACLE = f"""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split_regex(text, '\\s+'))) AS BIGINT) AS total_tokens,
       CAST(SUM(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}'))) AS BIGINT) AS total_bpe_ish,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars
FROM documents
GROUP BY lang
"""


@register("text_token_count", _TOKENS_ORACLE, doc="token counting: whitespace + BPE-ish regex")
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token statistics. The regexes run inside codegen
    (JVM), one pass over the corpus, aggregated map-side — at 100 TB
    this is a pure scan + tiny shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "lang",
            token_count(F.col("text")).alias("tc"),
            bpe_ish_token_count(F.col("text")).alias("bc"),
            F.length("text").cast("long").alias("nc"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tc").alias("total_tokens"),
            F.sum("bc").alias("total_bpe_ish"),
            F.sum("nc").alias("total_chars"),
        )
    )


# ---------------------------------------------------------------------------
# quality scoring per doc (row-level, exact rational arithmetic)
# ---------------------------------------------------------------------------

_QUALITY_ORACLE = f"""
WITH q AS (
  SELECT doc_id,
         len(string_split_regex(text, '\\s+')) AS n_tok,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS n_punct,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
                        list_transform(string_split_regex(text, '\\s+'), t -> CAST(length(t) AS BIGINT))),
           (acc, x) -> acc + x
         ) AS tok_chars,
         len(list_filter(string_split_regex(text, '\\s+'),
                         t -> list_contains({STOPWORDS!r}, t))) AS n_stop
  FROM documents
)
SELECT doc_id,
       CAST(n_tok AS BIGINT) AS n_tokens,
       CAST(n_punct AS BIGINT) AS n_punct,
       ROUND(n_stop / CAST(n_tok AS DOUBLE), 6) AS stop_ratio,
       ROUND(tok_chars / CAST(n_tok AS DOUBLE), 6) AS avg_tok_len,
       ROUND(0.4 * least(n_tok / 100.0, 1.0)
           + 0.3 * (1.0 - n_punct / greatest(CAST(n_chars AS DOUBLE), 1.0))
           + 0.3 * (CASE WHEN tok_chars / CAST(n_tok AS DOUBLE) >= 3.0
                          AND tok_chars / CAST(n_tok AS DOUBLE) <= 12.0
                         THEN 1.0 ELSE 0.0 END), 6) AS quality
FROM q
"""


@register("text_quality", _QUALITY_ORACLE, doc="per-doc quality score (length/punct/stopword)")
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        punct_count(F.col("text")).alias("n_punct"),
        stopword_ratio(F.col("text")).alias("stop_ratio"),
        avg_token_len(F.col("text")).alias("avg_tok_len"),
        quality_score(F.col("text")).alias("quality"),
    )


# ---------------------------------------------------------------------------
# language ID (marker heuristic) — confusion counts vs the lang column
# ---------------------------------------------------------------------------


def _sql_lang_score(lang: str) -> str:
    markers = LANG_MARKERS[lang]
    return (
        f"len(list_intersect(list_distinct(string_split_regex(text, '\\s+')), {markers!r}))"
    )


_LANGID_ORACLE = f"""
WITH scored AS (
  SELECT lang,
         {_sql_lang_score('en')} AS s_en,
         {_sql_lang_score('de')} AS s_de,
         {_sql_lang_score('es')} AS s_es,
         {_sql_lang_score('fr')} AS s_fr
  FROM documents
),
pred AS (
  SELECT lang,
         CASE
           WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
           WHEN s_de > 0 AND s_de > s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
           WHEN s_es > 0 AND s_es > s_en AND s_es > s_de AND s_es >= s_fr THEN 'es'
           WHEN s_fr > 0 AND s_fr > s_en AND s_fr > s_de AND s_fr > s_es THEN 'fr'
           ELSE 'und'
         END AS predicted
  FROM scored
)
SELECT lang, predicted, COUNT(*) AS n FROM pred GROUP BY lang, predicted
"""


@register("text_lang_id", _LANGID_ORACLE, doc="marker-based language-ID heuristic")
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/marker language heuristic (mechanism demo over synthetic
    vocab — see functions/text.py), output as a (true lang, predicted)
    confusion count table."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", lang_id(F.col("text")).alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# TF-IDF (DataFrame-native; top term per document)
# ---------------------------------------------------------------------------

_TFIDF_ORACLE = """
WITH toks AS (
  SELECT doc_id, UNNEST(string_split_regex(text, '\\s+')) AS tok FROM documents
),
tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok
),
df AS (
  SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.tok, tf.tf,
         tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0) AS tfidf
  FROM tf JOIN df USING (tok) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, tok, tf, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok ASC) AS rn
  FROM scored
)
SELECT doc_id, tok AS top_term, CAST(tf AS BIGINT) AS tf, ROUND(tfidf, 6) AS tfidf
FROM ranked WHERE rn = 1
"""


@register("text_tfidf", _TFIDF_ORACLE, doc="TF-IDF: top term per document")
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF as three aggregations: term frequency per (doc, token),
    document frequency per token, smooth idf = ln((N+1)/(df+1))+1.
    The df table is O(vocabulary) — broadcast onto the tf table, so
    the corpus-sized side shuffles once (on doc_id/token for tf).
    MLlib's HashingTF/IDF computes the same statistic with hashed
    buckets; this form keeps exact tokens so SQL can verify it."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", r"\s+")).alias("tok"))
    # one explode, one shuffle: DF derives from the TF relation (whose
    # rows are already distinct (doc, tok) pairs, so COUNT == COUNT
    # DISTINCT doc) instead of re-exploding the corpus — the second
    # pass aggregates |tf| rows, not |token instances|, and the cache
    # makes the branch reuse explicit.
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf")).cache()
    try:
        df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
        n_docs = docs.count()
        scored = tf.join(F.broadcast(df), "tok").select(
            "doc_id",
            "tok",
            "tf",
            (
                F.col("tf")
                * (F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)) + F.lit(1.0))
            ).alias("tfidf"),
        )
        w = Window.partitionBy("doc_id").orderBy(
            F.col("tfidf").desc(), F.col("tok").asc()
        )
        # eager localCheckpoint pins the (one-row-per-doc) result so the
        # tf cache can be released before returning (ADVICE r1: repeated
        # registry invocations must not accumulate cached relations)
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "doc_id",
                F.col("tok").alias("top_term"),
                F.col("tf").cast("long").alias("tf"),
                F.round("tfidf", 6).alias("tfidf"),
            )
            .localCheckpoint()
        )
    finally:
        tf.unpersist()


# ---------------------------------------------------------------------------
# fuzzy matching (edit distance)
# ---------------------------------------------------------------------------

_FUZZY_D = 2

_FUZZY_ORACLE = f"""
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
FROM part a
JOIN part b ON a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= {_FUZZY_D}
"""


@register(
    "text_fuzzy_match",
    _FUZZY_ORACLE,
    doc="blocked edit-distance fuzzy pairs over the FULL part table",
)
def text_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy record matching by Levenshtein over the FULL ``part``
    table — blocked, never all-pairs (VERDICT r3 #3; the all-pairs form
    lives only in the DuckDB oracle twin above).

    Scale plan, each leg lossless for threshold d:

    1. **Value dedup**: the quadratic compare runs on DISTINCT names,
       never on keys — at any scale the name-pair work is
       O(|distinct|²/buckets), decoupled from table row count.
    2. **Length-bucket blocking**: ``dist(x,y) ≤ d ⇒ |len(x)−len(y)|
       ≤ d``, so with bucket width d a match can only sit in the same
       or an adjacent bucket. The probe side explodes offsets
       {-1,0,1} and the pair generator is an EQUI-join on
       ``bucket`` — no CartesianProduct / BroadcastNestedLoopJoin in
       the physical plan (asserted in tests/test_explain.py).
    3. Levenshtein verifies candidates; survivors (plus the dist-0
       diagonal, which needs no compare at all) broadcast back onto
       the keyed table — two hash joins on name.

    ``key_a < key_b`` cannot be pushed to the name level (key order is
    independent of name order), so matched name pairs are expanded to
    both orientations before the key join and the predicate applied
    there — exactly once per unordered key pair."""
    d = _FUZZY_D
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    matched = fuzzy_name_pairs(spark, sf_dir, d)
    # symmetric closure + the dist-0 diagonal (identical names match
    # with no edit-distance evaluation)
    names = p.select("p_name").distinct()
    pairs = (
        matched.unionByName(
            matched.select(
                F.col("name_b").alias("name_a"),
                F.col("name_a").alias("name_b"),
                "dist",
            )
        )
        .unionByName(
            names.select(
                F.col("p_name").alias("name_a"),
                F.col("p_name").alias("name_b"),
                F.lit(0).alias("dist"),
            )
        )
    )
    a = p.select(F.col("p_partkey").alias("key_a"), F.col("p_name").alias("name_a"))
    b = p.select(F.col("p_partkey").alias("key_b"), F.col("p_name").alias("name_b"))
    return (
        a.join(F.broadcast(pairs), "name_a")
        .join(b, "name_b")
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b", F.col("dist").cast("int").alias("dist"))
    )


def fuzzy_name_pairs(spark: SparkSession, sf_dir: str, d: int = _FUZZY_D) -> DataFrame:
    """DISTINCT-name near-pairs (name_a < name_b, levenshtein <= d)
    via length-bucket blocking — the value-level core of
    text_fuzzy_match, shared with pipe_entity_resolution (which
    clusters at the name level precisely so the hot-name key
    expansion never feeds the component computation)."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")

    names = p.select("p_name").distinct().select(
        "p_name",
        F.length("p_name").alias("len"),
        (F.length("p_name") / d).cast("int").alias("bkt"),
    )
    probe = names.select(
        F.col("p_name").alias("name_a"),
        F.col("len").alias("len_a"),
        F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("off"),
        F.col("bkt").alias("bkt_a"),
    ).withColumn("bkt", F.col("bkt_a") + F.col("off"))
    build = names.select(
        F.col("p_name").alias("name_b"), F.col("len").alias("len_b"), "bkt"
    )
    return (
        probe.join(build, "bkt")
        .filter(
            (F.col("name_a") < F.col("name_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= d)
        )
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= d)
        .select("name_a", "name_b", "dist")
    )


# ---------------------------------------------------------------------------
# regexp extraction
# ---------------------------------------------------------------------------

_REGEX_ORACLE = """
SELECT COALESCE(regexp_extract(p_name, '^(\\w+)', 1), '') AS name_head,
       COUNT(*) AS n,
       CAST(COUNT(DISTINCT p_brand) AS BIGINT) AS n_brands
FROM part
GROUP BY 1
"""


@register("text_regexp_extract", _REGEX_ORACLE, doc="regexp group extraction + aggregation")
def text_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex group capture as a grouping key — JVM-side (codegen'd
    java.util.regex), one scan. Spark returns '' for no-match where
    DuckDB returns NULL; the oracle COALESCEs to pin that boundary."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(F.regexp_extract("p_name", r"^(\w+)", 1).alias("name_head"), "p_brand")
        .groupBy("name_head")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("p_brand").alias("n_brands"),
        )
    )


# ---------------------------------------------------------------------------
# document fingerprint (rolling hash)
# ---------------------------------------------------------------------------

_FP_ORACLE = """
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
                      list_transform(string_split_regex(text, '\\s+'),
                                     t -> CAST(length(t) AS BIGINT) * 17 + ascii(t))),
         (acc, x) -> (acc * 31 + x) % 2147483647
       ) AS fp
FROM documents
"""


@register("text_fingerprint", _FP_ORACLE, doc="rolling polynomial hash fingerprint per doc")
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling hash (mod 2^31−1) — pure integer
    arithmetic, so Spark's F.aggregate fold and DuckDB's list_reduce
    agree exactly."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint(F.col("text")).alias("fp"))
