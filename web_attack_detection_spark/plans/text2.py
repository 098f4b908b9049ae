"""Second text-analysis wave for the training-data pipeline: PII
redaction, document chunking (overlapping token windows), and
repetition-ratio quality signals.

North-star extensions (BASELINE.json / SURVEY.md §2.7) — the reference
has no text processing at all. These three are the standard
pre-training corpus steps between dedup and tokenization: strip PII,
window long documents into model-sized chunks, and drop
degenerate/repetitive text (Gopher-style quality rules).

All three are pure JVM scalar/generator pipelines — regexp, split,
sequence/slice, explode — no Python, no shuffle except the final
aggregate where one exists; they scale linearly with corpus bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from web_attack_detection_spark.io.sources import load_table
from web_attack_detection_spark.plans.registry import register

# ---------------------------------------------------------------------------
# PII redaction. The fixture corpus is synthetic and PII-free, so the
# query plants deterministic emails/phones derived from doc_id, then
# redacts them — both engines apply the identical mutation (the
# FIXTURES.md null-injection pattern, applied to strings).
# ---------------------------------------------------------------------------

_EMAIL_RE = "[A-Za-z0-9._]+@[A-Za-z0-9.]+\\.[A-Za-z]{2,}"
_PHONE_RE = "\\+1-555-[0-9]{4}"

_PII_ORACLE = f"""
WITH planted AS (
  SELECT doc_id,
         text || ' contact user' || doc_id || '@mail.example.com or +1-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now' AS text
  FROM documents WHERE doc_id <= 300
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
       regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                      '{_PHONE_RE}', '<PHONE>', 'g') AS redacted
FROM planted
"""


@register(
    "text_pii_redact",
    _PII_ORACLE,
    doc="PII redaction: count + regexp_replace emails/phones",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-then-redact in one projection. Spark's regexp_replace
    replaces all occurrences by default (DuckDB needs the 'g' flag);
    regexp_count / regexp_extract_all agree on the common RE subset
    used here. At 100 TB this is embarrassingly parallel scan work —
    the only design rule is to keep it JVM-side (a Python UDF here
    would cost 10-100×)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 300)
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id"),
            F.lit("@mail.example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" now"),
        ).alias("text"),
    )
    return planted.select(
        "doc_id",
        F.regexp_count("text", F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count("text", F.lit(_PHONE_RE)).alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ).alias("redacted"),
    )


# ---------------------------------------------------------------------------
# Document chunking: overlapping token windows (size 50, stride 40).
# ---------------------------------------------------------------------------

_CHUNK_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id <= 300
), starts AS (
  SELECT doc_id, t, unnest(generate_series(0, len(t) - 1, 40)) AS start
  FROM toks
)
SELECT doc_id,
       CAST(start AS INTEGER) AS chunk_start,
       CAST(len(list_slice(t, start + 1, start + 50)) AS INTEGER) AS n_tokens,
       t[start + 1] AS first_token,
       CAST(length(array_to_string(list_slice(t, start + 1, start + 50), ' '))
            AS BIGINT) AS n_chars
FROM starts
"""


@register(
    "text_chunk_windows",
    _CHUNK_ORACLE,
    doc="document chunking: overlapping token windows via sequence+slice",
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window a document into model-sized chunks (50 tokens, stride
    40 → 10-token overlap) with sequence → explode → slice. One
    generator, no shuffle, output rows ∝ corpus tokens / stride. The
    chunk text itself stays an array until the final projection —
    re-joining to a string only at the edge keeps the intermediate
    compact."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 300)
    toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("t"))
    starts = toks.select(
        "doc_id",
        "t",
        F.explode(
            F.sequence(
                F.lit(0), F.greatest(F.size("t") - 1, F.lit(0)), F.lit(40)
            )
        ).alias("start"),
    )
    chunk = F.slice(F.col("t"), F.col("start") + 1, 50)
    return starts.select(
        "doc_id",
        F.col("start").cast("int").alias("chunk_start"),
        F.size(chunk).alias("n_tokens"),
        F.element_at(F.col("t"), F.col("start") + 1).alias("first_token"),
        F.length(F.array_join(chunk, " ")).cast("long").alias("n_chars"),
    )


# ---------------------------------------------------------------------------
# Repetition ratio — Gopher-style degenerate-text signal.
# ---------------------------------------------------------------------------

_REPETITION_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w
  FROM documents WHERE doc_id <= 300
), cnt AS (
  SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY doc_id, w
)
SELECT doc_id,
       CAST(MAX(c) AS BIGINT) AS max_count,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       ROUND(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) AS rep_ratio,
       ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) AS ttr
FROM cnt
GROUP BY doc_id
"""


@register(
    "text_repetition_ratio",
    _REPETITION_ORACLE,
    doc="repetition ratio + type-token ratio per document",
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-frequent-token share and type-token ratio — the two
    cheap repetition signals used to drop degenerate documents
    before training. Two chained aggregates on the same doc_id key:
    Catalyst reuses the partitioning, so the second groupBy is
    exchange-free. Ratios are one double division of exact longs."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 300)
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    cnt = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    return cnt.groupBy("doc_id").agg(
        F.max("c").alias("max_count"),
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.round(F.max("c").cast("double") / F.sum("c").cast("double"), 6).alias(
            "rep_ratio"
        ),
        F.round(
            F.count(F.lit(1)).cast("double") / F.sum("c").cast("double"), 6
        ).alias("ttr"),
    )


# ---------------------------------------------------------------------------
# vocabulary encoding: top-V tokens by corpus frequency → docs as
# int-id sequences with OOV = 0 (the tokenize-to-ids training step)
# ---------------------------------------------------------------------------

_VOCAB_ENCODE_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
),
flat AS (
  SELECT doc_id, t[i] AS tok, i AS ord
  FROM toks, UNNEST(range(1, len(t) + 1)) AS r(i)
),
vocab AS (
  SELECT tok, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok ASC) AS tok_id
  FROM flat GROUP BY tok
  QUALIFY tok_id <= 20
)
SELECT doc_id,
       -- to_json: list outputs crash the driver's canonicalizer
       CAST(to_json(array_agg(COALESCE(tok_id, 0) ORDER BY ord)) AS VARCHAR) AS ids,
       CAST(SUM(CASE WHEN tok_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
FROM flat LEFT JOIN vocab USING (tok)
WHERE doc_id < 50
GROUP BY doc_id
"""


@register(
    "text_vocab_encode",
    _VOCAB_ENCODE_ORACLE,
    doc="top-20 frequency vocabulary → docs encoded as int-id arrays, OOV=0",
)
def text_vocab_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenize-to-ids step every training pipeline runs: rank
    tokens by corpus frequency (ties: token asc — a total order, so
    the vocabulary is reproducible), keep the top 20 (the corpus has 31
    distinct tokens, so the tail genuinely hits the OOV path), re-encode each
    document as its id sequence with 0 for out-of-vocabulary. The
    global rank is a single-partition window — fine because it runs on
    the AGGREGATED token relation, and at 100 TB you first drop the
    long tail with a HAVING count > threshold so the ranked relation
    stays small. Encoding is posexplode → broadcast-join vocab →
    re-assemble in position order; order inside collect_list is made
    deterministic by sorting (pos, id) structs, never by relying on
    collection order."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    flat = docs.select(
        "doc_id",
        F.posexplode(F.split("text", r"\s+")).alias("pos", "tok"),
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("tok").asc())
    vocab = (
        flat.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("tok_id", F.row_number().over(w))
        .filter(F.col("tok_id") <= 20)
        .select("tok", "tok_id")
    )
    enc = (
        flat.filter(F.col("doc_id") < 50)
        .join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.to_json(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("pos").alias("pos"),
                                F.coalesce("tok_id", F.lit(0)).alias("id"),
                            )
                        )
                    ),
                    lambda s: s["id"],
                )
            ).alias("ids"),
            F.sum(F.when(F.col("tok_id").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
    )
    return enc


# ---------------------------------------------------------------------------
# Zipf slope: corpus rank-frequency law as an exact-sum OLS fit
# ---------------------------------------------------------------------------

_ZIPF_ORACLE = """
WITH toks AS (
  SELECT t[i] AS tok
  FROM (SELECT string_split_regex(text, '\\s+') AS t FROM documents),
       UNNEST(range(1, len(t) + 1)) AS r(i)
),
freqs AS (
  SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok
),
ranked AS (
  SELECT CAST(ROUND(ln(ROW_NUMBER() OVER (ORDER BY cnt DESC, tok ASC)) * 1000000) AS BIGINT) AS lr,
         CAST(ROUND(ln(cnt) * 1000000) AS BIGINT) AS lf
  FROM freqs
)
SELECT COUNT(*) AS n_tokens,
       ROUND(
         (COUNT(*) * SUM(lr * lf) - SUM(lr) * SUM(lf))
         / CAST(COUNT(*) * SUM(lr * lr) - SUM(lr) * SUM(lr) AS DOUBLE), 6
       ) AS zipf_slope
FROM ranked
"""


@register(
    "text_zipf_slope",
    _ZIPF_ORACLE,
    doc="Zipf rank-frequency slope via exact integer-scaled log OLS",
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-statistics check every training-data audit runs: natural
    text follows rank-frequency slope ≈ -1 on log-log axes; a corpus
    that doesn't is TEMPLATED or DUPLICATED (our synthetic fixture
    scores far from -1, which is itself the signal). The OLS fit uses
    the registry's exact-sum discipline: ln(rank), ln(freq) are rounded
    to fixed-point BIGINTs first, so every sum is exact and the slope
    is ONE double division — engine- and partition-order-independent.
    The global rank is a single-partition window over the aggregated
    token relation (tiny; cap with HAVING at 100 TB)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    freqs = (
        docs.select(F.explode(F.split("text", r"\s+")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("tok").asc())
    ranked = freqs.select(
        F.round(F.log(F.row_number().over(w).cast("double")) * 1_000_000)
        .cast("long")
        .alias("lr"),
        F.round(F.log(F.col("cnt").cast("double")) * 1_000_000).cast("long").alias("lf"),
    )
    n = F.count(F.lit(1))
    return ranked.agg(
        n.alias("n_tokens"),
        F.round(
            (n * F.sum(F.col("lr") * F.col("lf")) - F.sum("lr") * F.sum("lf"))
            / (n * F.sum(F.col("lr") * F.col("lr")) - F.sum("lr") * F.sum("lr")).cast(
                "double"
            ),
            6,
        ).alias("zipf_slope"),
    )


# ---------------------------------------------------------------------------
# corpus mixture weights: per-(source, lang) token shares — the number a
# training-data pipeline feeds the sampler when mixing sources
# ---------------------------------------------------------------------------

_MIXTURE_ORACLE = """
WITH cells AS (
  SELECT source, lang,
         COUNT(*) AS n_docs,
         CAST(SUM(len(string_split_regex(text, '\\s+'))) AS BIGINT) AS total_tokens
  FROM documents
  GROUP BY source, lang
)
SELECT source, lang, n_docs, total_tokens,
       ROUND(total_tokens * 1000000 / CAST(SUM(total_tokens) OVER () AS DOUBLE))
         / 1000000.0 AS token_share
FROM cells
"""


@register(
    "text_mixture_weights",
    _MIXTURE_ORACLE,
    doc="per-(source, lang) corpus token shares — training-mix sampling weights",
)
def text_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-corpus per (source, lang) cell: aggregate ONCE to the
    cell grain (one shuffle over the corpus, map-side partials), then a
    single-partition window over the AGGREGATED relation computes the
    global denominator — |sources|×|langs| rows, so the unpartitioned
    window is free at any corpus size. This is the mixture-weight table
    a sampler consumes when composing a training set; the share is an
    exact integer-token ratio rounded micro-scale so both engines agree
    bit-for-bit."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    cells = (
        docs.select(
            "source",
            "lang",
            F.size(F.split("text", r"\s+")).cast("long").alias("tc"),
        )
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tc").alias("total_tokens"),
        )
    )
    w = Window.partitionBy()
    share = (
        F.round(
            F.col("total_tokens") * 1_000_000
            / F.sum("total_tokens").over(w).cast("double")
        )
        / F.lit(1_000_000.0)
    )
    return cells.select(
        "source", "lang", "n_docs", "total_tokens", share.alias("token_share")
    )


# ---------------------------------------------------------------------------
# URL canonicalization — the normalize-before-dedup primitive of crawl
# pipelines: scheme/host case, default ports, tracking params, fragments.
# ---------------------------------------------------------------------------

_URL_CANON_ORACLE = """
WITH raw AS (
  SELECT o_orderkey,
         unnest([
           'HTTPS://Shop.Example.COM:443/item/' || o_orderkey
             || '?utm_source=mail&id=' || o_orderkey % 100 || '&ref=abc#frag',
           'https://shop.example.com/item/' || o_orderkey
             || '?ref=abc&id=' || o_orderkey % 100
         ]) AS url
  FROM orders WHERE o_orderkey < 500
),
parts AS (
  SELECT o_orderkey, url,
         lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
         regexp_replace(lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)),
                        ':(443|80)$', '') AS host,
         regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1) AS path,
         regexp_extract(url, '\\?([^#]*)', 1) AS query
  FROM raw
),
canon AS (
  SELECT o_orderkey, url,
         scheme || '://' || host
           || CASE WHEN path = '' THEN '/' ELSE path END
           || CASE WHEN cq = '' THEN '' ELSE '?' || cq END AS canon_url
  FROM (
    SELECT *,
           array_to_string(
             list_sort(list_filter(string_split(query, '&'),
               p -> p <> '' AND NOT starts_with(p, 'utm_')
                    AND NOT starts_with(p, 'fbclid'))),
             '&') AS cq
    FROM parts
  )
)
SELECT canon_url,
       CAST(COUNT(*) AS BIGINT) AS n_aliases,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_orderkey
FROM canon
GROUP BY canon_url
"""


@register(
    "text_url_canonicalize",
    _URL_CANON_ORACLE,
    doc="URL canonicalization (case, default port, tracking params, fragment) → alias groups",
)
def text_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalize-then-group, the step before exact URL dedup in a
    crawl pipeline: lowercase scheme+host, strip default ports, drop
    the fragment, remove tracking params (utm_*, fbclid), sort the
    remaining query params. Each order key synthesizes two aliases of
    the same logical URL (tracking-laden uppercase vs clean); both must
    collapse to one canonical form, so every group has exactly 2
    aliases — the oracle recomputes the same normalization in SQL.
    All regexp/array column expressions (one explode, one groupBy):
    scales as a pure scan + one shuffle on the canonical key."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    k = F.col("o_orderkey").cast("string")
    raw = o.select(
        "o_orderkey",
        F.explode(
            F.array(
                F.concat(
                    F.lit("HTTPS://Shop.Example.COM:443/item/"), k,
                    F.lit("?utm_source=mail&id="), (F.col("o_orderkey") % 100).cast("string"),
                    F.lit("&ref=abc#frag"),
                ),
                F.concat(
                    F.lit("https://shop.example.com/item/"), k,
                    F.lit("?ref=abc&id="), (F.col("o_orderkey") % 100).cast("string"),
                ),
            )
        ).alias("url"),
    )
    scheme = F.lower(F.regexp_extract("url", r"^([A-Za-z]+)://", 1))
    host = F.regexp_replace(
        F.lower(F.regexp_extract("url", r"^[A-Za-z]+://([^/?#]+)", 1)),
        r":(443|80)$",
        "",
    )
    path = F.regexp_extract("url", r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    query = F.regexp_extract("url", r"\?([^#]*)", 1)
    cq = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: (p != "")
                & ~p.startswith("utm_")
                & ~p.startswith("fbclid"),
            )
        ),
        "&",
    )
    canon = raw.select(
        "o_orderkey",
        F.concat(
            scheme,
            F.lit("://"),
            host,
            F.when(path == "", "/").otherwise(path),
            F.when(cq == "", "").otherwise(F.concat(F.lit("?"), cq)),
        ).alias("canon_url"),
    )
    return canon.groupBy("canon_url").agg(
        F.count(F.lit(1)).alias("n_aliases"),
        F.min("o_orderkey").alias("min_orderkey"),
    )
