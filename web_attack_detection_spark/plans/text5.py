"""Text round 5: sparse TF-IDF retrieval and DSIR-style importance
weighting for data selection.

``sim_tfidf_topk_text`` is the SPARSE complement to the dense
embedding searches in plans/similarity*.py — the BM25/TF-IDF inverted
index retrieval every LLM data pipeline runs next to its ANN index.
``text_dsir_importance`` is the data-selection step from the DSIR
family (importance resampling toward a target domain with hashed
n-gram features): score every raw document by how target-like its
token distribution is, with the log-ratio table quantized to BIGINT
so per-document scores are EXACT integer sums (the winnowing/AUC
oracle trick from plans/mlq.py applied to log-probabilities).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from web_attack_detection_spark.io.sources import load_table
from web_attack_detection_spark.plans.registry import register

# ---------------------------------------------------------------------------
# sparse TF-IDF top-k retrieval (query docs vs corpus via inverted index)
# ---------------------------------------------------------------------------

# Same tokenizer + smooth idf as text_tfidf (plans/text.py): one
# shared contract keeps the whole text family mutually consistent.
_TFIDF_TOPK_ORACLE = """
WITH toks AS (
  SELECT doc_id, UNNEST(string_split_regex(text, '\\s+')) AS tok FROM documents
),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
w AS (
  SELECT tf.doc_id, tf.tok,
         tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0) AS w
  FROM tf JOIN df USING (tok) CROSS JOIN n
),
nrm AS (SELECT doc_id, sqrt(SUM(w * w)) AS nrm FROM w GROUP BY doc_id),
qd AS (SELECT * FROM w WHERE doc_id % 250 = 0),
dots AS (
  SELECT qd.doc_id AS query_id, w.doc_id AS doc_id,
         SUM(qd.w * w.w) AS dot, COUNT(*) AS n_shared
  FROM qd JOIN w USING (tok)
  WHERE w.doc_id <> qd.doc_id
  GROUP BY qd.doc_id, w.doc_id
),
scored AS (
  SELECT d.query_id, d.doc_id, CAST(d.n_shared AS BIGINT) AS n_shared,
         ROUND(d.dot / (nq.nrm * nd.nrm), 6) AS cos
  FROM dots d
  JOIN nrm nq ON nq.doc_id = d.query_id
  JOIN nrm nd ON nd.doc_id = d.doc_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos DESC, doc_id ASC) AS rn
  FROM scored
)
SELECT query_id, doc_id, n_shared, cos, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= 5
"""


@register(
    "sim_tfidf_topk_text",
    _TFIDF_TOPK_ORACLE,
    doc="sparse TF-IDF top-k retrieval via inverted-index join, full oracle",
)
def sim_tfidf_topk_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse retrieval: for each query document (every 250th doc_id),
    the top-5 most cosine-similar corpus documents under TF-IDF
    weights — the inverted-index search that complements the dense
    ANN paths (sim_ivf_topk etc.). The query side's weighted postings
    are broadcast; the corpus side streams through ONE equi-join on
    the term — cost is sum over terms of df_query(t) * df_corpus(t),
    linear in corpus size for a fixed query set, never all-pairs
    (doc-doc pairing exists only per shared term). Norms ride the
    same weight relation. Ranking happens on the ROUNDED cosine with
    doc_id tie-breaks, so the top-k cut is engine-deterministic even
    when float sums differ in the last ulp. At 100 TB the only change
    is pruning hot terms (max-df cap, the dedup_ngram_jaccard skew
    guard) — this fixture's 31-token vocabulary is deliberately
    adversarial for that, so the query keeps every term and stays
    exact."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", r"\s+")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf")).cache()
    try:
        df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
        n_docs = docs.count()
        w = tf.join(F.broadcast(df), "tok").select(
            "doc_id",
            "tok",
            (
                F.col("tf")
                * (F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)) + F.lit(1.0))
            ).alias("w"),
        )
        nrm = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
        qd = w.filter(F.col("doc_id") % 250 == 0).select(
            F.col("doc_id").alias("query_id"), "tok", F.col("w").alias("qw")
        )
        dots = (
            w.join(F.broadcast(qd), "tok")
            .filter(F.col("doc_id") != F.col("query_id"))
            .groupBy("query_id", "doc_id")
            .agg(
                F.sum(F.col("qw") * F.col("w")).alias("dot"),
                F.count(F.lit(1)).cast("long").alias("n_shared"),
            )
        )
        scored = (
            dots.join(
                F.broadcast(nrm.select(F.col("doc_id").alias("query_id"), F.col("nrm").alias("qnrm"))),
                "query_id",
            )
            .join(nrm, "doc_id")
            .select(
                "query_id",
                "doc_id",
                "n_shared",
                F.round(F.col("dot") / (F.col("qnrm") * F.col("nrm")), 6).alias("cos"),
            )
        )
        rw = Window.partitionBy("query_id").orderBy(
            F.col("cos").desc(), F.col("doc_id").asc()
        )
        return (
            scored.withColumn("rn", F.row_number().over(rw).cast("long"))
            .filter(F.col("rn") <= 5)
            .localCheckpoint()
        )
    finally:
        tf.unpersist()


# ---------------------------------------------------------------------------
# DSIR-style importance weights (quantized log-ratio, exact BIGINT scores)
# ---------------------------------------------------------------------------

# Portable feature hash both engines share: (7*len(tok) + ascii of
# first char) mod 64 — a stand-in for DSIR's hashed n-grams that needs
# no engine-specific hash function. The per-bucket log ratio
#   ln( (t_b+1)(R+B) / ((r_b+1)(T+B)) )
# is ONE double division of two exactly-representable integers
# followed by one ln, then quantized to BIGINT at 1e6 — after which
# every per-document score is an exact integer dot product.
_DSIR_ORACLE = """
WITH toks AS (
  SELECT doc_id, source,
         UNNEST(string_split_regex(text, '\\s+')) AS tok
  FROM documents
),
b AS (
  SELECT doc_id, source,
         (7 * LENGTH(tok) + ascii(SUBSTR(tok, 1, 1))) % 64 AS bkt
  FROM toks
),
cnt AS (
  SELECT bkt,
         CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS t_b,
         CAST(SUM(CASE WHEN source = 'src0' THEN 0 ELSE 1 END) AS BIGINT) AS r_b
  FROM b GROUP BY bkt
),
tot AS (SELECT CAST(SUM(t_b) AS BIGINT) AS T, CAST(SUM(r_b) AS BIGINT) AS R FROM cnt),
q AS (
  SELECT c.bkt,
         CAST(ROUND(ln((c.t_b + 1.0) * (t.R + 64) / ((c.r_b + 1.0) * (t.T + 64)))
                    * 1000000) AS BIGINT) AS q
  FROM cnt c, tot t
),
docw AS (
  SELECT b.doc_id, b.source, CAST(SUM(q.q) AS BIGINT) AS w
  FROM b JOIN q USING (bkt)
  GROUP BY b.doc_id, b.source
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN w > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
       ROUND(CAST(SUM(w) AS BIGINT) / (1000000.0 * COUNT(*)), 6) AS avg_log_ratio
FROM docw GROUP BY source
"""


@register(
    "text_dsir_importance",
    _DSIR_ORACLE,
    doc="DSIR-style importance weights: quantized log-ratio of target vs raw token buckets",
)
def text_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling, the relational core:
    treat source 'src0' as the target domain, every other source as
    raw; estimate per-bucket token probabilities for both (Laplace
    +1 smoothing over 64 portable hash buckets) and score every
    document by sum of counts * log(p_target/p_raw). The per-bucket
    log-ratio is quantized to BIGINT at 1e-6 BEFORE the per-doc
    aggregation, so each document's weight is an exact integer dot
    product — partition-order- and engine-independent (the mlq
    BIGINT-until-one-division trick applied to log-space). Output is
    the per-source selection report: docs with positive weight are
    "more target-like than raw" — src0 itself should dominate.
    Scale: two groupBys (bucket counts: 64 rows broadcast back; doc
    weights: one shuffle of (doc, bucket) pairs); the quantized
    ratio table is a 64-row broadcast — the same shape DSIR runs at
    corpus scale with 1e4-1e5 hash buckets."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.explode(F.split("text", r"\s+")).alias("tok")
    )
    b = toks.select(
        "doc_id",
        "source",
        ((7 * F.length("tok") + F.ascii(F.substring("tok", 1, 1))) % 64).alias("bkt"),
    )
    cnt = b.groupBy("bkt").agg(
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0))
        .cast("long")
        .alias("t_b"),
        F.sum(F.when(F.col("source") == "src0", 0).otherwise(1))
        .cast("long")
        .alias("r_b"),
    )
    tot = cnt.agg(
        F.sum("t_b").cast("long").alias("T"), F.sum("r_b").cast("long").alias("R")
    )
    q = cnt.crossJoin(F.broadcast(tot)).select(
        "bkt",
        F.round(
            F.log(
                (F.col("t_b") + 1.0)
                * (F.col("R") + 64)
                / ((F.col("r_b") + 1.0) * (F.col("T") + 64))
            )
            * 1000000
        )
        .cast("long")
        .alias("q"),
    )
    docw = (
        b.join(F.broadcast(q), "bkt")
        .groupBy("doc_id", "source")
        .agg(F.sum("q").cast("long").alias("w"))
    )
    return docw.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("w") > 0, 1).otherwise(0)).cast("long").alias("n_selected"),
        F.round(F.sum("w") / (1000000.0 * F.count(F.lit(1))), 6).alias(
            "avg_log_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# held-out perplexity filtering (train bigram LM on half, score the rest)
# ---------------------------------------------------------------------------

# Same tokenizer / add-one smoothing as text_bigram_lm (plans/text3.py),
# but with the real filtering deployment shape: the LM is fit on a
# TRAIN split (even doc_ids) and scores the HELD-OUT split, so memorized
# docs can't score themselves. Unseen bigrams/contexts degrade through
# the smoothing (c12 -> 0, c1 -> 0). The flag threshold compares exact
# integers: avg logp < -7  <=>  sum(lp_scaled) < -7e6 * n_bigrams.
_PPL_ORACLE = """
WITH toks AS (
  SELECT doc_id, source, string_split_regex(text, '\\s+') AS t FROM documents
),
train AS (SELECT * FROM toks WHERE doc_id % 2 = 0 AND len(t) >= 2),
heldout AS (SELECT * FROM toks WHERE doc_id % 2 = 1 AND len(t) >= 2),
tbig AS (
  SELECT array_to_string(t[i:i+1], ' ') AS bg
  FROM train, UNNEST(range(1, len(t))) AS r(i)
),
c12 AS (SELECT bg, COUNT(*) AS c12 FROM tbig GROUP BY bg),
c1 AS (SELECT split_part(bg, ' ', 1) AS w1, COUNT(*) AS c1 FROM tbig GROUP BY 1),
v AS (
  SELECT COUNT(DISTINCT tok) AS v FROM (SELECT UNNEST(t) AS tok FROM train)
),
hbig AS (
  SELECT doc_id, source, array_to_string(t[i:i+1], ' ') AS bg
  FROM heldout, UNNEST(range(1, len(t))) AS r(i)
),
scored AS (
  SELECT h.doc_id, h.source,
         CAST(ROUND(ln((COALESCE(c12.c12, 0) + 1)
                       / CAST(COALESCE(c1.c1, 0) + v.v AS DOUBLE)) * 1000000)
              AS BIGINT) AS lp
  FROM hbig h
  LEFT JOIN c12 USING (bg)
  LEFT JOIN c1 ON split_part(h.bg, ' ', 1) = c1.w1
  CROSS JOIN v
),
per_doc AS (
  SELECT doc_id, source, CAST(SUM(lp) AS BIGINT) AS w, COUNT(*) AS nb
  FROM scored GROUP BY doc_id, source
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN w < -7000000 * nb THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       ROUND(CAST(SUM(w) AS BIGINT) / (1000000.0 * CAST(SUM(nb) AS BIGINT)), 6) AS corpus_avg_logp
FROM per_doc GROUP BY source
"""


@register(
    "text_perplexity_filter",
    _PPL_ORACLE,
    doc="held-out bigram-LM perplexity quality filter (train/score split), full oracle",
)
def text_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-perplexity quality filtering, the held-out way: fit the
    add-one bigram LM on the even-doc_id half and score the odd half,
    flagging docs whose mean log-prob falls below -7 nats — the CCNet
    / Gopher-style 'perplexity against a clean LM' filter as pure
    relational algebra. Differs from text_bigram_lm (which scores
    in-sample) exactly where deployments differ: unseen bigrams and
    contexts hit the smoothing floor via LEFT joins, so out-of-domain
    text scores low instead of erroring. Per-bigram log-probs are
    quantized to BIGINT at 1e-6, so every per-doc score is an exact
    integer sum and the flag rule is the pure-integer comparison
    sum(lp) < -7e6 * n_bigrams — no float ever crosses the threshold.
    Scale: two count tables over train bigrams (vocab-bounded,
    broadcastable after a frequency floor), one equi-join pass over
    held-out bigrams; identical shape to serving a binned LM at
    corpus scale."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.split("text", r"\s+").alias("t")
    ).filter(F.size("t") >= 2)
    train = toks.filter(F.col("doc_id") % 2 == 0)
    heldout = toks.filter(F.col("doc_id") % 2 == 1)
    bg = F.zip_with(
        F.slice(F.col("t"), 1, F.size("t") - 1),
        F.slice(F.col("t"), 2, F.size("t") - 1),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    tbig = train.select(F.explode(bg).alias("bg"))
    c12 = tbig.groupBy("bg").agg(F.count(F.lit(1)).alias("c12"))
    c1 = tbig.groupBy(F.substring_index("bg", " ", 1).alias("w1")).agg(
        F.count(F.lit(1)).alias("c1")
    )
    vocab = train.select(F.explode("t").alias("tok")).agg(
        F.count_distinct("tok").alias("v")
    )
    hbig = heldout.select("doc_id", "source", F.explode(bg).alias("bg"))
    scored = (
        hbig.join(c12, "bg", "left")
        .join(c1, F.substring_index(F.col("bg"), " ", 1) == c1.w1, "left")
        .join(F.broadcast(vocab))
        .select(
            "doc_id",
            "source",
            F.round(
                F.log(
                    (F.coalesce(F.col("c12"), F.lit(0)) + 1)
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v")).cast("double")
                )
                * 1000000
            )
            .cast("long")
            .alias("lp"),
        )
    )
    per_doc = scored.groupBy("doc_id", "source").agg(
        F.sum("lp").cast("long").alias("w"), F.count(F.lit(1)).alias("nb")
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("w") < -7000000 * F.col("nb"), 1).otherwise(0))
        .cast("long")
        .alias("n_flagged"),
        F.round(
            F.sum("w") / (1000000.0 * F.sum("nb").cast("long")), 6
        ).alias("corpus_avg_logp"),
    )


# ---------------------------------------------------------------------------
# hybrid retrieval: reciprocal-rank fusion of sparse TF-IDF and dense
# embedding rankings (vec_id aligns with doc_id in the fixtures)
# ---------------------------------------------------------------------------

# dense-side twins of operators.similarity.dot / l2_norm (same
# left-to-right double fold as plans/similarity.py)
_RRF_SQL_DOT = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    "list_transform(range(1, 65), i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
    "(acc, x) -> acc + x)"
)
_RRF_SQL_NORM = (
    "sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    "list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), "
    "(acc, x) -> acc + x))"
)

_RRF_K = 60
_RRF_DEPTH = 50

_HYBRID_RRF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, UNNEST(string_split_regex(text, '\\s+')) AS tok FROM documents
),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
idf AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
w AS (
  SELECT tf.doc_id, tf.tok,
         tf.tf * (ln((n.n_docs + 1.0) / (idf.df + 1.0)) + 1.0) AS w
  FROM tf JOIN idf USING (tok) CROSS JOIN n
),
nrm AS (SELECT doc_id, sqrt(SUM(w * w)) AS nrm FROM w GROUP BY doc_id),
qd AS (SELECT * FROM w WHERE doc_id % 250 = 0),
sparse AS (
  SELECT qd.doc_id AS query_id, w.doc_id AS doc_id,
         ROUND(SUM(qd.w * w.w), 6) AS dot
  FROM qd JOIN w USING (tok)
  WHERE w.doc_id <> qd.doc_id
  GROUP BY qd.doc_id, w.doc_id
),
sparse_ranked AS (
  SELECT s.query_id, s.doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY s.query_id
           ORDER BY ROUND(s.dot / (nq.nrm * nd.nrm), 6) DESC, s.doc_id ASC
         ) AS r
  FROM sparse s
  JOIN nrm nq ON nq.doc_id = s.query_id
  JOIN nrm nd ON nd.doc_id = s.doc_id
),
sparse_top AS (SELECT * FROM sparse_ranked WHERE r <= {_RRF_DEPTH}),
qe AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 250 = 0),
dense_ranked AS (
  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY ROUND({_RRF_SQL_DOT.format(a='q.embedding', b='c.embedding')}
                 / ({_RRF_SQL_NORM.format(a='q.embedding')}
                    * {_RRF_SQL_NORM.format(a='c.embedding')}), 6) DESC,
                 c.vec_id ASC
         ) AS r
  FROM qe q JOIN embeddings c ON c.vec_id <> q.vec_id
),
dense_top AS (SELECT * FROM dense_ranked WHERE r <= {_RRF_DEPTH}),
fused AS (
  SELECT COALESCE(s.query_id, d.query_id) AS query_id,
         COALESCE(s.doc_id, d.doc_id) AS doc_id,
         s.r AS r_sparse, d.r AS r_dense,
         ROUND(COALESCE(1.0 / ({_RRF_K} + s.r), 0.0)
               + COALESCE(1.0 / ({_RRF_K} + d.r), 0.0), 6) AS rrf
  FROM sparse_top s
  FULL OUTER JOIN dense_top d
    ON s.query_id = d.query_id AND s.doc_id = d.doc_id
),
final AS (
  SELECT query_id, doc_id,
         CAST(COALESCE(r_sparse, 0) AS BIGINT) AS r_sparse,
         CAST(COALESCE(r_dense, 0) AS BIGINT) AS r_dense,
         rrf,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY rrf DESC, doc_id ASC) AS rn
  FROM fused
)
SELECT query_id, doc_id, r_sparse, r_dense, rrf, CAST(rn AS BIGINT) AS rn
FROM final WHERE rn <= 10
"""


@register(
    "sim_hybrid_rrf",
    _HYBRID_RRF_ORACLE,
    doc="hybrid search: reciprocal-rank fusion of sparse TF-IDF + dense embedding rankings",
)
def sim_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval, the shape every modern RAG stack serves: for
    each query document, fuse the SPARSE ranking (TF-IDF cosine over
    tokens — sim_tfidf_topk_text's relation) with the DENSE ranking
    (embedding cosine — the vec_id/doc_id-aligned embeddings table)
    by reciprocal-rank fusion: rrf = 1/(60+r_sparse) + 1/(60+r_dense)
    over each list's top-50, missing-from-one-list scoring only the
    other term. RRF needs no score normalization across signals —
    exactly why production fusers use it — and because ranks are
    integers derived from ROUNDED scores with id tie-breaks, the
    fused ordering is engine-deterministic end to end. Scale: each
    ranking is query-broadcast x corpus-scan (linear per query, never
    all-pairs); the fusion joins two top-depth lists per query —
    O(queries x depth) rows, trivially small. A rank-0 output means
    'not in that signal's top-50'."""
    from web_attack_detection_spark.operators.similarity import dot, l2_norm

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    # --- sparse ranking (tokenizer/idf contract of text_tfidf) ---
    toks = docs.select("doc_id", F.explode(F.split("text", r"\s+")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf")).cache()
    try:
        idf = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
        n_docs = docs.count()
        w = tf.join(F.broadcast(idf), "tok").select(
            "doc_id",
            "tok",
            (
                F.col("tf")
                * (F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)) + F.lit(1.0))
            ).alias("w"),
        )
        nrm = w.groupBy("doc_id").agg(
            F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
        )
        qd = w.filter(F.col("doc_id") % 250 == 0).select(
            F.col("doc_id").alias("query_id"), "tok", F.col("w").alias("qw")
        )
        sparse = (
            w.join(F.broadcast(qd), "tok")
            .filter(F.col("doc_id") != F.col("query_id"))
            .groupBy("query_id", "doc_id")
            .agg(F.round(F.sum(F.col("qw") * F.col("w")), 6).alias("dot"))
        )
        sw = Window.partitionBy("query_id").orderBy(
            F.round(F.col("dot") / (F.col("qnrm") * F.col("nrm")), 6).desc(),
            F.col("doc_id").asc(),
        )
        sparse_top = (
            sparse.join(
                F.broadcast(
                    nrm.select(F.col("doc_id").alias("query_id"), F.col("nrm").alias("qnrm"))
                ),
                "query_id",
            )
            .join(nrm, "doc_id")
            .withColumn("r", F.row_number().over(sw))
            .filter(F.col("r") <= _RRF_DEPTH)
            .select("query_id", "doc_id", F.col("r").alias("r_sparse"))
            .localCheckpoint()
        )
    finally:
        tf.unpersist()

    # --- dense ranking (operators.similarity fold, bit-identical twin) ---
    qe = emb.filter(F.col("vec_id") % 250 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    cos = dot(F.col("qv"), F.col("embedding")) / (
        l2_norm(F.col("qv")) * l2_norm(F.col("embedding"))
    )
    dw = Window.partitionBy("query_id").orderBy(
        F.round(cos, 6).desc(), F.col("vec_id").asc()
    )
    dense_top = (
        emb.crossJoin(F.broadcast(qe))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("r", F.row_number().over(dw))
        .filter(F.col("r") <= _RRF_DEPTH)
        .select("query_id", F.col("vec_id").alias("doc_id"), F.col("r").alias("r_dense"))
    )

    # --- fusion ---
    fused = sparse_top.join(dense_top, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        "r_sparse",
        "r_dense",
        F.round(
            F.coalesce(1.0 / (_RRF_K + F.col("r_sparse")), F.lit(0.0))
            + F.coalesce(1.0 / (_RRF_K + F.col("r_dense")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    fw = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rn", F.row_number().over(fw).cast("long"))
        .filter(F.col("rn") <= 10)
        .select(
            "query_id",
            "doc_id",
            F.coalesce("r_sparse", F.lit(0)).cast("long").alias("r_sparse"),
            F.coalesce("r_dense", F.lit(0)).cast("long").alias("r_dense"),
            "rrf",
            "rn",
        )
    )


# ---------------------------------------------------------------------------
# BM25 retrieval (Okapi weighting over the same inverted index)
# ---------------------------------------------------------------------------

_BM25_K1 = 1.2
_BM25_B = 0.75

_BM25_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, UNNEST(string_split_regex(text, '\\s+')) AS tok FROM documents
),
dl AS (SELECT doc_id, COUNT(*) AS len FROM toks GROUP BY doc_id),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(len) AS BIGINT) AS total_len
  FROM dl
),
qt AS (SELECT DISTINCT tok FROM tf WHERE doc_id % 250 = 0),
qd AS (SELECT doc_id AS query_id FROM dl WHERE doc_id % 250 = 0),
qterms AS (
  SELECT tf.doc_id AS query_id, tf.tok FROM tf WHERE tf.doc_id % 250 = 0
),
scored AS (
  SELECT q.query_id, tf.doc_id,
         SUM(ln((g.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * (tf.tf * ({_BM25_K1} + 1.0))
             / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                + {_BM25_B} * (dl.len * g.n_docs) / (1.0 * g.total_len)))) AS s,
         COUNT(*) AS n_shared
  FROM qterms q
  JOIN tf ON tf.tok = q.tok AND tf.doc_id <> q.query_id
  JOIN df ON df.tok = tf.tok
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN g
  GROUP BY q.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id, doc_id, CAST(n_shared AS BIGINT) AS n_shared,
         ROUND(s, 6) AS bm25,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY ROUND(s, 6) DESC, doc_id ASC) AS rn
  FROM scored
)
SELECT query_id, doc_id, n_shared, bm25, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= 5
"""


@register(
    "sim_bm25_topk",
    _BM25_ORACLE,
    doc="Okapi BM25 top-k retrieval (tf saturation + length normalization), full oracle",
)
def sim_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 (k1=1.2, b=0.75) — the default lexical ranking in
    every production search engine, next to the raw TF-IDF cosine of
    sim_tfidf_topk_text: BM25 saturates term frequency (a term's 10th
    occurrence adds almost nothing) and normalizes by document length
    against the corpus average. The length normalization uses
    len_d * N / total_len — a ratio of exact integers, never a
    pre-divided float average — so the per-term weight is a fixed
    deterministic expression tree in both engines. Same inverted-
    index join shape as the TF-IDF query (query postings broadcast,
    one equi-join on the term, linear in corpus); ranking on the
    ROUNDED score with doc_id tie-break keeps the top-k cut engine-
    deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", r"\s+")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf")).cache()
    try:
        dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("len"))
        df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
        g = dl.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("len").cast("long").alias("total_len"),
        )
        qterms = tf.filter(F.col("doc_id") % 250 == 0).select(
            F.col("doc_id").alias("query_id"), "tok"
        )
        idf = F.log(
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        )
        norm_len = 1.0 - _BM25_B + _BM25_B * (
            F.col("len") * F.col("n_docs")
        ) / (1.0 * F.col("total_len"))
        term = idf * (F.col("tf") * (_BM25_K1 + 1.0)) / (
            F.col("tf") + _BM25_K1 * norm_len
        )
        scored = (
            tf.join(F.broadcast(qterms), "tok")
            .filter(F.col("doc_id") != F.col("query_id"))
            .join(F.broadcast(df), "tok")
            .join(dl, "doc_id")
            .crossJoin(F.broadcast(g))
            .groupBy("query_id", "doc_id")
            .agg(
                F.sum(term).alias("s"),
                F.count(F.lit(1)).cast("long").alias("n_shared"),
            )
        )
        rw = Window.partitionBy("query_id").orderBy(
            F.round(F.col("s"), 6).desc(), F.col("doc_id").asc()
        )
        return (
            scored.withColumn("rn", F.row_number().over(rw).cast("long"))
            .filter(F.col("rn") <= 5)
            .select(
                "query_id",
                "doc_id",
                "n_shared",
                F.round("s", 6).alias("bm25"),
                "rn",
            )
            .localCheckpoint()
        )
    finally:
        tf.unpersist()


# ---------------------------------------------------------------------------
# vocabulary coverage curve (top-N token share, one scan)
# ---------------------------------------------------------------------------

_VOCAB_COVERAGE_ORACLE = """
WITH toks AS (
  SELECT unnest(string_split_regex(text, '\\s+')) AS tok FROM documents
),
counts AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM toks WHERE tok <> '' GROUP BY tok
),
ranked AS (
  SELECT tok, n,
         ROW_NUMBER() OVER (ORDER BY n DESC, tok ASC) AS rk,
         SUM(n) OVER () AS total
  FROM counts
),
ns AS (SELECT UNNEST([5, 10, 20, 40]) AS top_n)
SELECT CAST(ns.top_n AS BIGINT) AS top_n,
       CAST(SUM(r.n) AS BIGINT) AS covered_instances,
       CAST(MAX(r.total) AS BIGINT) AS total_instances,
       ROUND(SUM(r.n) / (1.0 * MAX(r.total)), 6) AS coverage
FROM ns JOIN ranked r ON r.rk <= ns.top_n
GROUP BY ns.top_n
"""


@register(
    "text_vocab_coverage",
    _VOCAB_COVERAGE_ORACLE,
    doc="vocabulary coverage curve: token-instance share of the top-N vocab, one scan",
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How big a vocabulary do you actually need? The coverage curve
    every tokenizer-sizing decision reads: the share of all token
    INSTANCES covered by the top-N types, for four N values from one
    token-count aggregate (the N spine joins rank <= N — the corpus
    is scanned once, the curve is computed over |vocab| rows). Rank
    ties break on the token string, so the curve is engine-identical
    even when two types tie on frequency. Pairs with
    text_bpe_first_merge (what to merge next) and text_zipf_slope
    (how fast coverage saturates)."""
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.split("text", r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    rw = Window.orderBy(F.col("n").desc(), F.col("tok").asc())
    tw = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = counts.select(
        "n",
        F.row_number().over(rw).alias("rk"),
        F.sum("n").over(tw).alias("total"),
    )
    ns = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in (5, 10, 20, 40)])).alias("top_n")
    )
    return (
        ranked.join(F.broadcast(ns), ranked.rk <= F.col("top_n"))
        .groupBy("top_n")
        .agg(
            F.sum("n").cast("long").alias("covered_instances"),
            F.max("total").cast("long").alias("total_instances"),
            F.round(F.sum("n") / (1.0 * F.max("total")), 6).alias("coverage"),
        )
        .select(
            F.col("top_n").cast("long"),
            "covered_instances",
            "total_instances",
            "coverage",
        )
    )
