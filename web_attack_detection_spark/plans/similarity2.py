"""Quantized-embedding queries: the int8 scale path for similarity
search over ``embeddings``.

At 100 TB an fp32 embedding column is the dominant scan cost of every
ANN query; symmetric per-vector int8 quantization cuts candidate-scan
bytes 4× and turns the inner loop into an exact integer dot product
(no float-order nondeterminism at all — BIGINT sums are associative,
so the result is independent of partitioning, unlike fp32 folds that
similarity.py must pin to left-to-right order). The recall cost is
bounded by the per-vector scale: q = round(x · 127/max|x|).

The reference (huunhan1804/web-attack-detection) has no embedding or
similarity surface (SURVEY.md §2.7) — this extends the north-star
similarity stack (similarity.py) with its memory-bound scale variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from web_attack_detection_spark.io.sources import load_table
from web_attack_detection_spark.plans.registry import register
from web_attack_detection_spark.plans.similarity import _SQL_DOT, _ivf_index_cte

# per-vector symmetric int8 quantization (DuckDB side). Element order:
# cast float→double FIRST in both engines, then abs/max/round —
# textual twin of _quantized() below.
_SQL_QUANT_CTE = """
scaled AS (
  SELECT vec_id, label, embedding,
         127.0 / list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS s
  FROM embeddings
),
quant AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * s) AS INTEGER)) AS q
  FROM scaled
)
"""


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vec_id, label, q: array<int> in [-127, 127]. Map-only — the
    scale is a per-row array fold, no shuffle, no UDF; at 100 TB this
    is the one-pass rewrite job that materializes the quantized
    column next to (or instead of) the fp32 one."""
    emb = load_table(spark, sf_dir, "embeddings")
    s = F.lit(127.0) / F.array_max(
        F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
    )
    return emb.select(
        "vec_id",
        "label",
        F.transform(
            F.col("embedding"), lambda x: F.round(x.cast("double") * s).cast("int")
        ).alias("q"),
    )


_QUANTIZE_ORACLE = f"""
WITH {_SQL_QUANT_CTE}
SELECT vec_id,
       CAST(to_json(q) AS VARCHAR) AS q,
       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), q),
                        (acc, x) -> acc + x) AS BIGINT) AS q_sum,
       CAST(list_max(list_transform(q, x -> abs(x))) AS INTEGER) AS q_max_abs
FROM quant
"""


@register(
    "sim_scalar_quantize",
    _QUANTIZE_ORACLE,
    doc="symmetric per-vector int8 quantization of the embedding column",
)
def sim_scalar_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quantized arrays themselves are the checked output (plus a
    sum/max-abs digest): integers survive both engines bit-exactly, so
    this pins the quantization formula — the part recall depends on —
    not just row counts."""
    q = _quantized(spark, sf_dir)
    return q.select(
        "vec_id",
        F.to_json("q").alias("q"),
        F.aggregate(F.col("q"), F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "q_sum"
        ),
        F.array_max(F.transform(F.col("q"), lambda x: F.abs(x))).alias("q_max_abs"),
    )


_QTOPK_ORACLE = f"""
WITH {_SQL_QUANT_CTE},
scored AS (
  SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(range(1, 65), i -> CAST(p.q[i] AS BIGINT) * c.q[i])),
           (acc, x) -> acc + x) AS BIGINT) AS dot_q
  FROM quant p JOIN quant c ON c.vec_id != p.vec_id
  WHERE p.vec_id < 10
),
ranked AS (
  SELECT query_id, neighbor_id, dot_q,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY dot_q DESC, neighbor_id ASC
         ) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, dot_q
FROM ranked WHERE rank <= 5
"""


@register(
    "sim_quantized_topk",
    _QTOPK_ORACLE,
    doc="exact int8-dot top-5 neighbors for 10 probe vectors",
)
def sim_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-k over the QUANTIZED column: the 10 probes
    broadcast against the candidate scan (map-only scoring — the only
    shuffle is the per-query top-k window over 10 partitions), and the
    BIGINT dot product makes ranking ties exact, so (score desc, id
    asc) is a total order both engines agree on. At 100 TB this is the
    re-rank-free ANN fallback: 4× less scan than fp32 brute force with
    identical plan shape."""
    q = _quantized(spark, sf_dir)
    probes = q.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("pq")
    )
    cands = q.select(F.col("vec_id").alias("neighbor_id"), F.col("q").alias("cq"))
    dot = F.aggregate(
        F.zip_with(F.col("pq"), F.col("cq"), lambda a, b: a.cast("long") * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        cands.join(F.broadcast(probes), F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", dot.alias("dot_q"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot_q").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "dot_q")
    )


# ---------------------------------------------------------------------------
# IVF × int8: the combined scale path, self-evaluating recall
# ---------------------------------------------------------------------------


def _quant_arr(vec):
    """Quantize an array column to int8-range ints (same formula as
    _quantized, as a reusable expression over any numeric array)."""
    s = F.lit(127.0) / F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
    return F.transform(vec, lambda x: F.round(x.cast("double") * s).cast("int"))


_INT_DOT = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(range(1, 65), i -> CAST({a}[i] AS BIGINT) * {b}[i])), "
    "(acc, x) -> acc + x)"
)

_IVF_QUANT_ORACLE = f"""
WITH {_ivf_index_cte(16)},
qc AS (
  SELECT vec_id, cell,
         list_transform(u, x -> CAST(round(CAST(x AS DOUBLE)
             * (127.0 / list_aggregate(
                   list_transform(u, y -> abs(CAST(y AS DOUBLE))), 'max')))
           AS INTEGER)) AS q
  FROM a1
),
qp AS (
  SELECT a1.vec_id AS query_id, qc.q AS pq, a1.u AS q_vec
  FROM a1 JOIN qc ON a1.vec_id = qc.vec_id
  WHERE a1.vec_id < 10
),
pc AS (
  SELECT query_id, cell FROM (
    SELECT p.query_id, c.cell,
           ROW_NUMBER() OVER (PARTITION BY p.query_id
             ORDER BY {_SQL_DOT.format(a='p.q_vec', b='c.c_vec')} DESC,
                      c.cell ASC) AS rn
    FROM qp p CROSS JOIN cents1 c
  ) WHERE rn <= 4
),
iv AS (
  SELECT query_id, vec_id FROM (
    SELECT p.query_id, t.vec_id,
           ROW_NUMBER() OVER (PARTITION BY p.query_id
             ORDER BY {_INT_DOT.format(a='p.pq', b='t.q')} DESC,
                      t.vec_id ASC) AS rnk
    FROM qc t JOIN pc ON t.cell = pc.cell JOIN qp p ON p.query_id = pc.query_id
    WHERE t.vec_id != p.query_id
  ) WHERE rnk <= 5
),
ex AS (
  SELECT query_id, vec_id FROM (
    SELECT p.query_id, t.vec_id,
           ROW_NUMBER() OVER (PARTITION BY p.query_id
             ORDER BY {_INT_DOT.format(a='p.pq', b='t.q')} DESC,
                      t.vec_id ASC) AS rnk
    FROM qc t CROSS JOIN qp p
    WHERE t.vec_id != p.query_id
  ) WHERE rnk <= 5
),
hits AS (
  SELECT i.query_id, CAST(COUNT(*) AS BIGINT) AS n_hit
  FROM iv i SEMI JOIN ex e ON i.query_id = e.query_id AND i.vec_id = e.vec_id
  GROUP BY i.query_id
)
SELECT q.query_id,
       COALESCE(h.n_hit, 0) AS n_hit,
       ROUND(COALESCE(h.n_hit, 0) / 5.0, 2) AS recall_at_5
FROM (SELECT DISTINCT query_id FROM qp) q
LEFT JOIN hits h ON q.query_id = h.query_id
"""


@register(
    "sim_ivf_quantized_topk",
    _IVF_QUANT_ORACLE,
    doc="IVF cell pruning + int8 integer scoring, FULL oracle (portable index replay + exact BIGINT dots)",
)
def sim_ivf_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full 100 TB ANN stack in one query: IVF assignment prunes
    the candidate set to n_probe/k_centroids of the corpus (map-only,
    operators/similarity.ivf_assign), and candidate scoring runs on
    the QUANTIZED unit vectors with exact BIGINT dots — 4× less scan
    and associative scores. The query also computes its own recall
    against the quantized brute force (what a production pipeline runs
    on a sample to tune n_probe): both paths share one quantized
    corpus, so recall isolates exactly the IVF pruning loss. Output
    (query_id, n_hit, recall@5) is deterministic — integer scores, id
    tiebreaks, deterministic seeding — and since round 7 FULLY
    oracle-checked: the portable-hash/quantized-Lloyd index replay
    (plans/similarity._ivf_index_cte) plus the same int8 quantization
    and exact-BIGINT dot folds in DuckDB."""
    from pyspark.sql import Window

    from web_attack_detection_spark.operators.similarity import dot, ivf_assign

    emb = load_table(spark, sf_dir, "embeddings")
    centroids, assigned = ivf_assign(emb, 16)
    qcorp = assigned.select(
        "vec_id", "cell", _quant_arr(F.col("embedding")).alias("q")
    ).localCheckpoint()

    probes_unit = assigned.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
    )
    cents = centroids.agg(F.collect_list(F.struct("cell", "c_vec")).alias("cents"))
    probe_cells = (
        probes_unit.crossJoin(F.broadcast(cents))
        .withColumn(
            "__ranked",
            F.array_sort(
                F.transform(
                    F.col("cents"),
                    lambda c: F.struct(
                        (-dot(F.col("q_vec"), c["c_vec"])).alias("negcos"),
                        c["cell"].alias("cell"),
                    ),
                )
            ),
        )
        .select(
            "query_id",
            F.explode(
                F.transform(F.slice("__ranked", 1, 4), lambda s: s["cell"])
            ).alias("cell"),
        )
    )
    qprobe = qcorp.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("pq")
    )
    dot_q = F.aggregate(
        F.zip_with(F.col("pq"), F.col("q"), lambda a, b: a.cast("long") * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot_q").desc(), F.col("vec_id").asc()
    )

    def topk(cands: DataFrame) -> DataFrame:
        return (
            cands.filter(F.col("vec_id") != F.col("query_id"))
            .select("query_id", "vec_id", dot_q.alias("dot_q"))
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 5)
            .select("query_id", "vec_id")
        )

    ivf_hits = topk(
        qcorp.join(F.broadcast(probe_cells), "cell").join(
            F.broadcast(qprobe), "query_id"
        )
    )
    exact_hits = topk(qcorp.crossJoin(F.broadcast(qprobe)))
    overlap = ivf_hits.join(exact_hits, ["query_id", "vec_id"], "left_semi")
    hits = overlap.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit"))
    # left join from the probe list: a query whose probed cells missed
    # every true neighbor must still report recall 0, not vanish
    return (
        qprobe.select("query_id")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            F.round(F.coalesce("n_hit", F.lit(0)) / 5.0, 2).alias("recall_at_5"),
        )
    )
