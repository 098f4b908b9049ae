"""Oracle-checked queries for the deduplication operators.

The documents fixture has no byte-identical duplicates but DOES
contain planted near-duplicates (25 pairs at 3-gram Jaccard ≥ 0.2,
max 0.989) — exactly the workload these operators exist for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from web_attack_detection_spark.functions.overlap import overlap
from web_attack_detection_spark.io.sources import load_table, parallelize_scan, union_by_name
from web_attack_detection_spark.operators.dedup import (
    connected_components,
    exact_dedup,
    jaccard_pairs_exact,
    minhash_near_dup_pairs,
    simhash_near_dup_pairs,
)
from web_attack_detection_spark.plans.audit import audit_scale_ok
from web_attack_detection_spark.plans.registry import register

# ---------------------------------------------------------------------------
# exact dedup — corpus ∪ shifted-id copy, survivor = min doc_id
# ---------------------------------------------------------------------------

_EXACT_ORACLE = """
SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id, COUNT(*) AS n_copies
FROM (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents
)
GROUP BY text
"""


@register("dedup_exact", _EXACT_ORACLE, doc="exact dedup: hash-groupBy, min-id survivor")
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over a corpus with planted duplicates (the fixture
    has none, so the query unions a shifted-id copy). groupBy(text) →
    min(doc_id): one shuffle, map-side partial agg. At 100 TB dedup on
    raw text shuffles the text bytes — dedup on xxhash64(text) instead
    and verify collisions; the operator supports either key."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = union_by_name(docs, docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text"))
    return exact_dedup(doubled, ["text"], "doc_id", with_counts=True).select("doc_id", "n_copies")


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup pairs (exact ground truth)
# ---------------------------------------------------------------------------

_JACCARD_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
  FROM toks, UNNEST(range(1, greatest(len(t) - 2, 1) + 1)) AS r(i)
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id)
SELECT id_a, id_b,
       ROUND(n_common / CAST(sa.sz + sb.sz - n_common AS DOUBLE), 6) AS jaccard
FROM pairs
JOIN sizes sa ON id_a = sa.doc_id
JOIN sizes sb ON id_b = sb.doc_id
WHERE n_common / CAST(sa.sz + sb.sz - n_common AS DOUBLE) >= 0.2
"""


@register("dedup_ngram_jaccard", _JACCARD_ORACLE, doc="exact 3-gram Jaccard near-dup pairs")
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup pairs via shingle inverted-index join — the
    ground truth MinHash is tested against (tests/test_dedup.py).
    Finds the fixture's 25 planted near-dup pairs."""
    docs = load_table(spark, sf_dir, "documents")
    return jaccard_pairs_exact(docs, "text", "doc_id", n=3, threshold=0.2)


# ---------------------------------------------------------------------------
# MinHash LSH near-dup (approximate; rows-only — xxhash64 has no DuckDB twin)
# ---------------------------------------------------------------------------


_MINHASH_ORACLE = """
WITH toks AS (
  SELECT doc_id AS id, string_split_regex(text, '\\s+') AS t FROM documents
),
sh AS (
  SELECT DISTINCT id, array_to_string(t[i:i+2], ' ') AS shingle
  FROM toks, UNNEST(range(1, greatest(len(t) - 2, 1) + 1)) AS r(i)
),
sigb AS (
  SELECT id,
         CAST(concat('0x', substr(md5(shingle), 1, 8)) AS BIGINT) & 2147483647
           AS hb
  FROM sh
),
sig AS (
  SELECT id,
         MIN((hb * 2058367755 + 556613360) % 2147483647) AS h0,
         MIN((hb * 1250378733 + 488839214) % 2147483647) AS h1,
         MIN((hb * 1328920189 + 862986758) % 2147483647) AS h2,
         MIN((hb * 372282287 + 1431692393) % 2147483647) AS h3,
         MIN((hb * 35052691 + 1653509423) % 2147483647) AS h4,
         MIN((hb * 260070993 + 431528743) % 2147483647) AS h5,
         MIN((hb * 1425365893 + 224535992) % 2147483647) AS h6,
         MIN((hb * 920539465 + 598863500) % 2147483647) AS h7,
         MIN((hb * 409468655 + 723743592) % 2147483647) AS h8,
         MIN((hb * 638079617 + 11716706) % 2147483647) AS h9,
         MIN((hb * 1652464807 + 1089625331) % 2147483647) AS h10,
         MIN((hb * 2033713063 + 96286478) % 2147483647) AS h11,
         MIN((hb * 1010120343 + 2025278477) % 2147483647) AS h12,
         MIN((hb * 873091423 + 1926321247) % 2147483647) AS h13,
         MIN((hb * 910172515 + 1363754172) % 2147483647) AS h14,
         MIN((hb * 1362467473 + 146013650) % 2147483647) AS h15,
         MIN((hb * 1577225783 + 229221827) % 2147483647) AS h16,
         MIN((hb * 708511553 + 511759879) % 2147483647) AS h17,
         MIN((hb * 1389507383 + 714695731) % 2147483647) AS h18,
         MIN((hb * 1784693825 + 1765617543) % 2147483647) AS h19,
         MIN((hb * 2003597557 + 449155689) % 2147483647) AS h20,
         MIN((hb * 347112817 + 1997759968) % 2147483647) AS h21,
         MIN((hb * 2133395955 + 1696478464) % 2147483647) AS h22,
         MIN((hb * 1638263923 + 1307417817) % 2147483647) AS h23,
         MIN((hb * 1962772767 + 221907626) % 2147483647) AS h24,
         MIN((hb * 908613597 + 1190148063) % 2147483647) AS h25,
         MIN((hb * 1364526543 + 281240666) % 2147483647) AS h26,
         MIN((hb * 932472843 + 1796390308) % 2147483647) AS h27,
         MIN((hb * 1976978009 + 701113081) % 2147483647) AS h28,
         MIN((hb * 656157899 + 1869851086) % 2147483647) AS h29,
         MIN((hb * 1457334633 + 258005080) % 2147483647) AS h30,
         MIN((hb * 212322979 + 562276511) % 2147483647) AS h31
  FROM sigb GROUP BY id
),
bands AS (
  SELECT id, 0 AS band, concat_ws(',', h0, h1, h2, h3) AS bh FROM sig UNION ALL
  SELECT id, 1 AS band, concat_ws(',', h4, h5, h6, h7) AS bh FROM sig UNION ALL
  SELECT id, 2 AS band, concat_ws(',', h8, h9, h10, h11) AS bh FROM sig UNION ALL
  SELECT id, 3 AS band, concat_ws(',', h12, h13, h14, h15) AS bh FROM sig UNION ALL
  SELECT id, 4 AS band, concat_ws(',', h16, h17, h18, h19) AS bh FROM sig UNION ALL
  SELECT id, 5 AS band, concat_ws(',', h20, h21, h22, h23) AS bh FROM sig UNION ALL
  SELECT id, 6 AS band, concat_ws(',', h24, h25, h26, h27) AS bh FROM sig UNION ALL
  SELECT id, 7 AS band, concat_ws(',', h28, h29, h30, h31) AS bh FROM sig
),
cand AS (
  SELECT DISTINCT l.id AS id_a, r.id AS id_b
  FROM bands l JOIN bands r ON l.band = r.band AND l.bh = r.bh AND l.id < r.id
),
verified AS (
  SELECT c.id_a, c.id_b,
         ROUND(((CASE WHEN a.h0 = b.h0 THEN 1 ELSE 0 END) + (CASE WHEN a.h1 = b.h1 THEN 1 ELSE 0 END) + (CASE WHEN a.h2 = b.h2 THEN 1 ELSE 0 END) + (CASE WHEN a.h3 = b.h3 THEN 1 ELSE 0 END) + (CASE WHEN a.h4 = b.h4 THEN 1 ELSE 0 END) + (CASE WHEN a.h5 = b.h5 THEN 1 ELSE 0 END) + (CASE WHEN a.h6 = b.h6 THEN 1 ELSE 0 END) + (CASE WHEN a.h7 = b.h7 THEN 1 ELSE 0 END) + (CASE WHEN a.h8 = b.h8 THEN 1 ELSE 0 END) + (CASE WHEN a.h9 = b.h9 THEN 1 ELSE 0 END) + (CASE WHEN a.h10 = b.h10 THEN 1 ELSE 0 END) + (CASE WHEN a.h11 = b.h11 THEN 1 ELSE 0 END) + (CASE WHEN a.h12 = b.h12 THEN 1 ELSE 0 END) + (CASE WHEN a.h13 = b.h13 THEN 1 ELSE 0 END) + (CASE WHEN a.h14 = b.h14 THEN 1 ELSE 0 END) + (CASE WHEN a.h15 = b.h15 THEN 1 ELSE 0 END) + (CASE WHEN a.h16 = b.h16 THEN 1 ELSE 0 END) + (CASE WHEN a.h17 = b.h17 THEN 1 ELSE 0 END) + (CASE WHEN a.h18 = b.h18 THEN 1 ELSE 0 END) + (CASE WHEN a.h19 = b.h19 THEN 1 ELSE 0 END) + (CASE WHEN a.h20 = b.h20 THEN 1 ELSE 0 END) + (CASE WHEN a.h21 = b.h21 THEN 1 ELSE 0 END) + (CASE WHEN a.h22 = b.h22 THEN 1 ELSE 0 END) + (CASE WHEN a.h23 = b.h23 THEN 1 ELSE 0 END) + (CASE WHEN a.h24 = b.h24 THEN 1 ELSE 0 END) + (CASE WHEN a.h25 = b.h25 THEN 1 ELSE 0 END) + (CASE WHEN a.h26 = b.h26 THEN 1 ELSE 0 END) + (CASE WHEN a.h27 = b.h27 THEN 1 ELSE 0 END) + (CASE WHEN a.h28 = b.h28 THEN 1 ELSE 0 END) + (CASE WHEN a.h29 = b.h29 THEN 1 ELSE 0 END) + (CASE WHEN a.h30 = b.h30 THEN 1 ELSE 0 END) + (CASE WHEN a.h31 = b.h31 THEN 1 ELSE 0 END)) / 32.0, 6) AS est_jaccard
  FROM cand c JOIN sig a ON c.id_a = a.id JOIN sig b ON c.id_b = b.id
  WHERE ((CASE WHEN a.h0 = b.h0 THEN 1 ELSE 0 END) + (CASE WHEN a.h1 = b.h1 THEN 1 ELSE 0 END) + (CASE WHEN a.h2 = b.h2 THEN 1 ELSE 0 END) + (CASE WHEN a.h3 = b.h3 THEN 1 ELSE 0 END) + (CASE WHEN a.h4 = b.h4 THEN 1 ELSE 0 END) + (CASE WHEN a.h5 = b.h5 THEN 1 ELSE 0 END) + (CASE WHEN a.h6 = b.h6 THEN 1 ELSE 0 END) + (CASE WHEN a.h7 = b.h7 THEN 1 ELSE 0 END) + (CASE WHEN a.h8 = b.h8 THEN 1 ELSE 0 END) + (CASE WHEN a.h9 = b.h9 THEN 1 ELSE 0 END) + (CASE WHEN a.h10 = b.h10 THEN 1 ELSE 0 END) + (CASE WHEN a.h11 = b.h11 THEN 1 ELSE 0 END) + (CASE WHEN a.h12 = b.h12 THEN 1 ELSE 0 END) + (CASE WHEN a.h13 = b.h13 THEN 1 ELSE 0 END) + (CASE WHEN a.h14 = b.h14 THEN 1 ELSE 0 END) + (CASE WHEN a.h15 = b.h15 THEN 1 ELSE 0 END) + (CASE WHEN a.h16 = b.h16 THEN 1 ELSE 0 END) + (CASE WHEN a.h17 = b.h17 THEN 1 ELSE 0 END) + (CASE WHEN a.h18 = b.h18 THEN 1 ELSE 0 END) + (CASE WHEN a.h19 = b.h19 THEN 1 ELSE 0 END) + (CASE WHEN a.h20 = b.h20 THEN 1 ELSE 0 END) + (CASE WHEN a.h21 = b.h21 THEN 1 ELSE 0 END) + (CASE WHEN a.h22 = b.h22 THEN 1 ELSE 0 END) + (CASE WHEN a.h23 = b.h23 THEN 1 ELSE 0 END) + (CASE WHEN a.h24 = b.h24 THEN 1 ELSE 0 END) + (CASE WHEN a.h25 = b.h25 THEN 1 ELSE 0 END) + (CASE WHEN a.h26 = b.h26 THEN 1 ELSE 0 END) + (CASE WHEN a.h27 = b.h27 THEN 1 ELSE 0 END) + (CASE WHEN a.h28 = b.h28 THEN 1 ELSE 0 END) + (CASE WHEN a.h29 = b.h29 THEN 1 ELSE 0 END) + (CASE WHEN a.h30 = b.h30 THEN 1 ELSE 0 END) + (CASE WHEN a.h31 = b.h31 THEN 1 ELSE 0 END)) / 32.0 >= 0.4
),
jpairs AS (
  SELECT p.id_a, p.id_b
  FROM (
    SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_common
    FROM sh a JOIN sh b USING (shingle)
    WHERE a.id < b.id GROUP BY 1, 2
  ) p
  JOIN (SELECT id, COUNT(*) AS sz FROM sh GROUP BY id) sa ON p.id_a = sa.id
  JOIN (SELECT id, COUNT(*) AS sz FROM sh GROUP BY id) sb ON p.id_b = sb.id
  WHERE p.n_common / CAST(sa.sz + sb.sz - p.n_common AS DOUBLE) >= 0.4
),
rec AS (
  SELECT COALESCE(ROUND(AVG(CASE WHEN v.id_a IS NOT NULL THEN 1 ELSE 0 END), 4),
                  1.0) AS recall_vs_exact
  FROM jpairs j
  LEFT JOIN verified v ON j.id_a = v.id_a AND j.id_b = v.id_b
)
SELECT v.id_a, v.id_b, v.est_jaccard, r.recall_vs_exact
FROM verified v, rec r
"""


@register("dedup_minhash_lsh", _MINHASH_ORACLE, doc="MinHash+LSH near-dup pairs, FULL oracle (portable md5 permutations) + recall audit")
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-perm MinHash, 8 bands × 4 rows → candidates → estimate-verify.
    FULLY oracle-checked since round 7: the permutation hash moved to
    md5 hex slices and the band key to a delimited concat (both
    engine-portable; operators/dedup.minhash_signatures), so the
    DuckDB twin replays signatures, banding, candidate join, and the
    estimate-verify filter value-for-value. Also SELF-EVALUATING
    (VERDICT r2 #8, same pattern as
    sim_ivf_quantized_topk): every output row carries
    ``recall_vs_exact`` — the fraction of exact-Jaccard pairs at the
    same threshold that the banded candidates recovered — so the driver
    records evidence, not just rows. The exact-Jaccard audit is GATED
    by ``plans.audit.audit_scale_ok`` (corpus ≤ AUDIT_MAX_ROWS; NULL
    above it — r6 advice closed the same way as dedup_simhash);
    production scale relies on the banding math (P(miss) =
    (1-t^rows)^bands per pair). tests/test_dedup.py bounds the same
    recall."""
    docs = load_table(spark, sf_dir, "documents")
    do_audit = audit_scale_ok(docs)
    # the banded MinHash chain and the exact-Jaccard audit chain are
    # independent until the recall join — overlap them (guide §2.6):
    # same DataFrames, interleaved jobs, identical values
    pairs, exact = overlap(
        lambda: minhash_near_dup_pairs(
            docs, "text", "doc_id", n=3, num_perm=32, bands=8, threshold=0.4
        ),
        lambda: (
            jaccard_pairs_exact(docs, "text", "doc_id", n=3, threshold=0.4)
            if do_audit
            else None
        ),
    )
    if do_audit:
        hit = pairs.select("id_a", "id_b").withColumn("__hit", F.lit(1))
        rec = (
            exact.select("id_a", "id_b")
            .join(hit, ["id_a", "id_b"], "left")
            .agg(
                F.round(F.avg(F.coalesce(F.col("__hit"), F.lit(0))), 4).alias(
                    "r"
                )
            )
            .first()["r"]
        )
        recall_col = F.lit(float(rec if rec is not None else 1.0))
    else:
        recall_col = F.lit(None).cast("double")
    return pairs.withColumn("recall_vs_exact", recall_col).orderBy(
        "id_a", "id_b"
    )


# ---------------------------------------------------------------------------
# connected components over the near-dup pair graph (group collapse)
# ---------------------------------------------------------------------------

_CC_ORACLE = f"""
WITH RECURSIVE jp AS ({_JACCARD_ORACLE}),
edges AS (
  SELECT id_a AS u, id_b AS v FROM jp
  UNION
  SELECT id_b AS u, id_a AS v FROM jp
),
reach(src, dst) AS (
  SELECT u, u FROM edges
  UNION
  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
)
SELECT CAST(src AS BIGINT) AS doc_id, CAST(MIN(dst) AS BIGINT) AS component
FROM reach GROUP BY src
"""


@register(
    "dedup_connected_components",
    _CC_ORACLE,
    doc="near-dup group collapse: connected components via min-label propagation",
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A~B, B~C must collapse to one group even though A~C was never
    emitted — the final stage of every near-dedup pipeline. Iterative
    min-label propagation (one shuffle per round, localCheckpoint
    lineage truncation); oracle is a recursive CTE over the same exact-
    Jaccard pair graph. The same operator collapses MinHash, SimHash,
    or embedding-cosine pair lists."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs_exact(docs, "text", "doc_id", n=3, threshold=0.2)
    cc = connected_components(pairs)
    return cc.select(
        F.col("id").cast("long").alias("doc_id"), F.col("component").cast("long")
    )


@register(
    "dedup_connected_components_dist",
    _CC_ORACLE,
    doc="connected components, DISTRIBUTED min-label propagation path forced (driver_threshold=0)",
)
def dedup_connected_components_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same collapse with the driver union-find DISABLED
    (``driver_threshold=0``), forcing the iterative min-label
    propagation the 100 TB story rests on (VERDICT r2 #4): doubled
    edge list → per-round neighbor-min join + groupBy, two hops per
    localCheckpoint, convergence by changed-label count. Identical
    labels to the driver path — both are checked against the same
    recursive-CTE oracle, so the equivalence is driver-verified, not
    just pytested."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs_exact(docs, "text", "doc_id", n=3, threshold=0.2)
    cc = connected_components(pairs, driver_threshold=0)
    return cc.select(
        F.col("id").cast("long").alias("doc_id"), F.col("component").cast("long")
    )


# ---------------------------------------------------------------------------
# end-to-end dedup: pairs → components → surviving corpus
# ---------------------------------------------------------------------------

_SURVIVORS_ORACLE = f"""
WITH RECURSIVE jp AS ({_JACCARD_ORACLE}),
edges AS (
  SELECT id_a AS u, id_b AS v FROM jp
  UNION
  SELECT id_b AS u, id_a AS v FROM jp
),
reach(src, dst) AS (
  SELECT u, u FROM edges
  UNION
  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
),
cc AS (SELECT src AS doc_id, MIN(dst) AS component FROM reach GROUP BY src),
dropped AS (SELECT doc_id FROM cc WHERE doc_id != component)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM dropped)
"""


@register(
    "dedup_pipeline_survivors",
    _SURVIVORS_ORACLE,
    doc="end-to-end near-dedup: pair graph → components → surviving corpus",
)
def dedup_pipeline_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data dedup pipeline in one query: exact
    Jaccard pair graph → connected components → keep the min-id doc of
    each near-dup group plus every unpaired doc. The final keep-step is
    a broadcast LEFT ANTI join of the (tiny) dropped-id set against the
    corpus — the corpus never shuffles. Swapping the pair stage for
    MinHash/SimHash/cosine changes nothing downstream."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs_exact(docs, "text", "doc_id", n=3, threshold=0.2)
    cc = connected_components(pairs)
    dropped = cc.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    return docs.join(F.broadcast(dropped), "doc_id", "left_anti").select(
        "doc_id", "lang", "n_chars"
    )


_SIMHASH_ORACLE = """
WITH toks AS (
  SELECT doc_id AS id, UNNEST(string_split_regex(text, '\\s+')) AS tok
  FROM documents
),
th AS (
  SELECT id, md5(tok) AS m, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks GROUP BY id, md5(tok)
),
hh AS (
  SELECT id, cnt,
         CAST(concat('0x', substr(m, 1, 8)) AS BIGINT) AS hi,
         CAST(concat('0x', substr(m, 9, 8)) AS BIGINT) AS lo
  FROM th
),
votes AS (
  SELECT id, SUM(cnt) AS t,
         SUM(cnt * ((lo >> 0) & 1)) AS s0,
         SUM(cnt * ((lo >> 1) & 1)) AS s1,
         SUM(cnt * ((lo >> 2) & 1)) AS s2,
         SUM(cnt * ((lo >> 3) & 1)) AS s3,
         SUM(cnt * ((lo >> 4) & 1)) AS s4,
         SUM(cnt * ((lo >> 5) & 1)) AS s5,
         SUM(cnt * ((lo >> 6) & 1)) AS s6,
         SUM(cnt * ((lo >> 7) & 1)) AS s7,
         SUM(cnt * ((lo >> 8) & 1)) AS s8,
         SUM(cnt * ((lo >> 9) & 1)) AS s9,
         SUM(cnt * ((lo >> 10) & 1)) AS s10,
         SUM(cnt * ((lo >> 11) & 1)) AS s11,
         SUM(cnt * ((lo >> 12) & 1)) AS s12,
         SUM(cnt * ((lo >> 13) & 1)) AS s13,
         SUM(cnt * ((lo >> 14) & 1)) AS s14,
         SUM(cnt * ((lo >> 15) & 1)) AS s15,
         SUM(cnt * ((lo >> 16) & 1)) AS s16,
         SUM(cnt * ((lo >> 17) & 1)) AS s17,
         SUM(cnt * ((lo >> 18) & 1)) AS s18,
         SUM(cnt * ((lo >> 19) & 1)) AS s19,
         SUM(cnt * ((lo >> 20) & 1)) AS s20,
         SUM(cnt * ((lo >> 21) & 1)) AS s21,
         SUM(cnt * ((lo >> 22) & 1)) AS s22,
         SUM(cnt * ((lo >> 23) & 1)) AS s23,
         SUM(cnt * ((lo >> 24) & 1)) AS s24,
         SUM(cnt * ((lo >> 25) & 1)) AS s25,
         SUM(cnt * ((lo >> 26) & 1)) AS s26,
         SUM(cnt * ((lo >> 27) & 1)) AS s27,
         SUM(cnt * ((lo >> 28) & 1)) AS s28,
         SUM(cnt * ((lo >> 29) & 1)) AS s29,
         SUM(cnt * ((lo >> 30) & 1)) AS s30,
         SUM(cnt * ((lo >> 31) & 1)) AS s31,
         SUM(cnt * ((hi >> 0) & 1)) AS s32,
         SUM(cnt * ((hi >> 1) & 1)) AS s33,
         SUM(cnt * ((hi >> 2) & 1)) AS s34,
         SUM(cnt * ((hi >> 3) & 1)) AS s35,
         SUM(cnt * ((hi >> 4) & 1)) AS s36,
         SUM(cnt * ((hi >> 5) & 1)) AS s37,
         SUM(cnt * ((hi >> 6) & 1)) AS s38,
         SUM(cnt * ((hi >> 7) & 1)) AS s39,
         SUM(cnt * ((hi >> 8) & 1)) AS s40,
         SUM(cnt * ((hi >> 9) & 1)) AS s41,
         SUM(cnt * ((hi >> 10) & 1)) AS s42,
         SUM(cnt * ((hi >> 11) & 1)) AS s43,
         SUM(cnt * ((hi >> 12) & 1)) AS s44,
         SUM(cnt * ((hi >> 13) & 1)) AS s45,
         SUM(cnt * ((hi >> 14) & 1)) AS s46,
         SUM(cnt * ((hi >> 15) & 1)) AS s47,
         SUM(cnt * ((hi >> 16) & 1)) AS s48,
         SUM(cnt * ((hi >> 17) & 1)) AS s49,
         SUM(cnt * ((hi >> 18) & 1)) AS s50,
         SUM(cnt * ((hi >> 19) & 1)) AS s51,
         SUM(cnt * ((hi >> 20) & 1)) AS s52,
         SUM(cnt * ((hi >> 21) & 1)) AS s53,
         SUM(cnt * ((hi >> 22) & 1)) AS s54,
         SUM(cnt * ((hi >> 23) & 1)) AS s55,
         SUM(cnt * ((hi >> 24) & 1)) AS s56,
         SUM(cnt * ((hi >> 25) & 1)) AS s57,
         SUM(cnt * ((hi >> 26) & 1)) AS s58,
         SUM(cnt * ((hi >> 27) & 1)) AS s59,
         SUM(cnt * ((hi >> 28) & 1)) AS s60,
         SUM(cnt * ((hi >> 29) & 1)) AS s61,
         SUM(cnt * ((hi >> 30) & 1)) AS s62,
         SUM(cnt * ((hi >> 31) & 1)) AS s63
  FROM hh GROUP BY id
),
sig AS (
  SELECT id,
         (CAST(CASE WHEN 2*s0 > t THEN 1 ELSE 0 END AS BIGINT) << 0) + (CAST(CASE WHEN 2*s1 > t THEN 1 ELSE 0 END AS BIGINT) << 1) + (CAST(CASE WHEN 2*s2 > t THEN 1 ELSE 0 END AS BIGINT) << 2) + (CAST(CASE WHEN 2*s3 > t THEN 1 ELSE 0 END AS BIGINT) << 3) + (CAST(CASE WHEN 2*s4 > t THEN 1 ELSE 0 END AS BIGINT) << 4) + (CAST(CASE WHEN 2*s5 > t THEN 1 ELSE 0 END AS BIGINT) << 5) + (CAST(CASE WHEN 2*s6 > t THEN 1 ELSE 0 END AS BIGINT) << 6) + (CAST(CASE WHEN 2*s7 > t THEN 1 ELSE 0 END AS BIGINT) << 7) + (CAST(CASE WHEN 2*s8 > t THEN 1 ELSE 0 END AS BIGINT) << 8) + (CAST(CASE WHEN 2*s9 > t THEN 1 ELSE 0 END AS BIGINT) << 9) + (CAST(CASE WHEN 2*s10 > t THEN 1 ELSE 0 END AS BIGINT) << 10) + (CAST(CASE WHEN 2*s11 > t THEN 1 ELSE 0 END AS BIGINT) << 11) + (CAST(CASE WHEN 2*s12 > t THEN 1 ELSE 0 END AS BIGINT) << 12) + (CAST(CASE WHEN 2*s13 > t THEN 1 ELSE 0 END AS BIGINT) << 13) + (CAST(CASE WHEN 2*s14 > t THEN 1 ELSE 0 END AS BIGINT) << 14) + (CAST(CASE WHEN 2*s15 > t THEN 1 ELSE 0 END AS BIGINT) << 15) + (CAST(CASE WHEN 2*s16 > t THEN 1 ELSE 0 END AS BIGINT) << 16) + (CAST(CASE WHEN 2*s17 > t THEN 1 ELSE 0 END AS BIGINT) << 17) + (CAST(CASE WHEN 2*s18 > t THEN 1 ELSE 0 END AS BIGINT) << 18) + (CAST(CASE WHEN 2*s19 > t THEN 1 ELSE 0 END AS BIGINT) << 19) + (CAST(CASE WHEN 2*s20 > t THEN 1 ELSE 0 END AS BIGINT) << 20) + (CAST(CASE WHEN 2*s21 > t THEN 1 ELSE 0 END AS BIGINT) << 21) + (CAST(CASE WHEN 2*s22 > t THEN 1 ELSE 0 END AS BIGINT) << 22) + (CAST(CASE WHEN 2*s23 > t THEN 1 ELSE 0 END AS BIGINT) << 23) + (CAST(CASE WHEN 2*s24 > t THEN 1 ELSE 0 END AS BIGINT) << 24) + (CAST(CASE WHEN 2*s25 > t THEN 1 ELSE 0 END AS BIGINT) << 25) + (CAST(CASE WHEN 2*s26 > t THEN 1 ELSE 0 END AS BIGINT) << 26) + (CAST(CASE WHEN 2*s27 > t THEN 1 ELSE 0 END AS BIGINT) << 27) + (CAST(CASE WHEN 2*s28 > t THEN 1 ELSE 0 END AS BIGINT) << 28) + (CAST(CASE WHEN 2*s29 > t THEN 1 ELSE 0 END AS BIGINT) << 29) + (CAST(CASE WHEN 2*s30 > t THEN 1 ELSE 0 END AS BIGINT) << 30) + (CAST(CASE WHEN 2*s31 > t THEN 1 ELSE 0 END AS BIGINT) << 31) AS lo,
         (CAST(CASE WHEN 2*s32 > t THEN 1 ELSE 0 END AS BIGINT) << 0) + (CAST(CASE WHEN 2*s33 > t THEN 1 ELSE 0 END AS BIGINT) << 1) + (CAST(CASE WHEN 2*s34 > t THEN 1 ELSE 0 END AS BIGINT) << 2) + (CAST(CASE WHEN 2*s35 > t THEN 1 ELSE 0 END AS BIGINT) << 3) + (CAST(CASE WHEN 2*s36 > t THEN 1 ELSE 0 END AS BIGINT) << 4) + (CAST(CASE WHEN 2*s37 > t THEN 1 ELSE 0 END AS BIGINT) << 5) + (CAST(CASE WHEN 2*s38 > t THEN 1 ELSE 0 END AS BIGINT) << 6) + (CAST(CASE WHEN 2*s39 > t THEN 1 ELSE 0 END AS BIGINT) << 7) + (CAST(CASE WHEN 2*s40 > t THEN 1 ELSE 0 END AS BIGINT) << 8) + (CAST(CASE WHEN 2*s41 > t THEN 1 ELSE 0 END AS BIGINT) << 9) + (CAST(CASE WHEN 2*s42 > t THEN 1 ELSE 0 END AS BIGINT) << 10) + (CAST(CASE WHEN 2*s43 > t THEN 1 ELSE 0 END AS BIGINT) << 11) + (CAST(CASE WHEN 2*s44 > t THEN 1 ELSE 0 END AS BIGINT) << 12) + (CAST(CASE WHEN 2*s45 > t THEN 1 ELSE 0 END AS BIGINT) << 13) + (CAST(CASE WHEN 2*s46 > t THEN 1 ELSE 0 END AS BIGINT) << 14) + (CAST(CASE WHEN 2*s47 > t THEN 1 ELSE 0 END AS BIGINT) << 15) + (CAST(CASE WHEN 2*s48 > t THEN 1 ELSE 0 END AS BIGINT) << 16) + (CAST(CASE WHEN 2*s49 > t THEN 1 ELSE 0 END AS BIGINT) << 17) + (CAST(CASE WHEN 2*s50 > t THEN 1 ELSE 0 END AS BIGINT) << 18) + (CAST(CASE WHEN 2*s51 > t THEN 1 ELSE 0 END AS BIGINT) << 19) + (CAST(CASE WHEN 2*s52 > t THEN 1 ELSE 0 END AS BIGINT) << 20) + (CAST(CASE WHEN 2*s53 > t THEN 1 ELSE 0 END AS BIGINT) << 21) + (CAST(CASE WHEN 2*s54 > t THEN 1 ELSE 0 END AS BIGINT) << 22) + (CAST(CASE WHEN 2*s55 > t THEN 1 ELSE 0 END AS BIGINT) << 23) + (CAST(CASE WHEN 2*s56 > t THEN 1 ELSE 0 END AS BIGINT) << 24) + (CAST(CASE WHEN 2*s57 > t THEN 1 ELSE 0 END AS BIGINT) << 25) + (CAST(CASE WHEN 2*s58 > t THEN 1 ELSE 0 END AS BIGINT) << 26) + (CAST(CASE WHEN 2*s59 > t THEN 1 ELSE 0 END AS BIGINT) << 27) + (CAST(CASE WHEN 2*s60 > t THEN 1 ELSE 0 END AS BIGINT) << 28) + (CAST(CASE WHEN 2*s61 > t THEN 1 ELSE 0 END AS BIGINT) << 29) + (CAST(CASE WHEN 2*s62 > t THEN 1 ELSE 0 END AS BIGINT) << 30) + (CAST(CASE WHEN 2*s63 > t THEN 1 ELSE 0 END AS BIGINT) << 31) AS hi
  FROM votes
),
bands AS (
  SELECT id, lo, hi, b.band,
         CASE b.band WHEN 0 THEN lo & 65535
                     WHEN 1 THEN (lo >> 16) & 65535
                     WHEN 2 THEN hi & 65535
                     ELSE (hi >> 16) & 65535 END AS key
  FROM sig, (SELECT UNNEST([0, 1, 2, 3]) AS band) b
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         a.lo AS alo, a.hi AS ahi, b.lo AS blo, b.hi AS bhi
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.id < b.id
),
pairs AS (
  SELECT id_a, id_b,
         CAST(bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) AS INTEGER)
           AS hamming
  FROM cand
  WHERE bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) <= 3
),
exact AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs_exact
  FROM sig a JOIN sig b ON a.id < b.id
  WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3
),
banded AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs_banded FROM pairs)
SELECT p.id_a, p.id_b, p.hamming, bn.n_pairs_banded, ex.n_pairs_exact,
       bn.n_pairs_banded = ex.n_pairs_exact AS audit_recall_exact
FROM pairs p, banded bn, exact ex
"""


@register("dedup_simhash", _SIMHASH_ORACLE, doc="SimHash Hamming<=3 near-dup pairs, FULL oracle (portable md5 token hash)")
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash with pigeonhole banding; verify via bit_count(xor).
    FULLY oracle-checked since round 7: the token hash moved to md5
    hex slices (engine-portable; operators/dedup.simhash64), so the
    DuckDB twin replays the whole signature pipeline — bit votes,
    sign test, 16-bit banding, Hamming verify — as two 32-bit halves
    (a 64-bit signature literal would trip DuckDB's checked shifts).
    Since round 6 the result also carries the estimate-verify audit:
    the EXACT
    all-pairs Hamming≤3 relation over the (once-computed) signatures
    must equal the banded result pair-for-pair in count
    (``audit_recall_exact``; pigeonhole makes less a hard bug at
    hamming ≤ bands-1).  The all-pairs relation is GATED by
    ``plans.audit.audit_scale_ok`` (corpus ≤ AUDIT_MAX_ROWS): above
    the bound the audit columns come back NULL and only the banded
    join runs, so the query's asymptotics match the 100 TB story the
    docstring tells (r6 advice)."""
    from web_attack_detection_spark.operators.dedup import simhash64

    docs = load_table(spark, sf_dir, "documents")
    sig = simhash64(docs, "text", "doc_id").localCheckpoint()
    pairs = simhash_near_dup_pairs(
        docs, "text", "doc_id", max_hamming=3, bands=4, sig_df=sig
    )
    banded_n = pairs.agg(F.count(F.lit(1)).alias("n_pairs_banded"))
    if audit_scale_ok(sig):
        exact = (
            sig.select(F.col("id").alias("ia"), F.col("simhash").alias("sa"))
            .join(
                sig.select(F.col("id").alias("ib"), F.col("simhash").alias("sb")),
                F.col("ia") < F.col("ib"),
            )
            .filter(F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))) <= F.lit(3))
            .agg(F.count(F.lit(1)).alias("n_pairs_exact"))
        )
        audit = banded_n.crossJoin(F.broadcast(exact)).withColumn(
            "audit_recall_exact", F.col("n_pairs_banded") == F.col("n_pairs_exact")
        )
    else:
        audit = banded_n.select(
            "n_pairs_banded",
            F.lit(None).cast("long").alias("n_pairs_exact"),
            F.lit(None).cast("boolean").alias("audit_recall_exact"),
        )
    return pairs.crossJoin(F.broadcast(audit)).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# shingle containment (asymmetric near-dup: quote / subset detection)
# ---------------------------------------------------------------------------

_CONTAINMENT_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
  FROM toks, UNNEST(range(1, greatest(len(t) - 2, 1) + 1)) AS r(i)
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id != b.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id)
SELECT id_a, id_b,
       ROUND(n_common / CAST(sa.sz AS DOUBLE), 6) AS containment
FROM pairs JOIN sizes sa ON id_a = sa.doc_id
WHERE n_common / CAST(sa.sz AS DOUBLE) >= 0.4
"""


@register(
    "dedup_containment",
    _CONTAINMENT_ORACLE,
    doc="asymmetric shingle containment pairs (|A∩B|/|A| ≥ 0.4)",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup: C(A→B) = |A∩B|/|A| flags a document mostly
    CONTAINED in another (quotes, boilerplate-wrapped copies) that
    symmetric Jaccard under-scores — the dedup direction that keeps
    the superset doc. Same inverted-index join as dedup_ngram_jaccard;
    both directions evaluated, threshold keeps the contained side."""
    from web_attack_detection_spark.operators.dedup import containment_pairs_exact

    docs = load_table(spark, sf_dir, "documents")
    return containment_pairs_exact(docs, "text", "doc_id", n=3, threshold=0.4)


# ---------------------------------------------------------------------------
# incremental ingest: dedup a NEW batch against the existing corpus
# ---------------------------------------------------------------------------

_INCR_ORACLE = """
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0
),
batch AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 400000 AS doc_id, text FROM documents WHERE doc_id % 20 = 1
),
exact_hit AS (
  SELECT DISTINCT b.doc_id FROM batch b JOIN corpus c ON b.text = c.text
),
b_tok AS (SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM batch),
c_tok AS (SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM corpus),
b_sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
  FROM b_tok, UNNEST(range(1, greatest(len(t) - 2, 1) + 1)) AS r(i)
),
c_sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
  FROM c_tok, UNNEST(range(1, greatest(len(t) - 2, 1) + 1)) AS r(i)
),
b_sz AS (SELECT doc_id, COUNT(*) AS sz FROM b_sh GROUP BY doc_id),
c_sz AS (SELECT doc_id, COUNT(*) AS sz FROM c_sh GROUP BY doc_id),
pair_common AS (
  SELECT b_sh.doc_id AS b_id, c_sh.doc_id AS c_id, COUNT(*) AS n_common
  FROM b_sh JOIN c_sh USING (shingle)
  GROUP BY 1, 2
),
near AS (
  SELECT b_id, COUNT(*) AS n_near
  FROM pair_common
  JOIN b_sz ON b_id = b_sz.doc_id
  JOIN c_sz ON c_id = c_sz.doc_id
  WHERE n_common / CAST(b_sz.sz + c_sz.sz - n_common AS DOUBLE) >= 0.5
  GROUP BY b_id
)
SELECT b.doc_id,
       (e.doc_id IS NOT NULL) AS exact_dup,
       CAST(COALESCE(n.n_near, 0) AS BIGINT) AS n_near_dups,
       (e.doc_id IS NULL AND n.b_id IS NULL) AS kept
FROM batch b
LEFT JOIN exact_hit e ON b.doc_id = e.doc_id
LEFT JOIN near n ON b.doc_id = n.b_id
"""


@register(
    "dedup_incremental_ingest",
    _INCR_ORACLE,
    doc="incremental ingest dedup: new batch vs indexed corpus (exact + near tiers)",
)
def dedup_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The daily-crawl shape: an incoming batch is deduped against the
    EXISTING corpus, never corpus-against-corpus — the work is
    |batch| x selectivity, not |corpus|², which is what makes rolling
    ingestion tractable at 100 TB (the corpus side is pre-shingled /
    pre-signatured in a real deployment; here it is derived in-query so
    the oracle can reproduce it).

    Asymmetric join strategy: the BATCH is the small side, so its
    shingle set is broadcast and the corpus is map-scanned once —
    opposite of the self-join dedup operators above. Planted hazards:
    every 20th-ish corpus doc re-arrives in the batch under a shifted
    id (exact tier must flag it); organic near-dups at 3-gram
    Jaccard ≥ 0.5 are counted per batch doc. ``kept`` marks what an
    append pipeline would actually commit.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = union_by_name(
        docs.filter(F.col("doc_id") % 5 == 0),
        docs.filter(F.col("doc_id") % 20 == 1).select(
            (F.col("doc_id") + 400000).alias("doc_id"), "text"
        ),
    )
    exact_hit = (
        batch.join(corpus.select("text"), "text").select("doc_id").distinct()
        .withColumn("exact", F.lit(True))
    )
    from web_attack_detection_spark.operators.dedup import shingles

    b_sh = shingles(batch, "text", "doc_id", n=3).withColumnsRenamed(
        {"id": "b_id"}
    )
    c_sh = shingles(corpus, "text", "doc_id", n=3).withColumnsRenamed(
        {"id": "c_id"}
    )
    b_sz = b_sh.groupBy("b_id").agg(F.count(F.lit(1)).alias("b_sz"))
    c_sz = c_sh.groupBy("c_id").agg(F.count(F.lit(1)).alias("c_sz"))
    common = (
        F.broadcast(b_sh)
        .join(c_sh, "shingle")
        .groupBy("b_id", "c_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    near = (
        common.join(F.broadcast(b_sz), "b_id")
        .join(c_sz, "c_id")
        .filter(
            F.col("n_common")
            / (F.col("b_sz") + F.col("c_sz") - F.col("n_common")).cast("double")
            >= 0.5
        )
        .groupBy("b_id")
        .agg(F.count(F.lit(1)).alias("n_near"))
    )
    return (
        batch.join(F.broadcast(exact_hit), "doc_id", "left")
        .join(F.broadcast(near.withColumnRenamed("b_id", "doc_id")), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("exact"), F.lit(False)).alias("exact_dup"),
            F.coalesce(F.col("n_near"), F.lit(0)).cast("long").alias("n_near_dups"),
            (F.col("exact").isNull() & F.col("n_near").isNull()).alias("kept"),
        )
    )


# ---------------------------------------------------------------------------
# incremental ingest against a PERSISTENT stored index (VERDICT r3 #6)
# ---------------------------------------------------------------------------

_CORPUS_INDEX: dict[tuple, tuple[str, str]] = {}


def _corpus_index(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """The persistent dedup index: the existing corpus pre-shingled and
    LANDED as bucketed catalog tables — the real 100 TB deployment
    shape, where the corpus side of every incremental dedup is already
    on disk in join-ready layout and is NEVER recomputed per batch:

    - ``docsh_idx`` (c_id, shingle, c_sz): the inverted shingle index,
      bucketed on ``shingle``. ``c_sz`` (the doc's shingle count) is
      denormalized onto each row so the Jaccard denominator needs no
      second index join.
    - ``doctext_idx`` (text): the exact-dup tier, bucketed on ``text``.

    Against a SMALL incoming batch the dedup joins broadcast the batch
    and stream the index map-only — zero index-side Exchange (asserted
    in tests/test_explain.py). The bucketed layout is what keeps the
    shuffle off the index for the remaining lifecycle too: merging a
    committed batch back in, compacting, or index-vs-index dedup all
    join/group on the bucket key straight off storage. Cached per
    (sf_dir, corpus row count); content-keyed stable names
    overwritten in place via io/sinks.stable_bucketed_table (ADVICE r3/r4)."""
    from web_attack_detection_spark.io.sinks import stable_bucketed_table
    from web_attack_detection_spark.operators.dedup import shingles

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    key = (sf_dir, corpus.count())
    cached = _CORPUS_INDEX.get(key)
    if cached is not None:
        return cached
    c_sh = shingles(corpus, "text", "doc_id", n=3).withColumnsRenamed({"id": "c_id"})
    c_idx = c_sh.join(
        c_sh.groupBy("c_id").agg(F.count(F.lit(1)).alias("c_sz")), "c_id"
    )
    ck = f"{sf_dir}|{key[1]}"
    sh_name = stable_bucketed_table(spark, c_idx, "docsh_idx", ck, "shingle")
    tx_name = stable_bucketed_table(
        spark, corpus.select("text"), "doctext_idx", ck, "text"
    )
    _CORPUS_INDEX[key] = (sh_name, tx_name)
    return _CORPUS_INDEX[key]


@register(
    "dedup_incremental_indexed",
    _INCR_ORACLE,
    doc="incremental ingest dedup against a STORED bucketed shingle index",
)
def dedup_incremental_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dedup_incremental_ingest`` semantics against the PERSISTENT
    index (``_corpus_index``): identical result set — the same DuckDB
    oracle checks both — but the corpus side is read from the stored
    bucketed tables instead of being re-shingled in-query. Per batch,
    the work is ONE map-only scan of each index table (the batch side
    broadcasts; no Exchange touches index rows — plan-asserted in
    tests/test_explain.py) plus a candidate-level aggregation whose
    volume is |matches|, not |corpus|. This is the dedup deployment
    shape at 100 TB: signatures/shingles computed once at ingest,
    every subsequent batch priced by its own size."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sh_name, tx_name = _corpus_index(spark, sf_dir)
    batch = union_by_name(
        docs.filter(F.col("doc_id") % 5 == 0),
        docs.filter(F.col("doc_id") % 20 == 1).select(
            (F.col("doc_id") + 400000).alias("doc_id"), "text"
        ),
    )
    return _dedup_against_index(spark, batch, sh_name, tx_name)


def _dedup_against_index(
    spark: SparkSession, batch: DataFrame, sh_name: str, tx_name: str
) -> DataFrame:
    """Probe a small incoming batch against a stored bucketed shingle
    index: broadcast the batch, stream the index map-only (no Exchange
    touches index rows — plan-asserted), aggregate candidates at
    |matches| volume. Shared by the ingest and post-merge queries."""
    stored_sh = spark.table(sh_name)
    stored_tx = spark.table(tx_name)

    exact_hit = (
        F.broadcast(batch)
        .join(stored_tx, "text")
        .select("doc_id")
        .distinct()
        .withColumn("exact", F.lit(True))
    )
    from web_attack_detection_spark.operators.dedup import shingles

    b_sh = shingles(batch, "text", "doc_id", n=3).withColumnsRenamed({"id": "b_id"})
    b_sz = b_sh.groupBy("b_id").agg(F.count(F.lit(1)).alias("b_sz"))
    near = (
        F.broadcast(b_sh)
        .join(stored_sh, "shingle")
        .groupBy("b_id", "c_id", "c_sz")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .join(F.broadcast(b_sz), "b_id")
        .filter(
            F.col("n_common")
            / (F.col("b_sz") + F.col("c_sz") - F.col("n_common")).cast("double")
            >= 0.5
        )
        .groupBy("b_id")
        .agg(F.count(F.lit(1)).alias("n_near"))
    )
    return (
        batch.join(F.broadcast(exact_hit), "doc_id", "left")
        .join(F.broadcast(near.withColumnRenamed("b_id", "doc_id")), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("exact"), F.lit(False)).alias("exact_dup"),
            F.coalesce(F.col("n_near"), F.lit(0)).cast("long").alias("n_near_dups"),
            (F.col("exact").isNull() & F.col("n_near").isNull()).alias("kept"),
        )
    )


# ---------------------------------------------------------------------------
# dedup report: cluster-size distribution + reduction accounting
# ---------------------------------------------------------------------------

_CLUSTER_STATS_ORACLE = f"""
WITH RECURSIVE jp AS ({_JACCARD_ORACLE}),
edges AS (
  SELECT id_a AS u, id_b AS v FROM jp
  UNION
  SELECT id_b AS u, id_a AS v FROM jp
),
reach(src, dst) AS (
  SELECT u, u FROM edges
  UNION
  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
),
comp AS (
  SELECT src AS doc_id, MIN(dst) AS component FROM reach GROUP BY src
),
sizes AS (
  SELECT component, CAST(COUNT(*) AS BIGINT) AS cluster_size FROM comp GROUP BY component
)
SELECT cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(cluster_size) AS BIGINT) AS n_docs,
       CAST(SUM(cluster_size - 1) AS BIGINT) AS n_removable
FROM sizes GROUP BY cluster_size
"""


@register(
    "dedup_cluster_stats",
    _CLUSTER_STATS_ORACLE,
    doc="dedup report: near-dup cluster-size histogram + removable-doc accounting",
)
def dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The report a dedup run ships: how many clusters of each size the
    pair graph collapses into, how many documents they cover, and the
    dedup dividend (size−1 removable docs per cluster, the number an
    end-to-end pipeline like dedup_pipeline_survivors actually drops).
    Two tiny aggregates on top of connected components — the histogram
    is O(distinct sizes) rows however large the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs_exact(docs, "text", "doc_id", n=3, threshold=0.2)
    cc = connected_components(pairs)
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("cluster_size").alias("n_docs"),
        F.sum(F.col("cluster_size") - 1).alias("n_removable"),
    )


# ---------------------------------------------------------------------------
# dedup threshold tuning curve (one scan, integer-exact threshold tests)
# ---------------------------------------------------------------------------

_THRESHOLD_CURVE_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
  FROM toks, UNNEST(range(1, greatest(len(t) - 2, 1) + 1)) AS r(i)
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
scored AS (
  SELECT p.id_a, p.id_b, p.n_common,
         sa.sz + sb.sz - p.n_common AS uni
  FROM pairs p
  JOIN sizes sa ON p.id_a = sa.doc_id
  JOIN sizes sb ON p.id_b = sb.doc_id
),
thr AS (SELECT UNNEST([20, 30, 40, 50, 60, 70, 80, 90]) AS pct),
hits AS (
  SELECT t.pct, s.id_a, s.id_b
  FROM scored s JOIN thr t ON s.n_common * 100 >= t.pct * s.uni
),
members AS (
  SELECT pct, id_a AS d FROM hits UNION ALL SELECT pct, id_b FROM hits
)
SELECT t.pct AS threshold_pct,
       CAST(COALESCE(h.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(COALESCE(m.n_docs, 0) AS BIGINT) AS n_docs_affected
FROM thr t
LEFT JOIN (SELECT pct, COUNT(*) AS n_pairs FROM hits GROUP BY pct) h ON h.pct = t.pct
LEFT JOIN (SELECT pct, COUNT(DISTINCT d) AS n_docs FROM members GROUP BY pct) m ON m.pct = t.pct
"""


@register(
    "dedup_threshold_curve",
    _THRESHOLD_CURVE_ORACLE,
    doc="dedup tuning curve: pair/doc counts per Jaccard threshold, one scan",
)
def dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The question every dedup deployment starts with — 'how much
    does each threshold remove?' — answered in ONE pass instead of
    re-running the pipeline per candidate threshold: compute the
    exact pair relation once (same inverted-index shape as
    dedup_ngram_jaccard), then test all 8 thresholds with the
    integer cross-multiply n_common*100 >= pct*union — no float
    ratio, so a pair on a threshold boundary classifies identically
    in every engine. Reports pairs and affected-doc counts per
    threshold (the curve a cost/recall tradeoff is read from). Same
    scale properties as the pair relation itself; the threshold
    explosion multiplies only the tiny pair set, never the corpus."""
    from web_attack_detection_spark.operators.dedup import (
        _shingle_pair_counts,
        shingles,
    )

    docs = load_table(spark, sf_dir, "documents")
    sh0 = shingles(parallelize_scan(spark, docs), "text", "doc_id", 3).cache()
    try:
        sizes = sh0.groupBy("id").agg(F.count(F.lit(1)).alias("sz")).localCheckpoint()
        common = _shingle_pair_counts(sh0).localCheckpoint()
    finally:
        sh0.unpersist()
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    scored = (
        common.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .select(
            "id_a",
            "id_b",
            "n_common",
            (F.col("sz_a") + F.col("sz_b") - F.col("n_common")).alias("uni"),
        )
    )
    thr = spark.range(1).select(
        F.explode(F.array(*[F.lit(p) for p in (20, 30, 40, 50, 60, 70, 80, 90)])).alias("pct")
    )
    hits = scored.crossJoin(F.broadcast(thr)).filter(
        F.col("n_common") * 100 >= F.col("pct") * F.col("uni")
    )
    members = hits.select("pct", F.col("id_a").alias("d")).unionAll(
        hits.select("pct", F.col("id_b").alias("d"))
    )
    np_ = hits.groupBy("pct").agg(F.count(F.lit(1)).alias("n_pairs"))
    nd = members.groupBy("pct").agg(F.count_distinct("d").alias("n_docs"))
    return (
        thr.join(np_, "pct", "left")
        .join(nd, "pct", "left")
        .select(
            F.col("pct").cast("long").alias("threshold_pct"),
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs_affected"),
        )
    )


# ---------------------------------------------------------------------------
# index MAINTENANCE: merge a committed batch into the stored index,
# then serve the next batch from the MERGED tables (VERDICT r3 #6's
# remaining lifecycle stage)
# ---------------------------------------------------------------------------

_MERGED_INDEX: dict[tuple, tuple[str, str]] = {}


def _merged_index(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """The compaction step of the persistent-index lifecycle: shingle
    the COMMITTED batch (doc_id % 10 = 5 — previously deduped and
    accepted) in exactly the stored layout, union it with the stored
    index off storage, and land the result as new content-keyed
    bucketed tables. The merge consumes the old index map-only (the
    bucketed layout is preserved by unionByName + re-bucketed write),
    and its cost is |old index| + |delta| — one linear pass, the same
    shape a 100 TB index compaction runs. Cached per (sf_dir,
    committed row count) like ``_corpus_index``."""
    from web_attack_detection_spark.io.sinks import stable_bucketed_table
    from web_attack_detection_spark.operators.dedup import shingles

    sh_name, tx_name = _corpus_index(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    committed = docs.filter(F.col("doc_id") % 10 == 5)
    # cache key folds the CONTENT-KEYED corpus-index table names too
    # (ADVICE r5): a patched loader changing corpus content without
    # changing the committed count must not replay a stale merge
    key = (sf_dir, committed.count(), sh_name, tx_name)
    cached = _MERGED_INDEX.get(key)
    if cached is not None:
        return cached
    a_sh = shingles(committed, "text", "doc_id", n=3).withColumnsRenamed(
        {"id": "c_id"}
    )
    a_idx = a_sh.join(
        a_sh.groupBy("c_id").agg(F.count(F.lit(1)).alias("c_sz")), "c_id"
    )
    merged_sh = spark.table(sh_name).unionByName(
        a_idx.select(spark.table(sh_name).columns)
    )
    merged_tx = spark.table(tx_name).unionByName(committed.select("text"))
    ck = f"{sf_dir}|merged|{key[1]}"
    m_sh = stable_bucketed_table(spark, merged_sh, "docsh_mrg", ck, "shingle")
    m_tx = stable_bucketed_table(spark, merged_tx, "doctext_mrg", ck, "text")
    _MERGED_INDEX[key] = (m_sh, m_tx)
    return _MERGED_INDEX[key]


_MERGE_ORACLE = """
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0
),
batch AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 800000 AS doc_id, text FROM documents WHERE doc_id % 20 = 5
),
exact_hit AS (
  SELECT DISTINCT b.doc_id FROM batch b JOIN corpus c ON b.text = c.text
),
b_tok AS (SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM batch),
c_tok AS (SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM corpus),
b_sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
  FROM b_tok, UNNEST(range(1, greatest(len(t) - 2, 1) + 1)) AS r(i)
),
c_sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
  FROM c_tok, UNNEST(range(1, greatest(len(t) - 2, 1) + 1)) AS r(i)
),
b_sz AS (SELECT doc_id, COUNT(*) AS sz FROM b_sh GROUP BY doc_id),
c_sz AS (SELECT doc_id, COUNT(*) AS sz FROM c_sh GROUP BY doc_id),
pair_common AS (
  SELECT b_sh.doc_id AS b_id, c_sh.doc_id AS c_id, COUNT(*) AS n_common
  FROM b_sh JOIN c_sh USING (shingle)
  GROUP BY 1, 2
),
near AS (
  SELECT b_id, COUNT(*) AS n_near
  FROM pair_common
  JOIN b_sz ON b_id = b_sz.doc_id
  JOIN c_sz ON c_id = c_sz.doc_id
  WHERE n_common / CAST(b_sz.sz + c_sz.sz - n_common AS DOUBLE) >= 0.5
  GROUP BY b_id
)
SELECT b.doc_id,
       (e.doc_id IS NOT NULL) AS exact_dup,
       CAST(COALESCE(n.n_near, 0) AS BIGINT) AS n_near_dups,
       (e.doc_id IS NULL AND n.b_id IS NULL) AS kept
FROM batch b
LEFT JOIN exact_hit e ON b.doc_id = e.doc_id
LEFT JOIN near n ON b.doc_id = n.b_id
"""


@register(
    "dedup_index_merge",
    _MERGE_ORACLE,
    doc="index maintenance: merge a committed batch into the stored index, serve the next batch from the MERGED tables",
)
def dedup_index_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stage that completes the persistent-index lifecycle
    (ingest is ``dedup_incremental_indexed``): a previously-accepted
    batch (doc_id % 10 = 5) is MERGED into the stored bucketed index
    (``_merged_index`` — linear union-and-rewrite in the stored
    layout, the 100 TB compaction shape), and the NEXT batch is
    deduped against the merged tables through the same probe
    (``_dedup_against_index``). The probe batch plants the committed
    docs back under shifted ids, so every planted row is an exact dup
    ONLY IF the merge actually landed — the oracle recomputes the
    whole post-merge corpus from first principles, so a merge that
    dropped or duplicated index rows breaks the hash match."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    m_sh, m_tx = _merged_index(spark, sf_dir)
    batch = union_by_name(
        docs.filter(F.col("doc_id") % 10 == 0),
        docs.filter(F.col("doc_id") % 20 == 5).select(
            (F.col("doc_id") + 800000).alias("doc_id"), "text"
        ),
    )
    return _dedup_against_index(spark, batch, m_sh, m_tx)


# ---------------------------------------------------------------------------
# cross-signal agreement: lexical (3-gram Jaccard) vs embedding
# (cosine) near-dup pairs over the common id range.
# ---------------------------------------------------------------------------


def _cross_signal_oracle() -> str:
    """Composes the two proven pair relations — the exact-Jaccard CTE
    from this module and the unit-normalized cosine fold from
    plans/similarity — into one agreement matrix via FULL OUTER JOIN.
    Both sides are restricted to ids present in BOTH tables (the
    fixtures share an id range only partially at some SFs)."""
    from web_attack_detection_spark.plans.similarity import (
        _SQL_DOT,
        _SQL_UNIT_CTE,
    )

    return f"""
WITH jp AS ({_JACCARD_ORACLE}),
{_SQL_UNIT_CTE.strip()},
ep AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM unit a
  JOIN unit b ON a.vec_id < b.vec_id
  WHERE {_SQL_DOT.format(a='a.u', b='b.u')} >= 0.45
),
common AS (
  SELECT doc_id AS id FROM documents
  INTERSECT
  SELECT vec_id FROM embeddings
),
jc AS (
  SELECT id_a, id_b FROM jp
  WHERE id_a IN (SELECT id FROM common) AND id_b IN (SELECT id FROM common)
),
ec AS (
  SELECT id_a, id_b FROM ep
  WHERE id_a IN (SELECT id FROM common) AND id_b IN (SELECT id FROM common)
),
m AS (
  SELECT COALESCE(j.id_a, e.id_a) AS id_a,
         j.id_a IS NOT NULL AS lex,
         e.id_a IS NOT NULL AS emb
  FROM jc j FULL OUTER JOIN ec e
  ON j.id_a = e.id_a AND j.id_b = e.id_b
)
SELECT CAST(COALESCE(SUM(CASE WHEN lex AND emb THEN 1 END), 0) AS BIGINT) AS n_both,
       CAST(COALESCE(SUM(CASE WHEN lex AND NOT emb THEN 1 END), 0) AS BIGINT) AS n_lexical_only,
       CAST(COALESCE(SUM(CASE WHEN emb AND NOT lex THEN 1 END), 0) AS BIGINT) AS n_embedding_only,
       CAST((SELECT COUNT(*) FROM jc) AS BIGINT) AS n_lexical_total,
       CAST((SELECT COUNT(*) FROM ec) AS BIGINT) AS n_embedding_total
FROM m
"""


@register(
    "dedup_cross_signal_audit",
    _cross_signal_oracle(),
    doc="lexical (3-gram Jaccard) vs embedding (cosine) near-dup pair "
    "agreement matrix, full oracle",
)
def dedup_cross_signal_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The calibration audit run before choosing a dedup signal: how
    much do the lexical (exact 3-gram Jaccard >= 0.2) and semantic
    (embedding cosine >= 0.45) near-dup pair sets agree?  Reports the
    2x2 margin — pairs found by both, by each signal alone, and the
    per-signal totals — over the ids present in BOTH tables.  High
    embedding-only mass means the corpus has rewordings MinHash-class
    dedup misses; high lexical-only mass means the embedding threshold
    is too tight.  Both pair relations are this repo's established
    bit-exact primitives (jaccard_pairs_exact, cosine_pairs_blocked);
    the composition is one FULL OUTER JOIN on the pair key plus exact
    counts, so the whole audit inherits their oracles.

    Scale: both pair stages are oracle-scale ground-truth tools by
    their own docs (at 100 TB each swaps for its LSH/IVF candidate
    variant — dedup_minhash_lsh, sim_knn_graph — without changing this
    composition); the join key is the (id_a, id_b) pair, output is
    near-dup-mass-proportional, and the final aggregate is one row."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    common = (
        docs.select(F.col("doc_id").alias("id"))
        .join(emb.select(F.col("vec_id").alias("id")), "id")
        .localCheckpoint()
    )
    from web_attack_detection_spark.operators.similarity import (
        cosine_pairs_blocked,
    )

    def restrict(p: DataFrame) -> DataFrame:
        return (
            p.join(F.broadcast(common).withColumnRenamed("id", "id_a"), "id_a")
            .join(F.broadcast(common).withColumnRenamed("id", "id_b"), "id_b")
            .select("id_a", "id_b")
        )

    # the two pair chains are independent until the full-outer join, so
    # their eager checkpoints run from two driver threads (guide §2.6 —
    # the lexical shingle chain is the fat one; the embedding kernel's
    # jobs back-fill its idle cores)
    def _lex() -> DataFrame:
        jp = jaccard_pairs_exact(docs, "text", "doc_id", n=3, threshold=0.2)
        return restrict(jp.select("id_a", "id_b")).localCheckpoint()

    def _emb() -> DataFrame:
        ep = cosine_pairs_blocked(emb, threshold=0.45).select("id_a", "id_b")
        return restrict(ep).localCheckpoint()

    jc, ec = overlap(_lex, _emb)
    m = (
        jc.withColumn("lex", F.lit(True))
        .join(ec.withColumn("emb", F.lit(True)), ["id_a", "id_b"], "full_outer")
        .select(
            F.coalesce(F.col("lex"), F.lit(False)).alias("lex"),
            F.coalesce(F.col("emb"), F.lit(False)).alias("emb"),
        )
    )
    counts = m.agg(
        F.coalesce(F.sum(F.when(F.col("lex") & F.col("emb"), 1)), F.lit(0))
        .cast("long")
        .alias("n_both"),
        F.coalesce(F.sum(F.when(F.col("lex") & ~F.col("emb"), 1)), F.lit(0))
        .cast("long")
        .alias("n_lexical_only"),
        F.coalesce(F.sum(F.when(F.col("emb") & ~F.col("lex"), 1)), F.lit(0))
        .cast("long")
        .alias("n_embedding_only"),
    )
    totals = jc.agg(F.count(F.lit(1)).cast("long").alias("n_lexical_total")).crossJoin(
        ec.agg(F.count(F.lit(1)).cast("long").alias("n_embedding_total"))
    )
    return counts.crossJoin(F.broadcast(totals))
