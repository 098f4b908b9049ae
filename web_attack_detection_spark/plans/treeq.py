"""Exact decision-tree training as relational algebra (full oracle).

MLlib's tree family (ml_gbt_train_eval, ml_random_forest_train_eval)
is rows-only — impurity ties and float split midpoints are
implementation-defined.  This module shows the histogram-based split
search every distributed tree trainer actually runs (Spark MLlib,
LightGBM, XGBoost-hist) is EXACTLY expressible: per-(feature, value,
class) counts are one corpus-proportional aggregation; split scores
are prefix sums over the tiny histogram; the argmax is deterministic
with an explicit tie-break.  A depth-2 CART over lineitem trains
bit-identically in Spark and DuckDB.

Determinism contract: features are integer-quantized (quantity,
discount×100, tax×100 — 50/11/9 distinct values), class counts are
exact BIGINT, and a candidate's score
``(n1L² + n0L²)/nL + (n1R² + n0R²)/nR`` is TWO IEEE divisions of
exact integers plus one add — identical in the Python argmax
(mirroring the SQL text op-for-op, the ml_pca_project discipline) and
the oracle's ``ORDER BY score DESC, fname ASC, thr ASC``.

Scale: fit = 2 corpus scans (depth levels), each producing a
histogram bounded by |features|·|distinct values|·|nodes at level| —
never corpus-proportional; the split decision is a driver argmax over
that bounded table (fit-stats collect pattern).  That is the same
communication shape MLlib's RandomForest uses (findBestSplits
aggregates per-node histograms), minus its binning approximations.

Reference anchor: the reference trains no trees (main.py's four
models are dense/recurrent nets); this extends the engine's
train-in-the-engine family (SURVEY.md §2.7 / deep-trainer precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from web_attack_detection_spark.io.sources import load_table
from web_attack_detection_spark.plans.registry import register

_FEATS = ("q", "d", "t")  # quantity, discount cents, tax cents


def _best_split(hist: dict[tuple[str, int], tuple[int, int]]):
    """Argmax over split candidates from a (fname, v) -> (n1, n)
    histogram — the Python mirror of the oracle's score ORDER BY
    (score DESC, fname ASC, thr ASC; candidates need both sides
    non-empty).  Returns (fname, thr, n_l, n1_l, n_r, n1_r, totn,
    tot1) or None when no candidate exists (pure/constant node)."""
    from collections import defaultdict

    byf: dict[str, dict[int, tuple[int, int]]] = defaultdict(dict)
    for (f, v), (n1, n) in hist.items():
        byf[f][v] = (n1, n)
    best = None
    best_key = None
    for f in byf:
        vals = sorted(byf[f])
        tot1 = sum(byf[f][v][0] for v in vals)
        totn = sum(byf[f][v][1] for v in vals)
        cum1 = 0
        cumn = 0
        for v in vals:
            cum1 += byf[f][v][0]
            cumn += byf[f][v][1]
            if cumn == 0 or totn - cumn == 0:
                continue
            s_l = cum1 * cum1 + (cumn - cum1) * (cumn - cum1)
            r1 = tot1 - cum1
            r0 = (totn - cumn) - r1
            s_r = r1 * r1 + r0 * r0
            score = float(s_l) / cumn + float(s_r) / (totn - cumn)
            key = (-score, f, v)
            if best_key is None or key < best_key:
                best_key = key
                best = (f, v, cumn, cum1, totn - cumn, tot1 - cum1, totn, tot1)
    return best


def _feat_case(sel: str) -> str:
    return f"CASE {sel} WHEN 'q' THEN fq WHEN 'd' THEN fd ELSE ft END"


_SCORE = (
    "CAST(cum1*cum1 + (cumn-cum1)*(cumn-cum1) AS DOUBLE)/cumn"
    " + CAST((tot1-cum1)*(tot1-cum1) + ((totn-cumn)-(tot1-cum1))*((totn-cumn)-(tot1-cum1)) AS DOUBLE)"
    "/(totn-cumn)"
)

_TREE_ORACLE = f"""WITH base AS MATERIALIZED (
  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         CAST(ROUND(l_quantity) AS BIGINT) AS fq,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS fd,
         CAST(ROUND(l_tax * 100) AS BIGINT) AS ft
  FROM lineitem
), hist0 AS MATERIALIZED (
  SELECT f.fname, {_feat_case("f.fname")} AS v,
         CAST(SUM(y) AS BIGINT) AS n1, CAST(COUNT(*) AS BIGINT) AS n
  FROM base, (VALUES ('q'), ('d'), ('t')) f(fname)
  GROUP BY 1, 2
), pref0 AS MATERIALIZED (
  SELECT fname, v,
         CAST(SUM(n1) OVER w AS BIGINT) AS cum1,
         CAST(SUM(n) OVER w AS BIGINT) AS cumn,
         CAST(SUM(n1) OVER (PARTITION BY fname) AS BIGINT) AS tot1,
         CAST(SUM(n) OVER (PARTITION BY fname) AS BIGINT) AS totn
  FROM hist0
  WINDOW w AS (PARTITION BY fname ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), best0 AS MATERIALIZED (
  SELECT fname, v AS thr, cumn AS n_l, cum1 AS n1_l,
         totn - cumn AS n_r, tot1 - cum1 AS n1_r, totn, tot1
  FROM pref0 WHERE cumn > 0 AND totn - cumn > 0
  ORDER BY {_SCORE} DESC, fname ASC, v ASC LIMIT 1
), routed AS MATERIALIZED (
  SELECT b.*, CASE WHEN ({_feat_case("(SELECT fname FROM best0)")})
                        <= (SELECT thr FROM best0)
                   THEN 'L' ELSE 'R' END AS side
  FROM base b
), hist1 AS MATERIALIZED (
  SELECT side, f.fname, {_feat_case("f.fname")} AS v,
         CAST(SUM(y) AS BIGINT) AS n1, CAST(COUNT(*) AS BIGINT) AS n
  FROM routed, (VALUES ('q'), ('d'), ('t')) f(fname)
  GROUP BY 1, 2, 3
), pref1 AS MATERIALIZED (
  SELECT side, fname, v,
         CAST(SUM(n1) OVER w AS BIGINT) AS cum1,
         CAST(SUM(n) OVER w AS BIGINT) AS cumn,
         CAST(SUM(n1) OVER (PARTITION BY side, fname) AS BIGINT) AS tot1,
         CAST(SUM(n) OVER (PARTITION BY side, fname) AS BIGINT) AS totn
  FROM hist1
  WINDOW w AS (PARTITION BY side, fname ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), best_l AS MATERIALIZED (
  SELECT fname, v AS thr, cumn AS n_l, cum1 AS n1_l,
         totn - cumn AS n_r, tot1 - cum1 AS n1_r
  FROM pref1 WHERE side = 'L' AND cumn > 0 AND totn - cumn > 0
  ORDER BY {_SCORE} DESC, fname ASC, v ASC LIMIT 1
), best_r AS MATERIALIZED (
  SELECT fname, v AS thr, cumn AS n_l, cum1 AS n1_l,
         totn - cumn AS n_r, tot1 - cum1 AS n1_r
  FROM pref1 WHERE side = 'R' AND cumn > 0 AND totn - cumn > 0
  ORDER BY {_SCORE} DESC, fname ASC, v ASC LIMIT 1
), leaves AS MATERIALIZED (
  SELECT 'LL' AS path, n1_l AS n_pos, n_l AS n FROM best_l
  UNION ALL SELECT 'LR', n1_r, n_r FROM best_l
  UNION ALL SELECT 'RL', n1_l, n_l FROM best_r
  UNION ALL SELECT 'RR', n1_r, n_r FROM best_r
), acc AS MATERIALIZED (
  SELECT CAST(SUM(GREATEST(n_pos, n - n_pos)) AS DOUBLE)
         / (SELECT totn FROM best0) AS a
  FROM leaves
)
SELECT '' AS path, FALSE AS is_leaf, fname AS feature, thr AS threshold,
       totn AS n, tot1 AS n_pos, CAST(NULL AS INTEGER) AS pred,
       (SELECT a FROM acc) AS train_accuracy
FROM best0
UNION ALL
SELECT 'L', FALSE, l.fname, l.thr, b.n_l, b.n1_l, CAST(NULL AS INTEGER),
       (SELECT a FROM acc)
FROM best_l l, best0 b
UNION ALL
SELECT 'R', FALSE, r.fname, r.thr, b.n_r, b.n1_r, CAST(NULL AS INTEGER),
       (SELECT a FROM acc)
FROM best_r r, best0 b
UNION ALL
SELECT path, TRUE, CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), n, n_pos,
       CAST(CASE WHEN 2 * n_pos > n THEN 1 ELSE 0 END AS INTEGER),
       (SELECT a FROM acc)
FROM leaves"""


@register(
    "ml_decision_tree_exact",
    _TREE_ORACLE,
    doc="depth-2 CART via exact histogram split search, full oracle",
)
def ml_decision_tree_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-2 CART predicting returned lineitems (l_returnflag='R')
    from quantized quantity/discount/tax — trained bit-identically in
    Spark and DuckDB.  Output: the 7-node tree table (path, split
    feature + threshold for internal nodes, class counts, leaf
    majority predictions) plus the exact train accuracy.

    Plan: level 0 is ONE scan aggregating the (feature, value, class)
    histogram (map-side combined; ≤ 70 rows); the best split is a
    driver argmax mirroring the oracle's ORDER BY text op-for-op
    (Gini minimization via the equivalent sum-of-squares-over-size
    maximization — two IEEE divisions per candidate).  Level 1 routes
    rows by the chosen literal split inside the SAME aggregation
    (one more scan, grouped by side) — no data ever moves, only
    bounded histograms.  DuckDB replays both levels with window
    prefix sums and the identical tie-break (score DESC, feature
    ASC, threshold ASC), so the chosen splits, the leaf counts, and
    the accuracy all hash-match.  Histogram-based split search is
    what MLlib/LightGBM/XGBoost-hist run distributed; this pins its
    exact-arithmetic core.  Pure or constant child nodes would make
    a depth-1 side a leaf — impossible on this corpus (50/11/9
    distinct values, ~25% positive) and asserted loudly."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        (F.col("l_returnflag") == "R").cast("int").alias("y"),
        F.round("l_quantity").cast("long").alias("fq"),
        F.round(F.col("l_discount") * 100).cast("long").alias("fd"),
        F.round(F.col("l_tax") * 100).cast("long").alias("ft"),
    )
    stacked = F.explode(
        F.array(
            *[
                F.struct(F.lit(f).alias("fname"), F.col(f"f{f}").alias("v"))
                for f in _FEATS
            ]
        )
    ).alias("s")

    h0 = (
        base.select("y", stacked)
        .groupBy("s.fname", "s.v")
        .agg(F.sum("y").alias("n1"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    hist0 = {(r["fname"], int(r["v"])): (int(r["n1"]), int(r["n"])) for r in h0}
    root = _best_split(hist0)
    if root is None:  # pragma: no cover - constant corpus
        raise ValueError("no valid root split: constant features")
    f0, t0, n_l, n1_l, n_r, n1_r, totn, tot1 = root

    side = F.when(F.col(f"f{f0}") <= F.lit(t0), "L").otherwise("R").alias("side")
    h1 = (
        base.select("y", side, stacked)
        .groupBy("side", "s.fname", "s.v")
        .agg(F.sum("y").alias("n1"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    rows = [("", False, f0, t0, totn, tot1, None)]
    leaves: list[tuple[str, int, int]] = []
    for sd, nn, nn1 in (("L", n_l, n1_l), ("R", n_r, n1_r)):
        hist = {
            (r["fname"], int(r["v"])): (int(r["n1"]), int(r["n"]))
            for r in h1
            if r["side"] == sd
        }
        child = _best_split(hist)
        if child is None:  # pragma: no cover - pure child node
            raise ValueError(f"no valid split in child {sd}: pure/constant node")
        fc, tc, cn_l, cn1_l, cn_r, cn1_r, ctot, ctot1 = child
        assert (ctot, ctot1) == (nn, nn1)
        rows.append((sd, False, fc, tc, nn, nn1, None))
        leaves.append((sd + "L", cn_l, cn1_l))
        leaves.append((sd + "R", cn_r, cn1_r))
    correct = sum(max(n1, n - n1) for _, n, n1 in leaves)
    acc = float(correct) / totn
    out = rows + [
        (p, True, None, None, n, n1, 1 if 2 * n1 > n else 0) for p, n, n1 in leaves
    ]
    return spark.createDataFrame(
        [r + (acc,) for r in out],
        "path string, is_leaf boolean, feature string, threshold long,"
        " n long, n_pos long, pred int, train_accuracy double",
    )


# ---------------------------------------------------------------------------
# exact gradient-boosted stumps (regression GBM skeleton, full oracle)
# ---------------------------------------------------------------------------

_GBM_ROUNDS = 4
_GBM_LR = 0.5


def _gbm_best_stump(hist: dict[tuple[str, int], tuple[int, int]]):
    """Regression twin of _best_split: maximize (ΣL)²/nL + (ΣR)²/nR
    (equivalent to minimizing the post-split SSE), residual sums are
    exact BIGINT, score = two IEEE divisions — mirrored op-for-op by
    the oracle's ORDER BY.  hist maps (fname, v) -> (sum_r, n)."""
    from collections import defaultdict

    byf: dict[str, dict[int, tuple[int, int]]] = defaultdict(dict)
    for (f, v), (sr, n) in hist.items():
        byf[f][v] = (sr, n)
    best = None
    best_key = None
    for f in byf:
        vals = sorted(byf[f])
        tot_r = sum(byf[f][v][0] for v in vals)
        tot_n = sum(byf[f][v][1] for v in vals)
        cum_r = 0
        cum_n = 0
        for v in vals:
            cum_r += byf[f][v][0]
            cum_n += byf[f][v][1]
            if cum_n == 0 or tot_n - cum_n == 0:
                continue
            r_r = tot_r - cum_r
            r_n = tot_n - cum_n
            score = float(cum_r * cum_r) / cum_n + float(r_r * r_r) / r_n
            key = (-score, f, v)
            if best_key is None or key < best_key:
                best_key = key
                best = (f, v, cum_r, cum_n, r_r, r_n)
    return best


_GBM_SCORE = (
    "CAST(cumr*cumr AS DOUBLE)/cumn"
    " + CAST((totr-cumr)*(totr-cumr) AS DOUBLE)/(totn-cumn)"
)


def _gbm_predict_col(f0: float, stumps: list[tuple]):
    """The trained model F as a left-associated literal column
    expression — the engine twin of ``_gbm_f_sql``."""
    e = F.lit(f0)
    for _, fname, thr, gl, gr, _nl, _nr in stumps:
        e = e + (
            F.when(F.col(f"f{fname}") <= F.lit(thr), F.lit(gl)).otherwise(F.lit(gr))
            * _GBM_LR
        )
    return e


def _gbm_fit(base: DataFrame, feats: tuple[str, str, str]) -> tuple[float, list[tuple]]:
    """The exact-GD boosted-stump trainer, parameterized over the
    base relation (columns y, f<a>, f<b>, f<c>) so both the lineitem
    batch query and the events-trained streaming serve share one
    implementation.  Per round: ONE map-side (feature, value)
    histogram scan (bounded collect), driver argmax with the
    deterministic (-score, fname, v) tie-break, leaf values one IEEE
    division each."""
    m0 = base.agg(F.sum("y").alias("s"), F.count(F.lit(1)).alias("n")).first()
    f0 = float(m0["s"]) / m0["n"]

    stacked = F.explode(
        F.array(
            *[
                F.struct(F.lit(f).alias("fname"), F.col(f"f{f}").alias("v"))
                for f in feats
            ]
        )
    ).alias("s")

    stumps: list[tuple] = []  # (round, fname, thr, gl, gr, n_l, n_r)
    for m in range(1, _GBM_ROUNDS + 1):
        r = F.floor(
            F.col("y").cast("double") - _gbm_predict_col(f0, stumps)
        ).cast("long").alias("r")
        h = (
            base.select(r, stacked)
            .groupBy("s.fname", "s.v")
            .agg(F.sum("r").alias("sr"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        hist = {(row["fname"], int(row["v"])): (int(row["sr"]), int(row["n"])) for row in h}
        bs = _gbm_best_stump(hist)
        if bs is None:  # pragma: no cover - constant features
            raise ValueError("no valid stump split")
        fname, thr, cum_r, cum_n, r_r, r_n = bs
        gl = float(cum_r) / cum_n
        gr = float(r_r) / r_n
        stumps.append((m, fname, thr, gl, gr, cum_n, r_n))
    return f0, stumps


def _gbm_f_sql(m: int, feats: tuple[str, str, str]) -> str:
    """F_{m} as a left-associated sum expression over base row b —
    the ONE textual source for the model expression, shared by the
    batch replay, the final-SSE tail, and the streaming-serve oracle
    (the ADVICE r9 #4 no-drift discipline)."""
    fa, fb, fc = feats
    e = "(SELECT f0 FROM f0)"
    for j in range(1, m + 1):
        case = (
            f"(CASE WHEN (CASE (SELECT fname FROM best_{j}) WHEN '{fa}' THEN b.f{fa}"
            f" WHEN '{fb}' THEN b.f{fb} ELSE b.f{fc} END) <= (SELECT thr FROM best_{j})"
            f" THEN (SELECT gl FROM best_{j}) ELSE (SELECT gr FROM best_{j}) END)"
            f" * {_GBM_LR}"
        )
        e = f"{e} + {case}"
    return e


def _gbm_round_ctes(feats: tuple[str, str, str], rounds: int) -> list[str]:
    """The per-round resid/hist/best CTE chain, parameterized over
    the (single-char) feature names so the events-trained streaming
    twin replays through the same builder as the lineitem batch
    query."""
    fa, fb, fc = feats
    parts = []
    for m in range(1, rounds + 1):
        prev_f = _gbm_f_sql(m - 1, feats)
        parts.append(
            f""", resid_{m} AS MATERIALIZED (
  SELECT b.f{fa}, b.f{fb}, b.f{fc},
         CAST(FLOOR(CAST(b.y AS DOUBLE) - ({prev_f})) AS BIGINT) AS r
  FROM base b
), hist_{m} AS MATERIALIZED (
  SELECT f.fname, CASE f.fname WHEN '{fa}' THEN f{fa} WHEN '{fb}' THEN f{fb} ELSE f{fc} END AS v,
         CAST(SUM(r) AS BIGINT) AS sr, CAST(COUNT(*) AS BIGINT) AS n
  FROM resid_{m}, (VALUES ('{fa}'), ('{fb}'), ('{fc}')) f(fname)
  GROUP BY 1, 2
), best_{m} AS MATERIALIZED (
  SELECT fname, v AS thr,
         CAST(cumr AS DOUBLE)/cumn AS gl,
         CAST(totr - cumr AS DOUBLE)/(totn - cumn) AS gr,
         cumn AS n_l, totn - cumn AS n_r
  FROM (
    SELECT fname, v,
           CAST(SUM(sr) OVER w AS BIGINT) AS cumr,
           CAST(SUM(n) OVER w AS BIGINT) AS cumn,
           CAST(SUM(sr) OVER (PARTITION BY fname) AS BIGINT) AS totr,
           CAST(SUM(n) OVER (PARTITION BY fname) AS BIGINT) AS totn
    FROM hist_{m}
    WINDOW w AS (PARTITION BY fname ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
  ) WHERE cumn > 0 AND totn - cumn > 0
  ORDER BY {_GBM_SCORE} DESC, fname ASC, v ASC LIMIT 1
)"""
        )
    return parts


def _gbm_oracle(rounds: int = _GBM_ROUNDS) -> str:
    """Chained-CTE replay of the boosted-stump trainer.  Round m's
    residual is FLOOR(y - F_{m-1}) where F is the left-associated sum
    f0 + contrib_1 + ... + contrib_{m-1} (each contribution a CASE on
    that round's stump, scaled by the 0.5 learning rate) — the same
    IEEE expression the engine builds with literals, so the floored
    residuals, the histograms, the chosen stumps, and the final SSE
    are all bit-identical."""
    feats = ("q", "d", "t")
    parts = [
        """WITH base AS MATERIALIZED (
  SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y,
         CAST(ROUND(l_quantity) AS BIGINT) AS fq,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS fd,
         CAST(ROUND(l_tax * 100) AS BIGINT) AS ft
  FROM lineitem
), f0 AS MATERIALIZED (
  SELECT CAST(SUM(y) AS DOUBLE) / COUNT(*) AS f0 FROM base
)"""
    ]
    parts.extend(_gbm_round_ctes(feats, rounds))
    final_f = _gbm_f_sql(rounds, feats)
    parts.append(
        f""", sse AS MATERIALIZED (
  SELECT CAST(SUM(rq * rq) AS DECIMAL(38, 0)) AS s, COUNT(*) AS n
  FROM (SELECT CAST(FLOOR(CAST(b.y AS DOUBLE) - ({final_f})) AS BIGINT) AS rq
        FROM base b)
)
"""
        + "\nUNION ALL ".join(
            f"""SELECT {m} AS round, fname AS feature, thr AS threshold,
       gl AS gamma_l, gr AS gamma_r, n_l, n_r,
       (SELECT ROUND(sqrt(CAST(s AS DOUBLE) / n) / 100, 6) FROM sse) AS train_rmse
FROM best_{m}"""
            for m in range(1, rounds + 1)
        )
    )
    return "".join(parts)


@register(
    "ml_gbt_stumps_exact",
    _gbm_oracle(),
    doc=f"exact gradient-boosted stumps ({_GBM_ROUNDS} rounds, lr={_GBM_LR}), full oracle",
)
def ml_gbt_stumps_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gradient boosting's exact-arithmetic skeleton, completing the
    tree family next to ml_decision_tree_exact: 4 rounds of depth-1
    regression stumps predicting lineitem price (cents) from
    quantized quantity/discount/tax, learning rate 0.5, squared-error
    gradients.  Per round: residuals are FLOOR-quantized to BIGINT
    cents (the ml_kmeans_clusters distq discipline — floor of a
    bit-identical IEEE expression), so the (feature, value) histogram
    sums are exact and order-free; the stump is chosen by the
    regression split score (ΣL)²/nL + (ΣR)²/nR — two IEEE divisions —
    with the tree query's deterministic tie-break; leaf values are
    ONE division each.  The model F is a left-associated literal
    expression, so the oracle's CASE-chain replay is bit-identical
    round for round, down to the final train RMSE.

    This is the GBM shape MLlib's GBTRegressor distributes (one
    histogram pass per round over the corpus, fit-stats-sized
    collect); the rows-only ml_gbt_train_eval keeps the library path
    covered while this query pins the algorithm's exact core.  Scale:
    4 scans + 4 bounded (70-row) collects; residual expressions are
    whole-stage codegen over literals — nothing iterative touches the
    driver beyond the argmax."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
        F.round("l_quantity").cast("long").alias("fq"),
        F.round(F.col("l_discount") * 100).cast("long").alias("fd"),
        F.round(F.col("l_tax") * 100).cast("long").alias("ft"),
    ).localCheckpoint()  # 4 residual scans + the final SSE reuse it

    f0, stumps = _gbm_fit(base, ("q", "d", "t"))

    rq = F.floor(F.col("y").cast("double") - _gbm_predict_col(f0, stumps)).cast("long")
    sse = base.select((rq * rq).cast("decimal(38,0)").alias("r2")).agg(
        F.sum("r2").alias("s"), F.count(F.lit(1)).alias("n")
    ).first()
    rmse = round(
        __import__("math").sqrt(float(sse["s"]) / sse["n"]) / 100, 6
    )
    return spark.createDataFrame(
        [s + (rmse,) for s in stumps],
        "round int, feature string, threshold long, gamma_l double,"
        " gamma_r double, n_l long, n_r long, train_rmse double",
    )


# ---------------------------------------------------------------------------
# exact bagged stumps (random-forest skeleton, full oracle)
# ---------------------------------------------------------------------------

_RF_TREES = 5


def _rf_allowed(b: int) -> tuple[str, ...]:
    """Deterministic feature subsampling: tree b drops one of the
    three features, rotating — the random-subspace idea with a
    replayable rule."""
    drop = ("q", "d", "t")[b % 3]
    return tuple(f for f in ("q", "d", "t") if f != drop)


_RF_BAG = (
    "CAST(CONV(SUBSTRING(md5(CAST(CONCAT('rf', {b}, '-', l_orderkey, ':', "
    "l_linenumber) AS BINARY)), 1, 8), 16, 10) AS BIGINT) % 3 < 2"
)
_RF_BAG_DUCK = (
    "CAST(concat('0x', substr(md5(concat('rf', {b}, '-', l_orderkey, ':', "
    "l_linenumber)), 1, 8)) AS BIGINT) % 3 < 2"
)


def _rf_oracle(n_trees: int = _RF_TREES) -> str:
    """DuckDB replay of the bagged-stump forest: per-tree md5 bagging
    (~2/3 of rows), per-tree histograms over its 2 allowed features,
    the same Gini-equivalent argmax as the CART oracle, and the exact
    majority-vote train accuracy over the FULL corpus."""
    bags = "\n  UNION ALL ".join(
        f"""SELECT {b} AS tree, CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         CAST(ROUND(l_quantity) AS BIGINT) AS fq,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS fd,
         CAST(ROUND(l_tax * 100) AS BIGINT) AS ft
  FROM lineitem WHERE {_RF_BAG_DUCK.format(b=b)}"""
        for b in range(n_trees)
    )
    allow = " OR ".join(
        f"(tree = {b} AND fname IN ({', '.join(repr(f) for f in _rf_allowed(b))}))"
        for b in range(n_trees)
    )
    votes = " + ".join(
        f"""(CASE WHEN (CASE (SELECT fname FROM best WHERE tree = {b})
                  WHEN 'q' THEN b.fq WHEN 'd' THEN b.fd ELSE b.ft END)
               <= (SELECT thr FROM best WHERE tree = {b})
         THEN (SELECT pred_l FROM best WHERE tree = {b})
         ELSE (SELECT pred_r FROM best WHERE tree = {b}) END)"""
        for b in range(n_trees)
    )
    return f"""WITH bagged AS MATERIALIZED (
  {bags}
), hist AS MATERIALIZED (
  SELECT tree, f.fname, {_feat_case("f.fname")} AS v,
         CAST(SUM(y) AS BIGINT) AS n1, CAST(COUNT(*) AS BIGINT) AS n
  FROM bagged, (VALUES ('q'), ('d'), ('t')) f(fname)
  GROUP BY 1, 2, 3
), pref AS MATERIALIZED (
  SELECT tree, fname, v,
         CAST(SUM(n1) OVER w AS BIGINT) AS cum1,
         CAST(SUM(n) OVER w AS BIGINT) AS cumn,
         CAST(SUM(n1) OVER (PARTITION BY tree, fname) AS BIGINT) AS tot1,
         CAST(SUM(n) OVER (PARTITION BY tree, fname) AS BIGINT) AS totn
  FROM hist WHERE {allow}
  WINDOW w AS (PARTITION BY tree, fname ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), best AS MATERIALIZED (
  SELECT tree, fname, thr, n_bag, n_bag_pos, pred_l, pred_r FROM (
    SELECT tree, fname, v AS thr, totn AS n_bag, tot1 AS n_bag_pos,
           CAST(CASE WHEN 2 * cum1 > cumn THEN 1 ELSE 0 END AS INTEGER) AS pred_l,
           CAST(CASE WHEN 2 * (tot1 - cum1) > (totn - cumn) THEN 1 ELSE 0 END
                AS INTEGER) AS pred_r,
           row_number() OVER (PARTITION BY tree
                              ORDER BY {_SCORE} DESC, fname ASC, v ASC) AS rk
    FROM pref WHERE cumn > 0 AND totn - cumn > 0
  ) WHERE rk = 1
), full_base AS MATERIALIZED (
  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         CAST(ROUND(l_quantity) AS BIGINT) AS fq,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS fd,
         CAST(ROUND(l_tax * 100) AS BIGINT) AS ft
  FROM lineitem
), acc AS MATERIALIZED (
  SELECT CAST(SUM(CASE WHEN (CASE WHEN 2 * ({votes}) > {n_trees} THEN 1 ELSE 0 END) = y
                       THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS a
  FROM full_base b
)
SELECT tree, fname AS feature, thr AS threshold, n_bag, n_bag_pos,
       pred_l, pred_r, (SELECT a FROM acc) AS ensemble_accuracy
FROM best"""


@register(
    "ml_random_forest_exact",
    _rf_oracle(),
    doc=f"exact bagged-stump forest ({_RF_TREES} trees, md5 bagging + rotating feature subsets), full oracle",
)
def ml_random_forest_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The random-forest skeleton, completing the exact tree family
    (single CART: ml_decision_tree_exact; boosting:
    ml_gbt_stumps_exact; bagging: this): 5 depth-1 trees, each fitted
    on a DETERMINISTIC md5 bag (~2/3 of rows — the same portable-hash
    idiom as pipe_hash_split) over a rotating 2-of-3 feature subset
    (the random-subspace rule, replayable), predicting returned
    lineitems; the ensemble is the exact majority vote, scored over
    the FULL corpus.  Every tree's histogram, argmax (Gini-equivalent
    score, two IEEE divisions, score desc / feature asc / threshold
    asc tie-break), leaf majorities, and the vote accuracy are exact
    integer arithmetic — DuckDB replays bagging, fits, and vote
    bit-for-bit.  The rows-only ml_random_forest_train_eval keeps
    MLlib's feature-binned RF covered; this pins the algorithm's
    exact core.  Scale: ONE scan computes all 5 trees' bagged
    histograms simultaneously (explode = 5 bag flags × 3 features,
    map-side combined into ≤ 5·70 rows), one more scan scores the
    vote — bounded collects only (probed family:
    tools/scale_probe_exactml.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_returnflag") == "R").cast("int").alias("y"),
        F.round("l_quantity").cast("long").alias("fq"),
        F.round(F.col("l_discount") * 100).cast("long").alias("fd"),
        F.round(F.col("l_tax") * 100).cast("long").alias("ft"),
    ).localCheckpoint()  # histogram scan + vote scan share it

    bag = [F.expr(_RF_BAG.format(b=b)) for b in range(_RF_TREES)]
    # one scan: (tree, fname, v) histograms for ALL trees at once
    tagged = base.select(
        "y",
        *[F.col(c) for c in ("fq", "fd", "ft")],
        F.explode(
            F.array(*[F.struct(F.lit(b).alias("tree"), bag[b].alias("inbag"))
                      for b in range(_RF_TREES)])
        ).alias("t"),
    ).filter(F.col("t.inbag"))
    stacked = F.explode(
        F.array(
            *[
                F.struct(F.lit(f).alias("fname"), F.col(f"f{f}").alias("v"))
                for f in ("q", "d", "t")
            ]
        )
    ).alias("s")
    h = (
        tagged.select("y", F.col("t.tree").alias("tree"), stacked)
        .groupBy("tree", "s.fname", "s.v")
        .agg(F.sum("y").alias("n1"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    trees: list[tuple] = []
    for b in range(_RF_TREES):
        allowed = _rf_allowed(b)
        hist = {
            (r["fname"], int(r["v"])): (int(r["n1"]), int(r["n"]))
            for r in h
            if r["tree"] == b and r["fname"] in allowed
        }
        bs = _best_split(hist)
        if bs is None:  # pragma: no cover - constant bag
            raise ValueError(f"no valid split in tree {b}")
        fname, thr, n_l, n1_l, n_r, n1_r, totn, tot1 = bs
        pred_l = 1 if 2 * n1_l > n_l else 0
        pred_r = 1 if 2 * n1_r > n_r else 0
        trees.append((b, fname, thr, totn, tot1, pred_l, pred_r))

    # exact majority vote over the FULL corpus (literal stumps)
    vote = None
    for b, fname, thr, _n, _n1, pl, pr in trees:
        v = F.when(F.col(f"f{fname}") <= F.lit(thr), F.lit(pl)).otherwise(F.lit(pr))
        vote = v if vote is None else vote + v
    pred = F.when(2 * vote > _RF_TREES, 1).otherwise(0)
    acc_row = base.agg(
        F.avg((pred == F.col("y")).cast("double")).alias("a")
    ).first()
    # avg of 0/1 ints == exact count / n (one division) in both engines
    acc = float(acc_row["a"])
    return spark.createDataFrame(
        [t + (acc,) for t in trees],
        "tree int, feature string, threshold long, n_bag long, n_bag_pos long,"
        " pred_l int, pred_r int, ensemble_accuracy double",
    )


# ---------------------------------------------------------------------------
# exact Newton-boosted logistic stumps (the XGBoost objective, full
# oracle): second-order leaf weights w = -G/(H+lambda), hard-sigmoid
# link so the replay is exp-free.
# ---------------------------------------------------------------------------

_GBC_ROUNDS = 3
_GBC_LR = 0.5
_GBC_LAMBDA = 1.0
_GBC_FEATS = ("q", "d", "p")


def _gbc_f_sql(m: int) -> str:
    """F_{m} over base row b for the logistic booster — same
    left-associated shape as _gbm_f_sql but with f0 = 0 and the round
    leaves being Newton weights (already lr-scaled in wl/wr)."""
    fa, fb, fc = _GBC_FEATS
    e = "0.0"
    for j in range(1, m + 1):
        case = (
            f"(CASE WHEN (CASE (SELECT fname FROM cbest_{j}) WHEN '{fa}' THEN b.f{fa}"
            f" WHEN '{fb}' THEN b.f{fb} ELSE b.f{fc} END) <= (SELECT thr FROM cbest_{j})"
            f" THEN (SELECT wl FROM cbest_{j}) ELSE (SELECT wr FROM cbest_{j}) END)"
            f" * {_GBC_LR}"
        )
        e = f"{e} + {case}"
    return e


def _gbc_p_sql(f_expr: str) -> str:
    """Hard-sigmoid link p = clamp(0.25 F + 0.5, 0, 1) — piecewise
    linear, so the oracle never calls exp (libm results are not
    bit-portable across engines; clamp arithmetic is)."""
    return f"GREATEST(LEAST(0.25 * ({f_expr}) + 0.5, 1.0), 0.0)"


_GBC_SCORE = (
    "CAST(cumg AS DOUBLE) / 1000000 * (CAST(cumg AS DOUBLE) / 1000000)"
    f" / (CAST(cumh AS DOUBLE) / 1000000 + {_GBC_LAMBDA})"
    " + CAST(totg - cumg AS DOUBLE) / 1000000 * (CAST(totg - cumg AS DOUBLE) / 1000000)"
    f" / (CAST(toth - cumh AS DOUBLE) / 1000000 + {_GBC_LAMBDA})"
)


def _gbc_oracle(rounds: int = _GBC_ROUNDS) -> str:
    """Chained-CTE replay of the Newton booster: per round, the row
    gradients g = p - y and hessians h = p(1-p) are FLOOR-quantized to
    micro-units (exact BIGINT histogram sums, order-free); the stump
    maximizes the XGBoost gain surrogate GL^2/(HL+l) + GR^2/(HR+l)
    (each term one multiply + one divide over micro-descaled doubles,
    mirrored textually by the engine's Python argmax); leaf weights
    are -G/(H+l).  f0 = 0, so no log-odds (and no ln) anywhere."""
    fa, fb, fc = _GBC_FEATS
    parts = [
        """WITH base AS MATERIALIZED (
  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         CAST(ROUND(l_quantity) AS BIGINT) AS fq,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS fd,
         CAST(ROUND(l_extendedprice / 1000) AS BIGINT) AS fp
  FROM lineitem
)"""
    ]
    for m in range(1, rounds + 1):
        p_prev = _gbc_p_sql(_gbc_f_sql(m - 1))
        parts.append(
            f""", cgh_{m} AS MATERIALIZED (
  SELECT b.f{fa}, b.f{fb}, b.f{fc},
         CAST(FLOOR(({p_prev} - b.y) * 1000000) AS BIGINT) AS gq,
         CAST(FLOOR(({p_prev} * (1.0 - {p_prev})) * 1000000) AS BIGINT) AS hq
  FROM base b
), chist_{m} AS MATERIALIZED (
  SELECT f.fname, CASE f.fname WHEN '{fa}' THEN f{fa} WHEN '{fb}' THEN f{fb} ELSE f{fc} END AS v,
         CAST(SUM(gq) AS BIGINT) AS sg, CAST(SUM(hq) AS BIGINT) AS sh,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM cgh_{m}, (VALUES ('{fa}'), ('{fb}'), ('{fc}')) f(fname)
  GROUP BY 1, 2
), cbest_{m} AS MATERIALIZED (
  SELECT fname, v AS thr,
         -(CAST(cumg AS DOUBLE) / 1000000) / (CAST(cumh AS DOUBLE) / 1000000 + {_GBC_LAMBDA}) AS wl,
         -(CAST(totg - cumg AS DOUBLE) / 1000000) / (CAST(toth - cumh AS DOUBLE) / 1000000 + {_GBC_LAMBDA}) AS wr,
         cumn AS n_l, totn - cumn AS n_r
  FROM (
    SELECT fname, v,
           CAST(SUM(sg) OVER w AS BIGINT) AS cumg,
           CAST(SUM(sh) OVER w AS BIGINT) AS cumh,
           CAST(SUM(n) OVER w AS BIGINT) AS cumn,
           CAST(SUM(sg) OVER (PARTITION BY fname) AS BIGINT) AS totg,
           CAST(SUM(sh) OVER (PARTITION BY fname) AS BIGINT) AS toth,
           CAST(SUM(n) OVER (PARTITION BY fname) AS BIGINT) AS totn
    FROM chist_{m}
    WINDOW w AS (PARTITION BY fname ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
  ) WHERE cumn > 0 AND totn - cumn > 0
  ORDER BY {_GBC_SCORE} DESC, fname ASC, v ASC LIMIT 1
)"""
        )
    final_f = _gbc_f_sql(rounds)
    parts.append(
        f""", cacc AS MATERIALIZED (
  SELECT ROUND(SUM(CASE WHEN (CASE WHEN ({final_f}) >= 0.0 THEN 1 ELSE 0 END) = b.y
                        THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 6) AS acc
  FROM base b
)
"""
        + "\nUNION ALL ".join(
            f"""SELECT {m} AS round, fname AS feature, thr AS threshold,
       wl AS w_l, wr AS w_r, n_l, n_r,
       (SELECT acc FROM cacc) AS train_acc
FROM cbest_{m}"""
            for m in range(1, rounds + 1)
        )
    )
    return "".join(parts)


def _gbc_best_stump(hist: dict[tuple[str, int], tuple[int, int, int]]):
    """Newton-gain argmax over the micro-unit (g, h) histogram —
    mirrors _GBC_SCORE term for term in Python doubles (cum/1e6 is an
    exact rescale; the gain is one multiply + one divide per side)."""
    from collections import defaultdict

    byf: dict[str, dict[int, tuple[int, int, int]]] = defaultdict(dict)
    for (f, v), t in hist.items():
        byf[f][v] = t
    best = None
    best_key = None
    lam = _GBC_LAMBDA
    for f in byf:
        vals = sorted(byf[f])
        totg = sum(byf[f][v][0] for v in vals)
        toth = sum(byf[f][v][1] for v in vals)
        totn = sum(byf[f][v][2] for v in vals)
        cumg = cumh = cumn = 0
        for v in vals:
            cumg += byf[f][v][0]
            cumh += byf[f][v][1]
            cumn += byf[f][v][2]
            if cumn == 0 or totn - cumn == 0:
                continue
            gl = cumg / 1e6
            hl = cumh / 1e6
            gr = (totg - cumg) / 1e6
            hr = (toth - cumh) / 1e6
            score = gl * gl / (hl + lam) + gr * gr / (hr + lam)
            key = (-score, f, v)
            if best_key is None or key < best_key:
                best_key = key
                best = (f, v, cumg, cumh, cumn, totg - cumg, toth - cumh, totn - cumn)
    return best


def _gbc_predict_col(stumps: list[tuple]):
    """F as a left-associated literal expression (f0 = 0)."""
    e = F.lit(0.0)
    for _, fname, thr, wl, wr, _nl, _nr in stumps:
        e = e + (
            F.when(F.col(f"f{fname}") <= F.lit(thr), F.lit(wl)).otherwise(F.lit(wr))
            * _GBC_LR
        )
    return e


@register(
    "ml_gbt_classify_exact",
    _gbc_oracle(),
    doc=f"exact Newton-boosted logistic stumps ({_GBC_ROUNDS} rounds, "
    f"lambda={_GBC_LAMBDA}, hard-sigmoid link), full oracle",
)
def ml_gbt_classify_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CLASSIFICATION half of exact boosting, completing the tree
    program: ml_gbt_stumps_exact pins first-order squared-error GBM;
    this query pins the second-order (Newton) logistic objective that
    XGBoost/LightGBM actually optimize — per-row gradients g = p - y
    and hessians h = p(1-p), split gain GL²/(HL+λ) + GR²/(HR+λ), leaf
    weights w = -G/(H+λ) — predicting returned lineitems from
    quantized quantity/discount/price-bucket.

    The link is a HARD sigmoid (clamp(0.25F + 0.5, 0, 1)): piecewise-
    linear like the mlpx/lstmx activations, so neither engine calls
    exp and the whole trajectory stays bit-portable.  g and h are
    FLOOR-quantized to micro-units per row, making the histogram sums
    exact BIGINTs (order-free over any partitioning); the gain and
    the leaf weights are short IEEE expressions mirrored textually by
    the oracle (micro-descale, one multiply, one divide).

    Scale: identical to the GBM skeleton — one map-side histogram
    scan per round (~160 buckets collected), model applied as a
    literal CASE chain in whole-stage codegen, nothing iterative on
    the driver beyond the argmax.  Reference anchor: the reference's
    only classifier family is Keras nets (models/*.py); boosted trees
    are the standard tabular alternative a user of this engine would
    reach for."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        (F.col("l_returnflag") == "R").cast("long").alias("y"),
        F.round("l_quantity").cast("long").alias("fq"),
        F.round(F.col("l_discount") * 100).cast("long").alias("fd"),
        F.round(F.col("l_extendedprice") / 1000).cast("long").alias("fp"),
    ).localCheckpoint()  # 3 g/h scans + the accuracy pass reuse it

    stacked = F.explode(
        F.array(
            *[
                F.struct(F.lit(f).alias("fname"), F.col(f"f{f}").alias("v"))
                for f in _GBC_FEATS
            ]
        )
    ).alias("s")

    stumps: list[tuple] = []  # (round, fname, thr, wl, wr, n_l, n_r)
    for m in range(1, _GBC_ROUNDS + 1):
        fcol = _gbc_predict_col(stumps)
        p = F.greatest(
            F.least(F.lit(0.25) * fcol + F.lit(0.5), F.lit(1.0)), F.lit(0.0)
        )
        gq = F.floor((p - F.col("y")) * 1e6).cast("long").alias("gq")
        hq = F.floor((p * (F.lit(1.0) - p)) * 1e6).cast("long").alias("hq")
        h = (
            base.select(gq, hq, stacked)
            .groupBy("s.fname", "s.v")
            .agg(
                F.sum("gq").alias("sg"),
                F.sum("hq").alias("sh"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        hist = {
            (row["fname"], int(row["v"])): (int(row["sg"]), int(row["sh"]), int(row["n"]))
            for row in h
        }
        bs = _gbc_best_stump(hist)
        if bs is None:  # pragma: no cover - constant features
            raise ValueError("no valid stump split")
        fname, thr, cumg, cumh, n_l, rg, rh, n_r = bs
        wl = -(cumg / 1e6) / (cumh / 1e6 + _GBC_LAMBDA)
        wr = -(rg / 1e6) / (rh / 1e6 + _GBC_LAMBDA)
        stumps.append((m, fname, thr, wl, wr, n_l, n_r))

    pred = (_gbc_predict_col(stumps) >= F.lit(0.0)).cast("long")
    accr = base.agg(
        F.round(
            F.sum((pred == F.col("y")).cast("int"))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("acc")
    ).first()
    acc = float(accr["acc"])
    return spark.createDataFrame(
        [s + (acc,) for s in stumps],
        "round int, feature string, threshold long, w_l double,"
        " w_r double, n_l long, n_r long, train_acc double",
    )
