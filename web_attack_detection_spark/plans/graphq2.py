"""Iterative graph algorithms: k-core peeling, multi-source BFS,
Adamic-Adar link prediction.

Two graphs, two regimes:

- The **bipartite trade graph** (customer ↔ supplier, an edge where a
  customer placed a bulk lineitem, quantity >= 45, with that supplier)
  has O(|customers| + |suppliers|) nodes and is derived from the full
  fact table — the realistic shape where edge derivation is the
  expensive distributed step and the iterations run over the derived
  edge list. Supplier keys are offset by 1e9 so the two key spaces
  share one BIGINT node id domain.
- The **nation trade graph** (graphq.py's _EDGE_SQL) is the small
  dense graph used for the wedge-join families.

Both iterative queries run a FIXED number of rounds in both engines
(8 peel rounds, 4 BFS hops), so the results are engine-identical even
when the fixture converges earlier — extra rounds are no-ops. Each
round's frontier/survivor set is referenced twice by the next round
(degree filter + edge restriction), so WITHOUT a per-round
materialization the logical plan doubles per round (2^rounds scan
leaves); the eager localCheckpoint per round is what keeps the plan
linear — these queries are listed in tools/plan_audit.py
_EXECUTING_NAMES for that reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from web_attack_detection_spark.io.sources import load_table
from web_attack_detection_spark.plans.graphq import _EDGE_SQL
from web_attack_detection_spark.plans.registry import register

_SUPP_OFFSET = 1_000_000_000

# bulk-purchase bipartite edges: customer bought >= 45 units of some
# lineitem from supplier (the quantity floor keeps the graph sparse
# enough that peeling and BFS have real multi-round dynamics)
_BIP_EDGE_SQL = """
  SELECT DISTINCT CAST(o.o_custkey AS BIGINT) AS ck,
                  CAST(l.l_suppkey AS BIGINT) AS sk
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_quantity >= 45
"""

_BIP_ADJ_SQL = f"""
  SELECT ck AS a, {_SUPP_OFFSET} + sk AS b FROM ({_BIP_EDGE_SQL})
  UNION ALL
  SELECT {_SUPP_OFFSET} + sk AS a, ck AS b FROM ({_BIP_EDGE_SQL})
"""


def _bip_adj(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    e = (
        li.filter(F.col("l_quantity") >= 45)
        .join(o, li.l_orderkey == o.o_orderkey)
        .select(
            o.o_custkey.cast("long").alias("ck"),
            li.l_suppkey.cast("long").alias("sk"),
        )
        .distinct()
    )
    return e.select(
        F.col("ck").alias("a"), (F.col("sk") + _SUPP_OFFSET).alias("b")
    ).unionAll(
        e.select((F.col("sk") + _SUPP_OFFSET).alias("a"), F.col("ck").alias("b"))
    )


# ---------------------------------------------------------------------------
# k-core decomposition by fixed-round peeling
# ---------------------------------------------------------------------------

_KCORE_K = 4
_KCORE_ROUNDS = 8


def _kcore_oracle(k: int, rounds: int) -> str:
    """Chained-CTE peel: round i keeps edges whose BOTH endpoints had
    degree >= k in round i-1. Generated, not hand-written, so the
    round count stays in one constant shared with the Spark loop.
    MATERIALIZED is load-bearing: each round references its
    predecessor three times, so inlined CTEs would expand to 3^rounds
    copies of the edge scan — the DuckDB statement of the same plan
    blowup the Spark loop's per-round localCheckpoint prevents."""
    ctes = [f"k0 AS MATERIALIZED ({_BIP_ADJ_SQL})"]
    for i in range(1, rounds + 1):
        p = f"k{i - 1}"
        keep = f"SELECT a FROM {p} GROUP BY a HAVING COUNT(*) >= {k}"
        ctes.append(
            f"k{i} AS MATERIALIZED (SELECT a, b FROM {p} "
            f"WHERE a IN ({keep}) AND b IN ({keep}))"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT CAST(a AS BIGINT) AS node,
       CAST(COUNT(*) AS BIGINT) AS core_degree
FROM k{rounds} GROUP BY a"""
    )


@register(
    "graph_kcore_peel",
    _kcore_oracle(_KCORE_K, _KCORE_ROUNDS),
    doc=f"{_KCORE_K}-core of the bipartite trade graph by {_KCORE_ROUNDS}-round peeling",
)
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k-core (maximal subgraph where every node keeps >= k
    neighbors) of the customer-supplier bulk-purchase graph —
    the standard 'dense engagement core' extraction that seeds
    community detection and fraud-ring triage. Implemented as
    fixed-round peeling: each round drops nodes whose degree among
    SURVIVORS fell below k; both engines run exactly 8 rounds so the
    output is identical even when the fixture converges in fewer.
    Per-round cost is one map-side-combinable degree count plus two
    semi-joins on the shrinking edge list — at scale each round is
    one shuffle over a set that only ever shrinks, the same plan GraphX
    peeling lowers to. Per-round localCheckpoint keeps the plan linear
    (see module docstring)."""
    alive = _bip_adj(spark, sf_dir).localCheckpoint()
    for _ in range(_KCORE_ROUNDS):
        keep = (
            alive.groupBy("a")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= _KCORE_K)
            .select("a")
        )
        alive = (
            alive.join(keep, "a", "left_semi")
            .join(keep.withColumnRenamed("a", "b"), "b", "left_semi")
            .localCheckpoint()
        )
    return alive.groupBy("a").agg(F.count(F.lit(1)).alias("core_degree")).select(
        F.col("a").cast("long").alias("node"),
        F.col("core_degree").cast("long"),
    )


# ---------------------------------------------------------------------------
# multi-source BFS levels (supply-chain proximity)
# ---------------------------------------------------------------------------

_BFS_HOPS = 4

_BFS_ORACLE = f"""
WITH RECURSIVE adj AS ({_BIP_ADJ_SQL}),
seeds AS (
  SELECT DISTINCT {_SUPP_OFFSET} + CAST(s_suppkey AS BIGINT) AS node
  FROM supplier
  WHERE s_nationkey = (SELECT MIN(s_nationkey) FROM supplier)
),
bfs AS (
  SELECT node, 0 AS lvl FROM seeds
  UNION
  SELECT adj.b AS node, bfs.lvl + 1 AS lvl
  FROM bfs JOIN adj ON adj.a = bfs.node
  WHERE bfs.lvl < {_BFS_HOPS}
),
lv AS (SELECT node, MIN(lvl) AS level FROM bfs GROUP BY node)
SELECT CAST(level AS BIGINT) AS level,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(node) AS BIGINT) AS key_checksum
FROM lv GROUP BY level
"""


@register(
    "graph_bfs_levels",
    _BFS_ORACLE,
    doc=f"multi-source BFS to {_BFS_HOPS} hops from the lowest nation's suppliers, level census",
)
def graph_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-chain proximity: breadth-first levels from ALL suppliers
    of the lowest present nation at once (an aggregate-derived seed
    set, so every scale factor has seeds) over the bipartite
    bulk-purchase graph (level 1 =
    their bulk customers, level 2 = those customers' other suppliers,
    ...). Frontier-expansion BFS — each hop is one join of the CURRENT
    frontier against the adjacency list plus a distinct, the textbook
    Pregel/GraphFrames lowering where per-hop cost tracks the frontier
    size, not the graph size. A node's level is the MINIMUM hop at
    which it was ever reached (grouped at the end, so re-reaching a
    settled node is harmless). The DuckDB oracle is the recursive-CTE
    statement of the same fixpoint, capped at the same hop count.
    Output is the per-level census with an exact key checksum."""
    adj = _bip_adj(spark, sf_dir).localCheckpoint()
    s = load_table(spark, sf_dir, "supplier")
    min_nk = s.agg(F.min("s_nationkey").alias("mnk"))
    seeds = (
        s.join(F.broadcast(min_nk), s.s_nationkey == F.col("mnk"))
        .select((F.col("s_suppkey").cast("long") + _SUPP_OFFSET).alias("node"))
        .distinct()
        .localCheckpoint()
    )
    levels = seeds.withColumn("lvl", F.lit(0))
    frontier = seeds
    for hop in range(1, _BFS_HOPS + 1):
        frontier = (
            frontier.join(adj, frontier["node"] == adj["a"])
            .select(F.col("b").alias("node"))
            .distinct()
            .localCheckpoint()
        )
        levels = levels.unionAll(frontier.withColumn("lvl", F.lit(hop)))
    lv = levels.groupBy("node").agg(F.min("lvl").alias("level"))
    return lv.groupBy("level").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum("node").alias("key_checksum"),
    ).select(
        F.col("level").cast("long"),
        F.col("n_nodes").cast("long"),
        F.col("key_checksum").cast("long"),
    )


# ---------------------------------------------------------------------------
# Adamic-Adar link prediction on the nation trade graph
# ---------------------------------------------------------------------------

# Each common neighbor w contributes 1/ln(deg(w)); the contribution is
# quantized to BIGINT at 1e6 PER NODE before the wedge-join sum, so
# the per-pair total is an exact integer in both engines (same
# pattern as the DSIR/perplexity queries — float summation order can
# never flip a result). A common neighbor has degree >= 2 by
# construction, so ln(deg) > 0 always; the d > 1 guard is belt and
# braces.
_ADAMIC_ADAR_ORACLE = f"""
WITH e AS ({_EDGE_SQL}),
adj AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v, u FROM e),
deg AS (SELECT a, COUNT(*) AS d FROM adj GROUP BY a),
wgt AS (
  SELECT a, CAST(ROUND(1000000.0 / LN(d)) AS BIGINT) AS s
  FROM deg WHERE d > 1
),
pairs AS (
  SELECT x.a AS u, y.a AS v,
         CAST(COUNT(*) AS BIGINT) AS n_common,
         CAST(SUM(w.s) AS BIGINT) AS aa_num
  FROM adj x
  JOIN adj y ON x.b = y.b AND x.a < y.a
  JOIN wgt w ON w.a = x.b
  GROUP BY x.a, y.a
)
SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v,
       n_common,
       ROUND(aa_num / 1000000.0, 6) AS adamic_adar
FROM pairs WHERE n_common >= 2
"""


@register(
    "graph_adamic_adar",
    _ADAMIC_ADAR_ORACLE,
    doc="Adamic-Adar link prediction, per-neighbor 1/ln(deg) quantized to exact BIGINT",
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over the nation trade graph:
    score(u,v) = sum over common neighbors w of 1/ln(deg(w)) — the
    classic refinement of common-neighbor counting that discounts
    promiscuous hubs. Same wedge-join candidate generation as
    graph_jaccard_neighbors (pairs that share a neighbor, never all
    pairs), but each wedge row carries the MIDPOINT's quantized
    inverse-log-degree, so the aggregation sums exact BIGINTs and the
    one final division produces an engine-identical score. At scale
    the wedge join inherits the degree-ordered orientation + hub-cap
    guards of the triangle plan; the weight table is O(|V|) and
    broadcast."""
    from web_attack_detection_spark.plans.graphq import _edges

    ed = _edges(spark, sf_dir).localCheckpoint()
    adj = ed.select(F.col("u").alias("a"), F.col("v").alias("b")).unionAll(
        ed.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    deg = adj.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    wgt = deg.filter(F.col("d") > 1).select(
        F.col("a").alias("mid"),
        F.round(F.lit(1000000.0) / F.log(F.col("d"))).cast("long").alias("s"),
    )
    x = adj.alias("x")
    y = adj.alias("y")
    pairs = (
        x.join(y, (F.col("x.b") == F.col("y.b")) & (F.col("x.a") < F.col("y.a")))
        .join(F.broadcast(wgt), F.col("mid") == F.col("x.b"))
        .groupBy(F.col("x.a").alias("u"), F.col("y.a").alias("v"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            F.sum("s").cast("long").alias("aa_num"),
        )
        .filter(F.col("n_common") >= 2)
    )
    return pairs.select(
        F.col("u").cast("long"),
        F.col("v").cast("long"),
        "n_common",
        F.round(F.col("aa_num") / 1000000.0, 6).alias("adamic_adar"),
    )


# ---------------------------------------------------------------------------
# community detection: fixed-round majority label propagation
# ---------------------------------------------------------------------------

_LPA_ROUNDS = 4


def _lpa_oracle(rounds: int) -> str:
    """Chained MATERIALIZED CTEs, one per round: each node adopts the
    most frequent label among its neighbors (ties -> smallest label).
    Deterministic by construction — the tie rule plus fixed round
    count removes the update-order dependence classic async LPA has."""
    ctes = [
        f"adj AS MATERIALIZED ({_BIP_ADJ_SQL})",
        "l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS label FROM adj)",
    ]
    for i in range(1, rounds + 1):
        p = f"l{i - 1}"
        ctes.append(
            f"""l{i} AS MATERIALIZED (
  SELECT node, label FROM (
    SELECT adj.a AS node, prev.label,
           ROW_NUMBER() OVER (PARTITION BY adj.a
                              ORDER BY COUNT(*) DESC, prev.label ASC) AS rn
    FROM adj JOIN {p} prev ON prev.node = adj.b
    GROUP BY adj.a, prev.label
  ) WHERE rn = 1
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT CAST(label AS BIGINT) AS community,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(node) AS BIGINT) AS member_checksum
FROM l{rounds} GROUP BY label"""
    )


@register(
    "graph_lpa_communities",
    _lpa_oracle(_LPA_ROUNDS),
    doc=f"majority label propagation, {_LPA_ROUNDS} synchronous rounds, min-label ties",
)
def graph_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by SYNCHRONOUS majority label propagation
    over the bipartite trade graph: every round, every node adopts
    the most frequent label among its neighbors, ties to the
    smallest label. Classic async LPA is nondeterministic (result
    depends on update order); the synchronous fixed-round variant
    with an integer tie rule is bit-reproducible — the property that
    makes the detected communities REGRESSION-TESTABLE, which is why
    this variant is what production graph pipelines actually deploy.
    Per round: one join of the adjacency against the label table,
    one count aggregate, one per-node argmax window — all shuffles
    keyed on node id, cost rounds x O(E) like graph_kcore_peel, with
    the same per-round localCheckpoint (plan stays linear) and the
    same MATERIALIZED-CTE mirror in the oracle."""
    adj = _bip_adj(spark, sf_dir).localCheckpoint()
    lab = adj.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(_LPA_ROUNDS):
        nbr = adj.join(
            lab.withColumnRenamed("node", "b"), "b"
        ).select(F.col("a").alias("node"), "label")
        cnt = nbr.groupBy("node", "label").agg(F.count(F.lit(1)).alias("c"))
        w = Window.partitionBy("node").orderBy(
            F.col("c").desc(), F.col("label").asc()
        )
        lab = (
            cnt.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "label")
            .localCheckpoint()
        )
    return lab.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum("node").cast("long").alias("member_checksum"),
    ).select(
        F.col("label").cast("long").alias("community"),
        "n_members",
        "member_checksum",
    )
