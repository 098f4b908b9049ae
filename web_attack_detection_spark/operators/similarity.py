"""Similarity search over embedding columns (``array<float>``).

Three tiers:

- **brute-force cosine top-k** — exact baseline: broadcast the query
  set, scan the corpus once, per-query top-k via window rank. The
  oracle-checkable ground truth.
- **cosine-threshold pair join** — exact all-pairs above a threshold
  (block-nested-loop at test scale; the LSH/IVF tiers replace it at
  scale).
- **IVF (inverted-file) top-k** — the 100 TB path: pick k_centroids
  deterministic centroids, assign every corpus vector to its nearest
  centroid (one broadcast join), and at query time probe only the
  ``n_probe`` nearest cells. Corpus scan cost drops from O(|corpus|)
  to O(|corpus|·n_probe/k_centroids) per query; the cell assignment is
  a partition key, so a real deployment co-partitions the corpus by
  cell and prunes whole partitions.

Float determinism: dot products fold left-to-right over the array
(``F.aggregate``), every element cast to double first — the exact
sequence DuckDB's ``list_reduce(list_prepend(0.0, ...))`` performs, so
oracle comparison is bit-exact (see plans/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def portable_hash63(col: Column) -> Column:
    """Deterministic 63-bit mixer hash of a non-negative integer id,
    expressible IDENTICALLY in Spark (ANSI-safe hi/lo 32-bit split —
    wrapping multiply otherwise throws) and DuckDB (HUGEINT mod 2**64,
    see plans/similarity.PORTABLE_HASH63_SQL).  Same two-round
    xorshift/multiply shape as ml.train's minibatch mixer (full
    avalanche); the final ``>>> 1`` returns a NON-NEGATIVE BIGINT so
    signed ordering equals the unsigned hash order in both engines.
    Replaces xxhash64 where an oracle must replay the hash (IVF
    centroid seeding): xxhash64 has no DuckDB twin."""
    m32 = F.lit(0xFFFFFFFF)
    k1, k2 = 1640531527, 2027808487  # odd, < 2**31

    def wrapmul(h, k: int):
        lo_k = h.bitwiseAND(m32) * F.lit(k)
        hi_k = F.shiftrightunsigned(h, 32) * F.lit(k)
        top = (F.shiftrightunsigned(lo_k, 32) + hi_k).bitwiseAND(m32)
        return F.shiftleft(top, 32).bitwiseXOR(lo_k.bitwiseAND(m32))

    h = col.cast("long")
    h = wrapmul(h.bitwiseXOR(F.shiftrightunsigned(h, 33)), k1)
    h = wrapmul(h.bitwiseXOR(F.shiftrightunsigned(h, 29)), k2)
    h = h.bitwiseXOR(F.shiftrightunsigned(h, 32))
    return F.shiftrightunsigned(h, 1)


def dot(a: Column, b: Column) -> Column:
    """Left-to-right fold of Σ a_i·b_i in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def unit_normalize(
    df: DataFrame, vec_col: str, out_col: str | None = None
) -> DataFrame:
    """Replace ``vec_col`` with the unit-normalized vector (computed
    once per row: norm materialized as a column, then one element-wise
    divide). After this, pairwise cosine = pairwise dot — each
    pair-join evaluates ONE fold instead of three (dot + both norms).
    At n² pairs that's the difference between O(n) and O(n²) norm
    computations; bench shows ~3× on the all-pairs query."""
    out = out_col or vec_col
    return (
        df.withColumn("__nrm", l2_norm(F.col(vec_col)))
        .withColumn(out, F.transform(F.col(vec_col), lambda x: x.cast("double") / F.col("__nrm")))
        .drop("__nrm")
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, rank, cos).

    queries is broadcast (the small side by construction); the corpus
    is scanned once. Ranking ties break on neighbor id ascending, so
    the result is fully deterministic. The rank window shuffles only
    |queries|·|corpus| *rows of three scalars*, not vectors.
    """
    q = unit_normalize(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")),
        "q_vec",
    )
    c = unit_normalize(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")),
        "c_vec",
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            dot(F.col("q_vec"), F.col("c_vec")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round(F.col("cos"), 6).alias("cos"))
    )


def cosine_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs (id_a < id_b, cos ≥ threshold) as a pure-JVM
    pair join + fold — the readable reference spec. Production path is
    :func:`cosine_pairs_blocked` (bit-identical results, blocked numpy
    kernel); tests assert the two agree exactly."""
    unit = unit_normalize(
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")), "v"
    ).localCheckpoint()  # normalize ONCE; both join sides reuse the result
    a = unit.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    b = unit.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dot(F.col("va"), F.col("vb")).alias("cos"))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round(F.col("cos"), 6).alias("cos"))
    )


def _cell_scores(cents: Column, vec: Column) -> Column:
    """array<struct<cos, negcell>> — one entry per centroid. Struct
    comparison is lexicographic, so ``array_max`` over this is argmax
    by (cosine desc, cell asc) with no shuffle and no window."""
    return F.transform(
        cents,
        lambda c: F.struct(
            dot(vec, c["c_vec"]).alias("cos"), (-c["cell"]).alias("negcell")
        ),
    )


def cosine_pairs_blocked(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 16,
) -> DataFrame:
    """Exact all-pairs cosine (id_a < id_b, cos ≥ threshold) as a
    BLOCKED matrix kernel — same results as :func:`cosine_pairs`,
    bit-for-bit, at a fraction of the cost.

    Plan: hash vectors into ``n_blocks`` buckets, collapse each bucket
    to ONE row carrying its vectors, crossJoin the (tiny) bucket
    relation with itself keeping blk_a ≤ blk_b, and evaluate each
    bucket-pair as a numpy block inside ``mapInPandas``. Work per task
    is an (m×m) matrix accumulation; the shuffle moves n/n_blocks-row
    blocks, never O(n²) pairs — pair enumeration happens only inside
    the Arrow batch. At 100 TB scale the same shape holds: block count
    grows with the corpus, each task stays cache-sized, and no
    executor ever materializes the pair table.

    Bit-exactness with the SQL fold oracle: the kernel accumulates
    DIMENSION-SEQUENTIALLY (acc = acc + a_d·b_d for d = 0..63,
    float64), which is the exact IEEE op sequence of the
    ``F.aggregate`` fold and DuckDB's ``list_reduce`` — numpy pairwise
    summation never enters (no ``np.sum``/``np.dot``), so scores are
    identical to the JVM fold, not merely close.
    """
    blocks = (
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .groupBy(F.pmod(F.col("id"), F.lit(n_blocks)).cast("int").alias("blk"))
        .agg(F.collect_list(F.struct("id", "v")).alias("rows"))
    )
    a = blocks.select(F.col("blk").alias("blk_a"), F.col("rows").alias("rows_a"))
    b = blocks.select(F.col("blk").alias("blk_b"), F.col("rows").alias("rows_b"))
    pairs = (
        a.crossJoin(b)
        .filter(F.col("blk_a") <= F.col("blk_b"))
        .repartition(n_blocks * (n_blocks + 1) // 2)
    )

    def kernel(batches):
        import numpy as np
        import pandas as pd

        def to_mat(rows):
            ids = np.fromiter((r["id"] for r in rows), dtype=np.int64, count=len(rows))
            mat = np.asarray([np.asarray(r["v"], dtype=np.float64) for r in rows])
            return ids, mat

        def unitize(mat):
            # += is the same IEEE add as acc = acc + x (bit-identical)
            # without a fresh allocation per dimension (ADVICE r10)
            acc = np.zeros(mat.shape[0], dtype=np.float64)
            for d in range(mat.shape[1]):
                col = mat[:, d]
                acc += col * col
            return mat / np.sqrt(acc)[:, None]

        for pdf in batches:
            out_a, out_b, out_c = [], [], []
            for ra, rb, blk_a, blk_b in zip(
                pdf["rows_a"], pdf["rows_b"], pdf["blk_a"], pdf["blk_b"]
            ):
                ids_a, ma = to_mat(ra)
                ma = unitize(ma)
                if blk_a == blk_b:
                    ids_b, mb = ids_a, ma
                else:
                    ids_b, mb = to_mat(rb)
                    mb = unitize(mb)
                cos = np.zeros((ma.shape[0], mb.shape[0]), dtype=np.float64)
                for d in range(ma.shape[1]):
                    cos += ma[:, d][:, None] * mb[:, d][None, :]
                hit = cos >= threshold
                if blk_a == blk_b:
                    hit &= ids_a[:, None] < ids_b[None, :]
                ii, jj = np.nonzero(hit)
                ia, ib = ids_a[ii], ids_b[jj]
                lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
                out_a.append(lo)
                out_b.append(hi)
                out_c.append(cos[ii, jj])
            yield pd.DataFrame(
                {
                    "id_a": np.concatenate(out_a) if out_a else np.array([], dtype=np.int64),
                    "id_b": np.concatenate(out_b) if out_b else np.array([], dtype=np.int64),
                    "cos": np.concatenate(out_c) if out_c else np.array([], dtype=np.float64),
                }
            )

    raw = pairs.mapInPandas(kernel, "id_a long, id_b long, cos double")
    return raw.select("id_a", "id_b", F.round(F.col("cos"), 6).alias("cos"))


# loud upper bound for one collapsed IVF cell (ADVICE r10): ~1M rows
# of 64-dim float64 is ~0.5 GB as one aggregation value — beyond it
# the kernel fails with an actionable message instead of an OOM
_MAX_CELL_ROWS = 1 << 20


def _within_cell_pairs(
    assigned: DataFrame,
    id_col: str,
    vec_col: str,
    cell_col: str,
    directed: bool,
    threshold: float | None,
    emit_cell: bool,
    block: int,
) -> DataFrame:
    """Shared per-cell numpy pair kernel behind :func:`cell_pair_scores`
    (directed, unthresholded — the kNN candidate stage) and
    :func:`cell_dup_pairs` (undirected id_a < id_b with a cos
    threshold — the SemDeDup stage).  See cell_pair_scores for the
    exactness and scale contracts.

    Input contract (ADVICE r10): rows with a NULL id or NULL vector
    are DROPPED before the cell collapse — the join + fold form this
    kernel replaced dropped them silently (null keys don't join, a
    null fold returns null below any threshold), so the filter keeps
    that behavior instead of crashing ``np.fromiter``/``np.asarray``;
    vectors must be fixed-dimension (a ragged vector still fails the
    2-D ``np.asarray``, loudly).  ``_MAX_CELL_ROWS`` bounds the
    single-row cell collapse: a cell above it raises with the cell id
    and size instead of an opaque executor OOM — at that size the
    caller's IVF k is mis-sized for the corpus (see cell_pair_scores'
    scale note)."""
    cells = (
        assigned.filter(
            F.col(id_col).isNotNull() & F.col(vec_col).isNotNull()
        )
        .groupBy(F.col(cell_col).alias("cell"))
        .agg(
            F.collect_list(
                F.struct(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
            ).alias("rows")
        )
    )

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out_cell, out_s, out_d, out_c = [], [], [], []
            for cell_val, rows in zip(pdf["cell"], pdf["rows"]):
                if len(rows) > _MAX_CELL_ROWS:
                    raise ValueError(
                        f"IVF cell {cell_val} holds {len(rows)} rows "
                        f"(> {_MAX_CELL_ROWS}): the cell collapse would "
                        "single-buffer it; raise k_centroids so cells "
                        "stay corpus/k-sized"
                    )
                ids = np.fromiter(
                    (r["id"] for r in rows), dtype=np.int64, count=len(rows)
                )
                mat = np.asarray([np.asarray(r["v"], dtype=np.float64) for r in rows])
                n = len(ids)
                for lo in range(0, n, block):
                    hi = min(lo + block, n)
                    cos = np.zeros((hi - lo, n), dtype=np.float64)
                    for d in range(mat.shape[1]):
                        cos += mat[lo:hi, d][:, None] * mat[:, d][None, :]
                    if directed:
                        keep = ids[lo:hi, None] != ids[None, :]
                    else:
                        keep = ids[lo:hi, None] < ids[None, :]
                    if threshold is not None:
                        keep &= cos >= threshold
                    ii, jj = np.nonzero(keep)
                    out_s.append(ids[lo + ii])
                    out_d.append(ids[jj])
                    out_c.append(cos[ii, jj])
                    if emit_cell:
                        out_cell.append(np.full(len(ii), cell_val, dtype=np.int64))
            data = {
                "src": np.concatenate(out_s) if out_s else np.array([], dtype=np.int64),
                "dst": np.concatenate(out_d) if out_d else np.array([], dtype=np.int64),
                "cos": np.concatenate(out_c) if out_c else np.array([], dtype=np.float64),
            }
            if emit_cell:
                data = {
                    "cell": np.concatenate(out_cell)
                    if out_cell
                    else np.array([], dtype=np.int64),
                    **data,
                }
            yield pd.DataFrame(data)

    schema = "src long, dst long, cos double"
    if emit_cell:
        schema = "cell long, " + schema
    return cells.mapInPandas(kernel, schema)


def cell_pair_scores(
    assigned: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "u",
    cell_col: str = "cell",
    block: int = 2048,
) -> DataFrame:
    """All DIRECTED within-cell pairs (src != dst) with their cosine —
    the candidate-scoring stage of the mutual-kNN graph — as a per-cell
    numpy block kernel instead of a per-cell self-join + interpreted
    fold (optimization guide §4.2: hand whole batches to vectorized
    native code; §8: the pair enumeration happens inside the batch, so
    the shuffle moves each vector once, never O(|cell|²) pair rows).
    Measured at sf0.1 (16 cells, ~250k pairs): fold-join 1.4-2.0 s →
    kernel ~0.4 s warm, with ZERO differing cos bits over all pairs.

    Bit-exactness with the SQL fold oracle: the established
    :func:`cosine_pairs_blocked` contract — the kernel accumulates
    DIMENSION-SEQUENTIALLY from a zeros buffer (acc = acc + a_d·b_d,
    float64), the exact IEEE op sequence of the ``F.aggregate`` fold
    and DuckDB's replay; ``np.sum``/``np.dot`` pairwise summation never
    enters.

    Scale: each cell is collapsed to one row and scored in one task —
    the same per-key residency the SortMergeJoin alternative needs to
    buffer its join key (a cell is corpus/k-sized by the IVF contract;
    at 100 TB you raise k, exactly as you would to keep the join's
    per-key buffer bounded).  The left side is processed in ``block``-
    row chunks so the cos matrix stays ≤ block × |cell| regardless of
    cell size."""
    return _within_cell_pairs(
        assigned, id_col, vec_col, cell_col,
        directed=True, threshold=None, emit_cell=False, block=block,
    )


def cell_dup_pairs(
    assigned: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "u",
    cell_col: str = "cell",
    block: int = 2048,
) -> DataFrame:
    """Within-cell near-duplicate pairs (id_a < id_b, cos ≥ threshold)
    as (cell, src, dst, cos) — the SemDeDup pair stage, same kernel,
    same bit-exactness and scale contracts as
    :func:`cell_pair_scores`.  The threshold test runs on the exact
    fold-identical cos, so the kept pair set matches the join + fold
    form exactly."""
    return _within_cell_pairs(
        assigned, id_col, vec_col, cell_col,
        directed=False, threshold=threshold, emit_cell=True, block=block,
    )


def ivf_assign(
    corpus: DataFrame,
    k_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic IVF index. Centroid seeds are the ``k_centroids``
    corpus vectors with the smallest ``portable_hash63(id)`` — a
    seed-free uniform sample selected by a top-k (TakeOrdered:
    per-partition heap + driver merge, never a global sort); the hash
    is engine-portable (round 7) so a DuckDB oracle can replay the
    whole index build. Returns ``(centroids, assigned)`` where
    ``assigned`` carries a ``cell`` column.

    Assignment is MAP-ONLY: the 16 centroids are collapsed into one
    array-of-structs row, broadcast, and each corpus row picks its cell
    via ``array_max`` over per-centroid cosines — zero shuffle of the
    corpus (the previous formulation expanded 16× through a crossJoin
    and shuffled that through a window; at 100 TB that shuffle IS the
    job). A real deployment then persists ``assigned`` partitioned BY
    cell so query-time probes prune whole partitions.
    """
    unit = unit_normalize(corpus.select(id_col, vec_col), vec_col).localCheckpoint()
    seeds = (
        unit.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("c_vec"))
        .orderBy(portable_hash63(F.col("cid")).asc(), F.col("cid").asc())
        .limit(k_centroids)
    )
    centroids = seeds.withColumn(
        "cell", F.row_number().over(Window.orderBy(F.col("cid").asc())) - 1
    ).select("cell", "c_vec")

    def assign(cent_df: DataFrame) -> DataFrame:
        cents = cent_df.agg(F.collect_list(F.struct("cell", "c_vec")).alias("cents"))
        return (
            unit.crossJoin(F.broadcast(cents))
            .withColumn("__best", F.array_max(_cell_scores(F.col("cents"), F.col(vec_col))))
            .select(id_col, vec_col, (-F.col("__best.negcell")).alias("cell"))
        )

    # Lloyd refinement: per-cell element-wise mean → re-unit-normalize.
    # Each iteration is one map-only assignment pass + a k_centroids-
    # group aggregate (partial map-side, negligible shuffle) — the
    # standard IVF train loop, and what makes nearest-cell a useful
    # proxy for nearest-neighbor on real (clustered) embeddings.
    # The mean sums PICO-UNIT INTEGERS (floor(x*1e12), exact BIGINTs)
    # instead of raw doubles: float sums are partition-order-dependent,
    # and an engine replaying the build (the sim_ivf_topk oracle) must
    # land on bit-identical centroids; one double conversion + one
    # division per element keeps that true at 1e-12 quantization —
    # noise-level against unit vectors, measured recall unchanged.
    for _ in range(refine_iters):
        a = assign(centroids)
        means = (
            a.select("cell", F.posexplode(F.col(vec_col)).alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(
                F.sum(F.floor(F.col("x") * 1e12).cast("long")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .select(
                "cell",
                "pos",
                (
                    F.col("s").cast("double")
                    / (F.col("n").cast("double") * F.lit(1e12))
                ).alias("m"),
            )
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cell", F.transform(F.col("pm"), lambda s: s["m"]).alias("c_vec"))
        )
        centroids = unit_normalize(means, "c_vec").localCheckpoint()
    return centroids, assign(centroids)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score queries only against vectors in their
    ``n_probe`` nearest cells. Same output schema as brute_force_topk;
    recall vs the exact baseline is asserted in tests/test_similarity.py.

    Plan shape (the 100 TB story): centroid seeding is a top-k, cell
    assignment is map-only (see ivf_assign), probe selection is a
    map-only array_sort over the same broadcast centroid array, and the
    candidate join broadcasts the (tiny) probe set — the corpus is
    scanned exactly once with no shuffle until the final per-query
    top-k window over ~|corpus|·n_probe/k_centroids candidate rows.
    """
    centroids, assigned = ivf_assign(corpus, k_centroids, id_col, vec_col)
    return ivf_topk_from_index(
        centroids, assigned, queries, k, n_probe, id_col, vec_col
    )


def ivf_topk_from_index(
    centroids: DataFrame,
    assigned: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The probe+score half of :func:`ivf_topk`, taking a PRE-BUILT
    index — ``centroids`` (cell, c_vec) and ``assigned`` (id, vec,
    cell) — so a PERSISTED index (the deployment shape: ``assigned``
    stored partitioned by ``cell``) serves queries without refitting.
    When ``assigned`` is a cell-partitioned catalog table, the
    broadcast probe join triggers dynamic partition pruning: only the
    probed cells' files are read (asserted in tests/test_explain.py).
    """
    cents = centroids.agg(F.collect_list(F.struct("cell", "c_vec")).alias("cents"))
    q = unit_normalize(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")),
        "q_vec",
    )
    # cos desc, cell asc == struct(-cos, cell) asc; slice the first n_probe
    probes = (
        q.crossJoin(F.broadcast(cents))
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
            "q_vec",
            F.explode(
                F.transform(F.slice(F.col("__ranked"), 1, n_probe), lambda x: x["cell"])
            ).alias("cell"),
        )
    )
    cand = assigned.withColumnsRenamed({id_col: "neighbor_id", vec_col: "c_vec"})
    scored = (
        cand.join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", dot(F.col("q_vec"), F.col("c_vec")).alias("cos"))
    )
    wk = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round(F.col("cos"), 6).alias("cos"))
    )
