"""Deduplication operators for training-data pipelines.

Four tiers, all DataFrame-native (no Python UDFs anywhere — every
hash is a JVM-side codegen'd expression; since round 7 the MinHash /
SimHash hashes are md5-slice based so DuckDB oracles can replay them,
xxhash64 remains where no oracle needs the hash):

- **exact**: group identical keys, keep the smallest id. One shuffle.
- **n-gram Jaccard** (exact near-dup): shingle → explode → self-join
  on shingle → per-pair intersection counts → Jaccard. Exact but
  O(pairs-sharing-a-shingle); the oracle-checkable ground truth the
  approximate tiers are tested against.
- **MinHash + LSH** (approximate near-dup at scale): k permutations
  via salted-md5-slice min-aggregation, banded into b buckets; only
  docs sharing a band bucket become candidate pairs. Linear shuffle
  volume; the 100 TB path.
- **SimHash**: 64-bit signature from per-token hash bit-votes;
  near-dups = signatures within a Hamming radius. Cheapest signature;
  pairs found by banding the signature bytes.

Scale notes: every step is explode → groupBy — linear in total
shingles, shuffle-partitioned by shingle/bucket, no driver state. Hot
shingles (stopword-only shingles shared by half the corpus) are the
skew risk: ``jaccard_pairs_exact`` drops shingles above a document-
frequency cap, the standard trick (they contribute negligible Jaccard
mass but quadratic pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    df: DataFrame, key_cols: list[str], id_col: str, with_counts: bool = False
) -> DataFrame:
    """Keep one row (smallest ``id_col``) per distinct ``key_cols``.

    `groupBy(key).min(id)` — ONE shuffle on the dedup key with map-side
    partial aggregation, strictly cheaper than the window-rank
    formulation (no sort). Returns (key_cols..., id_col[, n_copies]).
    """
    aggs = [F.min(id_col).alias(id_col)]
    if with_counts:
        aggs.append(F.count(F.lit(1)).alias("n_copies"))
    return df.groupBy(*key_cols).agg(*aggs)


def drop_exact_duplicates(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Full-row variant: keep the whole row of the smallest id per key.

    Window ``row_number`` over the key — same single shuffle, keeps all
    columns. (``dropDuplicates`` keeps an *arbitrary* row; training
    pipelines want a deterministic survivor.)
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(id_col).asc())
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------


def shingles(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Tokenize on whitespace, slide an n-window via ``F.sequence`` +
    ``F.transform`` + ``slice`` — all built-in array functions, no UDF.
    Documents shorter than n tokens produce their full token string as
    the single shingle (so they still participate).
    """
    toks = F.split(F.col(text_col), r"\s+")
    # n-grams as a zip_with chain over shifted arrays: acc_k[i] =
    # toks[i] " " ... " " toks[i+k]. Each step is ONE vectorized pass
    # over the array (concat_ws skips the null padding zip_with adds at
    # the tail), vs the per-position slice+array_join closure, which
    # re-materializes an n-element array per output shingle — measured
    # ~3.5× faster at sf0.1, byte-identical output.
    acc = toks
    for k in range(1, n):
        shifted = F.slice(toks, k + 1, F.greatest(F.size(toks) - k, F.lit(1)))
        acc = F.zip_with(acc, shifted, lambda x, y: F.concat_ws(" ", x, y))
    sh = F.when(
        F.size(toks) <= n - 1, F.array(F.array_join(toks, " "))
    ).otherwise(F.slice(acc, 1, F.size(toks) - (n - 1)))
    return (
        df.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def _scan_parallel(df: DataFrame) -> DataFrame:
    """io.sources.parallelize_scan over the operator's own session —
    the single-row-group fixture files scan as ONE partition, so the
    tokenize/shingle explode (the map-heavy front of every tool here)
    would run on one core (r10; measured 2.8-3.9 s → 1.3-2.1 s on the
    sf0.1 pair stage).  No-op on splittable inputs; all consumers
    aggregate exact integers, so output is partitioning-invariant."""
    from web_attack_detection_spark.io.sources import parallelize_scan

    return parallelize_scan(df.sparkSession, df)


# ---------------------------------------------------------------------------
# exact n-gram Jaccard pairs (ground truth; oracle-checkable)
# ---------------------------------------------------------------------------


def _shingle_pair_counts(sh: DataFrame) -> DataFrame:
    """|A∩B| for every unordered doc pair sharing ≥1 shingle:
    (id_a < id_b, n_common).

    One groupBy(shingle) with the pair expansion done IN PLACE on the
    per-shingle sorted id list (guide §2.3 "aggregate before you
    shuffle"): the shingle table crosses the wire once, as partial
    collect_list buffers, instead of twice as the probe+build sides of
    a self-join — and the SortMergeJoin's two sorts disappear.  The
    per-key work is unchanged: a hash join on ``shingle`` colocates a
    hot shingle's d rows (and its d²/2 output pairs) in one task
    exactly like the list form does, so the skew grain is identical;
    ``max_shingle_df`` (the callers' guard) bounds d either way.
    Counts are exact integers in both forms: the ids per (doc,
    shingle) are distinct by construction (array_distinct in
    :func:`shingles`), so each shared shingle contributes exactly one
    (id_a, id_b) row before the pair groupBy.

    The expansion is CHUNKED (VERDICT r10 #1): two chained Generates —
    posexplode the id list to (i, id_a) rows carrying the O(d) list,
    then explode each row's suffix slice — so the largest single value
    ever materialized is one d-element array.  The r10 form flattened
    the full d²/2 struct array into ONE aggregation-buffer value before
    its explode, which a corpus-wide hot shingle (an uncapped
    ``max_shingle_df=None`` call) could turn into a single-buffer OOM;
    the replaced self-join STREAMED its d² rows, and this form streams
    them again.  Pair multiset identical by construction: id_a = ids[i]
    paired with every later element, exactly the flatten's nesting."""
    ids = F.array_sort(F.collect_list("id"))
    return (
        sh.groupBy("shingle")
        .agg(ids.alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(F.col("ids"), F.posexplode("ids").alias("i", "id_a"))
        .select(
            "id_a",
            F.explode(
                F.slice(F.col("ids"), F.col("i") + F.lit(2), F.size("ids") - F.col("i") - F.lit(1))
            ).alias("id_b"),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )


def jaccard_pairs_exact(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """All pairs (id_a < id_b) with shingle-set Jaccard ≥ threshold.

    Inverted index: explode shingles, group by shingle and expand the
    co-occurring id pairs in place (:func:`_shingle_pair_counts` — one
    shuffle of the shingle table, not a two-sided self-join), count
    common shingles per pair, Jaccard = |∩| / (|A|+|B|-|∩|).
    ``max_shingle_df`` drops shingles appearing in more than that many
    docs before pairing — the skew guard that keeps the pair volume
    linear when a boilerplate shingle appears corpus-wide.

    Returns (id_a, id_b, jaccard) with jaccard rounded to 6 (exact
    rational k/n computed identically in any engine).
    """
    sh0 = shingles(_scan_parallel(df), text_col, id_col, n).cache()
    try:
        # eager localCheckpoints pin the derived relations so the shingle
        # cache is released before returning (ADVICE r1: repeated registry
        # invocations must not accumulate cached relations).
        sizes = (
            sh0.groupBy("id").agg(F.count(F.lit(1)).alias("sz")).localCheckpoint()
        )
        sh = sh0
        if max_shingle_df is not None:
            hot = sh0.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_"))
            sh = sh0.join(
                F.broadcast(hot.filter(F.col("df_") > max_shingle_df).select("shingle")),
                "shingle",
                "left_anti",
            )
        common = _shingle_pair_counts(sh).localCheckpoint()
    finally:
        sh0.unpersist()
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        common.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def containment_pairs_exact(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Ordered pairs (id_a != id_b) with shingle CONTAINMENT
    C(A→B) = |A∩B| / |A| ≥ threshold — the asymmetric companion to
    Jaccard: a short document quoted inside a long one scores high
    containment but low Jaccard, so symmetric dedup misses it. This is
    the quote/subset detector of a training-data pipeline (drop the
    contained copy, keep the superset doc). Same inverted-index join
    and skew discipline as :func:`jaccard_pairs_exact`; both
    directions of each unordered pair are evaluated, and only the
    direction(s) above threshold survive.
    """
    sh = shingles(_scan_parallel(df), text_col, id_col, n).cache()
    try:
        # localCheckpoint (eager) pins the two SMALL derived relations,
        # so the shingle cache can be released before returning instead
        # of accumulating in executor memory across registry invocations
        # (ADVICE r1).
        sizes = (
            sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz")).localCheckpoint()
        )
        # |A∩B| is symmetric: count the UNORDERED pairs once (half the
        # candidate volume of an id_a != id_b expansion), then emit
        # both directions of each count before the size join — the swap
        # is a cheap map over |pairs| rows.
        half = _shingle_pair_counts(sh).localCheckpoint()
    finally:
        sh.unpersist()
    common = half.unionByName(
        half.select(
            F.col("id_b").alias("id_a"),
            F.col("id_a").alias("id_b"),
            "n_common",
        )
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    return (
        common.join(F.broadcast(sa), "id_a")
        .withColumn(
            "containment",
            F.round(F.col("n_common") / F.col("sz_a").cast("double"), 6),
        )
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (the at-scale near-dedup path)
# ---------------------------------------------------------------------------


# Universal-hash MinHash permutations over a 31-bit md5-derived base:
# h_i(x) = (A[i]*x + B[i]) mod P with P = 2^31 - 1 (prime). Products
# stay < 2^62 (ANSI-safe, no wrapping needed) and every op has an
# exact DuckDB twin. Constants from a seeded PRNG, pinned at import.
MINHASH_P = 2_147_483_647
import random as _random

_rng = _random.Random(0xC0FFEE)
MINHASH_A = [(_rng.randrange(1, MINHASH_P) | 1) for _ in range(64)]
MINHASH_B = [_rng.randrange(0, MINHASH_P) for _ in range(64)]
del _rng


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, num_perm: int = 32
) -> DataFrame:
    """(id, sig: array<bigint>) — k-permutation MinHash.

    The permutation family is the textbook universal hash
    ``(A[i]*base + B[i]) mod (2^31 - 1)`` over a 31-bit base drawn
    from ``md5(shingle)`` — ONE md5 per shingle plus k three-op
    integer hashes, every step ENGINE-PORTABLE (round 7: the
    dedup_minhash_lsh oracle replays the signatures in DuckDB;
    xxhash64, the previous permutation hash, has no twin there).
    The signature element is the min over the doc's shingles.
    Computed as ONE groupBy over the exploded shingles with k
    min-aggregates — map-side combine makes the shuffle carry k longs
    per doc, independent of doc length.
    """
    sh = shingles(_scan_parallel(df), text_col, id_col, n)
    base = F.expr(
        "CAST(CONV(SUBSTRING(md5(CAST(shingle AS BINARY)), 1, 8), 16, 10)"
        f" AS BIGINT) & {MINHASH_P}"
    )
    sh = sh.withColumn("hb", base)
    aggs = [
        F.min(
            (F.col("hb") * F.lit(MINHASH_A[i]) + F.lit(MINHASH_B[i]))
            % F.lit(MINHASH_P)
        ).alias(f"h{i}")
        for i in range(num_perm)
    ]
    sig = sh.groupBy("id").agg(*aggs)
    return sig.select("id", F.array(*[f"h{i}" for i in range(num_perm)]).alias("sig"))


def minhash_candidate_pairs(
    signatures: DataFrame, bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """LSH banding: docs sharing any band-hash become candidates.

    Explode the signature into ``bands`` slices, hash each slice, and
    self-join on (band_idx, band_hash). Shuffle volume is
    bands × |docs| rows — linear. Bucket sizes are bounded in practice;
    a degenerate corpus (all-identical docs) degrades to the true
    duplicate-pair count, which is the desired output anyway.
    """
    b = signatures.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        # the band key only needs EQUALITY of the slice:
                        # a delimited string concat is engine-portable
                        # (round 7) where xxhash64 was not
                        F.concat_ws(
                            ",",
                            *[
                                F.col("sig")[j]
                                for j in range(
                                    i * rows_per_band, (i + 1) * rows_per_band
                                )
                            ],
                        ).alias("bh"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    left = b.select(F.col("id").alias("id_a"), "band", "bh")
    right = b.select(F.col("id").alias("id_b"), "band", "bh")
    return (
        left.join(right, ["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Candidates via LSH banding, then *verified* by estimated Jaccard
    (fraction of matching signature elements ≥ threshold). Returns
    (id_a, id_b, est_jaccard). The estimate-verify step kills the LSH
    false positives without touching the raw text again.
    """
    rows_per_band = num_perm // bands
    sig = minhash_signatures(df, text_col, id_col, n, num_perm).cache()
    try:
        cand = minhash_candidate_pairs(sig, bands, rows_per_band)
        sa = sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
        sb = sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
        est = (
            F.size(
                F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda z: z)
            )
            / F.lit(float(num_perm))
        )
        # eager localCheckpoint pins the small verified-pair result so the
        # signature cache is released before returning (ADVICE r1)
        return (
            cand.join(sa, "id_a")
            .join(sb, "id_b")
            .withColumn("est_jaccard", F.round(est, 6))
            .filter(F.col("est_jaccard") >= threshold)
            .select("id_a", "id_b", "est_jaccard")
            .localCheckpoint()
        )
    finally:
        sig.unpersist()


# ---------------------------------------------------------------------------
# connected components (group collapse — the final stage of near-dedup)
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    driver_threshold: int = 2_000_000,
) -> DataFrame:
    """(id, component) for every node in the pair graph; component =
    the minimum node id reachable from it.

    Near-dup pair lists (MinHash/SimHash/cosine) are not a dedup result
    by themselves — A~B and B~C must collapse into ONE group {A,B,C}
    even when A~C was never emitted. That collapse is connected
    components; the survivor is then one doc per component.

    Size-adaptive, like production dedup pipelines: the pair graph is
    ALWAYS tiny relative to the corpus (only near-dup nodes appear in
    it), so when it fits on the driver (≤ ``driver_threshold`` RAW
    input pairs — counted as given, duplicates included, roughly half
    the doubled-distinct edge count an earlier revision gated on;
    a few hundred MB) a single-pass union-find answers exactly —
    iterating Spark jobs over a thousand-edge graph buys nothing but
    scheduler overhead. Above the threshold, distributed min-label
    propagation takes over; both produce identical labels.

    Distributed algorithm: each round every node takes the min label
    among itself and its neighbors — the standard scalable union-find
    on Spark. Rounds = graph diameter, and near-dup components are
    small/dense in practice, so 3-5 rounds converge. Each round is one
    shuffle of |edges| rows; ``localCheckpoint`` truncates the lineage
    so the plan doesn't grow exponentially across iterations (the
    classic iterative-DataFrame trap). Convergence is detected by a
    changed-label count.
    """
    # checkpoint the RAW pair list first: the pair plan (typically an
    # expensive shingle self-join) must evaluate exactly once — the
    # doubled edge list both paths conceptually use would otherwise
    # re-run it per union branch. Union-find is symmetric, so the
    # driver path consumes the raw pairs directly; only distributed
    # propagation needs the (cheap, post-checkpoint) doubled copy.
    raw = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .localCheckpoint()
    )
    n_raw = raw.count()
    if n_raw <= driver_threshold:
        edges = raw
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        # fetch strategy: toLocalIterator schedules ~ONE JOB PER
        # PARTITION — over a 136-partition pair plan that is seconds of
        # pure scheduler overhead for a hundred edges (measured 7 s).
        # Small edge lists (≤200k pairs ≈ a few MB of longs) collect in
        # one job; larger ones stream, but over a coalesced handful of
        # partitions so the job count stays bounded.
        if n_raw <= 200_000:
            edge_iter = edges.collect()
        else:
            edge_iter = edges.coalesce(16).toLocalIterator()
        for r in edge_iter:
            u, v = r.u, r.v
            parent.setdefault(u, u)
            parent.setdefault(v, v)
            ru, rv = find(u), find(v)
            if ru != rv:  # min id becomes the root → min-label semantics
                if rv < ru:
                    ru, rv = rv, ru
                parent[rv] = ru
        rows = [(x, find(x)) for x in parent]
        return edges.sparkSession.createDataFrame(
            rows, "id long, component long"
        )
    edges = (
        raw.unionByName(raw.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = edges.select(F.col("u").alias("id")).distinct().withColumn("lbl", F.col("id"))

    def one_hop(lbls):
        nbr = (
            edges.join(lbls.withColumnRenamed("id", "u"), "u")
            .groupBy(F.col("v").alias("id"))
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        return lbls.join(nbr, "id", "left").select(
            "id",
            F.least("lbl", F.coalesce("nbr_lbl", "lbl")).alias("lbl"),
            (F.coalesce("nbr_lbl", "lbl") < F.col("lbl")).cast("int").alias("__chg"),
        )

    # two propagation hops per materialization: in local mode (and on a
    # busy cluster scheduler) the per-job fixed cost dominates these
    # tiny-graph iterations, so halving the action count ≈ halves the
    # wall-clock; lineage depth stays bounded at 2 hops per checkpoint.
    # The changed flag of the SECOND hop alone decides convergence.
    for _ in range(max(max_iter // 2, 1)):
        hopped = one_hop(one_hop(labels).drop("__chg")).localCheckpoint()
        changed = hopped.agg(F.sum("__chg")).first()[0] or 0
        labels = hopped.drop("__chg")
        if changed == 0:
            break
    return labels.select("id", F.col("lbl").alias("component"))


def near_dup_groups(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Collapse a near-dup pair graph into groups: one row per
    component with (component, n_members). The survivor of each group
    is the component id itself (min member id — deterministic)."""
    cc = connected_components(pairs, id_a, id_b)
    return cc.groupBy("component").agg(F.count(F.lit(1)).alias("n_members"))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, simhash: bigint) — 64-bit SimHash over whitespace tokens.

    Each token votes ±1 on each of 64 bit positions according to its
    64-bit token hash; the signature bit is the vote sign. Expressed
    as explode → 64 conditional-sum aggregates → bit reassembly; all
    JVM-side. The token hash is the first 16 hex chars of md5 (two
    32-bit conv halves packed hi<<32|lo — Java shiftleft, no ANSI
    overflow check) — ENGINE-PORTABLE since round 7, so the
    dedup_simhash oracle replays the whole signature pipeline in
    DuckDB (xxhash64, the previous hash, has no twin there)."""
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(F.split(F.col(text_col), r"\s+")).alias("tok")
    ).withColumn(
        "h",
        F.expr(
            "SHIFTLEFT(CAST(CONV(SUBSTRING(md5(CAST(tok AS BINARY)), 1, 8), 16, 10) AS BIGINT), 32)"
            " | CAST(CONV(SUBSTRING(md5(CAST(tok AS BINARY)), 9, 8), 16, 10) AS BIGINT)"
        ),
    )
    # compress repeated tokens FIRST: the bit-vote expressions then
    # run over |distinct (doc, token)| rows instead of |tokens| rows —
    # the expression evaluation dominates, so duplicate-heavy corpora
    # (natural language is) get a proportional speedup. Votes weighted
    # by the count are identical to per-occurrence ±1 votes.
    cnts = toks.groupBy("id", "h").agg(F.count(F.lit(1)).alias("cnt"))
    # Lane packing + SQL-string expressions. Packing 3 bit-votes per
    # long in 21-bit lanes turns 64 conditional sums into 22 packed
    # sums + one total: v_i = 2*S_i - T with S_i = Σ cnt·bit_i, so the
    # sign test v_i > 0 becomes 2*S_i > T. Lanes never carry into each
    # other while a doc has < 2^21 (≈2M) tokens; ANSI mode would throw
    # loudly on overflow rather than corrupt. The expressions are
    # assembled as SQL STRINGS because building ~700 Column objects
    # costs ~2 s of driver-side Py4J round-trips per plan — one
    # F.expr parse is milliseconds and yields the identical plan.
    lanes, width = 3, 21
    mask = (1 << width) - 1
    n_longs = (64 + lanes - 1) // lanes
    packs = []
    for j in range(n_longs):
        terms = [
            f"SHIFTLEFT(SHIFTRIGHT(h, {i}) & 1, {lane * width})"
            for lane in range(lanes)
            if (i := j * lanes + lane) < 64
        ]
        packs.append(F.expr(f"SUM(cnt * ({' + '.join(terms)}))").alias(f"s{j}"))
    votes = cnts.groupBy("id").agg(F.expr("SUM(cnt)").alias("t"), *packs)
    sig_terms = []
    for i in range(64):
        j, lane = divmod(i, lanes)
        s_i = f"(SHIFTRIGHT(s{j}, {lane * width}) & {mask})"
        sig_terms.append(f"SHIFTLEFT(CAST(2 * {s_i} > t AS BIGINT), {i})")
    return votes.select("id", F.expr(" | ".join(sig_terms)).alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    bands: int = 4,
    sig_df: DataFrame | None = None,
) -> DataFrame:
    """Near-dups = SimHash Hamming distance ≤ ``max_hamming``.

    Pigeonhole banding: split the 64-bit signature into ``bands``
    16-bit chunks; any pair within distance ≤ bands-1 shares at least
    one exact chunk → equi-join per chunk, then verify the full
    Hamming distance with ``bit_count(xor)``. Linear shuffle, no O(n²).

    ``sig_df`` (id, simhash), if given, supplies a PRE-COMPUTED
    signature relation — callers that also audit against the exact
    all-pairs relation (dedup_simhash) hash the corpus once.
    """
    width = 64 // bands
    mask = (1 << width) - 1
    sig = sig_df if sig_df is not None else simhash64(df, text_col, id_col)
    chunks = sig.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("simhash"), i * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("c"),
    ).select("id", "simhash", F.col("c.band").alias("band"), F.col("c.chunk").alias("chunk"))
    left = chunks.select(F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), "band", "chunk")
    right = chunks.select(F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), "band", "chunk")
    return (
        left.join(right, ["band", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
