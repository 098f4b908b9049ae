"""Property-based operator invariants (SURVEY.md §5 item 4).

Hypothesis drives the *data*; each property is checked with one Spark
job over a generated micro-table. Spark-session startup dominates, so
examples are capped low — the point is adversarial value coverage
(NaN-free floats, duplicates, empty-ish strings), not volume.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from web_attack_detection_spark.functions.feature import (
    apply_imputer,
    apply_scaler,
    fit_imputer_mean,
    fit_scaler,
    fit_string_indexer,
)
from web_attack_detection_spark.io.sources import union_by_name
from web_attack_detection_spark.operators.dedup import exact_dedup

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)
maybe_null = st.one_of(st.none(), finite)


@given(vals=st.lists(maybe_null, min_size=2, max_size=40))
@_SETTINGS
def test_imputer_fills_all_nulls_preserves_nonnulls(spark, vals):
    if all(v is None for v in vals):
        return
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, x double")
    means = fit_imputer_mean(df, ["x"])
    out = apply_imputer(df, means).collect()
    assert all(r["x"] is not None for r in out)
    by_id = {r["id"]: r["x"] for r in out}
    nonnull = [v for v in vals if v is not None]
    mean = sum(nonnull) / len(nonnull)
    for i, v in enumerate(vals):
        if v is not None:
            assert by_id[i] == v  # preserved bit-exactly
        else:
            assert math.isclose(by_id[i], mean, rel_tol=1e-9)


# well-conditioned values only: with magnitudes spanning hundreds of
# orders (hypothesis will find 1e-159 next to 1e-264), EVERY one-pass
# stddev — Spark's co-moment aggregate and the naive recompute below —
# loses relative precision past any fixed tolerance; that is float
# arithmetic, not a scaler property.
conditioned = st.one_of(
    st.just(0.0),
    st.floats(min_value=1e-3, max_value=1e6, allow_nan=False, allow_infinity=False),
    st.floats(min_value=-1e6, max_value=-1e-3, allow_nan=False, allow_infinity=False),
)


@given(vals=st.lists(conditioned, min_size=3, max_size=40, unique=True))
@_SETTINGS
def test_scaler_output_unit_sample_stddev(spark, vals):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, x double")
    stats = fit_scaler(df, ["x"])
    out = [r["x_scaled"] for r in apply_scaler(df, stats).collect()]
    n = len(out)
    m = sum(out) / n
    var = sum((v - m) ** 2 for v in out) / (n - 1)
    # unique finite values → nonzero stddev → scaled sample stddev == 1
    assert math.isclose(math.sqrt(var), 1.0, rel_tol=1e-6)


@given(
    a=st.lists(st.integers(0, 100), min_size=0, max_size=30),
    b=st.lists(st.integers(0, 100), min_size=0, max_size=30),
)
@_SETTINGS
def test_union_row_count_additive(spark, a, b):
    da = spark.createDataFrame([(v,) for v in a], "x int") if a else spark.createDataFrame([], "x int")
    db = spark.createDataFrame([(v,) for v in b], "x int") if b else spark.createDataFrame([], "x int")
    assert union_by_name(da, db).count() == len(a) + len(b)


@given(vals=st.lists(st.text(alphabet="abc", min_size=0, max_size=3), min_size=1, max_size=40))
@_SETTINGS
def test_string_indexer_is_dense_permutation(spark, vals):
    """Indices are exactly 0..k-1 (dense), ordered by frequency desc
    then value asc — for ANY value distribution."""
    df = spark.createDataFrame([(v,) for v in vals], "c string")
    model = fit_string_indexer(df, "c").collect()
    idxs = sorted(r["idx"] for r in model)
    assert idxs == [float(i) for i in range(len(set(vals)))]
    from collections import Counter

    counts = Counter(vals)
    want = sorted(counts, key=lambda v: (-counts[v], v))
    got = [r["value"] for r in sorted(model, key=lambda r: r["idx"])]
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 1 << 40), st.sampled_from(["k1", "k2", "k3"])),
        min_size=1,
        max_size=40,
    )
)
@_SETTINGS
def test_exact_dedup_min_survivor_and_count(spark, rows):
    df = spark.createDataFrame(rows, "id long, key string")
    out = exact_dedup(df, ["key"], "id", with_counts=True).collect()
    from collections import defaultdict

    groups = defaultdict(list)
    for i, k in rows:
        groups[k].append(i)
    assert {r["key"]: (r["id"], r["n_copies"]) for r in out} == {
        k: (min(ids), len(ids)) for k, ids in groups.items()
    }


nonzero_vec = st.lists(
    st.floats(min_value=-100.0, max_value=100.0, allow_nan=False, allow_infinity=False),
    min_size=2,
    max_size=16,
).filter(lambda v: max(abs(x) for x in v) > 1e-6)


@given(vec=nonzero_vec)
@_SETTINGS
def test_int8_quantization_error_bound(spark, vec):
    """Symmetric int8 quantization invariants: every code in
    [-127, 127], at least one code hits ±127 (the scale is tight), and
    dequantization error per element is ≤ half a quantization step
    (max|x| / 254), the bound recall arguments rest on."""
    from web_attack_detection_spark.plans.similarity2 import _quant_arr

    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, vec)], "id long, e array<double>")
    [q] = df.select(_quant_arr(F.col("e")).alias("q")).first()
    assert all(-127 <= c <= 127 for c in q)
    m = max(abs(x) for x in vec)
    assert max(abs(c) for c in q) == 127
    step = m / 127.0
    for x, c in zip(vec, q):
        assert abs(x - c * step) <= step / 2 + 1e-9


@given(
    data=st.lists(
        st.lists(
            st.floats(min_value=-100, max_value=100, allow_nan=False, allow_infinity=False),
            min_size=4,
            max_size=4,
        ),
        min_size=6,
        max_size=30,
    ),
    k=st.integers(min_value=1, max_value=4),
)
@_SETTINGS
def test_native_pca_matches_mllib(spark, data, k):
    """fit_pca_native (Arrow-batch Gramian + driver eigensolve) must
    agree with MLlib's RowMatrix PCA on explained variance AND, up to
    per-axis sign, on the projection — for arbitrary well-conditioned
    inputs, not just the fixtures. Degenerate spectra (tied/zero
    eigenvalues) make axis ORDER ambiguous between eigensolvers, so
    axes are compared only where the variance gap is resolvable."""
    import numpy as np

    from web_attack_detection_spark.ml.pipeline import (
        fit_pca,
        fit_pca_native,
        pca_project,
    )

    arr = np.array(data, dtype=np.float64)
    if np.linalg.matrix_rank(np.cov(arr.T)) < 4:
        return  # rank-deficient: eigenvector basis not unique
    ev = np.linalg.eigvalsh(np.cov(arr.T))
    if np.min(np.diff(np.sort(ev))) < 1e-6 * max(np.max(ev), 1e-12):
        return  # near-tied eigenvalues: axis order/rotation ambiguous
    df = spark.createDataFrame([(row,) for row in data], "feats array<double>")
    nat = fit_pca_native(df, "feats", k, dim=4)
    ml = fit_pca(df, "feats", k)
    ev_nat = np.array(nat.explainedVariance)
    ev_ml = np.array(list(ml.explainedVariance))
    assert np.allclose(ev_nat, ev_ml, rtol=1e-6, atol=1e-9), (ev_nat, ev_ml)
    p_nat = np.array(
        nat.project(df, "feats").select("pca_features").toPandas()["pca_features"].tolist()
    )
    p_ml = np.array(
        pca_project(ml, df, "feats").select("pca_features").toPandas()["pca_features"].tolist()
    )
    for j in range(k):
        a, b = p_nat[:, j], p_ml[:, j]
        s = 1.0 if float(np.dot(a, b)) >= 0 else -1.0
        scale = max(float(np.abs(b).max()), 1e-9)
        assert np.allclose(a, s * b, rtol=1e-5, atol=1e-7 * scale), (j, a, b)


def test_morton_interleave_is_a_bijection():
    """The Z-order interleave must be invertible: distinct (x, y) pairs
    map to distinct z-values across the full 10-bit × 10-bit keyspace
    corners and a dense sub-grid — otherwise bucket stats would merge
    unrelated rectangles."""
    from web_attack_detection_spark.plans.relational10 import _BITS

    def z(x, y):
        out = 0
        for i in range(_BITS):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    pts = [(x, y) for x in range(32) for y in range(32)]
    pts += [(x, y) for x in (0, 511, 1023) for y in (0, 511, 1023)]
    zs = {z(x, y) for x, y in pts}
    assert len(zs) == len(set(pts))
    # locality: adjacent x at fixed y differ only in x-bits
    assert z(5, 9) ^ z(4, 9) == z(5, 0) ^ z(4, 0)


@given(
    st.lists(st.integers(min_value=1, max_value=2000), min_size=1, max_size=30)
)
@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
def test_sequence_packing_spans_are_gapless(spark, toks):
    """Packing invariants on arbitrary token counts: spans tile the
    concatenated stream with no gaps or overlaps, and n_seqs counts
    exactly the 512-token sequences each doc touches."""
    rows = [(i, "w " * (n - 1) + "w", "s0") for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")

    import web_attack_detection_spark.plans.text3 as t3
    from web_attack_detection_spark.io.sources import load_table as real_load

    t3.load_table = lambda *_a, **_k: df
    try:
        out = sorted(
            (r["doc_id"], r["n_tok"], r["start_off"], r["first_seq"], r["last_seq"], r["n_seqs"])
            for r in t3.text_pack_sequences(spark, "ignored").collect()
        )
    finally:
        t3.load_table = real_load
    cum = 0
    for doc_id, n_tok, start, first, last, nseq in out:
        assert n_tok == toks[doc_id]
        assert start == cum  # gapless tiling
        assert first == start // 512
        assert last == (start + n_tok - 1) // 512
        assert nseq == last - first + 1
        cum += n_tok


def test_pagerank_mass_bounded_and_positive(spark):
    """Rank sanity on the real fixture: every node's rank is positive,
    total rank mass cannot exceed 1 (dangling mass is dropped, not
    redistributed), and at least one node beats the teleport floor."""
    from web_attack_detection_spark.plans.relational10 import (
        _PR_SCALE,
        rel_pagerank_fixed,
    )
    from .conftest import SF_SMOKE

    rows = rel_pagerank_fixed(spark, SF_SMOKE).collect()
    total = sum(r["rank_scaled"] for r in rows)
    n = len(rows)
    floor = int(0.15 * _PR_SCALE / n)
    assert all(r["rank_scaled"] >= floor for r in rows)
    assert total <= _PR_SCALE
    assert max(r["rank_scaled"] for r in rows) > floor


@given(
    st.dictionaries(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs", "Cc")),
            min_size=1,
            max_size=12,
        ),
        st.lists(st.floats(allow_nan=False, allow_infinity=False,
                           min_value=-1e6, max_value=1e6),
                 min_size=1, max_size=20),
        min_size=1,
        max_size=4,
    )
)
@settings(max_examples=50, deadline=None, suppress_health_check=list(HealthCheck))
def test_svg_renderer_always_well_formed(series):
    """svg.py must emit parseable XML for arbitrary series names
    (including XML-hostile characters) and value ranges, with at least
    one polyline mark per series."""
    import xml.etree.ElementTree as ET

    from web_attack_detection_spark import svg

    out = svg.line_chart(series, "t<i&tle>")
    root = ET.fromstring(out)
    ns = "{http://www.w3.org/2000/svg}"
    assert root.tag == f"{ns}svg"
    assert sum(1 for _ in root.iter(f"{ns}polyline")) == len(series)
    bar = svg.bar_chart([(k, abs(v[0]) + 1) for k, v in series.items()], "b&ars")
    broot = ET.fromstring(bar)
    assert sum(1 for _ in broot.iter(f"{ns}rect")) >= len(series)


def test_interval_union_bounds(spark):
    """Coverage invariants on the fixture: per-user covered time is at
    most the sum of interval lengths (equality iff no overlaps) and at
    least the longest single interval; island count never exceeds the
    interval count."""
    from web_attack_detection_spark.io.sources import load_table
    from web_attack_detection_spark.plans.relational10 import rel_interval_union
    from .conftest import SF_SMOKE

    got = {r["user_id"]: r for r in rel_interval_union(spark, SF_SMOKE).collect()}
    ev = load_table(spark, SF_SMOKE, "events")
    per_user = {
        r["user_id"]: r
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_iv"),
            F.sum((F.col("event_id") % 120) * 60).alias("sum_len_s"),
            F.max((F.col("event_id") % 120) * 60).alias("max_len_s"),
        )
        .collect()
    }
    assert set(got) == set(per_user)
    for uid, r in got.items():
        p = per_user[uid]
        assert r["covered_seconds"] <= p["sum_len_s"]
        assert r["covered_seconds"] >= p["max_len_s"]
        assert 1 <= r["n_islands"] <= p["n_iv"]


def test_triangle_count_hand_cases(spark):
    """graph_triangle_count's orientation join on known graphs: K4
    (every node in 3 triangles), a path (no triangles), and a graph
    where the high-degree hub closes wedges in both edge orientations."""
    from pyspark.sql import functions as F

    from web_attack_detection_spark.plans import graphq

    def count_triangles(edge_pairs):
        e = spark.createDataFrame(edge_pairs, "u long, v long")
        orig = graphq._edges
        graphq._edges = lambda s, d: e
        try:
            rows = graphq.graph_triangle_count(spark, "unused").collect()
        finally:
            graphq._edges = orig
        return {r["n_nationkey"]: r["n_triangles"] for r in rows}

    # K4: 4 triangles total, each node on 3
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert count_triangles(k4) == {0: 3, 1: 3, 2: 3, 3: 3}
    # path 0-1-2-3: no triangles
    assert count_triangles([(0, 1), (1, 2), (2, 3)]) == {}
    # hub 0 connected to 1..4, plus edge (1,2) and (3,4):
    # triangles {0,1,2} and {0,3,4}; hub participates in both
    hub = [(0, i) for i in range(1, 5)] + [(1, 2), (3, 4)]
    assert count_triangles(hub) == {0: 2, 1: 1, 2: 1, 3: 1, 4: 1}


def test_kcore_peel_hand_case(spark):
    """graph_kcore_peel on a known graph: a K5 clique (the 4-core —
    every node keeps degree 4) with a pendant chain 6-1, 7-6 that
    must peel away in the first rounds."""
    from web_attack_detection_spark.plans import graphq2

    clique = [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]
    edges = clique + [(6, 1), (7, 6)]
    adj = spark.createDataFrame(
        [(a, b) for (a, b) in edges] + [(b, a) for (a, b) in edges],
        "a long, b long",
    )
    orig = graphq2._bip_adj
    graphq2._bip_adj = lambda s, d: adj
    try:
        rows = {r["node"]: r["core_degree"] for r in
                graphq2.graph_kcore_peel(spark, "unused").collect()}
    finally:
        graphq2._bip_adj = orig
    assert rows == {n: 4 for n in range(1, 6)}


def test_bfs_levels_bipartite_parity(spark):
    """BFS from suppliers alternates node types per level: even
    levels are suppliers (id >= 1e9), odd levels are customers —
    checked via the exact key checksum, and level 0 matches the
    nation-0 supplier count."""
    from web_attack_detection_spark.io.sources import load_table
    from web_attack_detection_spark.plans import all_plans  # noqa: F401
    from web_attack_detection_spark.plans.graphq2 import _SUPP_OFFSET
    from web_attack_detection_spark.plans.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = {r["level"]: r for r in
            QUERIES["graph_bfs_levels"].fn(spark, sf).collect()}
    sup = load_table(spark, sf, "supplier")
    mnk = sup.agg(F.min("s_nationkey")).first()[0]
    n0 = sup.filter(F.col("s_nationkey") == mnk).count()
    assert rows[0]["n_nodes"] == n0
    for lvl, r in rows.items():
        if lvl % 2 == 0:  # suppliers: every id carries the offset
            assert r["key_checksum"] >= _SUPP_OFFSET * r["n_nodes"]
        else:  # customers: ids all below the offset
            assert 0 < r["key_checksum"] < _SUPP_OFFSET * r["n_nodes"]


def test_adamic_adar_bounds_and_consistency(spark):
    """Every Adamic-Adar score is bounded by n_common/ln(2) (common
    neighbors have degree >= 2), and n_common agrees with
    graph_jaccard_neighbors on the pairs both queries emit."""
    from web_attack_detection_spark.plans import all_plans  # noqa: F401
    from web_attack_detection_spark.plans.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    aa = {(r["u"], r["v"]): r for r in
          QUERIES["graph_adamic_adar"].fn(spark, sf).collect()}
    assert aa, "fixture graph should produce common-neighbor pairs"
    for (u, v), r in aa.items():
        assert u < v
        assert r["n_common"] >= 2
        assert 0 < r["adamic_adar"] <= r["n_common"] / math.log(2) + 1e-9
    jac = {(r["u"], r["v"]): r["n_common"] for r in
           QUERIES["graph_jaccard_neighbors"].fn(spark, sf).collect()}
    shared = set(aa) & set(jac)
    assert shared, "the two wedge joins should overlap on this fixture"
    for p in shared:
        assert aa[p]["n_common"] == jac[p]


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(
            st.sampled_from("alpha beta gamma delta eps zeta eta theta".split()),
            min_size=3,
            max_size=12,
        ),
        min_size=2,
        max_size=8,
    ),
    st.integers(min_value=0, max_value=7),
)
def test_bloom_decontamination_never_false_negative(spark, docs, leak_idx):
    """The bloom guarantee on arbitrary data: every train doc sharing
    a 3-gram with the eval set MUST be bloom-flagged (exact hits are a
    subset of bloom hits) — false positives allowed, false negatives
    never. One eval doc is planted verbatim into train, so at least
    one true hit always exists when the eval doc has >= 3 tokens."""
    from web_attack_detection_spark.plans.text3 import _bloom_hashes, _grams3

    leak_idx = leak_idx % len(docs)
    ev_rows = [(1000, " ".join(docs[leak_idx]))]
    tr_rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    tr = spark.createDataFrame(tr_rows, "doc_id long, text string")
    ev = spark.createDataFrame(ev_rows, "doc_id long, text string")

    tr_g = _grams3(tr)
    ev_g = _grams3(ev).select("g").distinct()

    bloom = (
        _bloom_hashes(ev_g)
        .select(
            ((F.col("h") - F.col("h") % 32) / 32).cast("long").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(h % 32 AS INT))").alias("b"),
        )
        .groupBy("word")
        .agg(F.bit_or("b").alias("mask"))
    )
    pr = _bloom_hashes(tr_g).withColumn(
        "word", ((F.col("h") - F.col("h") % 32) / 32).cast("long")
    )
    bloom_hits = {
        (r["doc_id"], r["g"])
        for r in pr.join(F.broadcast(bloom), "word")
        .filter(F.expr("((mask >> CAST(h % 32 AS INT)) & 1) = 1"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("nb"))
        .filter(F.col("nb") == 3)
        .collect()
    }
    exact_hits = {
        (r["doc_id"], r["g"])
        for r in tr_g.join(ev_g, "g", "left_semi").collect()
    }
    assert exact_hits <= bloom_hits  # FN = 0, the bloom contract
    # the planted leak is detected whenever it has any 3-gram
    if len(docs[leak_idx]) >= 3:
        assert any(d == leak_idx for d, _ in exact_hits)
