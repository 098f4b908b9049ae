"""Unigram-LM trainer: hypothesis proofs for the packed-integer
Viterbi + smallest-k backtrace, twin parity for the hard-EM trainer,
and the trained-vocab -> segmenter round trip (VERDICT r7 #2).

The load-bearing claim: the Spark trainer (plans/text6.text_unigram_train),
its DuckDB oracle, and functions/unigram.unigram_train_py are THREE
implementations of one algorithm whose every arithmetic step is exact
integers (packed dp) or a single pinned float idiom (ROUND(1e6*ln)),
so they agree value-for-value. The oracle side is checked by the
registry sweep; this file pins Spark == Python and the DP's optimality.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from web_attack_detection_spark.functions import unigram

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# pure-Python: Viterbi + backtrace vs brute-force enumeration
# ---------------------------------------------------------------------------


def _enumerate_segs(w: str, costs: dict, max_gram: int, fb: int):
    """All valid segmentations with their packed costs (exponential —
    words kept short by the strategy)."""
    if not w:
        yield 0, []
        return
    for k in range(1, min(max_gram, len(w)) + 1):
        piece = w[len(w) - k :]
        if piece in costs:
            step = costs[piece] * unigram.PACK + 1
        elif k == 1:
            step = fb * unigram.PACK + 1
        else:
            continue
        for packed, rest in _enumerate_segs(w[: len(w) - k], costs, max_gram, fb):
            yield packed + step, rest + [piece]


@given(
    w=st.text(alphabet="ab", min_size=1, max_size=8),
    vocab=st.dictionaries(
        st.text(alphabet="ab", min_size=1, max_size=4),
        st.integers(min_value=0, max_value=5_000_000),
        max_size=12,
    ),
)
@settings(max_examples=300, deadline=None)
def test_viterbi_backtrace_equals_bruteforce(w, vocab):
    """The packed dp finds the true minimum over ALL segmentations, and
    the smallest-k backtrace returns exactly the brute-force tie-break
    winner: min (packed, reversed piece-length tuple)."""
    fb = 9_000_000  # distinct from vocab costs so fallback paths rank
    packed, pieces = unigram.viterbi_pieces_py(w, vocab, 4, fb)
    assert "".join(pieces) == w
    best = min(
        _enumerate_segs(w, vocab, 4, fb),
        key=lambda t: (t[0], tuple(len(p) for p in reversed(t[1]))),
    )
    assert packed == best[0]
    assert pieces == best[1]


@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=6), min_size=1, max_size=12
    )
)
@settings(max_examples=150, deadline=None)
def test_trainer_twin_invariants(words):
    """Trainer twin on arbitrary corpora: every kept piece was really
    used (uses > 0), sizes shrink by PRUNE per round, costs are the
    pinned quantization of the kept mass, ordering is (uses desc,
    piece asc)."""
    wc: dict[str, int] = {}
    for w in words:
        wc[w] = wc.get(w, 0) + 1
    k_seed, prune, rounds = 12, 2, 3
    table = unigram.unigram_train_py(wc, k_seed, prune, rounds)
    assert 1 <= len(table) <= k_seed - rounds * prune
    tot = sum(u for _, u, _ in table)
    for g, u, c in table:
        assert u > 0
        assert c == unigram._round_half_up(1e6 * __import__("math").log(tot / u))
    keys = [(-u, g) for g, u, _ in table]
    assert keys == sorted(keys)


# ---------------------------------------------------------------------------
# Spark == twin on the real corpus + trained-vocab round trip
# ---------------------------------------------------------------------------


def _word_counts(sf: str) -> dict[str, int]:
    import duckdb

    rows = duckdb.sql(
        f"SELECT text FROM '{sf}/documents.parquet'"
    ).fetchall()
    wc: dict[str, int] = {}
    for (text,) in rows:
        for w in re.split(r"\s+", text):
            if 1 <= len(w) <= 64:
                wc[w] = wc.get(w, 0) + 1
    return wc


def test_spark_trainer_matches_python_twin(spark):
    from web_attack_detection_spark.plans import all_plans  # noqa: F401
    from web_attack_detection_spark.plans import text6
    from web_attack_detection_spark.plans.registry import QUERIES

    got = [
        (r["piece"], r["uses"], r["cost_unat"])
        for r in QUERIES["text_unigram_train"].fn(spark, SF).collect()
    ]
    want = unigram.unigram_train_py(
        _word_counts(SF), text6._UT_K, text6._UT_PRUNE, text6._UT_ROUNDS
    )
    assert got == want
    # the final LIMIT caps the vocab; a small corpus may use fewer pieces
    assert 1 <= len(got) <= text6._UT_K - text6._UT_ROUNDS * text6._UT_PRUNE


def test_trained_vocab_roundtrip_segments_corpus(spark):
    """The trained vocabulary FEEDS the segmenter: running the shared
    dp + backtrace folds with the trained costs over the corpus's
    distinct words reconstructs every word exactly and agrees with the
    Python Viterbi word-for-word (packed cost AND pieces)."""
    from pyspark.sql import functions as F

    from web_attack_detection_spark.plans import all_plans  # noqa: F401
    from web_attack_detection_spark.plans.text6 import _ut_trained

    costs, _ = _ut_trained(spark, SF)
    wc = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(F.explode(F.split("text", r"\s+")).alias("w"))
        .filter((F.length("w") >= 1) & (F.length("w") <= 64))
        .distinct()
    )
    seg = wc.select(
        "w", unigram.dp_expr(costs).alias("dps")
    ).select(
        "w",
        F.element_at(F.col("dps"), F.length("w") + 1).alias("packed"),
        unigram.pieces_expr(costs).alias("pieces_rev"),
    )
    rows = seg.collect()
    assert rows
    for r in rows:
        pieces = list(reversed(r["pieces_rev"]))
        assert "".join(pieces) == r["w"]
        packed_py, pieces_py = unigram.viterbi_pieces_py(r["w"], costs)
        assert r["packed"] == packed_py
        assert pieces == pieces_py


def test_unigram_encode_conservation(spark):
    """text_unigram_encode: every document reconstructs exactly from
    its backtraced pieces, token counts are positive and bounded by
    character counts, and the per-doc word counts sum to the corpus's
    filtered word population."""
    from web_attack_detection_spark.plans import all_plans  # noqa: F401
    from web_attack_detection_spark.plans.registry import QUERIES

    rows = QUERIES["text_unigram_encode"].fn(spark, SF).collect()
    assert rows
    total_words = 0
    for r in rows:
        assert r["reconstruct_ok"] is True
        assert 0 < r["n_tokens"]
        assert r["n_words"] <= r["n_tokens"]  # >= 1 piece per word
        total_words += r["n_words"]
    want = sum(
        1
        for w, c in _word_counts(SF).items()
        for _ in range(c)
    )
    assert total_words == want
