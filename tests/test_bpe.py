"""Full BPE trainer (functions/bpe.py, plans/text6.py).

The load-bearing claim is the representation trick: one sequential
non-overlapping ``replace`` on the US-wrapped symbol string must equal
classic BPE's greedy in-word merge scan.  Python's ``str.replace``,
Java's ``String.replace`` (Spark), and DuckDB's ``replace`` share
those semantics, so the hypothesis proof below over Python transfers;
Spark==DuckDB is additionally pinned by the registered oracles, and
Spark==pure-Python end-to-end by the fixture test here.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from web_attack_detection_spark.functions import bpe

US = bpe.US


def _wrap(syms):
    return US + (US + US).join(syms) + US


def _unwrap(seq):
    return tuple(seq[1:-1].split(US + US)) if len(seq) > 2 else (seq[1:-1],)


# symbols drawn from a tiny alphabet so multi-char merged symbols,
# repeated-pair overlaps ("aaa"), and prefix-shadowing ("a" vs "ab")
# all occur constantly
_sym = st.text(alphabet="ab", min_size=1, max_size=3)


@given(
    syms=st.lists(_sym, min_size=1, max_size=12),
    left=_sym,
    right=_sym,
)
@settings(max_examples=300, deadline=None)
def test_wrapped_replace_equals_greedy_merge(syms, left, right):
    """replace(wrapped, US+l+US+US+r+US, US+lr+US) == the reference
    while-loop merge, for arbitrary symbol sequences and pairs."""
    got = _unwrap(
        _wrap(syms).replace(US + left + US + US + right + US, US + left + right + US)
    )
    want = bpe.merge_word_py(tuple(syms), left, right)
    assert got == want


@given(
    words=st.dictionaries(
        st.text(alphabet="abc", min_size=1, max_size=6),
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=8,
    ),
    n_rounds=st.integers(min_value=1, max_value=8),
)
@settings(max_examples=150, deadline=None)
def test_replace_chain_trainer_equals_reference_trainer(words, n_rounds):
    """A pure-Python trainer that uses the replace-chain state update
    (exactly what Spark and DuckDB execute) must produce the same
    merges and final state as the reference tuple-based trainer."""
    from collections import Counter

    state = {w: _wrap(list(w)) for w in words}
    merges = []
    for r in range(1, n_rounds + 1):
        pc: Counter = Counter()
        for w, seq in state.items():
            syms = _unwrap(seq)
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += words[w]
        pc = Counter({k: v for k, v in pc.items() if v >= bpe.MIN_FREQ})
        if not pc:
            break
        (l, rr), freq = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((r, l, rr, l + rr, freq))
        pat, rep = US + l + US + US + rr + US, US + l + rr + US
        state = {w: s.replace(pat, rep) for w, s in state.items()}
    ref_merges, ref_state = bpe.bpe_train_py(words, n_rounds=n_rounds)
    assert merges == ref_merges
    assert {w: _unwrap(s) for w, s in state.items()} == ref_state


def test_spark_trainer_matches_python_twin_on_fixture(spark):
    """End-to-end: the distributed trainer over sf0.001 documents ==
    the pure-Python reference trainer over the same word counts."""
    from collections import Counter

    from pyspark.sql import functions as F

    from web_attack_detection_spark.io.sources import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    words = docs.select(F.explode(F.split("text", r"\s+")).alias("w"))
    merges, state = bpe.bpe_train(words)
    wc = Counter(
        r["w"] for r in words.filter(F.length("w") >= 1).collect()
    )
    py_merges, py_state = bpe.bpe_train_py(dict(wc))
    assert merges == py_merges
    got = {
        r["w"]: tuple(r["t"])
        for r in state.select("w", bpe.tokens_expr().alias("t")).collect()
    }
    assert got == py_state
    # BPE frequency invariant: a merged symbol's new pairs were all
    # sub-occurrences of existing pairs, so per-round max freq never
    # increases
    freqs = [m[4] for m in merges]
    assert all(a >= b for a, b in zip(freqs, freqs[1:]))
    assert [m[0] for m in merges] == list(range(1, len(merges) + 1))


def test_trainer_state_lineage_stays_flat(spark):
    """VERDICT r6 #1 'done' bar: no per-round lineage growth — after
    20 rounds the state's optimized plan must be rooted at the last
    round's localCheckpoint scan, not a 20-round expression chain."""
    from pyspark.sql import functions as F

    from web_attack_detection_spark.io.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    words = docs.select(F.explode(F.split("text", r"\s+")).alias("w"))
    _, state = bpe.bpe_train(words)
    state.count()  # materialize the final checkpoint
    plan = state._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan or "Scan ExistingRDD" in plan
    # one replace projection on top of the penultimate checkpoint at
    # most — never a chain of them
    assert plan.count("Project") <= 1, plan


@pytest.mark.parametrize("qname", ["text_bpe_encode"])
def test_encode_conservation(spark, qname):
    from web_attack_detection_spark.plans import all_plans  # noqa: F401
    from web_attack_detection_spark.plans.registry import QUERIES

    rows = QUERIES[qname].fn(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r["reconstruct_ok"] is True
        assert r["n_words"] <= r["n_tokens"] <= r["n_chars"]


def test_oov_encode_matches_python_twin_and_vocab_state(spark):
    """encode_words_expr (the chained-replace serving path, no join)
    must (a) equal the pure-Python twin on UNSEEN words and (b) equal
    the trainer's final state on in-vocabulary words."""
    from pyspark.sql import functions as F

    from web_attack_detection_spark.io.sources import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    words = docs.select(F.explode(F.split("text", r"\s+")).alias("w"))
    merges, state = bpe.bpe_train(words)
    assert merges

    oov = ["lowestest", "abcabcabc", "zzzz", "a", "the", "quickbrown"]
    df = spark.createDataFrame([(w,) for w in oov], "w string")
    got = {
        r["w"]: tuple(r["t"])
        for r in df.select(
            "w", bpe.encode_words_expr(F.col("w"), merges).alias("seq")
        )
        .select("w", bpe.tokens_expr().alias("t"))
        .collect()
    }
    for w in oov:
        assert got[w] == bpe.encode_word_py(w, merges), w

    vocab = state.select(
        "w",
        bpe.tokens_expr().alias("t_state"),
    ).withColumn("seq2", bpe.encode_words_expr(F.col("w"), merges))
    mismatch = vocab.filter(
        F.col("seq2")
        != F.concat(
            F.lit(bpe.US),
            F.array_join(F.col("t_state"), bpe.US + bpe.US),
            F.lit(bpe.US),
        )
    ).count()
    assert mismatch == 0


# ---------------------------------------------------------------------------
# WordPiece trainer
# ---------------------------------------------------------------------------


def test_wordpiece_merge_sym_rule():
    """The '##' concatenation rule: merging (l, ##r) strips the
    continuation marker from the right symbol and keeps l's prefix
    status (bare or ##)."""
    from web_attack_detection_spark.functions.bpe import _wp_merge_sym

    assert _wp_merge_sym("a", "##b") == "ab"
    assert _wp_merge_sym("##a", "##b") == "##ab"
    assert _wp_merge_sym("ab", "##cd") == "abcd"
    # a bare right symbol (never produced by wrap_wordpiece, but the
    # rule must still be total) concatenates unchanged
    assert _wp_merge_sym("a", "b") == "ab"


@given(
    words=st.dictionaries(
        st.text(alphabet="abc", min_size=1, max_size=6),
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=8,
    ),
    n_rounds=st.integers(min_value=1, max_value=6),
)
@settings(max_examples=150, deadline=None)
def test_wp_replace_chain_equals_tuple_trainer(words, n_rounds):
    """The wrapped-replace state update with '##' continuations ==
    the tuple-based WordPiece reference trainer (likelihood score,
    same tie-break) — the WP twin of the BPE replace==greedy proof."""
    from collections import Counter

    from web_attack_detection_spark.functions.bpe import _wp_merge_sym

    state = {
        w: _wrap([c if i == 0 else "##" + c for i, c in enumerate(w)])
        for w in words
    }
    merges = []
    for r in range(1, n_rounds + 1):
        pc: Counter = Counter()
        sc: Counter = Counter()
        for w, seq in state.items():
            syms = _unwrap(seq)
            for s in syms:
                sc[s] += words[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += words[w]
        scored = {
            k: float(v) / (float(sc[k[0]]) * float(sc[k[1]]))
            for k, v in pc.items()
            if v >= bpe.MIN_FREQ
        }
        if not scored:
            break
        (l, rr) = min(scored, key=lambda k: (-scored[k], k[0], k[1]))
        merged = _wp_merge_sym(l, rr)
        merges.append((r, l, rr, merged, pc[(l, rr)], scored[(l, rr)]))
        pat, rep = US + l + US + US + rr + US, US + merged + US
        state = {w: s.replace(pat, rep) for w, s in state.items()}
    ref_merges, ref_state = bpe.wordpiece_train_py(words, n_rounds=n_rounds)
    assert merges == ref_merges
    assert {w: _unwrap(s) for w, s in state.items()} == ref_state


def test_spark_wordpiece_matches_python_twin_on_fixture(spark):
    """End-to-end: the distributed WordPiece trainer over sf0.001
    documents == the pure-Python reference trainer (merges, scores,
    and final state), and every merge rank is dense."""
    from collections import Counter

    from pyspark.sql import functions as F

    from web_attack_detection_spark.io.sources import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    words = docs.select(F.explode(F.split("text", r"\s+")).alias("w"))
    merges, state = bpe.wordpiece_train(words)
    wc = Counter(r["w"] for r in words.filter(F.length("w") >= 1).collect())
    py_merges, py_state = bpe.wordpiece_train_py(dict(wc))
    assert merges == py_merges
    got = {
        r["w"]: tuple(r["t"])
        for r in state.select("w", bpe.tokens_expr().alias("t")).collect()
    }
    assert got == py_state
    assert [m[0] for m in merges] == list(range(1, len(merges) + 1))
    # every continuation symbol in the final state still carries ##
    for syms in got.values():
        for i, s in enumerate(syms):
            assert s.startswith("##") == (i > 0), syms


def test_wordpiece_encode_conservation(spark):
    """text_wordpiece_encode: every document reconstructs exactly
    after stripping separators + symbol-start '##' markers, and token
    counts are bounded by char counts."""
    from web_attack_detection_spark.plans import all_plans  # noqa: F401
    from web_attack_detection_spark.plans.registry import QUERIES

    rows = QUERIES["text_wordpiece_encode"].fn(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r["reconstruct_ok"], r
        assert 0 < r["n_words"] <= r["n_tokens"] <= r["n_chars"], r


def test_wp_oov_encode_matches_python_twin_and_vocab_state(spark):
    """The WordPiece OOV serving path (chained-replace projection, no
    join) must equal the pure-Python twin on UNSEEN words and the
    trainer's final state on in-vocab words."""
    from pyspark.sql import functions as F

    from web_attack_detection_spark.io.sources import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    words = docs.select(F.explode(F.split("text", r"\s+")).alias("w"))
    merges, state = bpe.wordpiece_train(words)

    oov = ["unseenword", "zzzzq", "a", "prefixation", "the"]
    df = spark.createDataFrame([(w,) for w in oov], "w string").withColumn(
        "seq", bpe.wp_encode_words_expr(F.col("w"), merges)
    )
    got = {
        r["w"]: tuple(r["t"])
        for r in df.select(
            "w",
            F.split(
                F.expr("substring(seq, 2, length(seq) - 2)"), bpe.US + bpe.US, -1
            ).alias("t"),
        ).collect()
    }
    for w in oov:
        assert got[w] == bpe.wp_encode_word_py(w, merges), w
    # in-vocab: serving path == trainer final state
    vocab_rows = state.select("w", bpe.tokens_expr().alias("t")).limit(50).collect()
    vdf = spark.createDataFrame([(r["w"],) for r in vocab_rows], "w string")
    served = {
        r["w"]: tuple(r["t"])
        for r in vdf.withColumn("seq", bpe.wp_encode_words_expr(F.col("w"), merges))
        .select(
            "w",
            F.split(
                F.expr("substring(seq, 2, length(seq) - 2)"), bpe.US + bpe.US, -1
            ).alias("t"),
        )
        .collect()
    }
    for r in vocab_rows:
        assert served[r["w"]] == tuple(r["t"]), r["w"]


def test_unigram_segment_dp_equals_bruteforce(spark):
    """text_unigram_segment's packed-integer Viterbi really finds the
    minimum-cost segmentation: for every distinct word of <= 8 chars
    at sf0.001, the DP result (replayed via the oracle's wseg state)
    equals a brute-force enumeration over all segmentations with the
    same vocabulary costs — and the per-doc query output is
    consistent with it."""
    import duckdb

    from web_attack_detection_spark.plans import all_plans  # noqa: F401
    from web_attack_detection_spark.plans.registry import QUERIES
    from web_attack_detection_spark.plans.text6 import (
        _UNI_FB,
        _UNI_MAXG,
        _uni_oracle,
    )

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    oracle = _uni_oracle()
    head = oracle[: oracle.rindex("), docw AS")] + ")"
    vocab = dict(con.execute(head + "\nSELECT gram, cost FROM vocab").fetchall())
    wseg = dict(
        con.execute(head + "\nSELECT w, comb FROM wseg WHERE length(w) <= 8").fetchall()
    )
    assert len(vocab) == 200 and wseg

    def brute(w: str):
        best = None
        def rec(i, cost, ntok):
            nonlocal best
            if i == len(w):
                cand = (cost, ntok)
                if best is None or cand < best:
                    best = cand
                return
            for k in range(1, min(_UNI_MAXG, len(w) - i) + 1):
                g = w[i : i + k]
                if g in vocab:
                    rec(i + k, cost + vocab[g], ntok + 1)
                elif k == 1:
                    rec(i + 1, cost + _UNI_FB, ntok + 1)
        rec(0, 0, 0)
        return best

    for w, comb in list(wseg.items()):
        cost, ntok = comb // 1024, comb % 1024
        assert (cost, ntok) == brute(w), w
    # per-doc output consistency
    rows = QUERIES["text_unigram_segment"].fn(spark, sf).collect()
    assert rows
    for r in rows:
        assert r["n_words"] <= r["n_tokens"], r
        assert r["cost_unat"] > 0
