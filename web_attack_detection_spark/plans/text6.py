"""Full BPE tokenizer training + merges-table encoding (VERDICT r6 #1).

``text_bpe_first_merge`` (plans/text3.py) computes merge round 1;
these queries complete the operator: ``text_bpe_train`` iterates
N=20 rounds into the ranked merges table a real tokenizer ships, and
``text_bpe_encode`` applies that table to the corpus with a
character-conservation audit.  Core in functions/bpe.py (see its
module doc for the replace==greedy-merge proof and the 100 TB shape:
one corpus->vocab shuffle, then |vocab|-proportional rounds).

Both queries are FULLY oracle-checked: the DuckDB twin replays the
identical N rounds as generated chained ``AS MATERIALIZED`` CTEs
(materialization keeps the 20-round chain linear — the k-core-peel
lesson; without it DuckDB inlines each state reference and the plan
grows 3^rounds).  Same wrapped-string representation, same
``replace`` semantics, same (freq desc, left asc, right asc)
tie-break — so the merges match string-for-string and the driver's
value-hash compare is exact.

Reference anchor: the reference tokenizes nothing (its features are
numeric flows), so this operator extends the engine for the
LLM-training-data pipeline the brief demands; the distributed shape
follows text_bpe_first_merge (``plans/text3.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from web_attack_detection_spark.functions import bpe
from web_attack_detection_spark.io.sources import load_table
from web_attack_detection_spark.plans.registry import register

_US = bpe.US
_US2 = _US + _US

# one training run per (session, sf_dir): text_bpe_train and
# text_bpe_encode share it within a process; a fresh driver session
# recomputes (the _IVF_STORE pattern)
_BPE_STORE: dict[tuple[str, str], tuple[list, DataFrame]] = {}


def _trained(spark: SparkSession, sf_dir: str):
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _BPE_STORE:
        docs = load_table(spark, sf_dir, "documents")
        words = docs.select(F.explode(F.split("text", r"\s+")).alias("w"))
        _BPE_STORE[key] = bpe.bpe_train(words)
    return _BPE_STORE[key]


def _oracle_rounds(n_rounds: int) -> str:
    """The chained-CTE replay of bpe.bpe_train: state_0 = corpus
    vocabulary with US-wrapped char sequences; each round r picks the
    (freq desc, left asc, right asc) top pair with freq >= MIN_FREQ
    and applies the single wrapped replace.  A round whose best-CTE is
    empty leaves state unchanged via coalesce (and every later round
    is then empty too — same fixed point as the Spark loop's break)."""
    parts = [
        f"""WITH state_0 AS MATERIALIZED (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt,
         '{_US}' || array_to_string(
             list_transform(range(1, length(w) + 1), i -> w[i]),
             '{_US2}') || '{_US}' AS seq
  FROM (SELECT UNNEST(string_split_regex(text, '\\s+')) AS w FROM documents)
  WHERE length(w) >= 1 AND NOT contains(w, '{_US}')
  GROUP BY w
)"""
    ]
    for r in range(1, n_rounds + 1):
        p = r - 1
        parts.append(
            f""", best_{r} AS MATERIALIZED (
  SELECT CAST({r} AS BIGINT) AS merge_rank, l AS left_sym, r2 AS right_sym,
         l || r2 AS merged, freq
  FROM (
    SELECT syms[i] AS l, syms[i + 1] AS r2, CAST(SUM(cnt) AS BIGINT) AS freq
    FROM (
      SELECT cnt,
             string_split(substring(seq, 2, length(seq) - 2), '{_US2}') AS syms
      FROM state_{p}
    ) t, UNNEST(range(1, len(syms))) AS u(i)
    GROUP BY 1, 2
  ) pc
  WHERE freq >= {bpe.MIN_FREQ}
  ORDER BY freq DESC, l ASC, r2 ASC
  LIMIT 1
), state_{r} AS MATERIALIZED (
  SELECT w, cnt,
         coalesce(replace(seq,
             (SELECT '{_US}' || left_sym || '{_US2}' || right_sym || '{_US}'
                FROM best_{r}),
             (SELECT '{_US}' || merged || '{_US}' FROM best_{r})),
           seq) AS seq
  FROM state_{p}
)"""
        )
    return "".join(parts)


_TRAIN_ORACLE = (
    _oracle_rounds(bpe.N_ROUNDS)
    + "\nSELECT merge_rank, left_sym, right_sym, merged, freq FROM ("
    + " UNION ALL ".join(
        f"SELECT * FROM best_{r}" for r in range(1, bpe.N_ROUNDS + 1)
    )
    + ") ORDER BY merge_rank"
)


@register(
    "text_bpe_train",
    _TRAIN_ORACLE,
    doc=f"BPE tokenizer training: {bpe.N_ROUNDS} ranked merge rounds (full merges table)",
)
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full BPE trainer: N=20 merge rounds over the corpus
    vocabulary, returning the ranked merges table (rank, left, right,
    merged, corpus-weighted frequency) a tokenizer serializes.  Each
    round is one |vocab|-proportional pair aggregation + a one-row
    driver argmax + one codegen'd replace; state localCheckpoints per
    round so lineage never grows (functions/bpe.py).  Oracle: the same
    rounds replayed as generated materialized CTEs — merges match
    string-for-string, frequency-for-frequency."""
    merges, _ = _trained(spark, sf_dir)
    return spark.createDataFrame(
        merges,
        "merge_rank long, left_sym string, right_sym string,"
        " merged string, freq long",
    ).orderBy("merge_rank")


_ENCODE_ORACLE = (
    _oracle_rounds(bpe.N_ROUNDS)
    + f"""
, docw AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, UNNEST(string_split_regex(text, '\\s+')) AS w
    FROM documents
  ) WHERE length(w) >= 1 AND NOT contains(w, '{_US}')
)
SELECT d.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(len(string_split(substring(s.seq, 2, length(s.seq) - 2),
                                 '{_US2}'))) AS BIGINT) AS n_tokens,
       CAST(SUM(length(d.w)) AS BIGINT) AS n_chars,
       bool_and(replace(s.seq, '{_US}', '') = d.w) AS reconstruct_ok
FROM docw d JOIN state_{bpe.N_ROUNDS} s ON d.w = s.w
GROUP BY d.doc_id
"""
)


@register(
    "text_bpe_encode",
    _ENCODE_ORACLE,
    doc="encode the corpus with the trained BPE merges table + conservation audit",
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize every document with the trained merges: per doc, word
    count, BPE token count, and the conservation audit — stripping the
    separators from each word's final symbol sequence must reproduce
    the word exactly (``reconstruct_ok``), so no merge ever created,
    destroyed, or reordered a character.

    Encoding a corpus word IS its final training state (training and
    encoding apply the same ranked replaces in the same order), so the
    encode is a broadcast join of word occurrences against the
    |vocab|-sized final state — the corpus shuffles once for the word
    split and never again.  Out-of-vocab words (encode-time corpora)
    take ``functions.bpe.encode_words_expr`` — the same ranked
    replaces as ONE chained codegen projection, no join, no shuffle
    (twin-tested on unseen words in tests/test_bpe.py); here every
    word is in-vocab by construction."""
    merges, state = _trained(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    docw = docs.select(
        "doc_id", F.explode(F.split("text", r"\s+")).alias("w")
    ).filter((F.length("w") >= 1) & (~F.col("w").contains(_US)))
    enc = state.select(
        "w",
        F.size(bpe.tokens_expr()).cast("long").alias("n_tok"),
        (F.replace(F.col("seq"), F.lit(_US), F.lit("")) == F.col("w")).alias(
            "ok"
        ),
    )
    return (
        docw.join(F.broadcast(enc), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum(F.length("w").cast("long")).alias("n_chars"),
            F.bool_and("ok").alias("reconstruct_ok"),
        )
    )


# ---------------------------------------------------------------------------
# WordPiece trainer (likelihood-scored merges) — full oracle
# ---------------------------------------------------------------------------

_WP_STORE: dict[tuple[str, str], tuple[list, DataFrame]] = {}


def _wp_trained(spark: SparkSession, sf_dir: str):
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _WP_STORE:
        docs = load_table(spark, sf_dir, "documents")
        words = docs.select(F.explode(F.split("text", r"\s+")).alias("w"))
        _WP_STORE[key] = bpe.wordpiece_train(words)
    return _WP_STORE[key]


def _wp_oracle_rounds(n_rounds: int) -> str:
    """Chained-CTE replay of bpe.wordpiece_train: like _oracle_rounds
    but with '##'-prefixed continuations in state_0, a per-round
    symbol-count CTE (the unigram denominator), and the likelihood
    score freq/(f_left*f_right) — ONE double division of exact BIGINT
    counts, identical in Spark / DuckDB / the Python twin — as the
    ranking key (ties: left asc, right asc)."""
    parts = [
        f"""WITH state_0 AS MATERIALIZED (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt,
         '{_US}' || array_to_string(
             list_transform(range(1, length(w) + 1),
                 i -> CASE WHEN i = 1 THEN w[i] ELSE '##' || w[i] END),
             '{_US2}') || '{_US}' AS seq
  FROM (SELECT UNNEST(string_split_regex(text, '\\s+')) AS w FROM documents)
  WHERE length(w) >= 1 AND NOT contains(w, '{_US}') AND NOT contains(w, '#')
  GROUP BY w
)"""
    ]
    for r in range(1, n_rounds + 1):
        p = r - 1
        parts.append(
            f""", sc_{r} AS MATERIALIZED (
  SELECT s AS sym, CAST(SUM(cnt) AS BIGINT) AS f
  FROM (SELECT cnt, UNNEST(string_split(substring(seq, 2, length(seq) - 2),
                                        '{_US2}')) AS s
        FROM state_{p})
  GROUP BY s
), best_{r} AS MATERIALIZED (
  SELECT CAST({r} AS BIGINT) AS merge_rank, l AS left_sym, r2 AS right_sym,
         CASE WHEN r2 LIKE '##%' THEN l || substring(r2, 3) ELSE l || r2 END AS merged,
         freq, score
  FROM (
    SELECT pc.l, pc.r2, pc.freq,
           CAST(pc.freq AS DOUBLE) / (CAST(sl.f AS DOUBLE) * CAST(sr.f AS DOUBLE)) AS score
    FROM (
      SELECT syms[i] AS l, syms[i + 1] AS r2, CAST(SUM(cnt) AS BIGINT) AS freq
      FROM (
        SELECT cnt,
               string_split(substring(seq, 2, length(seq) - 2), '{_US2}') AS syms
        FROM state_{p}
      ) t, UNNEST(range(1, len(syms))) AS u(i)
      GROUP BY 1, 2
    ) pc
    JOIN sc_{r} sl ON sl.sym = pc.l
    JOIN sc_{r} sr ON sr.sym = pc.r2
    WHERE pc.freq >= {bpe.MIN_FREQ}
  )
  ORDER BY score DESC, l ASC, r2 ASC
  LIMIT 1
), state_{r} AS MATERIALIZED (
  SELECT w, cnt,
         coalesce(replace(seq,
             (SELECT '{_US}' || left_sym || '{_US2}' || right_sym || '{_US}'
                FROM best_{r}),
             (SELECT '{_US}' || merged || '{_US}' FROM best_{r})),
           seq) AS seq
  FROM state_{p}
)"""
        )
    return "".join(parts)


_WP_TRAIN_ORACLE = (
    _wp_oracle_rounds(bpe.WP_ROUNDS)
    + "\nSELECT merge_rank, left_sym, right_sym, merged, freq, score FROM ("
    + " UNION ALL ".join(
        f"SELECT * FROM best_{r}" for r in range(1, bpe.WP_ROUNDS + 1)
    )
    + ") ORDER BY merge_rank"
)


@register(
    "text_wordpiece_train",
    _WP_TRAIN_ORACLE,
    doc=f"WordPiece tokenizer training: {bpe.WP_ROUNDS} likelihood-ranked merge rounds, full oracle",
)
def text_wordpiece_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WordPiece trainer (Schuster & Nakajima 2012 — the BERT
    tokenizer's algorithm), completing the tokenizer-training family
    next to text_bpe_train: '##'-prefixed continuation symbols, and
    each round merges the pair maximizing the unigram-likelihood
    score freq(pair)/(freq(left)*freq(right)) rather than raw
    frequency.  Returns the ranked merges table (rank, left, right,
    merged, freq, score).

    Same distributed shape as BPE (functions/bpe.py module doc): the
    corpus collapses to its vocabulary ONCE; each round is one
    |vocab|-proportional pair aggregation PLUS one symbol-count
    aggregation (both map-side combined; the symbol table is
    |alphabet|+rounds rows, always broadcast into the scoring join),
    a one-row driver argmax, one codegen'd replace, and a per-round
    localCheckpoint.  The score is ONE double division of exact
    BIGINT counts, so ranking is engine-identical; the DuckDB oracle
    replays all 15 rounds as chained MATERIALIZED CTEs and the
    merges table hash-matches string-for-string, score-for-score.
    Spark == pure-Python twin (bpe.wordpiece_train_py) is pytested
    including the '##' merge-concatenation rule."""
    merges, _ = _wp_trained(spark, sf_dir)
    return spark.createDataFrame(
        merges,
        "merge_rank long, left_sym string, right_sym string,"
        " merged string, freq long, score double",
    ).orderBy("merge_rank")


_WP_ENCODE_ORACLE = (
    _wp_oracle_rounds(bpe.WP_ROUNDS)
    + f"""
, docw AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, UNNEST(string_split_regex(text, '\\s+')) AS w
    FROM documents
  ) WHERE length(w) >= 1 AND NOT contains(w, '{_US}') AND NOT contains(w, '#')
)
SELECT d.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(len(string_split(substring(s.seq, 2, length(s.seq) - 2),
                                 '{_US2}'))) AS BIGINT) AS n_tokens,
       CAST(SUM(length(d.w)) AS BIGINT) AS n_chars,
       bool_and(replace(replace(s.seq, '{_US}{_US}' || '##', '{_US}{_US}'),
                        '{_US}', '') = d.w) AS reconstruct_ok
FROM docw d JOIN state_{bpe.WP_ROUNDS} s ON d.w = s.w
GROUP BY d.doc_id
"""
)


@register(
    "text_wordpiece_encode",
    _WP_ENCODE_ORACLE,
    doc="encode the corpus with the trained WordPiece merges + conservation audit",
)
def text_wordpiece_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize every document with the trained WordPiece merges: per
    doc, word count, token count, char count, and the conservation
    audit — stripping the separators AND the '##' continuation
    markers (only at symbol starts, i.e. after a separator pair) from
    a word's final symbol sequence must reproduce the word exactly.
    Same broadcast-join-against-final-state shape as text_bpe_encode;
    the '#'-containing words are excluded on BOTH sides (the trainer's
    documented representation constraint), so the join keys align.
    Full oracle: the DuckDB twin retrains the same 15 rounds and
    replays the reconstruction check."""
    merges, state = _wp_trained(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    docw = docs.select(
        "doc_id", F.explode(F.split("text", r"\s+")).alias("w")
    ).filter(
        (F.length("w") >= 1)
        & (~F.col("w").contains(_US))
        & (~F.col("w").contains("#"))
    )
    # reconstruct: drop "##" where it starts a symbol (after the US2
    # separator), then strip the separators
    seq = F.col("seq")
    rebuilt = F.replace(
        F.replace(seq, F.lit(_US2 + "##"), F.lit(_US2)), F.lit(_US), F.lit("")
    )
    enc = state.select(
        "w",
        F.size(bpe.tokens_expr()).cast("long").alias("n_tok"),
        (rebuilt == F.col("w")).alias("ok"),
    )
    return (
        docw.join(F.broadcast(enc), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum(F.length("w").cast("long")).alias("n_chars"),
            F.bool_and("ok").alias("reconstruct_ok"),
        )
    )


# ---------------------------------------------------------------------------
# Unigram-LM Viterbi segmentation (SentencePiece inference) — full oracle
# ---------------------------------------------------------------------------

_UNI_K = 200  # vocabulary size (top grams by corpus frequency)
_UNI_MAXG = 4  # max piece length in characters
_UNI_MAXW = 64  # max word length (longer words are filtered on both sides)
_UNI_FB = 30_000_000  # fallback single-char cost, micro-nats (pinned literal)


def _uni_oracle() -> str:
    """DuckDB replay of the unigram segmenter: vocabulary = top-200
    corpus 1..4-grams with micro-nat costs (the Kaplan-Meier
    ROUND(1e6*ln) idiom), then per DISTINCT word an exact-integer
    Viterbi DP as a recursive CTE carrying the dp list — state value
    cost*1024 + n_tokens, so MIN is lexicographic (min cost, then
    fewest pieces) and path sums stay linear."""
    return f"""WITH RECURSIVE wc AS MATERIALIZED (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT UNNEST(string_split_regex(text, '\\s+')) AS w FROM documents)
  WHERE length(w) >= 1 AND length(w) <= {_UNI_MAXW}
  GROUP BY w
), grams AS MATERIALIZED (
  SELECT substring(w, p, k) AS gram, CAST(SUM(cnt) AS BIGINT) AS freq
  FROM wc, UNNEST(range(1, {_UNI_MAXW + 1})) pp(p),
       UNNEST(range(1, {_UNI_MAXG + 1})) kk(k)
  WHERE p + k - 1 <= length(w)
  GROUP BY 1
), topk AS MATERIALIZED (
  SELECT gram, freq FROM grams ORDER BY freq DESC, gram ASC LIMIT {_UNI_K}
), vocab AS MATERIALIZED (
  SELECT gram,
         CAST(ROUND(1000000 * ln(CAST((SELECT SUM(freq) FROM topk) AS DOUBLE)
                                 / freq)) AS BIGINT) AS cost
  FROM topk
), words AS MATERIALIZED (
  SELECT DISTINCT w FROM wc
), pos AS MATERIALIZED (
  SELECT w.w, pp.p, kk.k, substring(w.w, pp.p - kk.k + 1, kk.k) AS gram
  FROM words w, UNNEST(range(1, {_UNI_MAXW + 1})) pp(p),
       UNNEST(range(1, {_UNI_MAXG + 1})) kk(k)
  WHERE pp.p <= length(w.w) AND pp.p - kk.k + 1 >= 1
), steps AS MATERIALIZED (
  SELECT pos.w, pos.p, pos.k,
         (COALESCE(v.cost, CASE WHEN pos.k = 1 THEN {_UNI_FB} END) * 1024 + 1)
           AS stepc
  FROM pos LEFT JOIN vocab v ON v.gram = pos.gram
), cmap AS MATERIALIZED (
  SELECT w, p, list(struct_pack(k := k, c := stepc) ORDER BY k) AS cands
  FROM steps WHERE stepc IS NOT NULL AND p >= k
  GROUP BY w, p
), rec AS (
  SELECT w, 0 AS i, [CAST(0 AS BIGINT)] AS dps FROM words
  UNION ALL
  SELECT r.w, r.i + 1, list_append(r.dps, list_min(
      list_transform(c.cands, x -> r.dps[r.i + 2 - x.k] + x.c)))
  FROM rec r JOIN cmap c ON c.w = r.w AND c.p = r.i + 1
  WHERE r.i < length(r.w)
), wseg AS MATERIALIZED (
  SELECT w, dps[length(w) + 1] AS comb FROM rec WHERE i = length(w)
), docw AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, UNNEST(string_split_regex(text, '\\s+')) AS w FROM documents
  ) WHERE length(w) >= 1 AND length(w) <= {_UNI_MAXW}
)
SELECT d.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(s.comb % 1024) AS BIGINT) AS n_tokens,
       CAST(SUM(s.comb // 1024) AS BIGINT) AS cost_unat
FROM docw d JOIN wseg s ON d.w = s.w
GROUP BY d.doc_id"""


@register(
    "text_unigram_segment",
    _uni_oracle(),
    doc=f"unigram-LM Viterbi segmentation (top-{_UNI_K} vocab, exact micro-nat DP), full oracle",
)
def text_unigram_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenization — SentencePiece's INFERENCE step —
    completing the tokenizer family (BPE: merge ranks; WordPiece:
    likelihood merges; unigram: per-word Viterbi over a piece
    vocabulary).  The vocabulary is the corpus's top-200 1..4-grams
    with micro-nat costs ROUND(1e6*ln(total/freq)) (the Kaplan-Meier
    quantize-before-accumulate idiom); unknown single chars take a
    pinned 30-nat fallback.  Per DISTINCT word, the minimum-cost
    segmentation is an EXACT-INTEGER Viterbi DP: each dp state packs
    cost*1024 + n_pieces into one BIGINT, so the min is lexicographic
    (cheapest, then fewest pieces) and path sums stay additive — no
    float ever enters the recurrence, which is why Spark's
    aggregate-fold (a whole-stage-codegen array fold over the word's
    positions, k<=4 lookbehind against a 200-entry literal map via
    try_element_at) and DuckDB's recursive CTE (dp list +
    correlated MIN over a steps relation) agree bit-for-bit.
    Output: per-doc word/token counts and total segmentation cost.

    Scale: the DP runs once per DISTINCT word (|vocab(words)|-
    proportional, never corpus-proportional) and is pure map-side
    codegen; docs join the segmented words by broadcast; the gram
    count is one explode+sum (positions x 4) shuffle.  The top-200
    cut is a TakeOrdered; the 200-entry cost map is ~bytes of plan
    literals."""
    docs = load_table(spark, sf_dir, "documents")
    allw = docs.select(
        "doc_id", F.explode(F.split("text", r"\s+")).alias("w")
    ).filter((F.length("w") >= 1) & (F.length("w") <= _UNI_MAXW))
    wc = allw.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))

    # vocabulary: top-K grams by exact corpus frequency, micro-nat costs
    grams = (
        wc.select(
            "cnt",
            F.explode(
                F.expr(
                    f"flatten(transform(sequence(1, length(w)), p -> "
                    f"transform(sequence(1, least({_UNI_MAXG}, length(w) - p + 1)), "
                    f"k -> substring(w, p, k))))"
                )
            ).alias("gram"),
        )
        .groupBy("gram")
        .agg(F.sum("cnt").alias("freq"))
    )
    topk = grams.orderBy(F.col("freq").desc(), F.col("gram").asc()).limit(_UNI_K).collect()
    tot = sum(int(r["freq"]) for r in topk)
    cost_df = spark.createDataFrame(
        [(r["gram"], int(r["freq"])) for r in topk], "gram string, freq long"
    ).select(
        "gram",
        F.round(1000000 * F.log(F.lit(float(tot)) / F.col("freq"))).cast("long").alias("cost"),
    )
    vocab = {r["gram"]: int(r["cost"]) for r in cost_df.collect()}
    # packed forward dp shared with the trainer (functions/unigram.py)
    from web_attack_detection_spark.functions import unigram

    dps = unigram.dp_expr(vocab, word="w", max_gram=_UNI_MAXG, fallback=_UNI_FB)
    wseg = wc.select(
        "w", F.element_at(dps, F.length("w") + 1).alias("comb")
    )
    return (
        allw.join(F.broadcast(wseg), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.col("comb") % 1024).alias("n_tokens"),
            F.sum(F.expr("comb div 1024")).alias("cost_unat"),
        )
    )


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer TRAINING (hard-EM: Viterbi counts + prune) — full oracle
# ---------------------------------------------------------------------------

_UT_K = 120  # seed vocabulary size (top grams by corpus frequency)
_UT_PRUNE = 20  # pieces pruned per EM round
_UT_ROUNDS = 3  # EM rounds (final vocab: _UT_K - _UT_ROUNDS*_UT_PRUNE)

_UT_STORE: dict[tuple[str, str], tuple[dict, list]] = {}


def _ut_trained(spark: SparkSession, sf_dir: str) -> tuple[dict, list]:
    """(final piece->cost dict, final [(piece, uses, cost)] rows) — one
    training run per (session, sf_dir), the _BPE_STORE pattern."""
    from web_attack_detection_spark.functions import unigram

    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _UT_STORE:
        return _UT_STORE[key]
    docs = load_table(spark, sf_dir, "documents")
    allw = docs.select(F.explode(F.split("text", r"\s+")).alias("w")).filter(
        (F.length("w") >= 1) & (F.length("w") <= _UNI_MAXW)
    )
    # the word vocabulary: every round re-reads it — pin it once
    wc = (
        allw.groupBy("w").agg(F.count(F.lit(1)).alias("cnt")).localCheckpoint()
    )

    # seed: top-_UT_K grams, micro-nat costs (text_unigram_segment's idiom)
    grams = (
        wc.select(
            "cnt",
            F.explode(
                F.expr(
                    f"flatten(transform(sequence(1, length(w)), p -> "
                    f"transform(sequence(1, least({_UNI_MAXG}, length(w) - p + 1)), "
                    f"k -> substring(w, p, k))))"
                )
            ).alias("gram"),
        )
        .groupBy("gram")
        .agg(F.sum("cnt").alias("freq"))
    )
    topk = (
        grams.orderBy(F.col("freq").desc(), F.col("gram").asc())
        .limit(_UT_K)
        .collect()
    )
    tot = sum(int(r["freq"]) for r in topk)
    seed_df = spark.createDataFrame(
        [(r["gram"], int(r["freq"])) for r in topk], "gram string, freq long"
    ).select(
        "gram",
        F.round(1000000 * F.log(F.lit(float(tot)) / F.col("freq")))
        .cast("long")
        .alias("cost"),
    )
    costs = {r["gram"]: int(r["cost"]) for r in seed_df.collect()}

    table: list = []
    for r in range(1, _UT_ROUNDS + 1):
        keep = max(_UT_K - r * _UT_PRUNE, 1)
        # E: Viterbi-segment every DISTINCT word (two codegen folds)
        wdp = wc.select("w", "cnt", unigram.dp_expr(costs).alias("dps"))
        used = (
            wdp.select("cnt", F.explode(unigram.pieces_expr(costs)).alias("gram"))
            .groupBy("gram")
            .agg(F.sum("cnt").cast("long").alias("uses"))
        )
        # M: keep the top pieces by usage, re-estimate costs over kept mass
        kept = (
            used.orderBy(F.col("uses").desc(), F.col("gram").asc())
            .limit(keep)
            .collect()
        )
        tot = sum(int(x["uses"]) for x in kept)
        vdf = spark.createDataFrame(
            [(x["gram"], int(x["uses"])) for x in kept], "gram string, uses long"
        ).select(
            "gram",
            "uses",
            F.round(1000000 * F.log(F.lit(float(tot)) / F.col("uses")))
            .cast("long")
            .alias("cost"),
        )
        rows = vdf.collect()
        costs = {x["gram"]: int(x["cost"]) for x in rows}
        table = rows
    _UT_STORE[key] = (costs, table)
    return _UT_STORE[key]


def _ut_chain() -> str:
    """The hard-EM training chain (shared by the trainer oracle and
    the encode oracle): vocab_0 = seed costs; each round rebuilds the
    per-position candidate lists against the CURRENT vocab, re-runs
    the forward dp (recursive CTE carrying the dp list), BACKTRACES
    the optimal pieces (recursive CTE walking pos from length(w) to 0,
    picking the SMALLEST k whose step reproduces the dp value — the
    same tie-break as the engine's fold), re-counts corpus-weighted
    usage, prunes to the round's keep-size and re-quantizes the
    micro-nat costs over the kept mass."""
    parts = [
        f"""WITH RECURSIVE wc AS MATERIALIZED (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT UNNEST(string_split_regex(text, '\\s+')) AS w FROM documents)
  WHERE length(w) >= 1 AND length(w) <= {_UNI_MAXW}
  GROUP BY w
), grams AS MATERIALIZED (
  SELECT substring(w, p, k) AS gram, CAST(SUM(cnt) AS BIGINT) AS freq
  FROM wc, UNNEST(range(1, {_UNI_MAXW + 1})) pp(p),
       UNNEST(range(1, {_UNI_MAXG + 1})) kk(k)
  WHERE p + k - 1 <= length(w)
  GROUP BY 1
), topk AS MATERIALIZED (
  SELECT gram, freq FROM grams ORDER BY freq DESC, gram ASC LIMIT {_UT_K}
), vocab_0 AS MATERIALIZED (
  SELECT gram,
         CAST(ROUND(1000000 * ln(CAST((SELECT SUM(freq) FROM topk) AS DOUBLE)
                                 / freq)) AS BIGINT) AS cost
  FROM topk
), words AS MATERIALIZED (
  SELECT DISTINCT w FROM wc
), pos AS MATERIALIZED (
  SELECT w.w, pp.p, kk.k, substring(w.w, pp.p - kk.k + 1, kk.k) AS gram
  FROM words w, UNNEST(range(1, {_UNI_MAXW + 1})) pp(p),
       UNNEST(range(1, {_UNI_MAXG + 1})) kk(k)
  WHERE pp.p <= length(w.w) AND pp.p - kk.k + 1 >= 1
)"""
    ]
    for r in range(1, _UT_ROUNDS + 1):
        p = r - 1
        keep = max(_UT_K - r * _UT_PRUNE, 1)
        parts.append(
            f""", steps_{r} AS MATERIALIZED (
  SELECT pos.w, pos.p, pos.k,
         (COALESCE(v.cost, CASE WHEN pos.k = 1 THEN {_UNI_FB} END) * 1024 + 1)
           AS stepc
  FROM pos LEFT JOIN vocab_{p} v ON v.gram = pos.gram
), cmap_{r} AS MATERIALIZED (
  SELECT w, p, list(struct_pack(k := k, c := stepc) ORDER BY k) AS cands
  FROM steps_{r} WHERE stepc IS NOT NULL AND p >= k
  GROUP BY w, p
), rec_{r} AS (
  SELECT w, 0 AS i, [CAST(0 AS BIGINT)] AS dps FROM words
  UNION ALL
  SELECT q.w, q.i + 1, list_append(q.dps, list_min(
      list_transform(c.cands, x -> q.dps[q.i + 2 - x.k] + x.c)))
  FROM rec_{r} q JOIN cmap_{r} c ON c.w = q.w AND c.p = q.i + 1
  WHERE q.i < length(q.w)
), wdp_{r} AS MATERIALIZED (
  SELECT w, dps FROM rec_{r} WHERE i = length(w)
), bt_{r} AS (
  SELECT w, dps, CAST(length(w) AS BIGINT) AS pos,
         CAST([] AS VARCHAR[]) AS picked
  FROM wdp_{r}
  UNION ALL
  SELECT b.w, b.dps, b.pos - b.kk,
         list_append(b.picked, substring(b.w, b.pos - b.kk + 1, b.kk))
  FROM (
    SELECT b0.w, b0.dps, b0.pos, b0.picked,
           list_min(list_transform(
             list_filter(c.cands,
                 x -> b0.dps[b0.pos - x.k + 1] + x.c = b0.dps[b0.pos + 1]),
             x -> x.k)) AS kk
    FROM bt_{r} b0 JOIN cmap_{r} c ON c.w = b0.w AND c.p = b0.pos
    WHERE b0.pos > 0
  ) b
), uses_{r} AS MATERIALIZED (
  SELECT gram, CAST(SUM(cnt) AS BIGINT) AS uses
  FROM (SELECT w, UNNEST(picked) AS gram FROM bt_{r} WHERE pos = 0) u
  JOIN wc ON wc.w = u.w
  GROUP BY gram
), kept_{r} AS MATERIALIZED (
  SELECT gram, uses FROM uses_{r} ORDER BY uses DESC, gram ASC LIMIT {keep}
), vocab_{r} AS MATERIALIZED (
  SELECT gram, uses,
         CAST(ROUND(1000000 * ln(CAST((SELECT SUM(uses) FROM kept_{r}) AS DOUBLE)
                                 / uses)) AS BIGINT) AS cost
  FROM kept_{r}
)"""
        )
    return "".join(parts)


def _ut_oracle() -> str:
    return (
        _ut_chain()
        + f"""
SELECT gram AS piece, uses, cost AS cost_unat
FROM vocab_{_UT_ROUNDS} ORDER BY uses DESC, piece ASC"""
    )


def _ut_encode_oracle() -> str:
    """Training chain + ONE more Viterbi/backtrace pass with the FINAL
    vocab, aggregated per document with the reconstruction audit."""
    R = _UT_ROUNDS
    return (
        _ut_chain()
        + f""", steps_f AS MATERIALIZED (
  SELECT pos.w, pos.p, pos.k,
         (COALESCE(v.cost, CASE WHEN pos.k = 1 THEN {_UNI_FB} END) * 1024 + 1)
           AS stepc
  FROM pos LEFT JOIN vocab_{R} v ON v.gram = pos.gram
), cmap_f AS MATERIALIZED (
  SELECT w, p, list(struct_pack(k := k, c := stepc) ORDER BY k) AS cands
  FROM steps_f WHERE stepc IS NOT NULL AND p >= k
  GROUP BY w, p
), rec_f AS (
  SELECT w, 0 AS i, [CAST(0 AS BIGINT)] AS dps FROM words
  UNION ALL
  SELECT q.w, q.i + 1, list_append(q.dps, list_min(
      list_transform(c.cands, x -> q.dps[q.i + 2 - x.k] + x.c)))
  FROM rec_f q JOIN cmap_f c ON c.w = q.w AND c.p = q.i + 1
  WHERE q.i < length(q.w)
), wdp_f AS MATERIALIZED (
  SELECT w, dps FROM rec_f WHERE i = length(w)
), bt_f AS (
  SELECT w, dps, CAST(length(w) AS BIGINT) AS pos,
         CAST([] AS VARCHAR[]) AS picked
  FROM wdp_f
  UNION ALL
  SELECT b.w, b.dps, b.pos - b.kk,
         list_append(b.picked, substring(b.w, b.pos - b.kk + 1, b.kk))
  FROM (
    SELECT b0.w, b0.dps, b0.pos, b0.picked,
           list_min(list_transform(
             list_filter(c.cands,
                 x -> b0.dps[b0.pos - x.k + 1] + x.c = b0.dps[b0.pos + 1]),
             x -> x.k)) AS kk
    FROM bt_f b0 JOIN cmap_f c ON c.w = b0.w AND c.p = b0.pos
    WHERE b0.pos > 0
  ) b
), wenc AS MATERIALIZED (
  SELECT w, dps[length(w) + 1] AS comb,
         array_to_string(list_reverse(picked), '') = w AS ok
  FROM bt_f WHERE pos = 0
), docw_f AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, UNNEST(string_split_regex(text, '\\s+')) AS w FROM documents
  ) WHERE length(w) >= 1 AND length(w) <= {_UNI_MAXW}
)
SELECT d.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(s.comb % 1024) AS BIGINT) AS n_tokens,
       CAST(SUM(s.comb // 1024) AS BIGINT) AS cost_unat,
       bool_and(s.ok) AS reconstruct_ok
FROM docw_f d JOIN wenc s ON d.w = s.w
GROUP BY d.doc_id"""
    )


@register(
    "text_unigram_train",
    _ut_oracle(),
    doc=f"unigram-LM tokenizer training: {_UT_ROUNDS} hard-EM rounds "
    f"(Viterbi counts + prune {_UT_PRUNE}/round from {_UT_K} seeds), full oracle",
)
def text_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unigram-LM tokenizer TRAINER (Kudo 2018 — SentencePiece's
    algorithm, hard-EM variant), completing the tokenizer-training
    family: BPE merges by frequency, WordPiece merges by likelihood,
    unigram by segment-count re-estimation with pruning.  Seed = the
    corpus's top-{_UT_K} 1..4-grams with micro-nat costs; each round
    (E) Viterbi-segments every DISTINCT word under the current costs —
    the same packed-integer DP as text_unigram_segment plus a
    smallest-k backtrace, both whole-stage-codegen array folds
    (functions/unigram.py) — then (M) re-counts corpus-weighted piece
    usage, keeps the top (seed - round*{_UT_PRUNE}) pieces and
    re-quantizes costs ROUND(1e6*ln(kept_total/uses)).  Returns the
    final vocabulary (piece, uses, cost_unat).

    Scale: per round, ONE |word-vocab|-proportional map-side segment
    pass + one |pieces|-bounded usage aggregation; the driver collects
    only the <= {_UT_K}-row usage table (the bounded-collect pattern of
    ml_kmeans_clusters); the corpus itself shuffles once into the word
    vocabulary.  Full oracle: DuckDB replays seed, every dp, every
    backtrace, every prune as chained MATERIALIZED CTEs + 2 recursive
    CTEs per round; hypothesis pins the Python twin
    (functions/unigram.unigram_train_py) and the smallest-k backtrace
    against brute-force enumeration (tests/test_unigram_train.py)."""
    _, table = _ut_trained(spark, sf_dir)
    return (
        spark.createDataFrame(
            [(r["gram"], int(r["uses"]), int(r["cost"])) for r in table],
            "piece string, uses long, cost_unat long",
        )
        .orderBy(F.col("uses").desc(), F.col("piece").asc())
    )


@register(
    "text_unigram_encode",
    _ut_encode_oracle(),
    doc="encode the corpus with the TRAINED unigram vocab (Viterbi + backtrace) "
    "+ reconstruction audit, full oracle",
)
def text_unigram_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize every document with the HARD-EM-TRAINED unigram
    vocabulary — the train/encode symmetry the other two tokenizer
    families already have (text_bpe_train/encode,
    text_wordpiece_train/encode): text_unigram_segment serves the
    SEED vocabulary, this query serves the trained one.  Per distinct
    word, one packed-integer Viterbi (functions/unigram.dp_expr with
    the trained costs) plus the smallest-k backtrace
    (unigram.pieces_expr); per document: word count, piece count,
    total micro-nat cost, and the conservation audit — concatenating
    the backtraced pieces in word order must reproduce the word
    exactly (``reconstruct_ok``), so segmentation never created,
    destroyed, or reordered a character.

    Full oracle: the DuckDB twin re-trains the same 3 EM rounds
    (shared ``_ut_chain``) and replays the final Viterbi + backtrace
    as one more recursive-CTE pair, then the same per-doc
    aggregation.  Training is shared with text_unigram_train through
    ``_ut_trained`` (one fit per session/sf_dir — the _BPE_STORE
    pattern), so in a bench run the corpus trains once.  Scale: the
    DP/backtrace run per DISTINCT word (map-side codegen folds); docs
    join the |word-vocab|-sized encoded relation by broadcast."""
    from web_attack_detection_spark.functions import unigram

    costs, _ = _ut_trained(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    allw = docs.select(
        "doc_id", F.explode(F.split("text", r"\s+")).alias("w")
    ).filter((F.length("w") >= 1) & (F.length("w") <= _UNI_MAXW))
    words = allw.select("w").distinct()
    wdp = words.select("w", unigram.dp_expr(costs).alias("dps"))
    wenc = wdp.select(
        "w",
        F.element_at(F.col("dps"), F.length("w") + 1).alias("comb"),
        (
            F.concat_ws("", F.reverse(unigram.pieces_expr(costs)))
            == F.col("w")
        ).alias("ok"),
    )
    return (
        allw.join(F.broadcast(wenc), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.col("comb") % 1024).alias("n_tokens"),
            F.sum(F.expr("comb div 1024")).alias("cost_unat"),
            F.bool_and("ok").alias("reconstruct_ok"),
        )
    )
