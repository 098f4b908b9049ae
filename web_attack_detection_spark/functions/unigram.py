"""Unigram-LM tokenizer: shared Viterbi DP / backtrace expressions and
the pure-Python twins (SentencePiece's algorithm family — Kudo 2018).

The packed-integer representation makes every step engine-portable
(r7-proven, plans/text6.py text_unigram_segment): a DP state is ONE
BIGINT ``cost_micro_nats * 1024 + n_pieces``, so ``min`` is
lexicographic (cheapest segmentation, then fewest pieces) and path
sums stay additive — no float enters the recurrence. Costs themselves
are micro-nat integers ``ROUND(1e6 * ln(total/freq))``: ln runs ONCE
per vocabulary entry (never per row), the identical expression in
Spark / DuckDB / the Python twin.

Backtrace rule (shared by ``pieces_expr``, the trainer oracle's
recursive CTE, and ``viterbi_pieces_py``): standing at position
``pos``, take the SMALLEST piece length k in 1..max_gram with
``dp[pos-k] + step(w[pos-k:pos]) == dp[pos]`` — deterministic, and at
least one k always satisfies it because the forward pass took the min
over the same candidates. The single-char fallback cost guarantees
coverage, so every word segments.

Scale shape: the DP and backtrace are whole-stage-codegen array folds
over each DISTINCT word (|word-vocab|-proportional, never
corpus-proportional); the piece-cost table (<= a few hundred entries)
rides in the plan as a literal map. Training's per-round driver
collect is the used-piece relation — bounded by |vocab| + |alphabet|,
the bounded-collect pattern of plans/mlq.ml_kmeans_clusters.

Reference anchor: the reference (~800 LoC Keras flow classifier)
tokenizes nothing; this extends the engine for the LLM-training-data
pipeline the brief demands, next to functions/bpe.py.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

# defaults shared with plans/text6.py (pinned literals, engine == oracle)
MAX_GRAM = 4
MAX_WORD = 64
FALLBACK_COST = 30_000_000  # unknown single char, micro-nats
PACK = 1024  # dp = cost * PACK + n_pieces


def _round_half_up(x: float) -> int:
    """Positive-domain HALF_UP — what Spark F.round and DuckDB ROUND
    do for the (always >= 0) micro-nat costs; Python's round() banker-
    rounds and would diverge on exact .5."""
    return int(math.floor(x + 0.5))


def seed_costs_py(
    word_counts: dict[str, int], k: int, max_gram: int = MAX_GRAM
) -> dict[str, int]:
    """Seed vocabulary: top-k substrings (1..max_gram chars) by
    corpus-weighted frequency (ties: gram asc), micro-nat costs
    ROUND(1e6 * ln(total/freq)) with total = sum over the kept top-k."""
    freq: dict[str, int] = {}
    for w, c in word_counts.items():
        for p in range(len(w)):
            for g in range(1, min(max_gram, len(w) - p) + 1):
                s = w[p : p + g]
                freq[s] = freq.get(s, 0) + c
    top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    tot = sum(f for _, f in top)
    return {g: _round_half_up(1e6 * math.log(tot / f)) for g, f in top}


def step_map_expr(costs: dict[str, int]) -> Column:
    """Literal map piece -> packed step (cost * PACK + 1)."""
    return F.create_map(
        *[
            x
            for g, c in sorted(costs.items())
            for x in (F.lit(g), F.lit(c * PACK + 1))
        ]
    )


def dp_expr(
    costs: dict[str, int],
    word: str = "w",
    max_gram: int = MAX_GRAM,
    fallback: int = FALLBACK_COST,
) -> Column:
    """Forward Viterbi: the FULL dp array (length(w)+1 packed BIGINTs,
    dp[1] = 0 for the empty prefix) as one codegen'd fold — extracted
    from text_unigram_segment (r7) so the trainer reuses it verbatim."""
    smap = step_map_expr(costs)
    fb_step = F.lit(fallback * PACK + 1).cast("long")

    def cand(acc, i, k):
        gram = F.substring(F.col(word), i - F.lit(k - 1), F.lit(k))
        step = F.try_element_at(smap, gram)
        if k == 1:
            step = F.coalesce(step, fb_step)
        return F.when(
            i >= F.lit(k),
            F.element_at(acc, (i - F.lit(k - 1)).cast("int")) + step,
        )

    return F.aggregate(
        F.sequence(F.lit(1), F.length(word)),
        F.array(F.lit(0).cast("long")),
        lambda acc, i: F.array_append(
            acc, F.least(*[cand(acc, i, k) for k in range(1, max_gram + 1)])
        ),
    )


def pieces_expr(
    costs: dict[str, int],
    word: str = "w",
    dps: str = "dps",
    max_gram: int = MAX_GRAM,
    fallback: int = FALLBACK_COST,
) -> Column:
    """Backtrace: the optimal piece sequence (END-first order — callers
    count or reverse) as a second codegen'd fold over an already-
    materialized dp array column. Smallest-k tie-break (module doc)."""
    w = F.col(word)
    d = F.col(dps)
    smap = step_map_expr(costs)
    fb_step = F.lit(fallback * PACK + 1).cast("long")

    def k_matches(pos, k):
        gram = F.substring(w, pos - F.lit(k - 1), F.lit(k))
        step = F.try_element_at(smap, gram)
        if k == 1:
            step = F.coalesce(step, fb_step)
        return (
            (pos >= F.lit(k))
            & step.isNotNull()
            & (
                F.element_at(d, (pos + F.lit(1)).cast("int"))
                == F.element_at(d, (pos - F.lit(k) + 1).cast("int")) + step
            )
        )

    def advance(state, _i):
        pos = state.getField("pos")
        ps = state.getField("ps")
        kpick = F.lit(None).cast("int")
        for k in range(max_gram, 0, -1):  # build whens smallest-k-first
            kpick = F.when(k_matches(pos, k), F.lit(k)).otherwise(kpick)
        moved = F.struct(
            (pos - kpick).alias("pos"),
            F.array_append(
                ps, F.substring(w, pos - kpick + F.lit(1), kpick)
            ).alias("ps"),
        )
        return F.when(pos <= F.lit(0), state).otherwise(moved)

    init = F.struct(
        F.length(w).cast("int").alias("pos"),
        F.array().cast("array<string>").alias("ps"),
    )
    return F.aggregate(
        F.sequence(F.lit(1), F.length(w)),
        init,
        advance,
        lambda s: s.getField("ps"),
    )


# ---------------------------------------------------------------------------
# pure-Python twins (hypothesis targets; bit-identical integer DP)
# ---------------------------------------------------------------------------


def viterbi_pieces_py(
    w: str,
    costs: dict[str, int],
    max_gram: int = MAX_GRAM,
    fallback: int = FALLBACK_COST,
) -> tuple[int, list[str]]:
    """(packed total, pieces in word order) — same forward min and
    smallest-k backtrace as the Spark folds and the oracle's CTEs."""

    def step(pos: int, k: int) -> int | None:  # piece ends at pos (1-based)
        g = w[pos - k : pos]
        if g in costs:
            return costs[g] * PACK + 1
        return fallback * PACK + 1 if k == 1 else None

    dp = [0]
    for i in range(1, len(w) + 1):
        best = None
        for k in range(1, min(max_gram, i) + 1):
            s = step(i, k)
            if s is not None and (best is None or dp[i - k] + s < best):
                best = dp[i - k] + s
        dp.append(best)
    pieces: list[str] = []
    pos = len(w)
    while pos > 0:
        for k in range(1, min(max_gram, pos) + 1):
            s = step(pos, k)
            if s is not None and dp[pos - k] + s == dp[pos]:
                pieces.append(w[pos - k : pos])
                pos -= k
                break
    pieces.reverse()
    return dp[len(w)], pieces


def unigram_train_py(
    word_counts: dict[str, int],
    k_seed: int,
    prune: int,
    rounds: int,
    max_gram: int = MAX_GRAM,
    fallback: int = FALLBACK_COST,
) -> list[tuple[str, int, int]]:
    """Hard-EM unigram trainer twin: seed top-k_seed substrings; each
    round Viterbi-segments every distinct word (E), re-counts piece
    usage corpus-weighted, keeps the top (k_seed - r*prune) used
    pieces (ties: gram asc) and re-estimates micro-nat costs over the
    kept mass (M). Returns the final (piece, uses, cost) table sorted
    (uses desc, piece asc) — what text_unigram_train emits."""
    costs = seed_costs_py(word_counts, k_seed, max_gram)
    table: list[tuple[str, int, int]] = []
    for r in range(1, rounds + 1):
        uses: dict[str, int] = {}
        for w, c in word_counts.items():
            _, pieces = viterbi_pieces_py(w, costs, max_gram, fallback)
            for p in pieces:
                uses[p] = uses.get(p, 0) + c
        keep = max(k_seed - r * prune, 1)
        kept = sorted(uses.items(), key=lambda kv: (-kv[1], kv[0]))[:keep]
        tot = sum(u for _, u in kept)
        costs = {g: _round_half_up(1e6 * math.log(tot / u)) for g, u in kept}
        table = sorted(
            [(g, u, costs[g]) for g, u in kept], key=lambda t: (-t[1], t[0])
        )
    return table
