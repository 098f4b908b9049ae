"""Text-analysis column functions for training-data pipelines.

Everything is a pure column expression over ``pyspark.sql.functions``
— JVM-side, whole-stage-codegen, zero Python in the hot path. Each
function has an exact DuckDB twin used by the oracle queries in
``plans/text.py``.

Operators (north-star set): token counting (whitespace + BPE-ish
regex), language-ID (marker-token heuristic), quality scoring
(length/punct/stopword ratios), document fingerprinting (rolling
polynomial hash).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish segmentation: letter runs, digit runs, and single
# non-alphanumeric marks — a deterministic proxy for subword token
# counts (real BPE needs a merges table; this regex is the standard
# pre-tokenizer shape).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Fake language marker sets over the fixture vocabulary — the fixture
# text is synthetic word salad, so these exercise the *mechanism*
# (marker-set scoring with deterministic tie-break), not real langID.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "fast", "slow"],
    "de": ["data", "batch", "stream"],
    "es": ["table", "row", "column"],
    "fr": ["join", "merge", "sort"],
}

STOPWORDS = ["the", "a", "of", "and", "to"]

_FP_MOD = 2147483647  # 2^31 - 1, Mersenne prime


def tokens(text: Column) -> Column:
    """Whitespace tokenization. Twin: ``string_split_regex(text, '\\s+')``."""
    return F.split(text, r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """Count of BPE-ish segments. Twin: ``len(regexp_extract_all(...))``."""
    return F.regexp_count(text, F.lit(BPE_ISH_PATTERN)).cast("long")


def punct_count(text: Column) -> Column:
    """Characters that are not [a-zA-Z0-9 ]. Twin:
    ``length(text) - length(regexp_replace(text, pat, '', 'g'))``."""
    return (F.length(text) - F.length(F.regexp_replace(text, r"[^a-zA-Z0-9 ]", ""))).cast("long")


def stopword_ratio(text: Column) -> Column:
    """Fraction of tokens that are stopwords (exact rational — count/count)."""
    toks = tokens(text)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return F.round(n_stop / F.size(toks).cast("double"), 6)


def avg_token_len(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t).cast("long")
    )
    return F.round(total / F.size(toks).cast("double"), 6)


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: long-enough, low punctuation,
    sane token lengths. Integer/rational arithmetic only → engine-exact.
    score = 0.4·min(n_tokens/100, 1) + 0.3·(1 − punct_ratio)
          + 0.3·(1 if 3 ≤ avg_token_len ≤ 12 else 0)
    """
    n_tok = F.size(tokens(text)).cast("double")
    n_chars = F.length(text).cast("double")
    punct_ratio = punct_count(text) / F.greatest(n_chars, F.lit(1.0))
    atl = avg_token_len(text)
    return F.round(
        F.lit(0.4) * F.least(n_tok / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.3) * F.when((atl >= 3.0) & (atl <= 12.0), 1.0).otherwise(0.0),
        6,
    )


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-hit score per language: |distinct tokens ∩ markers|."""
    toks = F.array_distinct(tokens(text))
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """argmax over marker scores; ties resolved by the fixed priority
    order en > de > es > fr (a CASE chain — identical in the SQL twin)."""
    s = lang_scores(text)
    expr = F.lit("und")
    # build the CASE chain back-to-front so 'en' wins ties
    order = list(LANG_MARKERS.keys())
    for lang in reversed(order):
        cond = None
        for other in order:
            if other == lang:
                continue
            c = s[lang] >= s[other] if order.index(other) > order.index(lang) else s[lang] > s[other]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond & (s[lang] > 0), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(text: Column) -> Column:
    """Rolling polynomial hash over tokens, mod 2^31−1.

    acc ← (acc·31 + len(tok)·17 + ascii(tok)) mod p — order-sensitive
    (a true rolling hash), pure integer arithmetic, exact in any
    engine. Twin: ``list_reduce(list_prepend(0, toks), ...)``.
    """
    toks = tokens(text)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (
            acc * F.lit(31) + F.length(t).cast("long") * F.lit(17) + F.ascii(t).cast("long")
        )
        % F.lit(_FP_MOD),
    )
