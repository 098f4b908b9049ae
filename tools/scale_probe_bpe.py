"""10x corpus-volume scale probe for the BPE trainer (SCALE.md).

The claim (functions/bpe.py): the corpus collapses to its VOCABULARY
in one word-count shuffle; every merge round after that is
|vocab|-proportional. So 10x the corpus over the SAME vocabulary must
leave per-round cost flat (only the initial word count scans more),
and 10x the VOCABULARY must grow per-round cost ~linearly — never
quadratically.

Method: synthetic corpora from a fixed word population (drawn by hash
so frequencies are Zipf-ish), at (1x rows, V words), (10x rows, V
words), and (1x rows, 10V words). Times the full 20-round train and
the per-round tail (total minus the round-1 word count, isolated by a
0-round run).

Usage: python tools/scale_probe_bpe.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ["PYTHONPATH"] = os.pathsep.join(
    [str(REPO)]
    + ([os.environ["PYTHONPATH"]] if os.environ.get("PYTHONPATH") else [])
)

from pyspark.sql import functions as F  # noqa: E402

CASES = [
    ("1x corpus, 1x vocab", 100_000, 2_000),
    ("10x corpus, 1x vocab", 1_000_000, 2_000),
    ("1x corpus, 10x vocab", 100_000, 20_000),
]


def _words(spark, n_rows: int, n_vocab: int):
    """Synthetic word stream: word id = a hash skewed toward small ids
    (Zipf-ish), rendered as base-26 letters so pair structure exists."""
    return spark.range(n_rows).select(
        F.concat(
            F.lit("w"),
            F.conv(
                F.pmod(
                    F.xxhash64("id") % F.lit(n_vocab)
                    * F.pmod(F.xxhash64("id", F.lit(3)), F.lit(97)),
                    F.lit(n_vocab),
                ).cast("string"),
                10,
                26,
            ),
        ).alias("w")
    )


def main() -> int:
    from web_attack_detection_spark.functions import bpe
    from web_attack_detection_spark.session import build_session

    spark = build_session(app_name="scale_probe_bpe")
    spark.sparkContext.setLogLevel("ERROR")

    # warm
    bpe.bpe_train(_words(spark, 10_000, 500), n_rounds=2)

    results = {}
    for tag, n_rows, n_vocab in CASES:
        df = _words(spark, n_rows, n_vocab)
        t0 = time.perf_counter()
        merges, state = bpe.bpe_train(df, n_rounds=20)
        total = time.perf_counter() - t0
        nv = state.count()
        results[tag] = (total, len(merges), nv)
        print(
            f"{tag:22s} rows={n_rows:>8d} vocab={nv:>6d} "
            f"rounds={len(merges):>2d} total={total:6.2f}s "
            f"per_round={total / max(1, len(merges)):5.2f}s"
        )

    base = results["1x corpus, 1x vocab"][0]
    corpus_ratio = results["10x corpus, 1x vocab"][0] / base
    vocab_ratio = results["1x corpus, 10x vocab"][0] / base
    print(
        f"\n10x corpus -> {corpus_ratio:0.2f}x wall (claim: ~flat, "
        f"only the one word-count pass grows)"
    )
    print(
        f"10x vocab  -> {vocab_ratio:0.2f}x wall (claim: <= ~linear, "
        f"rounds are |vocab|-proportional)"
    )
    spark.stop()
    # corpus growth must cost far less than linear; vocab growth must
    # stay at-most-linear-ish (job floors dominate locally, so both
    # bounds are generous)
    return 0 if corpus_ratio < 4.0 and vocab_ratio < 12.0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
