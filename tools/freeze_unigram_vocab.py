"""Retrain the unigram-LM seed vocabulary and print the frozen-artifact
block for ``operators/unigram_lm.py`` (UNIGRAM_FROZEN_PIECES) — the
release step pinning the segmenter's vocabulary, like the BPE merge
table and the quality-model weights. Run after changing the seed
scoring, K, or the corpus family:

    python tools/freeze_unigram_vocab.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from airflow_ml_pipeline_spark.operators.unigram_lm import (
        unigram_seed_candidates,
    )
    from airflow_ml_pipeline_spark.session import get_spark

    spark = get_spark("freeze_unigram_vocab", master="local[8]")
    rows = unigram_seed_candidates(spark, sf_dir).collect()
    print("UNIGRAM_FROZEN_PIECES: list[tuple[str, int]] = [")
    for r in rows:
        # !r: a piece containing a quote/backslash must render as valid
        # Python source, not break the generated literal (r7 review)
        print(f"    ({r.piece!r}, {int(r.score)}),")
    print("]")


if __name__ == "__main__":
    main()
