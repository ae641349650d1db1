"""Unigram-LM tokenizer family: seed-candidate determinism and Viterbi
segmentation parity against an independent pure-Python DP (the
reference-parity pattern the BPE/winnowing/CDC kernels use — a
same-formula oracle can't catch formulation bugs; an independent
implementation can)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from airflow_ml_pipeline_spark.operators.unigram_lm import (
    _OBJ_M,
    SEED_TOP_K,
    UNIGRAM_FROZEN_PIECES,
    unigram_seed_candidates,
    viterbi_obj,
)


def _ref_viterbi(word: str, pieces: dict[str, int]) -> tuple[int, int]:
    """Independent DP: returns (best total score, piece count at the
    score-then-fewest-pieces optimum)."""
    n = len(word)
    NEG = float("-inf")
    best: list[tuple[float, int]] = [(0, 0)] + [(NEG, 0)] * n
    for i in range(1, n + 1):
        cands = []
        s0, k0 = best[i - 1]
        if s0 != NEG:
            cands.append((s0 + 0, k0 + 1))  # single char fallback
        for p, s in pieces.items():
            L = len(p)
            if L <= i and word[i - L : i] == p:
                sp, kp = best[i - L]
                if sp != NEG:
                    cands.append((sp + s, kp + 1))
        best[i] = max(cands, key=lambda c: (c[0], -c[1]))
    return int(best[n][0]), best[n][1]


def _spark_seg(spark, words: list[str]) -> dict[str, tuple[int, int]]:
    sdf = spark.createDataFrame([(w,) for w in words], ["word"])
    obj = viterbi_obj(F.col("word"))
    rows = sdf.select(
        "word",
        F.pmod(-obj, F.lit(_OBJ_M)).alias("k"),
        ((obj + F.pmod(-obj, F.lit(_OBJ_M))) / _OBJ_M)
        .cast("bigint")
        .alias("s"),
    ).collect()
    return {r.word: (int(r.s), int(r.k)) for r in rows}


def test_viterbi_matches_reference_on_corpus_vocab(spark, sf_dir):
    """Every corpus word segments identically to the independent DP."""
    from airflow_ml_pipeline_spark.functions.text import tokens
    from airflow_ml_pipeline_spark.sources.catalog import load_table

    words = [
        r.word
        for r in load_table(spark, sf_dir, "documents")
        .select(F.explode(tokens(F.col("text"))).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
        .collect()
    ]
    pieces = dict(UNIGRAM_FROZEN_PIECES)
    got = _spark_seg(spark, words)
    for w in words:
        assert got[w] == _ref_viterbi(w, pieces), w


def test_viterbi_adversarial_words(spark):
    """Unknown characters, overlapping pieces, single chars, and words
    where a greedy-longest-match segmenter would lose to the DP."""
    pieces = dict(UNIGRAM_FROZEN_PIECES)
    words = [
        "z",  # unknown char: 1 piece, score 0
        "er",  # exact piece
        "erer",  # two overlapping 'er's
        "customer",  # 'custom'+2 chars vs 'custo'+... DP decides
        "columns",
        "xyzzy",  # all-unknown
        "stomerer",
        "batchbatch",
        "windowcustom",
    ]
    got = _spark_seg(spark, words)
    for w in words:
        assert got[w] == _ref_viterbi(w, pieces), (w, got[w], _ref_viterbi(w, pieces))
    assert got["z"] == (0, 1)
    assert got["er"] == (pieces["er"], 1)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet=list("custermolnwbafi"), min_size=1, max_size=12),
        min_size=1,
        max_size=25,
        unique=True,
    )
)
def test_viterbi_random_parity(words):
    """Randomized words over the pieces' alphabet (maximizing piece-hit
    density) segment identically to the independent DP."""
    from airflow_ml_pipeline_spark.session import get_spark

    spark = get_spark("prop", master="local[4]")
    pieces = dict(UNIGRAM_FROZEN_PIECES)
    got = _spark_seg(spark, words)
    for w in words:
        assert got[w] == _ref_viterbi(w, pieces), w


def test_seed_candidates_deterministic_and_ranked(spark, sf_dir):
    """Top-K is a total order (score DESC, piece ASC): two runs agree
    exactly, scores are non-increasing, and every score equals
    freq × (len−1)."""
    a = unigram_seed_candidates(spark, sf_dir).collect()
    b = unigram_seed_candidates(spark, sf_dir).collect()
    assert [(r.piece, r.freq, r.score) for r in a] == [
        (r.piece, r.freq, r.score) for r in b
    ]
    assert len(a) == SEED_TOP_K
    scores = [r.score for r in a]
    assert scores == sorted(scores, reverse=True)
    for r in a:
        assert r.score == r.freq * (len(r.piece) - 1)
