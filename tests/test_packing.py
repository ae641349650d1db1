"""Training-data serving operator tests (shuffle/shard, sequence packing,
BPE pair stats, pseudonymization, embedding dim profile). The DuckDB oracle
check is the primary gate; these assert operator-level invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_ml_pipeline_spark.operators import packing
from airflow_ml_pipeline_spark.sources.catalog import load_table


def test_shards_partition_the_corpus_with_contiguous_positions(spark, sf_dir):
    rows = packing.corpus_shuffled_shards(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r.shard < packing.N_SHARDS
        by_shard.setdefault(r.shard, []).append(r.pos_in_shard)
    # every shard's positions are exactly 1..k (dense rank, no gaps/dups)
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))


def test_sequence_packing_offsets_are_contiguous_and_boundary_flagged(
    spark, sf_dir
):
    rows = packing.sequence_packing(spark, sf_dir).collect()
    ordered = sorted(rows, key=lambda r: r.start_token)
    # concatenation invariant: next doc starts where the previous ended
    assert ordered[0].start_token == 0
    for prev, cur in zip(ordered, ordered[1:]):
        assert cur.start_token == prev.start_token + prev.n_tokens
    for r in rows:
        spans = (
            (r.start_token + r.n_tokens - 1) // packing.SEQ_LEN
            - r.start_token // packing.SEQ_LEN
            + 1
        )
        assert r.n_seqs == spans
        assert r.crosses_boundary == (1 if spans > 1 else 0)


def test_packing_matches_single_partition_reference(spark, sf_dir):
    """The distributed two-phase prefix sum must equal the naive global
    cumsum in the same md5 order."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
        F.size(F.split("text", " ")).alias("n"),
    )
    expected = {}
    offset = 0
    for r in sorted(docs.collect(), key=lambda r: (r.h, r.doc_id)):
        expected[r.doc_id] = offset
        offset += r.n
    got = {
        r.doc_id: r.start_token
        for r in packing.sequence_packing(spark, sf_dir).collect()
    }
    assert got == expected


def test_bpe_merge_candidates_ranked_and_consistent(spark, sf_dir):
    rows = packing.bpe_merge_candidates(spark, sf_dir).collect()
    assert len(rows) == packing.TOP_PAIRS
    ordered = sorted(rows, key=lambda r: r.merge_rank)
    assert [r.merge_rank for r in ordered] == list(
        range(1, packing.TOP_PAIRS + 1)
    )
    counts = [r.cnt for r in ordered]
    assert counts == sorted(counts, reverse=True)
    for r in rows:  # every candidate is a real adjacent pair
        assert len(r.pair.split(" ")) == 2


def test_pseudonymization_suppresses_small_groups_and_is_stable(spark, sf_dir):
    res = packing.customer_pseudonymized(spark, sf_dir)
    rows = res.collect()
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert len(rows) == n_cust
    for r in rows:
        assert r.acctbal_band % 1000 == 0
        if r.group_k < packing.K_ANON:
            assert r.nation_key is None, "small group must be suppressed"
        else:
            assert r.nation_key is not None
        assert len(r.pseudonym) == 32  # md5 hex
    # deterministic: re-run produces identical pseudonyms
    again = {r.c_custkey: r.pseudonym for r in res.collect()}
    assert {r.c_custkey: r.pseudonym for r in rows} == again


def test_embedding_dim_stats_profile_shape(spark, sf_dir):
    rows = packing.embedding_dim_stats(spark, sf_dir).collect()
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    dims = sorted(r.dim for r in rows)
    assert dims == list(range(len(dims)))  # dense 0..d-1
    for r in rows:
        assert r.n == n_vecs
        assert r.min_x <= r.mean <= r.max_x
        assert r.std >= 0


def _ref_bpe(word_counts: dict[str, int], n_merges: int) -> list[tuple]:
    """Pure-Python reference BPE trainer: same greedy leftmost-first merge
    and (count desc, pair asc) tiebreak as the Spark implementation."""
    vocab = {w: list(w) for w in word_counts}
    merges = []
    for step in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + word_counts[w]
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < 2:
            break
        merges.append((step, left, right, cnt))
        for w, syms in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            vocab[w] = out
    return merges


def test_bpe_trained_merges_match_python_reference(spark, sf_dir):
    """The distributed trainer must reproduce the reference trainer's merge
    table EXACTLY (order, pairs, counts) on the real corpus vocab."""
    from airflow_ml_pipeline_spark.operators.packing import (
        BPE_N_MERGES,
        bpe_trained_merges,
    )
    from airflow_ml_pipeline_spark.functions.text import tokens
    from airflow_ml_pipeline_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    wc = {
        r.word: r.cnt
        for r in docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .count()
        .withColumnRenamed("count", "cnt")
        .collect()
    }
    got = [
        (r.step, r.left, r.right, r.pair_count)
        for r in bpe_trained_merges(spark, sf_dir).orderBy("step").collect()
    ]
    assert got == _ref_bpe(wc, BPE_N_MERGES)
    assert len(got) > 0


def test_bpe_overlapping_merge_is_leftmost_first(spark):
    """'aaaa' under merge (a,a) must become (aa)(aa), then (aa,aa) -> aaaa:
    the fold's replace-last semantics match reference BPE."""
    from airflow_ml_pipeline_spark.operators.packing import bpe_train_merges

    vocab = spark.createDataFrame([("aaaa", 3)], ["word", "cnt"])
    merges = bpe_train_merges(vocab, n_merges=3)
    assert merges[0][1:3] == ("a", "a")
    assert merges[1][1:3] == ("aa", "aa")


def test_training_data_manifest_detects_membership_change(spark, sf_dir):
    """The manifest checksum is order-insensitive but membership-sensitive:
    identical shard contents hash identically across recomputes; totals
    reconcile with the prepared corpus."""
    from airflow_ml_pipeline_spark.operators.dedup import prepared_corpus
    from airflow_ml_pipeline_spark.operators.manifest import training_data_manifest

    m1 = {r.shard: r for r in training_data_manifest(spark, sf_dir).collect()}
    m2 = {r.shard: r for r in training_data_manifest(spark, sf_dir).collect()}
    assert {s: r.members_md5 for s, r in m1.items()} == {
        s: r.members_md5 for s, r in m2.items()
    }
    prepared = prepared_corpus(spark, sf_dir)
    assert sum(r.n_docs for r in m1.values()) == prepared.count()
    assert sum(r.n_tokens for r in m1.values()) == (
        prepared.agg(F.sum("n_tokens")).collect()[0][0]
    )
    assert set(m1) <= set(range(16))


def _ref_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Independent reference encoder: leftmost-first greedy fold, one merge
    at a time in table order — NOT the string-replace formulation the
    engine uses, so replace-vs-fold equivalence is what this test pins."""
    syms = list(word)
    for left, right in merges:
        out: list[str] = []
        for s in syms:
            if out and out[-1] == left and s == right:
                out[-1] = left + right
            else:
                out.append(s)
        syms = out
    return syms


def test_bpe_encode_matches_fold_reference(spark, sf_dir):
    """Every corpus word's engine token count equals the pure-Python fold
    encoder's — including cascaded merges ('m'+'er' consuming merge 0's
    output) and repeated-pair words."""
    from collections import Counter

    from airflow_ml_pipeline_spark.functions.text import tokens as tok
    from airflow_ml_pipeline_spark.operators.packing import (
        BPE_FROZEN_MERGES,
        bpe_encoded_corpus,
    )

    docs = load_table(spark, sf_dir, "documents").collect()
    expected = {}
    for d in docs:
        words = [w for w in d.text.split(" ") if w]
        expected[d.doc_id] = (
            len(words),
            sum(len(_ref_encode(w, BPE_FROZEN_MERGES)) for w in words),
        )
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe_encoded_corpus(spark, sf_dir).collect()
    }
    assert got == expected


def test_bpe_encode_adversarial_words(spark):
    """Repeated pairs merge non-overlappingly ('aaa' -> [aa, a] under
    (a,a)); merged output does not cascade within the same merge; later
    merges do consume earlier merges' symbols."""
    merges = [("a", "a"), ("e", "r"), ("m", "er")]
    cases = {
        "aaa": ["aa", "a"],
        "aaaa": ["aa", "aa"],
        "merger": ["mer", "g", "er"],
        "er": ["er"],
        "mer": ["mer"],
        "x": ["x"],
    }
    for word, want in cases.items():
        assert _ref_encode(word, merges) == want, word
    sdf = spark.createDataFrame([(w,) for w in cases], ["word"])
    from airflow_ml_pipeline_spark.operators.packing import bpe_apply_merge

    syms = F.split("word", "")
    for left, right in merges:
        syms = bpe_apply_merge(syms, left, right)
    got = {r.word: r.syms for r in sdf.select("word", syms.alias("syms")).collect()}
    assert got == cases


def test_bpe_roundtrip_zero_failures_on_corpus(spark, sf_dir):
    """Invertibility (the r7 decode query's core claim): decoding every
    corpus word's frozen-merge encoding reproduces the word byte-for-byte
    — zero round-trip failures, every doc flagged ok."""
    from airflow_ml_pipeline_spark.operators.packing import (
        bpe_decoded_roundtrip,
    )

    rows = bpe_decoded_roundtrip(spark, sf_dir).collect()
    assert rows
    assert all(r.n_roundtrip_fail == 0 and r.roundtrip_ok == 1 for r in rows)
    n_words = {r.doc_id: r.n_words for r in rows}
    docs = load_table(spark, sf_dir, "documents").collect()
    expected = {
        d.doc_id: len([w for w in d.text.split(" ") if w]) for d in docs
    }
    assert n_words == expected


def test_bpe_roundtrip_detects_delimiter_corruption(spark):
    """Words that corrupt the delimited symbol rendering MUST be reported
    as round-trip failures (the release gate reports lossiness, never
    hides it) — while '|'-free words round-trip exactly. Leading/trailing
    pipes are eaten by btrim and doubled pipes merge into the delimiter,
    so those corrupt; an isolated interior pipe survives the split/join
    by accident and legitimately round-trips. Exercises the decode
    expression directly on a synthetic vocab, since the corpus is
    delimiter-free."""
    cases = {
        "merger": True,
        "stow": True,
        "lu": True,
        "a|b": True,  # interior single pipe: split yields a '|b' shard
        "a|": False,  # trailing pipe eaten by btrim
        "|a": False,  # leading pipe eaten by btrim
        "a||b": False,  # doubled pipe collapses into the delimiter
    }
    from airflow_ml_pipeline_spark.operators.packing import bpe_symbol_string

    sdf = spark.createDataFrame([(w,) for w in cases], ["word"])
    decoded = F.array_join(
        F.split(F.btrim(bpe_symbol_string(F.col("word")), F.lit("|")), "\\|\\|"),
        "",
    )
    got = {
        r.word: r.ok
        for r in sdf.select(
            "word", (decoded == F.col("word")).alias("ok")
        ).collect()
    }
    assert got == cases
