"""IVF-PQ tests: frozen-artifact reproducibility, exact-argmin code
parity vs an independent numpy computation, recall vs the brute-force
baseline, ADC-vs-exact agreement, and the reconstruction-error trade
vs the int8 baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_ml_pipeline_spark.operators import pq
from airflow_ml_pipeline_spark.operators.pq_train import (
    PQ_K,
    PQ_M,
    PQ_SUBDIM,
    build_pq_codebooks,
)
from airflow_ml_pipeline_spark.sources.catalog import load_table


def test_frozen_pq_codebooks_match_refit(spark):
    """The committed PQ codebooks (pq_codebooks.PQ_CODEBOOKS) are the
    artifact build_pq_codebooks' per-subspace KMeans(k=16, seed=42)
    produces on the committed sf0.01 corpus — a refit reproduces them
    (1e-6, the coarse-quantizer convention: float-reduction order
    varies with core count, so an ulp-tight pin is flaky off the
    committed host; semantic drift moves codewords far more). If
    tests/test_corpus_fingerprints.py reports a corpus change,
    regenerate via tools/freeze_pq_codebooks.py before trusting this
    pin."""
    from airflow_ml_pipeline_spark.operators.pq_codebooks import PQ_CODEBOOKS

    refit = build_pq_codebooks(spark, "/root/testdata/sf0.01")
    assert len(refit) == len(PQ_CODEBOOKS) == PQ_M
    worst = max(
        abs(a - b)
        for book_r, book_f in zip(refit, PQ_CODEBOOKS)
        for cw_r, cw_f in zip(book_r, book_f)
        for a, b in zip(cw_r, cw_f)
    )
    assert worst < 1e-6, f"refit diverges from frozen codebooks by {worst}"


def test_pq_codes_match_numpy(spark, sf_dir):
    """pq_index's per-subspace argmin (the B-table form, computed with
    no residual column) matches an independent numpy nearest-codeword
    computation ON THE RESIDUAL for every vector — pinning that the
    algebraic rewrite |r_m - cw|^2 -> B[cell][m][k] - 2 v_m.cw picks
    the same codeword (distance gaps on this corpus are far above
    float-association ulps)."""
    import numpy as np

    from airflow_ml_pipeline_spark.operators.ivf_centroids import IVF_CENTROIDS
    from airflow_ml_pipeline_spark.operators.pq_codebooks import PQ_CODEBOOKS

    emb = load_table(spark, sf_dir, "embeddings")
    got = {
        r.vec_id: (r.cluster_id, list(r.pq_code))
        for r in pq.pq_index(emb)
        .select("vec_id", "cluster_id", "pq_code")
        .collect()
    }
    cents = np.array(IVF_CENTROIDS)
    books = [np.array(b) for b in PQ_CODEBOOKS]
    for r in emb.collect():
        v = np.array([float(x) for x in r.embedding])
        cell = int(np.argmin(((cents - v) ** 2).sum(axis=1)))
        resid = v - cents[cell]
        codes = []
        for mi in range(PQ_M):
            rm = resid[mi * PQ_SUBDIM : (mi + 1) * PQ_SUBDIM]
            codes.append(int(np.argmin(((books[mi] - rm) ** 2).sum(axis=1))))
        assert got[r.vec_id] == (cell, codes), (
            r.vec_id,
            got[r.vec_id],
            (cell, codes),
        )


def test_ivfpq_recall_vs_bruteforce(spark, sf_dir):
    """Recall is bounded by the IVF scan fraction (6/16 lists on an
    unclustered corpus) MINUS ADC quantization noise (4-bit codes);
    measured 0.3-0.4 across the three SFs — gate at the same 0.2 floor
    as the un-quantized IVF probe, and require the query's own vector
    (ADC error can't displace an exact self-match's cell)."""
    from airflow_ml_pipeline_spark.operators import similarity

    exact = [
        r.vec_id
        for r in similarity.knn_cosine_bruteforce(spark, sf_dir).collect()
    ]
    approx = [r.vec_id for r in pq.ann_ivfpq_topk(spark, sf_dir).collect()]
    assert similarity.QUERY_VEC_ID in approx
    recall = len(set(exact) & set(approx)) / len(exact)
    assert recall >= 0.2, f"IVF-PQ recall {recall} below floor"


def test_adc_approximates_exact_cosine(spark, sf_dir):
    """ADC(v)/(|q||v|) must approximate the true cosine: for every
    vector in the probed cells the ADC error is bounded by the PQ
    reconstruction error (Cauchy-Schwarz: |q.(v - v_hat)| <=
    |q| * |v - v_hat|, so |cos_err| <= recon_l2 / |v|). Checks the
    bound vector-by-vector — a formulation bug (wrong LUT orientation,
    off-by-one code) violates it immediately and by orders of
    magnitude."""
    import math

    import numpy as np

    from airflow_ml_pipeline_spark.operators.ivf_centroids import IVF_CENTROIDS
    from airflow_ml_pipeline_spark.operators.pq_codebooks import PQ_CODEBOOKS

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = pq._fetch_query_vec(spark, sf_dir)
    q = np.array(qvec)
    qn = float(np.linalg.norm(q))
    cents = np.array(IVF_CENTROIDS)
    books = [np.array(b) for b in PQ_CODEBOOKS]
    adc = {
        r.vec_id: r.adc_cos
        for r in pq.ann_ivfpq_topk(spark, sf_dir).collect()
    }
    by_id = {r.vec_id: r for r in emb.collect()}
    for vid, adc_cos in adc.items():
        v = np.array([float(x) for x in by_id[vid].embedding])
        vn = float(np.linalg.norm(v))
        cell = int(np.argmin(((cents - v) ** 2).sum(axis=1)))
        resid = v - cents[cell]
        vhat = cents[cell].copy()
        recon_err2 = 0.0
        for mi in range(PQ_M):
            rm = resid[mi * PQ_SUBDIM : (mi + 1) * PQ_SUBDIM]
            k = int(np.argmin(((books[mi] - rm) ** 2).sum(axis=1)))
            vhat[mi * PQ_SUBDIM : (mi + 1) * PQ_SUBDIM] += books[mi][k]
            recon_err2 += float(((rm - books[mi][k]) ** 2).sum())
        true_cos = float(q @ v) / (qn * vn)
        bound = math.sqrt(recon_err2) / vn + 1e-6
        assert abs(adc_cos - true_cos) <= bound, (
            vid,
            adc_cos,
            true_cos,
            bound,
        )


def test_pq_error_exceeds_int8_but_bounded(spark, sf_dir):
    """The storage trade the twin query documents: 4-bit product codes
    lose more than 8-bit scalar quantization (mean pq_mse >= mean
    int8_mse) but remain bounded — PQ reconstruction must still beat
    the 'no index' strawman of predicting the coarse centroid alone
    on average (the codebooks carry real signal)."""
    import numpy as np

    from airflow_ml_pipeline_spark.operators.ivf_centroids import IVF_CENTROIDS

    rows = pq.pq_quantization_error(spark, sf_dir).collect()
    pq_mse = np.array([r.pq_mse_ppm for r in rows])
    int8_mse = np.array([r.int8_mse_ppm for r in rows])
    assert pq_mse.mean() >= int8_mse.mean()
    emb = load_table(spark, sf_dir, "embeddings")
    cents = np.array(IVF_CENTROIDS)
    coarse_only = []
    for r in emb.collect():
        v = np.array([float(x) for x in r.embedding])
        cell = int(np.argmin(((cents - v) ** 2).sum(axis=1)))
        coarse_only.append(float(((v - cents[cell]) ** 2).mean()) * 1e6)
    assert pq_mse.mean() < np.mean(coarse_only), (
        "PQ codes add no signal over the coarse centroid"
    )


def test_pq_index_emits_compact_codes(spark, sf_dir):
    """Contract of the stored index: PQ_M codes in [0, PQ_K), an
    integer cluster_id, a positive norm — the columns a 100 TB deploy
    writes once at ingest."""
    emb = load_table(spark, sf_dir, "embeddings")
    rows = pq.pq_index(emb).select("cluster_id", "pq_code", "vnorm").collect()
    assert rows
    for r in rows:
        assert 0 <= r.cluster_id < 16
        assert len(r.pq_code) == PQ_M
        assert all(0 <= c < PQ_K for c in r.pq_code)
        assert r.vnorm > 0


def test_rerank_recall_at_least_adc(spark, sf_dir):
    """The rerank stage can only help: within the probed cells the final
    ranking is exact, so recall vs brute force is >= the ADC-only
    probe's, and every rerank result must come from a probed cell."""
    from airflow_ml_pipeline_spark.operators import similarity

    exact = {
        r.vec_id
        for r in similarity.knn_cosine_bruteforce(spark, sf_dir).collect()
    }
    adc = {r.vec_id for r in pq.ann_ivfpq_topk(spark, sf_dir).collect()}
    rer = [r.vec_id for r in pq.ann_ivfpq_rerank_topk(spark, sf_dir).collect()]
    assert len(rer) == 10
    assert len(exact & set(rer)) >= len(exact & adc)
    # the query's own vector is an exact self-match in a probed cell
    assert similarity.QUERY_VEC_ID in rer


def test_code_histogram_accounts_every_vector(spark, sf_dir):
    """Mass conservation: per subspace the histogram's n_vecs sums to the
    corpus size, codes lie in [0, PQ_K), and n_cells <= 16."""
    from airflow_ml_pipeline_spark.sources.catalog import load_table

    n = load_table(spark, sf_dir, "embeddings").count()
    rows = pq.pq_code_histogram(spark, sf_dir).collect()
    per_sub = {}
    for r in rows:
        assert 0 <= r.code < PQ_K
        assert 1 <= r.n_cells <= 16
        per_sub[r.subspace] = per_sub.get(r.subspace, 0) + r.n_vecs
    assert per_sub == {mi: n for mi in range(PQ_M)}


def test_filtered_recall_vs_filtered_bruteforce(spark, sf_dir):
    """The filtered probe's recall gate, stated against the FILTERED
    exact scan (the correct ground truth — comparing against the
    unfiltered scan would conflate predicate selectivity with index
    recall): the probe and the label predicate are independent on this
    corpus, so the floor is the same probed-fraction bound as the
    unfiltered family (measured 0.5/0.2/0.2 across the SFs with the
    frozen codebooks — deterministic, not flaky). Every result must
    carry the predicate label and come from a probed cell."""
    from airflow_ml_pipeline_spark.operators import similarity
    from airflow_ml_pipeline_spark.operators.similarity import FILTER_LABEL

    exact = [
        r.vec_id
        for r in similarity.knn_cosine_bruteforce_filtered(
            spark, sf_dir
        ).collect()
    ]
    rows = pq.ann_ivfpq_filtered_topk(spark, sf_dir).collect()
    assert rows and all(r.label == FILTER_LABEL for r in rows)
    recall = len(set(exact) & {r.vec_id for r in rows}) / len(exact)
    assert recall >= 0.2, f"filtered IVF-PQ recall {recall} below floor"

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = pq._fetch_query_vec(spark, sf_dir)
    probes = set(pq._ivf_probe_lists(qvec))
    cells = {
        r.vec_id: r.cluster_id
        for r in pq.pq_index(emb).select("vec_id", "cluster_id").collect()
    }
    assert all(cells[r.vec_id] in probes for r in rows)


def test_filtered_probe_beats_post_filtering(spark, sf_dir):
    """The design contract the docstring states: filtering INSIDE the
    probed cells returns a full-k, all-matching result, and
    post-filtering the unfiltered ADC top-k can never return MORE
    matching rows than in-cell filtering. The strict k-starvation
    assert (post < k) is gated on the MEASURED label selectivity
    (ADVICE r14: the bare inequality coupled the test to the current
    corpus's ~10% label mix and would fail spuriously on regenerated
    data even though the query stays correct)."""
    from airflow_ml_pipeline_spark.operators.similarity import (
        FILTER_LABEL,
        TOP_K,
    )

    filtered = pq.ann_ivfpq_filtered_topk(spark, sf_dir).collect()
    assert len(filtered) == TOP_K
    assert all(r.label == FILTER_LABEL for r in filtered)
    post = [
        r
        for r in pq.ann_ivfpq_topk(spark, sf_dir).collect()
        if r.label == FILTER_LABEL
    ]
    assert len(post) <= len(filtered)
    emb = load_table(spark, sf_dir, "embeddings")
    selectivity = (
        emb.filter(F.col("label") == FILTER_LABEL).count() / emb.count()
    )
    if selectivity < 0.3:
        assert len(post) < TOP_K, (
            f"post-filtering did not starve at selectivity "
            f"{selectivity:.2f} — the filtered probe's advantage vanished"
        )


def test_cell_stats_conserve_mass_and_match_per_vector(spark, sf_dir):
    """pq_cell_stats must re-aggregate exactly what the per-vector error
    query reports: n_vecs sums to the corpus count, per-cell decimal
    error sums equal the per-vector frame's groupBy on the same 3dp
    lattice, and code diversity is bounded by cell population."""
    from decimal import Decimal

    rows = {r.cluster_id: r for r in pq.pq_cell_stats(spark, sf_dir).collect()}
    emb_n = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vecs for r in rows.values()) == emb_n
    per_vec = pq.pq_quantization_error(spark, sf_dir).collect()
    by_cell: dict[int, Decimal] = {}
    for r in per_vec:
        by_cell[r.cluster_id] = by_cell.get(
            r.cluster_id, Decimal(0)
        ) + Decimal(repr(r.pq_mse_ppm))
    assert set(by_cell) == set(rows)
    for cid, s in by_cell.items():
        assert Decimal(repr(rows[cid].pq_mse_ppm_sum)) == s, cid
    for r in rows.values():
        assert 1 <= r.n_codes_used <= r.n_vecs


def test_adaptive_probe_minimal_mass_cover(spark, sf_dir):
    """The adaptive probe is the MINIMAL cos-ranked prefix covering the
    mass target: the probed cells reach >= ceil(N * MASS_PPM / 1e6)
    vectors, dropping the last probed cell falls short, and the set is
    a prefix of the full cos ranking (the fixed probe's order)."""
    from airflow_ml_pipeline_spark.operators.ivf_centroids import IVF_K

    qvec = pq._fetch_query_vec(spark, sf_dir)
    probes = pq._adaptive_probe_cells(spark, sf_dir, qvec)
    order = pq._ivf_probe_lists(qvec, nprobe=IVF_K)
    assert probes == order[: len(probes)]
    emb = load_table(spark, sf_dir, "embeddings")
    counts = {
        r.cluster_id: r.n
        for r in pq.ivf_assign(emb)
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n = sum(counts.values())
    target = (n * pq.ADAPTIVE_MASS_PPM + 999_999) // 1_000_000
    covered = sum(counts.get(j, 0) for j in probes)
    assert covered >= target
    assert covered - counts.get(probes[-1], 0) < target


def test_adaptive_probe_recall_floor(spark, sf_dir):
    """Recall vs brute force is bounded below by the same
    scanned-fraction argument as the fixed probe (the mass target IS
    the scanned fraction on this corpus); results come only from
    probed cells."""
    from airflow_ml_pipeline_spark.operators import similarity

    exact = [
        r.vec_id
        for r in similarity.knn_cosine_bruteforce(spark, sf_dir).collect()
    ]
    rows = pq.ann_ivfpq_adaptive_topk(spark, sf_dir).collect()
    recall = len(set(exact) & {r.vec_id for r in rows}) / len(exact)
    assert recall >= 0.2, f"adaptive probe recall {recall} below floor"


def test_rebalance_plan_flags_exactly_the_stale_cells(spark, sf_dir):
    """On the committed corpora the planner's improvement rule flags
    exactly the odd (pre-refresh-encoded) cells: even cells score a
    stale/fresh ratio of exactly 1.0 (same codes), odd cells' weakest
    observed elevation is 1.0934 (sf0.01) — both comfortably separated
    from REBALANCE_IMPROVE = 1.05."""
    plan = pq.pq_rebalance_plan(spark, sf_dir).collect()
    for r in plan:
        assert r.reencode == (r.cluster_id % 2 == 1), r
        if r.cluster_id % 2 == 0:
            # identical codes -> identical decimal sums, bit-exactly
            assert r.stale_mse_ppm_sum == r.fresh_mse_ppm_sum, r
        else:
            assert (
                r.stale_mse_ppm_sum
                > pq.REBALANCE_IMPROVE * r.fresh_mse_ppm_sum
            ), r


def test_rebalanced_store_converges_to_fresh_build(spark, sf_dir):
    """The metamorphic convergence contract: after the apply step the
    on-disk store equals a fresh full pq_index build row-for-row
    (cluster, codes, vnorm), the reencoded flag marks exactly the
    flagged cells, and re-running the planner against the converged
    codes flags nothing (stale == fresh sums everywhere)."""
    rows = {r.vec_id: r for r in pq.pq_index_rebalanced(spark, sf_dir).collect()}
    emb = load_table(spark, sf_dir, "embeddings")
    fresh = pq.pq_index(emb).select(
        "vec_id",
        "cluster_id",
        F.concat_ws(
            "-", F.transform(F.col("pq_code"), lambda c: c.cast("string"))
        ).alias("code_s"),
        F.round(F.col("vnorm"), 6).alias("vnorm"),
    ).collect()
    assert len(fresh) == len(rows)
    for f in fresh:
        r = rows[f.vec_id]
        assert (r.cluster_id, r.code_s, r.vnorm) == (
            f.cluster_id,
            f.code_s,
            f.vnorm,
        ), f.vec_id
        assert r.reencoded == (f.cluster_id % 2 == 1), f.vec_id


def test_rebalance_rewrites_only_flagged_partitions(spark, sf_dir):
    """The only-touched-cells-rewritten contract, at the FILE level: the
    apply step dynamic-overwrites the flagged (odd) cells' partition
    directories, so every untouched even-cell file predates every
    rewritten odd-cell file. (The store is idempotent per corpus
    version; both markers exist by the time this runs.)"""
    import glob
    import os

    store = pq.rebalance_pq_store(spark, sf_dir)
    assert os.path.exists(os.path.join(store, "_rebalanced"))
    newest_even = 0.0
    oldest_odd = float("inf")
    odd_seen = False
    for d in glob.glob(os.path.join(store, "cluster_id=*")):
        cid = int(d.rsplit("=", 1)[1])
        mtimes = [
            os.stat(p).st_mtime
            for p in glob.glob(os.path.join(d, "*.parquet"))
        ]
        assert mtimes, d
        if cid % 2 == 0:
            newest_even = max(newest_even, max(mtimes))
        else:
            odd_seen = True
            oldest_odd = min(oldest_odd, min(mtimes))
    assert odd_seen
    assert newest_even < oldest_odd, (
        "an even (untouched) cell's files were rewritten by the apply "
        f"step: newest_even={newest_even}, oldest_odd={oldest_odd}"
    )


def test_batch_probe_agrees_with_single_query_probe(spark, sf_dir):
    """The batch ANN join must reproduce the single-query probe
    per anchor: for each anchor, running `_adc_probe_topk` with that
    anchor's own LUTs and probe set returns the same (vec_id, adc_cos)
    top-k the batch result holds under its q_id; ranks are 1..TOP_K."""
    from airflow_ml_pipeline_spark.operators.similarity import (
        ANCHOR_K,
        TOP_K,
        _ivf_probe_lists,
    )

    batch = {}
    for r in pq.ann_ivfpq_batch_topk(spark, sf_dir).collect():
        batch.setdefault(r.q_id, []).append((r.rank, r.vec_id, r.adc_cos))
    assert len(batch) == ANCHOR_K
    emb = load_table(spark, sf_dir, "embeddings")
    indexed = pq.pq_index(emb)
    anchors = (
        emb.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(ANCHOR_K)
        .collect()
    )
    # spot-check 5 anchors (each single-query probe is a full job)
    for r in anchors[:5]:
        qvec = [float(x) for x in r.embedding]
        lut0, lut, qn = pq._adc_luts(qvec)
        single = pq._adc_probe_topk(
            indexed, _ivf_probe_lists(qvec), lut0, lut, qn
        ).collect()
        got = sorted(batch[r.vec_id])
        assert [g[0] for g in got] == list(range(1, TOP_K + 1))
        assert [(g[1], g[2]) for g in got] == [
            (s.vec_id, s.adc_cos) for s in single
        ], r.vec_id
