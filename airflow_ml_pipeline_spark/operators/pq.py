"""IVF-PQ: product-quantized ANN over the ``embeddings`` table.

The completion of the ANN index lifecycle the engine already owns
(``similarity.py``: brute force -> LSH -> IVF): on top of the frozen IVF
coarse quantizer (``ivf_centroids.IVF_CENTROIDS``), each vector's
RESIDUAL (v - coarse_centroid) is split into PQ_M subspaces and each
subspace is quantized against a frozen per-subspace codebook of PQ_K
entries — so a 64-dim float vector is stored as PQ_M 4-bit codes plus
one float norm. This is THE standard 100 TB ANN memory posture
(Jegou/Douze/Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011; the Faiss ``IVF16,PQ8x4`` index family): the scan
side of a query touches only (cluster_id, pq_code, vnorm) — ~12 bytes
per vector instead of 256 — and scoring is PQ_M lookup-table reads per
candidate (asymmetric distance computation, ADC).

Lifecycle (mirrors ``operators/ivf_centroids.py``):

- **Train offline**: ``pq_train.build_pq_codebooks`` fits one
  KMeans(k=PQ_K, seed=42) per subspace over the residual slices of the
  committed sf0.01 corpus; ``tools/freeze_pq_codebooks.py`` writes the
  artifact module (``operators/pq_codebooks.py``). Refit
  reproducibility is pinned by
  tests/test_pq.py::test_frozen_pq_codebooks_match_refit.
- **Encode at scale**: ``pq_index`` is pure column arithmetic against
  the frozen literals — per subspace an argmin over PQ_K distance
  folds, the whole code array emitted as ONE parsed ``F.expr`` string
  (the r12 one-parse convention). The residual never materializes:
  argmin_k |r_m - cw_k|^2 = argmin_k [ (|cw_k|^2 + 2 c_m.cw_k)
  - 2 v_m.cw_k ], and the bracket is a PRECOMPUTED constant per
  (coarse cell, subspace, code) — ``_pq_b_tables`` builds it
  driver-side from the frozen literals and interpolates the SAME
  doubles into both engines, so the scan-side work per (m, k) is one
  8-term dot against the raw slice. At 100 TB the code columns are
  written once, alongside cluster_id as the partition key.
- **Query by ADC**: the query-to-codebook lookup tables (one
  q.centroid dot per coarse cell, one q_m.codeword dot per (subspace,
  code)) are computed once per query — driver-side Python doubles on
  the Spark side, the 1-row ``q`` CTE's scalar columns on the DuckDB
  side, both the same left-associative chains — so the ADC score is
  bit-identical across engines and the entire top-k is
  driver-hash-pinned.

Reference parity: the reference repo has no ANN/PQ surface (it is a
10k-row churn pipeline, ``src/ml_pipeline/``); this family is part of
the engine's LLM-training-data surface (SURVEY.md §2.12 additions).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_ml_pipeline_spark.functions.vectors import l2_norm
from airflow_ml_pipeline_spark.operators.pq_train import (
    PQ_K,
    PQ_M,
    PQ_SUBDIM,
    build_pq_codebooks,  # noqa: F401  (re-export: the train step)
    residual_expr,  # noqa: F401  (re-export: used by the train step/tests)
)
from airflow_ml_pipeline_spark.operators.similarity import (
    FILTER_LABEL,
    IVF_NPROBE,
    QUERY_VEC_ID,
    TOP_K,
    _ivf_probe_lists,
    ivf_assign,
)
from airflow_ml_pipeline_spark.plans.registry import query
from airflow_ml_pipeline_spark.sources.catalog import load_spread, load_table


def _pq_b_tables() -> list[list[list[float]]]:
    """B[m][cell][k] = |cw_mk|^2 + 2 * (coarse_centroid[cell]_m . cw_mk)
    — the cluster-dependent constant that replaces the residual in the
    code argmin. Computed driver-side over the frozen literals with
    explicit left-associative folds (plain Python floats ARE doubles)
    and interpolated VERBATIM into both engines, so the argmin compares
    identical doubles everywhere."""
    from airflow_ml_pipeline_spark.operators.ivf_centroids import IVF_CENTROIDS
    from airflow_ml_pipeline_spark.operators.pq_codebooks import (
        PQ_CODEBOOK_N2,
        PQ_CODEBOOKS,
    )

    tables: list[list[list[float]]] = []
    for mi in range(PQ_M):
        off = mi * PQ_SUBDIM
        per_cell = []
        for cell in IVF_CENTROIDS:
            sub = cell[off : off + PQ_SUBDIM]
            row = []
            for k, cw in enumerate(PQ_CODEBOOKS[mi]):
                d = 0.0
                for x, y in zip(sub, cw):
                    d = d + x * y
                row.append(PQ_CODEBOOK_N2[mi][k] + 2.0 * d)
            per_cell.append(row)
        tables.append(per_cell)
    return tables


def _pq_code_sql(emb_col: str = "embedding", k_used: int = PQ_K) -> str:
    """The PQ_M-element code array as ONE Spark SQL expression string,
    computed DIRECTLY from the raw vector (no residual column): per
    subspace the argmin over ``k_used`` codewords reuses ``ivf_assign``'s
    single-pass struct-fold (each distance fold mentioned exactly once,
    strict-improvement lowest-index tie rule), with the
    cluster-dependent B term fetched by one element_at on a
    constant-folded literal table. Requires a ``cluster_id`` column.

    ``k_used < PQ_K`` restricts the argmin to the FIRST k_used codewords
    of each frozen codebook — the stale-encoder stand-in the rebalance
    lifecycle (``pq_index_rebalanced``) uses to simulate a store written
    before a codebook refresh."""
    from airflow_ml_pipeline_spark.operators.pq_codebooks import PQ_CODEBOOKS

    b_tables = _pq_b_tables()
    codes = []
    for mi in range(PQ_M):
        cbs = ", ".join(
            "array(" + ", ".join(f"{float(v)!r}D" for v in cw) + ")"
            for cw in PQ_CODEBOOKS[mi][:k_used]
        )
        blit = ", ".join(
            "array(" + ", ".join(f"{b!r}D" for b in row[:k_used]) + ")"
            for row in b_tables[mi]
        )
        off = mi * PQ_SUBDIM + 1
        codes.append(
            f"""aggregate(
            transform(
                zip_with(
                    element_at(array({blit}), cluster_id + 1),
                    transform(array({cbs}), c ->
                        aggregate(zip_with(slice(`{emb_col}`, {off}, {PQ_SUBDIM}), c,
                                           (x, y) -> CAST(x AS DOUBLE) * y),
                                  0.0D, (acc, x) -> acc + x)),
                    (b, d) -> b - 2.0D * d),
                (s, k) -> struct(CAST(k AS INT) AS k, s AS s)),
            struct(CAST(-1 AS INT) AS k, CAST('Infinity' AS DOUBLE) AS s),
            (acc, x) -> IF(x.s < acc.s, x, acc)).k"""
        )
    return "array(" + ", ".join(codes) + ")"


def pq_index(df: DataFrame, emb_col: str = "embedding") -> DataFrame:
    """The stored IVF-PQ index columns: cluster_id (coarse cell — the
    partition key at scale), pq_code (PQ_M small ints), vnorm (the exact
    norm, kept so ADC can report cosine). Projection-only: no shuffle,
    no join, no UDF — at 100 TB this runs once at ingest and the
    original float vectors never need to be read again by a query."""
    a = ivf_assign(df, emb_col)
    return a.select(
        *a.columns,
        F.expr(_pq_code_sql(emb_col)).alias("pq_code"),
        l2_norm(F.col(emb_col)).alias("vnorm"),
    )


def _adc_luts(qvec: list[float]) -> tuple[list[float], list[list[float]], float]:
    """Driver-side ADC lookup tables over the frozen literals, every dot
    the same left-associative IEEE sequence the oracle's q-CTE chains
    evaluate (plain Python floats ARE doubles):

    - lut0[j]   = q . coarse_centroid[j]   (the coarse cell's IP term)
    - lut[m][k] = q_m . codebook[m][k]     (the residual term per code)
    - qnorm     = |q|

    so ADC(v) = lut0[cluster] + sum_m lut[m][code_m] approximates q.v
    (exactly q.(centroid + codewords)), and ADC_cos = ADC / (qnorm *
    vnorm) approximates cosine with EXACT norms (the norm is stored,
    not quantized)."""
    from airflow_ml_pipeline_spark.operators.ivf_centroids import IVF_CENTROIDS
    from airflow_ml_pipeline_spark.operators.pq_codebooks import PQ_CODEBOOKS

    lut0 = []
    for c in IVF_CENTROIDS:
        d = 0.0
        for x, y in zip(qvec, c):
            d = d + x * y
        lut0.append(d)
    lut = []
    for mi in range(PQ_M):
        sub = qvec[mi * PQ_SUBDIM : (mi + 1) * PQ_SUBDIM]
        row = []
        for cw in PQ_CODEBOOKS[mi]:
            d = 0.0
            for x, y in zip(sub, cw):
                d = d + x * y
            row.append(d)
        lut.append(row)
    qn = 0.0
    for x in qvec:
        qn = qn + x * x
    return lut0, lut, math.sqrt(qn)


def _adc_sql(lut0: list[float], lut: list[list[float]]) -> str:
    """The ADC sum as ONE Spark SQL expression over the stored index
    columns (cluster_id, pq_code): 1 + PQ_M constant-array lookups —
    the per-candidate score of every IVF-PQ probe variant (shared so
    the plain, filtered, and rerank probes cannot drift)."""
    lut0_lit = "array(" + ", ".join(f"{v!r}D" for v in lut0) + ")"
    terms = [f"element_at({lut0_lit}, cluster_id + 1)"]
    for mi in range(PQ_M):
        lit = "array(" + ", ".join(f"{v!r}D" for v in lut[mi]) + ")"
        terms.append(f"element_at({lit}, element_at(pq_code, {mi + 1}) + 1)")
    return " + ".join(terms)


def _adc_probe_topk(
    indexed: DataFrame,
    probes: list[int],
    lut0: list[float],
    lut: list[list[float]],
    qnorm: float,
    k: int = TOP_K,
) -> DataFrame:
    """Probe-scan + ADC-score + top-k — THE shared tail of every IVF-PQ
    probe variant (plain, filtered, adaptive, and the rerank shortlist),
    so the rounding scale and the (adc_cos DESC, vec_id) tie order live
    in exactly one place (r14 review finding: four copies had begun to
    accumulate). ``indexed`` must carry (vec_id, label, cluster_id,
    pq_code, vnorm)."""
    adc = _adc_sql(lut0, lut)
    return (
        indexed.filter(F.col("cluster_id").isin(probes))
        .select(
            "vec_id",
            "label",
            F.round(F.expr(adc) / (F.lit(qnorm) * F.col("vnorm")), 6).alias(
                "adc_cos"
            ),
        )
        .orderBy(F.desc("adc_cos"), F.asc("vec_id"))
        .limit(k)
    )


def _fetch_query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    emb = load_table(spark, sf_dir, "embeddings")
    row = (
        emb.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select("embedding")
        .collect()[0]
    )
    return [float(x) for x in row[0]]


def _sql_pq_coded(
    alias_cols: str = "vec_id, label, embedding",
    materialized: bool = False,
    with_stale: bool = False,
) -> str:
    """DuckDB CTE chain reproducing the engine's index columns bit-exactly:
    coarse assignment (the green ``ann_ivf_topk`` least/CASE form), then
    per subspace the PQ code as least+CASE over PQ_K distance chains —
    each chain ``B - 2 * (v_m . cw)`` with B selected by ONE 16-branch
    CASE per subspace building the cell's 16-entry list (a scalar-cheap
    lookup; the naive per-element indexing of a nested 2048-double
    literal inside a lambda re-built the literal per element and cost
    ~40 s at sf0.001)."""
    from airflow_ml_pipeline_spark.operators.ivf_centroids import (
        IVF_CENTROIDS,
        IVF_CENTROID_N2,
        IVF_K,
    )
    from airflow_ml_pipeline_spark.operators.pq_codebooks import PQ_CODEBOOKS

    b_tables = _pq_b_tables()
    scores = []
    for j, c in enumerate(IVF_CENTROIDS):
        dchain = " + ".join(
            f"CAST(embedding[{i + 1}] AS DOUBLE) * {float(v)!r}"
            for i, v in enumerate(c)
        )
        scores.append(f"{IVF_CENTROID_N2[j]!r} - 2.0 * ({dchain}) AS s{j}")
    least = "least(" + ", ".join(f"s{j}" for j in range(IVF_K)) + ")"
    case = (
        "CASE "
        + " ".join(f"WHEN s{j} = mn THEN {j}" for j in range(IVF_K))
        + " ELSE -1 END"
    )
    bm_sql = []
    chain_sql = []
    min_sql = []
    pick_sql = []
    for mi in range(PQ_M):
        branches = " ".join(
            "WHEN "
            + str(cell)
            + " THEN ["
            + ", ".join(f"{b!r}" for b in b_tables[mi][cell])
            + "]"
            for cell in range(IVF_K)
        )
        bm_sql.append(f"CASE cluster_id {branches} END AS bm{mi}")
        off = mi * PQ_SUBDIM
        for k, cw in enumerate(PQ_CODEBOOKS[mi]):
            d = " + ".join(
                f"CAST(embedding[{off + d1 + 1}] AS DOUBLE) * {float(v)!r}"
                for d1, v in enumerate(cw)
            )
            chain_sql.append(f"bm{mi}[{k + 1}] - 2.0 * ({d}) AS t{mi}_{k}")
        min_sql.append(
            "least("
            + ", ".join(f"t{mi}_{k}" for k in range(PQ_K))
            + f") AS mn{mi}"
        )
        pick_sql.append(
            "CAST(CASE "
            + " ".join(
                f"WHEN t{mi}_{k} = mn{mi} THEN {k}" for k in range(PQ_K)
            )
            + f" ELSE -1 END AS INTEGER) AS c{mi}"
        )
        if with_stale:
            # the stale encoder's argmin over the FIRST PQ_STALE_K
            # codewords — the same distance terms, subset least + pick
            # (the rebalance oracle's half-codebook twin)
            min_sql.append(
                "least("
                + ", ".join(f"t{mi}_{k}" for k in range(PQ_STALE_K))
                + f") AS hmn{mi}"
            )
            pick_sql.append(
                "CAST(CASE "
                + " ".join(
                    f"WHEN t{mi}_{k} = hmn{mi} THEN {k}"
                    for k in range(PQ_STALE_K)
                )
                + f" ELSE -1 END AS INTEGER) AS hc{mi}"
            )
    sep = ",\n               "
    # MATERIALIZED stops DuckDB's default CTE inlining from re-evaluating
    # the full encode chain per reference (multiply-referenced consumers:
    # the ADC probes' final select, the histogram's 8 UNION branches) —
    # parameterized here so no call site needs fragile string surgery
    # (r14 review finding: an unasserted .replace would silently no-op
    # if this text ever changed).
    mat = "MATERIALIZED " if materialized else ""
    return f"""
    s AS (
        SELECT {alias_cols}, {", ".join(scores)}
        FROM embeddings
    ),
    assigned AS (
        SELECT {alias_cols}, CAST({case} AS INTEGER) AS cluster_id
        FROM (SELECT *, {least} AS mn FROM s)
    ),
    bm AS (
        SELECT *,
               {sep.join(bm_sql)}
        FROM assigned
    ),
    chains AS (
        SELECT *,
               {sep.join(chain_sql)}
        FROM bm
    ),
    mins AS (
        SELECT *,
               {sep.join(min_sql)}
        FROM chains
    ),
    coded AS {mat}(
        SELECT *,
               {sep.join(pick_sql)}
        FROM mins
    )"""


VNORM_SQL = """sqrt(list_sum(list_transform(range(1, 65),
                 i -> CAST(embedding[i] AS DOUBLE)
                      * CAST(embedding[i] AS DOUBLE))))"""


def _sql_ann_ivfpq(extra_where: str = "") -> str:
    """DuckDB twin of the ADC probe. The engine computes the LUTs
    DRIVER-SIDE in Python; the oracle computes each LUT entry ONCE in
    the 1-row ``q`` CTE as the same left-associative chain over
    ``qvec`` and the frozen literals — plain Python floats ARE doubles
    and both chains evaluate in the same order, so every table entry,
    the probe set, the ADC sum, and the final rounded score are
    bit-identical across engines (the ``_sql_ann_ivf`` treatment
    extended to the PQ LUTs). ``extra_where`` appends a metadata
    predicate (AND-prefixed) to the probed-cell scan — the filtered
    variant."""
    from airflow_ml_pipeline_spark.operators.ivf_centroids import (
        IVF_CENTROIDS,
        IVF_CENTROID_N2,
        IVF_K,
    )
    from airflow_ml_pipeline_spark.operators.pq_codebooks import PQ_CODEBOOKS

    qnorm = (
        "sqrt("
        + " + ".join(f"qvec[{i + 1}] * qvec[{i + 1}]" for i in range(64))
        + ")"
    )
    lut_cols = [f"({qnorm}) AS qn"]
    for j, c in enumerate(IVF_CENTROIDS):
        dchain = " + ".join(
            f"qvec[{i + 1}] * {float(v)!r}" for i, v in enumerate(c)
        )
        lut_cols.append(f"({dchain}) AS l0_{j}")
    for mi in range(PQ_M):
        off = mi * PQ_SUBDIM
        for k, cw in enumerate(PQ_CODEBOOKS[mi]):
            dchain = " + ".join(
                f"qvec[{off + d1 + 1}] * {float(v)!r}"
                for d1, v in enumerate(cw)
            )
            lut_cols.append(f"({dchain}) AS lm{mi}_{k}")
    # probe ranking: identical to _sql_ann_ivf (cosine to each coarse
    # centroid, top IVF_NPROBE by (cos DESC, j)) — restated over the
    # q CTE's precomputed dot columns
    probes = []
    for j in range(IVF_K):
        cn = float(math.sqrt(IVF_CENTROID_N2[j]))
        probes.append(
            f"SELECT {j} AS j, l0_{j} / (qn * {cn!r}) AS cos FROM q"
        )
    cell_case = (
        "CASE cluster_id "
        + " ".join(f"WHEN {j} THEN l0_{j}" for j in range(IVF_K))
        + " END"
    )
    terms = [f"({cell_case})"]
    for mi in range(PQ_M):
        terms.append(
            "(CASE c"
            + str(mi)
            + " "
            + " ".join(f"WHEN {k} THEN lm{mi}_{k}" for k in range(PQ_K))
            + " END)"
        )
    adc = " + ".join(terms)
    sep = ",\n               "
    # AS MATERIALIZED: DuckDB inlines CTEs by default, and inlining the
    # 145-column q into its 17 references (and the 190-column coded
    # into the final select's 9 CASE references) re-evaluated the
    # chains per reference — 20.5 s vs 1.8 s at sf0.001, measured.
    coded = _sql_pq_coded(materialized=True).lstrip()
    return f"""
    WITH q AS MATERIALIZED (
        SELECT {sep.join(lut_cols)}
        FROM (SELECT CAST(embedding AS DOUBLE[]) AS qvec
              FROM embeddings WHERE vec_id = {QUERY_VEC_ID})
    ),
    cent_cos AS ({" UNION ALL ".join(probes)}),
    probe AS (SELECT j FROM cent_cos ORDER BY cos DESC, j LIMIT {IVF_NPROBE}),
    {coded}
    SELECT vec_id, label,
           round(({adc}) / (qn * {VNORM_SQL}), 6) AS adc_cos
    FROM coded CROSS JOIN q
    WHERE cluster_id IN (SELECT j FROM probe){extra_where}
    ORDER BY adc_cos DESC, vec_id
    LIMIT {TOP_K}
    """


@query("ann_ivfpq_topk", oracle=_sql_ann_ivfpq())
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN probe: scan only the nprobe=6 coarse cells nearest the
    query, score candidates by ASYMMETRIC DISTANCE — the query-side
    lookup tables are exact dots against the frozen codebooks, the data
    side contributes only its stored (cluster_id, pq_code, vnorm) index
    columns. At 100 TB this is the memory posture that makes ANN
    feasible at all: 64 float32 dims (256 B) become 8 4-bit codes + one
    norm (~12 B), the probe is partition pruning on cluster_id, and
    scoring is 9 constant-array lookups + one divide per candidate —
    the raw vectors are never read by the search (this in-line query
    re-derives the index columns from the raw parquet because the test
    corpus ships un-encoded; at scale ``pq_index`` runs once at
    ingest).

    ORACLE-CHECKED (value hash) via the same frozen-artifact treatment
    as ``ann_ivf_topk``: assignment, code argmins, LUT values, and the
    ADC sum are all restated in DuckDB over {v!r}-interpolated literals
    with matching association order, so both engines order the SAME
    rounded doubles. Recall vs the exact scan is measured by
    tests/test_pq.py::test_ivfpq_recall_vs_bruteforce (on this
    unclustered synthetic corpus recall ~= the scanned fraction minus
    quantization noise; the gate is the measured floor)."""
    qvec = _fetch_query_vec(spark, sf_dir)
    lut0, lut, qnorm = _adc_luts(qvec)
    probes = _ivf_probe_lists(qvec)

    emb = load_table(spark, sf_dir, "embeddings")
    indexed = pq_index(emb)
    return _adc_probe_topk(indexed, probes, lut0, lut, qnorm)


@query(
    "ann_ivfpq_filtered_topk",
    oracle=_sql_ann_ivfpq(extra_where=f" AND label = {FILTER_LABEL}"),
)
def ann_ivfpq_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED IVF-PQ probe — top-k under a metadata predicate
    (label = FILTER_LABEL), the most common real retrieval shape
    (a language slice, a source allowlist, a tenant id). The predicate
    is applied INSIDE the probed cells, before ADC ranking — i.e. the
    candidate set is {{cluster in probe}} ∩ {{label = L}} — never by
    post-filtering an unfiltered shortlist, which k-starves whenever
    fewer than k global winners carry the label (at the 10% selectivity
    of this corpus an unfiltered ADC top-10 typically holds ~1 matching
    row). The base-table filter commutes with the projection-only
    encode, so Catalyst pushes ``label = L`` into the parquet scan
    (plan contract: tests/test_plan_contracts.py) while the probe's
    cluster_id filter prunes partitions at scale exactly as in
    ``ann_ivfpq_topk`` — at 100 TB the scan reads only nprobe cells'
    row groups and label filtering is free row-group pruning on top.

    Recall contract: vs the FILTERED exact scan
    (``knn_cosine_bruteforce_filtered``), measured by
    tests/test_pq.py::test_filtered_recall_vs_filtered_bruteforce —
    the floor is the same probed-fraction bound as the unfiltered
    family (the predicate and the probe are independent on this
    corpus). Oracle: the green ``_sql_ann_ivfpq`` statement with the
    predicate appended to the probed-cell WHERE — one generator, so
    the filtered and unfiltered twins cannot drift."""
    qvec = _fetch_query_vec(spark, sf_dir)
    lut0, lut, qnorm = _adc_luts(qvec)
    probes = _ivf_probe_lists(qvec)

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("label") == FILTER_LABEL
    )
    indexed = pq_index(emb)
    return _adc_probe_topk(indexed, probes, lut0, lut, qnorm)


def _pq_mse_col(code_col: str = "pq_code"):
    """Per-vector PQ reconstruction MSE (raw, un-ppm'd) as one Spark
    column over (embedding, cluster_id, ``code_col``): err = (v -
    centroid) - codeword per element, squared and folded left-to-right.
    Shared by the per-vector error query, the per-cell stats query, and
    the rebalance planner (which scores a stale and a fresh code column
    side by side)."""
    from airflow_ml_pipeline_spark.operators.ivf_centroids import IVF_CENTROIDS
    from airflow_ml_pipeline_spark.operators.pq_codebooks import PQ_CODEBOOKS

    cent2d = ", ".join(
        "array(" + ", ".join(f"{float(v)!r}D" for v in c) + ")"
        for c in IVF_CENTROIDS
    )
    cw_terms = []
    for mi in range(PQ_M):
        lit = (
            "array("
            + ", ".join(
                "array(" + ", ".join(f"{float(v)!r}D" for v in cw) + ")"
                for cw in PQ_CODEBOOKS[mi]
            )
            + ")"
        )
        cw_terms.append(
            f"element_at({lit}, element_at(`{code_col}`, {mi + 1}) + 1)"
        )
    recon = "concat(" + ", ".join(cw_terms) + ")"
    return F.expr(
        f"""aggregate(
            zip_with(
                zip_with(`embedding`, element_at(array({cent2d}), cluster_id + 1),
                         (x, y) -> CAST(x AS DOUBLE) - y),
                {recon},
                (x, y) -> pow(x - y, 2D)),
            0.0D, (acc, x) -> acc + x) / 64"""
    )


def _sql_recon_pieces(
    code_col: str = "c", out: str = "cw"
) -> tuple[str, list[str], str]:
    """(cc_case, cw_cases, rec): the scalar-CASE reconstruction pieces
    over the ``coded`` CTE's columns — the coarse centroid list selected
    by cluster_id, one codeword list per subspace selected by its code
    column (``{code_col}{mi}``, emitted as ``{out}{mi}``), and their
    concatenation. Shared by the per-vector error oracle, the per-cell
    stats oracle, and the rebalance oracle (which reconstructs a stale
    and a fresh code set side by side — one generator)."""
    from airflow_ml_pipeline_spark.operators.ivf_centroids import (
        IVF_CENTROIDS,
        IVF_K,
    )
    from airflow_ml_pipeline_spark.operators.pq_codebooks import PQ_CODEBOOKS

    cc_case = (
        "CASE cluster_id "
        + " ".join(
            "WHEN "
            + str(j)
            + " THEN ["
            + ", ".join(f"{float(v)!r}" for v in IVF_CENTROIDS[j])
            + "]"
            for j in range(IVF_K)
        )
        + " END"
    )
    cw_cases = []
    for mi in range(PQ_M):
        cw_cases.append(
            f"CASE {code_col}{mi} "
            + " ".join(
                "WHEN "
                + str(k)
                + " THEN ["
                + ", ".join(f"{float(v)!r}" for v in PQ_CODEBOOKS[mi][k])
                + "]"
                for k in range(PQ_K)
            )
            + f" END AS {out}{mi}"
        )
    rec = " || ".join(f"{out}{mi}" for mi in range(PQ_M))
    return cc_case, cw_cases, rec


def _sql_pq_error() -> str:
    """Reconstruction v_hat = coarse_centroid + codeword per subspace,
    so err_i = (v_i - c_i) - cw_i, folded left-to-right in both
    engines; the centroid and codeword lists are selected by scalar
    CASEs (one per row), never indexed as nested literals inside a
    lambda. The int8 baseline column restates the green
    ``embedding_quantization_error`` kernel verbatim."""
    cc_case, cw_cases, rec = _sql_recon_pieces()
    sep = ",\n               "
    return f"""
    WITH {_sql_pq_coded().lstrip()},
    recon AS (
        SELECT *,
               {cc_case} AS cc,
               {sep.join(cw_cases)}
        FROM coded
    )
    SELECT vec_id, label, cluster_id,
           round(list_sum(list_transform(range(1, 65),
                 i -> pow(CAST(embedding[i] AS DOUBLE) - cc[i]
                          - rec[i], 2)))
                 / 64 * 1000000, 3) AS pq_mse_ppm,
           round(list_sum(list_transform(range(1, 65),
                 i -> pow(CAST(embedding[i] AS DOUBLE)
                          - round(CAST(embedding[i] AS DOUBLE) / sc) * sc,
                          2))) / 64 * 1000000, 3) AS int8_mse_ppm
    FROM (SELECT *, ({rec}) AS rec,
                 greatest(list_max(list_transform(CAST(embedding AS DOUBLE[]),
                    x -> abs(x))) / 127.0, 1e-12) AS sc
          FROM recon)
    """


@query("pq_quantization_error", oracle=_sql_pq_error())
def pq_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector IVF-PQ reconstruction MSE (ppm) beside the int8
    scalar-quantization baseline (``embedding_quantization_error``): the
    decision table for the 100 TB storage trade — PQ stores ~12 B/vector
    vs int8's 64 B, at the cost of higher (but bounded) reconstruction
    error. Reconstruction = coarse_centroid[cluster] + per-subspace
    codeword; all JVM-side array arithmetic against frozen literals, no
    shuffle, no UDF."""
    from airflow_ml_pipeline_spark.operators.ivf_centroids import IVF_CENTROIDS
    from airflow_ml_pipeline_spark.operators.pq_codebooks import PQ_CODEBOOKS

    # spread the one-file scan before the full-corpus encode pass
    # (r15 opt): the committed corpora arrive as a single parquet
    # split, so the codegen'd ADC/recon chains otherwise evaluate
    # on ONE task (the covariance-pass lesson); keyed on vec_id —
    # every downstream sum is decimal/int, order-independent. At
    # 100 TB the scan arrives multi-split and this is one slim
    # rebalance exchange before compute-bound work.
    emb = load_spread(spark, sf_dir, "embeddings", by="vec_id")
    a = ivf_assign(emb)
    a = a.select(*a.columns, F.expr(_pq_code_sql()).alias("pq_code"))

    pq_mse = _pq_mse_col()
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    scale = F.greatest(
        F.array_max(F.transform(v, F.abs)) / F.lit(127.0), F.lit(1e-12)
    )
    b = a.select(
        "vec_id",
        "label",
        "cluster_id",
        F.round(pq_mse * 1_000_000, 3).alias("pq_mse_ppm"),
        v.alias("v"),
        scale.alias("sc"),
    )
    err8 = F.transform(
        F.col("v"),
        lambda x: F.pow(x - F.round(x / F.col("sc")) * F.col("sc"), F.lit(2)),
    )
    int8_mse = F.aggregate(err8, F.lit(0.0), lambda acc, x: acc + x) / F.lit(
        64
    )
    return b.select(
        "vec_id",
        "label",
        "cluster_id",
        "pq_mse_ppm",
        F.round(int8_mse * 1_000_000, 3).alias("int8_mse_ppm"),
    )


RERANK_SHORTLIST = 50


def _sql_ann_ivfpq_rerank() -> str:
    """Oracle for the two-stage probe: the ADC shortlist CTE reuses the
    full coded/probe machinery (deterministic under the rounded-ADC +
    vec_id total order), then the exact-cosine rerank reuses the green
    ``SQL_COS_VS_QVEC`` statement verbatim."""
    from airflow_ml_pipeline_spark.operators.similarity import (
        SQL_COS_VS_QVEC,
    )

    adc_sql = _sql_ann_ivfpq()
    # the ADC top-k statement with the shortlist size in place of TOP_K
    # (string surgery on the LIMIT tail keeps ONE generator for the
    # whole coded/probe restatement)
    assert adc_sql.rstrip().endswith(f"LIMIT {TOP_K}")
    shortlist = adc_sql.rstrip()[: -len(f"LIMIT {TOP_K}")] + (
        f"LIMIT {RERANK_SHORTLIST}"
    )
    return f"""
    WITH short AS ({shortlist}),
    q2 AS (
        SELECT CAST(embedding AS DOUBLE[]) AS qvec
        FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
    )
    SELECT e.vec_id, e.label, {SQL_COS_VS_QVEC} AS cos_sim
    FROM embeddings e
    JOIN short s ON s.vec_id = e.vec_id
    CROSS JOIN q2
    ORDER BY cos_sim DESC, e.vec_id
    LIMIT {TOP_K}
    """


@query("ann_ivfpq_rerank_topk", oracle=_sql_ann_ivfpq_rerank())
def ann_ivfpq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage IVF-PQ retrieval — the standard production shape
    (Faiss's ``index.search`` + refine): stage 1 scans only the probed
    cells' compact codes and shortlists RERANK_SHORTLIST candidates by
    asymmetric distance; stage 2 fetches ONLY those candidates' raw
    vectors and reranks by exact cosine. At 100 TB the shortlist fetch
    is a broadcast semi-join against the vector store (50 point reads),
    so the exact math touches 50 vectors instead of the corpus — ADC's
    quantization noise is confined to shortlist MEMBERSHIP, and within
    the probed cells the final ranking is exact
    (tests/test_pq.py::test_rerank_recall_at_least_adc pins
    recall(rerank) >= recall(ADC-only) against brute force).

    Determinism across engines: the shortlist is a total order on the
    bit-identical (rounded ADC, vec_id) key; the rerank reuses the
    SQL_COS_VS_QVEC twin the brute-force query is green under."""
    qvec = _fetch_query_vec(spark, sf_dir)
    lut0, lut, qnorm = _adc_luts(qvec)
    probes = _ivf_probe_lists(qvec)

    from airflow_ml_pipeline_spark.functions.vectors import dot

    emb = load_table(spark, sf_dir, "embeddings")
    indexed = pq_index(emb)
    short = _adc_probe_topk(
        indexed, probes, lut0, lut, qnorm, k=RERANK_SHORTLIST
    ).select("vec_id")
    qv = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qvec"),
        l2_norm(F.col("embedding")).alias("qnorm"),
    )
    sim = dot(F.col("embedding"), F.col("qvec")) / (
        l2_norm(F.col("embedding")) * F.col("qnorm")
    )
    return (
        emb.join(F.broadcast(short), "vec_id")
        .crossJoin(F.broadcast(qv))
        .select("vec_id", "label", F.round(sim, 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(TOP_K)
    )


def _sql_pq_code_histogram() -> str:
    sels = []
    for mi in range(PQ_M):
        sels.append(
            f"""SELECT {mi} AS subspace, c{mi} AS code,
               CAST(COUNT(*) AS BIGINT) AS n_vecs,
               CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_cells
        FROM coded GROUP BY c{mi}"""
        )
    un = "\n    UNION ALL\n    ".join(sels)
    # AS MATERIALIZED (ADVICE r13): DuckDB inlines CTEs by default, so
    # the PQ_M UNION ALL branches would each re-evaluate the full encode
    # chain — the same re-evaluation mode _sql_ann_ivfpq documents and
    # pins (oracle runtime only).
    coded = _sql_pq_coded(materialized=True).lstrip()
    return f"""
    WITH {coded}
    {un}
    """


@query("pq_code_histogram", oracle=_sql_pq_code_histogram())
def pq_code_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codebook-utilization audit: per (subspace, code) how many vectors
    carry the code and how many coarse cells they span — the index-
    health table a PQ deployment watches (a dead code wastes a 16th of
    a subspace's resolution; one dominant code means the subspace
    carries ~0 bits and the codebook should be retrained). Emits only
    codes in use, matching the oracle's GROUP BY over realized codes.
    One encode pass + one |codes|-keyed aggregate with map-side
    partials; nothing here scales past PQ_M x PQ_K x IVF_K rows.
    The encoded frame is PINNED before the explode — a Generate whose
    child is the full code-argmin fold tree pays seconds of per-stage
    machinery even on tiny inputs (the r9 unigram_vocab_em lesson;
    measured here: 5.8 -> ~1 s warm at sf0.1)."""
    # spread the one-file scan before the full-corpus encode pass
    # (r15 opt): the committed corpora arrive as a single parquet
    # split, so the codegen'd ADC/recon chains otherwise evaluate
    # on ONE task (the covariance-pass lesson); keyed on vec_id —
    # every downstream sum is decimal/int, order-independent. At
    # 100 TB the scan arrives multi-split and this is one slim
    # rebalance exchange before compute-bound work.
    emb = load_spread(spark, sf_dir, "embeddings", by="vec_id")
    indexed = pq_index(emb).select("cluster_id", "pq_code").localCheckpoint(
        eager=False
    )
    coded = indexed.select(
        "cluster_id", F.posexplode("pq_code").alias("subspace", "code")
    )
    return coded.groupBy("subspace", "code").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.countDistinct("cluster_id").cast("bigint").alias("n_cells"),
    )


def _sql_pq_cell_stats() -> str:
    """Per-cell restatement of the per-vector error oracle: the same
    coded/recon chain, then one GROUP BY cluster_id with decimal-exact
    sums (the SQL_DSUM convention — sums, not means, so no rounding
    boundary crosses engines) and the code string distinct-count."""
    from airflow_ml_pipeline_spark.functions.compare import SQL_DSUM

    cc_case, cw_cases, rec = _sql_recon_pieces()
    sep = ",\n               "
    code_s = " || '-' || ".join(
        f"CAST(c{mi} AS VARCHAR)" for mi in range(PQ_M)
    )
    coded = _sql_pq_coded(materialized=True).lstrip()
    return f"""
    WITH {coded},
    recon AS (
        SELECT *,
               {cc_case} AS cc,
               {sep.join(cw_cases)}
        FROM coded
    ),
    pv AS (
        SELECT cluster_id,
               round(list_sum(list_transform(range(1, 65),
                     i -> pow(CAST(embedding[i] AS DOUBLE) - cc[i]
                              - rec[i], 2)))
                     / 64 * 1000000, 3) AS mse,
               round({VNORM_SQL}, 6) AS vn,
               {code_s} AS code_s
        FROM (SELECT *, ({rec}) AS rec FROM recon)
    )
    SELECT cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           {SQL_DSUM("mse")} AS pq_mse_ppm_sum,
           {SQL_DSUM("vn")} AS vnorm_sum,
           CAST(COUNT(DISTINCT code_s) AS BIGINT) AS n_codes_used
    FROM pv GROUP BY cluster_id
    """


@query("pq_cell_stats", oracle=_sql_pq_cell_stats())
def pq_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell health of the IVF-PQ index — the table a 100 TB
    deployment watches to plan codebook retraining and partition
    rebalancing: per coarse cell its population (n_vecs — skewed cells
    mean skewed probe latency and call for splitting or re-training the
    coarse quantizer), the decimal-exact SUM of per-vector
    reconstruction error ppm (sum + count rather than a mean, so no
    rounding boundary crosses engines; a cell whose mean error drifts
    up is outgrowing its codebooks), the vnorm mass, and the number of
    DISTINCT full code words in use (code diversity — a cell whose
    population collapses onto few codes carries ~0 bits per subspace
    there). Complements ``pq_code_histogram`` (per-(subspace, code)
    utilization) with the per-PARTITION view.

    One encode pass + one 16-group aggregate with map-side partials;
    output is IVF_K rows regardless of corpus size. Reuses the shared
    encode/reconstruction kernels (``pq_index``, ``_pq_mse_col``,
    ``_sql_recon_pieces``) so this query, ``pq_quantization_error``,
    and their oracles cannot drift."""
    from airflow_ml_pipeline_spark.functions.compare import dsum

    # spread the one-file scan before the full-corpus encode pass
    # (r15 opt): the committed corpora arrive as a single parquet
    # split, so the codegen'd ADC/recon chains otherwise evaluate
    # on ONE task (the covariance-pass lesson); keyed on vec_id —
    # every downstream sum is decimal/int, order-independent. At
    # 100 TB the scan arrives multi-split and this is one slim
    # rebalance exchange before compute-bound work.
    emb = load_spread(spark, sf_dir, "embeddings", by="vec_id")
    idx = pq_index(emb)
    base = idx.select(
        "cluster_id",
        F.round(_pq_mse_col() * 1_000_000, 3).alias("mse"),
        F.round(F.col("vnorm"), 6).alias("vn"),
        F.concat_ws(
            "-",
            F.transform(F.col("pq_code"), lambda c: c.cast("string")),
        ).alias("code_s"),
    )
    return base.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        dsum(F.col("mse")).alias("pq_mse_ppm_sum"),
        dsum(F.col("vn")).alias("vnorm_sum"),
        F.countDistinct("code_s").cast("bigint").alias("n_codes_used"),
    )


#: Adaptive probe budget: scan the nearest cells until they cover at
#: least this fraction (ppm) of corpus MASS. Fixed nprobe misallocates
#: scan budget under cell skew (6 tiny cells scan almost nothing; 6
#: giant cells scan half the corpus); a mass target keeps the scanned
#: fraction — and therefore both cost and expected recall on an
#: unclustered corpus — stable regardless of how the quantizer's cells
#: are populated. 300000 ppm ~= the fixed probe's average coverage on
#: this corpus, so the two variants are directly comparable.
ADAPTIVE_MASS_PPM = 300_000


#: (sf_dir, corpus fingerprint) -> {cluster_id: count}. The cell
#: histogram is INDEX METADATA (maintained at ingest at 100 TB, a
#: 16-number table) — computing it per probe call re-ran the full
#: encode-assign scan (~0.6 s of the adaptive probe's construction);
#: cached per corpus version like similarity._IVF_INDEX.
_CELL_COUNTS: dict[tuple[str, str], dict[int, int]] = {}


def _cell_counts(spark: SparkSession, sf_dir: str) -> dict[int, int]:
    from airflow_ml_pipeline_spark.operators.similarity import (
        _embeddings_fingerprint,
    )

    key = (sf_dir, _embeddings_fingerprint(sf_dir))
    if key not in _CELL_COUNTS:
        # evict stale fingerprints for the same sf_dir (ADVICE r14:
        # unlike similarity._IVF_INDEX this cache never dropped entries
        # for regenerated corpora, leaking one 16-entry dict per
        # regeneration for the life of the driver)
        for stale in [k2 for k2 in _CELL_COUNTS if k2[0] == sf_dir]:
            del _CELL_COUNTS[stale]
        emb = load_table(spark, sf_dir, "embeddings")
        _CELL_COUNTS[key] = {
            r.cluster_id: r.n
            for r in ivf_assign(emb)
            .groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
    return _CELL_COUNTS[key]


def _adaptive_probe_cells(
    spark: SparkSession, sf_dir: str, qvec: list[float]
) -> list[int]:
    """Minimal prefix of the cos-ranked cells whose cumulative
    population reaches ceil(N * ADAPTIVE_MASS_PPM / 1e6): rank all
    IVF_K cells by the same (cos DESC, j) order as the fixed probe
    (bit-identical doubles in both engines), then take cells while the
    mass accumulated BEFORE each is still short of the target — all
    integer arithmetic after the ranking, so the probe set is exactly
    restatable. The per-cell counts are ONE 16-row aggregate (at 100 TB
    they are index metadata maintained at ingest, not a scan)."""
    from airflow_ml_pipeline_spark.operators.ivf_centroids import IVF_K

    order = _ivf_probe_lists(qvec, nprobe=IVF_K)
    counts = _cell_counts(spark, sf_dir)
    n_total = sum(counts.values())
    target = (n_total * ADAPTIVE_MASS_PPM + 999_999) // 1_000_000
    probes, cum = [], 0
    for j in order:
        if cum >= target:
            break
        probes.append(j)
        cum += counts.get(j, 0)
    return probes


def _sql_ann_ivfpq_adaptive() -> str:
    """The green ``_sql_ann_ivfpq`` statement with ONLY the probe CTE
    swapped (string surgery on the known line — one generator for the
    whole LUT/coded/ADC restatement): the fixed LIMIT-nprobe probe
    becomes the minimal mass-covering prefix, computed from the same
    cent_cos ranking plus a per-cell histogram of the coded store and
    an integer ceil target — every term either a bit-identical double
    (the ranking) or exact integer arithmetic (the cumsum and target),
    so the probe set cannot diverge between engines."""
    fixed = f"probe AS (SELECT j FROM cent_cos ORDER BY cos DESC, j LIMIT {IVF_NPROBE}),"
    adaptive = f""",
    hist AS (
        SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n
        FROM coded GROUP BY cluster_id
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
    ranked AS (
        SELECT c.j,
               SUM(COALESCE(h.n, 0)) OVER (
                   ORDER BY c.cos DESC, c.j
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS cum_before
        FROM cent_cos c LEFT JOIN hist h ON h.cluster_id = c.j
    ),
    probe AS (
        SELECT j FROM ranked CROSS JOIN nn
        WHERE COALESCE(cum_before, 0)
              < (nn.n * {ADAPTIVE_MASS_PPM} + 999999) // 1000000
    )
"""
    base = _sql_ann_ivfpq()
    assert fixed in base
    # the probe CTE now reads from coded's histogram, so it must follow
    # the coded CTE: drop the fixed probe line (the CTE list stays valid
    # because the next CTE name follows directly) and splice the
    # adaptive CTEs between the coded block's close and the final
    # SELECT (leading comma continues the WITH list; no trailing comma)
    base = base.replace(fixed, "", 1)
    # the final SELECT is the only one followed by the rounded-ADC
    # projection (the bare "SELECT vec_id, label," prefix also occurs
    # inside the coded chain's s CTE)
    marker = "    SELECT vec_id, label,\n           round(("
    assert base.count(marker) == 1
    return base.replace(marker, adaptive + marker, 1)


@query("ann_ivfpq_adaptive_topk", oracle=_sql_ann_ivfpq_adaptive())
def ann_ivfpq_adaptive_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ probe with a MASS-ADAPTIVE cell budget: instead of a
    fixed nprobe, scan the minimal prefix of cos-ranked cells covering
    >= ADAPTIVE_MASS_PPM of corpus mass. This is the probe-planning
    step a production deployment runs per query: under cell skew a
    fixed nprobe either starves recall (the nearest cells happen to be
    tiny) or blows the latency budget (they happen to be giant), while
    a mass target pins the scanned fraction — the actual cost — and
    degrades gracefully as the quantizer ages away from the data
    distribution. The per-cell histogram is ONE 16-row aggregate here
    (index metadata maintained at ingest at 100 TB; the probe plan
    itself is driver-side integer arithmetic over 16 numbers).

    ORACLE-CHECKED end-to-end: the ranking doubles are bit-identical
    (frozen literals, same association order), the histogram and the
    ceil target are exact integers, and the ADC scoring reuses the
    green ``_sql_ann_ivfpq`` statement with only the probe CTE swapped
    — so WHICH cells the plan probes is itself driver-hash-pinned, not
    just the final top-k. tests/test_pq.py pins minimality (dropping
    the last probed cell falls short of the target) and the recall
    floor vs brute force."""
    qvec = _fetch_query_vec(spark, sf_dir)
    lut0, lut, qnorm = _adc_luts(qvec)
    probes = _adaptive_probe_cells(spark, sf_dir, qvec)

    emb = load_table(spark, sf_dir, "embeddings")
    indexed = pq_index(emb)
    return _adc_probe_topk(indexed, probes, lut0, lut, qnorm)


# ---------------------------------------------------------------------------
# Index MAINTENANCE: the rebalance/retrain APPLY step (VERDICT r14 ask #3).
#
# pq_cell_stats produces the planning table; this section closes the loop
# with the ACTION a production deployment runs after a codebook refresh:
# score every stored cell's codes against the refreshed codebooks, flag the
# cells whose reconstruction error would improve materially, re-encode ONLY
# those cells, and overwrite only their partitions of the on-disk store —
# after which the store equals a fresh full build. The stale store is
# simulated deterministically: odd coarse cells were last encoded by a
# PRE-REFRESH encoder that only knew the first PQ_STALE_K codewords per
# subspace (drifted data / truncated codebooks look identical to the
# planner: elevated error, depressed code diversity); even cells are
# current. Both the planning table and the applied store are value-hash
# oracle-checked — the DuckDB twin restates the stale encode, both
# reconstructions, and the flag rule from the same frozen literals.
# ---------------------------------------------------------------------------

#: codewords per subspace the PRE-REFRESH encoder knew (the stale half)
PQ_STALE_K = 8

#: flag a cell for re-encoding when its stored codes' reconstruction error
#: exceeds the refreshed-codebook error by this factor. Decimal-exact ppm
#: SUMS are compared (cast to double, identical in both engines), so the
#: decision is deterministic; 1.05 sits well under the weakest observed
#: stale-cell elevation on the committed corpora (1.0934 at sf0.01, ~1.19
#: at sf0.001/sf0.1 — pinned by tests/test_pq.py) and well above the
#: fresh-cell ratio of exactly 1.0.
REBALANCE_IMPROVE = 1.05


def _pq_store_dir(sf_dir: str) -> str:
    """The on-disk IVF-PQ store for this corpus version: a parquet tree
    PARTITIONED BY cluster_id — the physical layout the module docstring
    promises (cell id as the partition key), which is what makes the
    rebalance overwrite cell-scoped. Fingerprint-tagged + stale-tag
    pruned like every ingest store."""
    import os

    from airflow_ml_pipeline_spark.operators.similarity import (
        _embeddings_fingerprint,
    )
    from airflow_ml_pipeline_spark.streaming.ingest import (
        INGEST_ROOT,
        _prune_stale_tags,
    )

    base = f"pqidx-{os.path.basename(os.path.normpath(sf_dir))}"
    tag = f"{base}-{_embeddings_fingerprint(sf_dir)}"
    _prune_stale_tags(base, tag)
    return os.path.join(INGEST_ROOT, tag, "store")


def _pq_stale_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stale store's content, stated functionally: odd cells carry
    the PRE-REFRESH encoder's codes (argmin over the first PQ_STALE_K
    codewords), even cells the current encoder's. Pure projection over
    the scan — the same zero-shuffle encode shape as ``pq_index``."""
    # spread the one-file scan before the full-corpus encode pass
    # (r15 opt): the committed corpora arrive as a single parquet
    # split, so the codegen'd ADC/recon chains otherwise evaluate
    # on ONE task (the covariance-pass lesson); keyed on vec_id —
    # every downstream sum is decimal/int, order-independent. At
    # 100 TB the scan arrives multi-split and this is one slim
    # rebalance exchange before compute-bound work.
    emb = load_spread(spark, sf_dir, "embeddings", by="vec_id")
    a = ivf_assign(emb)
    odd = F.col("cluster_id") % 2 == 1
    return a.select(
        *a.columns,
        F.when(odd, F.expr(_pq_code_sql(k_used=PQ_STALE_K)))
        .otherwise(F.expr(_pq_code_sql()))
        .alias("pq_code"),
        l2_norm(F.col("embedding")).alias("vnorm"),
    )


def pq_rebalance_plan_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell maintenance decision over the stale store: the stored
    codes' reconstruction error vs the refreshed codebooks', both as
    decimal-exact ppm sums (the ``pq_cell_stats`` lattice), and the
    flag ``reencode`` = stored error > REBALANCE_IMPROVE x refreshed
    error. One encode-and-score pass + one IVF_K-group aggregate with
    map-side partials; output is 16 rows at any corpus size."""
    from airflow_ml_pipeline_spark.functions.compare import dsum

    st = _pq_stale_frame(spark, sf_dir).withColumn(
        "fresh_code", F.expr(_pq_code_sql())
    )
    per = st.select(
        "cluster_id",
        F.round(_pq_mse_col() * 1_000_000, 3).alias("ms"),
        F.round(_pq_mse_col(code_col="fresh_code") * 1_000_000, 3).alias(
            "mf"
        ),
    )
    cells = per.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        dsum(F.col("ms")).alias("stale_mse_ppm_sum"),
        dsum(F.col("mf")).alias("fresh_mse_ppm_sum"),
    )
    return cells.select(
        "cluster_id",
        "n_vecs",
        "stale_mse_ppm_sum",
        "fresh_mse_ppm_sum",
        (
            F.col("stale_mse_ppm_sum")
            > F.lit(REBALANCE_IMPROVE) * F.col("fresh_mse_ppm_sum")
        ).alias("reencode"),
    )


def build_stale_pq_store(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the stale store (idempotent per corpus version):
    (vec_id, label, pq_code, vnorm, reencoded=false) partitioned by
    cluster_id. The build is staged to a tmp dir and renamed, the same
    crash-safe convention as the streaming ingesters' staging."""
    import os
    import shutil

    store = _pq_store_dir(sf_dir)
    marker = os.path.join(store, "_stale_built")
    if os.path.exists(marker):
        return store
    st = _pq_stale_frame(spark, sf_dir).select(
        "vec_id",
        "label",
        "pq_code",
        "vnorm",
        F.lit(False).alias("reencoded"),
        "cluster_id",
    )
    tmp = f"{store}.build.{os.getpid()}"
    st.write.mode("overwrite").partitionBy("cluster_id").parquet(tmp)
    try:
        os.rename(tmp, store)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    with open(marker, "w") as f:
        f.write("ok")
    return store


def rebalance_pq_store(spark: SparkSession, sf_dir: str) -> str:
    """APPLY the rebalance plan to the on-disk store: re-encode the
    flagged cells against the refreshed (full) codebooks and DYNAMIC
    partition-overwrite ONLY their cluster_id directories — untouched
    cells' files are never rewritten (tests pin this via file mtimes).
    Idempotent per corpus version (``_rebalanced`` marker). At 100 TB
    this is the whole point of the partition layout: maintenance cost
    is proportional to the flagged cells' mass, not the store size."""
    import os

    store = build_stale_pq_store(spark, sf_dir)
    done = os.path.join(store, "_rebalanced")
    if os.path.exists(done):
        return store
    plan = pq_rebalance_plan_frame(spark, sf_dir)
    flagged = [
        r.cluster_id for r in plan.filter(F.col("reencode")).collect()
    ]
    if flagged:
        emb = load_table(spark, sf_dir, "embeddings")
        fresh = pq_index(emb)
        rows = fresh.filter(F.col("cluster_id").isin(flagged)).select(
            "vec_id",
            "label",
            "pq_code",
            "vnorm",
            F.lit(True).alias("reencoded"),
            "cluster_id",
        )
        rows.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("cluster_id").parquet(store)
    with open(done, "w") as f:
        f.write(",".join(str(c) for c in sorted(flagged)))
    return store


def _sql_rebalance_ctes() -> str:
    """The rebalance lifecycle restated as one DuckDB CTE chain ending
    in ``errs`` (per-vector: both code strings, both rounded mse ppm,
    vnorm) and ``flags`` (per-cell sums + the reencode decision) — the
    shared front half of the plan and apply oracles. The stale encode
    is the SAME distance chains as the full encode with the least/pick
    restricted to the first PQ_STALE_K terms, so the two encoders
    cannot drift; both reconstructions reuse ``_sql_recon_pieces``."""
    from airflow_ml_pipeline_spark.functions.compare import SQL_DSUM

    cc_case, cw_f, rec_f = _sql_recon_pieces()
    _, cw_s, rec_s = _sql_recon_pieces(code_col="s", out="sw")
    coded = _sql_pq_coded(materialized=True, with_stale=True).lstrip()
    stale_cols = ",\n               ".join(
        f"CASE WHEN cluster_id % 2 = 1 THEN hc{mi} ELSE c{mi} END AS s{mi}"
        for mi in range(PQ_M)
    )
    code_f = " || '-' || ".join(f"CAST(c{mi} AS VARCHAR)" for mi in range(PQ_M))
    code_s = " || '-' || ".join(f"CAST(s{mi} AS VARCHAR)" for mi in range(PQ_M))

    def mse(rec_col: str) -> str:
        return f"""round(list_sum(list_transform(range(1, 65),
                 i -> pow(CAST(embedding[i] AS DOUBLE) - cc[i]
                          - {rec_col}[i], 2))) / 64 * 1000000, 3)"""

    sep = ",\n               "
    return f"""{coded},
    staled AS (
        SELECT *,
               {stale_cols}
        FROM coded
    ),
    recon AS (
        SELECT *,
               {cc_case} AS cc,
               {sep.join(cw_f)},
               {sep.join(cw_s)}
        FROM staled
    ),
    errs AS MATERIALIZED (
        SELECT vec_id, label, cluster_id,
               {code_f} AS code_fresh,
               {code_s} AS code_stale,
               round({VNORM_SQL}, 6) AS vn,
               {mse("rf")} AS mf,
               {mse("rs")} AS ms
        FROM (SELECT *, ({rec_f}) AS rf, ({rec_s}) AS rs FROM recon)
    ),
    cells AS (
        SELECT cluster_id,
               CAST(COUNT(*) AS BIGINT) AS n_vecs,
               {SQL_DSUM("ms")} AS stale_mse_ppm_sum,
               {SQL_DSUM("mf")} AS fresh_mse_ppm_sum
        FROM errs GROUP BY cluster_id
    ),
    flags AS (
        SELECT cluster_id, n_vecs, stale_mse_ppm_sum, fresh_mse_ppm_sum,
               (stale_mse_ppm_sum
                > {REBALANCE_IMPROVE!r} * fresh_mse_ppm_sum) AS reencode
        FROM cells
    )"""


@query(
    "pq_rebalance_plan",
    oracle=f"""
    WITH {_sql_rebalance_ctes()}
    SELECT cluster_id, n_vecs, stale_mse_ppm_sum, fresh_mse_ppm_sum,
           reencode
    FROM flags
    """,
)
def pq_rebalance_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rebalance PLANNING table: per coarse cell, the stale store's
    decimal-exact reconstruction-error sum beside what the refreshed
    codebooks would achieve, and the re-encode decision (stored error >
    REBALANCE_IMPROVE x refreshed error — a comparison of identical
    doubles derived from exact decimal sums, so WHICH cells the plan
    flags is itself driver-hash-pinned). This is the consumer
    ``pq_cell_stats`` was missing: the table that turns index-health
    telemetry into a maintenance action.

    Scale shape: one encode-and-score projection over the scan (both
    encoders are literal-table argmins, no shuffle) + one 16-group
    aggregate with map-side partials; at 100 TB the 'stale' side reads
    the STORED codes instead of re-deriving them, the same bounded
    aggregate."""
    return pq_rebalance_plan_frame(spark, sf_dir)


@query(
    "pq_index_rebalanced",
    oracle=f"""
    WITH {_sql_rebalance_ctes()}
    SELECT e.vec_id, e.label, e.cluster_id,
           CASE WHEN f.reencode THEN e.code_fresh
                ELSE e.code_stale END AS code_s,
           e.vn AS vnorm,
           f.reencode AS reencoded
    FROM errs e JOIN flags f USING (cluster_id)
    """,
)
def pq_index_rebalanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF-PQ store AFTER the rebalance APPLY step: flagged cells
    re-encoded against the refreshed codebooks (their partitions
    dynamically overwritten, ``reencoded`` = true), untouched cells
    byte-identical to the stale store. On the committed corpora the
    flagged set is exactly the stale (odd) cells and the applied store
    equals a fresh full ``pq_index`` build — the convergence contract
    tests/test_pq.py pins alongside the only-touched-cells-rewritten
    file-mtime contract.

    ORACLE-CHECKED end-to-end: the DuckDB twin restates the stale
    encode (same distance chains, least/pick over the first PQ_STALE_K
    terms), both reconstructions, the decimal-exact per-cell sums, the
    flag rule, and the per-row code selection — so the driver hash pins
    WHAT the store contains after maintenance, not just row counts.

    Scale shape: the plan is a bounded 16-row aggregate; the apply
    re-encode scans only the flagged cells' vectors (projection-only
    encode) and rewrites only their partition directories — maintenance
    cost scales with the drifted mass, never the store."""
    store = rebalance_pq_store(spark, sf_dir)
    df = spark.read.parquet(store)
    return df.select(
        "vec_id",
        "label",
        F.col("cluster_id").cast("int").alias("cluster_id"),
        F.concat_ws(
            "-", F.transform(F.col("pq_code"), lambda c: c.cast("string"))
        ).alias("code_s"),
        F.round(F.col("vnorm"), 6).alias("vnorm"),
        "reencoded",
    )


# ---------------------------------------------------------------------------
# BATCHED ANN: the ANN-JOIN form of the IVF-PQ probe — top-k for a SET of
# query vectors in ONE pass over the coded store. This is how retrieval
# actually runs at 100 TB (decontamination sweeps, hard-negative mining,
# recommendation candidate generation): per-query scans don't amortize the
# store read, so the probe plans are collapsed into one broadcast table
# keyed by (query, probed cell) and the store is scanned once, each
# candidate scored against exactly the queries probing its cell.
# ---------------------------------------------------------------------------


def _sql_ann_ivfpq_batch() -> str:
    """DuckDB twin of the batched probe: the single-query ``q`` CTE
    generalized to ANCHOR_K rows (the md5-smallest vec_ids — the
    ``embedding_hard_negatives`` anchor convention), every LUT chain the
    same left-associative sequence as the driver-side Python doubles,
    the per-query probe a row_number window over the identical ranking,
    and the ADC score/rounding identical to ``_sql_ann_ivfpq`` — so the
    whole batch plan (which queries, which cells, which top-k) is
    value-hash-pinned."""
    from airflow_ml_pipeline_spark.operators.ivf_centroids import (
        IVF_CENTROIDS,
        IVF_CENTROID_N2,
        IVF_K,
    )
    from airflow_ml_pipeline_spark.operators.pq_codebooks import PQ_CODEBOOKS
    from airflow_ml_pipeline_spark.operators.similarity import ANCHOR_K

    qnorm = (
        "sqrt("
        + " + ".join(f"qvec[{i + 1}] * qvec[{i + 1}]" for i in range(64))
        + ")"
    )
    lut_cols = [f"({qnorm}) AS qn"]
    for j, c in enumerate(IVF_CENTROIDS):
        dchain = " + ".join(
            f"qvec[{i + 1}] * {float(v)!r}" for i, v in enumerate(c)
        )
        lut_cols.append(f"({dchain}) AS l0_{j}")
    for mi in range(PQ_M):
        off = mi * PQ_SUBDIM
        for k, cw in enumerate(PQ_CODEBOOKS[mi]):
            dchain = " + ".join(
                f"qvec[{off + d1 + 1}] * {float(v)!r}"
                for d1, v in enumerate(cw)
            )
            lut_cols.append(f"({dchain}) AS lm{mi}_{k}")
    probes = []
    for j in range(IVF_K):
        cn = float(math.sqrt(IVF_CENTROID_N2[j]))
        probes.append(
            f"SELECT q_id, {j} AS j, l0_{j} / (qn * {cn!r}) AS cos,"
            f" l0_{j} AS base FROM q"
        )
    terms = ["p.base"]
    for mi in range(PQ_M):
        terms.append(
            "(CASE c"
            + str(mi)
            + " "
            + " ".join(f"WHEN {k} THEN q.lm{mi}_{k}" for k in range(PQ_K))
            + " END)"
        )
    adc = " + ".join(terms)
    sep = ",\n               "
    coded = _sql_pq_coded(materialized=True).lstrip()
    return f"""
    WITH a AS MATERIALIZED (
        SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qvec
        FROM embeddings
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
        LIMIT {ANCHOR_K}
    ),
    q AS MATERIALIZED (
        SELECT q_id, {sep.join(lut_cols)}
        FROM a
    ),
    cent_cos AS ({" UNION ALL ".join(probes)}),
    probe AS (
        SELECT q_id, j, base FROM (
            SELECT q_id, j, base,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cos DESC, j) AS rn
            FROM cent_cos)
        WHERE rn <= {IVF_NPROBE}
    ),
    {coded},
    scored AS (
        SELECT p.q_id, c.vec_id, c.label,
               round(({adc}) / (q.qn * {VNORM_SQL}), 6) AS adc_cos
        FROM coded c
        JOIN probe p ON p.j = c.cluster_id
        JOIN q ON q.q_id = p.q_id
    )
    SELECT q_id, vec_id, label, adc_cos, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                                       ORDER BY adc_cos DESC, vec_id) AS rn
          FROM scored)
    WHERE rn <= {TOP_K}
    """


@query("ann_ivfpq_batch_topk", oracle=_sql_ann_ivfpq_batch())
def ann_ivfpq_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched IVF-PQ ANN: ADC top-k for EACH of the ANCHOR_K
    deterministic query vectors (md5-smallest vec_ids — the
    ``embedding_hard_negatives`` anchor convention) in ONE scan of the
    coded store. The per-query probe plans collapse into a broadcast
    (query, probed-cell) table carrying the coarse IP term and the
    query's full codeword LUT; the store joins it on cluster_id, so
    each candidate is scored against exactly the queries probing its
    cell — the ANN-JOIN shape that amortizes the store read across the
    whole query batch (per-query scans cost K passes; this costs one).

    ORACLE-CHECKED end-to-end: anchor choice, every LUT double (the
    driver computes them as the same left-associative chains the
    oracle's 24-row q CTE evaluates), each query's probe set, the ADC
    scores, and the per-query (adc_cos DESC, vec_id) top-k are all
    value-hash-pinned — the batch generalization of the green
    single-query contract. tests/test_pq.py pins per-anchor agreement
    with the single-query probe.

    Scale: the broadcast table is ANCHOR_K x IVF_NPROBE rows (bounded
    by the query batch, never the corpus); the scan side touches only
    probed cells' partitions; the only data-sized movement is the
    per-query top-k shuffle of candidate rows keyed by q_id — the
    irreducible cost of answering the batch."""
    from pyspark.sql.window import Window

    from airflow_ml_pipeline_spark.operators.similarity import ANCHOR_K

    # spread the one-file scan before BOTH full-corpus passes (r16,
    # closing the r15 gap: this query landed mid-interruption WITHOUT
    # the vec_id spread its PQ siblings got). Unspread, the anchor
    # sort-limit (md5 per row over every vector, one TakeOrdered task)
    # and the codegen'd encode each ran as a ~1-1.8 s SINGLE-task
    # stage; spread, both are 32-way with a per-partition top-K merged
    # on the driver.
    emb = load_spread(spark, sf_dir, "embeddings", by="vec_id")
    anchors = (
        emb.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(ANCHOR_K)
        .collect()
    )
    rows = []
    for r in anchors:
        qvec = [float(x) for x in r.embedding]
        lut0, lut, qn = _adc_luts(qvec)
        for cell in _ivf_probe_lists(qvec):
            rows.append(
                (
                    int(r.vec_id),
                    int(cell),
                    float(lut0[cell]),
                    [[float(v) for v in row] for row in lut],
                    float(qn),
                )
            )
    ptable = spark.createDataFrame(
        rows,
        "q_id bigint, cluster_id int, base double,"
        " lut array<array<double>>, qn double",
    )
    indexed = pq_index(emb)
    terms = " + ".join(
        ["base"]
        + [
            f"element_at(element_at(lut, {mi + 1}),"
            f" element_at(pq_code, {mi + 1}) + 1)"
            for mi in range(PQ_M)
        ]
    )
    scored = indexed.join(F.broadcast(ptable), "cluster_id").select(
        "q_id",
        "vec_id",
        "label",
        F.round(F.expr(terms) / (F.col("qn") * F.col("vnorm")), 6).alias(
            "adc_cos"
        ),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("adc_cos"), F.asc("vec_id")
    )
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "q_id",
            "vec_id",
            "label",
            "adc_cos",
            F.col("rank").cast("int").alias("rank"),
        )
    )
