"""Training-data *serving* operators: the last mile between a curated
corpus and the trainer's input pipeline.

- **deterministic global shuffle + sharding**: reproducible pseudo-random
  order and shard assignment (the step that turns a corpus into training
  shards without a single-machine shuffle);
- **sequence packing** (concat-and-chunk): assign every document its token
  offset in the concatenated stream and the fixed-length training
  sequence(s) it lands in — the GPT-style packing bookkeeping;
- **BPE merge candidates**: corpus-wide adjacent-token-pair frequencies,
  the inner statistic of a tokenizer-training merge step;
- **pseudonymization / k-anonymity generalization**: stable hashed
  pseudonyms, banded numeric attributes, and small-group suppression —
  the privacy pass a customer-derived training table runs before use;
- **per-dimension embedding profile**: mean/std/min/max by vector
  dimension — the normalization/whitening decision input.

All pure column expressions (no Python UDFs); every operator carries a
DuckDB oracle twin. No reference counterpart: the reference pipeline
(src/ml_pipeline/) stops at model training; these extend the engine's
LLM-data surface per SURVEY.md §2.12.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from airflow_ml_pipeline_spark.functions.compare import SQL_DSUM, dsum
from airflow_ml_pipeline_spark.functions.text import ngrams, tokens
from airflow_ml_pipeline_spark.plans.registry import query
from airflow_ml_pipeline_spark.sources.catalog import load_spread, load_table

#: Hex-prefix shard count. 16 = one shard per first md5 hex digit; at real
#: scale this is 2-3 hex chars (256/4096 shards) — same expression, wider
#: substring. Shard order == lexicographic md5 order (hex digits sort
#: '0'<'9'<'a'<'f' in ASCII), which is what makes the two-phase prefix sum
#: below equal the global ordering.
N_SHARDS = 16

#: Training sequence length for packing (tokens per context window).
SEQ_LEN = 256

#: Adjacent-pair candidates reported by the tokenizer-merge statistic.
TOP_PAIRS = 20

#: Minimum group size before a quasi-identifier group is released.
K_ANON = 5


def _shard(doc_id_col: str) -> F.Column:
    """0-based shard = first hex digit of md5(doc_id) — engine-neutral,
    uniform, and consistent with lexicographic md5 ordering."""
    return F.expr(
        f"CAST(instr('0123456789abcdef', "
        f"substring(md5(CAST({doc_id_col} AS STRING)), 1, 1)) - 1 AS INT)"
    )


@query(
    "corpus_shuffled_shards",
    oracle=f"""
    SELECT doc_id,
           CAST(instr('0123456789abcdef',
                substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
                AS INTEGER) AS shard,
           CAST(ROW_NUMBER() OVER (
                PARTITION BY substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                AS INTEGER) AS pos_in_shard
    FROM documents
    """,
)
def corpus_shuffled_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible global shuffle: every doc gets a shard (md5 hex prefix)
    and a position within its shard (rank by full md5) — together a total
    pseudo-random order any engine can reproduce, with no RNG state.

    Scale shape: the only shuffle is the hash partition on `shard`; each
    shard ranks independently (parallel window, no global sort). Writing
    `partitionBy(shard)` + intra-shard sort gives the trainer stable,
    evenly-sized input files; re-sharding is a pure recompute, no state."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        docs.select("doc_id", h.alias("h"), _shard("doc_id").alias("shard"))
        .withColumn("pos_in_shard", F.row_number().over(w))
        .select("doc_id", "shard", "pos_in_shard")
    )


#: The packer's ordering + global-offset semantics as DuckDB CTEs
#: ``scored -> packed(doc_id, n_tokens, start_token)`` — ONE statement
#: shared by ``sequence_packing``'s oracle and the efficiency report's
#: (r9 review: the report restated the packer's CTEs verbatim, so an
#: ordering change updated in one could silently desync the other).
_SQL_PACKED_CTES = """scored AS (
        SELECT doc_id,
               md5(CAST(doc_id AS VARCHAR)) AS h,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    packed AS (
        SELECT doc_id, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (
                    ORDER BY h, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS start_token
        FROM scored
    )"""


@query(
    "sequence_packing",
    oracle=f"""
    WITH {_SQL_PACKED_CTES}
    SELECT doc_id, n_tokens, start_token,
           CAST(FLOOR(start_token / {SEQ_LEN}.0) AS BIGINT) AS first_seq,
           CAST(FLOOR((start_token + n_tokens - 1) / {SEQ_LEN}.0)
                - FLOOR(start_token / {SEQ_LEN}.0) + 1 AS BIGINT) AS n_seqs,
           CAST(CASE WHEN FLOOR((start_token + n_tokens - 1) / {SEQ_LEN}.0)
                          > FLOOR(start_token / {SEQ_LEN}.0)
                THEN 1 ELSE 0 END AS INTEGER) AS crosses_boundary
    FROM packed
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing bookkeeping: documents are concatenated in
    the deterministic shuffle order (md5 rank) and cut into fixed
    SEQ_LEN-token training sequences; each doc reports its global token
    offset, its first sequence id, how many sequences it spans, and whether
    it crosses a boundary (the attention-masking / doc-boundary signal).

    The oracle states the semantics as ONE global running sum. Running that
    literally is a single-partition window — the classic scale bottleneck —
    so the plan computes the identical result as a distributed two-phase
    prefix sum: per-shard token subtotals (16 rows) get window offsets, and
    each shard cumsums in parallel with its offset added. Same trick as
    corpus_token_budget_fill; shard-prefix order == global md5 order."""
    docs = load_spread(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
        _shard("doc_id").alias("shard"),
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    shard_tot = scored.groupBy("shard").agg(F.sum("n_tokens").alias("stok"))
    w_off = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    offsets = shard_tot.select(
        "shard", F.coalesce(F.sum("stok").over(w_off), F.lit(0)).alias("offset")
    )
    w_in = (
        Window.partitionBy("shard")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.col("offset") + F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0))
    packed = scored.join(F.broadcast(offsets), "shard").select(
        "doc_id", "n_tokens", start.alias("start_token")
    )
    first_seq = F.floor(F.col("start_token") / SEQ_LEN)
    last_seq = F.floor((F.col("start_token") + F.col("n_tokens") - 1) / SEQ_LEN)
    return packed.select(
        "doc_id",
        "n_tokens",
        "start_token",
        first_seq.cast("bigint").alias("first_seq"),
        (last_seq - first_seq + 1).cast("bigint").alias("n_seqs"),
        (last_seq > first_seq).cast("int").alias("crosses_boundary"),
    )


@query(
    "bpe_merge_candidates",
    oracle=f"""
    SELECT pair, cnt, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, pair)
                           AS INTEGER) AS merge_rank
    FROM (
        SELECT s AS pair, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (
            SELECT unnest(CASE WHEN len(t) >= 2
                          THEN list_transform(range(1, len(t)),
                               i -> t[i] || ' ' || t[i+1])
                          ELSE [] END) AS s
            FROM (SELECT string_split(text, ' ') AS t FROM documents))
        GROUP BY 1
        ORDER BY cnt DESC, pair
        LIMIT {TOP_PAIRS}
    )
    """,
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer-training inner statistic: corpus-wide adjacent
    token-pair frequencies, top candidates in deterministic merge order
    (count desc, pair asc — unique tiebreak so the top-k set is stable
    across engines).

    Scale shape: pair counting is one partial+final hash aggregation over
    exploded bigrams (map-side combine collapses repeats before the
    shuffle); the global top-k is TakeOrderedAndProject — no full sort. The
    rank window runs on the {TOP_PAIRS}-row result, not the corpus."""
    docs = load_spread(spark, sf_dir, "documents")
    pairs = (
        docs.select(F.explode(ngrams(tokens(F.col("text")), 2)).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(TOP_PAIRS)
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("pair"))
    return pairs.withColumn("merge_rank", F.row_number().over(w))


@query(
    "customer_pseudonymized",
    oracle=f"""
    SELECT c_custkey,
           md5(c_name) AS pseudonym,
           CAST(FLOOR(c_acctbal / 1000) * 1000 AS BIGINT) AS acctbal_band,
           c_mktsegment,
           CAST(group_k AS BIGINT) AS group_k,
           CASE WHEN group_k >= {K_ANON} THEN c_nationkey
                ELSE NULL END AS nation_key
    FROM (
        SELECT *, COUNT(*) OVER (
            PARTITION BY c_nationkey, FLOOR(c_acctbal / 1000), c_mktsegment
        ) AS group_k
        FROM customer)
    """,
)
def customer_pseudonymized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy pass over a customer-derived table before it enters a
    training corpus: direct identifier (name) replaced by a stable hash
    pseudonym, the numeric quasi-identifier banded to width-1000, and
    k-anonymity suppression — rows whose (nation, band, segment) group has
    fewer than K_ANON members get their nation withheld.

    Scale shape: one window keyed on the quasi-identifier triple (a hash
    shuffle on low-cardinality keys); everything else is per-row codegen.
    The pseudonym is deterministic so joins across pseudonymized tables
    still line up without a lookup table."""
    cust = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 1000)
    w = Window.partitionBy("c_nationkey", band, "c_mktsegment")
    return cust.withColumn("group_k", F.count(F.lit(1)).over(w)).select(
        "c_custkey",
        F.md5(F.col("c_name")).alias("pseudonym"),
        (band * 1000).cast("bigint").alias("acctbal_band"),
        "c_mktsegment",
        F.col("group_k").cast("bigint").alias("group_k"),
        F.when(F.col("group_k") >= K_ANON, F.col("c_nationkey"))
        .otherwise(F.lit(None))
        .alias("nation_key"),
    )


@query(
    "embedding_dim_stats",
    oracle=f"""
    WITH flat AS (
        SELECT unnest(CAST(embedding AS DOUBLE[])) AS x,
               unnest(range(1, len(embedding) + 1)) AS i
        FROM embeddings
    )
    SELECT CAST(i - 1 AS INTEGER) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND({SQL_DSUM("x")} / COUNT(*), 6) AS mean,
           ROUND(SQRT(({SQL_DSUM("x * x")} - POW({SQL_DSUM("x")}, 2)
                       / COUNT(*)) / COUNT(*)), 6) AS std,
           MIN(x) AS min_x,
           MAX(x) AS max_x
    FROM flat
    GROUP BY 1
    """,
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding profile (mean/population-std/min/max): the
    input to normalization, whitening, and dead-dimension pruning
    decisions before similarity search or quantization.

    Scale shape: posexplode multiplies rows by the vector dim, but the
    partial hash aggregation collapses each partition to `dim` rows before
    the shuffle — the exchange carries O(dims × partitions), never the
    corpus. Moments use the decimal detour (functions/compare.py) so the
    mean/std are bit-identical to the oracle regardless of row order."""
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(F.posexplode("embedding").alias("dim", "xf")).select(
        "dim", F.col("xf").cast("double").alias("x")
    )
    n = F.count(F.lit(1))
    s1 = dsum(F.col("x"))
    s2 = dsum(F.col("x") * F.col("x"))
    return flat.groupBy("dim").agg(
        n.cast("bigint").alias("n"),
        F.round(s1 / n, 6).alias("mean"),
        F.round(F.sqrt((s2 - F.pow(s1, 2) / n) / n), 6).alias("std"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
    )


#: PII detection patterns — deliberately RE2-compatible (no lookaround, no
#: backrefs) so the Spark (java.util.regex) and DuckDB (RE2) engines match
#: identically. Applied in order; each hit is replaced by its tag.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\d{3}-\d{4}-\d+"
PII_IDNUM = r"\b\d{9}\b"


def SQL_PII_COUNTED_CTES(key: str = "doc_id") -> str:
    """DuckDB twin of :func:`pii_counted` as CTEs ``aug -> counted ->
    pii(k, n_emails, n_phones, n_ids, t2)`` with ``k = {key}`` — ONE
    statement for the scrub, prevalence, and streaming-ingest oracles
    (r9 review: the augmentation + count SQL was stated three times
    while the Spark side was already factored)."""
    return f"""aug AS (
        SELECT {key} AS k,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com phone 555-0100-'
                    || CAST(doc_id AS VARCHAR) || ' ssn 123456789' AS t
        FROM documents
    ),
    counted AS (
        SELECT k,
               CAST(len(regexp_extract_all(t, '{PII_EMAIL}')) AS BIGINT)
                   AS n_emails,
               CAST(len(regexp_extract_all(t, '{PII_PHONE}')) AS BIGINT)
                   AS n_phones,
               regexp_replace(regexp_replace(t, '{PII_EMAIL}',
                              '[EMAIL]', 'g'),
                              '{PII_PHONE}', '[PHONE]', 'g') AS t2
        FROM aug
    ),
    pii AS (
        SELECT k, n_emails, n_phones,
               CAST(len(regexp_extract_all(t2, '{PII_IDNUM}')) AS BIGINT)
                   AS n_ids,
               t2
        FROM counted
    )"""


def pii_counted(docs: DataFrame, *keep: str) -> DataFrame:
    """The PII detection kernel stated ONCE for every consumer
    (``doc_pii_scrub``, ``pii_prevalence_by_source``, the streaming
    scrub-on-ingest): append the deterministic PII augmentation (the
    synthetic corpus has no digits — the injected tokens guarantee every
    pattern fires, so the kernel is value-checked rather than vacuously
    green), then count emails/phones, redact them, and count bare ids in
    the REDACTED text (the scrub order: an id inside a phone tail never
    double-counts). Returns (*keep, n_emails, n_phones, n_ids, t2) where
    ``t2`` is the email/phone-redacted text ready for the id redaction
    pass. Pure per-row RE2-safe regexp projection — zero shuffles."""
    aug = docs.select(
        *keep,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com phone 555-0100-"),
            F.col("doc_id").cast("string"),
            F.lit(" ssn 123456789"),
        ).alias("t"),
    )
    counted = aug.select(
        *keep,
        F.size(F.regexp_extract_all("t", F.lit(PII_EMAIL), 0))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("t", F.lit(PII_PHONE), 0))
        .cast("bigint")
        .alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("t", PII_EMAIL, "[EMAIL]"), PII_PHONE, "[PHONE]"
        ).alias("t2"),
    )
    return counted.select(
        *keep,
        "n_emails",
        "n_phones",
        F.size(F.regexp_extract_all("t2", F.lit(PII_IDNUM), 0))
        .cast("bigint")
        .alias("n_ids"),
        "t2",
    )


@query(
    "doc_pii_scrub",
    oracle=f"""
    WITH {SQL_PII_COUNTED_CTES("doc_id")}
    SELECT k AS doc_id, n_emails, n_phones, n_ids,
           md5(regexp_replace(t2, '{PII_IDNUM}', '[ID]', 'g')) AS scrubbed_md5
    FROM pii
    """,
)
def doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass over the corpus: detect-and-redact emails, phone
    numbers, and bare 9-digit identifiers, reporting per-document hit
    counts plus a digest of the redacted text.

    The synthetic corpus contains no digits, so the query first appends
    deterministic PII-shaped tokens derived from ``doc_id`` — identically
    in the Spark plan and the oracle — which guarantees every pattern
    fires and the redaction kernel (match, count, replace, order of
    application) is value-checked end-to-end rather than vacuously green
    on zero matches.

    Scale shape: pure per-row regexp projection, zero shuffles; the
    patterns are RE2-safe (linear-time matching, no catastrophic
    backtracking) which is what you want before pointing a regex at
    100 TB of text."""
    docs = load_table(spark, sf_dir, "documents")
    return pii_counted(docs, "doc_id").select(
        "doc_id",
        "n_emails",
        "n_phones",
        "n_ids",
        F.md5(F.regexp_replace("t2", PII_IDNUM, "[ID]")).alias("scrubbed_md5"),
    )


@query(
    "pii_prevalence_by_source",
    oracle=f"""
    WITH {SQL_PII_COUNTED_CTES("source")}
    SELECT k AS source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_emails) AS BIGINT) AS n_emails,
           CAST(SUM(n_phones) AS BIGINT) AS n_phones,
           CAST(SUM(n_ids) AS BIGINT) AS n_ids,
           CAST(SUM(CASE WHEN n_emails + n_phones + n_ids > 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_pii
    FROM pii GROUP BY k
    """,
)
def pii_prevalence_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII prevalence report by source: per-source totals of each PII
    class plus affected-doc counts — the compliance dashboard a curation
    team reviews before release, and the prioritization input for which
    crawls need scrub-and-rescan first. Detection is `doc_pii_scrub`'s
    own patterns IN ITS ORDER (ids counted after email/phone redaction,
    so an id inside a phone tail can't double-count) over the same
    deterministic PII augmentation — the report can never disagree with
    the scrubber.

    Scale: pure per-row RE2-safe regexp projection then one
    |sources|-keyed aggregate with map-side partials."""
    docs = load_table(spark, sf_dir, "documents")
    counted = pii_counted(docs, "source")
    hits = F.col("n_emails") + F.col("n_phones") + F.col("n_ids")
    return counted.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_emails").cast("bigint").alias("n_emails"),
        F.sum("n_phones").cast("bigint").alias("n_phones"),
        F.sum("n_ids").cast("bigint").alias("n_ids"),
        F.sum((hits > 0).cast("int")).cast("bigint").alias("n_docs_with_pii"),
    )


def bpe_word_token_count(word) -> "F.Column":
    """Exact BPE token count of ``word`` under the frozen merges — the
    delimited-symbol-string length, stated ONCE for every Spark consumer
    (encode corpus + fertility audit), mirroring the SQL side's
    `_sql_bpe_token_count` (r9 review: the expression was copy-pasted
    per query)."""
    sym_str = bpe_symbol_string(word)
    return (
        F.size(F.split(F.btrim(sym_str, F.lit("|")), "\\|\\|"))
        .cast("bigint")
    )


BPE_N_MERGES = 8


def bpe_train_merges(vocab: DataFrame, n_merges: int = BPE_N_MERGES):
    """Greedy BPE merge training over a (word, cnt) frequency table:
    each round counts adjacent symbol pairs weighted by word frequency,
    merges the winner (max count, then lexicographic (left, right) — a
    unique, engine-independent tiebreak), and rewrites the vocab's symbol
    arrays with a leftmost-first fold. Returns
    ``[(step, left, right, pair_count), ...]`` (may stop early when no
    pair repeats).

    Scale shape: this is the textbook reason BPE training scales — the
    iteration runs over the VOCAB (distinct words x counts, a tiny
    fraction of the corpus; the corpus is touched once to build it), each
    round being one exploded-bigram aggregation (map-side partials) plus a
    1-row argmax collect, with the symbol rewrite a per-row array fold.
    An eager localCheckpoint every few rounds bounds the otherwise
    N-deep lineage (same rationale as the CC loop in corpus_ops; see the
    cadence note inline). The driver loop is control flow only."""
    sym = vocab.select("cnt", F.split("word", "").alias("syms"))
    merges: list[tuple[int, str, str, int]] = []
    for step in range(n_merges):
        # checkpoint every few rounds, not every round: the lineage only
        # needs bounding before Catalyst analysis cost compounds, and each
        # eager materialization is a fixed per-round job (A/B at sf0.1:
        # every-round 2.4 s, every-4 2.0 s, identical merges)
        if step % 4 == 0:
            sym = sym.localCheckpoint(eager=True)
        n = F.size("syms")
        pairs = sym.select(
            "cnt",
            F.explode(
                F.zip_with(
                    F.slice("syms", 1, n - 1),
                    F.slice("syms", 2, n - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top or top[0].c < 2:
            break  # no pair occurs twice: nothing left worth merging
        left, right, cnt = top[0].l, top[0].r, int(top[0].c)
        merges.append((step, left, right, cnt))
        merged = left + right
        # leftmost-first greedy application: fold symbols, merging a
        # trailing `left` with an incoming `right`; try_element_at (not
        # element_at) so the empty accumulator yields NULL, not an ANSI
        # INVALID_ARRAY_INDEX
        sym = sym.select(
            "cnt",
            F.aggregate(
                "syms",
                F.array().cast("array<string>"),
                lambda acc, s: F.when(
                    (F.try_element_at(acc, F.lit(-1)) == F.lit(left))
                    & (s == F.lit(right)),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1),
                        F.array(F.lit(merged)),
                    ),
                ).otherwise(F.concat(acc, F.array(s))),
            ).alias("syms"),
        )
    return merges


def _sql_bpe_training() -> str:
    """Unrolled-CTE oracle for the N-round BPE trainer (the same chained
    per-iteration-CTE pattern as the PageRank oracle, applied to the
    tokenizer-training loop): round k's CTEs are (pk) the argmax adjacent
    pair with weighted count >= 2 under the (count DESC, left, right)
    tiebreak, and (v{k+1}) the vocab with that merge applied as a
    delimited-string replace (the formulation whose equivalence to the
    engine's array fold is pinned by the encode parity tests). An empty
    pk round leaves the vocab unchanged via LEFT JOIN ... ON TRUE, so
    every later round is empty too — matching the trainer's break."""
    base_s = (
        "'|' || array_to_string(list_transform(range(1, len(word) + 1),"
        " i -> substr(word, i, 1)), '||') || '|'"
    )
    ctes = [
        f"""v0 AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt, {base_s} AS s
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        GROUP BY word)"""
    ]
    for k in range(BPE_N_MERGES):
        ctes.append(
            f"""p{k} AS (
            SELECT l, r, c FROM (
                SELECT p.l AS l, p.r AS r, CAST(SUM(cnt) AS BIGINT) AS c
                FROM (
                    SELECT cnt,
                           unnest(list_transform(range(1, len(syms)),
                               i -> struct_pack(l := syms[i],
                                                r := syms[i + 1]))) AS p
                    FROM (SELECT cnt,
                                 string_split(trim(s, '|'), '||') AS syms
                          FROM v{k})
                ) GROUP BY p.l, p.r
            ) WHERE c >= 2
            ORDER BY c DESC, l, r LIMIT 1)"""
        )
        ctes.append(
            f"""v{k + 1} AS (
            SELECT word, cnt,
                   CASE WHEN p{k}.l IS NOT NULL
                        THEN replace(s, '|' || p{k}.l || '||' || p{k}.r || '|',
                                     '|' || p{k}.l || p{k}.r || '|')
                        ELSE s END AS s
            FROM v{k} LEFT JOIN p{k} ON TRUE)"""
        )
    steps = "\n    UNION ALL ".join(
        f'SELECT CAST({k} AS INTEGER) AS step, l AS "left", r AS "right",'
        f" c AS pair_count FROM p{k}"
        for k in range(BPE_N_MERGES)
    )
    return "WITH " + ",\n".join(ctes) + "\n    " + steps


@query("bpe_trained_merges", oracle=_sql_bpe_training())
def bpe_trained_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer-training loop itself (upgrade of the single-round
    ``bpe_merge_candidates`` statistic): N greedy character-BPE merges
    learned from the corpus word-frequency table, in training order.
    Deterministic — ties broken lexicographically — so the merge table is
    reproducible across runs, partitionings, and cluster sizes."""
    docs = load_spread(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    merges = bpe_train_merges(vocab)
    return spark.createDataFrame(
        merges, "step int, left string, right string, pair_count bigint"
    )


#: The FROZEN merge table for encoding — a pinned tokenizer artifact (the
#: trainer's own output on this corpus family, committed the way a released
#: tokenizer.json is), so encoding is a pure deterministic function and the
#: DuckDB oracle can state it with the merges as literals. Training stays
#: `bpe_trained_merges`; production systems never retrain at encode time.
BPE_FROZEN_MERGES: list[tuple[str, str]] = [
    ("e", "r"),
    ("i", "n"),
    ("o", "w"),
    ("o", "r"),
    ("s", "t"),
    ("m", "er"),  # cascades through merge 0's output
    ("a", "t"),
    ("l", "u"),
]


def bpe_symbol_string(word) -> "F.Column":
    """The delimited-symbol rendering of ``word`` with every FROZEN merge
    applied, as a Spark Column: symbols render '|s1||s2||...|' and one
    merge is one literal left-to-right non-overlapping replace of
    '|l||r|' with '|lr|' — exactly leftmost-first greedy pair merging
    (Sennrich et al.'s reference implementation uses the same string
    rewrite). The SINGLE definition both the encoder and the round-trip
    decoder compose (r7 review: the rendering + merge loop previously
    existed in four places; a delimiter-convention change must now touch
    exactly this pair of helpers)."""
    s = F.concat(F.lit("|"), F.array_join(F.split(word, ""), "||"), F.lit("|"))
    for left, right in BPE_FROZEN_MERGES:
        s = F.replace(s, F.lit(f"|{left}||{right}|"), F.lit(f"|{left}{right}|"))
    return s


def _sql_bpe_symbol_expr() -> str:
    """DuckDB twin of :func:`bpe_symbol_string` — the identical algebra
    over a column named `word`."""
    expr = (
        "'|' || array_to_string(list_transform(range(1, len(word) + 1),"
        " i -> substr(word, i, 1)), '||') || '|'"
    )
    for left, right in BPE_FROZEN_MERGES:
        expr = f"replace({expr}, '|{left}||{right}|', '|{left}{right}|')"
    return expr


def _sql_bpe_token_count() -> str:
    """DuckDB expression: BPE token count of `word` under the frozen
    merges (symbol-string length)."""
    return f"len(string_split(trim({_sql_bpe_symbol_expr()}, '|'), '||'))"


def bpe_apply_merge(syms, left: str, right: str):
    """One BPE merge as a leftmost-first greedy array fold (the same
    rewrite the trainer applies to its vocab — see bpe_train_merges)."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


@query(
    "bpe_encoded_corpus",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents
    ),
    wf AS (SELECT doc_id, word FROM w WHERE word != ''),
    v AS (SELECT DISTINCT word FROM wf),
    e AS (SELECT word, {_sql_bpe_token_count()} AS word_tokens FROM v)
    SELECT wf.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(e.word_tokens) AS BIGINT) AS n_bpe_tokens
    FROM wf JOIN e ON wf.word = e.word
    GROUP BY wf.doc_id
    """,
)
def bpe_encoded_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION — the encode half of the BPE lifecycle
    (`bpe_merge_candidates` is the statistic, `bpe_trained_merges` the
    trainer): every document's exact BPE token count under the frozen
    merge table, the number that drives context packing, token budgets,
    and billing. Encoding applies each merge in training order as a
    leftmost-first greedy fold; the DuckDB oracle states the identical
    algebra through the delimited-string replace formulation, so the
    merge-application kernel is value-checked end-to-end (and a unit
    test pins the fold against an independent pure-Python encoder).

    Scale shape: the corpus is touched once to explode words; encoding —
    the expensive per-symbol fold chain — runs over the DISTINCT-WORD
    vocabulary only (Zipf: orders of magnitude smaller than the corpus),
    exactly like the trainer; the encoded lengths then join back to the
    exploded words (vocab side broadcast-eligible, AQE decides) and
    collapse per document with map-side partials. Zero UDFs: the merge
    chain is literal string replaces inside whole-stage codegen."""
    docs = load_spread(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("word")
    ).filter(F.col("word") != "")
    vocab = words.select("word").distinct()
    # The delimited-string formulation (`bpe_symbol_string`), IDENTICAL
    # to the oracle's: plain JVM string ops that codegen compiles in
    # milliseconds. (Two rejected alternatives, both measured: one
    # chained array-fold projection per merge collapses into an 8-deep
    # nested HOF tree costing ~18 s of analysis+Janino; a constant-depth
    # fold over the merge-table literal still paid ~2 s per execution in
    # HOF interpretation. The fold algebra itself stays pinned by the
    # pure-Python parity test against `bpe_apply_merge`.)
    per_word = vocab.select(
        "word", bpe_word_token_count(F.col("word")).alias("word_tokens")
    )
    return words.join(per_word, "word").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("word_tokens").alias("n_bpe_tokens"),
    )


def _sql_bpe_decoded() -> str:
    """DuckDB expression: the DECODED text of `word` under the frozen
    merges — encode to the delimited symbol string, then concatenate the
    symbols back (BPE merges only ever regroup adjacent characters, so a
    correct encoder's symbol concatenation is byte-identical to the
    source word)."""
    return (
        f"array_to_string(string_split(trim({_sql_bpe_symbol_expr()},"
        " '|'), '||'), '')"
    )


@query(
    "bpe_decoded_roundtrip",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents
    ),
    wf AS (SELECT doc_id, word FROM w WHERE word != ''),
    v AS (SELECT DISTINCT word FROM wf),
    e AS (SELECT word,
                 CASE WHEN {_sql_bpe_decoded()} = word THEN 1 ELSE 0 END
                     AS rt_ok
          FROM v)
    SELECT wf.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(1 - e.rt_ok) AS BIGINT) AS n_roundtrip_fail,
           CASE WHEN SUM(1 - e.rt_ok) = 0 THEN 1 ELSE 0 END AS roundtrip_ok
    FROM wf JOIN e ON wf.word = e.word
    GROUP BY wf.doc_id
    """,
)
def bpe_decoded_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer DECODE + invertibility proof — closes the BPE lifecycle
    (train: ``bpe_trained_merges``; encode: ``bpe_encoded_corpus``;
    decode: this; VERDICT r6 ask #7). Each distinct word is encoded under
    the frozen merge table, decoded back by concatenating the symbol
    sequence, and compared byte-for-byte with the source; the per-doc
    output counts round-trip failures (zero on any corpus whose words are
    '|'-free — asserted by ``tests/test_packing.py::
    test_bpe_roundtrip_zero_failures_on_corpus``; a word containing the
    delimiter would surface here as a failure, which is exactly what a
    lossy tokenizer release gate should report, not hide).

    Scale shape: identical to the encoder — the expensive merge chain
    runs over the DISTINCT-WORD vocabulary only, the corpus is touched
    once to explode words, and the vocab-side join back is
    broadcast-eligible. The decode step itself is two string ops (trim +
    delimiter strip) in whole-stage codegen."""
    docs = load_spread(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("word")
    ).filter(F.col("word") != "")
    vocab = words.select("word").distinct()
    decoded = F.array_join(
        F.split(
            F.btrim(bpe_symbol_string(F.col("word")), F.lit("|")), "\\|\\|"
        ),
        "",
    )
    per_word = vocab.select(
        "word", (decoded == F.col("word")).cast("int").alias("rt_ok")
    )
    return words.join(per_word, "word").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.lit(1) - F.col("rt_ok")).cast("bigint").alias(
            "n_roundtrip_fail"
        ),
        F.when(F.sum(F.lit(1) - F.col("rt_ok")) == 0, F.lit(1))
        .otherwise(F.lit(0))
        .alias("roundtrip_ok"),
    )


@query(
    "packing_efficiency_report",
    oracle=f"""
    WITH {_SQL_PACKED_CTES}
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(FLOOR((SUM(n_tokens) - 1) / {SEQ_LEN}.0) + 1 AS BIGINT)
               AS n_seqs,
           CAST((FLOOR((SUM(n_tokens) - 1) / {SEQ_LEN}.0) + 1) * {SEQ_LEN}
                - SUM(n_tokens) AS BIGINT) AS pad_tokens,
           CAST(SUM(CASE WHEN FLOOR((start_token + n_tokens - 1)
                                    / {SEQ_LEN}.0)
                              > FLOOR(start_token / {SEQ_LEN}.0)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_crossing_docs,
           CAST(SUM(CASE WHEN start_token % {SEQ_LEN} = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_aligned_docs
    FROM packed
    """,
)
def packing_efficiency_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency summary over `sequence_packing`'s own
    assignment (composed, not restated — the report can never disagree
    with the packer): total training sequences, tail padding waste,
    docs that cross a sequence boundary (attention-mask resets /
    truncation pressure), and docs that happen to start boundary-aligned.
    THE numbers a training team reads to size SEQ_LEN and judge whether
    best-fit packing is worth its shuffle over plain concat-and-chunk.

    Scale: one bounded aggregate over the packer's output (per-doc
    offsets via the distributed two-phase prefix sum); 1 row out."""
    p = sequence_packing(spark, sf_dir)
    total = F.sum("n_tokens")
    n_seqs = F.floor((total - 1) / SEQ_LEN) + 1
    return p.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        total.cast("bigint").alias("total_tokens"),
        n_seqs.cast("bigint").alias("n_seqs"),
        (n_seqs * SEQ_LEN - total).cast("bigint").alias("pad_tokens"),
        F.sum("crosses_boundary").cast("bigint").alias("n_crossing_docs"),
        F.sum((F.col("start_token") % SEQ_LEN == 0).cast("int"))
        .cast("bigint")
        .alias("n_boundary_aligned_docs"),
    )


@query(
    "bpe_fertility_by_lang",
    oracle=f"""
    WITH w AS (
        SELECT d.lang, unnest(string_split(d.text, ' ')) AS word
        FROM documents d
    ),
    wf AS (SELECT lang, word FROM w WHERE word != ''),
    v AS (SELECT DISTINCT word FROM wf),
    e AS (SELECT word, {_sql_bpe_token_count()} AS word_tokens FROM v)
    SELECT wf.lang,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(e.word_tokens) AS BIGINT) AS n_bpe_tokens,
           CAST(SUM(len(wf.word)) AS BIGINT) AS n_chars,
           CAST(SUM(CASE WHEN e.word_tokens = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_single_token_words
    FROM wf JOIN e ON wf.word = e.word
    GROUP BY wf.lang
    """,
)
def bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE fertility audit by language — the frozen-merge-table twin of
    `tokenizer_fertility_by_lang` (unigram-LM), so the two tokenizer
    lifecycles the engine ships are evaluated with the SAME yardstick:
    per-language word/token/char totals plus fully-merged word counts.
    Comparing the two tables is the tokenizer bake-off a data team runs
    before freezing a vocabulary. Sums only; ratios derive client-side.

    Scale: corpus exploded once; the merge-chain encode runs over the
    DISTINCT-word vocabulary (Zipf-small) and joins back — identical
    lineage to `bpe_encoded_corpus` with a |langs|-keyed final
    aggregate."""
    docs = load_spread(spark, sf_dir, "documents")
    words = docs.select(
        "lang", F.explode(tokens(F.col("text"))).alias("word")
    ).filter(F.col("word") != "")
    vocab = words.select("word").distinct()
    per_word = vocab.select(
        "word", bpe_word_token_count(F.col("word")).alias("word_tokens")
    )
    return words.join(per_word, "word").groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum("word_tokens").cast("bigint").alias("n_bpe_tokens"),
        F.sum(F.length("word")).cast("bigint").alias("n_chars"),
        F.sum((F.col("word_tokens") == 1).cast("int"))
        .cast("bigint")
        .alias("n_single_token_words"),
    )


@query(
    "corpus_shard_skew_report",
    oracle=f"""
    WITH assigned AS (
        SELECT CAST(instr('0123456789abcdef',
                    substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
                    AS INTEGER) AS shard,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    )
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM assigned GROUP BY shard
    """,
)
def corpus_shard_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard doc/token totals under `corpus_shuffled_shards`' md5
    assignment — the straggler predictor: a trainer reading 16 shard
    files is paced by the largest one, and token skew (not doc skew) is
    what actually sizes a shard's step count. Shard assignment is the
    sharder's own expression, stated once on each engine.

    Scale: one |shards|-keyed aggregate with map-side partials; at
    100 TB this is the report you check BEFORE launching the write —
    md5 sharding is binomially tight, and a skewed report means the
    doc_id space itself is pathological."""
    docs = load_spread(spark, sf_dir, "documents")
    return (
        docs.select(
            _shard("doc_id").alias("shard"),
            F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
    )
