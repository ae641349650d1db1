"""Statistical aggregates, date-dimension rollups, edit distance, and
range/interval joins.

Exactness strategy for the statistical queries: built-in ``corr``/
``stddev`` use merge-order-dependent co-moment updates, so Spark (parallel
merges) and a single-node oracle disagree in the last bits. Instead every
moment is an order-independent decimal sum (``functions/compare.py``) and
the closed-form formula is evaluated in double *identically* in both
engines — bit-equal results without giving up map-side partial
aggregation. This is also the right 100 TB shape: one pass, five partial
sums per group, no second scan.

Reference parity: the reference's drift profile computes per-column
mean/std (dags/data_quality_dag.py:49-61); these queries generalize that
to grouped, exact, joinable statistics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_ml_pipeline_spark.functions.compare import SQL_DSUM, dsum
from airflow_ml_pipeline_spark.plans.registry import query
from airflow_ml_pipeline_spark.sources.catalog import load_table


def _sq(c: Column) -> Column:
    return c * c


@query(
    "event_value_hour_stats",
    oracle=f"""
    WITH moments AS (
        SELECT event_type,
               COUNT(*) AS n,
               {SQL_DSUM('value')} AS sx,
               {SQL_DSUM('value * value')} AS sxx,
               {SQL_DSUM('CAST(hour(ts) AS DOUBLE)')} AS sy,
               {SQL_DSUM('CAST(hour(ts) AS DOUBLE) * CAST(hour(ts) AS DOUBLE)')} AS syy,
               {SQL_DSUM('value * CAST(hour(ts) AS DOUBLE)')} AS sxy
        FROM events
        GROUP BY event_type
    )
    SELECT event_type, n,
           round(sx / n, 6) AS mean_value,
           round(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS std_value,
           round((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)),
                 6) AS corr_value_hour
    FROM moments
    """,
)
def event_value_hour_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped mean / sample-stddev / Pearson correlation from exact
    one-pass moment sums (see module doc for why not built-in ``corr``)."""
    ev = load_table(spark, sf_dir, "events")
    x = F.col("value")
    y = F.hour("ts").cast("double")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(x).alias("sx"),
        dsum(_sq(x)).alias("sxx"),
        dsum(y).alias("sy"),
        dsum(_sq(y)).alias("syy"),
        dsum(x * y).alias("sxy"),
    )
    n, sx, sxx, sy, syy, sxy = (F.col(c) for c in ["n", "sx", "sxx", "sy", "syy", "sxy"])
    return m.select(
        "event_type",
        "n",
        F.round(sx / n, 6).alias("mean_value"),
        F.round(F.sqrt((sxx - sx * sx / n) / (n - 1)), 6).alias("std_value"),
        F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            6,
        ).alias("corr_value_hour"),
    )


@query(
    "orders_by_weekday",
    oracle=f"""
    SELECT strftime(o_orderdate, '%A') AS weekday,
           COUNT(*) AS n_orders,
           {SQL_DSUM('o_totalprice')} AS total_price
    FROM orders
    GROUP BY 1
    """,
)
def orders_by_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-dimension rollup keyed by weekday *name* (engine-neutral,
    unlike dayofweek numbering: Spark counts Sunday=1, DuckDB dow
    Sunday=0)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_format("o_orderdate", "EEEE").alias("weekday"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_price"),
        )
    )


@query(
    "part_type_edit_distance",
    oracle="""
    SELECT levenshtein(p_type, 'PROMO') AS dist,
           COUNT(*) AS n_parts,
           COUNT(DISTINCT p_type) AS n_types
    FROM part
    GROUP BY 1
    """,
)
def part_type_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein distance distribution — the JVM built-in (no UDF), the
    same classic DP kernel DuckDB implements, so counts match exactly."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.groupBy(F.levenshtein("p_type", F.lit("PROMO")).alias("dist"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.count_distinct("p_type").alias("n_types"),
        )
    )


@query(
    "errors_before_purchase",
    oracle=f"""
    SELECT p.event_id AS purchase_id,
           COUNT(e.event_id) AS n_errors,
           {SQL_DSUM('e.value')} AS error_value
    FROM events p
    JOIN events e ON e.user_id = p.user_id
                 AND e.event_type = 'error'
                 AND e.ts >= p.ts - INTERVAL 1 HOUR
                 AND e.ts < p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    """,
)
def errors_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval join: error events in the hour preceding each
    purchase by the same user.

    Physically an equi-join on the user key with the time-range predicate
    evaluated post-probe — at 100 TB both sides hash-partition on the user
    key (no O(n·m) theta join), and the event-type filters prune both
    sides before the shuffle. If one user is hot, the salted-join helper
    (functions/skew.py) applies unchanged since the range predicate is
    residual; for bounded ranges like this 1-hour window, bucketing both
    sides by (user, date_trunc(hour)) and joining adjacent buckets is the
    further scale-out documented in SCALING.md.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
        F.col("value").alias("e_value"),
    )
    cond = (
        (F.col("e_user") == F.col("p_user"))
        & (F.col("e_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("e_ts") < F.col("p_ts"))
    )
    return (
        p.join(e, cond)
        .groupBy("purchase_id")
        .agg(
            F.count("err_id").alias("n_errors"),
            dsum(F.col("e_value")).alias("error_value"),
        )
    )


@query(
    "segment_acctbal_top_decile",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal,
           round(pr, 6) AS pct_rank,
           round(cd, 6) AS cume_dist
    FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               percent_rank() OVER w AS pr,
               cume_dist() OVER w AS cd
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal, c_custkey)
    )
    WHERE pr >= 0.9
    """,
)
def segment_acctbal_top_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist analytics: top-decile customers by account
    balance within each market segment.

    The ORDER BY includes c_custkey so ranks are total (no peer groups →
    deterministic across engines); both rank functions are exact rational
    arithmetic divided once in double, so rounding to 6dp is stable. One
    exchange per segment-partitioned sort; the post-window filter is
    evaluated before any further shuffle.
    """
    from pyspark.sql.window import Window

    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        cust.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
        )
        .filter(F.col("pr") >= 0.9)
        .select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.round("pr", 6).alias("pct_rank"),
            F.round("cd", 6).alias("cume_dist"),
        )
    )


@query(
    "embedding_activation_stats",
    oracle="""
    SELECT label,
           COUNT(*) AS n_vecs,
           CAST(SUM(CAST(len(list_filter(embedding, x -> x > 0.0))
                AS BIGINT)) AS BIGINT) AS total_positive,
           CAST(SUM(CAST(len(list_filter(embedding, x -> abs(x) > 1.0))
                AS BIGINT)) AS BIGINT) AS total_saturated,
           MAX(len(embedding)) AS dim
    FROM embeddings
    GROUP BY label
    """,
)
def embedding_activation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (filter/size) entirely JVM-side — the
    component-level profile an embedding-quality monitor computes (dead /
    saturated activations per class) without exploding rows.

    At 100 TB explode-then-group on components would multiply the shuffle
    by the vector dimension; F.filter + F.size keep it one scalar per row
    inside whole-stage codegen.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    pos = F.size(F.filter("embedding", lambda x: x > 0.0))
    sat = F.size(F.filter("embedding", lambda x: F.abs(x) > 1.0))
    return (
        emb.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(pos.cast("bigint")).alias("total_positive"),
            F.sum(sat.cast("bigint")).alias("total_saturated"),
            F.max(F.size("embedding")).alias("dim"),
        )
    )


@query(
    "nation_balance_unpivot",
    oracle="""
    WITH wide AS (
        SELECT n_name,
               round(CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE)
                     / COUNT(c_acctbal), 6) AS customer_avg_bal,
               round(MAX(c_acctbal), 2) AS customer_max_bal
        FROM nation JOIN customer ON c_nationkey = n_nationkey
        GROUP BY n_name
    )
    SELECT n_name, metric, bal
    FROM wide
    UNPIVOT (bal FOR metric IN (customer_avg_bal, customer_max_bal))
    """,
)
def nation_balance_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (wide → long): per-nation balance metrics re-shaped to
    (nation, metric, value) rows — the inverse of pivot, Spark's native
    ``unpivot`` (zero-shuffle: an Expand node over the aggregated frame).
    The average uses the exact-decimal sum / count so both engines divide
    identical doubles (functions/compare.py rationale)."""
    nation = F.broadcast(
        load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_nationkey", "c_acctbal")
    wide = (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(25,6)")).cast("double")
                / F.count("c_acctbal"),
                6,
            ).alias("customer_avg_bal"),
            F.round(F.max("c_acctbal"), 2).alias("customer_max_bal"),
        )
    )
    return wide.unpivot(
        ids=["n_name"],
        values=["customer_avg_bal", "customer_max_bal"],
        variableColumnName="metric",
        valueColumnName="bal",
    )


@query(
    "events_gap_fill",
    oracle=f"""
    SELECT event_id, user_id,
           round(last_value(CASE WHEN event_type = 'error' THEN NULL
                                 ELSE value END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id), 6)
               AS last_good_value
    FROM events
    """,
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling / last-observation-carried-forward: error readings are
    masked to NULL and each row carries the most recent non-null value per
    user (``last_value IGNORE NULLS`` over an event-time order).

    The time-series idiom for sensor dropout repair; one exchange on
    user_id, running frame, no self-join.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    good = F.when(F.col("event_type") != "error", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.last(good, ignorenulls=True).over(w), 6).alias("last_good_value"),
    )


@query(
    "nation_eventtype_matrix",
    oracle="""
    SELECT n_name, et.event_type AS event_type, COUNT(event_id) AS n_events
    FROM nation
    CROSS JOIN (SELECT DISTINCT event_type FROM events) et
    LEFT JOIN events ON events.event_type = et.event_type
                    AND events.user_id % 25 = n_nationkey
    GROUP BY n_name, et.event_type
    """,
)
def nation_eventtype_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join as dense-matrix scaffolding: every (nation,
    event_type) cell exists even when no event matches (the report/ML
    feature-grid idiom — a plain groupBy drops empty cells). The cross
    join is dims-only (25 x 5 rows); the fact table joins onto the
    scaffold afterward."""
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    et = ev.select("event_type").distinct().withColumnRenamed("event_type", "et")
    grid = nation.crossJoin(F.broadcast(et))
    return (
        grid.join(
            ev,
            (ev.event_type == F.col("et"))
            & (ev.user_id % 25 == F.col("n_nationkey")),
            "left",
        )
        .groupBy("n_name", F.col("et").alias("event_type"))
        .agg(F.count("event_id").alias("n_events"))
    )


@query(
    "custkeys_multiset_diff",
    oracle="""
    SELECT c_custkey FROM (
        SELECT o_custkey AS c_custkey FROM orders
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    )
    """,
)
def custkeys_multiset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (exceptAll): customer keys with one row per
    non-finished order — bag semantics preserve multiplicity where the
    distinct EXCEPT collapses it (the per-occurrence accounting idiom)."""
    orders = load_table(spark, sf_dir, "orders")
    all_keys = orders.select(F.col("o_custkey").alias("c_custkey"))
    finished = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return all_keys.exceptAll(finished)


@query(
    "user_eventtype_map_stats",
    oracle="""
    SELECT user_id,
           COUNT(DISTINCT event_type) AS n_types,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS purchase_cnt
    FROM events
    GROUP BY user_id
    """,
)
def user_eventtype_map_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed aggregation state: per-user event-type counts built as a
    real MapType column (map_from_entries over collected pairs), then read
    back via size + element_at. The oracle checks the same facts through
    flat conditional aggregates — map construction, lookup, and
    missing-key→0 semantics are what the Spark plan exercises.

    (Maps never appear in the output schema: map key order is
    engine-defined, so hashable outputs stay scalar.)
    """
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    with_map = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("type_counts")
    )
    return with_map.select(
        "user_id",
        F.size("type_counts").cast("long").alias("n_types"),
        F.coalesce(F.element_at("type_counts", F.lit("purchase")), F.lit(0))
        .cast("bigint")
        .alias("purchase_cnt"),
    )


@query(
    "ship_delay_profile",
    oracle=f"""
    SELECT datediff('day', o_orderdate, l_shipdate) // 30 AS delay_month_bucket,
           COUNT(*) AS n_items,
           CAST(SUM(CASE WHEN l_shipdate = last_day(l_shipdate)
                    THEN 1 ELSE 0 END) AS BIGINT) AS month_end_ships,
           round(AVG(CAST(datediff('day', o_orderdate, l_shipdate) AS DOUBLE)), 6)
               AS avg_delay_days
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate
    GROUP BY 1
    """,
)
def ship_delay_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic family: datediff bucketing, last_day month-end
    detection, integer-average delay — all JVM built-ins.

    datediff(end, start) argument order differs between engines (Spark is
    (end, start), DuckDB ('day', start, end)); the AVG is over exact day
    integers so double division is identical, rounded at 6dp.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    delay = F.datediff("l_shipdate", "o_orderdate")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .groupBy(F.floor(delay / 30).alias("delay_month_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                (F.to_date("l_shipdate") == F.last_day("l_shipdate")).cast("int")
            ).cast("bigint").alias("month_end_ships"),
            F.round(F.avg(delay.cast("double")), 6).alias("avg_delay_days"),
        )
    )


@query(
    "returnflag_median_price_disc",
    oracle="""
    SELECT l_returnflag,
           quantile_disc(l_extendedprice, 0.5) AS median_price_disc,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def returnflag_median_price_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete (type-1) median: percentile_disc returns an actual data
    value — no interpolation, so the result is engine-exact by
    construction (unlike continuous percentiles, which interpolate in
    double). The family segment_price_quantiles doesn't cover."""
    ev = load_table(spark, sf_dir, "lineitem")
    ev.createOrReplaceTempView("__pdisc_lineitem")
    return ev.sparkSession.sql(
        """
        SELECT l_returnflag,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)
                   AS median_price_disc,
               COUNT(*) AS n_items
        FROM __pdisc_lineitem
        GROUP BY l_returnflag
        """
    )


@query(
    "segment_balance_flags",
    oracle="""
    SELECT c_mktsegment,
           bool_and(c_acctbal > -1000.0) AS all_above_floor,
           bool_or(c_acctbal < 0.0) AS any_negative,
           CAST(count_if(c_acctbal < 0.0) AS BIGINT) AS n_negative,
           COUNT(*) AS n_customers
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def segment_balance_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean / conditional aggregates: bool_and (every), bool_or (some),
    count_if — the data-quality assertion kernels (validate.py's checks
    are exactly these shapes, folded into one pass)."""
    cust = load_table(spark, sf_dir, "customer")
    neg = F.col("c_acctbal") < 0.0
    return cust.groupBy("c_mktsegment").agg(
        F.every(F.col("c_acctbal") > -1000.0).alias("all_above_floor"),
        F.some(neg).alias("any_negative"),
        F.count_if(neg).alias("n_negative"),
        F.count(F.lit(1)).alias("n_customers"),
    )


#: log10(1 + 1/d) for d = 1..9, pre-rounded to 9 dp and embedded as
#: LITERALS in both plans — neither engine evaluates log10 at query time,
#: so libm rounding differences can't leak into the comparison.
BENFORD_P = {
    1: 0.301029996, 2: 0.176091259, 3: 0.124938737,
    4: 0.096910013, 5: 0.079181246, 6: 0.06694679,
    7: 0.057991947, 8: 0.051152522, 9: 0.045757491,
}

_BENFORD_SQL_CASE = "CAST(CASE digit " + " ".join(
    f"WHEN {d} THEN {p}" for d, p in BENFORD_P.items()
) + " END AS DOUBLE)"


@query(
    "orders_benford_deviation",
    oracle=f"""
    WITH d AS (
        SELECT CAST(substr(CAST(o_totalprice AS VARCHAR), 1, 1) AS INTEGER)
               AS digit
        FROM orders WHERE o_totalprice >= 1
    ),
    c AS (
        SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit
    ),
    t AS (SELECT SUM(n) AS total FROM c)
    SELECT digit, n,
           round(CAST(n AS DOUBLE) / total, 6) AS observed_p,
           {_BENFORD_SQL_CASE} AS expected_p,
           round((CAST(n AS DOUBLE) / total - {_BENFORD_SQL_CASE})
                 * (CAST(n AS DOUBLE) / total - {_BENFORD_SQL_CASE})
                 / {_BENFORD_SQL_CASE}, 6) AS chi2_term
    FROM c, t
    """,
)
def orders_benford_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law conformance of order totals — the forensic
    data-quality gate: naturally occurring multi-magnitude amounts follow
    P(first digit = d) = log10(1 + 1/d), and fabricated, truncated, or
    unit-mangled feeds show up as per-digit chi-square outliers (the
    per-digit terms localize WHICH digit is off; their sum is the
    classic chi-square-by-n statistic). Synthetic TPC-H prices are
    range-uniform, not Benford — the query's job is to REPORT the
    deviation profile, and the test asserts the expected non-conformance
    direction.

    Engine neutrality: the first significant digit comes from the
    DECIMAL's string rendering (no log10/pow on the data path), and the
    expected probabilities are pre-rounded literals baked into both
    plans, so no libm call happens in either engine. Scale shape: one
    projection + a 9-key hash agg with map-side partials; the total
    rides in as a 1-row broadcast."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    c = orders.select(
        F.substring(F.col("o_totalprice").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    ).groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    expected = F.element_at(
        F.create_map(*[F.lit(x) for kv in BENFORD_P.items() for x in kv]),
        F.col("digit"),
    )
    obs = F.col("n").cast("double") / F.col("total")
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        "n",
        F.round(obs, 6).alias("observed_p"),
        expected.alias("expected_p"),
        F.round((obs - expected) * (obs - expected) / expected, 6).alias(
            "chi2_term"
        ),
    )


_DEC = "DECIMAL(25,6)"


@query(
    "brand_discount_qty_slope",
    oracle=f"""
    WITH m AS (
        SELECT p.p_brand AS brand,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(l.l_discount AS {_DEC})) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l.l_quantity AS {_DEC})) AS DOUBLE) AS sy,
               CAST(SUM(CAST(l.l_discount AS {_DEC})
                        * CAST(l.l_discount AS {_DEC})) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(l.l_discount AS {_DEC})
                        * CAST(l.l_quantity AS {_DEC})) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(l.l_quantity AS {_DEC})
                        * CAST(l.l_quantity AS {_DEC})) AS DOUBLE) AS syy
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand
    )
    SELECT brand, CAST(n AS BIGINT) AS n_items,
           CASE WHEN n * sxx - sx * sx > 0
                THEN round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
                ELSE 0.0 END AS slope,
           CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) > 0
                THEN round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                     / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
                ELSE 0.0 END AS r2
    FROM m
    """,
)
def brand_discount_qty_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped least-squares regression: per-brand OLS slope (and R²) of
    quantity on discount — the price-sensitivity profile a merchandising
    team reads per product line, and the GROUPED form of the
    `token_zipf_fit` regression pattern: one hash aggregation computes
    the five moment sums as DECIMAL-exact accumulators (order-free, so
    map-side partials survive), the slope/R² arithmetic runs in double
    over identical expression trees in both engines, and zero-variance
    groups (all-equal discounts) are guarded to 0 by the same predicate.
    Scale shape: ONE pass over lineitem, output |brands| rows; the part
    join's strategy is AQE's call."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_discount", "l_quantity"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    x = F.col("l_discount").cast("decimal(25,6)")
    y = F.col("l_quantity").cast("decimal(25,6)")
    m = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(x).cast("double").alias("sx"),
            F.sum(y).cast("double").alias("sy"),
            F.sum(x * x).cast("double").alias("sxx"),
            F.sum(x * y).cast("double").alias("sxy"),
            F.sum(y * y).cast("double").alias("syy"),
        )
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return m.select(
        "brand",
        F.col("n").cast("bigint").alias("n_items"),
        F.when(vx > 0, F.round(cov / vx, 6)).otherwise(F.lit(0.0)).alias("slope"),
        F.when((vx * vy) > 0, F.round(cov * cov / (vx * vy), 6))
        .otherwise(F.lit(0.0))
        .alias("r2"),
    )


GINI_BUCKETS = 64  # equi-depth rank buckets (adaptive cut points)


def gini_ranked_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(r, rk): each customer's exact-decimal revenue with its GLOBAL
    ascending rank, computed distributed — the intermediate the Gini
    aggregate (and its rank-coverage test) consume. Buckets are
    EQUI-DEPTH: cut points come from approx percentiles of the revenue
    distribution (a bounded driver-side array), so bucket sizes track
    n/GINI_BUCKETS whatever the value distribution — unlike a fixed
    value grid, whose densest cell grows linearly with data and caps
    the per-bucket row_number parallelism at the grid size (review
    finding). Bucket assignment only needs MONOTONICITY in r (equal
    revenues always compare identically against every cut, so ties
    never split), which is why approximate cut points still yield
    exact global ranks. The two-phase bucketed window itself is the
    shared ``functions/prefix.py::global_row_number`` kernel (also
    ranking the Zipf vocabulary in ``textstats.py::token_zipf_fit``)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    rev = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(25,6)")).alias("r")
    )
    from airflow_ml_pipeline_spark.functions.prefix import global_row_number

    return global_row_number(
        rev, "r", [F.asc("custkey")], GINI_BUCKETS
    ).select("r", "rk")


@query(
    "customer_revenue_gini",
    oracle="""
    WITH rev AS (
        SELECT o_custkey AS custkey,
               SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS r
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT r, CAST(row_number() OVER (ORDER BY r, custkey) AS BIGINT)
                      AS rk
        FROM rev
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(r) AS DOUBLE) AS total_revenue,
           round(2.0 * CAST(SUM(rk * r) AS DOUBLE)
                 / (COUNT(*) * CAST(SUM(r) AS DOUBLE))
                 - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
    FROM ranked
    """,
)
def customer_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer lifetime revenue — the inequality
    statistic behind concentration-risk dashboards ("what share of
    revenue sits with the top customers", the scalar companion of
    `customer_pareto_class`'s per-customer cut), via the discrete
    rank formula G = 2*Σ(i·x_i)/(n·Σx) − (n+1)/n over ascending ranks.

    Exactness: revenue and the rank-weighted sum stay DECIMAL through
    every aggregation (rank·decimal is exact; both sums are
    order-independent, so map-side partials survive) and convert to
    double only inside the identical final expression; ranks are total
    (tie-break on custkey).

    Scale shape: the oracle's global row_number is a single-partition
    sort at 100 TB; the plan computes the SAME ranks distributed via
    EQUI-DEPTH buckets (see ``gini_ranked_revenue``) — per-bucket
    counts windowed into global offsets (a tiny frame), then per-bucket
    row_numbers IN PARALLEL plus the broadcast offset. The equi-depth
    bucketing is the shared ``functions/prefix.py`` kernel, reused by
    `customer_pareto_class`'s prefix-sum variant (`sequence_packing`
    and `corpus_token_budget_fill` carry the pattern's other
    variants)."""
    ranked = gini_ranked_revenue(spark, sf_dir)
    n = F.count(F.lit(1))
    s0 = F.sum("r")
    s1 = F.sum(F.col("rk") * F.col("r"))
    return ranked.agg(
        n.alias("n_customers"),
        s0.cast("double").alias("total_revenue"),
        F.round(
            F.lit(2.0) * s1.cast("double") / (n * s0.cast("double"))
            - (n + F.lit(1.0)) / n,
            6,
        ).alias("gini"),
    )
