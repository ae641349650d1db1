"""Equi-depth bucketing for distributed two-phase prefix kernels.

The global-window family (prefix sums, global ranks) executes at scale as
two phases: bucket rows by the ordered value, aggregate one tiny per-
bucket frame for global offsets, then window WITHIN buckets in parallel.
The result is bit-identical to the single-partition global window as long
as bucket assignment is MONOTONE in the ordering value — equal values
always compare identically against every cut, so ties never split across
buckets.

Cut points must be EQUI-DEPTH (value-distribution quantiles), not a fixed
value grid: a dense value band on a grid concentrates rows in one bucket,
and that bucket's window becomes the serial bottleneck — per-bucket
parallelism caps at the grid, not at n/buckets (round-4 review finding on
the Gini ranks; round-5 ADVICE asked for this shared extraction so
``customer_pareto_class`` inherits the fix).

Consumers: ``operators/stats.py::gini_ranked_revenue`` (global ranks),
``operators/analytics.py::customer_pareto_class`` (global prefix sum),
``operators/textstats.py::token_zipf_fit`` (global frequency ranks),
``functions/zorder.py`` (equi-depth grid cells, all columns in one scan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def bucket_by_cuts(value: str, cuts: list[float]) -> Column:
    """Bucket id (0..len(cuts), monotone non-decreasing in ``value``) for
    a pre-computed ascending cut array: the count of cuts <= value, as a
    map-side scan of one broadcast array literal (a single array Literal,
    not per-element ``F.lit``s — the Janino-compile gotcha). NULL values
    compare NULL against every cut and land in bucket 0, which matches
    the single-partition window's default null placement (NULLS FIRST
    ascending, NULLS LAST descending — descending offsets run backwards,
    so bucket 0 is last)."""
    cuts_lit = F.lit([float(c) for c in cuts]).cast("array<double>")
    return F.size(
        F.filter(cuts_lit, lambda c: c <= F.col(value).cast("double"))
    )


def equi_depth_cuts(
    df: DataFrame, cols: list[str], n_buckets: int, accuracy: int = 1000
) -> dict[str, list[float]]:
    """Approximate equi-depth cut points for every column of ``cols`` in
    ONE bounded aggregate scan (< n_buckets doubles per column collected
    to the driver). ``accuracy`` trades memory for quantile rank error
    (~n/accuracy rows); callers asking for many buckets must scale it,
    or adjacent cuts collide (are deduped here) and the effective bucket
    count silently drops below ``n_buckets``."""
    qs = [i / n_buckets for i in range(1, n_buckets)]
    row = df.agg(
        *[
            F.percentile_approx(F.col(c).cast("double"), qs, accuracy).alias(
                f"__cuts_{i}"
            )
            for i, c in enumerate(cols)
        ]
    ).collect()[0]
    # empty input / all-null values: percentile_approx yields NULL — every
    # row (there are none, or their casts are null) lands in bucket 0
    # instead of crashing the builder (review finding: the fixed-grid
    # predecessor tolerated empty input)
    return {
        c: (sorted(set(row[i])) if row[i] is not None else [])
        for i, c in enumerate(cols)
    }


def equi_depth_bucket(
    df: DataFrame, value: str, n_buckets: int, accuracy: int = 1000
) -> Column:
    """A bucket-id Column (0..n_buckets-1, monotone non-decreasing in
    ``value``) whose cut points are approximate quantiles of ``df``'s
    value distribution, so bucket populations track n/n_buckets whatever
    the distribution. One bounded driver-side aggregate (the cut array,
    < n_buckets doubles) is collected here; assignment itself is a
    map-side array scan against the broadcast literal.

    Approximate cuts still yield EXACT downstream windows: correctness
    needs only monotonicity, the quantile estimate just balances bucket
    sizes."""
    return bucket_by_cuts(
        value, equi_depth_cuts(df, [value], n_buckets, accuracy)[value]
    )


def _bucketed_row_number(
    b: DataFrame,
    bucket_cols: list[str],
    offset_order: list[Column],
    in_order: list[Column],
    out: str,
    offset_partition: list[str] | None = None,
) -> DataFrame:
    """Phase 2 of the two-phase global window, shared by all rank
    kernels: one tiny per-bucket count frame, a bounded window over it
    for cumulative global offsets (broadcast back), then ``row_number``
    WITHIN buckets in parallel. ``offset_order`` must walk the buckets in
    global output order; ``in_order`` orders rows inside one bucket.
    With ``offset_partition`` the offsets window restarts per partition
    key, turning the global rank into a per-class rank (the
    :func:`class_row_number` shape); the partition columns must be a
    prefix of ``bucket_cols`` so every row joins its own class's
    offsets."""
    counts = b.groupBy(*bucket_cols).agg(F.count(F.lit(1)).alias("__bn"))
    w_base = (
        Window.partitionBy(*offset_partition)
        if offset_partition
        else Window
    )
    w_off = w_base.orderBy(*offset_order).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        *bucket_cols,
        F.coalesce(F.sum("__bn").over(w_off), F.lit(0).cast("bigint")).alias(
            "__offset"
        ),
    )
    return (
        b.join(F.broadcast(offsets), bucket_cols)
        .withColumn(
            out,
            (
                F.col("__offset")
                + F.row_number().over(
                    Window.partitionBy(*bucket_cols).orderBy(*in_order)
                )
            ).cast("bigint"),
        )
        .drop("__offset")
    )


def global_row_number(
    df: DataFrame,
    value: str,
    tiebreak: list[Column],
    n_buckets: int,
    descending: bool = False,
    out: str = "rk",
) -> DataFrame:
    """``df`` plus an ``out`` BIGINT column holding the exact global
    ``row_number() OVER (ORDER BY value [DESC], *tiebreak)``, computed as
    the two-phase bucketed window: equi-depth bucket on ``value``, then
    the shared offsets/row_number phase (:func:`_bucketed_row_number`).
    Bit-identical to the single-partition global window because bucket
    assignment is monotone in ``value`` (ties never split across buckets
    — the tiebreak columns only ever order rows inside one bucket).

    ``value`` is bucketed through a double cast: monotone for every
    numeric type (decimal ties collapse to equal doubles and stay
    together; counts past 2^53 that collide in double share a bucket and
    re-order exactly on the original column inside it).

    Use this form when ``value`` is near-unique (revenues, scores).
    When ``value`` is TIE-HEAVY (e.g. token frequencies, where ~half a
    Zipf vocabulary shares freq=1) the ties-stay-together invariant
    makes the largest tie class one bucket — one serial window again —
    so use :func:`global_row_number_tied` instead."""
    b = df.withColumn("__bucket", equi_depth_bucket(df, value, n_buckets))
    return _bucketed_row_number(
        b,
        ["__bucket"],
        [F.desc("__bucket") if descending else F.asc("__bucket")],
        [F.desc(value) if descending else F.asc(value), *tiebreak],
        out,
    ).drop("__bucket")


def _str_prefix_surrogate(col: Column) -> Column:
    """An order-preserving DOUBLE surrogate of a string: its first 7
    UTF-8 bytes, zero-right-padded, read as a big-endian integer. 7
    bytes keeps the value inside the positive signed-64 range so `conv`
    never wraps; the double cast is monotone non-strictly, and UTF-8
    byte order equals Spark's (and DuckDB's) string comparison order —
    so s1 <= s2 implies surrogate(s1) <= surrogate(s2). Surrogates
    collide for strings sharing a 7-byte prefix AND for 56-bit prefix
    integers that round to the same 53-bit double mantissa (≈ strings
    equal through the first ~6.6 bytes); either way colliding strings
    simply stay in one sub-bucket and re-order exactly on the full
    string inside it."""
    return F.conv(
        F.hex(F.rpad(col.cast("binary"), 7, bytes([0]))), 16, 10
    ).cast("double")


def global_row_number_tied(
    df: DataFrame,
    value: str,
    tie_col: str,
    n_sub: int,
    descending: bool = False,
    out: str = "rk",
    accuracy: int = 1000,
) -> DataFrame:
    """``df`` plus the exact global ``row_number() OVER (ORDER BY value
    [DESC], tie_col)`` for TIE-HEAVY numeric ``value`` with a unique
    string ``tie_col`` — the shape equi-depth bucketing degenerates on,
    because a dominant tie class (hapax tokens at freq=1 are ~half of
    any Zipf vocabulary) must stay in one bucket and becomes one serial
    window.

    Two-level buckets instead: the first level is the EXACT value class
    (the distinct-value frame is small — O(sqrt(corpus)) classes for
    count data), the second level splits inside each class by equi-depth
    cuts on an order-preserving byte-prefix surrogate of ``tie_col``,
    computed per class with one grouped percentile_approx aggregation.
    The cuts frame is pinned with a lazy ``localCheckpoint`` because the
    plan references it (through ``b``) on both the probe side and the
    counts/offsets side: percentile_approx merges partial GK summaries
    in shuffle-arrival order, so a RE-EXECUTION could legally return
    different per-class cut arrays, and two divergent evaluations would
    assign the same row different ``__sub`` values and corrupt the join
    (review finding — exchange reuse usually deduplicates the two
    evaluations, but rank integrity must not hang on an optimizer
    cache hit). The checkpoint materializes the tiny class-level frame
    exactly once; sampling-based range partitioning has the same
    re-execution hazard with no comparably small thing to pin.
    Offsets then come from one tiny (class, sub) count frame, and
    row_number runs per (class, sub) partition — parallelism ~n/n_sub
    regardless of tie mass (:func:`_bucketed_row_number`). Exactness:
    inside a class only ``tie_col`` orders rows, sub is monotone in the
    surrogate which is monotone in ``tie_col``, and equal surrogates
    never split.

    NULL ``value`` rows SURVIVE and rank where the single global window
    puts them (NULLS FIRST ascending, NULLS LAST descending): the class
    key is carried as a single-field STRUCT, so the equi-joins against
    the cuts and offsets frames compare the wrapped field null-safely
    (a struct is never null even when its field is) and struct ordering
    equals the bare column's — where a bare-column join would silently
    drop the NULL class (ADVICE r6)."""
    qs = [i / n_sub for i in range(1, n_sub)]
    sur = _str_prefix_surrogate(F.col(tie_col))
    cls = F.struct(F.col(value).alias("v"))
    cuts = (
        df.select(cls.alias("__cls"), sur.alias("__sur"))
        .groupBy("__cls")
        .agg(F.percentile_approx(F.col("__sur"), qs, accuracy).alias("__cuts"))
        .localCheckpoint(eager=False)
    )
    b = (
        df.withColumn("__cls", cls)
        .withColumn("__sur", sur)
        .join(F.broadcast(cuts), "__cls")
        .withColumn(
            "__sub",
            F.size(F.filter(F.col("__cuts"), lambda c: c < F.col("__sur"))),
        )
        .drop("__cuts", "__sur")
    )
    return _bucketed_row_number(
        b,
        ["__cls", "__sub"],
        [F.desc("__cls") if descending else F.asc("__cls"), F.asc("__sub")],
        [F.asc(tie_col)],
        out,
    ).drop("__sub", "__cls")


def class_row_number(
    df: DataFrame,
    cls: str,
    value: str,
    tiebreak: list[Column],
    n_buckets: int,
    descending: bool = False,
    out: str = "rk",
) -> DataFrame:
    """``df`` plus an ``out`` BIGINT column holding the exact per-class
    ``row_number() OVER (PARTITION BY cls ORDER BY value [DESC],
    *tiebreak)`` — without one serial window task per class. A
    low-cardinality class column (five languages, a handful of sources)
    makes ``Window.partitionBy(cls)`` degenerate at scale exactly the way
    the unpartitioned global window does: each class is one task. Here the
    rows bucket by GLOBAL equi-depth cuts on ``value`` (one eager bounded
    aggregate; global cuts are monotone within every class too, so
    per-class order is preserved and ties never split), per-(class,
    bucket) offsets come from one tiny count frame whose window restarts
    per class, and ``row_number`` runs within (class, bucket) partitions —
    parallelism ~n_buckets per class regardless of class count.

    The class key rides as a single-field STRUCT through the counts
    aggregation and offsets equi-join, so NULL-class rows survive and
    rank inside their own NULL class (the ADVICE-r6 null-safety pattern
    from :func:`global_row_number_tied`). NULL ``value`` rows land in
    bucket 0 per :func:`bucket_by_cuts` — the single-window placement.

    ``df`` is scanned twice (cuts aggregate + probe) plus once more by the
    counts aggregate; callers whose ``df`` is an expensive lineage should
    pin it with ``localCheckpoint(eager=False)`` first."""
    b = df.withColumn(
        "__cls", F.struct(F.col(cls).alias("k"))
    ).withColumn("__bucket", equi_depth_bucket(df, value, n_buckets))
    ranked = _bucketed_row_number(
        b,
        ["__cls", "__bucket"],
        [F.desc("__bucket") if descending else F.asc("__bucket")],
        [F.desc(value) if descending else F.asc(value), *tiebreak],
        out,
        offset_partition=["__cls"],
    )
    return ranked.drop("__bucket", "__cls")
