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
``operators/textstats.py::token_zipf_fit`` (global frequency ranks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


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
    qs = [i / n_buckets for i in range(1, n_buckets)]
    raw = df.agg(
        F.percentile_approx(F.col(value).cast("double"), qs, accuracy)
    ).collect()[0][0]
    # empty input / all-null values: percentile_approx yields NULL — every
    # row (there are none, or their casts are null) lands in bucket 0
    # instead of crashing the builder (review finding: the fixed-grid
    # predecessor tolerated empty input)
    cuts = sorted(set(raw)) if raw is not None else []
    cuts_lit = F.lit([float(c) for c in cuts]).cast("array<double>")
    return F.size(
        F.filter(cuts_lit, lambda c: c <= F.col(value).cast("double"))
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
    the two-phase bucketed window: equi-depth bucket on ``value``, one
    tiny per-bucket count frame windowed for global offsets (broadcast
    back), then ``row_number`` WITHIN buckets in parallel. Bit-identical
    to the single-partition global window because bucket assignment is
    monotone in ``value`` (ties never split across buckets — the
    tiebreak columns only ever order rows inside one bucket).

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
    counts = b.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__bn"))
    w_off = Window.orderBy(
        F.desc("__bucket") if descending else F.asc("__bucket")
    ).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__bucket",
        F.coalesce(F.sum("__bn").over(w_off), F.lit(0).cast("bigint")).alias(
            "__offset"
        ),
    )
    w_in = Window.partitionBy("__bucket").orderBy(
        F.desc(value) if descending else F.asc(value), *tiebreak
    )
    return (
        b.join(F.broadcast(offsets), "__bucket")
        .withColumn(
            out,
            (F.col("__offset") + F.row_number().over(w_in)).cast("bigint"),
        )
        .drop("__bucket", "__offset")
    )


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
    computed per class with one grouped percentile_approx aggregation
    (deterministic, so it can stay lazy and be re-executed safely —
    unlike sampling-based range partitioning, which draws different
    boundaries per execution and would need a checkpoint barrier).
    Offsets then come from one tiny (class, sub) count frame, and
    row_number runs per (class, sub) partition — parallelism ~n/n_sub
    regardless of tie mass. Exactness: inside a class only ``tie_col``
    orders rows, sub is monotone in the surrogate which is monotone in
    ``tie_col``, and equal surrogates never split."""
    qs = [i / n_sub for i in range(1, n_sub)]
    sur = _str_prefix_surrogate(F.col(tie_col))
    cuts = df.groupBy(value).agg(
        F.percentile_approx(sur, qs, accuracy).alias("__cuts")
    )
    b = (
        df.withColumn("__sur", sur)
        .join(F.broadcast(cuts), value)
        .withColumn(
            "__sub",
            F.size(F.filter(F.col("__cuts"), lambda c: c < F.col("__sur"))),
        )
        .drop("__cuts", "__sur")
    )
    counts = b.groupBy(value, "__sub").agg(F.count(F.lit(1)).alias("__bn"))
    w_off = Window.orderBy(
        F.desc(value) if descending else F.asc(value), F.asc("__sub")
    ).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        value,
        "__sub",
        F.coalesce(F.sum("__bn").over(w_off), F.lit(0).cast("bigint")).alias(
            "__offset"
        ),
    )
    w_in = Window.partitionBy(value, "__sub").orderBy(F.asc(tie_col))
    return (
        b.join(F.broadcast(offsets), [value, "__sub"])
        .withColumn(
            out,
            (F.col("__offset") + F.row_number().over(w_in)).cast("bigint"),
        )
        .drop("__sub", "__offset")
    )
