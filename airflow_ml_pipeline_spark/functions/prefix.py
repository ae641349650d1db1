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
``operators/analytics.py::customer_pareto_class`` (global prefix sum).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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
