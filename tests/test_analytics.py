"""Invariant tests for the product-analytics operators (the value-level
check is each query's DuckDB oracle; these pin the algebraic properties a
hash match can't articulate)."""

from __future__ import annotations

from collections import defaultdict

from airflow_ml_pipeline_spark.operators import analytics
from airflow_ml_pipeline_spark.sources.catalog import load_table


def test_funnel_counts_are_monotone(spark, sf_dir):
    row = analytics.events_funnel(spark, sf_dir).collect()[0]
    assert row.n_step1 >= row.n_step2 >= row.n_step3 >= 0


def test_transition_matrix_rows_are_distributions(spark, sf_dir):
    rows = analytics.event_transition_matrix(spark, sf_dir).collect()
    by_from = defaultdict(float)
    for r in rows:
        assert 0.0 <= r.p <= 1.0
        by_from[r.from_type] += r.p
    for from_type, total in by_from.items():
        assert abs(total - 1.0) < 1e-4, (from_type, total)


def test_scd2_intervals_are_disjoint_and_ordered(spark, sf_dir):
    rows = analytics.user_state_scd2(spark, sf_dir).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    for user, runs in by_user.items():
        runs.sort(key=lambda r: r.valid_from_us)
        # exactly one open (current) interval per user, and it is the last
        open_runs = [r for r in runs if r.valid_to_us is None]
        assert len(open_runs) == 1 and runs[-1].valid_to_us is None
        for a, b in zip(runs, runs[1:]):
            assert a.valid_to_us == b.valid_from_us  # gapless handoff
            assert a.event_type != b.event_type  # runs were collapsed


def test_pareto_classes_partition_and_cut_at_80(spark, sf_dir):
    rows = analytics.customer_pareto_class(spark, sf_dir).collect()
    n_cust = load_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    assert len(rows) == n_cust
    assert {r.abc_class for r in rows} <= {"A", "B", "C"}
    total = sum(r.revenue for r in rows)
    a_rev = sum(r.revenue for r in rows if r.abc_class == "A")
    max_single = max(r.revenue for r in rows)
    # A holds at most 80% of revenue, and adding its boundary successor
    # (the first B customer) would cross 80%
    assert a_rev <= 0.8 * total + 1e-6
    assert a_rev + max_single >= 0.8 * total - 1e-6 or not any(
        r.abc_class == "B" for r in rows
    )
    ranked = sorted(rows, key=lambda r: (-r.revenue, r.custkey))
    shares = [r.cum_share for r in ranked]
    assert shares == sorted(shares)
    assert abs(shares[-1] - 1.0) < 1e-6


def test_concurrency_profile_bounds(spark, sf_dir):
    rows = analytics.session_concurrency_profile(spark, sf_dir).collect()
    assert rows
    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert all(1 <= r.max_concurrent <= n_users for r in rows)
    # the synthetic stream keeps many users active in the same hour
    assert max(r.max_concurrent for r in rows) > 1
    assert all(r.hour_us % 3_600_000_000 == 0 for r in rows)
