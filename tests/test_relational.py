"""Light structural checks for the relational core — deep correctness is the
DuckDB oracle harness (tools/oracle_check.py / the driver's t2 gate)."""

from __future__ import annotations

from airflow_ml_pipeline_spark.operators import relational


def test_pricing_summary_groups(spark, sf_dir):
    rows = relational.pricing_summary(spark, sf_dir).collect()
    assert len(rows) == 6  # 3 returnflags x 2 linestatuses
    by_key = {(r.l_returnflag, r.l_linestatus): r for r in rows}
    assert all(r.count_order > 0 for r in rows)
    assert all(r.sum_disc_price <= r.sum_base_price for r in rows)
    assert set(k[0] for k in by_key) == {"A", "N", "R"}


def test_revenue_by_segment_covers_all_segments(spark, sf_dir):
    rows = relational.revenue_by_segment(spark, sf_dir).collect()
    assert {r.c_mktsegment for r in rows} == {
        "AUTOMOBILE",
        "BUILDING",
        "FURNITURE",
        "HOUSEHOLD",
        "MACHINERY",
    }
    assert all(r.revenue > 0 and r.n_items > 0 for r in rows)


def test_top_orders_sorted_and_limited(spark, sf_dir):
    rows = relational.top_orders_by_revenue(spark, sf_dir).collect()
    assert len(rows) <= 10
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_rollup_has_grand_total(spark, sf_dir):
    rows = relational.rollup_revenue(spark, sf_dir).collect()
    grand = [r for r in rows if r.l_returnflag is None and r.l_linestatus is None]
    assert len(grand) == 1
    leaf_total = sum(
        r.n_items for r in rows if r.l_returnflag is not None and r.l_linestatus is not None
    )
    assert grand[0].n_items == leaf_total


def test_semi_anti_join_disjoint(spark, sf_dir):
    """A customer with an open order must not appear in the anti-join result."""
    no_open = {
        r.c_custkey
        for r in relational.customers_no_open_orders(spark, sf_dir).collect()
    }
    open_cust = {
        r.o_custkey
        for r in relational.load_table(spark, sf_dir, "orders")
        .filter("o_orderstatus = 'P'")
        .select("o_custkey")
        .distinct()
        .collect()
    }
    assert no_open.isdisjoint(open_cust)


def test_segment_top_orders_rank_bounds(spark, sf_dir):
    rows = relational.segment_top_orders(spark, sf_dir).collect()
    assert all(1 <= r.rk <= 5 for r in rows)
    segs = {r.c_mktsegment for r in rows}
    assert len(rows) == 5 * len(segs)


def test_asof_join_strictly_earlier(spark, sf_dir):
    """The as-of match must be the latest view STRICTLY before the purchase."""
    from airflow_ml_pipeline_spark.operators import temporal

    ev = relational.load_table(spark, sf_dir, "events")
    res = temporal.asof_join_last_event(ev, "view", "purchase")
    rows = res.filter("asof_ts IS NOT NULL").limit(50).collect()
    assert rows
    views = {}
    for r in ev.filter("event_type = 'view'").collect():
        views.setdefault(r.user_id, []).append(r.ts)
    for r in rows:
        earlier = [t for t in views[r.user_id] if t < r.ts]
        assert r.asof_ts == max(earlier)
