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


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_matches_blocking_is_exact(spark, sf_dir):
    """FastSS deletion-neighborhood blocking misses no pair: the declared
    query's result equals the brute-force all-pairs Levenshtein<=1 scan
    (independent pure-Python distance), including insert/delete pairs —
    not just same-length substitutions."""
    from airflow_ml_pipeline_spark.operators.relational_ext import (
        customer_fuzzy_matches,
    )
    from airflow_ml_pipeline_spark.sources.catalog import load_table

    names = {
        r.c_custkey: r.c_name
        for r in load_table(spark, sf_dir, "customer").collect()
    }
    ids = sorted(names)
    expected = {
        (a, b): _lev(names[a], names[b])
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if _lev(names[a], names[b]) <= 1
    }
    got = {
        (r.cust_a, r.cust_b): r.distance
        for r in customer_fuzzy_matches(spark, sf_dir).collect()
    }
    assert got == expected
    assert expected, "sequential TPC-H names must contain distance-1 pairs"


def test_fuzzy_matches_insert_delete_pairs(spark):
    """Adversarial shapes: insert/delete at the ends and middle, and a
    distance-2 pair that must NOT match."""
    from airflow_ml_pipeline_spark.operators.relational_ext import (
        customer_fuzzy_matches,
    )
    import airflow_ml_pipeline_spark.operators.relational_ext as rx

    rows = [
        (1, "abcd"), (2, "abd"),      # delete middle -> 1
        (3, "abcde"),                  # append -> 1 vs abcd
        (4, "xbcd"),                   # substitute first -> 1 vs abcd
        (5, "abXY"),                   # distance 2 vs abcd: must not pair
    ]
    cust = spark.createDataFrame(rows, ["c_custkey", "c_name"])
    orig = rx.load_table
    try:
        rx.load_table = lambda spark, sf_dir, name: cust
        got = {
            (r.cust_a, r.cust_b): r.distance
            for r in customer_fuzzy_matches(spark, "ignored").collect()
        }
    finally:
        rx.load_table = orig
    assert got == {(1, 2): 1, (1, 3): 1, (1, 4): 1}


def test_steps_to_purchase_matches_python_walk(spark, sf_dir):
    """The recursive-CTE walk must equal a driver-side linked-list walk
    (same (ts, event_id) total order, same cap)."""
    from airflow_ml_pipeline_spark.operators.events import (
        WALK_CAP,
        events_steps_to_purchase,
    )
    from airflow_ml_pipeline_spark.sources.catalog import load_table

    rows = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", "event_type")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_id, r.event_type))
    expected = {}
    for u, evs in by_user.items():
        evs.sort()
        steps, reached, walked = -1, 0, 0
        for depth, (_, _, et) in enumerate(evs):
            walked = depth
            if et == "purchase":
                steps, reached = depth, 1
                break
            if depth >= WALK_CAP:
                break
        expected[u] = (walked, steps, reached)
    got = {
        r.user_id: (r.walked, r.steps_to_purchase, r.reached)
        for r in events_steps_to_purchase(spark, sf_dir).collect()
    }
    assert got == expected
