"""VERDICT r8 ask #4 — port near_dup_cluster_labels' driver-side
min-label-propagation loop to native ``WITH RECURSIVE``.

Outcome: NOT EXPRESSIBLE in Spark 4.1. Connected components needs a
fixpoint, and both SQL shapes that express one are rejected by the
engine with explicit error classes:

1. The DuckDB-oracle shape — ``UNION`` (dedup) walk that terminates when
   no new (node, label) row appears — fails analysis with
   ``UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE`` (only UNION ALL is
   implemented, SPARK-24497 follow-ons).
2. The per-level propagation shape — each recursion level recomputes the
   whole label table via join + MIN aggregate over the previous level —
   fails with ``INVALID_RECURSIVE_REFERENCE.PLACE`` (recursive
   references are banned inside aggregates).

``UNION ALL`` alone cannot do CC: on a cyclic graph the walk re-derives
the same rows forever (no dedup → no fixpoint), and a depth-capped
variant enumerates paths — exponential in the near-clique components
near-dup graphs actually produce. So the driver-side loop with pointer
doubling (O(log diameter) rounds, linear work per round, eager
checkpoint per round — `operators/corpus_ops.py::near_dup_cluster_labels`)
REMAINS the implementation, and is also the right 100 TB shape: each
round is edge-sized joins, never path enumeration.

These tests PIN the engine limitation: when a Spark upgrade starts
accepting either statement, a test here fails, which is the signal to
benchmark the native port against the loop (keep whichever wins) — the
A/B the r8 verdict asked for becomes possible exactly then.
"""

from __future__ import annotations

import pytest
from pyspark.errors.exceptions.captured import AnalysisException


@pytest.fixture()
def edges_view(spark):
    edges = spark.createDataFrame(
        [(2, 1), (1, 2), (3, 2), (2, 3), (10, 11), (11, 10)],
        "src long, dst long",
    )
    edges.createOrReplaceTempView("cc_port_edges")
    yield "cc_port_edges"
    spark.catalog.dropTempView("cc_port_edges")


def test_union_dedup_fixpoint_cc_still_unsupported(spark, edges_view):
    """The oracle's own CC statement (UNION-dedup fixpoint walk). Spark
    4.1: UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE. If this stops raising,
    Spark can run the DuckDB oracle verbatim — benchmark the native port
    vs the pointer-doubling loop and keep the winner."""
    sql = f"""
    WITH RECURSIVE walk(doc_id, label) AS (
        SELECT src, src FROM {edges_view}
        UNION
        SELECT e.src, w.label
        FROM {edges_view} e JOIN walk w ON e.dst = w.doc_id
        WHERE w.label < e.src
    )
    SELECT doc_id, MIN(label) AS label FROM walk GROUP BY doc_id
    """
    with pytest.raises(AnalysisException, match="UNION_NOT_SUPPORTED"):
        spark.sql(sql).collect()


def test_aggregate_in_recursive_step_still_unsupported(spark, edges_view):
    """Per-level whole-table propagation (join + MIN per level, fixed
    level count = the driver loop unrolled into one plan). Spark 4.1:
    INVALID_RECURSIVE_REFERENCE.PLACE (no aggregates over the recursive
    reference). If this stops raising, the loop is portable natively."""
    sql = f"""
    WITH RECURSIVE lab(doc_id, label, it) AS (
        SELECT src, LEAST(src, MIN(dst)), 0 FROM {edges_view} GROUP BY src
        UNION ALL
        SELECT l.doc_id, LEAST(l.label, MIN(n.label)), l.it + 1
        FROM lab l JOIN {edges_view} e ON e.src = l.doc_id
        JOIN lab n ON n.doc_id = e.dst AND n.it = l.it
        WHERE l.it < 4
        GROUP BY l.doc_id, l.label, l.it
    )
    SELECT doc_id, MIN(label) AS label FROM lab GROUP BY doc_id
    """
    with pytest.raises(AnalysisException, match="INVALID_RECURSIVE_REFERENCE"):
        spark.sql(sql).collect()


def test_multi_step_walk_equals_single_step(spark, sf_dir):
    """THE equivalence pin for the multi-step walk rewrites (r13
    two-step, r14 tag-gated four-step)
    (events_steps_to_purchase): engine and oracle run the SAME
    statement, so a semantic slip in the rewrite would hash-agree
    across engines and hide — only an independent comparison against
    the retained one-step body can catch it. Runs both forms over the
    full corpus via Spark and asserts identical aggregates."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from airflow_ml_pipeline_spark.operators import events
    from airflow_ml_pipeline_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    linked = (
        ev.select(
            "user_id",
            "event_id",
            "event_type",
            F.lead("event_id").over(w).alias("nxt"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= events.WALK_CAP + 1)
        .localCheckpoint(eager=False)
    )
    linked.createOrReplaceTempView("walk_eq_linked")
    single = sorted(
        tuple(r)
        for r in spark.sql(
            "WITH RECURSIVE " + events._walk_body_single("walk_eq_linked")
        ).collect()
    )
    double = sorted(
        tuple(r)
        for r in events.events_steps_to_purchase(spark, sf_dir).collect()
    )
    assert single == double
