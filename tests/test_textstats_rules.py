"""Pin the rule-decomposition identity: the quality gate IS the
conjunction of its per-rule components on both engines — the invariant
`quality_rule_breakdown` rests on (a rule edit that forgets one side
breaks the identity, not silently the diagnostics)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from airflow_ml_pipeline_spark.functions.text import STOPWORDS_EN, count_in, tokens
from airflow_ml_pipeline_spark.operators.textstats import (
    gate_rule_conds,
    quality_gate_cond,
    sql_gate_rules,
    sql_quality_gate,
)
from airflow_ml_pipeline_spark.sources.catalog import load_table


def test_spark_gate_equals_rule_conjunction(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    frame = docs.select(
        "doc_id",
        F.size(toks).alias("n_tok"),
        (count_in(toks, STOPWORDS_EN).cast("double") / F.size(toks)).alias(
            "sr"
        ),
    )
    rules = gate_rule_conds(F.col("n_tok"), F.col("sr"))
    conj = rules["min_tokens"] & rules["stop_ratio_lo"] & rules["stop_ratio_hi"]
    gate = quality_gate_cond(F.col("n_tok"), F.col("sr"))
    n_diff = frame.filter(conj != gate).count()
    assert n_diff == 0


def test_sql_gate_equals_rule_conjunction(sf_dir):
    rules = sql_gate_rules()
    conj = " AND ".join(f"({r})" for r in rules.values())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    n = con.execute(
        f"SELECT COUNT(*) FROM documents "
        f"WHERE ({sql_quality_gate()}) <> ({conj})"
    ).fetchone()[0]
    assert n == 0
