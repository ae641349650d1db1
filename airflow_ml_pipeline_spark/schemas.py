"""Explicit StructType schemas for every table the engine touches.

The engine never uses ``inferSchema`` (SURVEY.md §1.3): the reference infers
with pandas and asserts post-hoc; we declare up front so parquet/CSV scans
get column pruning + predicate pushdown against a stable schema.

Driver corpus schemas match /root/repo/FIXTURES.md §2 (read from the
sf0.001 parquet footers). The ``customers`` schema matches the reference
generator /root/reference/src/ml_pipeline/data_ingestion.py:90-102.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- reference domain table (churn customers) -------------------------------

CUSTOMERS = T.StructType(
    [
        T.StructField("tenure", T.IntegerType(), False),
        T.StructField("contract_type", T.StringType(), False),
        T.StructField("payment_method", T.StringType(), False),
        T.StructField("internet_service", T.StringType(), False),
        T.StructField("monthly_charges", T.DoubleType(), False),
        T.StructField("total_charges", T.DoubleType(), False),
        T.StructField("num_support_tickets", T.IntegerType(), False),
        T.StructField("avg_monthly_usage_gb", T.DoubleType(), False),
        T.StructField("churn", T.IntegerType(), False),
    ]
)

#: Columns the serving path accepts (CUSTOMERS minus the target).
CUSTOMERS_INPUT = T.StructType([f for f in CUSTOMERS.fields if f.name != "churn"])

# --- driver corpus (TPC-H-ish star schema + events/documents/embeddings) ----

TESTDATA = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampNTZType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLE_NAMES = tuple(TESTDATA)
