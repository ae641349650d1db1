"""Declared-query registry: the engine's public query surface.

Every operator the engine claims (SURVEY.md §2) registers here as a
``(spark, sf_dir) -> DataFrame`` callable, optionally paired with an ANSI-SQL
oracle string that DuckDB runs over the same parquet tables. The driver
harness (/root/repo/__spark_entry__.py) exposes this registry verbatim.

Contract rules enforced by convention here:
- every computed column is aliased identically in the Spark plan and the SQL;
- float aggregates are rounded on BOTH sides (sum-order nondeterminism);
- timestamps are emitted as formatted strings (engine-neutral);
- integer sums are cast to BIGINT in SQL (DuckDB widens to HUGEINT).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query; ``oracle=None`` → rows-only driver check
    (reserved for genuinely non-SQL-expressible operators)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
