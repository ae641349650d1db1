"""Skew-handling utilities (north-star: 'skewed keys hurt … salting for
skew').

AQE's skew-join splitting handles most cases at runtime; these helpers cover
the two shapes AQE cannot fix:

- **salted two-phase aggregation** for a hot GROUP BY key: pre-aggregate on
  (key, salt) so one reducer never owns a hot key's whole stream, then
  merge the partials;
- **replicated salted join** for a hot join key against a small-ish side:
  salt the big side, explode the small side across all salts.

Both are pure DataFrame compositions and oracle-transparent (results are
identical to the unsalted plan — tests assert equality).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_sum(
    df: DataFrame,
    key_cols: list[str],
    sum_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """GROUP BY with a salted first phase: returns (key_cols..., n_rows,
    total). Phase 1 shuffles on (key, salt) — hot keys spread over n_salts
    reducers; phase 2 merges n_salts tiny partials per key."""
    salted = df.withColumn("__salt", (F.rand(0) * n_salts).cast("int"))
    partial = salted.groupBy(*key_cols, "__salt").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col(sum_col).cast("decimal(25,6)")).alias("__s"),
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("__n").alias("n_rows"),
        F.sum("__s").cast("double").alias("total"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Equi join where ``big`` has skewed keys: big rows get a random salt,
    small rows are replicated across every salt, and the join key becomes
    (key, salt) — a hot key's rows land on n_salts tasks instead of one.
    Result equals big.join(small, key)."""
    big_salted = big.withColumn("__salt", (F.rand(0) * n_salts).cast("int"))
    small_replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_salted.join(small_replicated, [key, "__salt"]).drop("__salt")
