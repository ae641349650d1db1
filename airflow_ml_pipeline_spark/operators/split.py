"""Split / sampling operators (SURVEY.md §2.6 P1-P3).

Spark has no native stratified split (randomSplit is per-row Bernoulli), so
stratification is a window-rank construction: rank rows per class by a
seeded random key, then cut each class at exactly its proportion — the same
guarantee sklearn's ``train_test_split(stratify=y)`` gives
(/root/reference/src/ml_pipeline/run_pipeline.py:53-55).

One shuffle (the per-class window); deterministic under the seed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def stratified_split(
    df: DataFrame, label_col: str, test_size: float = 0.2, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """Exact per-class train/test split. Returns (train, test)."""
    w = Window.partitionBy(label_col).orderBy(F.rand(seed))
    n = Window.partitionBy(label_col)
    ranked = df.withColumn("__rk", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(n)
    )
    is_test = F.col("__rk") <= F.round(F.col("__n") * test_size)
    test = ranked.filter(is_test).drop("__rk", "__n")
    train = ranked.filter(~is_test).drop("__rk", "__n")
    return train, test


def stratified_fold_column(
    df: DataFrame, label_col: str, n_folds: int, seed: int = 42, fold_col: str = "fold"
) -> DataFrame:
    """Add a stratified fold assignment (0..n_folds-1) for
    CrossValidator(foldCol=...) — Spark CV is not stratified natively
    (SURVEY.md §2.7 T6); ntile over a seeded per-class order is."""
    w = Window.partitionBy(label_col).orderBy(F.rand(seed))
    return df.withColumn(fold_col, F.ntile(n_folds).over(w) - 1)


def sample_exact(df: DataFrame, n: int, seed: int = 42) -> DataFrame:
    """Uniform sample without replacement of exactly ``n`` rows (P2;
    explainability background sampling, reference explainability.py:63-72).
    orderBy(rand).limit is exact; at 100 TB prefer df.sample(fraction) which
    avoids the global sort at the cost of approximate size."""
    return df.orderBy(F.rand(seed)).limit(n)
