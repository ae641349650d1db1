"""Z-order layout: bit-interleave correctness and a pyarrow-footer-verified
data-skipping win — the min/max pruning a parquet reader would actually do,
measured from the written files' statistics, not simulated."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from airflow_ml_pipeline_spark.functions.zorder import (
    interleave_bits,
    write_zordered,
    zorder_key,
)
from airflow_ml_pipeline_spark.sources.catalog import load_table

COLS = ["o_custkey", "o_totalprice"]
N_FILES = 8


def _candidate_files(path: str, column: str, lo: float, hi: float) -> tuple[int, int]:
    """(files whose [min,max] intersects [lo,hi], total files) — exactly the
    row-group skipping decision a scan makes from footer stats."""
    ds = pq.ParquetDataset(path)
    total, candidates = 0, 0
    for fragment in ds.fragments:
        meta = fragment.metadata
        idx = {c: i for i, c in enumerate(meta.schema.names)}[column]
        f_min = min(
            meta.row_group(g).column(idx).statistics.min
            for g in range(meta.num_row_groups)
        )
        f_max = max(
            meta.row_group(g).column(idx).statistics.max
            for g in range(meta.num_row_groups)
        )
        total += 1
        if not (f_max < lo or f_min > hi):
            candidates += 1
    return candidates, total


def test_interleave_bits_known_pattern(spark):
    # cells x=0b0011, y=0b0101; bit i of cell c lands at i*2+c, so the
    # morton word reads (y3x3 y2x2 y1x1 y0x0) = 0b00100111
    df = spark.range(1).select(
        interleave_bits([F.lit(0b0011), F.lit(0b0101)], bits=4).alias("z")
    )
    assert df.first().z == 0b00100111


def test_zorder_key_preserves_rows_and_schema(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    for strategy in ("width", "rank"):
        z = zorder_key(orders, COLS, bits=8, strategy=strategy)
        assert z.count() == orders.count()
        assert set(z.columns) == set(orders.columns) | {"zorder"}
        # every key is a valid 16-bit interleave of two 8-bit cells
        mx = z.agg(F.max("zorder"), F.min("zorder")).first()
        assert 0 <= mx[1] and mx[0] < 2**16


def test_zorder_layout_prunes_on_both_columns(spark, sf_dir, tmp_path):
    """Against the single-column-sort layout: z-order must cut candidate
    files for filters on the SECOND column (where a sort reads everything)
    while keeping pruning on the first."""
    orders = load_table(spark, sf_dir, "orders")
    a, b = COLS

    sorted_path = str(tmp_path / "sorted_by_a")
    (
        orders.repartitionByRange(N_FILES, a)
        .sortWithinPartitions(a)
        .write.mode("overwrite")
        .parquet(sorted_path)
    )
    z_path = str(tmp_path / "zordered")
    write_zordered(orders, z_path, COLS, files=N_FILES, bits=8)

    # point lookups away from the curve's top split boundaries (a band
    # straddling the domain midpoint legitimately touches both halves)
    pa = orders.approxQuantile(a, [0.6], 0.001)[0]
    pb = orders.approxQuantile(b, [0.6], 0.001)[0]

    sorted_a, total = _candidate_files(sorted_path, a, pa, pa)
    sorted_b, _ = _candidate_files(sorted_path, b, pb, pb)
    z_a, z_total = _candidate_files(z_path, a, pa, pa)
    z_b, _ = _candidate_files(z_path, b, pb, pb)

    assert total == N_FILES and z_total == N_FILES
    # the sort layout is blind on column b: every file is a candidate
    assert sorted_b == N_FILES
    # z-order restores locality on b ...
    assert z_b < sorted_b
    # ... while staying far better than a full scan on a
    assert z_a < N_FILES
    # and the sort layout's own strength still holds there
    assert sorted_a <= z_a


def test_zorder_rank_builds_all_cuts_in_one_scan(spark, sf_dir, monkeypatch):
    """The rank strategy's build cost is ONE bounded aggregate collect
    covering every column's cut array (review finding: the per-column
    equi_depth_bucket formulation ran N sequential full scans before the
    plan even executed)."""
    orders = load_table(spark, sf_dir, "orders")
    # patch the CONCRETE class (pyspark 4's classic.dataframe.DataFrame
    # overrides collect, so the pyspark.sql.DataFrame base never fires)
    cls = type(orders)
    calls: list[int] = []
    orig = cls.collect

    def counting(self):
        calls.append(1)
        return orig(self)

    monkeypatch.setattr(cls, "collect", counting)
    out = zorder_key(orders, COLS + ["o_orderkey"], bits=6, strategy="rank")
    assert len(calls) == 1, f"rank build ran {len(calls)} eager jobs, not 1"
    # and the key is still produced for every row
    assert out.where(F.col("zorder").isNull()).count() == 0


def test_zorder_rank_scales_sketch_accuracy_to_cell_count(spark, monkeypatch):
    """percentile_approx rank error is ~n/accuracy; with 2^bits cells the
    cuts are n/2^bits apart, so accuracy must exceed the cell count or
    adjacent cuts collide and the effective grid silently coarsens
    (review finding). The rank strategy must request accuracy >= 4x the
    cell count."""
    import airflow_ml_pipeline_spark.functions.prefix as prefix_mod

    captured: dict[str, int] = {}

    def spy(df, cols, n_buckets, accuracy=1000):
        captured["n_buckets"] = n_buckets
        captured["accuracy"] = accuracy
        return {c: [] for c in cols}

    monkeypatch.setattr(prefix_mod, "equi_depth_cuts", spy)
    # plan construction alone must trigger the (spied) cuts build
    df = spark.range(4).select(F.col("id").alias("a"))
    zorder_key(df, ["a"], bits=12, strategy="rank")
    top = 2**12
    assert captured["n_buckets"] == top
    assert captured["accuracy"] >= 4 * top


def test_zorder_rejects_non_numeric_columns(spark):
    """ADVICE r6 + r7 review: a string/date column would cast to NULL
    and collapse to a constant cell under EITHER strategy (rank: empty
    cut array → cell 0; width: NULL min/max → pinned top cell), silently
    dropping the dimension from the curve — the builder must refuse
    loudly for both."""
    import pytest

    from airflow_ml_pipeline_spark.functions.zorder import zorder_key

    df = spark.range(100).selectExpr(
        "id AS a", "CAST(id AS STRING) AS s", "id * 2 AS b"
    )
    for strategy in ("rank", "width"):
        with pytest.raises(ValueError, match="non-numeric: \\['s'\\]"):
            zorder_key(df, ["a", "s", "b"], strategy=strategy)
        # numeric-only still builds
        assert "zorder" in zorder_key(df, ["a", "b"], strategy=strategy).columns
