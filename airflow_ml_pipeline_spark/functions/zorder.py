"""Z-order (Morton) clustering for multi-column data skipping.

Parquet prunes row groups with min/max statistics, but sorting a table by
one column destroys locality on every other: a filter on the second column
reads every row group. Interleaving the bits of several columns' grid
coordinates yields a space-filling-curve key; sorting by it gives every
participating column *partial* locality, so min/max pruning works for
filters on ANY of them — the standard layout play (Delta/Iceberg
``OPTIMIZE ZORDER BY``) for multi-dimension lookups over 100 TB of parquet.

Everything is pure column expressions (no UDFs). Two grid strategies:

- ``"width"`` (default, the 100 TB path): equi-width cells via
  ``width_bucket`` between each column's global min/max — one tiny
  aggregate broadcast to the scan, ZERO window stages. Heavy skew can
  crowd cells (pruning degrades toward a plain sort on the skewed column
  but never below it).
- ``"rank"``: equi-depth cells via pre-sampled per-column quantile cuts
  (``functions/prefix.py::equi_depth_cuts``) — skew-immune like the
  exact-``ntile`` formulation this replaced in round 6, but with ZERO
  window stages: ONE bounded percentile aggregate covering every column
  at build time, then cell assignment is a broadcast-literal array scan
  inside the projection. Cell *boundaries* are approximate; cell
  assignment is still monotone, which is all a space-filling-curve grid
  needs.

The layout cost is paid once per OPTIMIZE pass and amortized over every
later pruned read — the same economics as bucketing (functions/bucketing.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
#: grid resolution per dimension; 12 bits x up to 5 cols stays inside int64
DEFAULT_BITS = 12


def interleave_bits(cells: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Morton-interleave ``len(cells)`` grid coordinates of ``bits`` bits
    each: output bit ``i*n_cols + c`` = bit ``i`` of ``cells[c]``. Unrolled
    shift/or folds that whole-stage codegen fuses into straight-line JVM
    bit math."""
    n = len(cells)
    assert n * bits <= 63, "interleaved key must fit a signed int64"
    out = F.lit(0).cast("long")
    for i in range(bits):
        for c, cell in enumerate(cells):
            bit = F.shiftright(cell.cast("long"), i).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, i * n + c))
    return out


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = DEFAULT_BITS,
    strategy: str = "width",
) -> DataFrame:
    """Append a ``zorder`` column interleaving the grid coordinates of
    ``cols`` (see module doc for the width-vs-rank tradeoff)."""
    from pyspark.sql.types import NumericType

    # BOTH strategies grid through a double cast, so a non-numeric column
    # (string, date) yields NULL casts and a constant cell for every row
    # — the dimension silently drops out of the curve (width: NULL
    # min/max → width_bucket NULL → least() pins top-1; rank: empty cut
    # array → cell 0). Refuse loudly instead (ADVICE r6; the round-7
    # review moved the guard here from the rank branch — the width
    # failure mode is the same). Use a numeric surrogate (epoch day,
    # dictionary code) for such columns.
    non_numeric = [
        name
        for name in cols
        if not isinstance(df.schema[name].dataType, NumericType)
    ]
    if non_numeric:
        raise ValueError(
            "zorder requires numeric columns; "
            f"non-numeric: {non_numeric}"
        )
    cells: list[Column] = []
    helper_cols: list[str] = []
    out = df
    top = 2**bits
    if strategy == "width":
        # one O(cols) aggregate row, broadcast into the scan projection
        aggs = []
        for name in cols:
            aggs += [
                F.min(name).alias(f"__zmin_{name}"),
                F.max(name).alias(f"__zmax_{name}"),
            ]
            helper_cols += [f"__zmin_{name}", f"__zmax_{name}"]
        out = out.crossJoin(F.broadcast(df.agg(*aggs)))
        for name in cols:
            lo = F.col(f"__zmin_{name}").cast("double")
            hi = F.col(f"__zmax_{name}").cast("double")
            cell = (
                F.width_bucket(F.col(name).cast("double"), lo, hi, F.lit(top))
                - 1
            )
            # width_bucket returns 1..top for in-range, top+1 at x == hi
            cells.append(F.least(cell, F.lit(top - 1)))
    elif strategy == "rank":
        from airflow_ml_pipeline_spark.functions.prefix import (
            bucket_by_cuts,
            equi_depth_cuts,
        )

        # ONE bounded eager aggregate scan covers every column's cut
        # array (review finding: per-column equi_depth_bucket calls cost
        # N sequential full scans at plan-build time), paid once per
        # OPTIMIZE pass; assignment itself is windowless. The sketch
        # accuracy must exceed the cell count or adjacent cuts collide
        # (rank error ~n/accuracy vs quantile spacing n/top) and the
        # effective grid silently coarsens toward `accuracy` cells.
        cut_map = equi_depth_cuts(
            df, cols, top, accuracy=max(10_000, 4 * top)
        )
        for name in cols:
            cells.append(bucket_by_cuts(name, cut_map[name]))
    else:
        raise ValueError(f"unknown zorder strategy: {strategy}")
    out = out.withColumn("zorder", interleave_bits(cells, bits))
    return out.drop(*helper_cols)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    files: int,
    bits: int = DEFAULT_BITS,
    strategy: str = "width",
) -> None:
    """Write ``df`` as parquet clustered on the Z-curve over ``cols``:
    range-partition by the zorder key into ``files`` tasks, sort within
    each, drop the key. Each output file then covers a compact curve
    segment, so its per-column min/max spans shrink toward
    ``files^(-1/len(cols))`` of the domain — the pruning win measured in
    tests/test_zorder.py against a single-column sort layout."""
    (
        zorder_key(df, cols, bits, strategy)
        .repartitionByRange(files, "zorder")
        .sortWithinPartitions("zorder")
        .drop("zorder")
        .write.mode("overwrite")
        .parquet(path)
    )
