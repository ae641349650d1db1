"""Engine-neutral numeric/timestamp helpers for oracle-checkable queries.

Problem: SUM over doubles is order-dependent; Spark partial-aggregates per
partition while a single-node oracle sums sequentially, so the last bits
differ and any fixed-precision rounding can flip at a boundary. Fix: cast
each term to DECIMAL before summing — decimal addition is exact and
order-independent, so both engines produce the *identical* value — then cast
the total back to DOUBLE for a stable output schema. Per-term double
arithmetic (e.g. ``price * (1 - discount)``) is IEEE-deterministic and
matches across engines, so only the aggregation needs the decimal detour.

This also scales: Spark's decimal sum still does map-side partial
aggregation (exactness is what buys us commutativity), so there's no
shuffle-shape penalty at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: wide enough for 100 TB-scale money sums, fine enough that the
#: double->decimal rounding boundary (5e-7) is never hit by real data
DEC = "decimal(25,6)"

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


def dsum(c: Column) -> Column:
    """Order-independent sum of a double expression (see module doc)."""
    return F.sum(c.cast(DEC)).cast("double")


def davg(c: Column) -> Column:
    """Order-independent mean: exact decimal sum / non-null count, divided
    in double — bit-identical to the oracle's same computation."""
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def fmt_ts(c: Column) -> Column:
    """Timestamp -> 'yyyy-MM-dd HH:mm:ss' string (engine-neutral output)."""
    return F.date_format(c, TS_FMT_SPARK)


def SQL_DSUM(expr: str) -> str:
    """DuckDB twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE)"


def SQL_DAVG(expr: str) -> str:
    """DuckDB twin of :func:`davg`."""
    return f"(CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE) / COUNT({expr}))"


def SQL_TS(expr: str) -> str:
    """DuckDB twin of :func:`fmt_ts`."""
    return f"strftime({expr}, '{TS_FMT_DUCK}')"
