"""Exact-arithmetic aggregation helpers.

Summing IEEE doubles is order-dependent, and both Spark and DuckDB
aggregate in nondeterministic partial/parallel order — so a double SUM is
not even run-to-run stable, let alone engine-portable. Every
oracle-checked aggregate in this engine therefore:

1. casts the measure to DECIMAL (exact; double→decimal rounding is
   identical across engines because decimal tie-points are never exactly
   representable as binary doubles),
2. aggregates in decimal (exact in any order), and
3. casts the final result to DOUBLE (one correctly-rounded IEEE op).

The result is bit-identical across engines, partitionings and run orders
— which also makes it *scale-invariant*: the same query at 100 TB with
10,000 partitions hashes identically to the local[32] run.

Performance note: decimal aggregation stays inside whole-stage codegen
(Tungsten's fixed-precision Decimal128), so this costs ~nothing relative
to shuffle/scan time on wide aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: default decimal shape for money-like doubles in the fixtures
MONEY = (18, 2)
#: default shape for small ratios (discount / tax, 0 <= x < 10)
RATIO = (8, 4)


def dec(col: Column | str, precision: int = 18, scale: int = 4) -> Column:
    """Cast a double column to an exact decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col: Column | str, precision: int = 18, scale: int = 4) -> Column:
    """Order-independent SUM: decimal-cast, sum exactly, emit double."""
    return F.sum(dec(col, precision, scale)).cast("double")


def davg(col: Column | str, precision: int = 18, scale: int = 4) -> Column:
    """Order-independent AVG: exact decimal sum divided by count, in double.

    (Not decimal AVG — Spark's decimal avg rounds at scale+4 while DuckDB
    promotes to double; dividing the exact sum by the exact count as
    doubles is a single correctly-rounded op in both engines.)
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, precision, scale)).cast("double") / F.count(c)
