"""Data-layout keys (Z-order / Morton interleaving) as pure JVM
expressions.

Why this exists at 100 TB: parquet/ORC readers prune row groups by
min/max statistics. Sorting a table by ONE column makes its stats
tight for that column only — a 2D range query (ship date x part) still
scans everything. Sorting by the bit-interleaved key of both columns
gives every row group a tight bounding BOX in (x, y) space, so a 2D
predicate prunes most groups on either-or-both dimensions. Engines
with OPTIMIZE ZORDER (Delta, Iceberg's sort orders) do exactly this;
here it is an expression any writer can ORDER BY.

The interleave is unrolled shift/or arithmetic on longs — identical in
any engine with bitwise ops, so the key column itself is
oracle-checkable.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key_2d(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Morton / Z-order key: interleave the low ``bits`` bits of two
    non-negative integer columns — x in even positions, y in odd.
    Callers bucket raw values into [0, 2^bits) first (modulo, ranking,
    or range scaling); the key is then ORDER BY'd at write time."""
    xc = (F.col(x) if isinstance(x, str) else x).cast("long")
    yc = (F.col(y) if isinstance(y, str) else y).cast("long")
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(xc, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(yc, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def zorder_sql_2d(x: str, y: str, bits: int = 16) -> str:
    """The identical arithmetic as ANSI/DuckDB SQL text, for oracles
    and for engines consuming the layout outside Spark."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)
