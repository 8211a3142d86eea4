"""Multi-dimensional file-layout helpers: Z-order (Morton) clustering keys.

Partitioned and bucketed layouts (operators/sinks.py) skip on ONE key;
min/max row-group stats skip on a sort prefix. A Z-order key interleaves the
bits of two dimension columns so sorting by it clusters rows that are close
in BOTH dimensions — the standard layout for lat/lon- or (time, key)-style
range queries over parquet/Delta at 100 TB: a 2-D box predicate then touches
O(perimeter) row groups instead of O(rows).

Everything is plain bitwise SQL (shiftleft / & / |), JVM-codegen'd, and
reproducible bit-for-bit in DuckDB for the oracle gate.

Reference parity: the reference has no write path at all (SURVEY.md §2C);
this extends the engine's sink story beyond single-key layouts.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _spread4(c: Column) -> Column:
    """Spread a 4-bit int's bits to the even positions of an 8-bit int:
    abcd -> a0b0c0d0 (two rounds of the magic-number spreading trick)."""
    c = c.bitwiseOR(F.shiftleft(c, 2)).bitwiseAND(F.lit(0x33))
    c = c.bitwiseOR(F.shiftleft(c, 1)).bitwiseAND(F.lit(0x55))
    return c


def zorder_key_4bit(y: Column, x: Column) -> Column:
    """Morton-interleave two 4-bit coordinates (0..15) into one 8-bit key:
    y-bits land on odd positions, x-bits on even. Sort (or range-partition)
    by this key before writing and a box predicate on (y, x) prunes most
    row groups via min/max stats."""
    return F.shiftleft(_spread4(y), 1).bitwiseOR(_spread4(x))


# The identical arithmetic as oracle SQL (DuckDB): two spreading rounds.
def zorder_sql_4bit(y: str, x: str) -> str:
    def spread(v: str) -> str:
        s1 = f"(({v} | ({v} << 2)) & 51)"   # 0x33
        s2 = f"(({s1} | ({s1} << 1)) & 85)"  # 0x55
        return s2

    return f"(({spread(y)} << 1) | {spread(x)})"
