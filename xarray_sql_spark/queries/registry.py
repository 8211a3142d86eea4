"""Registry mapping query names to (spark builder, duckdb oracle) pairs.

Cross-engine determinism conventions (the driver hash-compares values):
- Alias every computed column identically in Spark and oracle SQL.
- Averages / ratios: ``round(x, 6)`` — relative fp error is ~1e-11, far from
  the rounding boundary, so both engines round identically.
- Large multi-row double sums: ``round(x, 0)`` — summation order differs
  between engines (error ~1e-5 on 1e9-scale sums), integer rounding keeps the
  flip probability negligible.
- Counts: Spark emits BIGINT; oracle SQL casts DuckDB's HUGEINT sums /
  counts to BIGINT explicitly.
- Any ORDER BY ... LIMIT ends with a unique tiebreak key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = ()
    doc: str = ""
    bench: bool = True  # include in bench.py headline set


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = (), bench: bool = True):
    """Decorator registering a query builder with its DuckDB oracle SQL."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or "", bench=bench
        )
        return fn

    return deco
