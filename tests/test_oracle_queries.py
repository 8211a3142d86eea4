"""Every registered query must match its DuckDB oracle at sf0.01 — the local
twin of the driver's correctness gate."""

from __future__ import annotations

import pytest

from xarray_sql_spark.queries import REGISTRY
from tests.oracle_harness import compare
from tests.conftest import SF_MED

ORACLED = [name for name, spec in REGISTRY.items() if spec.oracle is not None]
ROWS_ONLY = [name for name, spec in REGISTRY.items() if spec.oracle is None]


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_MED)
    compare(df, spec.oracle, SF_MED)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_MED)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_contract(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 20


def test_priority_window_is_exactly_50_and_short_keys_unique():
    """The driver hashes only the FIRST 50 registry entries, and bench.py's
    archived-tail 'qc' map keys every benched query by its short prefix —
    both contracts break silently if a rename collides or the window
    over/underfills."""
    import xarray_sql_spark.queries as q

    assert len(q._PRIORITY) == 50
    assert len(set(q._PRIORITY)) == 50
    window = list(REGISTRY)[:50]
    assert window == [n for n in q._PRIORITY if n in REGISTRY]
    benched = [n for n, s in REGISTRY.items() if s.bench]
    prefixes = [n.split("_")[0] for n in benched]
    assert len(prefixes) == len(set(prefixes))
