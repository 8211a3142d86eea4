"""Reference-parity public API (reference xarray_sql/__init__.py:1-12).

A reference user must be able to switch imports 1:1: every name in the
reference's ``__all__`` has a working twin at our top level, and the compat
entry points actually execute (register a table, run a query, map a
function) — not just import.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


REFERENCE_ALL = ["cftime", "XarrayContext", "read_xarray_table", "read_xarray", "from_map"]


def test_reference_names_all_present():
    import xarray_sql_spark as xqs

    for name in REFERENCE_ALL:
        assert hasattr(xqs, name), f"missing reference-parity export {name}"
        assert name in xqs.__all__


def test_xarray_context_alias_is_session():
    import xarray_sql_spark as xqs

    assert xqs.XarrayContext is xqs.XarraySession


def _small_ds():
    import xarray_sql_spark as xqs

    y = np.arange(4, dtype=np.int64)
    x = np.arange(3, dtype=np.int64)
    v = y[:, None] * 1.0 + x[None, :] * 0.25
    return xqs.Dataset(
        {"v": xqs.Variable(("y", "x"), v)}, {"y": y, "x": x}
    )


def test_read_xarray_table_registers_lazy_queryable(spark):
    import xarray_sql_spark as xqs

    df = xqs.read_xarray_table(spark, _small_ds(), chunks={"y": 2}, name="api_t")
    assert sorted(df.columns) == ["v", "x", "y"]
    assert df.count() == 12
    # re-queryable through SQL under the registered name
    got = spark.sql("SELECT SUM(v) AS s FROM api_t WHERE y >= 2").collect()[0]["s"]
    assert got == pytest.approx((2.0 + 3.0) * 3 + 0.75 * 2)


def test_read_xarray_eager_dataframe(spark):
    import xarray_sql_spark as xqs

    df = xqs.read_xarray(spark, _small_ds())
    assert df.count() == 12
    assert {r["v"] for r in df.filter("y = 0").collect()} == {0.0, 0.25, 0.5}


def test_to_arrow_reader_stream():
    import xarray_sql_spark as xqs

    reader = xqs.to_arrow_reader(_small_ds(), chunks={"y": 2})
    table = reader.read_all()
    assert table.num_rows == 12
    assert sorted(table.column_names) == ["v", "x", "y"]


def test_from_map_local_and_batched():
    import xarray_sql_spark as xqs

    def make(i):
        return pd.DataFrame({"i": [i], "sq": [i * i]})

    t = xqs.from_map(make, range(5))
    assert t.num_rows == 5
    assert t.column("sq").to_pylist() == [0, 1, 4, 9, 16]

    import pyarrow as pa

    schema = pa.schema([("i", pa.int64()), ("sq", pa.int64())])
    r = xqs.from_map_batched(make, range(3), schema=schema)
    assert r.read_all().num_rows == 3


def test_from_map_spark_distributed(spark):
    import xarray_sql_spark as xqs

    def make(i):
        return pd.DataFrame({"i": [i], "sq": [i * i]})

    df = xqs.from_map_spark(spark, make, range(8))
    rows = {r["i"]: r["sq"] for r in df.collect()}
    assert rows == {i: i * i for i in range(8)}


def test_cftime_module_exported():
    import xarray_sql_spark as xqs

    assert hasattr(xqs.cftime, "decode_to_timestamps")


def test_context_no_args_attaches_to_active_session(spark):
    import xarray_sql_spark as xqs

    ctx = xqs.XarrayContext()  # reference spelling: no engine handle
    assert ctx.spark is spark
    ctx.from_dataset("api_noarg", _small_ds(), chunks={"y": 2})
    out = ctx.sql("SELECT COUNT(*) AS n FROM api_noarg")
    assert out.to_pandas()["n"][0] == 12


def test_from_map_batched_infers_schema():
    """schema=None must work (the reference-parity default): the first
    element is mapped eagerly to infer it, the rest stay lazy."""
    import xarray_sql_spark as xqs

    calls = []

    def make(i):
        calls.append(i)
        return pd.DataFrame({"i": [i]})

    r = xqs.from_map_batched(make, range(4))
    assert calls == [0]  # only the probe ran so far
    assert r.read_all().num_rows == 4
    assert calls == [0, 1, 2, 3]

    with pytest.raises(ValueError):
        xqs.from_map_batched(make, [])


def test_from_map_spark_rejects_unmappable_dtype(spark):
    import xarray_sql_spark as xqs

    def make(i):
        return pd.DataFrame({"c": pd.Series([complex(i, 1)], dtype="complex128")})

    with pytest.raises(NotImplementedError):
        xqs.from_map_spark(spark, make, range(2))
