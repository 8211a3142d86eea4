"""Forward pivot semantics (reference tests/test_df.py:138-244)."""

import numpy as np
import pyarrow as pa

from xarray_sql_spark.pivot import arrow_type_for, infer_schema, iter_record_batches


def _fixture():
    t = np.arange("2020-01-01", "2020-01-05", dtype="datetime64[D]").astype("datetime64[ns]")
    y = np.array([10.0, 20.0, 30.0], dtype=np.float64)
    data = np.arange(12, dtype=np.float32).reshape(4, 3)
    coords = {"t": t, "y": y}
    dims = ("t", "y")

    class V:
        dtype = data.dtype

    schema = infer_schema(dims, coords, {"v": V()})
    return dims, coords, {"v": data}, schema


def test_schema_order_dims_first():
    dims, coords, arrays, schema = _fixture()
    assert schema.names == ["t", "y", "v"]
    assert schema.field("t").type == pa.timestamp("us")
    assert schema.field("v").type == pa.float32()


def test_row_count_and_c_order():
    dims, coords, arrays, schema = _fixture()
    batches = list(iter_record_batches(dims, coords, arrays, schema, batch_size=1000))
    tbl = pa.Table.from_batches(batches)
    assert tbl.num_rows == 12
    # C order: y varies fastest.
    assert tbl.column("y").to_pylist()[:4] == [10.0, 20.0, 30.0, 10.0]
    assert tbl.column("v").to_pylist() == list(range(12))


def test_batch_size_equivalence():
    dims, coords, arrays, schema = _fixture()
    whole = pa.Table.from_batches(
        list(iter_record_batches(dims, coords, arrays, schema, batch_size=10_000))
    )
    batched = pa.Table.from_batches(
        list(iter_record_batches(dims, coords, arrays, schema, batch_size=5))
    )
    assert whole.equals(batched)
    assert max(b.num_rows for b in iter_record_batches(dims, coords, arrays, schema, 5)) <= 5


def test_nan_becomes_null():
    y = np.array([0.0, 1.0])
    data = np.array([[1.0, np.nan], [3.0, 4.0]])
    dims = ("x", "y")
    coords = {"x": np.array([0, 1], dtype=np.int64), "y": y}

    class V:
        dtype = data.dtype

    schema = infer_schema(dims, coords, {"v": V()})
    tbl = pa.Table.from_batches(list(iter_record_batches(dims, coords, {"v": data}, schema)))
    assert tbl.column("v").null_count == 1
    assert tbl.column("v").to_pylist() == [1.0, None, 3.0, 4.0]


def test_string_coord_supported():
    assert arrow_type_for(np.dtype("<U5")) == pa.string()
    names = np.array(["a", "b"], dtype=object)
    data = np.array([1.5, 2.5])
    dims = ("s",)

    class V:
        dtype = data.dtype

    schema = infer_schema(dims, {"s": names}, {"v": V()})
    tbl = pa.Table.from_batches(list(iter_record_batches(dims, {"s": names}, {"v": data}, schema)))
    assert tbl.column("s").to_pylist() == ["a", "b"]
