"""Bounded-memory guarantees (reference test layer 6 —
tests/test_df.py:380-476, test_to_dataset_perf.py): the streaming pivot must
hold one batch, not one partition, and the Arrow export must stream."""

from __future__ import annotations

import tracemalloc

import numpy as np
import pandas  # noqa: F401  # pre-import: pyarrow's from_pandas lazily imports
# pandas (~26 MB) on first use, which would otherwise dominate the traced peak.

from xarray_sql_spark.arrow_io import to_arrow_reader
from xarray_sql_spark.dataset import Dataset, Variable
from xarray_sql_spark.pivot import infer_schema, iter_record_batches

# 4M cells x (2 coord cols + 1 var col) x 8 B would be ~100 MB if the pivot
# materialized whole; streaming in 64Ki batches must stay far below that.
NT, NY = 4000, 1000
FULL_PIVOT_BYTES = NT * NY * 3 * 8


def _grid():
    t = np.arange(NT, dtype=np.int64)
    y = np.arange(NY, dtype=np.float64)
    v = np.zeros((NT, NY), dtype=np.float64)
    return t, y, v


def test_pivot_streams_bounded():
    t, y, v = _grid()

    class Var:
        dims = ("t", "y")
        dtype = v.dtype

    schema = infer_schema(("t", "y"), {"t": t, "y": y}, {"v": Var()})
    tracemalloc.start()
    tracemalloc.reset_peak()
    n = 0
    for b in iter_record_batches(("t", "y"), {"t": t, "y": y}, {"v": v}, schema, 65536):
        n += len(b)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert n == NT * NY
    # a handful of 64Ki-row batches' worth, not the 100 MB full pivot
    assert peak < FULL_PIVOT_BYTES / 4, f"peak {peak/1e6:.1f} MB"


def test_arrow_reader_streams_bounded():
    t, y, v = _grid()
    ds = Dataset({"v": Variable(("t", "y"), v)}, {"t": t, "y": y})
    reader = to_arrow_reader(ds, chunks={"t": 500}, batch_size=65536)
    tracemalloc.start()
    tracemalloc.reset_peak()
    n = 0
    for b in reader:
        n += len(b)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert n == NT * NY
    assert peak < FULL_PIVOT_BYTES / 4, f"peak {peak/1e6:.1f} MB"
