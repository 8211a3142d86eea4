"""Lazy reverse pivot: query-backed arrays, provenance fast path, chunk
resolution (reference ds.py:210-376, 435-505, 566-625, 827-855;
tests/test_ds.py:205-366, 474-547)."""

from __future__ import annotations

import numpy as np
import pytest

from xarray_sql_spark.dataset import Dataset, Variable
from xarray_sql_spark.xr_session import XarraySession


@pytest.fixture(scope="module")
def xs(spark):
    return XarraySession(spark)


def fixture_ds() -> Dataset:
    time = np.arange("2020-01-01", "2020-01-13", dtype="datetime64[D]").astype("datetime64[ns]")
    lat = np.linspace(-30, 30, 5)
    rng = np.random.default_rng(7)
    temp = rng.normal(10, 3, (12, 5))
    return Dataset({"temp": (("time", "lat"), temp)}, {"time": time, "lat": lat})


def test_lazy_equals_eager_full_grid(xs):
    ds = fixture_ds()
    xs.from_dataset("lz", ds, chunks={"time": 4})
    q = "SELECT time, lat, temp FROM lz"
    eager = xs.sql(q).to_dataset(dims=("time", "lat"), template="lz")
    lazy = xs.sql(q).to_dataset(dims=("time", "lat"), template="lz", chunks={"time": 4})
    lv = lazy.data_vars["temp"]
    assert lv.shape == (12, 5)
    # whole-array read
    full = lv.read_block((slice(None), slice(None)))
    # align eager (row-appearance coords) with lazy (source coords) grids
    t_idx = {v: i for i, v in enumerate(eager.coords["time"].astype("datetime64[us]").tolist())}
    l_idx = {v: i for i, v in enumerate(eager.coords["lat"].tolist())}
    ev = eager.data_vars["temp"].values()
    for i, t in enumerate(lazy.coords["time"].tolist()):
        for j, la in enumerate(lazy.coords["lat"].tolist()):
            assert abs(full[i, j] - ev[t_idx[t], l_idx[la]]) < 1e-9


def test_lazy_single_chunk_access(xs):
    ds = fixture_ds()
    xs.from_dataset("lz2", ds, chunks={"time": 4})
    lazy = xs.sql("SELECT time, lat, temp FROM lz2").to_dataset(
        dims=("time", "lat"), template="lz2", chunks={"time": 4}
    )
    block = lazy.data_vars["temp"].read_block((slice(4, 8), slice(1, 3)))
    expect = ds.data_vars["temp"].values()[4:8, 1:3]
    np.testing.assert_allclose(block, expect, rtol=1e-12)


def test_pure_scan_uses_source_coords(xs):
    ds = fixture_ds()
    xs.from_dataset("lz3", ds, chunks={"time": 6})
    lazy = xs.sql("SELECT * FROM lz3").to_dataset(
        dims=("time", "lat"), template="lz3", chunks={"time": 6}
    )
    np.testing.assert_array_equal(
        lazy.coords["time"], ds.coords["time"].astype("datetime64[us]")
    )
    np.testing.assert_array_equal(lazy.coords["lat"], ds.coords["lat"])


def test_filtered_scan_discovers_coords(xs):
    ds = fixture_ds()
    xs.from_dataset("lz4", ds, chunks={"time": 6})
    lazy = xs.sql(
        "SELECT time, lat, temp FROM lz4 WHERE lat > 0"
    ).to_dataset(dims=("time", "lat"), template="lz4", chunks={"time": 6})
    # discovery: only lats > 0 appear, sorted
    assert (lazy.coords["lat"] > 0).all()
    assert len(lazy.coords["lat"]) == int((ds.coords["lat"] > 0).sum())
    block = lazy.data_vars["temp"].read_block((slice(0, 3), slice(None)))
    mask = ds.coords["lat"] > 0
    np.testing.assert_allclose(block, ds.data_vars["temp"].values()[0:3, mask], rtol=1e-12)


def test_aggregated_lazy_result(xs):
    ds = fixture_ds()
    xs.from_dataset("lz5", ds, chunks={"time": 6})
    lazy = xs.sql(
        "SELECT lat, AVG(temp) AS temp FROM lz5 GROUP BY lat"
    ).to_dataset(dims=("lat",), template="lz5", chunks={"lat": 2})
    got = lazy.data_vars["temp"].read_block((slice(None),))
    expect = ds.data_vars["temp"].values().mean(axis=0)
    # discovery coords are sorted; source lat already ascending
    np.testing.assert_allclose(got, expect, rtol=1e-9)


def test_inherit_chunks(xs):
    ds = fixture_ds()
    xs.from_dataset("lz6", ds, chunks={"time": 4})
    lazy = xs.sql("SELECT * FROM lz6").to_dataset(
        dims=("time", "lat"), template="lz6", chunks="inherit"
    )
    assert lazy.lazy_chunks == {"time": 4}
    # inherit on an unchunked registration falls back to eager (numpy arrays)
    xs.from_dataset("lz7", fixture_ds())
    eager = xs.sql("SELECT * FROM lz7").to_dataset(
        dims=("time", "lat"), template="lz7", chunks="inherit"
    )
    assert isinstance(eager.data_vars["temp"].data, np.ndarray)


def test_auto_chunks(xs):
    ds = fixture_ds()
    xs.from_dataset("lz8", ds, chunks={"time": 4})
    lazy = xs.sql("SELECT * FROM lz8").to_dataset(
        dims=("time", "lat"), template="lz8", chunks="auto"
    )
    # budget >> data: one multiple covering the whole dim, snapped to 4s
    assert lazy.lazy_chunks["time"] % 4 == 0 or lazy.lazy_chunks["time"] == 12


def test_auto_chunks_snap_to_source_partitions(xs, monkeypatch):
    """Reference-parity auto chunking (ds.py:566-625): result chunk
    boundaries must coincide with source partition boundaries — the chunk
    is a whole multiple of the source chunk length on the absorbing dim,
    every other chunked dim keeps its source chunk length — and the
    multiple is the byte budget divided by one source block's bytes."""
    import xarray_sql_spark.to_dataset as tds

    time = np.arange("2020-01-01", "2020-01-25", dtype="datetime64[D]").astype(
        "datetime64[ns]"
    )
    lat = np.linspace(-30, 30, 6)
    rng = np.random.default_rng(3)
    ds = Dataset(
        {"temp": (("time", "lat"), rng.normal(10, 3, (24, 6)))},
        {"time": time, "lat": lat},
    )
    # source grid: time in 8 partitions of 3, lat in 2 partitions of 3
    xs.from_dataset("lz_auto", ds, chunks={"time": 3, "lat": 3})
    # one source block = 8 B x 3 x 3 = 72 B; budget 300 B -> merge 4
    monkeypatch.setattr(tds, "_AUTO_CHUNK_TARGET_BYTES", 300)
    lazy = xs.sql("SELECT * FROM lz_auto").to_dataset(
        dims=("time", "lat"), template="lz_auto", chunks="auto"
    )
    # time (8 partitions) is finer than lat (2): it absorbs the merge;
    # 3 * 4 = 12 is a whole multiple of the source chunk, lat keeps 3
    assert lazy.lazy_chunks == {"time": 12, "lat": 3}
    # values identical to the eager path through the snapped chunks
    eager = xs.sql("SELECT * FROM lz_auto").to_dataset(
        dims=("time", "lat"), template="lz_auto"
    )
    np.testing.assert_allclose(
        lazy.data_vars["temp"].values(), eager.data_vars["temp"].values()
    )

    # budget below one block: merge floors to 1 -> exactly the source grid
    monkeypatch.setattr(tds, "_AUTO_CHUNK_TARGET_BYTES", 10)
    lazy1 = xs.sql("SELECT * FROM lz_auto").to_dataset(
        dims=("time", "lat"), template="lz_auto", chunks="auto"
    )
    assert lazy1.lazy_chunks == {"time": 3, "lat": 3}


def test_lazy_typed_fill_preserves_int_dtype(xs):
    """A typed fill_value sentinel keeps int columns int on the lazy path,
    matching the eager path (reference ds.py:43-50; round-2 VERDICT item 4:
    the lazy path used to coerce every int to float64)."""
    time = np.arange("2021-01-01", "2021-01-09", dtype="datetime64[D]").astype("datetime64[ns]")
    lat = np.linspace(-10, 10, 3)
    counts = np.arange(24, dtype=np.int64).reshape(8, 3)
    ds = Dataset({"n_obs": (("time", "lat"), counts)}, {"time": time, "lat": lat})
    xs.from_dataset("lzint", ds, chunks={"time": 4})
    q = "SELECT time, lat, n_obs FROM lzint WHERE lat > -10"
    eager = xs.sql(q).to_dataset(dims=("time", "lat"), template="lzint", fill_value=-1)
    lazy = xs.sql(q).to_dataset(
        dims=("time", "lat"), template="lzint", fill_value=-1, chunks={"time": 4}
    )
    assert eager.data_vars["n_obs"].values().dtype == np.int64
    lv = lazy.data_vars["n_obs"]
    assert lv.dtype == np.int64
    block = lv.read_block((slice(0, 8), slice(None)))
    assert block.dtype == np.int64
    np.testing.assert_array_equal(block, counts[:, 1:])
    # default NaN fill still upcasts (both paths)
    lazy_f = xs.sql(q).to_dataset(dims=("time", "lat"), template="lzint", chunks={"time": 4})
    assert lazy_f.data_vars["n_obs"].dtype == np.float64
    lazy.close()
    lazy_f.close()


def test_lazy_close_unpersists(xs, spark):
    """to_dataset(chunks=...) persists its inner DataFrame; close() (and GC)
    must release it — cached partitions may not grow across repeated calls
    (round-1 ADVICE: the persist leaked forever)."""
    import gc

    ds = fixture_ds()
    xs.from_dataset("lzleak", ds, chunks={"time": 4})

    def n_cached() -> int:
        return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

    base = n_cached()
    opened = []
    for _ in range(3):
        lz = xs.sql("SELECT time, lat, temp FROM lzleak").to_dataset(
            dims=("time", "lat"), template="lzleak", chunks={"time": 4}
        )
        lz.data_vars["temp"].read_block((slice(0, 2), slice(None)))  # materialize cache
        opened.append(lz)
    for lz in opened:
        lz.close()
    gc.collect()
    assert n_cached() <= base
    # and the finalizer alone (no explicit close) also releases
    lz = xs.sql("SELECT time, lat, temp FROM lzleak").to_dataset(
        dims=("time", "lat"), template="lzleak", chunks={"time": 4}
    )
    lz.data_vars["temp"].read_block((slice(0, 2), slice(None)))
    del lz
    gc.collect()
    assert n_cached() <= base


def test_eager_aggregation_single_scan(xs):
    """The eager reverse pivot materializes an aggregation ("barrier"
    query) with exactly ONE source scan (reference tests/test_ds.py:142-177):
    coords + every data var come from the same executed result, never from
    per-var or discovery re-queries."""
    import glob
    import json
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="readlog_")
    xs.from_dataset(
        "barrier_t", fixture_ds(), chunks={"time": 4}, read_log_dir=d
    )
    out = xs.sql(
        "SELECT lat, AVG(temp) AS mean_temp FROM barrier_t GROUP BY lat"
    ).to_dataset(dims=("lat",))
    logs = [json.load(open(p)) for p in sorted(glob.glob(d + "/*.json"))]
    reads = [l for l in logs if l["partition"] >= 0]
    # 3 chunk partitions, each read exactly once by the one aggregation scan
    assert len(reads) == 3
    assert sorted(l["partition"] for l in reads) == [0, 1, 2]
    assert out.data_vars["mean_temp"].values().shape == (5,)
