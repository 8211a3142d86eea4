"""Streaming grid source: micro-batches over a store growing along time.

The Zarr append commit protocol (chunks first, shape metadata last) makes
the metadata shape the stream's high-water mark; these tests pin the
offset semantics (earliest/latest), exactly-once delivery across restarts
from the checkpoint, and value fidelity vs the batch reader.
"""

import os

import numpy as np
import pytest

from xarray_sql_spark.dataset import Dataset
from xarray_sql_spark.sources.grid_source import read_grid_stream
from xarray_sql_spark.zarr_store import append_zarr, open_zarr, write_zarr


def _slab(t0: int, nt: int, nlat: int = 5):
    time = np.datetime64("2024-01-01", "h") + np.arange(t0, t0 + nt)
    lat = np.linspace(-60.0, 60.0, nlat)
    temp = ((np.arange(t0 * nlat, (t0 + nt) * nlat, dtype=np.float32)) % 89).reshape(
        nt, nlat
    )
    return Dataset({"temp": (("time", "lat"), temp)}, {"time": time, "lat": lat})


def _run(stream_df, out_dir: str, ckpt: str) -> None:
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)


def test_append_zarr_roundtrip(tmp_path):
    path = write_zarr(_slab(0, 8), str(tmp_path / "g.zarr"), chunks={"time": 4})
    append_zarr(_slab(8, 6), path, "time")
    back = open_zarr(path)
    full = _slab(0, 14)
    np.testing.assert_array_equal(back.coords["time"], full.coords["time"])
    np.testing.assert_allclose(back.data_vars["temp"].values(), full.data_vars["temp"].values())


def test_append_zarr_foreign_store_f_order_nested_keys(tmp_path):
    """Append to a store written by another tool: v2 metadata declaring
    ``order: "F"`` and ``dimension_separator: "/"``. The appended chunk
    bytes must honor the declared order (readers reshape with it) and the
    nested chunk-key directories must be created."""
    import json

    path = str(tmp_path / "ext.zarr")
    t0 = np.datetime64("2024-01-01", "h") + np.arange(4)
    lat = np.linspace(-30.0, 30.0, 3)
    temp0 = np.arange(12, dtype="<f8").reshape(4, 3)
    for name in ("time", "lat", "temp"):
        os.makedirs(os.path.join(path, name))
    with open(os.path.join(path, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)

    def _arr(name, arr, dims, order="C", sep="."):
        meta = {
            "zarr_format": 2,
            "shape": list(arr.shape),
            "chunks": list(arr.shape),
            "dtype": arr.dtype.str,
            "compressor": None,
            "fill_value": 0,
            "order": order,
            "filters": None,
        }
        if sep != ".":
            meta["dimension_separator"] = sep
        with open(os.path.join(path, name, ".zarray"), "w") as f:
            json.dump(meta, f)
        with open(os.path.join(path, name, ".zattrs"), "w") as f:
            json.dump({"_ARRAY_DIMENSIONS": list(dims)}, f)
        key = sep.join("0" for _ in arr.shape)
        fname = os.path.join(path, name, key)
        os.makedirs(os.path.dirname(fname), exist_ok=True)
        with open(fname, "wb") as f:
            f.write(arr.tobytes(order=order))

    _arr("time", t0.astype("<M8[h]"), ("time",))
    _arr("lat", lat.astype("<f8"), ("lat",))
    _arr("temp", temp0, ("time", "lat"), order="F", sep="/")

    slab = Dataset(
        {"temp": (("time", "lat"), np.arange(12, 24, dtype=np.float64).reshape(4, 3))},
        {"time": t0 + 4, "lat": lat},
    )
    append_zarr(slab, path, "time")
    assert os.path.isfile(os.path.join(path, "temp", "1", "0"))  # nested key
    back = open_zarr(path)
    np.testing.assert_array_equal(
        back.data_vars["temp"].values(), np.arange(24, dtype=np.float64).reshape(8, 3)
    )


def test_append_requires_chunk_alignment(tmp_path):
    path = write_zarr(_slab(0, 6), str(tmp_path / "g.zarr"), chunks={"time": 4})
    with pytest.raises(NotImplementedError, match="multiple"):
        append_zarr(_slab(6, 4), path, "time")


def test_append_requires_alignment_per_array(tmp_path):
    """The coord's chunking alone must not green-light an append: a store
    whose coord is one full-length chunk (what the distributed sink
    writes) passes the coord guard for ANY length, while a data var
    chunked smaller can still be misaligned — appending would overwrite
    its committed trailing chunk with zero-padded data at the wrong
    offset. The guard must check each appended array's own chunks."""
    import glob
    import json

    path = str(tmp_path / "sink.zarr")
    t0 = np.datetime64("2024-01-01", "h") + np.arange(6)
    lat = np.linspace(-30.0, 30.0, 3)
    temp0 = np.arange(18, dtype="<f8").reshape(6, 3)
    os.makedirs(path)
    with open(os.path.join(path, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)

    def _arr(name, arr, dims, chunks):
        adir = os.path.join(path, name)
        os.makedirs(adir)
        with open(os.path.join(adir, ".zarray"), "w") as f:
            json.dump(
                {
                    "zarr_format": 2,
                    "shape": list(arr.shape),
                    "chunks": list(chunks),
                    "dtype": arr.dtype.str,
                    "compressor": None,
                    "fill_value": 0,
                    "order": "C",
                    "filters": None,
                },
                f,
            )
        with open(os.path.join(adir, ".zattrs"), "w") as f:
            json.dump({"_ARRAY_DIMENSIONS": list(dims)}, f)
        import itertools as it

        grid = [range((n + c - 1) // c) for n, c in zip(arr.shape, chunks)]
        for idx in it.product(*grid):
            sel = tuple(
                slice(i * c, min((i + 1) * c, n))
                for i, c, n in zip(idx, chunks, arr.shape)
            )
            block = np.zeros(chunks, dtype=arr.dtype)
            block[tuple(slice(0, s.stop - s.start) for s in sel)] = arr[sel]
            with open(os.path.join(adir, ".".join(map(str, idx))), "wb") as f:
                f.write(block.tobytes())

    # coord = ONE full-length chunk (6 % 6 == 0 for any committed length);
    # var chunked 4 along time: 6 % 4 != 0 -> append must refuse
    _arr("time", t0.astype("<M8[h]"), ("time",), (6,))
    _arr("lat", lat.astype("<f8"), ("lat",), (3,))
    _arr("temp", temp0, ("time", "lat"), (4, 3))

    slab = Dataset(
        {"temp": (("time", "lat"), np.arange(18, 30, dtype=np.float64).reshape(4, 3))},
        {"time": t0[:4] + 6, "lat": lat},
    )
    before = sorted(glob.glob(os.path.join(path, "*", "*")))
    with pytest.raises(NotImplementedError, match="temp"):
        append_zarr(slab, path, "time")
    # nothing was written, not even the (aligned) coord's chunks
    assert sorted(glob.glob(os.path.join(path, "*", "*"))) == before


def test_append_refuses_filtered_arrays(tmp_path):
    """Appending to an array whose metadata declares a numcodecs filter
    chain must refuse BEFORE writing anything: the appended chunks would
    be unfiltered bytes under filter-declaring metadata — silent
    corruption on read."""
    import glob
    import json

    path = write_zarr(_slab(0, 8), str(tmp_path / "g.zarr"), chunks={"time": 4})
    meta_path = os.path.join(path, "temp", ".zarray")
    meta = json.load(open(meta_path))
    meta["filters"] = [{"id": "delta", "dtype": "<f4", "astype": "<f4"}]
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    before = sorted(glob.glob(os.path.join(path, "*", "*")))
    with pytest.raises(NotImplementedError, match="filtered"):
        append_zarr(_slab(8, 4), path, "time")
    # nothing at all was written — not even the unfiltered coord's chunks
    assert sorted(glob.glob(os.path.join(path, "*", "*"))) == before


def test_stream_over_cf_encoded_store(spark, tmp_path):
    """The streaming source re-opens the store each micro-batch, so the
    CF decode (round 6) must hold there too: a store whose time coord is
    int32 'hours since' yields TIMESTAMP rows in the stream, and an
    appended slab keeps decoding after the high-water mark moves."""
    import json

    path = str(tmp_path / "cfs.zarr")
    os.makedirs(os.path.join(path, "time"))
    os.makedirs(os.path.join(path, "temp"))
    with open(os.path.join(path, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)

    def _arr(name, a, dims, attrs, chunk):
        with open(os.path.join(path, name, ".zarray"), "w") as f:
            json.dump({"zarr_format": 2, "shape": list(a.shape),
                       "chunks": [chunk], "dtype": a.dtype.str,
                       "compressor": None, "fill_value": 0, "order": "C",
                       "filters": None}, f)
        with open(os.path.join(path, name, ".zattrs"), "w") as f:
            json.dump({"_ARRAY_DIMENSIONS": list(dims), **attrs}, f)
        for ci in range(-(-len(a) // chunk)):
            block = np.zeros(chunk, dtype=a.dtype)
            seg = a[ci * chunk : (ci + 1) * chunk]
            block[: len(seg)] = seg
            with open(os.path.join(path, name, str(ci)), "wb") as f:
                f.write(block.tobytes())

    t = np.arange(8, dtype="<i4")
    _arr("time", t, ("time",),
         {"units": "hours since 2020-06-01", "calendar": "standard"}, 4)
    _arr("temp", np.arange(8, dtype="<f8"), ("time",), {}, 4)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = read_grid_stream(spark, path, chunks={"time": 4}, payload_dir=str(tmp_path))
    _run(stream, out, ckpt)
    got = spark.read.parquet(out)
    assert dict(got.dtypes)["time"].startswith("timestamp")
    rows = sorted((str(r.time), r.temp) for r in got.collect())
    assert rows[0] == ("2020-06-01 00:00:00", 0.0)
    assert len(rows) == 8

    # append in the RAW encoded domain; the stream must pick up the new
    # chunk and decode its coords identically
    slab = Dataset(
        {"temp": (("time",), np.arange(8, 12, dtype=np.float64))},
        {"time": np.arange(8, 12, dtype=np.int32)},
    )
    append_zarr(slab, path, "time")
    _run(read_grid_stream(spark, path, chunks={"time": 4}, payload_dir=str(tmp_path)), out, ckpt)
    rows = sorted((str(r.time), r.temp) for r in spark.read.parquet(out).collect())
    assert len(rows) == 12
    assert rows[-1] == ("2020-06-01 11:00:00", 11.0)


def test_stream_tails_appends_exactly_once(spark, tmp_path):
    path = write_zarr(_slab(0, 8), str(tmp_path / "g.zarr"), chunks={"time": 4})
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    stream = read_grid_stream(spark, path, chunks={"time": 4}, payload_dir=str(tmp_path))
    _run(stream, out, ckpt)
    assert spark.read.parquet(out).count() == 8 * 5  # full history replayed

    # append 6 steps; a restarted query picks up ONLY the new slab
    append_zarr(_slab(8, 6), path, "time")
    stream = read_grid_stream(spark, path, chunks={"time": 4}, payload_dir=str(tmp_path))
    _run(stream, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == 14 * 5

    # no new data -> restart emits nothing (offsets from the checkpoint)
    stream = read_grid_stream(spark, path, chunks={"time": 4}, payload_dir=str(tmp_path))
    _run(stream, out, ckpt)
    assert spark.read.parquet(out).count() == 14 * 5

    # value fidelity vs the dataset itself
    full = _slab(0, 14)
    pdf = got.toPandas().sort_values(["time", "lat"]).reset_index(drop=True)
    np.testing.assert_allclose(
        pdf["temp"].to_numpy().reshape(14, 5),
        full.data_vars["temp"].values(),
    )


def test_stream_start_latest_skips_history(spark, tmp_path):
    path = write_zarr(_slab(0, 8), str(tmp_path / "g.zarr"), chunks={"time": 4})
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = read_grid_stream(
        spark, path, chunks={"time": 4}, start="latest", payload_dir=str(tmp_path)
    )
    _run(stream, out, ckpt)
    assert not os.path.exists(out) or spark.read.parquet(out).count() == 0

    append_zarr(_slab(8, 4), path, "time")
    stream = read_grid_stream(
        spark, path, chunks={"time": 4}, start="latest", payload_dir=str(tmp_path)
    )
    _run(stream, out, ckpt)
    assert spark.read.parquet(out).count() == 4 * 5


def test_stream_windowed_agg_carries_state_across_appends(spark, tmp_path):
    """The composition the streaming source exists for: readStream over
    the growing store -> event-time windowed aggregation, with the agg
    state checkpointed so a restart after an append UPDATES the affected
    windows instead of recounting history. Results equal the numpy truth
    over the full store after each run."""
    import pyspark.sql.functions as F

    path = write_zarr(_slab(0, 8), str(tmp_path / "g.zarr"), chunks={"time": 4})
    ckpt = str(tmp_path / "ckpt")

    def _run_agg():
        stream = read_grid_stream(
            spark, path, chunks={"time": 4}, payload_dir=str(tmp_path)
        )
        agg = stream.groupBy(F.window("time", "4 hours")).agg(
            F.sum("temp").alias("s"), F.count("*").alias("n")
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("gsw")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)
        rows = spark.sql("SELECT window.start AS w, s, n FROM gsw").collect()
        return {r.w.hour: (r.s, r.n) for r in rows}

    def _expect(nt):
        temp = _slab(0, nt).data_vars["temp"].values()
        return {
            4 * g: (float(temp[4 * g : 4 * (g + 1)].sum()), temp[4 * g : 4 * (g + 1)].size)
            for g in range((nt + 3) // 4)
        }

    got = _run_agg()
    assert got == _expect(8)  # two complete 4h windows

    # the append lands a slab that CLOSES window [8,12) and OPENS [12,16)
    append_zarr(_slab(8, 6), path, "time")
    got = _run_agg()
    assert got == _expect(14)  # prior windows intact, new ones correct


def test_stream_surfaces_partition_read_errors(spark, tmp_path):
    """A corrupt chunk file must FAIL the micro-batch with the reader's
    error surfaced through the streaming query — never silently yield
    fill values for data that exists but cannot be decoded. (Streaming
    twin of the batch error-propagation golden in test_grid_engine.)"""
    path = write_zarr(
        _slab(0, 8), str(tmp_path / "g.zarr"), chunks={"time": 4},
        compressor={"id": "zlib", "level": 1},
    )
    with open(os.path.join(path, "temp", "1.0"), "wb") as f:
        f.write(b"\x00garbage\x00")
    stream = read_grid_stream(spark, path, chunks={"time": 4}, payload_dir=str(tmp_path))
    q = (
        stream.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception) as ei:
        q.awaitTermination(240)
    # the DECODE failure must be what surfaced (any generic failure
    # mentioning 'error' would green-light a broken read path)
    assert "decompress" in str(ei.value).lower() or "zlib" in str(ei.value).lower()


def test_stream_to_zarr_regions_exactly_once(spark, tmp_path):
    """Streaming grid INGESTION (the source's complement): slab files
    arrive one per trigger, each lands as a chunk-aligned region
    overwrite; the final store equals the batch ground truth, and
    replaying the whole stream with a fresh checkpoint rewrites
    byte-identical chunks (the idempotence that makes foreachBatch
    exactly-once)."""
    import glob
    import os

    import numpy as np

    from xarray_sql_spark.dataset import Dataset, Variable
    from xarray_sql_spark.streaming.grid_sink import stream_to_zarr_regions
    from xarray_sql_spark.zarr_store import open_zarr, write_zarr

    t = np.arange(32, dtype=np.int64)
    y = np.arange(4, dtype=np.int64)
    want = t[:, None] * 0.5 + y[None, :] * 2.0
    path = str(tmp_path / "ingest.zarr")
    # pre-allocated axis, zero-filled payload: ingestion fills it in
    write_zarr(
        Dataset({"v": Variable(("t", "y"), np.zeros_like(want))}, {"t": t, "y": y}),
        path, chunks={"t": 8},
    )

    # one slab file per chunk (8 t-values x 4 y), arriving one per trigger
    src = str(tmp_path / "slabs")
    os.makedirs(src)
    rows = [
        (int(ti), int(yi), float(want[ti, yi])) for ti in t for yi in y
    ]
    for ci in range(4):
        slab = [r for r in rows if ci * 8 <= r[0] < (ci + 1) * 8]
        spark.createDataFrame(slab, "t long, y long, v double").coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(src, f"slab_{ci}"))

    def run(checkpoint: str) -> None:
        stream = (
            spark.readStream.schema("t long, y long, v double")
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(src, "slab_*"))
        )
        q = stream_to_zarr_regions(stream, path, "t", checkpoint)
        q.awaitTermination(120)

    run(str(tmp_path / "ckpt1"))
    back = open_zarr(path).data_vars["v"].values()
    np.testing.assert_allclose(back, want)

    chunk_bytes = {
        f: open(f, "rb").read() for f in glob.glob(os.path.join(path, "v", "*"))
        if not f.endswith((".zarray", ".zattrs"))
    }
    # full replay (fresh checkpoint) = the retry worst case: byte-identical
    run(str(tmp_path / "ckpt2"))
    for f, before in chunk_bytes.items():
        assert open(f, "rb").read() == before
    np.testing.assert_allclose(open_zarr(path).data_vars["v"].values(), want)


def test_stream_to_zarr_rejects_sparse_batches(spark, tmp_path):
    """A micro-batch with a gap inside its chunk-aligned span would zap a
    neighbour batch's cells to fill on rewrite — the density gate must
    fail the batch, not write."""
    import numpy as np

    from xarray_sql_spark.dataset import Dataset, Variable
    from xarray_sql_spark.streaming.grid_sink import stream_to_zarr_regions
    from xarray_sql_spark.zarr_store import open_zarr, write_zarr

    t = np.arange(16, dtype=np.int64)
    y = np.arange(2, dtype=np.int64)
    seed = np.ones((16, 2))
    path = str(tmp_path / "gap.zarr")
    write_zarr(Dataset({"v": Variable(("t", "y"), seed)}, {"t": t, "y": y}),
               path, chunks={"t": 8})

    src = str(tmp_path / "gapslabs")
    # one file whose rows span [0,16) but skip t in [8,12): aligned span,
    # interior gap
    rows = [
        (int(ti), int(yi), 5.0) for ti in t for yi in y
        if not (8 <= ti < 12)
    ]
    spark.createDataFrame(rows, "t long, y long, v double").coalesce(
        1
    ).write.parquet(src)
    stream = (
        spark.readStream.schema("t long, y long, v double").parquet(src)
    )
    q = stream_to_zarr_regions(stream, path, "t", str(tmp_path / "ck"))
    import pyspark.errors

    with pytest.raises(pyspark.errors.exceptions.base.PySparkException):
        q.awaitTermination(120)
        q.processAllAvailable()
    # nothing was written: the store still holds the seed values
    back = open_zarr(path).data_vars["v"].values()
    np.testing.assert_allclose(back, seed)


def test_append_rejects_mismatched_non_append_dim(tmp_path):
    """A slab whose non-append dimension is shorter than the store's must
    be REFUSED — zero-padding it would commit fabricated values inside
    the valid shape (round-7 review repro)."""
    import pytest

    path = write_zarr(_slab(0, 4), str(tmp_path / "g.zarr"), chunks={"time": 2})
    bad = _slab(4, 2, nlat=3)  # store has nlat=5
    with pytest.raises(ValueError, match="does not match the store"):
        append_zarr(bad, path, "time")
    # store unchanged and still openable
    back = open_zarr(path)
    assert back.data_vars["temp"].shape == (4, 5)


def test_append_rejects_partial_slab(tmp_path):
    """A slab missing one of the store's append-dim arrays must be
    REFUSED — committing it would leave conflicting sizes along the dim
    and the store could never be opened again (round-7 review repro)."""
    import pytest

    time = np.datetime64("2024-01-01", "h") + np.arange(4)
    ds = Dataset(
        {"a": (("time",), np.arange(4.0)), "b": (("time",), np.arange(4.0))},
        {"time": time},
    )
    path = write_zarr(ds, str(tmp_path / "ab.zarr"), chunks={"time": 2})
    slab = Dataset(
        {"a": (("time",), np.arange(2.0))},
        {"time": np.datetime64("2024-01-01", "h") + np.arange(4, 6)},
    )
    with pytest.raises(ValueError, match="missing from the slab"):
        append_zarr(slab, path, "time")
    back = open_zarr(path)  # still opens, sizes consistent
    assert back.data_vars["b"].shape == (4,)


def test_big_endian_datetime_fill_is_nat(tmp_path):
    """A big-endian datetime array's int NaT-sentinel fill must decode to
    NaT, not epoch+128ns (byte-order .view bug, round-7 review repro)."""
    import json
    import os

    path = str(tmp_path / "be.zarr")
    os.makedirs(os.path.join(path, "t"))
    meta = {
        "zarr_format": 2, "shape": [4], "chunks": [4], "dtype": ">M8[ns]",
        "compressor": None, "fill_value": -9223372036854775808,
        "order": "C", "filters": None,
    }
    with open(os.path.join(path, "t", ".zarray"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(path, "t", ".zattrs"), "w") as f:
        json.dump({"_ARRAY_DIMENSIONS": ["t"]}, f)
    with open(os.path.join(path, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)
    back = open_zarr(path)
    vals = back.coords["t"] if "t" in back.coords else back.data_vars["t"].values()
    assert np.isnat(np.asarray(vals)).all()


def test_array_valued_missing_value_masks_all_sentinels(tmp_path):
    """CF-legal array-valued missing_value must mask EVERY listed
    sentinel instead of crashing the block read (round-7 review repro)."""
    import json
    import os

    ds = Dataset(
        {"v": (("x",), np.array([1, 9999, -9999, 4], dtype=np.int16))},
        {"x": np.arange(4)},
    )
    path = write_zarr(ds, str(tmp_path / "mv.zarr"), chunks={"x": 4})
    zattrs_path = os.path.join(path, "v", ".zattrs")
    za = json.load(open(zattrs_path))
    za["missing_value"] = [9999, -9999]
    json.dump(za, open(zattrs_path, "w"))
    # refresh consolidated metadata copy if present
    zm = os.path.join(path, ".zmetadata")
    if os.path.isfile(zm):
        m = json.load(open(zm))
        m["metadata"]["v/.zattrs"] = za
        json.dump(m, open(zm, "w"))
    back = open_zarr(path, decode_cf=True)
    vals = back.data_vars["v"].values()
    assert np.isnan(vals[1]) and np.isnan(vals[2])
    assert vals[0] == 1.0 and vals[3] == 4.0
