"""Blosc / zstd / lz4 chunk codecs (pure-Python framing over pyarrow).

The c-blosc 1.x chunk format is handcrafted in `test_blosc_decode_handcrafted`
independently of our encoder, so the decoder is pinned to the public spec
(c-blosc README_CHUNK_FORMAT.rst), not to our own writer.
"""

import os

import numpy as np
import pytest

from xarray_sql_spark.zarr_codecs import (
    blosc_compress,
    blosc_decompress,
    lz4_numcodecs_compress,
    lz4_numcodecs_decompress,
    zstd_compress,
    zstd_decompress,
)
from xarray_sql_spark.zarr_store import open_zarr, write_zarr


# --- framing-level ----------------------------------------------------------


@pytest.mark.parametrize("cname", ["lz4", "zstd", "snappy", "zlib"])
@pytest.mark.parametrize("shuffle", [0, 1])
def test_blosc_roundtrip(cname, shuffle):
    data = np.arange(1000, dtype="<f8").tobytes()
    chunk = blosc_compress(data, typesize=8, cname=cname, shuffle=shuffle)
    assert len(chunk) < len(data)  # monotone data compresses
    assert blosc_decompress(chunk) == data


def test_blosc_multiblock_roundtrip():
    rng = np.random.default_rng(7)
    # repetitive but multi-block: 64 KiB with 1 KiB blocks -> 64 blocks
    data = np.tile(rng.integers(0, 50, 256).astype("<i4"), 64).tobytes()
    chunk = blosc_compress(data, typesize=4, cname="lz4", shuffle=1, blocksize=1024)
    assert int.from_bytes(chunk[8:12], "little") == 1024  # blocksize recorded
    assert blosc_decompress(chunk) == data


def test_blosc_incompressible_memcpy_fallback():
    rng = np.random.default_rng(0)
    data = rng.bytes(4096)
    chunk = blosc_compress(data, typesize=1, cname="lz4", shuffle=0)
    assert chunk[2] & 0x2  # MEMCPYED flag
    assert len(chunk) == 16 + len(data)
    assert blosc_decompress(chunk) == data


def test_blosc_decode_handcrafted():
    """Hand-build a 2-block chunk straight from the c-blosc spec: header,
    absolute uint32 block offsets, per-block u32 csize, block 0 lz4-block
    compressed, block 1 stored raw (csize == uncompressed size), both
    byte-shuffled with typesize 4."""
    import pyarrow as pa

    vals = np.arange(8, dtype="<u4")  # 32 bytes, blocksize 16 -> 2 blocks
    raw = vals.tobytes()
    typesize, blocksize, nbytes = 4, 16, len(raw)

    def shuf(b):
        return (
            np.frombuffer(b, np.uint8).reshape(-1, typesize).T.reshape(-1).tobytes()
        )

    b0 = shuf(raw[:16])
    b1 = shuf(raw[16:])
    c0 = bytes(pa.Codec("lz4_raw").compress(b0))
    assert len(c0) != len(b0), "need a genuinely compressed block for this vector"
    blocks = (
        len(c0).to_bytes(4, "little") + c0,  # compressed block
        len(b1).to_bytes(4, "little") + b1,  # raw-stored block
    )
    start0 = 16 + 4 * 2
    start1 = start0 + len(blocks[0])
    body = np.array([start0, start1], dtype="<u4").tobytes() + blocks[0] + blocks[1]
    cbytes = 16 + len(body)
    flags = (1 << 5) | 0x1  # codec id 1 = lz4, byte-shuffle
    header = (
        bytes([2, 1, flags, typesize])
        + nbytes.to_bytes(4, "little")
        + blocksize.to_bytes(4, "little")
        + cbytes.to_bytes(4, "little")
    )
    assert blosc_decompress(header + body) == raw


def test_blosc_decode_handcrafted_split_streams():
    """Hand-build a SPLIT chunk: c-blosc's default FORWARD_COMPAT mode
    stores each non-leftover lz4 block as ``typesize`` independent
    byte-plane streams (each ``csize(u32) + payload``) when header flag
    bit 4 is clear, typesize <= 16 and blocksize/typesize >= 128 — the
    layout numcodecs' default ``blosc(cname='lz4', shuffle=1)`` writes
    for any realistic chunk. Built independently of our encoder."""
    import pyarrow as pa

    typesize = 4
    vals = np.arange(600, dtype="<u4")  # 2400 bytes
    raw = vals.tobytes()
    nbytes = len(raw)
    blocksize = 2048  # 2048/4 = 512 >= 128 -> block 0 splits; block 1 leftover
    shuffled0 = (
        np.frombuffer(raw[:blocksize], np.uint8).reshape(-1, typesize).T
    )  # 4 byte planes x 512
    streams = []
    for plane in shuffled0:  # one compressed stream per byte plane
        c = bytes(pa.Codec("lz4_raw").compress(plane.tobytes()))
        if len(c) >= plane.size:
            c = plane.tobytes()
        streams.append(len(c).to_bytes(4, "little") + c)
    left = raw[blocksize:]  # 352 bytes, leftover block: single stream
    lshuf = np.frombuffer(left, np.uint8).reshape(-1, typesize).T.reshape(-1).tobytes()
    lc = bytes(pa.Codec("lz4_raw").compress(lshuf))
    leftover_stream = len(lc).to_bytes(4, "little") + lc
    start0 = 16 + 4 * 2
    start1 = start0 + sum(len(s) for s in streams)
    body = (
        np.array([start0, start1], dtype="<u4").tobytes()
        + b"".join(streams)
        + leftover_stream
    )
    cbytes = 16 + len(body)
    flags = (1 << 5) | 0x1  # lz4, byte-shuffle, bit 4 CLEAR -> split
    header = (
        bytes([2, 1, flags, typesize])
        + nbytes.to_bytes(4, "little")
        + blocksize.to_bytes(4, "little")
        + cbytes.to_bytes(4, "little")
    )
    assert blosc_decompress(header + body) == raw


def test_blosc_split_flag_and_roundtrip_matrix():
    """Encoder emits the FORWARD_COMPAT split decision in flag bit 4 and
    the decoder inverts every regime: split multi-block, split with a
    leftover tail, non-split small streams, non-split zstd."""
    base = np.arange(3000, dtype="<f8")  # 24000 bytes, typesize 8
    raw = base.tobytes()
    # lz4, blocksize 8192 -> 8192/8 = 1024 >= 128: split (bit 4 clear)
    c = blosc_compress(raw, typesize=8, cname="lz4", shuffle=1, blocksize=8192)
    assert not c[2] & 0x10
    assert blosc_decompress(c) == raw
    # nbytes not a multiple of typesize: leftover tail block stays unsplit
    ragged = raw[:-5]
    c = blosc_compress(ragged, typesize=8, cname="lz4", shuffle=1, blocksize=8192)
    assert not c[2] & 0x10 and blosc_decompress(c) == ragged
    # streams would be < 128 bytes: no split, bit 4 set
    c = blosc_compress(raw[:960], typesize=8, cname="lz4", shuffle=1)
    assert c[2] & 0x10 and blosc_decompress(c) == raw[:960]
    # zstd never splits under FORWARD_COMPAT
    c = blosc_compress(raw, typesize=8, cname="zstd", shuffle=1, blocksize=8192)
    assert c[2] & 0x10 and blosc_decompress(c) == raw


def test_blosc_unsupported_paths_raise_clearly():
    data = np.zeros(64, dtype="<f4").tobytes()
    chunk = bytearray(blosc_compress(data, typesize=4, cname="lz4", shuffle=1))
    chunk[2] = (chunk[2] & 0x1F) | (0 << 5)  # rewrite codec id -> blosclz
    with pytest.raises(NotImplementedError, match="blosclz"):
        blosc_decompress(bytes(chunk))
    chunk[2] = (chunk[2] & 0xE0) | 0x4  # bit-shuffle flag
    with pytest.raises(NotImplementedError, match="bit-shuffle"):
        blosc_decompress(bytes(chunk))
    with pytest.raises(ValueError, match="truncated"):
        blosc_decompress(blosc_compress(data, typesize=4)[:-3])


def test_zstd_and_lz4_numcodecs_framings():
    data = np.arange(512, dtype="<i8").tobytes()
    assert zstd_decompress(zstd_compress(data), len(data)) == data
    enc = lz4_numcodecs_compress(data)
    assert int.from_bytes(enc[:4], "little") == len(data)  # numcodecs header
    assert lz4_numcodecs_decompress(enc) == data


# --- store-level ------------------------------------------------------------


def _grid_ds():
    from xarray_sql_spark.dataset import Dataset

    time = np.arange("2024-01-01", "2024-01-13", dtype="datetime64[h]")[:12]
    lat = np.linspace(-60.0, 60.0, 5)
    temp = np.arange(60, dtype=np.float32).reshape(12, 5) / 3.0
    counts = (np.arange(60, dtype=np.int64) % 7).reshape(12, 5)
    return Dataset(
        {"temp": (("time", "lat"), temp), "counts": (("time", "lat"), counts)},
        {"time": time, "lat": lat},
    )


@pytest.mark.parametrize(
    "compressor",
    [
        {"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1},
        {"id": "blosc", "cname": "zstd", "clevel": 3, "shuffle": 0},
        {"id": "blosc", "cname": "snappy", "shuffle": -1},  # numcodecs AUTOSHUFFLE
        {"id": "zstd", "level": 3},
        {"id": "lz4"},
    ],
)
def test_zarr_v2_store_roundtrip_new_codecs(tmp_path, compressor):
    ds = _grid_ds()
    path = write_zarr(ds, str(tmp_path / "g.zarr"), chunks={"time": 5}, compressor=compressor)
    back = open_zarr(path)
    np.testing.assert_array_equal(back.coords["time"], ds.coords["time"])
    np.testing.assert_allclose(back.data_vars["temp"].values(), ds.data_vars["temp"].values())
    np.testing.assert_array_equal(back.data_vars["counts"].values(), ds.data_vars["counts"].values())
    assert back.data_vars["counts"].dtype == np.int64


@pytest.mark.parametrize(
    "compressor",
    [
        {"id": "blosc", "cname": "zstd", "clevel": 3, "shuffle": 1},
        {"id": "zstd", "level": 3},
    ],
)
def test_zarr_v3_store_roundtrip_new_codecs(tmp_path, compressor):
    ds = _grid_ds()
    path = write_zarr(
        ds, str(tmp_path / "g3.zarr"), chunks={"time": 5}, compressor=compressor,
        zarr_format=3,
    )
    # metadata must carry the REAL v3 codec name, not a gzip stand-in
    import json

    meta = json.load(open(os.path.join(path, "temp", "zarr.json")))
    names = [c["name"] for c in meta["codecs"]]
    assert compressor["id"] in names
    back = open_zarr(path)
    np.testing.assert_allclose(back.data_vars["temp"].values(), ds.data_vars["temp"].values())
    np.testing.assert_array_equal(back.data_vars["counts"].values(), ds.data_vars["counts"].values())


def test_zarr_v3_sharded_blosc_inner_codec(tmp_path):
    ds = _grid_ds()
    path = write_zarr(
        ds, str(tmp_path / "s.zarr"), chunks={"time": 3},
        compressor={"id": "blosc", "cname": "lz4", "shuffle": 1},
        zarr_format=3, shards={"time": 6},
    )
    back = open_zarr(path)
    np.testing.assert_allclose(back.data_vars["temp"].values(), ds.data_vars["temp"].values())
    # sub-shard selectivity still holds with the blosc inner codec
    arr = back.data_vars["temp"].data
    arr.read_block((slice(0, 3), slice(0, 5)))
    assert arr.last_opened == ["c/0/0[0]"]


def test_zarr_blosc_selective_chunk_reads(tmp_path):
    ds = _grid_ds()
    path = write_zarr(
        ds, str(tmp_path / "sel.zarr"), chunks={"time": 4},
        compressor={"id": "blosc", "cname": "lz4", "shuffle": 1},
    )
    back = open_zarr(path)
    arr = back.data_vars["temp"].data
    arr.read_block((slice(4, 8), slice(0, 5)))
    assert arr.last_opened == ["1.0"]


def test_zarr_v2_filter_chain_delta_and_fixedscaleoffset(tmp_path):
    """Read a v2 store whose arrays use numcodecs filters: a delta-packed
    int64 time coordinate and a fixedscaleoffset int-packed float
    variable (the ERA5-style layout). Chunks are encoded here exactly as
    numcodecs does — delta: first element verbatim then diffs in astype;
    fixedscaleoffset: round((x - offset) * scale) in astype — so the
    reader's inverse chain is pinned against the public filter specs,
    independent of any writer of ours."""
    import json
    import zlib

    path = str(tmp_path / "filt.zarr")
    os.makedirs(os.path.join(path, "time"))
    os.makedirs(os.path.join(path, "temp"))
    with open(os.path.join(path, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)

    t = np.arange(1000, 1012, dtype="<i8")  # regular steps -> tiny deltas
    offset, scale = 20.0, 100.0
    temp = 20.0 + np.arange(12, dtype="<f8") / 7.0

    def _arr(name, meta, chunks_bytes, dims):
        meta = {
            "zarr_format": 2, "compressor": {"id": "zlib", "level": 1},
            "fill_value": 0, "order": "C", "filters": meta["filters"],
            "shape": meta["shape"], "chunks": meta["chunks"], "dtype": meta["dtype"],
        }
        with open(os.path.join(path, name, ".zarray"), "w") as f:
            json.dump(meta, f)
        with open(os.path.join(path, name, ".zattrs"), "w") as f:
            json.dump({"_ARRAY_DIMENSIONS": dims}, f)
        for key, raw in chunks_bytes.items():
            with open(os.path.join(path, name, key), "wb") as f:
                f.write(zlib.compress(raw, 1))

    # delta: enc[0] = x[0]; enc[i] = x[i] - x[i-1], stored as <i4
    t_chunks = {}
    for ci in range(2):
        block = t[ci * 6 : (ci + 1) * 6]
        enc = np.empty(6, dtype="<i4")
        enc[0] = block[0]
        enc[1:] = np.diff(block)
        t_chunks[str(ci)] = enc.tobytes()
    _arr(
        "time",
        {"shape": [12], "chunks": [6], "dtype": "<i8",
         "filters": [{"id": "delta", "dtype": "<i8", "astype": "<i4"}]},
        t_chunks, ["time"],
    )

    # fixedscaleoffset: enc = round((x - offset) * scale) as <i2
    enc = np.round((temp - offset) * scale).astype("<i2")
    _arr(
        "temp",
        {"shape": [12], "chunks": [12], "dtype": "<f8",
         "filters": [{"id": "fixedscaleoffset", "offset": offset,
                      "scale": scale, "dtype": "<f8", "astype": "<i2"}]},
        {"0": enc.tobytes()}, ["time"],
    )

    back = open_zarr(path)
    np.testing.assert_array_equal(np.asarray(back.coords["time"]), t)
    # fso decode: enc/scale + offset — exact to 1/scale quantization
    np.testing.assert_allclose(
        back.data_vars["temp"].values(), temp, atol=0.5 / scale + 1e-12
    )

    # unknown filter ids refuse clearly rather than decode garbage
    bad = json.load(open(os.path.join(path, "temp", ".zarray")))
    bad["filters"] = [{"id": "bitround", "keepbits": 7}]
    with open(os.path.join(path, "temp", ".zarray"), "w") as f:
        json.dump(bad, f)
    with pytest.raises(NotImplementedError, match="bitround"):
        open_zarr(path).data_vars["temp"].values()
