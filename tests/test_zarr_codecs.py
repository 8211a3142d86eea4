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
    blosclz_compress,
    blosclz_decompress,
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
    chunk[2] = (chunk[2] & 0x1F) | (5 << 5)  # rewrite codec id -> unknown
    with pytest.raises(NotImplementedError, match="id5"):
        blosc_decompress(bytes(chunk))
    with pytest.raises(ValueError, match="truncated"):
        blosc_decompress(blosc_compress(data, typesize=4)[:-3])


# --- blosclz stream format (FastLZ level 2) ---------------------------------


def test_blosclz_decode_handcrafted_stream():
    """Hand-assembled token streams straight from the public FastLZ
    level-2 / blosclz format — independent of our encoder. Covers:
    literal runs, a short match, an overlapping (RLE-like) match, a long
    match with length-extension bytes (incl. the 255-continuation rule),
    and a far (16-bit distance) match."""
    # literals "abc"; match L=6 D=3 -> "abcabc"; then literal "Z"
    s = bytes([2]) + b"abc" + bytes([(4 << 5) | 0, 2]) + bytes([0]) + b"Z"
    assert blosclz_decompress(s, 10) == b"abcabcabcZ"

    # overlapping match: literal "x" then L=5 D=1 -> "xxxxxx"
    s = bytes([0]) + b"x" + bytes([(3 << 5) | 0, 0])
    assert blosclz_decompress(s, 6) == b"xxxxxx"

    # long match with extension: literal "q", L=300 D=1.
    # lenc = 298 -> ctrl 7<<5, extension 298-7 = 291 = 255 + 36
    s = bytes([0]) + b"q" + bytes([(7 << 5) | 0, 255, 36, 0])
    assert blosclz_decompress(s, 301) == b"q" * 301

    # extension boundary: rem == 255 must emit (255, 0), decoder keeps
    # reading while the extension byte is 255. lenc = 7 + 255 -> L = 264
    s = bytes([0]) + b"r" + bytes([(7 << 5) | 0, 255, 0, 0])
    assert blosclz_decompress(s, 265) == b"r" * 265

    # far match: build 8300 bytes of 'A' via literal + RLE matches, then
    # an L=8 match at distance 8292 (>= 8192 -> 16-bit form,
    # ofs16 = 8292 - 8192 = 100)
    head = bytes([0]) + b"A"
    # one long overlapping match D=1 of length 8299: lenc = 8297
    # extension = 8297 - 7 = 8290 = 255*32 + 130
    head += bytes([(7 << 5) | 0]) + bytes([255] * 32) + bytes([130, 0])
    far = bytes([((8 - 2) << 5) | 31, 255, 100 >> 8, 100 & 255])
    assert blosclz_decompress(head + far, 8308) == b"A" * 8308

    # near-match distance boundary: D = 8191 encodes as hi=31, lo=254 —
    # NOT the far escape (which needs lo == 255)
    body = bytes([31]) + b"B" * 32  # 32 literals
    for _ in range(255):
        body += bytes([(7 << 5) | 0, 25, 0])  # L=34 D=1 RLE  (lenc=32)
    # now > 8192 bytes of B; match L=3 D=8191: lenc=1, hi=31, lo=254
    body += bytes([(1 << 5) | 31, 254])
    out = blosclz_decompress(body, 32 + 255 * 34 + 3)
    assert out == b"B" * (32 + 255 * 34 + 3)


def test_blosclz_differential_vs_naive_decoder():
    """Our encoder's output must decode correctly under an independently
    written, dumb-as-possible reference decoder (separate code path from
    the library's) — and our decoder must agree with it byte-for-byte."""

    def naive_decode(data: bytes) -> bytes:
        out = bytearray()
        ip = 0
        ctrl = data[ip] & 31
        ip += 1
        while True:
            if ctrl >= 32:
                ln = (ctrl >> 5) - 1
                ofs = (ctrl & 31) << 8
                if ln == 6:
                    while True:
                        c = data[ip]
                        ip += 1
                        ln += c
                        if c != 255:
                            break
                code = data[ip]
                ip += 1
                ln += 3
                if code == 255 and ofs == (31 << 8):
                    dist = (data[ip] << 8) + data[ip + 1] + 8192
                    ip += 2
                else:
                    dist = ofs + code + 1
                for _ in range(ln):  # byte-at-a-time: overlap-correct
                    out.append(out[len(out) - dist])
            else:
                out += data[ip : ip + ctrl + 1]
                ip += ctrl + 1
            if ip >= len(data):
                break
            ctrl = data[ip]
            ip += 1
        return bytes(out)

    from xarray_sql_spark.zarr_codecs import blosclz_compress

    rng = np.random.default_rng(11)
    cases = [
        b"",
        b"a",
        b"abcd" * 64,
        bytes(rng.integers(0, 4, 5000, dtype=np.uint8)),  # highly repetitive
        np.arange(4000, dtype="<i4").tobytes(),
        bytes(rng.integers(0, 256, 2000, dtype=np.uint8)),  # incompressible
        (b"pattern-123!" * 800)[:9000],  # long-range matches (> 8191 back)
    ]
    for raw in cases:
        enc = blosclz_compress(raw)
        if raw:
            assert naive_decode(enc) == raw
            assert blosclz_decompress(enc, len(raw)) == raw
        else:
            assert blosclz_decompress(enc, 0) == b""


def test_blosc_chunk_handcrafted_blosclz():
    """Full blosc chunk with inner codec id 0 (blosclz), hand-built:
    DONT_SPLIT, no shuffle, one block whose stream is hand-assembled
    blosclz tokens."""
    raw = b"abcabcabcZ"
    stream = bytes([2]) + b"abc" + bytes([(4 << 5) | 0, 2]) + bytes([0]) + b"Z"
    assert len(stream) < len(raw)
    body = np.array([16 + 4], dtype="<u4").tobytes()
    body += len(stream).to_bytes(4, "little") + stream
    flags = (0 << 5) | 0x10  # blosclz, DONT_SPLIT
    header = (
        bytes([2, 1, flags, 1])
        + len(raw).to_bytes(4, "little")
        + len(raw).to_bytes(4, "little")
        + (16 + len(body)).to_bytes(4, "little")
    )
    assert blosc_decompress(header + body) == raw


# --- bitshuffle -------------------------------------------------------------


def _naive_bitshuffle(block: bytes, typesize: int) -> bytes:
    """Independent per-bit reference: for each byte-of-element ii and bit
    jj (LSB first), emit one bit per element, packed 8 elements/byte,
    element order LSB-first; tail (partial element or non-multiple-of-8
    element count) verbatim — the c-blosc wrapper's documented rule."""
    nelem = (len(block) // typesize) & ~7
    main = nelem * typesize
    out = bytearray()
    for ii in range(typesize):
        for jj in range(8):
            for g in range(nelem // 8):
                b = 0
                for e in range(8):
                    bit = (block[(g * 8 + e) * typesize + ii] >> jj) & 1
                    b |= bit << e
                out.append(b)
    return bytes(out) + block[main:]


def test_bitshuffle_handcrafted_vectors():
    from xarray_sql_spark.zarr_codecs import bitshuffle, bitunshuffle

    # typesize 1, 8 bytes: element 0 = 0xFF -> every bit-plane's packed
    # byte has only bit 0 set
    assert bitshuffle(bytes([0xFF, 0, 0, 0, 0, 0, 0, 0]), 1) == bytes([1] * 8)
    # element i contributes bit i of the plane byte: bytes with bit jj set
    # land in plane jj
    src = bytes([1 << (i % 8) for i in range(8)])  # elem i has bit i set
    # plane jj's byte: only element jj has bit jj -> byte = 1 << jj
    assert bitshuffle(src, 1) == bytes([1 << j for j in range(8)])
    # typesize 2, 8 elements: byte 0 of elem e = e's low bits, byte 1 = 0xFF
    elems = b"".join(bytes([e, 0xFF]) for e in range(8))
    got = bitshuffle(elems, 2)
    # planes for byte 0, bit jj: elements with bit jj set in e
    want = bytearray()
    for jj in range(8):
        b = 0
        for e in range(8):
            b |= ((e >> jj) & 1) << e
        want.append(b)
    want += bytes([0xFF] * 8)  # byte 1 planes: every element has every bit
    assert got == bytes(want)
    # leftovers copied verbatim: 17 elements of 2 bytes + 1 ragged byte
    rng = np.random.default_rng(3)
    block = bytes(rng.integers(0, 256, 35, dtype=np.uint8))
    got = bitshuffle(block, 2)
    assert got[32:] == block[32:]  # 16 elems shuffled, 3 tail bytes verbatim
    assert bitunshuffle(got, 2) == block


def test_bitshuffle_differential_and_roundtrip():
    from xarray_sql_spark.zarr_codecs import bitshuffle, bitunshuffle

    rng = np.random.default_rng(5)
    for typesize in (1, 2, 3, 4, 8):
        for n in (0, 1, 7, 8 * typesize, 8 * typesize + 3, 256, 1000):
            block = bytes(rng.integers(0, 256, n, dtype=np.uint8))
            got = bitshuffle(block, typesize)
            assert got == _naive_bitshuffle(block, typesize), (typesize, n)
            assert bitunshuffle(got, typesize) == block, (typesize, n)


def test_blosc_chunk_handcrafted_bitshuffle():
    """Full blosc chunk with the bit-shuffle flag (0x4), hand-built with
    the naive reference transform and a raw-stored stream (csize ==
    stream size), independent of our encoder."""
    raw = np.arange(32, dtype="<u2").tobytes()  # 64 bytes, typesize 2
    shuffled = _naive_bitshuffle(raw, 2)
    body = np.array([16 + 4], dtype="<u4").tobytes()
    body += len(shuffled).to_bytes(4, "little") + shuffled  # stored raw
    flags = (1 << 5) | 0x4 | 0x10  # lz4 id, BIT_SHUFFLE, DONT_SPLIT
    header = (
        bytes([2, 1, flags, 2])
        + len(raw).to_bytes(4, "little")
        + len(raw).to_bytes(4, "little")
        + (16 + len(body)).to_bytes(4, "little")
    )
    assert blosc_decompress(header + body) == raw


@pytest.mark.parametrize("cname", ["blosclz", "lz4"])
@pytest.mark.parametrize("shuffle", [0, 1, 2])
def test_blosc_blosclz_bitshuffle_roundtrip_matrix(cname, shuffle):
    rng = np.random.default_rng(9)
    for data in (
        np.arange(1000, dtype="<f8").tobytes(),
        np.tile(rng.integers(0, 50, 256).astype("<i4"), 64).tobytes(),
        np.arange(611, dtype="<i4").tobytes()[:-3],  # ragged tail
    ):
        chunk = blosc_compress(data, typesize=4, cname=cname, shuffle=shuffle,
                               blocksize=2048)
        assert blosc_decompress(chunk) == data


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


def test_zarr_v3_general_transpose_codec(tmp_path):
    """A v3 array written by another tool with a general ``transpose``
    codec order (here [1, 2, 0]): the stored chunk bytes are the C-order
    bytes of ``np.transpose(x, order)``; decode must invert with the
    argsort permutation. Hand-built, independent of our writer; includes
    an edge chunk to prove the permuted padding round-trips."""
    import json

    from xarray_sql_spark.zarr_store import ZarrArray

    rng = np.random.default_rng(21)
    shape, chunks, order = (5, 4, 3), (3, 4, 3), [1, 2, 0]
    x = rng.integers(-100, 100, size=shape).astype("<i4")
    adir = str(tmp_path / "arr")
    os.makedirs(adir)
    meta = {
        "zarr_format": 3,
        "node_type": "array",
        "shape": list(shape),
        "data_type": "int32",
        "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": list(chunks)}},
        "chunk_key_encoding": {"name": "default"},
        "fill_value": 0,
        "codecs": [
            {"name": "transpose", "configuration": {"order": order}},
            {"name": "bytes", "configuration": {"endian": "little"}},
        ],
        "dimension_names": ["a", "b", "c"],
    }
    with open(os.path.join(adir, "zarr.json"), "w") as f:
        json.dump(meta, f)
    for ci in range(2):  # chunk grid: 2 x 1 x 1 (second is an edge chunk)
        block = np.zeros(chunks, dtype="<i4")
        sel = x[ci * 3 : ci * 3 + 3]
        block[: sel.shape[0]] = sel
        enc = np.transpose(block, order)  # encoded representation
        os.makedirs(os.path.join(adir, "c", str(ci), "0"), exist_ok=True)
        with open(os.path.join(adir, "c", str(ci), "0", "0"), "wb") as f:
            f.write(np.ascontiguousarray(enc).tobytes())
    arr = ZarrArray(adir)
    np.testing.assert_array_equal(arr.values(), x)
    # selective read still slices correctly through the permutation
    np.testing.assert_array_equal(
        arr.read_block((slice(2, 5), slice(1, 3), slice(0, 2))), x[2:5, 1:3, 0:2]
    )
    # a non-permutation order must refuse clearly
    meta["codecs"][0]["configuration"]["order"] = [0, 0, 1]
    with open(os.path.join(adir, "zarr.json"), "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="permutation"):
        ZarrArray(adir)


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


def _cf_store(path: str, *, calendar: str = "proleptic_gregorian") -> str:
    """Hand-build an xarray-written-style v2 store: int32 CF time coord
    ("hours since ..."), int16 variable packed with scale_factor /
    add_offset and a _FillValue sentinel — the ERA5 layout."""
    import json

    os.makedirs(os.path.join(path, "time"))
    os.makedirs(os.path.join(path, "t2m"))
    with open(os.path.join(path, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)

    def _arr(name, a, dims, attrs, chunks=None):
        import itertools

        chunks = list(chunks or a.shape)
        meta = {
            "zarr_format": 2, "shape": list(a.shape), "chunks": chunks,
            "dtype": a.dtype.str, "compressor": None, "fill_value": 0,
            "order": "C", "filters": None,
        }
        with open(os.path.join(path, name, ".zarray"), "w") as f:
            json.dump(meta, f)
        with open(os.path.join(path, name, ".zattrs"), "w") as f:
            json.dump({"_ARRAY_DIMENSIONS": list(dims), **attrs}, f)
        grid = [range((n + c - 1) // c) for n, c in zip(a.shape, chunks)]
        for idx in itertools.product(*grid):
            block = np.zeros(chunks, dtype=a.dtype)
            sel = tuple(
                slice(i * c, min((i + 1) * c, n))
                for i, c, n in zip(idx, chunks, a.shape)
            )
            block[tuple(slice(0, s.stop - s.start) for s in sel)] = a[sel]
            with open(os.path.join(path, name, ".".join(map(str, idx))), "wb") as f:
                f.write(block.tobytes())

    t = np.arange(8, dtype="<i4")
    _arr("time", t, ("time",),
         {"units": "hours since 2001-02-03 04:00:00", "calendar": calendar})
    # raw = round((x - offset) / scale); x = raw*scale + offset; raw 9999 = fill
    raw = np.array([0, 100, -50, 9999, 200, 300, -100, 50], dtype="<i2")
    _arr("t2m", raw, ("time",),
         {"scale_factor": 0.01, "add_offset": 273.15, "_FillValue": 9999},
         chunks=[4])
    return path


def test_zarr_cf_decode_time_and_mask_and_scale(tmp_path):
    """xarray decode_cf parity on open: Gregorian-like CF time coords
    become datetime64[us]; packed vars decode lazily (raw*scale+offset,
    fill -> NaN) with per-block selectivity preserved."""
    path = _cf_store(str(tmp_path / "cf.zarr"))
    ds = open_zarr(path)
    assert ds.coords["time"].dtype.kind == "M"
    assert str(ds.coords["time"][0]) == "2001-02-03T04:00:00.000000"
    assert "units" not in ds.coord_attrs.get("time", {})
    v = ds.data_vars["t2m"]
    assert v.dtype == np.float64
    got = v.values()
    want = np.array([0, 100, -50, np.nan, 200, 300, -100, 50]) * 0.01 + 273.15
    want[3] = np.nan
    np.testing.assert_allclose(got, want)
    assert "scale_factor" not in v.attrs
    # lazy + selective: a one-chunk read opens only that chunk
    v.data.read_block((slice(0, 4),))
    assert v.data.last_opened == ["0"]

    # decode_cf=False leaves everything raw (the escape hatch)
    raw = open_zarr(path, decode_cf=False)
    assert raw.coords["time"].dtype.kind in "iu"
    assert raw.data_vars["t2m"].dtype == np.int16


def test_append_refuses_cf_decoded_slab(tmp_path):
    """Appending a CF-DECODED slab to a CF-encoded store must refuse:
    the slab's datetime64 time / unpacked float var would be astype-cast
    into garbage under the store's int + units metadata. (Raw-domain
    appends — matching dtype kinds — stay allowed.)"""
    from xarray_sql_spark.zarr_store import append_zarr

    path = _cf_store(str(tmp_path / "ap.zarr"))
    decoded = open_zarr(path)  # time: datetime64[us]; t2m: float64
    assert decoded.coords["time"].dtype.kind == "M"
    from xarray_sql_spark.dataset import Dataset

    slab = Dataset(
        {"t2m": (("time",), np.array([273.15, 274.15]))},
        {"time": decoded.coords["time"][:2] + np.timedelta64(8, "h")},
    )
    with pytest.raises(NotImplementedError, match="raw encoded domain"):
        append_zarr(slab, path, "time")


def test_zarr_cf_fill_only_masking(tmp_path):
    """A bare _FillValue on a numeric variable (no packing attrs) still
    masks to NaN — ints promote to float64, floats keep their dtype —
    matching xarray's mask_and_scale."""
    import json

    path = str(tmp_path / "fo.zarr")
    os.makedirs(os.path.join(path, "counts"))
    os.makedirs(os.path.join(path, "temp"))
    with open(os.path.join(path, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)

    def _arr(name, a, attrs):
        with open(os.path.join(path, name, ".zarray"), "w") as f:
            json.dump({"zarr_format": 2, "shape": list(a.shape),
                       "chunks": list(a.shape), "dtype": a.dtype.str,
                       "compressor": None, "fill_value": 0, "order": "C",
                       "filters": None}, f)
        with open(os.path.join(path, name, ".zattrs"), "w") as f:
            json.dump({"_ARRAY_DIMENSIONS": ["x"], **attrs}, f)
        with open(os.path.join(path, name, "0"), "wb") as f:
            f.write(a.tobytes())

    _arr("counts", np.array([3, -9999, 7], dtype="<i4"), {"_FillValue": -9999})
    _arr("temp", np.array([1.5, -9.96921e36, 2.5], dtype="<f4"),
         {"_FillValue": -9.96921e36})
    ds = open_zarr(path)
    c = ds.data_vars["counts"].values()
    assert c.dtype == np.float64
    np.testing.assert_array_equal(c, [3.0, np.nan, 7.0])
    t = ds.data_vars["temp"].values()
    assert t.dtype == np.float32
    assert np.isnan(t[1]) and t[0] == np.float32(1.5)


def test_zarr_cf_non_gregorian_calendar_stays_int(tmp_path):
    """Tier-2 calendars (360_day/julian — no timestamp mapping exists)
    must NOT decode: ints + attrs survive for the session's cftime()
    UDF handling, same split as XarraySession._apply_cf_time / gq03."""
    path = _cf_store(str(tmp_path / "nl.zarr"), calendar="360_day")
    ds = open_zarr(path)
    assert ds.coords["time"].dtype.kind in "iu"
    assert ds.coord_attrs["time"]["units"].startswith("hours since")


def test_zarr_cf_store_backed_sql_end_to_end(spark, tmp_path):
    """The executor re-opens store-backed tables itself, so CF decode
    must happen at open — SQL over a store-backed registration returns
    real timestamps and unpacked floats (this exact path returned raw
    ints before round 6)."""
    from xarray_sql_spark.dataset import Dataset
    from xarray_sql_spark.xr_session import XarraySession

    path = _cf_store(str(tmp_path / "sql.zarr"))
    xs = XarraySession(spark)
    xs.from_dataset("cfsql", Dataset.open_store(path), chunks={"time": 4}, store=path)
    rows = xs.sql(
        "SELECT time, t2m FROM cfsql WHERE t2m IS NOT NULL ORDER BY time LIMIT 2"
    ).df.collect()
    assert str(rows[0].time) == "2001-02-03 04:00:00"
    assert abs(rows[0].t2m - 273.15) < 1e-9
    assert abs(rows[1].t2m - 274.15) < 1e-9


def test_zarr_vlen_utf8_handbuilt_store(tmp_path):
    """Hand-encode the numcodecs VLenUTF8 layout (u32 count, then u32
    length + utf8 per item) straight from the vlen.pyx spec — zlib and
    zstd compressed chunks, multibyte codepoints, an edge chunk, and a
    missing chunk materializing the fill."""
    import json
    import zlib as _zlib

    from xarray_sql_spark.zarr_codecs import zstd_compress

    path = str(tmp_path / "vl.zarr")
    os.makedirs(os.path.join(path, "station"))
    os.makedirs(os.path.join(path, "name"))
    with open(os.path.join(path, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)

    def vlen(items):
        out = len(items).to_bytes(4, "little")
        for s in items:
            b = s.encode("utf-8")
            out += len(b).to_bytes(4, "little") + b
        return out

    def arr(name, shape, chunk, comp, chunk_payloads, dims):
        with open(os.path.join(path, name, ".zarray"), "w") as f:
            json.dump(
                {"zarr_format": 2, "shape": shape, "chunks": chunk,
                 "dtype": "|O", "compressor": comp, "fill_value": 0,
                 "order": "C", "filters": [{"id": "vlen-utf8"}]},
                f,
            )
        with open(os.path.join(path, name, ".zattrs"), "w") as f:
            json.dump({"_ARRAY_DIMENSIONS": dims}, f)
        for key, payload in chunk_payloads.items():
            with open(os.path.join(path, name, key), "wb") as f:
                f.write(payload)

    stations = ["ber-tx", "okélé", "n﨑-01", "s4", "Ωmega"]
    arr(
        "station", [5], [3], {"id": "zlib", "level": 1},
        {"0": _zlib.compress(vlen(stations[:3]), 1),
         "1": _zlib.compress(vlen(stations[3:] + [""]), 1)},  # padded edge
        ["station"],
    )
    # names: zstd-compressed (frame content size path), chunk 1 ABSENT
    arr(
        "name", [4], [2], {"id": "zstd", "level": 1},
        {"0": zstd_compress(vlen(["alpha", "béta"]))},
        ["station2"],
    )

    from xarray_sql_spark.zarr_store import ZarrArray

    st = ZarrArray(os.path.join(path, "station"))
    np.testing.assert_array_equal(st.values().astype(str), np.array(stations))
    nm = ZarrArray(os.path.join(path, "name"))
    got = nm.values()
    assert list(got[:2]) == ["alpha", "béta"]
    assert list(got[2:]) == ["", ""]  # absent chunk -> fill

    ds = open_zarr(path)
    assert ds.coords["station"].dtype.kind == "U"  # coord cast for bounds


def test_zarr_v3_string_data_type(tmp_path):
    """zarr-python 3 string arrays: data_type "string" with a
    [vlen-utf8, zstd] codec chain — hand-built, decoded via the zstd
    frame content size (chunk shape can't size a vlen buffer)."""
    import json

    from xarray_sql_spark.zarr_codecs import zstd_compress
    from xarray_sql_spark.zarr_store import ZarrArray

    adir = str(tmp_path / "s3")
    os.makedirs(adir)
    meta = {
        "zarr_format": 3,
        "node_type": "array",
        "shape": [4],
        "data_type": "string",
        "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [2]}},
        "chunk_key_encoding": {"name": "default"},
        "fill_value": "",
        "codecs": [{"name": "vlen-utf8"}, {"name": "zstd", "configuration": {"level": 1}}],
        "dimension_names": ["s"],
    }
    with open(os.path.join(adir, "zarr.json"), "w") as f:
        json.dump(meta, f)

    def vlen(items):
        out = len(items).to_bytes(4, "little")
        for s in items:
            b = s.encode("utf-8")
            out += len(b).to_bytes(4, "little") + b
        return out

    os.makedirs(os.path.join(adir, "c"))
    with open(os.path.join(adir, "c", "0"), "wb") as f:
        f.write(zstd_compress(vlen(["päx", "q"])))
    with open(os.path.join(adir, "c", "1"), "wb") as f:
        f.write(zstd_compress(vlen(["rr", "ßß"])))
    arr = ZarrArray(adir)
    assert list(arr.values()) == ["päx", "q", "rr", "ßß"]


def test_zarr_vlen_roundtrip_and_sql(spark, tmp_path):
    """Writer emits the vlen-utf8 layout for string arrays; a store-backed
    grid table with a STRING coordinate queries end-to-end with string
    predicates."""
    from xarray_sql_spark.dataset import Dataset
    from xarray_sql_spark.xr_session import XarraySession

    stations = np.array(["aaa", "bbb", "ccc", "ddd", "eee", "fff"])
    temp = np.arange(6, dtype=np.float64) * 1.5
    labels = np.array([f"L{i}" for i in range(6)])
    ds = Dataset(
        {"temp": (("station",), temp), "label": (("station",), labels)},
        {"station": stations},
    )
    path = write_zarr(
        ds, str(tmp_path / "s.zarr"), chunks={"station": 4},
        compressor={"id": "blosc", "cname": "lz4", "shuffle": 0},
    )
    back = open_zarr(path)
    np.testing.assert_array_equal(back.coords["station"].astype(str), stations)
    np.testing.assert_array_equal(
        back.data_vars["label"].values().astype(str), labels
    )

    xs = XarraySession(spark)
    xs.from_dataset("vlsql", Dataset.open_store(path), chunks={"station": 4}, store=path)
    rows = xs.sql(
        "SELECT station, temp, label FROM vlsql WHERE station >= 'ddd' "
        "ORDER BY station"
    ).df.collect()
    assert [r.station for r in rows] == ["ddd", "eee", "fff"]
    assert [r.label for r in rows] == ["L3", "L4", "L5"]


def test_string_coord_partitions_prune(spark, tmp_path):
    """String-dim pruning (beyond the reference, which never prunes
    string dims): an equality predicate on a string coordinate must read
    exactly the one partition whose [min, max] bound covers it. Code-
    point ordering is shared by Spark UTF8_BINARY, Python str and numpy
    U, so the bounds are sound — incl. non-ASCII."""
    import json

    from xarray_sql_spark.dataset import Dataset
    from xarray_sql_spark.xr_session import XarraySession

    stations = np.array([f"st{i:02d}" for i in range(8)])
    ds = Dataset({"temp": (("station",), np.arange(8.0))}, {"station": stations})
    path = write_zarr(ds, str(tmp_path / "p.zarr"), chunks={"station": 2})
    log = str(tmp_path / "log")
    os.makedirs(log)
    xs = XarraySession(spark)
    xs.metadata_aggregates = False
    xs.from_dataset(
        "strpr", Dataset.open_store(path), chunks={"station": 2},
        store=path, read_log_dir=log,
    )
    rows = xs.sql("SELECT station, temp FROM strpr WHERE station = 'st05'").df.collect()
    assert [(r.station, r.temp) for r in rows] == [("st05", 5.0)]
    reads = [json.load(open(os.path.join(log, f))) for f in os.listdir(log)]
    assert [r["block"]["station"] for r in reads] == [[4, 6]]  # 1 of 4

    # range predicate: two of four partitions
    for f in os.listdir(log):
        os.remove(os.path.join(log, f))
    n = xs.sql(
        "SELECT COUNT(*) AS n FROM strpr WHERE station >= 'st04'"
    ).df.collect()[0].n
    assert n == 4
    reads = sorted(
        json.load(open(os.path.join(log, f)))["block"]["station"]
        for f in os.listdir(log)
    )
    assert reads == [[4, 6], [6, 8]]


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


def test_zarr_cf_unsigned_decode(tmp_path):
    """CF ``_Unsigned`` (NetCDF-3-converted stores hold unsigned data in
    signed ints): raw values >= 2^(bits-1) must reinterpret BEFORE
    scale/offset, fills compare in the reinterpreted domain (a fill of -1
    means 255/65535), and a bare ``_Unsigned`` with no packing just flips
    the dtype — xarray UnsignedIntegerCoder parity (round-6 ADVICE)."""
    import json

    path = str(tmp_path / "us.zarr")
    for name in ("packed", "bare", "inverse"):
        os.makedirs(os.path.join(path, name))
    with open(os.path.join(path, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)

    def _arr(name, a, attrs):
        with open(os.path.join(path, name, ".zarray"), "w") as f:
            json.dump({"zarr_format": 2, "shape": list(a.shape),
                       "chunks": list(a.shape), "dtype": a.dtype.str,
                       "compressor": None, "fill_value": 0, "order": "C",
                       "filters": None}, f)
        with open(os.path.join(path, name, ".zattrs"), "w") as f:
            json.dump({"_ARRAY_DIMENSIONS": [f"x_{name}"], **attrs}, f)
        with open(os.path.join(path, name, "0"), "wb") as f:
            f.write(a.tobytes())

    # int8 raw, unsigned semantics, packed: -128 is really 128, -1 is the
    # 255 fill
    _arr("packed", np.array([-128, -1, 10, 127], dtype="|i1"),
         {"_Unsigned": "true", "scale_factor": 0.5, "_FillValue": -1})
    # bare reinterpret: dtype flips to uint16, no float promotion
    _arr("bare", np.array([-1, 5], dtype="<i2"), {"_Unsigned": "true"})
    # the mirror: uint8 raw declared signed, fill 255 means -1
    _arr("inverse", np.array([255, 1], dtype="|u1"),
         {"_Unsigned": "false", "_FillValue": 255})

    ds = open_zarr(path)
    np.testing.assert_allclose(
        ds.data_vars["packed"].values(),
        np.array([64.0, np.nan, 5.0, 63.5]),
    )
    bare = ds.data_vars["bare"]
    assert bare.dtype == np.uint16
    np.testing.assert_array_equal(bare.values(), np.array([65535, 5], dtype="u2"))
    inv = ds.data_vars["inverse"].values()
    assert np.isnan(inv[0]) and inv[1] == 1.0
    for name in ("packed", "bare", "inverse"):
        assert "_Unsigned" not in ds.data_vars[name].attrs


def test_blosclz_truncated_match_token_raises_valueerror():
    """A match token whose extension/distance bytes are cut off must raise
    the documented ValueError, not leak a bare IndexError (round-6
    ADVICE)."""
    from xarray_sql_spark.zarr_codecs import blosclz_compress, blosclz_decompress

    full = blosclz_compress(b"abcdabcdabcdabcdabcdabcdabcdabcd" * 8)
    # progressively truncate; every prefix must fail with ValueError
    for cut in range(1, len(full)):
        try:
            blosclz_decompress(full[:cut], 256)
        except ValueError:
            pass  # the only acceptable error type


def test_v2_long_tail_codecs_and_filters(tmp_path):
    """numcodecs long-tail read support, spec-vector goldens assembled
    with stdlib/numpy only (independent of the library's encoders):
    bz2 and lzma standalone compressors, the Shuffle byte-transpose
    filter, and PackBits bool packing (1 pad-count byte + big-endian
    bit packing)."""
    import bz2 as _bz2
    import json
    import lzma as _lzma

    path = str(tmp_path / "lt.zarr")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)

    def _arr(name, meta, chunk_bytes):
        os.makedirs(os.path.join(path, name), exist_ok=True)
        with open(os.path.join(path, name, ".zarray"), "w") as f:
            json.dump({"zarr_format": 2, "order": "C", "fill_value": 0,
                       "filters": None, **meta}, f)
        with open(os.path.join(path, name, ".zattrs"), "w") as f:
            json.dump({"_ARRAY_DIMENSIONS": [f"x_{name}"]}, f)
        with open(os.path.join(path, name, "0"), "wb") as f:
            f.write(chunk_bytes)

    a = np.arange(16, dtype="<i4")
    _arr("vbz2", {"shape": [16], "chunks": [16], "dtype": "<i4",
                  "compressor": {"id": "bz2", "level": 5}},
         _bz2.compress(a.tobytes()))
    _arr("vlzma", {"shape": [16], "chunks": [16], "dtype": "<i4",
                   "compressor": {"id": "lzma"}},
         _lzma.compress(a.tobytes()))

    # Shuffle(elementsize=4): byte plane j of every element grouped
    sh = a.tobytes()
    planes = bytes(sh[e * 4 + j] for j in range(4) for e in range(16))
    _arr("vshuf", {"shape": [16], "chunks": [16], "dtype": "<i4",
                   "compressor": None,
                   "filters": [{"id": "shuffle", "elementsize": 4}]},
         planes)

    # PackBits: 11 bools -> pad byte (5) + 2 packed bytes, big-endian bits
    bools = np.array([1, 0, 1, 1, 0, 0, 1, 0, 1, 1, 0], dtype=bool)
    packed = bytes([5]) + np.packbits(bools).tobytes()
    _arr("vbool", {"shape": [11], "chunks": [11], "dtype": "|b1",
                   "compressor": None, "filters": [{"id": "packbits"}]},
         packed)

    ds = open_zarr(path)
    np.testing.assert_array_equal(ds.data_vars["vbz2"].values(), a)
    np.testing.assert_array_equal(ds.data_vars["vlzma"].values(), a)
    np.testing.assert_array_equal(ds.data_vars["vshuf"].values(), a)
    np.testing.assert_array_equal(ds.data_vars["vbool"].values(), bools)


def test_v2_bz2_lzma_write_roundtrip(tmp_path):
    """The sink can WRITE bz2/lzma stores (numcodecs-readable layout) and
    read its own output back value-identical; stdlib decompressors verify
    the chunk bytes really are the declared codec."""
    import bz2 as _bz2
    import lzma as _lzma

    from xarray_sql_spark.dataset import Dataset, Variable
    from xarray_sql_spark.zarr_store import write_zarr

    x = np.arange(20, dtype=np.int64)
    v = (x * 3.5).astype(np.float64)
    for cid, decomp in (("bz2", _bz2.decompress), ("lzma", _lzma.decompress)):
        p = str(tmp_path / f"w_{cid}.zarr")
        ds = Dataset({"v": Variable(("x",), v)}, {"x": x})
        write_zarr(ds, p, compressor={"id": cid})
        raw = decomp(open(os.path.join(p, "v", "0"), "rb").read())
        np.testing.assert_array_equal(np.frombuffer(raw, dtype=v.dtype), v)
        back = open_zarr(p)
        np.testing.assert_array_equal(back.data_vars["v"].values(), v)


def test_zarr_v3_transpose_composes_with_vlen_utf8(tmp_path):
    """A spec-legal v3 chain [transpose, vlen-utf8] on a 2-D string
    array: the stored bytes are the vlen encoding of the TRANSPOSED
    block; decode must invert the permutation for string arrays exactly
    as it does for fixed-width ones (round-7 review: the vlen branch
    returned before the transpose inversion, silently scrambling
    positions)."""
    import json

    from xarray_sql_spark.zarr_store import ZarrArray, _vlen_encode

    x = np.array([["aa", "bb", "cc"], ["dd", "ee", "ff"]], dtype=object)
    shape, chunks, order = (2, 3), (2, 3), [1, 0]
    adir = str(tmp_path / "sarr")
    os.makedirs(adir)
    meta = {
        "zarr_format": 3,
        "node_type": "array",
        "shape": list(shape),
        "data_type": "string",
        "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": list(chunks)}},
        "chunk_key_encoding": {"name": "default"},
        "fill_value": "",
        "codecs": [
            {"name": "transpose", "configuration": {"order": order}},
            {"name": "vlen-utf8"},
        ],
        "dimension_names": ["a", "b"],
    }
    with open(os.path.join(adir, "zarr.json"), "w") as f:
        json.dump(meta, f)
    enc = np.transpose(x, order)  # encoded representation, C-order flatten
    os.makedirs(os.path.join(adir, "c", "0"), exist_ok=True)
    with open(os.path.join(adir, "c", "0", "0"), "wb") as f:
        f.write(_vlen_encode(np.ascontiguousarray(enc)))
    arr = ZarrArray(adir)
    np.testing.assert_array_equal(arr.values(), x)


def test_timedelta_null_fill_is_nat(tmp_path):
    """A v2 timedelta64 array with fill_value null must materialize
    absent chunks as NaT, not timedelta 0 (round-7 review)."""
    import json

    from xarray_sql_spark.zarr_store import ZarrArray

    adir = str(tmp_path / "td")
    os.makedirs(adir)
    meta = {
        "zarr_format": 2, "shape": [4], "chunks": [4], "dtype": "<m8[ns]",
        "compressor": None, "fill_value": None, "order": "C", "filters": None,
    }
    with open(os.path.join(adir, ".zarray"), "w") as f:
        json.dump(meta, f)
    arr = ZarrArray(adir)  # no chunk files: all fill
    assert np.isnat(arr.values()).all()
