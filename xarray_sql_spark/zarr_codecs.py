"""Zarr chunk codecs beyond the stdlib: blosc, zstd, lz4 — no numcodecs.

Real-world Zarr v2 stores overwhelmingly use numcodecs' defaults
(``{"id": "blosc", "cname": "lz4", "shuffle": 1}``), and zarr-python 3
defaults to the ``zstd`` codec — neither of which the stdlib can decode.
This module implements the *framings* in pure Python and delegates the
inner compression to :class:`pyarrow.Codec` (lz4 block, zstd, snappy,
zlib/gzip all ship with pyarrow), so stores written by standard tools
read back without any optional native dependency.

Formats implemented from public specifications only:

- **blosc chunk format** (c-blosc 1.x, as documented in the c-blosc
  repository's ``README_CHUNK_FORMAT.rst``): a 16-byte header
  ``version | versionlz | flags | typesize | nbytes(u32) | blocksize(u32)
  | cbytes(u32)``, then either the raw buffer (``MEMCPYED`` flag) or a
  ``uint32`` offset table (one absolute offset per block). Each block
  holds one *or typesize* compressed streams: c-blosc splits non-leftover
  blocks into ``typesize`` independent per-byte-plane streams when header
  flag bit 4 (``0x10``, "blocks were not split") is clear AND
  ``typesize <= 16`` AND ``blocksize/typesize >= 128`` (the compressor's
  default FORWARD_COMPAT split rule applies it for blosclz/lz4 only and
  records the decision in bit 4; pre-1.11 chunks have bit 4 = 0 and rely
  on the size conditions alone, which this decoder mirrors). Every
  stream is ``csize(u32) + payload`` — payload stored *uncompressed*
  when ``csize == uncompressed stream size``. Byte-shuffle is applied
  per block (stride = typesize) before splitting, so each split stream
  is exactly one byte plane. Inner codec ids (``flags >> 5``):
  0 blosclz, 1 lz4/lz4hc, 2 snappy, 3 zlib, 4 zstd — all but blosclz
  map onto pyarrow codecs; blosclz and bit-shuffle raise a clear
  ``NotImplementedError`` rather than risk silent corruption.
- **numcodecs LZ4 framing** (``numcodecs.lz4`` docs): a little-endian
  ``uint32`` original-size header followed by LZ4 *block* data.
- **zstd frames** (numcodecs ``Zstd`` / Zarr v3 ``zstd`` codec): plain
  zstd frames; pyarrow's zstd codec decodes them given the known
  decompressed size (always known for a Zarr chunk).

The reference reads Zarr through zarr-python/numcodecs
(reference xarray_sql/reader.py:192-337); this keeps that user-facing
format contract while staying inside this container's wheel set.
"""

from __future__ import annotations

import numpy as np

# blosc header flag bits / codec ids (public c-blosc blosc.h constants)
_BYTE_SHUFFLE = 0x1
_MEMCPYED = 0x2
_BIT_SHUFFLE = 0x4
_DONT_SPLIT = 0x10  # c-blosc >= 1.11: blocks were NOT split into streams
_BLOSC_CODECS = {0: "blosclz", 1: "lz4", 2: "snappy", 3: "zlib", 4: "zstd"}
_BLOSC_CODEC_IDS = {"blosclz": 0, "lz4": 1, "lz4hc": 1, "snappy": 2, "zlib": 3, "zstd": 4}
_MAX_OVERHEAD = 16  # blosc chunk header size
_MAX_SPLITS = 16  # c-blosc MAX_SPLITS: never more streams than this
_MIN_STREAM = 128  # c-blosc MIN_BUFFERSIZE: min bytes per split stream


def _split_streams(flags: int, typesize: int, blocksize: int, leftover: bool) -> int:
    """Stream count for one block, mirroring c-blosc's decompressor rule:
    split into ``typesize`` streams unless the header says don't, the
    block is the leftover (short) one, or the size conditions fail."""
    if leftover or flags & _DONT_SPLIT:
        return 1
    if not 1 < typesize <= _MAX_SPLITS or blocksize // typesize < _MIN_STREAM:
        return 1
    return typesize


def _pa_codec(name: str):
    import pyarrow as pa

    return pa.Codec(name)


def _inner_decompress(cname: str, payload: bytes, nbytes: int) -> bytes:
    """One blosc block body -> raw bytes (pyarrow-backed)."""
    if cname == "lz4":  # blosc stores LZ4 *block* format
        return bytes(_pa_codec("lz4_raw").decompress(payload, decompressed_size=nbytes))
    if cname == "zstd":
        return bytes(_pa_codec("zstd").decompress(payload, decompressed_size=nbytes))
    if cname == "snappy":
        return bytes(_pa_codec("snappy").decompress(payload, decompressed_size=nbytes))
    if cname == "zlib":
        import zlib

        return zlib.decompress(payload)
    raise NotImplementedError(
        f"blosc inner codec {cname!r} has no pure-Python/pyarrow decoder "
        f"(re-write the store with lz4/zstd/snappy/zlib)"
    )


def _inner_compress(cname: str, raw: bytes) -> bytes:
    if cname in ("lz4", "lz4hc"):
        return bytes(_pa_codec("lz4_raw").compress(raw))
    if cname == "zstd":
        return bytes(_pa_codec("zstd").compress(raw))
    if cname == "snappy":
        return bytes(_pa_codec("snappy").compress(raw))
    if cname == "zlib":
        import zlib

        return zlib.compress(raw)
    raise NotImplementedError(f"unsupported blosc write codec {cname!r}")


def _unshuffle(block: bytes, typesize: int) -> bytes:
    """Invert blosc's per-block byte shuffle (byte j of every element
    grouped together). Trailing ``len % typesize`` bytes are stored
    unshuffled (c-blosc shuffle.c semantics)."""
    n = len(block)
    if typesize <= 1 or n < typesize:
        return block
    main = n - n % typesize
    arr = np.frombuffer(block[:main], dtype=np.uint8)
    out = arr.reshape(typesize, main // typesize).T.reshape(-1).tobytes()
    return out + block[main:] if main < n else out


def _shuffle(block: bytes, typesize: int) -> bytes:
    n = len(block)
    if typesize <= 1 or n < typesize:
        return block
    main = n - n % typesize
    arr = np.frombuffer(block[:main], dtype=np.uint8)
    out = arr.reshape(main // typesize, typesize).T.reshape(-1).tobytes()
    return out + block[main:] if main < n else out


def blosc_decompress(chunk: bytes, expected_nbytes: int | None = None) -> bytes:
    """Decode one blosc chunk (c-blosc 1.x format) to raw bytes."""
    if len(chunk) < _MAX_OVERHEAD:
        raise ValueError(f"blosc chunk too short ({len(chunk)} bytes)")
    flags, typesize = chunk[2], chunk[3]
    nbytes = int.from_bytes(chunk[4:8], "little")
    blocksize = int.from_bytes(chunk[8:12], "little")
    cbytes = int.from_bytes(chunk[12:16], "little")
    if expected_nbytes is not None and nbytes != expected_nbytes:
        raise ValueError(
            f"blosc chunk declares {nbytes} bytes, expected {expected_nbytes}"
        )
    if cbytes != len(chunk):
        raise ValueError(
            f"blosc chunk cbytes {cbytes} != actual length {len(chunk)} — truncated?"
        )
    if flags & _MEMCPYED:  # stored verbatim, no shuffle applied
        return chunk[_MAX_OVERHEAD : _MAX_OVERHEAD + nbytes]
    if flags & _BIT_SHUFFLE:
        raise NotImplementedError(
            "blosc bit-shuffle is not supported without the native library; "
            "re-write the store with byte shuffle or no shuffle"
        )
    cname = _BLOSC_CODECS.get(flags >> 5, f"id{flags >> 5}")
    nblocks = (nbytes + blocksize - 1) // blocksize if blocksize else 1
    starts = np.frombuffer(
        chunk[_MAX_OVERHEAD : _MAX_OVERHEAD + 4 * nblocks], dtype="<u4"
    )
    out = bytearray()
    for j, start in enumerate(starts):
        bsize = min(blocksize, nbytes - j * blocksize)
        nstreams = _split_streams(flags, typesize, blocksize, bsize != blocksize)
        neblock = bsize // nstreams
        pos = int(start)
        parts = []
        for _ in range(nstreams):
            csize = int.from_bytes(chunk[pos : pos + 4], "little")
            payload = chunk[pos + 4 : pos + 4 + csize]
            parts.append(
                payload if csize == neblock else _inner_decompress(cname, payload, neblock)
            )
            pos += 4 + csize
        raw = b"".join(parts)
        if flags & _BYTE_SHUFFLE:
            raw = _unshuffle(raw, typesize)
        out.extend(raw)
    if len(out) != nbytes:
        raise ValueError(f"blosc decode produced {len(out)} bytes, header says {nbytes}")
    return bytes(out)


def blosc_compress(
    raw: bytes,
    typesize: int,
    cname: str = "lz4",
    shuffle: int = 1,
    blocksize: int = 0,
) -> bytes:
    """Encode raw bytes as one blosc chunk (c-blosc 1.x format).

    ``shuffle``: 0 none, 1 byte-shuffle (numcodecs constants); -1 (auto)
    resolves to byte-shuffle when typesize > 1. ``blocksize`` 0 picks a
    1 MiB default rounded to the typesize.
    """
    if shuffle == -1:
        shuffle = 1 if typesize > 1 else 0
    if shuffle == 2:
        raise NotImplementedError("blosc bit-shuffle write is not supported")
    typesize = typesize if 1 <= typesize < 256 else 1
    nbytes = len(raw)
    if not blocksize:
        blocksize = min(max(nbytes, 1), 1 << 20)
    blocksize = min(blocksize, max(nbytes, 1))
    if typesize > 1 and blocksize >= typesize:
        # keep split streams byte-plane aligned (c-blosc forces this too)
        blocksize = blocksize // typesize * typesize
    nblocks = max((nbytes + blocksize - 1) // blocksize, 1)
    # FORWARD_COMPAT split rule (c-blosc default, what numcodecs bundles):
    # split only blosclz/lz4, small typesizes, streams >= MIN_BUFFERSIZE.
    split = (
        cname in ("blosclz", "lz4", "lz4hc")
        and 1 < typesize <= _MAX_SPLITS
        and blocksize // typesize >= _MIN_STREAM
    )
    flags = (_BLOSC_CODEC_IDS[cname] << 5) | (_BYTE_SHUFFLE if shuffle == 1 else 0)
    if not split:
        flags |= _DONT_SPLIT

    starts = np.empty(nblocks, dtype="<u4")
    body = bytearray()
    base = _MAX_OVERHEAD + 4 * nblocks
    for j in range(nblocks):
        block = raw[j * blocksize : min((j + 1) * blocksize, nbytes)]
        if shuffle == 1:
            block = _shuffle(block, typesize)
        nstreams = typesize if split and len(block) == blocksize else 1
        neblock = len(block) // nstreams
        starts[j] = base + len(body)
        for k in range(nstreams):
            stream = block[k * neblock : (k + 1) * neblock]
            comp = _inner_compress(cname, stream)
            if len(comp) >= len(stream):  # incompressible stream: store raw
                comp = stream
            body.extend(len(comp).to_bytes(4, "little"))
            body.extend(comp)

    if base + len(body) >= nbytes + _MAX_OVERHEAD:
        # whole chunk incompressible: MEMCPYED fallback (verbatim, unshuffled)
        header = bytes([2, 1, _MEMCPYED | (flags & 0xE0), typesize])
        cbytes = _MAX_OVERHEAD + nbytes
        return (
            header
            + nbytes.to_bytes(4, "little")
            + blocksize.to_bytes(4, "little")
            + cbytes.to_bytes(4, "little")
            + raw
        )
    cbytes = base + len(body)
    header = bytes([2, 1, flags, typesize])
    return (
        header
        + nbytes.to_bytes(4, "little")
        + blocksize.to_bytes(4, "little")
        + cbytes.to_bytes(4, "little")
        + starts.tobytes()
        + bytes(body)
    )


def zstd_decompress(raw: bytes, nbytes: int) -> bytes:
    return bytes(_pa_codec("zstd").decompress(raw, decompressed_size=nbytes))


def zstd_compress(raw: bytes) -> bytes:
    return bytes(_pa_codec("zstd").compress(raw))


def lz4_numcodecs_decompress(raw: bytes) -> bytes:
    """numcodecs.LZ4 framing: u32-LE original size + LZ4 block data."""
    nbytes = int.from_bytes(raw[:4], "little")
    return bytes(_pa_codec("lz4_raw").decompress(raw[4:], decompressed_size=nbytes))


def lz4_numcodecs_compress(raw: bytes) -> bytes:
    return len(raw).to_bytes(4, "little") + bytes(_pa_codec("lz4_raw").compress(raw))
