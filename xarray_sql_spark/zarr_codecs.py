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
  0 blosclz, 1 lz4/lz4hc, 2 snappy, 3 zlib, 4 zstd — lz4/zstd/snappy
  map onto pyarrow codecs, zlib onto the stdlib, and blosclz (c-blosc's
  default cname; the FastLZ level-2 stream format) decodes in pure
  Python. Bit-shuffle (header flag 0x4, the bitshuffle project's
  bit-plane transpose) is a vectorized numpy bit transpose, applied per
  block like byte shuffle.
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


# ---------------------------------------------------------------------------
# blosclz — c-blosc's default inner codec. The stream format is FastLZ
# level 2 (public: fastlz.c / c-blosc's blosclz.c): a token stream where
# the first token is always a literal run (the decoder masks the first
# control byte with 31).
#
#   literal run   ctrl < 32: ctrl+1 bytes follow verbatim (max 32).
#   short match   ctrl>>5 in 1..6: copy length L = (ctrl>>5)+2 (3..8),
#                 distance D = ((ctrl&31)<<8) + next_byte + 1 (1..8191).
#   long match    ctrl>>5 == 7: extension bytes add to the length
#                 (L = 9 + sum, each 255 continues), then the distance
#                 low byte as above.
#   far match     low byte == 255 AND ctrl&31 == 31: two more bytes form
#                 ofs16, D = ofs16 + 8192 (the escape means distances
#                 1..8191 never encode the low byte 255 with hi 31).
#
# Matches may overlap their output (D < L repeats the last D bytes).
# Pure Python per-token decode — used for foreign test stores, not a hot
# path (real bulk data goes through lz4/zstd via pyarrow).
_BLZ_MAX_DIST = 8191  # c-blosc MAX_DISTANCE
_BLZ_MAX_FAR = 65535 + _BLZ_MAX_DIST - 1  # c-blosc MAX_FARDISTANCE


def blosclz_decompress(data: bytes, nbytes: int) -> bytes:
    """Decode one blosclz (FastLZ level-2 format) stream to ``nbytes``."""
    out = bytearray()
    ip, n = 0, len(data)
    if n == 0:
        if nbytes:
            raise ValueError("blosclz: empty stream for non-empty block")
        return b""
    ctrl = data[ip] & 31
    ip += 1
    while True:
        if ctrl >= 32:
            length = (ctrl >> 5) - 1
            ofs = (ctrl & 31) << 8
            if length == 6:  # 7-1: long match, extension byte(s)
                while True:
                    if ip >= n:
                        raise ValueError("blosclz: truncated match token")
                    code = data[ip]
                    ip += 1
                    length += code
                    if code != 255:
                        break
            if ip >= n:
                raise ValueError("blosclz: truncated match token")
            code = data[ip]
            ip += 1
            length += 3
            if code == 255 and ofs == (31 << 8):  # far match
                if ip + 2 > n:
                    raise ValueError("blosclz: truncated match token")
                dist = (data[ip] << 8) + data[ip + 1] + _BLZ_MAX_DIST + 1
                ip += 2
            else:
                dist = ofs + code + 1
            start = len(out) - dist
            if start < 0:
                raise ValueError("blosclz: match reaches before stream start")
            if dist >= length:
                out += out[start : start + length]
            else:  # overlapping match repeats the trailing D bytes
                pat = bytes(out[start:])
                out += (pat * (length // dist + 1))[:length]
        else:
            run = ctrl + 1
            if ip + run > n:
                raise ValueError("blosclz: literal run past end of stream")
            out += data[ip : ip + run]
            ip += run
        if ip < n:
            ctrl = data[ip]
            ip += 1
        else:
            break
    if len(out) != nbytes:
        raise ValueError(f"blosclz: decoded {len(out)} bytes, expected {nbytes}")
    return bytes(out)


def blosclz_compress(raw: bytes) -> bytes:
    """Greedy blosclz encoder (hash-4 match finder). Emits only tokens the
    public format defines, so real c-blosc decodes the output; used by the
    test/sink writer — compression ratio is secondary to validity."""
    n = len(raw)
    out = bytearray()
    table: dict[bytes, int] = {}
    lit_start = 0
    i = 0

    def _flush_literals(upto: int) -> None:
        nonlocal lit_start
        p = lit_start
        while p < upto:
            run = min(32, upto - p)
            out.append(run - 1)
            out.extend(raw[p : p + run])
            p += run
        lit_start = upto

    def _emit_match(length: int, dist: int) -> None:
        d = dist - 1
        lenc = length - 2
        if d < _BLZ_MAX_DIST:
            hi, lo = d >> 8, d & 255
            if lenc < 7:
                out.append((lenc << 5) | hi)
                out.append(lo)
            else:
                out.append((7 << 5) | hi)
                rem = lenc - 7
                while rem >= 255:
                    out.append(255)
                    rem -= 255
                out.append(rem)
                out.append(lo)
        else:  # far match: escape = low byte 255 with hi 31
            ofs16 = d - _BLZ_MAX_DIST
            if lenc < 7:
                out.append((lenc << 5) | 31)
            else:
                out.append((7 << 5) | 31)
                rem = lenc - 7
                while rem >= 255:
                    out.append(255)
                    rem -= 255
                out.append(rem)
            out.append(255)
            out.append(ofs16 >> 8)
            out.append(ofs16 & 255)

    while i + 4 <= n:
        key = raw[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= _BLZ_MAX_FAR and i > 0:
            length = 4
            limit = n - i
            while length < limit and raw[cand + length] == raw[i + length]:
                length += 1
            _flush_literals(i)
            _emit_match(length, i - cand)
            # index a few positions inside the match so later data can
            # still find it (full indexing is needless for test stores)
            for j in range(i + 1, min(i + length, n - 3)):
                table[raw[j : j + 4]] = j
            i += length
            lit_start = i
        else:
            i += 1
    _flush_literals(n)
    return bytes(out)


# ---------------------------------------------------------------------------
# bitshuffle — the bit-plane transpose c-blosc applies when header flag
# 0x4 is set (bitshuffle project / c-blosc shuffle.c, public). Semantics
# per block: view the block as ``nelem`` elements of ``typesize`` bytes,
# truncated to a multiple of 8 elements (the tail, including any partial
# element, is copied verbatim). Output row (ii, jj) — byte ii of the
# element, bit jj (LSB-first) — holds that bit of every element, packed 8
# elements per byte, element order LSB-first. That is exactly c-blosc's
# bshuf_trans_byte_elem + bshuf_trans_bit_byte (TRANS_BIT_8X8 maps bit
# (8i+j) to bit (8j+i)) + bshuf_trans_bitrow_eight composition.


def bitshuffle(block: bytes, typesize: int) -> bytes:
    typesize = max(typesize, 1)
    nelem = (len(block) // typesize) & ~7
    main = nelem * typesize
    if main == 0:
        return block
    a = np.frombuffer(block[:main], dtype=np.uint8).reshape(nelem, typesize)
    bits = np.unpackbits(a, axis=1, bitorder="little").reshape(nelem, typesize, 8)
    planes = np.transpose(bits, (1, 2, 0))  # [byte-of-elem, bit, elem]
    out = np.packbits(planes.reshape(typesize * 8, nelem), axis=1, bitorder="little")
    return out.tobytes() + block[main:]


def bitunshuffle(block: bytes, typesize: int) -> bytes:
    typesize = max(typesize, 1)
    nelem = (len(block) // typesize) & ~7
    main = nelem * typesize
    if main == 0:
        return block
    rows = np.frombuffer(block[:main], dtype=np.uint8).reshape(typesize * 8, nelem // 8)
    bits = np.unpackbits(rows, axis=1, bitorder="little").reshape(typesize, 8, nelem)
    elems = np.transpose(bits, (2, 0, 1)).reshape(nelem * typesize, 8)
    return np.packbits(elems, axis=1, bitorder="little").tobytes() + block[main:]


def _inner_decompress(cname: str, payload: bytes, nbytes: int) -> bytes:
    """One blosc block body -> raw bytes (pyarrow-backed; blosclz pure
    Python)."""
    if cname == "lz4":  # blosc stores LZ4 *block* format
        return bytes(_pa_codec("lz4_raw").decompress(payload, decompressed_size=nbytes))
    if cname == "zstd":
        return bytes(_pa_codec("zstd").decompress(payload, decompressed_size=nbytes))
    if cname == "snappy":
        return bytes(_pa_codec("snappy").decompress(payload, decompressed_size=nbytes))
    if cname == "zlib":
        import zlib

        return zlib.decompress(payload)
    if cname == "blosclz":
        return blosclz_decompress(payload, nbytes)
    raise NotImplementedError(
        f"blosc inner codec {cname!r} has no pure-Python/pyarrow decoder "
        f"(re-write the store with blosclz/lz4/zstd/snappy/zlib)"
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
    if cname == "blosclz":
        return blosclz_compress(raw)
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
        elif flags & _BIT_SHUFFLE:  # applied per block, like byte shuffle
            raw = bitunshuffle(raw, typesize)
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
    flags = _BLOSC_CODEC_IDS[cname] << 5
    if shuffle == 1:
        flags |= _BYTE_SHUFFLE
    elif shuffle == 2:
        flags |= _BIT_SHUFFLE
    if not split:
        flags |= _DONT_SPLIT

    starts = np.empty(nblocks, dtype="<u4")
    body = bytearray()
    base = _MAX_OVERHEAD + 4 * nblocks
    for j in range(nblocks):
        block = raw[j * blocksize : min((j + 1) * blocksize, nbytes)]
        if shuffle == 1:
            block = _shuffle(block, typesize)
        elif shuffle == 2:
            block = bitshuffle(block, typesize)
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
