"""Minimal public-spec Zarr v2 directory store: reader + test writer.

Implements the subset of the Zarr v2 storage spec
(https://zarr-specs.readthedocs.io/en/latest/v2/v2.0.html) that xarray's
``to_zarr`` produces, so grid tables can be registered directly over the
format users actually have (the reference's primary input — reference
xarray_sql/reader.py:192-337 builds its table provider over Zarr and reads
per-chunk, per-variable byte ranges; ``ZarrArray.read_block`` keeps that
selective-read contract: only chunk files overlapping the requested block
are opened, and only requested variables are touched).

Supported:
- directory layout: group ``.zgroup``/``.zattrs``, one subdirectory per
  array holding ``.zarray``, optional ``.zattrs`` (xarray's
  ``_ARRAY_DIMENSIONS`` names the dims), and chunk files ``i.j.k``
  (``dimension_separator`` "." or "/").
- dtype: any numpy typestr (endian-aware), incl. ``datetime64``.
- compressor: ``null``, ``zlib``, ``gzip`` via the stdlib; anything else
  (blosc, zstd, lz4) is delegated to ``numcodecs`` when importable and
  raises a clear error otherwise (this container has no numcodecs).
- ``fill_value``: chunks absent from disk materialize as the fill
  (Zarr v2 writes are sparse); JSON ``"NaN"``/``"Infinity"`` handled.
- ``order``: "C" or "F".
- filters: only ``null``/``[]`` (xarray's default); otherwise error.
"""

from __future__ import annotations

import gzip
import itertools
import json
import os
import zlib
from typing import Any, Mapping

import numpy as np

_ARRAY_DIMENSIONS = "_ARRAY_DIMENSIONS"


def _read_json(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def _parse_dtype(spec: Any) -> np.dtype:
    if isinstance(spec, str):
        return np.dtype(spec)
    raise NotImplementedError(f"structured Zarr dtypes are not supported: {spec!r}")


def _parse_fill(fill: Any, dtype: np.dtype):
    if fill is None:
        return np.datetime64("NaT") if dtype.kind == "M" else dtype.type(0)
    if isinstance(fill, str) and dtype.kind == "f":
        return dtype.type(float(fill))  # "NaN" / "Infinity" / "-Infinity"
    if dtype.kind == "M":
        return np.int64(fill).view(dtype)
    return dtype.type(fill)


def _decompress(raw: bytes, compressor: dict | None) -> bytes:
    if compressor is None:
        return raw
    cid = compressor.get("id")
    if cid == "zlib":
        return zlib.decompress(raw)
    if cid == "gzip":
        return gzip.decompress(raw)
    try:  # pragma: no cover - numcodecs absent in this container
        import numcodecs

        return numcodecs.get_codec(compressor).decode(raw)
    except ImportError:
        raise NotImplementedError(
            f"Zarr compressor {cid!r} needs numcodecs, which is not "
            f"installed; re-write the store with zlib/gzip/null compression"
        ) from None


def _compress(raw: bytes, compressor: dict | None) -> bytes:
    if compressor is None:
        return raw
    cid = compressor.get("id")
    if cid == "zlib":
        return zlib.compress(raw, compressor.get("level", 6))
    if cid == "gzip":
        return gzip.compress(raw, compresslevel=compressor.get("level", 6))
    raise NotImplementedError(f"unsupported write compressor {cid!r}")


class ZarrArray:
    """Lazy chunk-addressable handle to one Zarr v2 array directory.

    ``read_block(slices)`` opens ONLY the chunk files overlapping the
    requested extent (``last_opened`` records them for observability
    tests) and assembles the block, substituting ``fill_value`` for
    chunks that were never written.
    """

    def __init__(self, path: str, meta: dict | None = None):
        self.path = path
        if meta is None:
            meta = _read_json(os.path.join(path, ".zarray"))
        if meta.get("zarr_format") != 2:
            raise ValueError(f"{path}: not a Zarr v2 array")
        if meta.get("filters"):
            raise NotImplementedError(f"{path}: Zarr filters are not supported")
        self.shape = tuple(int(n) for n in meta["shape"])
        self.chunks = tuple(int(c) for c in meta["chunks"])
        self.dtype = _parse_dtype(meta["dtype"])
        self.order = meta.get("order", "C")
        self.fill_value = _parse_fill(meta.get("fill_value"), self.dtype)
        self.compressor = meta.get("compressor")
        self.separator = meta.get("dimension_separator", ".")
        self.last_opened: list[str] = []

    def _chunk_file(self, idx: tuple[int, ...]) -> str:
        key = self.separator.join(str(i) for i in idx) if idx else "0"
        return os.path.join(self.path, key)

    def _load_chunk(self, idx: tuple[int, ...]) -> np.ndarray | None:
        fname = self._chunk_file(idx)
        if not os.path.exists(fname):
            return None  # sparse chunk -> fill_value
        self.last_opened.append(os.path.basename(fname))
        with open(fname, "rb") as f:
            raw = _decompress(f.read(), self.compressor)
        return np.frombuffer(raw, dtype=self.dtype).reshape(
            self.chunks, order=self.order
        )

    def read_block(self, slices: tuple[slice, ...]) -> np.ndarray:
        self.last_opened = []
        bounds = [
            (
                s.start if s.start is not None else 0,
                s.stop if s.stop is not None else n,
            )
            for s, n in zip(slices, self.shape)
        ]
        out_shape = tuple(hi - lo for lo, hi in bounds)
        out = np.empty(out_shape, dtype=self.dtype)
        if 0 in out_shape:
            return out
        chunk_ranges = [
            range(lo // c, (hi - 1) // c + 1)
            for (lo, hi), c in zip(bounds, self.chunks)
        ]
        for idx in itertools.product(*chunk_ranges):
            chunk = self._load_chunk(idx)
            # intersection of this chunk with the requested block, both in
            # global coordinates
            inter = [
                (max(lo, i * c), min(hi, (i + 1) * c, n))
                for (lo, hi), i, c, n in zip(bounds, idx, self.chunks, self.shape)
            ]
            out_sel = tuple(
                slice(g0 - lo, g1 - lo) for (g0, g1), (lo, _) in zip(inter, bounds)
            )
            if chunk is None:
                out[out_sel] = self.fill_value
            else:
                chunk_sel = tuple(
                    slice(g0 - i * c, g1 - i * c)
                    for (g0, g1), i, c in zip(inter, idx, self.chunks)
                )
                out[out_sel] = chunk[chunk_sel]
        return out

    def values(self) -> np.ndarray:
        return self.read_block(tuple(slice(0, n) for n in self.shape))


def _array_dirs(path: str) -> list[str]:
    return sorted(
        name
        for name in os.listdir(path)
        if os.path.isfile(os.path.join(path, name, ".zarray"))
    )


def _load_group_metadata(path: str) -> tuple[dict, dict[str, tuple[dict, dict]]]:
    """(group attrs, {array name: (.zarray meta, .zattrs)}).

    Prefers consolidated metadata (``.zmetadata``, what xarray writes with
    ``consolidated=True``): ONE metadata read instead of 2 per array — on
    object stores with thousands of variables that is the difference
    between one round trip and thousands at registration time."""
    zmeta_path = os.path.join(path, ".zmetadata")
    if os.path.isfile(zmeta_path):
        entries = _read_json(zmeta_path)["metadata"]
        attrs = entries.get(".zattrs", {})
        arrays: dict[str, tuple[dict, dict]] = {}
        for key, val in entries.items():
            if key.endswith("/.zarray"):
                name = key[: -len("/.zarray")]
                arrays[name] = (val, entries.get(f"{name}/.zattrs", {}))
        return attrs, dict(sorted(arrays.items()))
    group_attrs_path = os.path.join(path, ".zattrs")
    attrs = _read_json(group_attrs_path) if os.path.isfile(group_attrs_path) else {}
    arrays = {}
    for name in _array_dirs(path):
        zarray = _read_json(os.path.join(path, name, ".zarray"))
        zattrs_path = os.path.join(path, name, ".zattrs")
        zattrs = _read_json(zattrs_path) if os.path.isfile(zattrs_path) else {}
        arrays[name] = (zarray, zattrs)
    return attrs, arrays


def open_zarr(path: str):
    """Open a Zarr v2 directory group as a lazy :class:`Dataset`.

    Coordinates (1-D arrays whose ``_ARRAY_DIMENSIONS`` is their own name,
    the xarray convention) load eagerly — they are small and drive the
    partition-bounds metadata. Data variables stay chunk-lazy; executors
    read only the chunk files their block overlaps (reference selective
    read: xarray_sql/reader.py:270-303).
    """
    from xarray_sql_spark.dataset import Dataset, Variable

    if (
        not os.path.isfile(os.path.join(path, ".zgroup"))
        and not os.path.isfile(os.path.join(path, ".zmetadata"))
        and not _array_dirs(path)
    ):
        raise ValueError(f"{path}: not a Zarr v2 group")
    attrs, arrays = _load_group_metadata(path)

    coords: dict[str, np.ndarray] = {}
    coord_attrs: dict[str, dict] = {}
    data_vars: dict[str, Variable] = {}
    extra_coords: dict[str, Variable] = {}
    for name, (zarray_meta, zattrs) in arrays.items():
        arr = ZarrArray(os.path.join(path, name), zarray_meta)
        zattrs = dict(zattrs)
        dims = tuple(zattrs.pop(_ARRAY_DIMENSIONS, ()) or (f"dim_{i}" for i in range(len(arr.shape))))
        if dims == (name,) and len(arr.shape) == 1:
            coords[name] = arr.values()
            if zattrs:
                coord_attrs[name] = zattrs
        else:
            data_vars[name] = Variable(dims, arr, zattrs)
    ds = Dataset(data_vars, coords, attrs, extra_coords)
    ds.coord_attrs = coord_attrs
    return ds


def write_zarr(
    ds,
    path: str,
    chunks: Mapping[str, int] | None = None,
    compressor: dict | None = {"id": "zlib", "level": 1},
) -> str:
    """Write a :class:`Dataset` as a Zarr v2 directory tree (test twin of
    xarray's ``to_zarr``; real stores read back through the same
    :func:`open_zarr`). Edge chunks are padded to full chunk shape as the
    spec requires; all-fill chunks are still written (simplicity over
    sparseness — the reader handles both)."""
    os.makedirs(path, exist_ok=True)
    consolidated: dict[str, Any] = {".zgroup": {"zarr_format": 2}}
    with open(os.path.join(path, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)
    if ds.attrs:
        group_attrs = json.loads(json.dumps(ds.attrs, default=str))
        consolidated[".zattrs"] = group_attrs
        with open(os.path.join(path, ".zattrs"), "w") as f:
            json.dump(group_attrs, f)

    def write_array(name: str, dims: tuple[str, ...], data: np.ndarray, attrs: dict):
        data = np.ascontiguousarray(data)
        adir = os.path.join(path, name)
        os.makedirs(adir, exist_ok=True)
        chunk_shape = tuple(
            min((chunks or {}).get(d, n), n) if n else 1 for d, n in zip(dims, data.shape)
        )
        fill = (
            "NaN"
            if data.dtype.kind == "f"
            else 0
            if data.dtype.kind != "M"
            else None
        )
        meta = {
            "zarr_format": 2,
            "shape": list(data.shape),
            "chunks": list(chunk_shape) or [1],
            "dtype": data.dtype.str,
            "compressor": compressor,
            "fill_value": fill,
            "order": "C",
            "filters": None,
        }
        with open(os.path.join(adir, ".zarray"), "w") as f:
            json.dump(meta, f)
        zattrs = json.loads(
            json.dumps({_ARRAY_DIMENSIONS: list(dims), **attrs}, default=str)
        )
        with open(os.path.join(adir, ".zattrs"), "w") as f:
            json.dump(zattrs, f)
        consolidated[f"{name}/.zarray"] = meta
        consolidated[f"{name}/.zattrs"] = zattrs
        grid = [range((n + c - 1) // c) for n, c in zip(data.shape, chunk_shape)]
        for idx in itertools.product(*grid) if data.shape else [()]:
            sel = tuple(
                slice(i * c, min((i + 1) * c, n))
                for i, c, n in zip(idx, chunk_shape, data.shape)
            )
            block = data[sel]
            if block.shape != chunk_shape:  # pad edge chunk to full size
                padded = np.zeros(chunk_shape, dtype=data.dtype)
                padded[tuple(slice(0, s) for s in block.shape)] = block
                block = padded
            key = ".".join(str(i) for i in idx) if idx else "0"
            with open(os.path.join(adir, key), "wb") as f:
                f.write(_compress(np.ascontiguousarray(block).tobytes(), compressor))

    for d, c in ds.coords.items():
        write_array(d, (d,), np.asarray(c), dict(ds.coord_attrs.get(d, {})))
    for name, var in ds.data_vars.items():
        write_array(name, var.dims, var.values(), dict(var.attrs))
    # consolidated metadata (xarray's consolidated=True default): readers
    # get the whole group's metadata in one file read
    with open(os.path.join(path, ".zmetadata"), "w") as f:
        json.dump({"zarr_consolidated_format": 1, "metadata": consolidated}, f)
    return path
