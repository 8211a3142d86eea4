"""Distributed Zarr v2 sink: executors write chunk files in parallel.

``XarrayDataFrame.to_zarr`` materializes the result on the driver first —
right for small grids (and what the reference's eager reverse pivot does),
wrong at scale. This sink keeps the data on executors end to end:

1. coordinates are the only thing collected (one ``distinct`` per dim —
   axes are small by construction);
2. every row gets its chunk index via a broadcast position join, rows
   shuffle ONCE on the chunk key;
3. each chunk-key group scatter-fills its dense block and writes the chunk
   file directly from the executor (``applyInPandas``);
4. the driver writes only metadata (``.zarray``/``.zattrs``/``.zmetadata``)
   and the coordinate arrays.

The output is a plain public-spec Zarr v2 group readable by
``zarr_store.open_zarr`` (and any Zarr client). ``path`` must be storage
every executor can reach (shared FS / object store on a cluster; the local
FS here). Chunk writes are idempotent (a retry rewrites the same bytes)
AND atomic (attempt-unique temp file + rename), so task retries and
speculative twin attempts are both safe — two concurrent truncate-in-place
writers of even identical bytes could race a kill into a short file. Cells absent from the result stay
at ``fill_value`` (sparse chunks: all-missing chunks are never written);
duplicate (dims) rows are last-writer-wins, same as the eager scatter.
"""

from __future__ import annotations

import json
import os
from collections.abc import Mapping, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xarray_sql_spark.zarr_store import (
    _ARRAY_DIMENSIONS,
    _compress,
    _vlen_encode,
    v2_array_meta,
    v3_array_meta,
    v3_codec_chain,
)

_SPARK_TO_NP = {
    "double": "<f8",
    "float": "<f4",
    "bigint": "<i8",
    "int": "<i4",
    "smallint": "<i2",
    "tinyint": "|i1",
    "boolean": "|b1",
    "timestamp": "<M8[us]",
    "timestamp_ntz": "<M8[us]",
    "string": "|O",  # vlen-utf8 layout (numcodecs object codec)
}


def _np_dtype(spark_type: str, col: str) -> np.dtype:
    try:
        return np.dtype(_SPARK_TO_NP[spark_type])
    except KeyError:
        raise NotImplementedError(
            f"column {col!r}: Spark type {spark_type!r} has no Zarr mapping "
            f"(supported: {sorted(_SPARK_TO_NP)})"
        ) from None


# Axis guard: axes are driver-resident by contract (same as the
# reference's coords), but "bounded by axis length" must stay bounded —
# 2^24 values × 8 B ≈ 134 MB is already generous for a coordinate axis;
# past that the caller should chunk the dim itself.
MAX_AXIS_LEN = 1 << 24


def _collect_axes(
    df: DataFrame, dims: Sequence[str], dim_dtypes: Mapping[str, np.dtype]
) -> dict[str, np.ndarray]:
    """One distinct+sort per dim, fetched as Arrow batches (no py4j row
    objects) with a hard length guard — the LIMIT bounds driver memory
    BEFORE materialization, so an accidentally-huge axis fails fast
    instead of OOMing the driver."""
    coords: dict[str, np.ndarray] = {}
    for d in dims:
        tbl = df.select(d).distinct().orderBy(d).limit(MAX_AXIS_LEN + 1).toArrow()
        if tbl.num_rows > MAX_AXIS_LEN:
            raise ValueError(
                f"write_zarr_distributed: dim {d!r} has more than "
                f"{MAX_AXIS_LEN} distinct values — not a coordinate axis; "
                f"chunk the dim or aggregate before writing"
            )
        coords[d] = (
            tbl.column(0).to_pandas().to_numpy().astype(dim_dtypes[d])
        )
    return coords


def rechunk_zarr(
    spark,
    src: str,
    dst: str,
    chunks: Mapping[str, int],
    compressor: dict | None = {"id": "zlib", "level": 1},
    zarr_format: int = 2,
    shards: Mapping[str, int] | None = None,
) -> dict[str, int]:
    """Executor-parallel rechunk: read the store at ``src`` through the
    grid DataSource and write ``dst`` with a new chunk grid (and
    optionally a new codec / format / shard layout) — the classic
    "rechunker" job as ONE shuffle: source chunks are read in parallel,
    rows exchange once on their DESTINATION chunk key, each destination
    chunk file is written whole from the executor holding it. The plan is
    a pure scan, so A12 identity detection feeds the destination axes
    from source coordinate metadata — zero driver-side axis jobs at any
    axis length. Returns {chunk_key: rows_written}.

    This is the operation behind "my chunks are wrong for my access
    pattern" (time-chunked archive -> space-chunked serving layout, many
    tiny chunks -> object-store-sized shards via ``zarr_format=3`` +
    ``shards``).

    CF-PACKED variables (scale_factor/add_offset/_Unsigned int packing)
    refuse: rechunking them through the decoded domain would silently
    re-encode int16 archives as float64 chunks (4x the bytes) and drop
    the packing attrs — decode explicitly and write a decoded store if
    that is what you want. Unpacked variables pass through
    value-identical; CF TIME coordinates re-encode as timestamp
    microseconds (value-preserving)."""
    import uuid

    from xarray_sql_spark.dataset import Dataset
    from xarray_sql_spark.xr_session import XarraySession
    from xarray_sql_spark.zarr_store import CFScaledArray

    ds = Dataset.open_store(src)
    packed = [
        n for n, var in ds.data_vars.items()
        if isinstance(getattr(var, "data", None), CFScaledArray)
    ]
    if packed:
        raise NotImplementedError(
            f"rechunk_zarr: variables {packed} are CF-packed; rechunking "
            f"would re-encode them in the decoded (float) domain and drop "
            f"the packing — not supported"
        )
    if not ds.data_vars:
        raise ValueError(
            f"rechunk_zarr: store at {src!r} has no data variables — "
            "nothing to rechunk"
        )
    xs = XarraySession(spark)
    name = f"__rechunk_{uuid.uuid4().hex[:12]}"
    # register with the SOURCE chunk grid so reads parallelize over the
    # existing partitioning; all vars must share one dims/chunk geometry
    # (SELECT * pivots them into one table)
    dims, src_chunks = None, None
    for vname, var in ds.data_vars.items():
        za = getattr(var, "data", None)
        v_chunks = (
            dict(zip(var.dims, za.chunks)) if hasattr(za, "chunks") else None
        )
        if dims is None:
            dims, src_chunks = var.dims, v_chunks
        elif var.dims != dims or v_chunks != src_chunks:
            raise ValueError(
                f"rechunk_zarr requires a uniform dims/chunk geometry; "
                f"{vname!r} has {var.dims}/{v_chunks}, expected "
                f"{dims}/{src_chunks}"
            )
    xs.from_dataset(name, ds, chunks=src_chunks or None, store=src)
    res = xs.sql(
        f"SELECT * FROM {name}"  # noqa: S608 — internal generated view name
    )
    return res.to_zarr_distributed(
        dst, dims=list(dims), chunks=dict(chunks), compressor=compressor,
        zarr_format=zarr_format, shards=shards,
    )


def write_zarr_region(
    df: DataFrame,
    path: str,
    region: Mapping[str, tuple[int, int]],
    validate: bool = True,
) -> dict[str, int]:
    """Executor-parallel OVERWRITE of a chunk-aligned rectangular region
    of an EXISTING Zarr store (xarray's ``to_zarr(region=...)``, scaled
    out): each touched chunk file is rewritten whole from the executor
    holding its rows; metadata is untouched, so concurrent readers only
    ever see complete old or complete new chunks (chunk writes are
    atomic-by-replacement and idempotent under task retry).

    ``region`` maps dim name -> (start, stop) POSITIONS; dims omitted
    cover their full extent. Every touched dim's bounds must land on
    chunk boundaries (a straddling chunk would need read-modify-write,
    which breaks retry idempotence) — misalignment raises. Chunk
    rewrite granularity is per chunk WITH rows: a chunk holding at
    least one ``df`` row is rewritten wholesale (its cells absent from
    ``df`` become the store's fill_value; duplicate dim-tuples are
    last-writer-wins in an unspecified order, like the full sink), and
    a region chunk with NO rows is left untouched. With
    ``validate=True`` a row of ``df`` whose dim values fall OUTSIDE the
    region raises instead of being silently dropped; the validate count
    also eagerly materializes ``df`` (localCheckpoint) BEFORE any chunk
    is replaced, so a read-transform-overwrite of the SAME store cannot
    recompute its inputs from half-overwritten chunks under task retry.

    Like :func:`append_zarr`, this operates in the RAW encoded domain:
    open the store with ``decode_cf=False`` spelling when checking what
    to write — CF-packed/time-encoded stores expect raw values.
    Sharded (v3 sharding_indexed) and filter-chain variables refuse:
    their chunk bytes are not independently rewritable."""
    from xarray_sql_spark.zarr_store import open_zarr

    ds = open_zarr(path, decode_cf=False)
    dim_names = set(ds.coords)
    var_cols = [c for c in df.columns if c not in dim_names]
    dims_cols = [c for c in df.columns if c in dim_names]
    if not var_cols:
        raise ValueError("no value columns: every column is a dim")
    unknown = [v for v in var_cols if v not in ds.data_vars]
    if unknown:
        raise ValueError(f"columns {unknown} are not variables of {path}")
    arrays = {v: ds.data_vars[v].data for v in var_cols}
    dims = ds.data_vars[var_cols[0]].dims
    for v in var_cols:
        if ds.data_vars[v].dims != dims:
            raise ValueError(
                f"region write requires uniform dims; {v!r} has "
                f"{ds.data_vars[v].dims}, expected {dims}"
            )
        za = arrays[v]
        if getattr(za, "_shard", None):
            raise NotImplementedError(
                f"{v}: region writes into sharded stores are not supported"
            )
        if getattr(za, "filters", None) and za._vlen is None:
            raise NotImplementedError(
                f"{v}: region writes through filter chains are not supported"
            )
        if getattr(za, "order", "C") != "C" or getattr(za, "_transpose_order", None):
            raise NotImplementedError(
                f"{v}: region writes into F-order / transpose-codec stores "
                f"are not supported (the writer emits C-order chunks)"
            )
    ref0 = arrays[var_cols[0]]
    for v in var_cols[1:]:
        za = arrays[v]
        if za.shape != ref0.shape or za.chunks != ref0.chunks:
            raise ValueError(
                f"region write requires a uniform chunk grid; {v!r} has "
                f"shape {za.shape} chunks {za.chunks}, expected "
                f"{ref0.shape} / {ref0.chunks}"
            )
    if sorted(dims_cols) != sorted(dims):
        raise ValueError(f"df must carry dim columns {dims}, got {dims_cols}")
    bad = [d for d in region if d not in dims]
    if bad:
        raise ValueError(f"region dims {bad} not in store dims {dims}")

    ref = arrays[var_cols[0]]
    bounds: dict[str, tuple[int, int]] = {}
    for ax, d in enumerate(dims):
        size, chunk = ref.shape[ax], ref.chunks[ax]
        start, stop = region.get(d, (0, size))
        if not (0 <= start < stop <= size):
            raise ValueError(f"region {d}=({start}, {stop}) outside [0, {size})")
        if start % chunk or (stop % chunk and stop != size):
            raise ValueError(
                f"region {d}=({start}, {stop}) is not aligned to chunk "
                f"size {chunk} (read-modify-write of straddled chunks is "
                f"not supported)"
            )
        bounds[d] = (start, stop)

    spark = df.sparkSession
    total = None
    if validate:
        # eager materialization FIRST: if df reads the same store it is
        # about to overwrite, a retried task must replay from the
        # checkpointed rows, never re-scan half-overwritten chunks
        df = df.localCheckpoint(eager=True)
        total = df.count()

    # position join against the store's own coordinate slice (raw domain)
    work = df
    for ax, d in enumerate(dims):
        start, stop = bounds[d]
        pos_pdf = pd.DataFrame({
            d: np.asarray(ds.coords[d][start:stop]),
            f"__pos_{d}": np.arange(start, stop, dtype=np.int64),
        })
        work = work.join(F.broadcast(spark.createDataFrame(pos_pdf)), d)
        work = work.withColumn(
            f"__ck_{d}", F.expr(f"__pos_{d} div {ref.chunks[ax]}").cast("int")
        )

    dlist, vlist = list(dims), list(var_cols)
    metas = {v: arrays[v] for v in vlist}

    def _write_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        idx = tuple(int(pdf[f"__ck_{d}"].iloc[0]) for d in dlist)
        for v in vlist:
            za = metas[v]
            locs = tuple(
                pdf[f"__pos_{d}"].to_numpy(dtype=np.int64) - i * c
                for d, i, c in zip(dlist, idx, za.chunks)
            )
            dt = za._storage_dtype
            block = np.full(za.chunks, za.fill_value, dtype=dt)
            if dt.kind in "iub" and pdf[v].isna().any():
                raise ValueError(
                    f"write_zarr_region: column {v!r} maps to non-nullable "
                    f"dtype {dt} but contains NULLs"
                )
            vals = pdf[v].to_numpy()
            if dt.kind == "O":
                vals = np.array(
                    [za.fill_value if x is None else str(x) for x in vals],
                    dtype=object,
                )
                block[locs] = vals
                raw = _vlen_encode(block)
                ts = 1
            else:
                if dt.kind == "f":  # NULL -> fill (matches absent cells)
                    vals = pd.to_numeric(pdf[v], errors="coerce").to_numpy()
                    # coercion yields NaN for NULL; map those cells to the
                    # store's fill_value so a non-NaN fill (0, -9999) reads
                    # back as "absent", not as a spurious NaN (r7 ADVICE)
                    fv = za.fill_value
                    if fv is not None and not (
                        isinstance(fv, float) and np.isnan(fv)
                    ):
                        vals = np.where(np.isnan(vals), fv, vals)
                block[locs] = vals.astype(dt)
                raw = np.ascontiguousarray(block).tobytes()
                ts = dt.itemsize
            fname = za._chunk_file(idx)
            os.makedirs(os.path.dirname(fname), exist_ok=True)
            # atomic-by-replacement: never truncate the live chunk — a
            # concurrent reader (or a crash mid-write, or a speculative
            # twin attempt) must see either the complete old bytes or the
            # complete new bytes
            import uuid as _uuid

            tmp = f"{fname}.__tmp_{_uuid.uuid4().hex}"
            with open(tmp, "wb") as f:
                f.write(_compress(raw, za.compressor, ts))
            os.replace(tmp, fname)
        key = ".".join(str(i) for i in idx)
        return pd.DataFrame({"chunk": [key], "n": [len(pdf)]})

    stats = (
        work.groupBy(*[f"__ck_{d}" for d in dims])
        .applyInPandas(_write_chunk, "chunk string, n long")
        .collect()
    )
    written = {r["chunk"]: r["n"] for r in stats}
    if validate:
        inside = sum(written.values())
        if inside != total:
            raise ValueError(
                f"write_zarr_region: {total - inside} of {total} rows "
                f"fall outside region {dict(bounds)} (or carry dim "
                f"values absent from the store's coordinates)"
            )
    return written


def write_zarr_distributed(
    df: DataFrame,
    path: str,
    dims: Sequence[str],
    chunks: Mapping[str, int] | None = None,
    compressor: dict | None = {"id": "zlib", "level": 1},
    zarr_format: int = 2,
    shards: Mapping[str, int] | None = None,
    coords: Mapping[str, np.ndarray] | None = None,
) -> dict[str, int]:
    """Write ``df`` (dim columns + value columns) as a chunked Zarr v2 (or
    v3) group with executor-parallel chunk writes. Returns
    {chunk_key: rows_written}.

    ``chunks`` defaults to splitting the FIRST dim into ~32 chunks (one
    write task per core here; on a cluster pick chunks so a block is
    10-100 MB). Coordinates are sorted ascending. ``zarr_format=3`` emits
    ``zarr.json`` metadata, ``c/``-prefixed chunk keys and a
    bytes(+gzip) codec chain instead of the v2 dialect. ``shards`` (v3
    only) groups rows by SHARD instead: each task writes one
    sharding_indexed file — inner chunk payloads + crc32c-checked binary
    index — giving the few-big-files layout object stores want while the
    reader keeps sub-shard range reads.

    ``coords`` (optional) supplies the per-dim axis arrays directly —
    callers that already KNOW the axes (a pure scan of a registered grid:
    ``to_zarr_distributed`` passes the source's coords) skip the per-dim
    distinct jobs entirely; values must be sorted ascending and cover
    every row's dim value (cells outside stay at fill).
    """
    if shards and zarr_format != 3:
        raise ValueError("shards requires zarr_format=3")
    dims = list(dims)
    spark_types = dict(df.dtypes)
    var_cols = [c for c in df.columns if c not in dims]
    if not var_cols:
        raise ValueError("no value columns: every column is a dim")
    dtypes = {v: _np_dtype(spark_types[v], v) for v in var_cols}
    dim_dtypes = {d: _np_dtype(spark_types[d], d) for d in dims}

    if coords is not None:
        missing = [d for d in dims if d not in coords]
        if missing:
            raise ValueError(f"coords missing dims {missing}")
        axes = {d: np.asarray(coords[d]).astype(dim_dtypes[d]) for d in dims}
        # axes known → the plan runs exactly once (the chunk write); no
        # persist needed
        return _write_persisted(
            df, path, dims, chunks, compressor, zarr_format, var_cols, dtypes,
            dim_dtypes, shards, axes,
        )

    # The plan is consumed N_dims+1 times (one distinct per dim + the chunk
    # write); persist so an expensive upstream query computes once, not
    # once per consumer. Released in the finally below.
    df = df.persist()
    try:
        return _write_persisted(
            df, path, dims, chunks, compressor, zarr_format, var_cols, dtypes,
            dim_dtypes, shards, None,
        )
    finally:
        df.unpersist()


def _write_persisted(
    df: DataFrame,
    path: str,
    dims: list,
    chunks: Mapping[str, int] | None,
    compressor: dict | None,
    zarr_format: int,
    var_cols: list,
    dtypes: dict,
    dim_dtypes: dict,
    shards: Mapping[str, int] | None = None,
    axes: dict | None = None,
) -> dict[str, int]:
    # 1) axes (small): caller-supplied, else one Arrow-fetched
    #    distinct+sort per dim (bounded by MAX_AXIS_LEN)
    coords = axes if axes is not None else _collect_axes(df, dims, dim_dtypes)
    sizes = {d: len(coords[d]) for d in dims}
    if any(sizes[d] == 0 for d in dims):
        raise ValueError("empty result: nothing to write")
    if chunks is None:
        chunks = {dims[0]: max(1, -(-sizes[dims[0]] // 32))}
    chunk_shape = tuple(min(chunks.get(d, sizes[d]), sizes[d]) for d in dims)
    if shards:
        shard_shape = tuple(
            min(shards.get(d, sizes[d]), sizes[d]) for d in dims
        )
        # spec: shard shape is a whole multiple of the inner chunk shape
        shard_shape = tuple(
            (s // c) * c if s >= c else c for s, c in zip(shard_shape, chunk_shape)
        )
        key_shape = shard_shape
    else:
        key_shape = chunk_shape

    # 2) chunk/shard index per row via broadcast position joins (tiny axes)
    spark = df.sparkSession
    work = df
    for d, c in zip(dims, key_shape):
        pos_pdf = pd.DataFrame({d: coords[d], f"__pos_{d}": np.arange(sizes[d], dtype=np.int64)})
        work = work.join(F.broadcast(spark.createDataFrame(pos_pdf)), d)
        work = work.withColumn(f"__ck_{d}", F.expr(f"__pos_{d} div {c}").cast("int"))

    # 3) executor-side chunk writes
    for v in var_cols:
        os.makedirs(os.path.join(path, v), exist_ok=True)
    dlist, vlist = list(dims), list(var_cols)
    cs = key_shape
    inner_cs = chunk_shape
    dt_strs = {v: dtypes[v].str for v in vlist}
    v3 = zarr_format == 3
    do_shard = bool(shards)
    # v3's core spec registers gzip but not raw zlib (v2 keeps zlib);
    # zstd/blosc pass through — they have v3 codec spellings
    comp = (
        {"id": "gzip", "level": compressor.get("level", 1)}
        if (v3 and compressor is not None and compressor.get("id") == "zlib")
        else compressor
    )
    if v3:
        # Validate the codec has a v3 spelling BEFORE the cluster spends a
        # full applyInPandas job writing chunks the metadata step would
        # then reject (leaving a metadata-less partial store).
        v3_codec_chain(comp, 1)
    root = path

    def _write_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        idx = tuple(int(pdf[f"__ck_{d}"].iloc[0]) for d in dlist)
        locs = tuple(
            pdf[f"__pos_{d}"].to_numpy(dtype=np.int64) - i * c
            for d, i, c in zip(dlist, idx, cs)
        )
        key = (
            os.path.join("c", *(str(i) for i in idx))
            if v3
            else ".".join(str(i) for i in idx)
        )
        for v in vlist:
            dt = np.dtype(dt_strs[v])
            # must equal the .zarray/zarr.json fill_value: a cell missing
            # inside a written chunk and one in a never-written chunk have
            # to read back identically (NaN floats, NaT datetimes, 0 ints)
            fill = (
                np.nan if dt.kind == "f"
                else np.datetime64("NaT") if dt.kind == "M"
                else "" if dt.kind == "O"
                else 0
            )
            block = np.full(cs, fill, dtype=dt)
            # float/datetime NULLs degrade to the NaN/NaT fill, but an
            # int/bool dtype has no missing sentinel — fail with the column
            # name instead of an opaque astype cast error
            if dt.kind in "iub" and pdf[v].isna().any():
                raise ValueError(
                    f"write_zarr_distributed: column {v!r} maps to "
                    f"non-nullable dtype {dt} but contains NULLs; fill or "
                    f"cast it to a float/timestamp type before writing"
                )
            vals = pdf[v].to_numpy()
            if dt.kind == "O":  # string NULLs degrade to the "" fill
                vals = np.array(
                    ["" if x is None else str(x) for x in vals], dtype=object
                )
            block[locs] = vals.astype(dt)
            fname = os.path.join(root, v, key)
            if v3:
                os.makedirs(os.path.dirname(fname), exist_ok=True)
            # attempt-unique temp + atomic rename: with speculative
            # execution two attempts may write the same chunk CONCURRENTLY
            # — same bytes, but a plain open('wb') truncate from the late
            # attempt can race the completed one and leave a short file
            import uuid as _uuid

            tmp = f"{fname}.__tmp_{_uuid.uuid4().hex}"
            if not do_shard:
                raw = (
                    _vlen_encode(block)
                    if dt.kind == "O"
                    else np.ascontiguousarray(block).tobytes()
                )
                with open(tmp, "wb") as f:
                    f.write(_compress(raw, comp, 1 if dt.kind == "O" else dt.itemsize))
                os.replace(tmp, fname)
                continue
            # one sharding_indexed file: inner chunk payloads in C order +
            # (offset, nbytes) uint64-LE index + crc32c (zarr_store dialect)
            import itertools as _it

            from xarray_sql_spark.zarr_store import _crc32c

            per = tuple(sh // c for sh, c in zip(cs, inner_cs))
            index = np.empty((int(np.prod(per)), 2), dtype="<u8")
            payload = bytearray()
            for pos, iidx in enumerate(_it.product(*(range(p) for p in per))):
                sel = tuple(
                    slice(i * c, (i + 1) * c) for i, c in zip(iidx, inner_cs)
                )
                inner_raw = (
                    _vlen_encode(block[sel])
                    if dt.kind == "O"
                    else np.ascontiguousarray(block[sel]).tobytes()
                )
                enc = _compress(inner_raw, comp, 1 if dt.kind == "O" else dt.itemsize)
                index[pos] = (len(payload), len(enc))
                payload.extend(enc)
            idx_bytes = index.tobytes()
            with open(tmp, "wb") as f:
                f.write(bytes(payload))
                f.write(idx_bytes)
                f.write(_crc32c(idx_bytes).to_bytes(4, "little"))
            os.replace(tmp, fname)
        return pd.DataFrame({"chunk": [key], "n": [len(pdf)]})

    stats = (
        work.groupBy(*[f"__ck_{d}" for d in dims])
        .applyInPandas(_write_chunk, "chunk string, n long")
        .collect()
    )

    # 4) driver-side metadata + coordinate arrays
    full_shape = tuple(sizes[d] for d in dims)
    if v3:
        consolidated_v3: dict = {}

        def _meta3(name: str, ndims: tuple[str, ...], shape: tuple[int, ...],
                   cshape: tuple[int, ...], dtype: np.dtype,
                   inner: tuple[int, ...] | None = None) -> None:
            inner_chain = (
                # v3 string arrays: vlen-utf8 replaces the bytes codec
                [{"name": "vlen-utf8"}] + v3_codec_chain(comp, 1)[1:]
                if dtype.kind == "O"
                else v3_codec_chain(comp, dtype.itemsize)
            )
            if inner is not None:
                codecs = [
                    {
                        "name": "sharding_indexed",
                        "configuration": {
                            "chunk_shape": list(inner),
                            "codecs": inner_chain,
                            "index_codecs": [
                                {"name": "bytes", "configuration": {"endian": "little"}},
                                {"name": "crc32c"},
                            ],
                            "index_location": "end",
                        },
                    }
                ]
            else:
                codecs = inner_chain
            meta = v3_array_meta(shape, cshape, dtype, codecs, ndims)
            with open(os.path.join(path, name, "zarr.json"), "w") as f:
                json.dump(meta, f)
            consolidated_v3[name] = meta

        for v in var_cols:
            _meta3(
                v, tuple(dims), full_shape, cs, dtypes[v],
                inner=inner_cs if do_shard else None,
            )
        for d in dims:
            os.makedirs(os.path.join(path, d), exist_ok=True)
            arr = coords[d]
            if arr.dtype.kind == "O":
                _meta3(d, (d,), (len(arr),), (len(arr),), arr.dtype)
                raw, ts = _vlen_encode(arr), 1
            else:
                # write as little-endian to match the declared bytes codec
                arr = arr.astype(arr.dtype.newbyteorder("<"), copy=False)
                _meta3(d, (d,), (len(arr),), (len(arr),), arr.dtype)
                raw, ts = np.ascontiguousarray(arr).tobytes(), arr.dtype.itemsize
            os.makedirs(os.path.join(path, d, "c"), exist_ok=True)
            with open(os.path.join(path, d, "c", "0"), "wb") as f:
                f.write(_compress(raw, comp, ts))
        root_doc = {
            "zarr_format": 3,
            "node_type": "group",
            "attributes": {},
            "consolidated_metadata": {
                "kind": "inline",
                "must_understand": False,
                "metadata": consolidated_v3,
            },
        }
        with open(os.path.join(path, "zarr.json"), "w") as f:
            json.dump(root_doc, f)
        return {r["chunk"]: r["n"] for r in stats}

    consolidated: dict = {".zgroup": {"zarr_format": 2}}
    with open(os.path.join(path, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)

    def _meta(name: str, ndims: tuple[str, ...], shape: tuple[int, ...],
              cshape: tuple[int, ...], dtype: np.dtype) -> None:
        meta = v2_array_meta(shape, cshape, dtype, compressor)
        if dtype.kind == "O":
            meta["filters"] = [{"id": "vlen-utf8"}]
        zattrs = {_ARRAY_DIMENSIONS: list(ndims)}
        with open(os.path.join(path, name, ".zarray"), "w") as f:
            json.dump(meta, f)
        with open(os.path.join(path, name, ".zattrs"), "w") as f:
            json.dump(zattrs, f)
        consolidated[f"{name}/.zarray"] = meta
        consolidated[f"{name}/.zattrs"] = zattrs

    for v in var_cols:
        _meta(v, tuple(dims), full_shape, cs, dtypes[v])
    for d in dims:
        os.makedirs(os.path.join(path, d), exist_ok=True)
        arr = coords[d]
        _meta(d, (d,), (len(arr),), (len(arr),), arr.dtype)
        raw = (
            _vlen_encode(arr)
            if arr.dtype.kind == "O"
            else np.ascontiguousarray(arr).tobytes()
        )
        with open(os.path.join(path, d, "0"), "wb") as f:
            f.write(
                _compress(
                    raw, compressor,
                    1 if arr.dtype.kind == "O" else arr.dtype.itemsize,
                )
            )
    with open(os.path.join(path, ".zmetadata"), "w") as f:
        json.dump({"zarr_consolidated_format": 1, "metadata": consolidated}, f)
    return {r["chunk"]: r["n"] for r in stats}
