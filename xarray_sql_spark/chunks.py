"""Chunk-grid arithmetic: a ``{dim: chunk_size}`` spec over dimension sizes
yields per-dim chunk tuples and the cross-product of block slices.

Pure arithmetic, no task graph (reference df.py:29-117 ``compute_chunks`` /
``resolve_chunks`` / ``block_slices``). Each block becomes one Spark
InputPartition; at ERA5 scale that is hundreds of thousands of partitions,
so everything here is O(#blocks) generators with O(1) per-block state.
"""

from __future__ import annotations

from itertools import product
from typing import Iterator, Mapping


def compute_chunks(sizes: Mapping[str, int], chunks: Mapping[str, int] | None) -> dict[str, tuple[int, ...]]:
    """Resolve a chunk-size spec to explicit per-dim chunk tuples.

    Dims absent from ``chunks`` are one single chunk. A chunk size larger
    than the dim is clamped; the last chunk carries the remainder.
    """
    chunks = dict(chunks or {})
    out: dict[str, tuple[int, ...]] = {}
    for dim, size in sizes.items():
        c = chunks.get(dim)
        if c is None or c >= size:
            out[dim] = (size,) if size > 0 else ()
            continue
        if c <= 0:
            raise ValueError(f"chunk size for {dim!r} must be positive, got {c}")
        n_full, rem = divmod(size, c)
        out[dim] = (c,) * n_full + ((rem,) if rem else ())
    return out


def chunk_offsets(chunk_tuple: tuple[int, ...]) -> list[int]:
    offs = [0]
    for c in chunk_tuple[:-1]:
        offs.append(offs[-1] + c)
    return offs


def block_slices(
    sizes: Mapping[str, int], chunks: Mapping[str, int] | None
) -> Iterator[dict[str, slice]]:
    """Yield one ``{dim: slice}`` mapping per block, in C order of dims."""
    resolved = compute_chunks(sizes, chunks)
    dims = list(sizes.keys())
    per_dim: list[list[slice]] = []
    for d in dims:
        offs = chunk_offsets(resolved[d])
        per_dim.append(
            [slice(o, o + c) for o, c in zip(offs, resolved[d])] or [slice(0, 0)]
        )
    for combo in product(*per_dim):
        yield dict(zip(dims, combo))


def n_blocks(sizes: Mapping[str, int], chunks: Mapping[str, int] | None) -> int:
    total = 1
    for t in compute_chunks(sizes, chunks).values():
        total *= max(len(t), 1)
    return total


def block_num_rows(block: Mapping[str, slice]) -> int:
    n = 1
    for s in block.values():
        n *= s.stop - s.start
    return n
