"""Chunk arithmetic (reference tests/test_df.py:24-91, 485-534)."""

import pytest

from xarray_sql_spark.chunks import block_num_rows, block_slices, compute_chunks, n_blocks


def test_compute_chunks_remainder():
    out = compute_chunks({"t": 10, "y": 5}, {"t": 3})
    assert out["t"] == (3, 3, 3, 1)
    assert out["y"] == (5,)


def test_compute_chunks_exact_division():
    assert compute_chunks({"t": 12}, {"t": 4})["t"] == (4, 4, 4)


def test_chunk_larger_than_dim_clamped():
    assert compute_chunks({"t": 5}, {"t": 99})["t"] == (5,)


def test_nonpositive_chunk_raises():
    with pytest.raises(ValueError):
        compute_chunks({"t": 5}, {"t": 0})


def test_block_slices_cover_exactly():
    sizes = {"t": 10, "y": 7}
    blocks = list(block_slices(sizes, {"t": 4, "y": 3}))
    assert len(blocks) == 3 * 3 == n_blocks(sizes, {"t": 4, "y": 3})
    # Cells covered exactly once.
    seen = set()
    for b in blocks:
        for i in range(b["t"].start, b["t"].stop):
            for j in range(b["y"].start, b["y"].stop):
                assert (i, j) not in seen
                seen.add((i, j))
    assert len(seen) == 70
    assert sum(block_num_rows(b) for b in blocks) == 70


def test_unchunked_is_single_block():
    blocks = list(block_slices({"t": 10}, None))
    assert blocks == [{"t": slice(0, 10)}]
