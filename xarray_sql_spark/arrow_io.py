"""Arrow stream export: Dataset -> RecordBatchReader / Spark DataFrame.

The reference's ``read_xarray`` (reference reader.py:37-189) exposes a
Dataset as a one-shot ``pyarrow.RecordBatchReader`` implementing the Arrow
PyCapsule stream protocol; any Arrow-consuming engine can ingest it without
copying. The Spark-side twin here hands the stream to
``spark.createDataFrame`` (Spark 4 accepts Arrow tables directly) — an
*eager* local pivot, useful for small/driver-side grids; large grids should
use the lazy registered scan (``XarraySession.from_dataset``) instead, which
pivots block-by-block on executors.
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession

from xarray_sql_spark.chunks import block_slices
from xarray_sql_spark.dataset import Dataset
from xarray_sql_spark.pivot import (
    DEFAULT_BATCH_SIZE,
    canonical_dims,
    infer_schema,
    iter_record_batches,
)


def to_arrow_reader(
    ds: Dataset,
    chunks: dict[str, int] | None = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
) -> pa.RecordBatchReader:
    """One-shot Arrow stream over the pivoted rows (reference
    reader.py:37-189): blocks are pivoted lazily as the consumer pulls, so
    peak memory is one block + one batch regardless of dataset size."""
    dims = canonical_dims(ds.data_vars)
    # Implicit (coordless) dims pivot as 0..n-1, same as the grid-source
    # and reference reader paths (reference reader.py:59-66).
    from xarray_sql_spark.sources.grid_source import _grid_coords

    all_coords = _grid_coords(ds, dims)
    schema = infer_schema(dims, all_coords, ds.data_vars, ds.coord_attrs)
    sizes = {d: len(all_coords[d]) for d in dims}

    def gen() -> Iterator[pa.RecordBatch]:
        for block in block_slices(sizes, chunks):
            coords = {d: all_coords[d][block[d]] for d in dims}
            arrays = {
                name: var.read_block(tuple(block[d] for d in dims))
                for name, var in ds.data_vars.items()
            }
            yield from iter_record_batches(dims, coords, arrays, schema, batch_size)

    return pa.RecordBatchReader.from_batches(schema, gen())


def read_xarray(
    spark: SparkSession,
    ds: Dataset,
    chunks: dict[str, int] | None = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
) -> DataFrame:
    """Eager Dataset -> Spark DataFrame via one Arrow table (driver-local
    pivot; prefer ``XarraySession.from_dataset`` for big grids)."""
    reader = to_arrow_reader(ds, chunks, batch_size)
    return spark.createDataFrame(reader.read_all())
