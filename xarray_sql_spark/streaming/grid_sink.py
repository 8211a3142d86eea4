"""Structured Streaming ingestion into an existing Zarr store.

The batch-side complement of ``sources/grid_source.py``'s streaming
READER: a stream of grid rows (dim columns + value columns) lands in an
existing Zarr store micro-batch by micro-batch through
:func:`xarray_sql_spark.operators.zarr_sink.write_zarr_region`.

Exactly-once without a transactional sink, from two properties:

1. chunk rewrites are idempotent — a retried/replayed batch rewrites the
   same chunk files with byte-identical content;
2. the checkpoint skips batches that already committed, so only a batch
   that failed mid-write replays — and (1) makes the replay harmless.

The contract that makes (1) safe is the region-write contract: every
micro-batch must cover WHOLE chunks along the ingest dim (a straddled
chunk would lose the neighbour batch's cells to fill on rewrite), which
is how real grid ingestion arrives anyway — one file/object per time
slab. ``write_zarr_region`` enforces the alignment and row-coverage.

Beyond the reference (its streaming is bounded-memory batch iteration;
SURVEY.md §2C) — this pairs with the exactly-once streaming grid SOURCE
to close the loop: Zarr in, SQL over an unbounded stream, Zarr out.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame


def stream_to_zarr_regions(
    stream: DataFrame,
    path: str,
    region_dim: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Start a streaming query landing each micro-batch as a chunk-aligned
    region overwrite of the existing store at ``path``. The batch's span
    along ``region_dim`` is derived from its own coordinate values
    (positions via searchsorted against the store's axis); spans that do
    not land on chunk boundaries, or rows outside the store's coordinate
    domain, fail the batch loudly rather than corrupt neighbours."""
    from xarray_sql_spark.operators.zarr_sink import write_zarr_region
    from xarray_sql_spark.zarr_store import open_zarr

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        vals = [r[0] for r in batch_df.select(region_dim).distinct().collect()]
        if not vals:
            return
        ds = open_zarr(path, decode_cf=False)
        coords = np.asarray(ds.coords[region_dim])
        pos = np.searchsorted(coords, np.sort(np.asarray(vals)))
        if pos.max() >= len(coords) or not np.array_equal(
            coords[pos], np.sort(np.asarray(vals))
        ):
            raise ValueError(
                f"batch {batch_id}: {region_dim} values outside the store's "
                f"coordinate axis"
            )
        start, stop = int(pos.min()), int(pos.max()) + 1
        write_zarr_region(
            batch_df, path, {region_dim: (start, stop)}, validate=True
        )

    writer = stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
