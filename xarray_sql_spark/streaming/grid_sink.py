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

The contract that makes (1) safe is DENSITY: every micro-batch must be a
complete, duplicate-free slab — exactly one row per cell of its
chunk-aligned span along the ingest dim (how real grid ingestion
arrives anyway: one file/object per time slab). The sink verifies it
with one aggregation per batch (count, distinct-cell count, span
bounds) BEFORE any chunk is replaced: a gap would rewrite a neighbour
batch's cells to fill, and duplicate cells would make the rewritten
bytes order-dependent — both void the exactly-once argument, so both
fail the batch loudly instead.

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
    along ``region_dim`` is derived from its own min/max coordinate values
    (positions via searchsorted against the store's axis); spans that do
    not land on chunk boundaries, rows outside the store's coordinate
    domain, gaps inside the span, and duplicate cells all fail the batch
    loudly rather than corrupt neighbours (module doc)."""
    from pyspark.sql import functions as F

    from xarray_sql_spark.operators.zarr_sink import write_zarr_region
    from xarray_sql_spark.zarr_store import open_zarr

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        ds = open_zarr(path, decode_cf=False)
        dims = ds.data_vars[
            next(v for v in batch_df.columns if v in ds.data_vars)
        ].dims
        agg = batch_df.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(*[F.col(d) for d in dims]).alias("nd"),
            F.min(region_dim).alias("vmin"),
            F.max(region_dim).alias("vmax"),
        ).collect()[0]
        if agg["n"] == 0:
            return
        coords = np.asarray(ds.coords[region_dim])
        lo, hi = np.searchsorted(coords, [agg["vmin"], agg["vmax"]])
        if hi >= len(coords) or coords[lo] != agg["vmin"] or coords[hi] != agg["vmax"]:
            raise ValueError(
                f"batch {batch_id}: {region_dim} values outside the store's "
                f"coordinate axis"
            )
        start, stop = int(lo), int(hi) + 1
        other = 1
        for d, n in zip(dims, (len(ds.coords[d]) for d in dims)):
            if d != region_dim:
                other *= n
        expected = (stop - start) * other
        if agg["n"] != expected or agg["nd"] != expected:
            raise ValueError(
                f"batch {batch_id}: not a dense slab — {agg['n']} rows "
                f"({agg['nd']} distinct cells) for a span of {expected} "
                f"cells; gaps would rewrite neighbour cells to fill and "
                f"duplicates make replay bytes nondeterministic"
            )
        # density already proves full coverage and in-domain rows, and the
        # batch source is replayable — skip the region writer's own count
        # + checkpoint pass (one aggregation, one write job per batch)
        written = write_zarr_region(
            batch_df, path, {region_dim: (start, stop)}, validate=False
        )
        if sum(written.values()) != expected:
            raise ValueError(
                f"batch {batch_id}: wrote {sum(written.values())} of "
                f"{expected} cells — dim values missing from the store axes"
            )

    writer = stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
