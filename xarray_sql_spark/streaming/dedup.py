"""Streaming MinHash-LSH near-dup gate.

``stream_dedup`` (streaming/events.py) drops EXACT duplicates by key; this
module drops NEAR-duplicates as documents arrive: a document is flagged
when any of its LSH band keys was already claimed by an earlier document.
Band keys come from the same per-row MinHash expression (and constants) as
the batch dd04 query, so batch and streaming agree on what "near-dup"
means.

One stateful operator only (chained stateful streaming ops are restricted):
``applyInPandasWithState`` keyed by (band_idx, band_hash) carries the
band's first-claimant doc_id; its per-band verdicts aggregate to per-doc
verdicts downstream (batch over the micro-batch sink — the standard
two-stage layout for multi-key streaming logic). State is one long per
DISTINCT band key — bounded by corpus novelty, not corpus size; at 100 TB
add a TTL timeout for keys idle past the dedup horizon.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents parquet (a dated directory
    tree in production; pathGlobFilter narrows the shared testdata dir)."""
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )


_BAND_STATE = StructType([StructField("first_doc", LongType())])
_BAND_OUT = StructType(
    [
        StructField("band_idx", IntegerType()),
        StructField("band_hash", StringType()),
        StructField("doc_id", LongType()),
        StructField("first_doc", LongType()),
    ]
)


def _band_firsts_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per band key: the lowest doc_id ever seen claims the band; every
    arrival is emitted with that claimant (itself included). Within a
    micro-batch arrival order is doc_id order (deterministic replay)."""
    frames = [p for p in pdfs if len(p)]
    if not frames:
        return
    rows = pd.concat(frames, ignore_index=True).sort_values("doc_id")
    first = state.get[0] if state.exists else int(rows["doc_id"].iloc[0])
    state.update((int(first),))
    yield pd.DataFrame(
        {
            "band_idx": int(key[0]),
            "band_hash": key[1],
            "doc_id": rows["doc_id"].to_numpy(),
            "first_doc": first,
        }
    )


def lsh_band_firsts(stream: DataFrame) -> DataFrame:
    """Stage 1 (the stateful op): explode each document's MinHash bands and
    track the first claimant per band key across micro-batches."""
    from xarray_sql_spark.queries.dedup_lsh import minhash_bands_expr

    bands = stream.select(
        "doc_id", F.explode(minhash_bands_expr()).alias("b")
    ).select("doc_id", "b.band_idx", "b.band_hash")
    return bands.groupBy("band_idx", "band_hash").applyInPandasWithState(
        _band_firsts_fn,
        outputStructType=_BAND_OUT,
        stateStructType=_BAND_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def near_dup_verdicts(band_firsts: DataFrame) -> DataFrame:
    """Stage 2 (stateless aggregation over the stage-1 sink): a document is
    a near-dup if ANY of its bands was claimed by an earlier document."""
    return band_firsts.groupBy("doc_id").agg(
        F.max((F.col("first_doc") < F.col("doc_id")).cast("int")).alias("is_near_dup"),
        F.sum((F.col("first_doc") < F.col("doc_id")).cast("int")).alias("n_dup_bands"),
    )
