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
pass ``ttl_ms`` so keys idle past the dedup horizon are evicted.
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


def _band_firsts_fn_factory(ttl_ms: int | None):
    def _band_firsts_fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Per band key: the lowest doc_id ever seen claims the band; every
        arrival is emitted with that claimant (itself included). Within a
        micro-batch arrival order is doc_id order (deterministic replay)."""
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()  # band idle past the dedup horizon: release it
            return
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        rows = pd.concat(frames, ignore_index=True).sort_values("doc_id")
        first = state.get[0] if state.exists else int(rows["doc_id"].iloc[0])
        state.update((int(first),))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {
                "band_idx": int(key[0]),
                "band_hash": key[1],
                "doc_id": rows["doc_id"].to_numpy(),
                "first_doc": first,
            }
        )

    return _band_firsts_fn


def lsh_band_firsts(stream: DataFrame, *, ttl_ms: int | None = None) -> DataFrame:
    """Stage 1 (the stateful op): explode each document's MinHash bands and
    track the first claimant per band key across micro-batches.

    ``ttl_ms`` bounds the state store at 100 TB: a band key idle for longer
    than the dedup horizon is dropped (processing-time timeout), so state
    tracks the ACTIVE near-dup frontier instead of every band ever seen.
    The trade is explicit: a duplicate arriving after the horizon is
    re-admitted — the standard windowed-dedup contract. Default (None)
    keeps exact forever-dedup.

    Caveat: with a TTL the query is a CONTINUOUS stream — Spark keeps
    scheduling timer-service micro-batches after the feed drains, so an
    ``availableNow`` run never self-terminates; drive it with a real
    trigger and stop it explicitly (see tests)."""
    from xarray_sql_spark.queries.dedup_lsh import minhash_bands_expr

    bands = stream.select(
        "doc_id", F.explode(minhash_bands_expr()).alias("b")
    ).select("doc_id", "b.band_idx", "b.band_hash")
    return bands.groupBy("band_idx", "band_hash").applyInPandasWithState(
        _band_firsts_fn_factory(ttl_ms),
        outputStructType=_BAND_OUT,
        stateStructType=_BAND_STATE,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def near_dup_verdicts(band_firsts: DataFrame) -> DataFrame:
    """Stage 2 (stateless aggregation over the stage-1 sink): a document is
    a near-dup if ANY of its bands was claimed by an earlier document."""
    return band_firsts.groupBy("doc_id").agg(
        F.max((F.col("first_doc") < F.col("doc_id")).cast("int")).alias("is_near_dup"),
        F.sum((F.col("first_doc") < F.col("doc_id")).cast("int")).alias("n_dup_bands"),
    )


# --- ingest-time image dedup gate (mm13's streaming twin) ---------------------
_PHASH_STATE = StructType(
    [StructField("keeper", LongType()), StructField("n", LongType())]
)
_PHASH_OUT = StructType(
    [
        StructField("phash", StringType()),
        StructField("keeper_doc_id", LongType()),
        StructField("n_images", LongType()),
    ]
)
_AFP_OUT = StructType(
    [
        StructField("fp", StringType()),
        StructField("keeper_doc_id", LongType()),
        StructField("n_clips", LongType()),
    ]
)


def _min_keeper_fn_factory(key_col: str, n_col: str):
    """Running min-keeper per fingerprint: merging by min makes the
    final keeper independent of micro-batch arrival order, so the
    settled state equals the batch clusterer's (mm13/mm14) keeper
    exactly. One factory, two gates — the image and audio twins differ
    only in output column names."""

    def _fn(
        key: tuple, pdfs: "Iterator[pd.DataFrame]", state: GroupState
    ) -> "Iterator[pd.DataFrame]":
        keeper, n = state.get if state.exists else (None, 0)
        for pdf in pdfs:
            if len(pdf) == 0:  # Arrow batching may deliver empty chunks
                continue
            n += len(pdf)
            m = int(pdf["doc_id"].min())
            keeper = m if keeper is None else min(keeper, m)
        if keeper is None and n == 0:
            # Invocation saw only empty chunks and no prior state: emitting
            # here would persist a phantom (None, 0) group and surface a
            # NULL keeper row downstream.
            return
        state.update((keeper, n))
        yield pd.DataFrame(
            {key_col: [key[0]], "keeper_doc_id": [keeper], n_col: [n]}
        )

    return _fn


_phash_first_fn = _min_keeper_fn_factory("phash", "n_images")
_afp_first_fn = _min_keeper_fn_factory("fp", "n_clips")


def image_phash_gate(
    spark: SparkSession, sf_dir: str, stream: DataFrame | None = None
) -> DataFrame:
    """mm13 at INGEST: the document stream's image slot is encoded and
    perceptually hashed with the SAME module-level kernels as the batch
    query (stream-static join against the leader texts, two stateless
    Arrow mapInPandas stages), then a stateful min-keeper gate per hash
    decides which image of each near-dup cluster survives. State is one
    (long, long) per distinct hash — bounded by cluster count, not
    corpus size."""
    from pyspark.sql import functions as F

    from xarray_sql_spark.operators.multimodal import (
        _mm13_encode_batches,
        _phash_batches,
    )
    from xarray_sql_spark.session import table

    d_static = table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("leader_id"), F.col("text").alias("ltext")
    )
    # `stream` override: restart/wave tests feed their own file source;
    # default is the shared documents stream.
    s = (
        (stream if stream is not None else documents_stream(spark, sf_dir))
        .filter(F.col("doc_id") % 3 == 0)
        .selectExpr("doc_id", "(doc_id DIV 15) * 15 AS leader_id")
        .join(d_static, "leader_id")  # stream-static broadcastable dim
    )
    assets = s.mapInPandas(_mm13_encode_batches, "doc_id long, content binary")
    hashes = assets.mapInPandas(
        _phash_batches, "doc_id long, phash string, n_px long"
    )
    return hashes.groupBy("phash").applyInPandasWithState(
        _phash_first_fn,
        outputStructType=_PHASH_OUT,
        stateStructType=_PHASH_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def audio_fp_gate(
    spark: SparkSession, sf_dir: str, stream: DataFrame | None = None
) -> DataFrame:
    """mm14 at INGEST — image_phash_gate's audio twin: the document
    stream's WAV slot (doc_id % 3 == 1) is encoded and fingerprinted
    with the SAME module-level kernels as the batch query (stream-static
    join against the leader texts, two stateless Arrow mapInPandas
    stages), then a stateful min-keeper gate per 64-bit block-mean
    fingerprint decides which clip of each near-dup cluster survives.
    State is one (long, long) per distinct fingerprint — bounded by
    cluster count, not corpus size. Short clips (< 64 samples) produce
    no fingerprint row and never enter state, exactly as in batch."""
    from pyspark.sql import functions as F

    from xarray_sql_spark.operators.multimodal import (
        _afp_batches,
        _mm14_encode_batches,
    )
    from xarray_sql_spark.session import table

    d_static = table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("leader_id"), F.col("text").alias("ltext")
    )
    s = (
        (stream if stream is not None else documents_stream(spark, sf_dir))
        .filter(F.col("doc_id") % 3 == 1)
        .selectExpr("doc_id", "(doc_id DIV 15) * 15 + 1 AS leader_id")
        .join(d_static, "leader_id")  # stream-static broadcastable dim
    )
    assets = s.mapInPandas(_mm14_encode_batches, "doc_id long, content binary")
    fps = assets.mapInPandas(
        _afp_batches, "doc_id long, fp string, n_samples long"
    )
    return fps.groupBy("fp").applyInPandasWithState(
        _afp_first_fn,
        outputStructType=_AFP_OUT,
        stateStructType=_PHASH_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_EXACT_OUT = StructType(
    [
        StructField("chash", StringType()),
        StructField("keeper_doc_id", LongType()),
        StructField("n_copies", LongType()),
    ]
)
_chash_first_fn = _min_keeper_fn_factory("chash", "n_copies")


def pipeline_ingest_gate(
    spark: SparkSession, sf_dir: str, stream: DataFrame | None = None
) -> DataFrame:
    """pl23's ingest PREFIX as one streaming query: license policy
    resolution (pl22's rule — stateless projection + two stream-static
    broadcast policy dims, the same shared pl17 expressions as batch)
    composed with dd01's exact-dup gate as a stateful min-keeper per
    content hash. Only 'allow'-policy documents reach the dedup state,
    exactly as in pl23's batch DAG, and the settled keeper per hash is
    min(doc_id) — arrival-order independent, so the state equals the
    batch `exact` stage whatever the micro-batch layout. State is one
    (long, long) per DISTINCT allowed content hash — bounded by corpus
    novelty; pass a TTL via lsh_band_firsts' pattern if the dedup
    horizon is windowed in production."""
    from pyspark.sql import functions as F

    from xarray_sql_spark.queries.pipeline_ops import (
        _pl17_canon_expr,
        _pl17_domain_expr,
        _pl17_host_of_canon,
        _pl17_url_expr,
        pl22_resolve_policy,
    )

    s = stream if stream is not None else documents_stream(spark, sf_dir)
    dom = (
        s.selectExpr(
            "doc_id",
            "md5(text) AS chash",
            f"{_pl17_url_expr('spark')} AS url",
        )
        .selectExpr("doc_id", "chash", f"{_pl17_canon_expr('spark')} AS curl")
        .selectExpr(
            "doc_id",
            "chash",
            f"{_pl17_domain_expr('spark', _pl17_host_of_canon('spark', 'curl'))}"
            " AS domain",
        )
    )
    allowed = (
        pl22_resolve_policy(spark, dom)
        .filter(F.col("policy") == "allow")
        .select("chash", "doc_id")
    )
    return allowed.groupBy("chash").applyInPandasWithState(
        _chash_first_fn,
        outputStructType=_EXACT_OUT,
        stateStructType=_PHASH_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
