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
    ArrayType,
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


# --- composed ingest gate: license -> exact -> banded near-dup ----------------
#
# pl23's first THREE stages as ONE streaming query with ONE stateful
# operator (chained stateful ops are restricted): the exact-dup gate
# (state per content hash) and the banded claim (state per band key) are
# both min-keepers, so they fold into a single applyInPandasWithState
# keyed by a generic (kind, key) — kind 'c' rows carry the content hash,
# kind 'b' rows carry a band key, and every row carries the doc's 16
# row-wise MinHash components so the claimant's signature is available
# for dd04's agreement confirm without any join.
#
# Why the settled survivor set equals batch pl23's `nodup` stage even
# though streaming band claims include exact-dup losers (batch builds
# bands from exact SURVIVORS only): an exact loser has identical text,
# hence an identical signature and identical band keys, as its keeper —
# so every band the loser claims also contains the keeper at a lower
# doc_id. The per-band min over ALL allowed docs therefore equals the
# min over exact survivors, the claimant's signature is the same row,
# and the loser itself can never be a settled claimant. The losers' own
# extra band rows are harmless: their 'c' row already marks them dead.
_GATE_STATE = StructType(
    [
        StructField("doc_ids", ArrayType(LongType())),
        StructField("sigs", ArrayType(LongType())),  # 16 per doc, parallel
    ]
)
_GATE_OUT = StructType(
    [
        StructField("kind", StringType()),
        StructField("key", StringType()),
        StructField("doc_id", LongType()),
        StructField("first_doc", LongType()),
        StructField("agree", IntegerType()),
    ]
)
_GATE_NP = 16  # dedup_lsh.N_PERMS — pinned by test_streaming's parity suite


def _gate_claims_fn(
    key: tuple, pdfs: "Iterator[pd.DataFrame]", state: GroupState
) -> "Iterator[pd.DataFrame]":
    """Per (kind, key): keep every member's (doc_id, signature) in state.
    A verdict row (member, claimant, agreement) goes stale ONLY when the
    group's claimant (min doc_id ever seen) changes, so the emission is
    delta-based: while the claimant is unchanged only the NEWLY arrived
    members emit; when a later micro-batch delivers a lower claimant the
    whole group re-emits corrected verdicts. The sink's latest row per
    (kind, key, doc_id) is therefore always the settled verdict, and a
    hot band that receives members across many batches emits O(members)
    rows total instead of O(members^2). Replayed input rows (restart
    recovery) dedupe by doc_id, keeping state idempotent. State size per
    band key is the band's member list — bounded by near-dup cluster
    sizes (the batch DAG moves the same rows through its band shuffle);
    pass a TTL via lsh_band_firsts' pattern if the dedup horizon is
    windowed in production."""
    ids, sigs = state.get if state.exists else ([], [])
    ids, sigs = list(ids), list(sigs)
    old_n = len(ids)
    prev_first = min(ids) if ids else None
    seen = set(ids)
    grew = False
    scols = [f"s{i}" for i in range(_GATE_NP)]
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        sm = pdf[scols].to_numpy()
        for j, d in enumerate(pdf["doc_id"]):
            d = int(d)
            if d in seen:
                continue
            seen.add(d)
            ids.append(d)
            sigs.extend(int(x) for x in sm[j])
            grew = True
    if not grew:
        return
    state.update((ids, sigs))
    mi = min(range(len(ids)), key=ids.__getitem__)
    first = ids[mi]
    csig = sigs[mi * _GATE_NP : (mi + 1) * _GATE_NP]
    emit = (
        range(len(ids))
        if prev_first is None or first != prev_first
        else range(old_n, len(ids))
    )
    agree = [
        sum(
            1
            for i in range(_GATE_NP)
            if sigs[k * _GATE_NP + i] == csig[i]
        )
        for k in emit
    ]
    yield pd.DataFrame(
        {
            "kind": key[0],
            "key": key[1],
            "doc_id": [ids[k] for k in emit],
            "first_doc": first,
            "agree": agree,
        }
    )


def pipeline_ingest_gate_banded(
    spark: SparkSession, sf_dir: str, stream: DataFrame | None = None
) -> DataFrame:
    """pl23's ingest prefix THROUGH the banded near-dup stage as one
    streaming query: license policy resolution (stateless projection +
    two stream-static broadcast policy dims — the same shared pl22/pl17
    expressions as batch), the doc's content hash AND its 16 row-wise
    MinHash components (the same `_pl23_sig_mins` expressions the batch
    DAG hoists above its exact-dedup exchange), exploded into one 'c'
    row per doc plus one 'b' row per LSH band, through the unified
    (kind, key) claims keeper. Feed the sink (with a batch id) to
    :func:`ingest_gate_survivors` for the settled per-doc verdicts —
    pinned equal to batch pl23's `nodup` stage in test_streaming."""
    from pyspark.sql import functions as F

    from xarray_sql_spark.queries.dedup_lsh import (
        MERSENNE31,
        N_BANDS,
        N_PERMS,
        ROWS_PER_BAND,
        _band_structs,
    )
    from xarray_sql_spark.queries.pipeline_ops import (
        _pl17_canon_expr,
        _pl17_domain_expr,
        _pl17_host_of_canon,
        _pl17_url_expr,
        _pl23_sig_mins,
        pl22_resolve_policy,
    )

    assert N_PERMS == _GATE_NP
    s = stream if stream is not None else documents_stream(spark, sf_dir)
    dom = (
        s.selectExpr(
            "doc_id",
            "md5(text) AS chash",
            "transform(array_distinct(split(text, ' ')),"
            " t -> CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT)"
            f" % {MERSENNE31}L) AS th",
            f"{_pl17_url_expr('spark')} AS url",
        )
        .selectExpr(
            "doc_id", "chash", "th", f"{_pl17_canon_expr('spark')} AS curl"
        )
        .selectExpr(
            "doc_id",
            "chash",
            *_pl23_sig_mins("spark"),
            f"{_pl17_domain_expr('spark', _pl17_host_of_canon('spark', 'curl'))}"
            " AS domain",
        )
    )
    sig_cols = [f"s{i}" for i in range(N_PERMS)]
    allowed = (
        pl22_resolve_policy(spark, dom)
        .filter(F.col("policy") == "allow")
        .select("doc_id", "chash", *sig_cols)
    )
    crows = allowed.select(
        F.lit("c").alias("kind"),
        F.col("chash").alias("key"),
        "doc_id",
        *sig_cols,
    )
    brows = allowed.select(
        "doc_id",
        *sig_cols,
        F.explode(_band_structs(N_BANDS, ROWS_PER_BAND)).alias("band"),
    ).select(
        F.lit("b").alias("kind"),
        F.concat_ws("|", "band.band_idx", "band.band_hash").alias("key"),
        "doc_id",
        *sig_cols,
    )
    return crows.unionByName(brows).groupBy("kind", "key").applyInPandasWithState(
        _gate_claims_fn,
        outputStructType=_GATE_OUT,
        stateStructType=_GATE_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ingest_gate_survivors(sink: DataFrame) -> DataFrame:
    """Settle the banded ingest gate's sink into per-doc verdicts: take
    each (kind, key, doc_id)'s LATEST emission (groups re-emit all
    members when their claimant changes, so the latest row carries the
    settled claimant), then a doc survives unless an exact row has an
    earlier keeper (kind 'c', first_doc < doc_id) or any band's settled
    claimant is earlier AND agrees on >= EST_JACCARD_MIN of the perms
    (dd04's confirm). ``sink`` must carry a monotone ``batch_id``."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from xarray_sql_spark.queries.dedup_lsh import EST_JACCARD_MIN, N_PERMS

    wk = W.partitionBy("kind", "key", "doc_id").orderBy(F.desc("batch_id"))
    latest = (
        sink.withColumn("rn", F.row_number().over(wk))
        .filter("rn = 1")
        .drop("rn")
    )
    dead = (
        (F.col("first_doc") < F.col("doc_id"))
        & (
            (F.col("kind") == "c")
            | (F.col("agree") / float(N_PERMS) >= EST_JACCARD_MIN)
        )
    ).cast("int")
    return latest.groupBy("doc_id").agg(
        F.max(dead).alias("is_dup"),
    ).filter("is_dup = 0").select("doc_id")
