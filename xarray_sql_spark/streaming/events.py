"""Structured Streaming operators over the events table.

The reference has no event-time streaming (its "streaming" is bounded-memory
batch iteration — reference tests/test_reader.py:490-779); these operators
extend the engine with the standard streaming trio a training-data pipeline
needs: watermarked tumbling-window aggregation, gap-based session windows,
and a custom stateful operator (applyInPandasWithState).

All readers run equally under ``trigger(availableNow=True)`` for bounded
backfills (how the tests drive them) and as long-running incremental jobs on
a real cluster — the dataflow, state store usage, and watermark semantics are
identical; only the trigger changes. At 100 TB the file source lists one
day's partition directories per micro-batch and state is sharded by the
grouping key across executors (RocksDB state store in production).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Parquet stores ts as TIMESTAMP(NANOS); with the nanosAsLong legacy conf the
# streaming reader sees a bigint, converted to a µs timestamp below (same
# truncation as xarray_sql_spark.session.table).
EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one file here; a dated
    directory tree in production — the source incrementally lists new files).

    The file's physical ``ts`` encoding has varied across testdata
    regenerations (TIMESTAMP(NANOS) vs µs-without-UTC-flag); a stream needs
    its schema declared up front, so sniff the footer once with pyarrow and
    declare the matching raw type, normalizing to a µs TIMESTAMP_LTZ column
    under the UTC session either way (same rule as ``session.table``).
    """
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import TimestampNTZType, TimestampType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    arrow_ts = pq.read_schema(os.path.join(sf_dir, "events.parquet")).field("ts").type
    # unit check, not string equality: a tz-flagged nanos encoding
    # ("timestamp[ns, tz=UTC]") also surfaces as bigint under nanosAsLong
    nanos = pa.types.is_timestamp(arrow_ts) and arrow_ts.unit == "ns"
    # tz-flagged µs/ms (TIMESTAMP_LTZ parquet) must be declared TimestampType;
    # an NTZ declaration would still decode the right instant under the UTC
    # session pin, but the declared type would misstate the file's semantics.
    tz_flagged = (
        not nanos and pa.types.is_timestamp(arrow_ts) and arrow_ts.tz is not None
    )
    if nanos:
        raw_ts_type = LongType()
    elif tz_flagged:
        raw_ts_type = TimestampType()
    else:
        raw_ts_type = TimestampNTZType()
    schema = StructType(
        [
            f if f.name != "ts" else StructField("ts", raw_ts_type)
            for f in EVENTS_RAW_SCHEMA.fields
        ]
    )
    # The file source wants a directory; sf_dir holds all tables, so filter
    # the listing down to the events file(s).
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    ts = (
        F.timestamp_micros(F.expr("ts div 1000"))
        if nanos
        else F.col("ts").cast("timestamp_ltz")
    )
    return raw.select(
        "event_id",
        ts.alias("ts"),
        "user_id",
        "event_type",
        "value",
    )


def windowed_counts(stream: DataFrame, *, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour event-time windows with late-data handling: events
    later than the watermark are dropped, windows finalize (and leave the
    state store) once the watermark passes — bounded state at any scale."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "avg_value",
        )
    )


def session_windows(stream: DataFrame, *, gap: str = "30 minutes") -> DataFrame:
    """Gap-based sessions via the native session_window operator — the
    streaming twin of the batch ev01_sessionization query. State per open
    session, closed by watermark passage."""
    return (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


_STATE_SCHEMA = StructType(
    [StructField("n_events", LongType()), StructField("max_value", StringType())]
)
_USER_STATS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("max_value", StringType()),
        StructField("last_ts", TimestampType()),
    ]
)


def _user_stats_fn_factory(ttl_ms: int | None):
    def _user_stats_fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Custom stateful kernel: running per-user event count and max value.
        State survives across micro-batches; emitted once per batch per user."""
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()  # user idle past the TTL: running stats reset
            return
        n, max_v = state.get if state.exists else (0, None)
        last_ts = None
        for pdf in pdfs:
            n += len(pdf)
            batch_max = pdf["value"].max()
            if max_v is None or (pd.notna(batch_max) and float(batch_max) > float(max_v)):
                max_v = str(float(batch_max))
            last_ts = pdf["ts"].max()
        state.update((n, max_v))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "max_value": [max_v],
                "last_ts": [last_ts],
            }
        )

    return _user_stats_fn


def user_running_stats(stream: DataFrame, *, ttl_ms: int | None = None) -> DataFrame:
    """applyInPandasWithState: arbitrary per-key running state (the escape
    hatch for operators session_window/window can't express). Keys shard
    across executors; each micro-batch touches only keys with new data.
    ``ttl_ms`` evicts users idle past it (their running stats restart on
    return) — the knob that bounds the state store when the key space
    grows without bound. With a TTL the query never self-terminates under
    ``availableNow`` (timer-service batches keep coming); stop explicitly."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _user_stats_fn_factory(ttl_ms),
        outputStructType=_USER_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def stream_dedup(stream: DataFrame, keys: list[str], *, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: keep the first event per key, with state
    bounded by the watermark (a key older than the delay can never collide
    again, so its state is dropped). The streaming twin of dd01-style
    ingest dedup — at 100 TB the key is a content hash and this is the
    exactly-once document-ingestion gate."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def write_stream_partitioned(
    df: DataFrame, path: str, partition_cols: tuple[str, ...], checkpoint: str
):
    """Land a stream as hive-partitioned parquet via foreachBatch, reusing
    the batch sink (same layout/file-count policy as
    ``operators.sinks.write_partitioned``); checkpointed, so restarts
    resume from the last committed micro-batch."""
    from xarray_sql_spark.operators.sinks import write_partitioned

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        out = batch_df
        if partition_cols:
            out = batch_df.repartition(*partition_cols)
        (
            out.write.mode("append")
            .partitionBy(*partition_cols)
            .parquet(path)
        )

    _ = write_partitioned  # batch twin, referenced for discoverability
    return (
        df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def run_to_memory(
    df: DataFrame, name: str, *, output_mode: str = "append"
) -> DataFrame:
    """Drive a streaming DataFrame to completion with availableNow into an
    in-memory table; returns the result as a batch DataFrame. Test/backfill
    helper — production sinks swap format() for parquet/kafka + checkpoint."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)


def purchase_click_stream_join(stream: DataFrame) -> DataFrame:
    """Stream-stream self-join: every (purchase, click) pair for the same
    user with the click inside the hour before the purchase — the streaming
    twin of the batch ``ev05_purchase_click_join`` query.

    Both sides carry watermarks and the join condition bounds click_ts to a
    closed range around purchase_ts, so the state store can expire a
    buffered click once the watermark passes click_ts + 1 hour (and a
    purchase once it can no longer match) — bounded state, the requirement
    for running this unbounded. Inner-join results emit as soon as both
    sides arrive; no finalization delay."""
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    return purchases.join(
        clicks,
        F.expr(
            "user_id = c_user AND "
            "click_ts BETWEEN purchase_ts - INTERVAL 1 HOUR AND purchase_ts"
        ),
    ).select(
        "purchase_id",
        "user_id",
        F.unix_micros("purchase_ts").alias("purchase_us"),
        F.unix_micros("click_ts").alias("click_us"),
    )


def enrich_stream_with_static(stream: DataFrame, static_dim: DataFrame) -> DataFrame:
    """Stream-static join: enrich streaming purchases with a static per-user
    dimension (here: signup time). The static side needs no watermark and no
    state — Spark re-evaluates (and with a broadcast hint, re-broadcasts) it
    per micro-batch, which is exactly how a slowly-changing dimension table
    is consumed at scale; the stream side never shuffles for it."""
    purchases = stream.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    return purchases.join(F.broadcast(static_dim), "user_id").select(
        "purchase_id",
        "user_id",
        F.unix_micros("purchase_ts").alias("purchase_us"),
        F.unix_micros("signup_ts").alias("signup_us"),
        ((F.unix_micros("purchase_ts") - F.unix_micros("signup_ts")) / F.lit(1_000_000))
        .alias("secs_since_signup"),
    )


def signup_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The static dimension for enrich_stream_with_static: first signup per
    user, computed in batch (on a cluster this is the slowly-changing dim
    table maintained elsewhere)."""
    from xarray_sql_spark.session import table

    e = table(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )


# --- streaming as-of enrichment (point-in-time-correct feature lookup) ------
_ASOF_STATE_SCHEMA = StructType([StructField("last_click", TimestampType())])
_ASOF_OUT_SCHEMA = StructType(
    [
        StructField("purchase_id", LongType()),
        StructField("user_id", LongType()),
        StructField("purchase_us", LongType()),
        StructField("last_click_us", LongType()),
        StructField("gap_us", LongType()),
    ]
)


def _us(series: pd.Series) -> pd.Series:
    return series.astype("datetime64[us]").astype("int64")


def _asof_fn_factory(ttl_ms: int | None):
    def _asof_fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Per-user kernel: carry the latest click timestamp as state; each
        purchase is enriched with the most recent click at or before it.
        Vectorized — sort clicks-before-purchases at equal timestamps,
        forward-fill the click column, seed with the state carried from
        prior batches."""
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()  # user idle past the feature-freshness horizon
            return
        carried = state.get[0] if state.exists else None
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        rows = pd.concat(frames, ignore_index=True)
        rows = rows.sort_values(["ts", "kind"], kind="stable", ignore_index=True)
        click_ts = rows["ts"].where(rows["kind"] == 0).ffill()
        if carried is not None:
            click_ts = click_ts.fillna(pd.Timestamp(carried))
        p = rows["kind"] == 1
        out = pd.DataFrame(
            {
                "purchase_id": rows.loc[p, "event_id"].astype("int64"),
                "user_id": key[0],
                "purchase_us": _us(rows.loc[p, "ts"]),
                "last_click_us": [
                    None if pd.isna(v) else int(pd.Timestamp(v).value // 1000)
                    for v in click_ts[p]
                ],
            }
        )
        out["gap_us"] = out["purchase_us"] - out["last_click_us"]
        new_last = click_ts.iloc[-1] if len(click_ts) else None
        if pd.notna(new_last):
            state.update((pd.Timestamp(new_last),))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
        yield out

    return _asof_fn


def asof_enrich(stream: DataFrame, *, ttl_ms: int | None = None) -> DataFrame:
    """Streaming as-of join — the streaming twin of the batch
    ``q27_asof_join`` query: every purchase is annotated with the user's
    most recent click at or before the purchase time, state = one
    timestamp per user (bounded, unlike buffering the click stream).

    Within a micro-batch ordering is exact (stable sort, clicks visible to
    same-microsecond purchases); across micro-batches the state carries the
    latest click forward, so in-order feeds are exact and late clicks obey
    the same bounded-delay contract as Spark's built-in stream-stream
    interval join. Keys shard by user across executors; at 100 TB the
    state store holds one row per active user — and ``ttl_ms`` evicts users
    idle past the feature-freshness horizon (a purchase after eviction sees
    no click, the point-in-time-lookup equivalent of a feature-store TTL).
    With a TTL the query never self-terminates under ``availableNow``
    (timer-service batches keep coming); stop explicitly."""
    tagged = (
        stream.filter(F.col("event_type").isin("click", "purchase"))
        .select(
            "event_id",
            "ts",
            "user_id",
            F.when(F.col("event_type") == "click", 0).otherwise(1).alias("kind"),
        )
    )
    return tagged.groupBy("user_id").applyInPandasWithState(
        _asof_fn_factory(ttl_ms),
        outputStructType=_ASOF_OUT_SCHEMA,
        stateStructType=_ASOF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


# --- stateful funnel stage machine ------------------------------------------
_FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("stage", LongType()),
        StructField("t1_us", LongType()),
        StructField("t2_us", LongType()),
        StructField("t3_us", LongType()),
    ]
)
_FUNNEL_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("stage", LongType()),
        StructField("view_us", LongType()),
        StructField("click_us", LongType()),
        StructField("purchase_us", LongType()),
    ]
)


def _funnel_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user funnel stage machine: advance view -> click -> purchase on
    earliest-strictly-after semantics — the streaming twin of
    ``queries.pipeline_ops.funnel_stages``. The per-type timestamp arrays
    are gathered across ALL of the group's Arrow chunks BEFORE the stage
    recurrence runs, so the result is independent of chunk boundaries and
    intra-batch row order (a group larger than
    spark.sql.execution.arrow.maxRecordsPerBatch arrives as several
    chunks, in no particular time order). Across micro-batches only
    (stage, t1, t2, t3) persists — O(1) state per user."""
    stage, t1, t2, t3 = state.get if state.exists else (0, None, None, None)
    by_type: dict[str, list] = {"view": [], "click": [], "purchase": []}
    for pdf in pdfs:
        us = (pdf["ts"].astype("datetime64[us]").astype("int64")).to_numpy()
        et = pdf["event_type"].to_numpy()
        for kind, acc in by_type.items():
            acc.append(us[et == kind])
    views, clicks, buys = (
        np.concatenate(by_type[k]) if by_type[k] else np.array([], dtype="int64")
        for k in ("view", "click", "purchase")
    )
    if stage == 0 and len(views):
        t1 = int(views.min())
        stage = 1
    if stage == 1:
        qual = clicks[clicks > t1]
        if len(qual):
            t2 = int(qual.min())
            stage = 2
    if stage == 2:
        qual = buys[buys > t2]
        if len(qual):
            t3 = int(qual.min())
            stage = 3
    state.update((stage, t1, t2, t3))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "stage": [stage],
            "view_us": [t1],
            "click_us": [t2],
            "purchase_us": [t3],
        }
    )


def funnel_stage_machine(stream: DataFrame) -> DataFrame:
    """applyInPandasWithState funnel: per-user conversion stage tracked
    incrementally — the streaming form of sequence/pattern matching (a
    bounded MATCH_RECOGNIZE). Equivalent to the batch ``funnel_stages``
    min-join when the feed is replayed in time order (the property
    tests/test_streaming.py pins, single-batch AND split-feed): within a
    batch each step is an order-independent MIN-reduction, and a step
    can only regress if a qualifying earlier event arrives AFTER the
    machine advanced past its stage — impossible on an in-order feed.

    Scale: state is 4 longs per user, sharded by user_id across
    executors; each micro-batch touches only users with new events."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _funnel_fn,
        outputStructType=_FUNNEL_SCHEMA,
        stateStructType=_FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _rollup_one_batch(batch_df: DataFrame) -> DataFrame:
    """The per-batch partial aggregate of the incremental rollup — shared
    with the merge sink so the test can compare against the identical
    batch-side expression (ev19_incremental_rollup's measure set minus
    the JSON column the stream schema drops)."""
    return batch_df.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("event_id") % 1000003).cast("bigint").alias("sum_res"),
    )


def incremental_rollup_sink(stream: DataFrame, path: str, checkpoint: str):
    """Streaming twin of ev19_incremental_rollup: maintain a per
    (event_type, day) rollup TABLE from an event stream by merging each
    micro-batch's partial aggregate into the stored rollup — the
    foreachBatch upsert-to-warehouse pattern (what a MERGE INTO does on
    a transactional table, expressed on plain parquet).

    Exactly-once by VERSIONED COMMITS + APPLIED-BATCH FENCING, not just
    the checkpoint: each merge writes a NEW immutable version directory
    (``v=<batch_id>``), then flips a one-line ``_CURRENT`` pointer with
    an atomic rename — a plain ``mode("overwrite")`` of the live
    directory would have a crash window where the old files are deleted
    and the new _SUCCESS not yet written, silently reinitializing the
    rollup from one micro-batch (review finding). Crash anywhere before
    the pointer flip leaves the old version live and the re-run merges
    from it again (deterministic, same result); a replayed micro-batch
    AFTER the flip (crash before the checkpoint commit — the documented
    foreachBatch replay window) sees ``batch_id <= applied_through`` in
    the pointed-to version and skips. Superseded versions older than the
    previous one are pruned after each successful flip.

    Scale: the merge joins two ROLLUP-sized tables (group-key cardinality,
    not event count) per trigger; the micro-batch aggregate is map-side
    combinable. On a real lakehouse the same function body targets a
    transactional MERGE and drops the versioning."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        import os
        import shutil

        spark = batch_df.sparkSession
        delta = _rollup_one_batch(batch_df)
        cur_path = _rollup_current(path)
        if cur_path is not None:
            cur = spark.read.parquet(cur_path)
            applied = cur.agg(F.max("applied_through")).collect()[0][0]
            if applied is not None and batch_id <= applied:
                return  # replayed batch: already merged, skip (idempotence)
            d = delta.select(
                "event_type", "day",
                F.col("n").alias("n_d"), F.col("sum_res").alias("r_d"),
            )
            z = F.lit(0).cast("bigint")
            merged = (
                cur.drop("applied_through")
                .join(d, ["event_type", "day"], "full_outer")
                .select(
                    "event_type", "day",
                    (F.coalesce("n", z) + F.coalesce("n_d", z))
                    .cast("bigint").alias("n"),
                    (F.coalesce("sum_res", z) + F.coalesce("r_d", z))
                    .cast("bigint").alias("sum_res"),
                )
            )
        else:
            merged = delta
        out = merged.withColumn(
            "applied_through", F.lit(batch_id).cast("bigint")
        )
        vdir = os.path.join(path, f"v={batch_id}")
        out.write.mode("overwrite").parquet(vdir)
        # atomic pointer flip: temp file + os.replace on the same filesystem
        tmp = os.path.join(path, "_CURRENT.tmp")
        with open(tmp, "w") as f:
            f.write(f"v={batch_id}")
        os.replace(tmp, os.path.join(path, "_CURRENT"))
        # prune versions older than the one just superseded (kept as the
        # rollback target); names are v=<int>
        versions = sorted(
            int(n[2:]) for n in os.listdir(path)
            if n.startswith("v=") and n[2:].isdigit()
        )
        for v in versions[:-2]:
            shutil.rmtree(os.path.join(path, f"v={v}"), ignore_errors=True)

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _rollup_current(path: str) -> str | None:
    """Resolve the live version directory of a versioned rollup sink, or
    None if no version has ever committed (missing/dangling pointer)."""
    import os

    ptr = os.path.join(path, "_CURRENT")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        v = f.read().strip()
    vdir = os.path.join(path, v)
    return vdir if os.path.exists(os.path.join(vdir, "_SUCCESS")) else None


def read_rollup(spark: SparkSession, path: str) -> DataFrame:
    """Read the LIVE version of a rollup maintained by
    ``incremental_rollup_sink`` (the pointer indirection is the read
    contract — never read the sink root, it holds multiple versions)."""
    cur = _rollup_current(path)
    if cur is None:
        raise FileNotFoundError(f"no committed rollup version under {path}")
    return spark.read.parquet(cur)


# --- streaming heavy hitters (sharded space-saving) -----------------------------
_HH_OUT_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("ver", LongType()),
        StructField("entity", StringType()),
        StructField("cnt", LongType()),
        StructField("err", LongType()),
    ]
)
_HH_STATE_SCHEMA = StructType(
    [
        StructField("ver", LongType()),
        StructField("keys", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
        StructField("errs", ArrayType(LongType())),
    ]
)


def space_saving_update(table: dict, entities, capacity: int) -> None:
    """The space-saving counter update (Metwally et al. 2005), shared by
    the streaming kernel and the batch twin (hh01) so the state machine
    exists exactly once: increment a present entity; admit while under
    capacity; otherwise evict the min-count entry and let the newcomer
    inherit its count as the documented overestimate bound (``err``).
    ``table`` maps entity -> [cnt, err] and is mutated in place."""
    for entity in entities:
        entity = str(entity)
        if entity in table:
            table[entity][0] += 1
        elif len(table) < capacity:
            table[entity] = [1, 0]
        else:
            victim = min(table, key=lambda k: (table[k][0], k))
            vcnt = table[victim][0]
            del table[victim]
            table[entity] = [vcnt + 1, vcnt]


def _hh_fn_factory(capacity: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ver, keys, counts, errs = state.get
            table = {
                k: [c, e] for k, c, e in zip(keys, counts, errs)
            }
        else:
            ver, table = 0, {}
        ver += 1  # snapshot version: consumers keep each shard's MAX
        for pdf in pdfs:
            space_saving_update(table, pdf["entity"], capacity)
        items = sorted(table.items())
        state.update(
            (
                ver,
                [k for k, _ in items],
                [v[0] for _, v in items],
                [v[1] for _, v in items],
            )
        )
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(items),
                "ver": [ver] * len(items),
                "entity": [k for k, _ in items],
                "cnt": [v[0] for _, v in items],
                "err": [v[1] for _, v in items],
            }
        )

    return fn


def heavy_hitters_stream(
    stream: DataFrame, *, capacity: int = 64, shards: int = 8
) -> DataFrame:
    """Streaming heavy hitters via SHARDED space-saving (Metwally et al.
    2005) — the approximate top-k over an unbounded stream, the shape a
    100-TB event firehose needs when exact per-entity counts won't fit
    anywhere: each shard (hash of the entity, so an entity lives in
    EXACTLY one shard and shard tables merge by plain union) maintains at
    most ``capacity`` counters; a full table evicts its min-count entry
    and the newcomer inherits that count as its documented overestimate
    bound (``err``). Guarantees per shard: true_count <= cnt <=
    true_count + err, and every entity whose true count exceeds
    shard_stream_length / capacity is PRESENT — so corpus-level heavy
    hitters are never missed. With capacity >= distinct entities per
    shard, counts are exact (pinned against the batch groupBy in tests).

    Scale: state is O(shards x capacity) regardless of stream length;
    each micro-batch touches only the shards with new events. Emissions
    are update-mode snapshots stamped with a per-shard ``ver`` counter —
    the rows with each shard's MAX ver are the current table (earlier
    snapshots of an entity later evicted are stale and must not be mixed
    in)."""
    sharded = stream.select(
        F.pmod(F.xxhash64(F.col("user_id").cast("string")), F.lit(shards))
        .cast("int")
        .alias("shard"),
        F.col("user_id").cast("string").alias("entity"),
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        _hh_fn_factory(capacity),
        outputStructType=_HH_OUT_SCHEMA,
        stateStructType=_HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming HLL cardinality (hh02's twin) ------------------------------------
# Constants mirror queries/advanced_ops.py's hh02; the equivalence of the
# two implementations (expression-level batch vs Python state kernel) is
# pinned by test_streaming.test_hll_batch_twin_hh02_matches_stream.
HLL_P = 10
HLL_M = 1 << HLL_P
HLL_WBITS = 60 - HLL_P


def hll_register_update(regs: dict, values) -> None:
    """The HLL register update shared semantics with hh02's expression
    pipeline: md5-60bit hash, low-HLL_P-bit register index, rho =
    leading-zero rank of the remaining HLL_WBITS bits. ``regs`` maps
    register -> max rho and is mutated in place. Registers merge across
    shards/streams by elementwise max (test-pinned), which is what makes
    per-shard state tables unionable without re-reading history."""
    import hashlib

    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        reg, w = h % HLL_M, h // HLL_M
        rho = HLL_WBITS + 1 - w.bit_length()
        if rho > regs.get(reg, 0):
            regs[reg] = rho


_HLL_OUT_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("ver", LongType()),
        StructField("reg", LongType()),
        StructField("rho", LongType()),
    ]
)
_HLL_STATE_SCHEMA = StructType(
    [
        StructField("ver", LongType()),
        StructField("regs", ArrayType(LongType())),
        StructField("rhos", ArrayType(LongType())),
    ]
)


def _hll_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        ver, regs_l, rhos_l = state.get
        regs = dict(zip(regs_l, rhos_l))
    else:
        ver, regs = 0, {}
    ver += 1  # snapshot version: consumers keep each shard's MAX
    for pdf in pdfs:
        hll_register_update(regs, pdf["entity"])
    items = sorted(regs.items())
    state.update((ver, [r for r, _ in items], [x for _, x in items]))
    yield pd.DataFrame(
        {
            "shard": [key[0]] * len(items),
            "ver": [ver] * len(items),
            "reg": [r for r, _ in items],
            "rho": [x for _, x in items],
        }
    )


def hll_distinct_stream(
    stream: DataFrame, *, shards: int = 8, entity_col: str = "user_id"
) -> DataFrame:
    """Streaming approximate COUNT DISTINCT — hh02's register sketch as
    applyInPandasWithState state: entities shard by register index (a
    register lives in EXACTLY one shard, so shard tables union into the
    global register table with no overlap), each shard's state is its
    registers' running max-rho — O(HLL_M) TOTAL state regardless of
    stream length or cardinality, the whole point of HLL on a firehose.
    Emissions are update-mode snapshots stamped with a per-shard ``ver``;
    rows with each shard's MAX ver form the current register table, from
    which the estimate is sum(2^(WBITS+1-rho)) folded into hh02's
    alpha-scaled division (the batch twin computes the identical
    registers with engine expressions — equivalence test-pinned)."""
    # shard by the REGISTER the entity updates: pmod(md5-60bit % M, shards)
    h = F.conv(
        F.substring(F.md5(F.col(entity_col).cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    sharded = stream.select(
        F.pmod(h % HLL_M, F.lit(shards)).cast("int").alias("shard"),
        F.col(entity_col).cast("string").alias("entity"),
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        _hll_fn,
        outputStructType=_HLL_OUT_SCHEMA,
        stateStructType=_HLL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming count-min (hh03's twin) ------------------------------------------
CMS_D = 4
CMS_W = 512


def cms_update(sketch: dict, values) -> None:
    """hh03's salted-md5 count-min placement as an incremental update:
    ``sketch`` maps (row, col) -> count. Counters merge across shards,
    partitions and micro-batches by ADDITION — the property that lets a
    firehose maintain the same table hh03 computes in one batch pass."""
    import hashlib

    for v in values:
        for r in range(CMS_D):
            h = int(hashlib.md5(f"{r}|{v}".encode()).hexdigest()[:15], 16)
            k = (r, h % CMS_W)
            sketch[k] = sketch.get(k, 0) + 1


_CMS_OUT_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("ver", LongType()),
        StructField("r", LongType()),
        StructField("c", LongType()),
        StructField("cnt", LongType()),
    ]
)
_CMS_STATE_SCHEMA = StructType(
    [
        StructField("ver", LongType()),
        StructField("rs", ArrayType(LongType())),
        StructField("cs", ArrayType(LongType())),
        StructField("cnts", ArrayType(LongType())),
    ]
)


def _cms_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        ver, rs, cs, cnts = state.get
        sketch = {(r, c): n for r, c, n in zip(rs, cs, cnts)}
    else:
        ver, sketch = 0, {}
    ver += 1
    for pdf in pdfs:
        cms_update(sketch, pdf["entity"])
    items = sorted(sketch.items())
    state.update(
        (
            ver,
            [r for (r, _c), _ in items],
            [c for (_r, c), _ in items],
            [n for _, n in items],
        )
    )
    yield pd.DataFrame(
        {
            "shard": [key[0]] * len(items),
            "ver": [ver] * len(items),
            "r": [r for (r, _c), _ in items],
            "c": [c for (_r, c), _ in items],
            "cnt": [n for _, n in items],
        }
    )


def countmin_stream(
    stream: DataFrame, *, shards: int = 8, entity_col: str = "user_id"
) -> DataFrame:
    """Streaming count-min — hh03's counter table as
    applyInPandasWithState state, ENTITY-sharded (an entity's d
    placements all live in its shard, so per-shard sub-sketches are
    over disjoint entity populations and the global table is their
    cell-wise SUM — additive merge, test-pinned against the batch
    twin). State is O(shards x d x w) regardless of stream length.
    Emissions are update-mode ver-stamped snapshots; rows with each
    shard's MAX ver sum into the current global table."""
    sharded = stream.select(
        F.pmod(F.xxhash64(F.col(entity_col).cast("string")), F.lit(shards))
        .cast("int")
        .alias("shard"),
        F.col(entity_col).cast("string").alias("entity"),
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        _cms_fn,
        outputStructType=_CMS_OUT_SCHEMA,
        stateStructType=_CMS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming log-linear quantile histogram (qs01's twin) -----------------------
# Constants mirror queries/advanced_ops.py's qs01 (_QS_SIGBITS); histograms
# merge across shards/partitions/micro-batches by per-bucket ADDITION — the
# easiest of the four sketch merges, completing batch/stream parity for all
# sketch families (hh01 space-saving, hh02 HLL, hh03 count-min, qs quantile).
QH_SIGBITS = 5


def _blen(v: int) -> int:
    """length(bin(v)) twin: Spark/DuckDB bin() render negatives as the
    full 64-char two's complement (length 64), while int.bit_length()
    is magnitude-based — using the latter for v < 0 silently diverged
    the stream from the batch expression (review finding). Log-linear
    buckets over negatives are a degenerate-but-defined regime; what
    matters here is that both twins pick the SAME one. bin(0) is the
    one-char string "0", so v == 0 must map to 1, not bit_length()'s 0
    (the shift clamp hid the difference from bucket contents, but the
    octave-ownership shard rule length(bin(bucket)) % shards saw it)."""
    if v == 0:
        return 1
    return v.bit_length() if v > 0 else 64


def qhist_update(hist: dict, cents) -> None:
    """qs01's bucket rule as an incremental update: v truncated to its top
    QH_SIGBITS significant bits (bucket = the value-range lower bound),
    count incremented. ``hist`` maps bucket -> count, mutated in place.
    Python's arithmetic right shift on negatives matches BIGINT
    shiftright, so the negative regime mirrors the engine exactly."""
    for v in cents:
        v = int(v)
        shift = max(_blen(v) - QH_SIGBITS, 0)
        b = (v >> shift) << shift
        hist[b] = hist.get(b, 0) + 1


_QH_OUT_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("ver", LongType()),
        StructField("bucket", LongType()),
        StructField("cnt", LongType()),
    ]
)
_QH_STATE_SCHEMA = StructType(
    [
        StructField("ver", LongType()),
        StructField("buckets", ArrayType(LongType())),
        StructField("cnts", ArrayType(LongType())),
    ]
)


def _qhist_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        ver, buckets, cnts = state.get
        hist = dict(zip(buckets, cnts))
    else:
        ver, hist = 0, {}
    ver += 1
    for pdf in pdfs:
        qhist_update(hist, pdf["cents"])
    items = sorted(hist.items())
    state.update((ver, [b for b, _ in items], [c for _, c in items]))
    yield pd.DataFrame(
        {
            "shard": [key[0]] * len(items),
            "ver": [ver] * len(items),
            "bucket": [b for b, _ in items],
            "cnt": [c for _, c in items],
        }
    )


def quantile_hist_stream(
    stream: DataFrame, *, shards: int = 8, value_col: str = "value"
) -> DataFrame:
    """Streaming log-linear quantile sketch — qs01's histogram as
    applyInPandasWithState state, sharded by BUCKET RANGE (the value's
    octave = bit length, so each shard owns whole log-ranges and a
    bucket lives in EXACTLY one shard): per-shard states are disjoint
    histogram slices that union into the global sketch, from which any
    quantile is answered by qs01's cumulative-rank rule. State is
    O(QH_SIGBITS-bit x 64-octave buckets) per shard regardless of
    stream length; snapshots are update-mode ver-stamped — rows with
    each shard's MAX ver form the current histogram. Equality of the
    unioned max-ver table with the engine-expression batch histogram
    over the same feed is pinned by
    tests/test_streaming.py::test_quantile_hist_stream_matches_batch."""
    cents = "CAST(floor({c} * 100 + 0.5) AS BIGINT)".format(c=value_col)
    sharded = stream.selectExpr(
        f"CAST(pmod(length(bin({cents})), {shards}) AS INT) AS shard",
        f"{cents} AS cents",
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        _qhist_fn,
        outputStructType=_QH_OUT_SCHEMA,
        stateStructType=_QH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming trained-model serving (ts20's twin) -------------------------------
# The production deployment shape for the quality classifier: TRAIN offline
# (batch ts20; driver-bounded, memoized), SERVE the frozen weights on a
# document stream as a stateless projection — no state store, no shuffle,
# exactly-once under any sink because the score is a pure row function.

DOCUMENTS_RAW_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents parquet (one file here; a
    dated crawl-drop directory tree in production)."""
    return (
        spark.readStream.schema(DOCUMENTS_RAW_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )


def quality_score_stream(
    stream: DataFrame, iw: list[int], bias: int
) -> DataFrame:
    """Score a document stream with the trained ts20 weights — the same
    map-only integer fold as the batch scorer (weights as literals), so
    stream rows equal batch rows EXACTLY, not approximately. Emits
    (doc_id, split, label, score_micro, pred)."""
    from xarray_sql_spark.queries.pipeline_ops import (
        _TS20_LABEL_SPARK,
        _TS20_SPLIT_SPARK,
        _ts20_score_expr,
    )

    score = _ts20_score_expr(iw, bias)
    return (
        stream.selectExpr(
            "doc_id",
            "filter(split(text, ' '), x -> x <> '') AS ws",
            f"{_TS20_SPLIT_SPARK} AS split",
        )
        .selectExpr(
            "doc_id",
            "ws",
            "split",
            f"{_TS20_LABEL_SPARK} AS y",
        )
        .selectExpr(
            "CAST(doc_id AS BIGINT) AS doc_id",
            "split",
            "CAST(y AS INT) AS label",
            f"CAST({score} AS BIGINT) AS score_micro",
        )
        .selectExpr(
            "doc_id",
            "split",
            "label",
            "score_micro",
            "CAST(IF(score_micro > 0, 1, 0) AS INT) AS pred",
        )
    )


# --- streaming ingest cleanup (ts21's twin) ---------------------------------
def unicode_clean_stream(stream) -> "DataFrame":
    """ts21's unicode-cleanup census applied at INGEST time — where the
    pass actually runs in production (a crawl drop is a stream, and NFC
    + control-strip must happen before any downstream hash or gate sees
    the text). Stateless projection: no watermark, no state store, no
    shuffle; the NFC pandas UDF runs per micro-batch exactly as it runs
    per Arrow batch in the batch plan, so stream rows equal batch rows
    EXACTLY (same md5 of the cleaned text)."""
    from xarray_sql_spark.queries.pipeline_ops import ts21_project

    return ts21_project(stream)


# --- streaming decayed event mass (hh05's twin) ------------------------------
_DECAY_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("decayed", DoubleType()),
    ]
)
_DECAY_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("s", DoubleType())]
)


def _decay_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["wt"].sum())
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "decayed": [s]}
    )


def decayed_mass_stream(stream: DataFrame, d0: str) -> DataFrame:
    """hh05's twin: per-user exponentially time-decayed event mass on a
    stream, with the decay origin ``d0`` FROZEN offline (the ts20
    train-offline/serve-frozen contract — a live deployment re-anchors
    d0 per day and rescales state by a power of two, which is exact).
    Because each event's weight is 2^-(age DIV halflife) — a power of
    two — the per-user running sum is EXACT dyadic arithmetic: any
    micro-batch boundary produces the identical double, so stream state
    equals the batch aggregate bit-for-bit, not approximately."""
    from xarray_sql_spark.queries.advanced_ops import _HH05_HALFLIFE_DAYS

    # The age term is clamped on BOTH sides: least(..., 62) keeps the
    # shift inside a BIGINT (hh05's decay-shift rule), and greatest(..., 0)
    # guards the streaming-only case of an event NEWER than the frozen d0
    # (late re-anchoring): a negative count would wrap mod 64 in Java
    # shiftleft and silently score the event with a huge or negative
    # weight (r12 ADVICE). Ahead-of-origin events get weight 1.0 — the
    # freshest bucket — until the deployment re-anchors d0.
    w = stream.selectExpr(
        "user_id",
        f"CAST(1.0 AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT),"
        f" CAST(least(greatest(datediff(DATE'{d0}', to_date(ts)), 0)"
        f" DIV {_HH05_HALFLIFE_DAYS}, 62) AS INT)) AS DOUBLE) AS wt",
    )
    return w.groupBy("user_id").applyInPandasWithState(
        _decay_fn,
        outputStructType=_DECAY_OUT_SCHEMA,
        stateStructType=_DECAY_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming n-gram-classifier serving (ts25's twin) -----------------------
def ngram_score_stream(
    stream: DataFrame, iw: list[int], bias: int
) -> DataFrame:
    """Serve the trained ts25 unigram+bigram scorer on a document stream
    — ts20's quality_score_stream contract one feature order higher:
    train offline (batch ts25_train; driver-bounded, memoized), score
    the stream as a stateless map-only integer fold (weights as
    literals, the SAME _ts25_score_expr definition as batch), so stream
    rows equal batch rows EXACTLY. No state store, no shuffle,
    exactly-once under any sink."""
    from xarray_sql_spark.queries.pipeline_ops import (
        _TS20_LABEL_SPARK,
        _TS20_SPLIT_SPARK,
        _ts25_score_expr,
    )

    score = _ts25_score_expr(iw, bias)
    return (
        stream.selectExpr(
            "doc_id",
            "filter(split(text, ' '), x -> x <> '') AS ws",
            f"{_TS20_SPLIT_SPARK} AS split",
        )
        .selectExpr("doc_id", "ws", "split", f"{_TS20_LABEL_SPARK} AS y")
        .selectExpr(
            "CAST(doc_id AS BIGINT) AS doc_id",
            "split",
            "CAST(y AS INT) AS label",
            f"CAST({score} AS BIGINT) AS score_micro",
        )
        .selectExpr(
            "doc_id",
            "split",
            "label",
            "score_micro",
            "CAST(IF(score_micro > 0, 1, 0) AS INT) AS pred",
        )
    )


# --- streaming license/robots gate at ingest (pl22's twin) --------------------
def license_gate_stream(spark: SparkSession, stream: DataFrame) -> DataFrame:
    """pl22's policy resolution applied where it runs in production — at
    INGEST, before any document is admitted to the corpus: canonicalize
    the URL, extract the registered domain, resolve the policy (exact-
    domain override > public-suffix rule > 'unknown') and tag each
    document with (domain, policy, trainable). Stateless row-wise
    projection plus two STREAM-STATIC broadcast joins against the
    literal policy dims — no watermark, no state store, no shuffle on
    the stream side, so stream rows equal the batch gate's per-document
    tagging EXACTLY."""
    from pyspark.sql import functions as F  # noqa: PLC0415 (local, matches file style)

    from xarray_sql_spark.queries.pipeline_ops import (
        _pl17_canon_expr,
        _pl17_domain_expr,
        _pl17_host_of_canon,
        _pl17_url_expr,
        pl22_resolve_policy,
    )

    dom = (
        stream.selectExpr(
            "doc_id",
            "size(filter(split(text, ' '), x -> x <> '')) AS words",
            f"{_pl17_url_expr('spark')} AS url",
        )
        .selectExpr("doc_id", "words", f"{_pl17_canon_expr('spark')} AS curl")
        .selectExpr(
            "doc_id",
            "words",
            f"{_pl17_domain_expr('spark', _pl17_host_of_canon('spark', 'curl'))}"
            " AS domain",
        )
    )
    return pl22_resolve_policy(spark, dom).selectExpr(
        "CAST(doc_id AS BIGINT) AS doc_id",
        "CAST(words AS BIGINT) AS words",
        "domain",
        "policy",
        "CAST(IF(policy = 'allow', 1, 0) AS INT) AS trainable",
    )
