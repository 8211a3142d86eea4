"""Structured Streaming operators vs their batch twins.

Each streaming result (driven to completion with availableNow) must equal
the same aggregation computed in batch over the same parquet — streaming
correctness reduces to batch correctness plus state/watermark mechanics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from xarray_sql_spark.session import table
from xarray_sql_spark.streaming import events as se


@pytest.fixture(scope="module")
def batch_events(spark):
    return table(spark, SF_SMALL, "events").select(
        "event_id", "ts", "user_id", "event_type", F.col("value").cast("double")
    )


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


def test_windowed_counts_match_batch(spark, batch_events):
    stream_out = se.run_to_memory(
        se.windowed_counts(se.events_stream(spark, SF_SMALL)), "t_windowed"
    )
    # Append mode emits a window only once the watermark (max event time −
    # 1 h) has passed its end; the trailing windows stay open at end-of-
    # stream. The batch expectation models exactly that finalization rule.
    max_ts = batch_events.agg(F.max("ts")).collect()[0][0]
    batch_out = (
        batch_events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .filter(F.col("w.end") <= F.lit(max_ts) - F.expr("INTERVAL 1 HOUR"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "avg_value")
    )
    assert stream_out.count() > 0
    assert _rows(stream_out, "window_start", "event_type") == _rows(
        batch_out, "window_start", "event_type"
    )


def test_session_windows_match_batch(spark, batch_events):
    stream_out = se.run_to_memory(
        se.session_windows(se.events_stream(spark, SF_SMALL)), "t_sessions"
    )
    max_ts = batch_events.agg(F.max("ts")).collect()[0][0]
    batch_out = (
        batch_events.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        # Same finalization rule as windows: sessions still open (end within
        # the 1 h watermark delay of max event time) are not emitted yet.
        .filter(F.col("w.end") <= F.lit(max_ts) - F.expr("INTERVAL 1 HOUR"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )
    assert _rows(stream_out, "user_id", "session_start") == _rows(
        batch_out, "user_id", "session_start"
    )
    # Emitted sessions cover nearly all events; totals reconcile up to the
    # unfinalized tail.
    n_stream = stream_out.agg(F.sum("n_events")).collect()[0][0]
    n_all = batch_events.count()
    assert n_stream <= n_all
    assert n_stream >= n_all * 0.95


def test_stateful_user_stats(spark, batch_events):
    stream_out = se.run_to_memory(
        se.user_running_stats(se.events_stream(spark, SF_SMALL)),
        "t_user_stats",
        output_mode="update",
    )
    # availableNow may run 1+ micro-batches; the LAST update per user is the
    # final state. With a single batch there is exactly one row per user.
    final = {r["user_id"]: r for r in stream_out.collect()}
    expect = {
        r["user_id"]: r
        for r in batch_events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    assert set(final) == set(expect)
    for uid, r in final.items():
        assert r["n_events"] == expect[uid]["n"]
        assert float(r["max_value"]) == pytest.approx(expect[uid]["mx"])


def test_stream_dedup_drops_duplicate_keys(spark, batch_events):
    # event_type has 5 values: the stream must emit at most one row per
    # value (exactly one here since all data is inside one watermark batch).
    stream = se.events_stream(spark, SF_SMALL)
    deduped = se.stream_dedup(stream, ["event_type"])
    out = se.run_to_memory(deduped, "t_dedup")
    assert out.count() == 5
    assert {r["event_type"] for r in out.select("event_type").collect()} == {
        "click", "error", "purchase", "signup", "view"
    }


def test_stream_to_partitioned_parquet(spark, batch_events, tmp_path):
    path = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    q = se.write_stream_partitioned(
        se.events_stream(spark, SF_SMALL), path, ("event_type",), ckpt
    )
    q.awaitTermination()
    back = spark.read.parquet(path)
    assert back.count() == batch_events.count()
    import glob as g
    assert {p.split("=")[-1] for p in g.glob(path + "/event_type=*")} == {
        "click", "error", "purchase", "signup", "view"
    }


def test_stream_stream_join_matches_batch(spark, batch_events):
    """Inner stream-stream self-join (purchases × prior-hour clicks) must
    equal the batch range join ev05 — inner joins emit on match, so with
    availableNow the full pair set appears with no finalization cut."""
    from xarray_sql_spark.queries import REGISTRY

    stream_out = se.run_to_memory(
        se.purchase_click_stream_join(se.events_stream(spark, SF_SMALL)),
        "t_ss_join",
    )
    batch_out = REGISTRY["ev05_purchase_click_join"].fn(spark, SF_SMALL)
    assert stream_out.count() > 0
    key = ("purchase_id", "click_us")
    assert _rows(stream_out, *key) == _rows(batch_out, *key)


def test_stream_static_join_matches_batch(spark, batch_events):
    """Stream-static enrichment must equal the same join computed in batch;
    the static side carries no watermark/state (re-read per micro-batch)."""
    dim = se.signup_dim(spark, SF_SMALL)
    stream_out = se.run_to_memory(
        se.enrich_stream_with_static(se.events_stream(spark, SF_SMALL), dim),
        "t_static_join",
    )
    batch_out = se.enrich_stream_with_static(batch_events, dim)
    assert stream_out.count() > 0
    key = ("purchase_id",)
    assert _rows(stream_out, *key) == _rows(batch_out, *key)


def test_asof_enrich_matches_batch_q27(spark, batch_events):
    """Streaming as-of enrichment == the batch as-of join (q27) over the
    same events: per-purchase (purchase_us, last_click_us, gap_us) sets
    must be identical when the whole feed fits one availableNow batch."""
    from xarray_sql_spark.queries import REGISTRY

    stream_out = se.run_to_memory(
        se.asof_enrich(se.events_stream(spark, SF_SMALL)), "t_asof"
    )
    batch_out = REGISTRY["q27_asof_join"].fn(spark, SF_SMALL)
    s = {tuple(r) for r in stream_out.collect()}
    b = {tuple(r) for r in batch_out.collect()}
    assert len(s) == len(b) > 0
    assert s == b


def test_asof_enrich_state_carries_across_microbatches(spark, batch_events, tmp_path):
    """Split the (time-ordered) events into two files and force one file
    per micro-batch: purchases in batch 2 must still see clicks from
    batch 1 via the carried per-user state — the cross-batch half of the
    as-of contract that a single availableNow batch never exercises."""
    import os

    src = batch_events.select("event_id", "ts", "user_id", "event_type", "value")
    rows = src.orderBy("ts").collect()
    half = len(rows) // 2
    outdir = str(tmp_path / "asof_feed")
    os.makedirs(outdir)
    for i, part in enumerate((rows[:half], rows[half:])):
        spark.createDataFrame(part, src.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(outdir, f"b{i}"))

    schema = src.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(outdir, "b*"))
    )
    out = se.run_to_memory(se.asof_enrich(stream), "t_asof_batches")

    batch = {tuple(r) for r in
             __import__("xarray_sql_spark.queries", fromlist=["REGISTRY"])
             .REGISTRY["q27_asof_join"].fn(spark, SF_SMALL).collect()}
    got = {tuple(r) for r in out.collect()}
    assert len(got) == len(batch) > 0
    # Streaming processes files in order, so in-order feeds are exact —
    # including purchases whose latest click landed in the earlier batch.
    assert got == batch


def _poll_to_memory(spark, df, name, done, *, output_mode="append", timeout=90):
    """Run a stream that can NEVER terminate on its own (processing-time
    TTLs keep scheduling timer-service micro-batches even after the feed is
    exhausted — by design: a TTL stream is a continuous query). Poll the
    memory sink until ``done(batch_df)`` holds, then stop the query."""
    import time

    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    try:
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            if done(spark.table(name)):
                return spark.table(name)
            time.sleep(1.0)
        raise AssertionError(f"stream {name} never reached the done condition")
    finally:
        q.stop()


def test_asof_ttl_evicts_idle_user_state(spark, tmp_path):
    """With a (tiny) processing-time TTL, a user idle across a micro-batch
    loses the carried click: the later purchase enriches to NULL — the
    bounded-state trade. The same feed without a TTL keeps the click."""
    import datetime as dt
    import os
    import time

    import pandas as pd

    def _ts(s):
        return dt.datetime.fromisoformat(s)

    def _feed(suffix):
        outdir = str(tmp_path / f"ttl_feed_{suffix}")
        os.makedirs(outdir)
        batches = [
            # b0: user 1 clicks
            [(1, _ts("2024-01-01 10:00:00"), 1, "click", 1.0)],
            # b1: only user 2 traffic -> user 1 idle, its timer may fire
            [(2, _ts("2024-01-01 10:01:00"), 2, "view", 1.0)],
            # b2: user 1 purchases
            [(3, _ts("2024-01-01 10:05:00"), 1, "purchase", 9.0)],
        ]
        for i, rows in enumerate(batches):
            spark.createDataFrame(
                rows, "event_id long, ts timestamp, user_id long, "
                      "event_type string, value double"
            ).coalesce(1).write.parquet(os.path.join(outdir, f"b{i}"))
            time.sleep(0.05)  # distinct mtimes keep file order deterministic
        return (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(outdir, "b*"))
        )

    with_ttl = _poll_to_memory(
        spark, se.asof_enrich(_feed("on"), ttl_ms=1), "t_asof_ttl_on",
        lambda t: t.count() >= 1,
    )
    got = {r["purchase_id"]: r["last_click_us"] for r in with_ttl.collect()}
    assert got == {3: None}  # click state evicted before the purchase

    # without a TTL the feed terminates on its own and the click carries
    no_ttl = se.run_to_memory(se.asof_enrich(_feed("off")), "t_asof_ttl_off")
    got = {r["purchase_id"]: r["last_click_us"] for r in no_ttl.collect()}
    assert got == {3: int(pd.Timestamp("2024-01-01 10:00:00").value // 1000)}


def test_user_stats_with_ttl_matches_batch_when_horizon_is_long(
    spark, batch_events
):
    """A TTL far beyond the run's wall time must not change results — pins
    that the timeout wiring (setTimeoutDuration per update) is inert until
    a key actually idles past it."""
    expect = {
        r["user_id"]: r
        for r in batch_events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.max("value").alias("mx"))
        .collect()
    }

    def _complete(t):
        # update mode: last row per user wins; done when every user's
        # running count has reached its batch total
        rows = t.collect()
        final = {}
        for r in rows:  # memory sink appends updates in batch order
            final[r["user_id"]] = r
        return set(final) == set(expect) and all(
            final[u]["n_events"] == expect[u]["n"] for u in expect
        )

    stream_out = _poll_to_memory(
        spark,
        se.user_running_stats(se.events_stream(spark, SF_SMALL), ttl_ms=3_600_000),
        "t_user_stats_ttl",
        _complete,
        output_mode="update",
    )
    final = {r["user_id"]: r for r in stream_out.collect()}
    assert set(final) == set(expect)
    for uid, r in final.items():
        assert r["n_events"] == expect[uid]["n"]


def test_lsh_neardup_gate_matches_batch(spark):
    """Streaming MinHash-LSH near-dup verdicts == the batch computation
    with the same band keys (min doc_id per band claims it), driven in two
    micro-batches so the band state carries across them. Also pins that
    the per-row band expression equals dd04's aggregated banding."""
    import os
    import tempfile

    from xarray_sql_spark.queries.dedup_lsh import minhash_bands_expr
    from xarray_sql_spark.streaming import dedup as sd

    docs = table(spark, SF_SMALL, "documents")
    bands = docs.select(
        "doc_id", F.explode(minhash_bands_expr()).alias("b")
    ).select("doc_id", "b.band_idx", "b.band_hash")

    # batch ground truth: first claimant per band, verdict per doc
    firsts = bands.groupBy("band_idx", "band_hash").agg(
        F.min("doc_id").alias("first_doc")
    )
    want = {
        r["doc_id"]: r["is_near_dup"]
        for r in bands.join(firsts, ["band_idx", "band_hash"])
        .groupBy("doc_id")
        .agg(F.max((F.col("first_doc") < F.col("doc_id")).cast("int")).alias("is_near_dup"))
        .collect()
    }

    # two-file feed -> two micro-batches
    rows = docs.orderBy("doc_id").collect()
    half = len(rows) // 2
    outdir = tempfile.mkdtemp()
    for i, part in enumerate((rows[:half], rows[half:])):
        spark.createDataFrame(part, docs.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(outdir, f"b{i}"))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(outdir, "b*"))
    )
    sink = se.run_to_memory(sd.lsh_band_firsts(stream), "t_lsh_firsts")
    got = {
        r["doc_id"]: r["is_near_dup"]
        for r in sd.near_dup_verdicts(sink).collect()
    }
    assert got == want
    assert sum(got.values()) > 0  # the synthetic corpus has near-dups


def test_funnel_stage_machine_matches_batch(spark, batch_events):
    """Streaming funnel stage machine == batch funnel_stages min-joins over
    the same events (users with >= 1 view; stage + per-stage first-hit
    timestamps), single availableNow batch."""
    from xarray_sql_spark.queries.pipeline_ops import funnel_stages

    out = se.run_to_memory(
        se.funnel_stage_machine(se.events_stream(spark, SF_SMALL)),
        "t_funnel",
        output_mode="update",
    )
    got = {
        r["user_id"]: (r["stage"], r["view_us"], r["click_us"], r["purchase_us"])
        for r in out.collect()
        if r["stage"] > 0
    }
    expect = {}
    for r in funnel_stages(batch_events).select(
        "user_id",
        F.unix_micros("t1").alias("u1"),
        F.unix_micros("t2").alias("u2"),
        F.unix_micros("t3").alias("u3"),
    ).collect():
        stage = 1 + (r["u2"] is not None) + (r["u3"] is not None)
        expect[r["user_id"]] = (stage, r["u1"], r["u2"], r["u3"])
    assert len(expect) > 0
    assert got == expect


def test_funnel_state_carries_across_microbatches(spark, batch_events, tmp_path):
    """Split the time-ordered feed into two files, one per micro-batch: a
    click in batch 2 must still advance a funnel whose view landed in
    batch 1 — the cross-batch half of the stage-machine contract."""
    import os

    from xarray_sql_spark.queries.pipeline_ops import funnel_stages

    src = batch_events.select("event_id", "ts", "user_id", "event_type", "value")
    rows = src.orderBy("ts").collect()
    half = len(rows) // 2
    outdir = str(tmp_path / "funnel_feed")
    os.makedirs(outdir)
    for i, part in enumerate((rows[:half], rows[half:])):
        spark.createDataFrame(part, src.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(outdir, f"b{i}"))

    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(outdir, "b*"))
    )
    out = se.run_to_memory(
        se.funnel_stage_machine(stream), "t_funnel_batches", output_mode="update"
    )
    # update mode emits one row per touched user per batch: keep the LAST
    # (highest-stage) row per user.
    latest = {}
    for r in out.collect():
        cur = latest.get(r["user_id"])
        if cur is None or r["stage"] >= cur[0]:
            latest[r["user_id"]] = (
                r["stage"], r["view_us"], r["click_us"], r["purchase_us"]
            )
    got = {u: v for u, v in latest.items() if v[0] > 0}
    expect = {}
    for r in funnel_stages(batch_events).select(
        "user_id",
        F.unix_micros("t1").alias("u1"),
        F.unix_micros("t2").alias("u2"),
        F.unix_micros("t3").alias("u3"),
    ).collect():
        stage = 1 + (r["u2"] is not None) + (r["u3"] is not None)
        expect[r["user_id"]] = (stage, r["u1"], r["u2"], r["u3"])
    assert len(expect) > 0
    assert got == expect


def test_funnel_is_chunk_order_independent(spark, batch_events, tmp_path):
    """A group bigger than the Arrow batch size arrives as several chunks
    in no particular time order: feed the events REVERSED in time with a
    tiny maxRecordsPerBatch so every user spans many chunks — the stage
    machine must still equal the batch min-join semantics."""
    import os

    from xarray_sql_spark.queries.pipeline_ops import funnel_stages

    src = batch_events.select("event_id", "ts", "user_id", "event_type", "value")
    rows = src.orderBy(F.col("ts").desc()).collect()  # worst-case order
    outdir = str(tmp_path / "funnel_rev")
    os.makedirs(outdir)
    spark.createDataFrame(rows, src.schema).coalesce(1).write.parquet(
        os.path.join(outdir, "b0")
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        stream = (
            spark.readStream.schema(src.schema).parquet(os.path.join(outdir, "b*"))
        )
        out = se.run_to_memory(
            se.funnel_stage_machine(stream), "t_funnel_rev", output_mode="update"
        )
        got = {
            r["user_id"]: (r["stage"], r["view_us"], r["click_us"], r["purchase_us"])
            for r in out.collect()
            if r["stage"] > 0
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    expect = {}
    for r in funnel_stages(batch_events).select(
        "user_id",
        F.unix_micros("t1").alias("u1"),
        F.unix_micros("t2").alias("u2"),
        F.unix_micros("t3").alias("u3"),
    ).collect():
        stage = 1 + (r["u2"] is not None) + (r["u3"] is not None)
        expect[r["user_id"]] = (stage, r["u1"], r["u2"], r["u3"])
    assert len(expect) > 0
    assert got == expect


def test_watermark_drops_late_event_from_finalized_window(spark, tmp_path):
    """Append-mode windowed aggregation with a 1-hour watermark: a late
    event must be EXCLUDED from its already-finalized window — the
    bounded-state guarantee. Existing equivalence tests never feed late
    data; this is the drop-side proof.

    Empirical Spark detail this fixture accounts for: the late-row
    FILTER uses the watermark committed one batch earlier than the value
    the progress line reports, so the drop takes effect one micro-batch
    AFTER the advance (a late row landing in the very next batch still
    merges into live state). Hence three files: b0 sets the high event
    time, b1 commits the advanced watermark, b2 carries the late row."""
    import datetime as dt
    import os

    def ts(h, m):
        return dt.datetime(2024, 3, 1, h, m)

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    b0 = [(1, ts(10, 0), 1, "view", 1.0), (2, ts(10, 10), 1, "view", 1.0),
          (3, ts(12, 50), 1, "view", 1.0)]
    b1 = [(5, ts(13, 30), 1, "view", 1.0)]  # commits watermark 11:50
    # 10:20 is LATE (watermark 12:30 by now); 14:30 keeps time advancing
    b2 = [(6, ts(10, 20), 1, "view", 1.0), (7, ts(14, 30), 1, "view", 1.0)]
    outdir = str(tmp_path / "late_feed")
    os.makedirs(outdir)
    for i, rows in enumerate((b0, b1, b2)):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(outdir, f"b{i}")
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(outdir, "b*"))
    )
    out = se.run_to_memory(
        se.windowed_counts(stream, watermark="1 hour"), "t_late", output_mode="append"
    )
    rows = {
        (r["window_start"], r["event_type"]): r["n_events"] for r in out.collect()
    }
    ten_am = dt.datetime(2024, 3, 1, 10, 0)
    # the 10:00 window finalized with its two on-time events; the late
    # 10:20 arrival was dropped, not merged to 3 and not resurrected as
    # a second 10:00 output row
    assert rows.get((ten_am, "view")) == 2, rows
    assert sum(1 for (w, _t) in rows if w == ten_am) == 1, rows


def test_incremental_rollup_sink_matches_batch(spark, batch_events, tmp_path):
    """Three micro-batches merged into the stored rollup must equal the
    direct batch rollup over all events — the streaming form of ev19's
    merge(partial(base), partial(delta)) == full-recompute identity."""
    import os

    src = batch_events.select("event_id", "ts", "user_id", "event_type", "value")
    rows = src.orderBy("ts").collect()
    third = len(rows) // 3
    outdir = str(tmp_path / "roll_feed")
    os.makedirs(outdir)
    chunks = (rows[:third], rows[third : 2 * third], rows[2 * third :])
    for i, part in enumerate(chunks):
        spark.createDataFrame(part, src.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(outdir, f"b{i}"))

    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(outdir, "b*"))
    )
    sink = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    q = se.incremental_rollup_sink(stream, sink, ckpt)
    q.awaitTermination(120)

    got = _rows(
        se.read_rollup(spark, sink).select("event_type", "day", "n", "sum_res"),
        "event_type",
        "day",
    )
    expect = _rows(se._rollup_one_batch(batch_events), "event_type", "day")
    assert len(expect) > 0
    assert got == expect
    # >1 micro-batch actually merged (not one big batch)
    applied = se.read_rollup(spark, sink).agg(
        F.max("applied_through")
    ).collect()[0][0]
    assert applied >= 2


def test_incremental_rollup_replay_is_idempotent(spark, batch_events, tmp_path):
    """Restarting the finished stream with the SAME checkpoint must not
    change the stored rollup (no new data); and re-applying an
    already-merged batch id by hand must be fenced by applied_through —
    the documented foreachBatch replay window."""
    import os

    src = batch_events.select("event_id", "ts", "user_id", "event_type", "value")
    feed = str(tmp_path / "feed")
    src.coalesce(1).write.mode("overwrite").parquet(feed)
    schema = src.schema
    sink = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    def _run():
        stream = spark.readStream.schema(schema).parquet(feed)
        q = se.incremental_rollup_sink(stream, sink, ckpt)
        q.awaitTermination(120)

    _run()
    before = _rows(
        se.read_rollup(spark, sink).select("event_type", "day", "n", "sum_res"),
        "event_type",
        "day",
    )
    _run()  # restart on same checkpoint: no new files, nothing merged
    after = _rows(
        se.read_rollup(spark, sink).select("event_type", "day", "n", "sum_res"),
        "event_type",
        "day",
    )
    assert after == before

    # Force a genuine REPLAY: wipe the checkpoint so the source re-delivers
    # everything as batch 0 again — applied_through (>= 0) must fence the
    # merge, leaving the rollup byte-identical instead of double-counted.
    import shutil

    shutil.rmtree(ckpt)
    _run()
    replayed = _rows(
        se.read_rollup(spark, sink).select("event_type", "day", "n", "sum_res"),
        "event_type",
        "day",
    )
    assert replayed == before


def test_heavy_hitters_exact_when_capacity_suffices(spark, batch_events):
    """With capacity >= distinct entities per shard, sharded space-saving
    degenerates to exact counting: the merged shard tables must equal the
    batch per-user counts (an entity hashes to exactly one shard, so the
    merge is plain union)."""
    n_users = batch_events.select("user_id").distinct().count()
    out = se.run_to_memory(
        se.heavy_hitters_stream(
            se.events_stream(spark, SF_SMALL), capacity=n_users + 10, shards=4
        ),
        "t_hh_exact",
        output_mode="update",
    )
    # current table per shard = the rows carrying that shard's MAX ver
    rows = out.collect()
    max_ver = {}
    for r in rows:
        max_ver[r["shard"]] = max(max_ver.get(r["shard"], 0), r["ver"])
    merged = {}
    for r in rows:
        if r["ver"] != max_ver[r["shard"]]:
            continue  # stale snapshot from an earlier micro-batch
        assert r["err"] == 0  # no evictions -> exact
        merged[r["entity"]] = merged.get(r["entity"], 0) + r["cnt"]
    expect = {
        str(r["user_id"]): r["n"]
        for r in batch_events.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert merged == expect


def test_heavy_hitters_guarantee_under_eviction(spark, batch_events):
    """With a tight capacity the counts are approximate, but space-saving's
    guarantees must hold per shard: cnt is never an underestimate
    (cnt - err <= true <= cnt) and every entity whose true count exceeds
    shard_len / capacity is present in its shard's table."""
    CAP = 3  # 15 distinct users over 2 shards -> ~7/shard: evictions fire
    SHARDS = 2
    out = se.run_to_memory(
        se.heavy_hitters_stream(
            se.events_stream(spark, SF_SMALL), capacity=CAP, shards=SHARDS
        ),
        "t_hh_approx",
        output_mode="update",
    )
    # only the FINAL snapshot per shard obeys the full-stream bounds (an
    # entity evicted after an earlier emission has a stale smaller cnt)
    rows = out.collect()
    max_ver = {}
    for r in rows:
        max_ver[r["shard"]] = max(max_ver.get(r["shard"], 0), r["ver"])
    table = {
        (r["shard"], r["entity"]): (r["cnt"], r["err"])
        for r in rows
        if r["ver"] == max_ver[r["shard"]]
    }

    truth = {
        str(r["user_id"]): r["n"]
        for r in batch_events.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    shard_of = {
        str(r["user_id"]): r["shard"]
        for r in batch_events.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.pmod(F.xxhash64(F.col("user_id").cast("string")), F.lit(SHARDS))
            .cast("int")
            .alias("shard"),
        )
        .collect()
    }
    shard_len = {}
    for e, n in truth.items():
        shard_len[shard_of[e]] = shard_len.get(shard_of[e], 0) + n

    evicted_somewhere = False
    for (sh, e), (cnt, err) in table.items():
        true = truth[e]
        assert true <= cnt <= true + err, (e, cnt, err, true)
        evicted_somewhere = evicted_somewhere or err > 0
    assert evicted_somewhere  # capacity was actually exercised
    for e, true in truth.items():
        sh = shard_of[e]
        if true > shard_len[sh] / CAP:  # the space-saving presence bound
            assert (sh, e) in table, (e, true, shard_len[sh])


def test_heavy_hitters_batch_twin_hh01_matches_stream(spark):
    """hh01 (batch) and heavy_hitters_stream share the SAME counter-update
    kernel but different shard assignments (user_id % 32 vs
    xxhash64 % shards) — sharding only partitions the work, so in the
    exact regime (capacity >= distinct entities per shard) the global
    (entity, cnt, err) top-k must be identical. This is the direct
    batch-vs-streaming twin pin; the kernel itself is pinned by the
    Hypothesis differential in test_properties.py."""
    from xarray_sql_spark.queries import REGISTRY

    batch_top = [
        (r["entity"], r["cnt"], r["err"])
        for r in REGISTRY["hh01_heavy_hitters"].fn(spark, SF_SMALL).collect()
    ]
    out = se.run_to_memory(
        se.heavy_hitters_stream(
            se.events_stream(spark, SF_SMALL), capacity=4096, shards=4
        ),
        "t_hh_twin",
        output_mode="update",
    )
    rows = out.collect()
    max_ver = {}
    for r in rows:
        max_ver[r["shard"]] = max(max_ver.get(r["shard"], 0), r["ver"])
    merged = {}
    for r in rows:
        if r["ver"] == max_ver[r["shard"]]:
            assert r["err"] == 0  # exact regime on both sides
            merged[r["entity"]] = merged.get(r["entity"], 0) + r["cnt"]
    stream_top = sorted(
        ((e, c, 0) for e, c in merged.items()), key=lambda t: (-t[1], t[0])
    )[: len(batch_top)]
    assert stream_top == batch_top


def test_hll_batch_twin_hh02_matches_stream(spark):
    """hh02 (expression-level batch HLL) and hll_distinct_stream (Python
    state kernel) must build the IDENTICAL register table: same md5-60bit
    hash, same register split, same rho — so the integer fold s_sum and
    the rounded estimate agree exactly. Register sharding only partitions
    the table (a register lives in one shard), so max-ver shard snapshots
    union into the global table."""
    from xarray_sql_spark.queries import REGISTRY
    from xarray_sql_spark.queries.advanced_ops import _HLL_ALPHA_NUM
    from xarray_sql_spark.streaming.events import HLL_M, HLL_WBITS

    batch = REGISTRY["hh02_hll_distinct"].fn(spark, SF_SMALL).collect()[0]
    out = se.run_to_memory(
        se.hll_distinct_stream(
            se.events_stream(spark, SF_SMALL), shards=4, entity_col="event_id"
        ),
        "t_hll_twin",
        output_mode="update",
    )
    rows = out.collect()
    max_ver = {}
    for r in rows:
        max_ver[r["shard"]] = max(max_ver.get(r["shard"], 0), r["ver"])
    regs = {}
    for r in rows:
        if r["ver"] == max_ver[r["shard"]]:
            assert r["reg"] not in regs  # registers never straddle shards
            regs[r["reg"]] = r["rho"]
    s_sum = sum(1 << (HLL_WBITS + 1 - rho) for rho in regs.values()) + (
        HLL_M - len(regs)
    ) * (1 << (HLL_WBITS + 1))
    assert s_sum == batch["s_sum"]
    assert round(_HLL_ALPHA_NUM / s_sum, 3) == batch["est_hll"]


def test_cms_batch_twin_hh03_matches_stream(spark):
    """hh03 (expression-level batch count-min) and countmin_stream must
    build the IDENTICAL counter table: entity sharding partitions the
    population, so max-ver shard snapshots SUM cell-wise into the global
    table, and every hh03 probe row's estimate must equal the min over
    that table's d counters for the key."""
    import hashlib

    from xarray_sql_spark.queries import REGISTRY
    from xarray_sql_spark.queries.advanced_ops import _CMS_D, _CMS_W

    out = se.run_to_memory(
        se.countmin_stream(
            se.events_stream(spark, SF_SMALL), shards=4, entity_col="user_id"
        ),
        "t_cms_twin",
        output_mode="update",
    )
    rows = out.collect()
    max_ver = {}
    for r in rows:
        max_ver[r["shard"]] = max(max_ver.get(r["shard"], 0), r["ver"])
    table = {}
    for r in rows:
        if r["ver"] == max_ver[r["shard"]]:
            table[(r["r"], r["c"])] = table.get((r["r"], r["c"]), 0) + r["cnt"]
    batch = REGISTRY["hh03_countmin"].fn(spark, SF_SMALL).collect()
    assert len(batch) > 0
    for b in batch:
        est_stream = min(
            table.get(
                (
                    d,
                    int(
                        hashlib.md5(
                            f"{d}|{b['user_id']}".encode()
                        ).hexdigest()[:15],
                        16,
                    )
                    % _CMS_W,
                ),
                0,
            )
            for d in range(_CMS_D)
        )
        assert est_stream == b["est_cnt"], b["user_id"]


def test_quantile_hist_stream_matches_batch(spark):
    """qs01's log-linear histogram built incrementally on the stream must
    equal the engine-expression batch histogram over the same feed:
    bucket-range (octave) sharding keeps every bucket in exactly one
    shard, so max-ver shard snapshots UNION into the global sketch —
    from which qs01's cumulative-rank rule answers any quantile."""
    from xarray_sql_spark.queries.advanced_ops import _QS_SIGBITS
    from xarray_sql_spark.session import table as load_table

    assert se.QH_SIGBITS == _QS_SIGBITS  # one bucket rule, two spellings
    out = se.run_to_memory(
        se.quantile_hist_stream(se.events_stream(spark, SF_SMALL), shards=4),
        "t_qhist_twin",
        output_mode="update",
    )
    rows = out.collect()
    max_ver = {}
    for r in rows:
        max_ver[r["shard"]] = max(max_ver.get(r["shard"], 0), r["ver"])
    hist = {}
    owner = {}
    for r in rows:
        if r["ver"] == max_ver[r["shard"]]:
            assert r["bucket"] not in hist  # buckets never straddle shards
            hist[r["bucket"]] = r["cnt"]
            owner[r["bucket"]] = r["shard"]
    # octave sharding: all buckets of one octave share a shard
    for b, s in owner.items():
        assert s == se._blen(int(b)) % 4
    cents = "CAST(floor(value * 100 + 0.5) AS BIGINT)"
    sig = _QS_SIGBITS
    bucket = (
        f"shiftleft(shiftright({cents}, greatest(length(bin({cents})) - {sig}, 0)),"
        f" greatest(length(bin({cents})) - {sig}, 0))"
    )
    batch = (
        load_table(spark, SF_SMALL, "events")
        .selectExpr(f"{bucket} AS bucket")
        .groupBy("bucket")
        .count()
        .collect()
    )
    assert hist == {r["bucket"]: r["count"] for r in batch}


def test_quantile_hist_merges_by_addition():
    """The production rollup property: histograms over two halves of a
    feed ADD per-bucket into the histogram of the whole feed. Includes
    negative values: the Python twin must bucket them by the engine's
    64-bit two's-complement bin() length, not magnitude bit_length."""
    values = [3, 7, 100, 101, 32753, 950, 950, 12, -100, -1]
    full, h1, h2 = {}, {}, {}
    se.qhist_update(full, values)
    se.qhist_update(h1, values[:4])
    se.qhist_update(h2, values[4:])
    merged = dict(h1)
    for b, c in h2.items():
        merged[b] = merged.get(b, 0) + c
    assert merged == full
    # the engine regime for negatives: shift = 64 - 5, arithmetic >> <<
    assert full[(-100 >> 59) << 59] == 2  # -100 and -1 share -2**59


def test_quality_score_stream_matches_batch_exactly(spark):
    """Trained-model serving on a stream (ts20's twin): train offline in
    batch, score the document stream with the frozen weights — stream
    rows must equal the batch scorer's rows EXACTLY (integer scores,
    same decision boundary), not approximately."""
    from xarray_sql_spark.queries import REGISTRY
    from xarray_sql_spark.queries.pipeline_ops import ts20_train

    iw, bias = ts20_train(spark, SF_SMALL)
    stream_out = se.run_to_memory(
        se.quality_score_stream(se.documents_stream(spark, SF_SMALL), iw, bias),
        "t_quality_scores",
    )
    got = _rows(stream_out, "doc_id")
    batch = REGISTRY["ts20_quality_classifier"].fn(spark, SF_SMALL)
    want = [
        tuple(r)
        for r in batch.select(
            "doc_id", "split", "label", "score_micro", "pred"
        ).orderBy("doc_id").collect()
    ]
    assert got == want
    assert len(got) > 0


def test_unicode_clean_stream_matches_batch_exactly(spark):
    """Ingest-time cleanup (ts21's twin): the NFC + strip census on the
    document stream must produce byte-identical rows (including the
    cleaned-text md5) to the batch query — stateless projection parity."""
    from xarray_sql_spark.queries import REGISTRY

    stream_out = se.run_to_memory(
        se.unicode_clean_stream(se.documents_stream(spark, SF_SMALL)),
        "t_unicode_clean",
    )
    got = _rows(stream_out, "doc_id")
    want = [
        tuple(r)
        for r in REGISTRY["ts21_unicode_normalize"]
        .fn(spark, SF_SMALL)
        .collect()
    ]
    assert got == want
    assert len(got) > 0


def test_decayed_mass_stream_equals_batch_exactly(spark):
    """hh05's twin: per-user decayed mass accumulated across micro-batch
    boundaries must equal the batch aggregate BIT-FOR-BIT (the dyadic
    weights are exact powers of two, so no tolerance is needed), and the
    implied top-k ranking must match hh05's."""
    from xarray_sql_spark.queries import REGISTRY
    from xarray_sql_spark.session import table as _table
    import pyspark.sql.functions as F

    d0 = (
        _table(spark, SF_SMALL, "events")
        .agg(F.max(F.to_date("ts")).alias("d0"))
        .collect()[0]["d0"]
        .isoformat()
    )
    out = se.run_to_memory(
        se.decayed_mass_stream(se.events_stream(spark, SF_SMALL), d0),
        "t_decayed_mass",
        output_mode="update",
    )
    pdf = out.toPandas()
    # update mode emits one row per user per touched batch: keep the
    # final (largest n_events) row per user
    final = (
        pdf.sort_values(["user_id", "n_events"]).groupby("user_id").tail(1)
    )
    batch = (
        REGISTRY["hh05_decayed_heavy_hitters"].fn(spark, SF_SMALL).toPandas()
    )
    got = {
        int(r.user_id): (int(r.n_events), round(float(r.decayed), 6))
        for r in final.itertuples()
    }
    for r in batch.itertuples():  # top-20 rows, exact equality
        assert got[int(r.user_id)] == (int(r.n_events), float(r.decayed)), r
    assert len(batch) > 0


def test_decayed_mass_stream_clamps_ahead_of_origin_events(spark):
    """r12 ADVICE: an event NEWER than the frozen decay origin d0 must get
    the freshest weight (1.0), not a mod-64-wrapped shift (Java shiftleft
    with a negative count yields 2^-62-ish or negative weights). Anchor d0
    two half-lives BEFORE every event: each weight is then exactly 1.0, so
    per-user decayed mass must equal the event count bit-for-bit."""
    import datetime

    d0 = (
        table(spark, SF_SMALL, "events")
        .agg(F.min(F.to_date("ts")).alias("d"))
        .collect()[0]["d"]
        - datetime.timedelta(days=14)
    ).isoformat()
    out = se.run_to_memory(
        se.decayed_mass_stream(se.events_stream(spark, SF_SMALL), d0),
        "t_decay_clamp",
        output_mode="update",
    )
    pdf = out.toPandas()
    final = (
        pdf.sort_values(["user_id", "n_events"]).groupby("user_id").tail(1)
    )
    assert len(final) > 0
    for r in final.itertuples():
        assert float(r.decayed) == float(r.n_events), r


def test_ngram_score_stream_matches_batch_exactly(spark):
    """ts25 serving twin: the stream scorer must emit the batch n-gram
    classifier's rows EXACTLY (integer scores, same decision boundary) —
    the single-definition scorer contract at the bigram order."""
    from xarray_sql_spark.queries import REGISTRY
    from xarray_sql_spark.queries.pipeline_ops import ts25_train

    iw, bias = ts25_train(spark, SF_SMALL)
    stream_out = se.run_to_memory(
        se.ngram_score_stream(se.documents_stream(spark, SF_SMALL), iw, bias),
        "t_ngram_scores",
    )
    got = _rows(stream_out, "doc_id")
    want = [
        tuple(r)
        for r in REGISTRY["ts25_ngram_classifier"]
        .fn(spark, SF_SMALL)
        .select("doc_id", "split", "label", "score_micro", "pred")
        .orderBy("doc_id")
        .collect()
    ]
    assert got == want
    assert len(got) > 0


def test_license_gate_stream_matches_batch_rollup(spark):
    """pl22's ingest twin: per-document policy tags on the stream,
    rolled up, must equal the batch gate's per-policy doc/token counts
    exactly (stream-static broadcast joins, stateless projection)."""
    from xarray_sql_spark.queries import REGISTRY

    out = se.run_to_memory(
        se.license_gate_stream(spark, se.documents_stream(spark, SF_SMALL)),
        "t_license_gate",
    )
    pdf = out.toPandas()
    got = {
        pol: (int(g["doc_id"].count()), int(g["words"].sum()), int(g["trainable"].iloc[0]))
        for pol, g in pdf.groupby("policy")
    }
    batch = REGISTRY["pl22_license_gate"].fn(spark, SF_SMALL).collect()
    want = {r.policy: (r.n_docs, r.tokens, r.trainable) for r in batch}
    assert got == want
    assert len(got) >= 3


def test_image_phash_gate_matches_batch_clusters(spark):
    """mm13's ingest twin: the settled min-keeper state per perceptual
    hash must equal the batch clusterer's keeper and member count for
    every multi-image cluster (min-merge makes the state arrival-order
    independent)."""
    from xarray_sql_spark.queries import REGISTRY
    from xarray_sql_spark.streaming import dedup as sd

    out = se.run_to_memory(
        sd.image_phash_gate(spark, SF_SMALL),
        "t_phash_gate",
        output_mode="update",
    )
    pdf = out.toPandas()
    final = (
        pdf.sort_values(["phash", "n_images"]).groupby("phash").tail(1)
    )
    got = {
        r.phash: (int(r.keeper_doc_id), int(r.n_images))
        for r in final.itertuples()
        if int(r.n_images) >= 2
    }
    batch = REGISTRY["mm13_image_phash_dedup"].fn(spark, SF_SMALL).collect()
    want = {r.phash: (r.keeper_doc_id, r.n_images) for r in batch}
    assert got == want
    assert len(want) > 0


def test_image_phash_gate_state_survives_checkpointed_restart(spark, tmp_path):
    """Operational pin for the ingest gate: wave 1 delivers each group's
    LEADER image; the query stops; wave 2 lands the remaining members;
    a restart on the SAME checkpoint must recover the min-keeper state —
    settled clusters equal the batch clusterer exactly, which is only
    possible if wave-1 state survived the restart (a fresh run over
    wave 2 alone would miss every leader)."""
    from xarray_sql_spark.queries import REGISTRY
    from xarray_sql_spark.streaming import dedup as sd
    from xarray_sql_spark.session import table as _table

    docs = _table(spark, SF_SMALL, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    schema = docs.schema
    # wave 1: the group leaders (doc_id % 15 == 0 among the image slot)
    docs.filter("doc_id % 15 = 0").coalesce(1).write.mode("overwrite").parquet(feed)

    out_dir = str(tmp_path / "out")

    def _run():
        # memory sink cannot recover from a checkpoint; a foreachBatch
        # parquet appender is the fault-tolerant production shape
        stream = spark.readStream.schema(schema).parquet(feed)

        def _sink(bdf, _bid):
            bdf.write.mode("append").parquet(out_dir)

        q = (
            sd.image_phash_gate(spark, SF_SMALL, stream=stream)
            .writeStream.foreachBatch(_sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _run()
    # wave 2: everything else in the image slot
    docs.filter("doc_id % 3 = 0 AND doc_id % 15 <> 0").coalesce(1).write.mode(
        "append"
    ).parquet(feed)
    _run()
    pdf2 = spark.read.parquet(out_dir).toPandas()

    final = pdf2.sort_values(["phash", "n_images"]).groupby("phash").tail(1)
    got = {
        r.phash: (int(r.keeper_doc_id), int(r.n_images))
        for r in final.itertuples()
        if int(r.n_images) >= 2
    }
    batch = REGISTRY["mm13_image_phash_dedup"].fn(spark, SF_SMALL).collect()
    want = {r.phash: (r.keeper_doc_id, r.n_images) for r in batch}
    assert got == want
    assert len(want) > 0


def test_audio_fp_gate_matches_batch_clusters(spark):
    """mm14's ingest twin: the settled min-keeper state per audio
    fingerprint must equal the batch clusterer's keeper and member
    count for every multi-clip cluster (min-merge makes the state
    arrival-order independent)."""
    from xarray_sql_spark.queries import REGISTRY
    from xarray_sql_spark.streaming import dedup as sd

    out = se.run_to_memory(
        sd.audio_fp_gate(spark, SF_SMALL),
        "t_afp_gate",
        output_mode="update",
    )
    pdf = out.toPandas()
    final = pdf.sort_values(["fp", "n_clips"]).groupby("fp").tail(1)
    got = {
        r.fp: (int(r.keeper_doc_id), int(r.n_clips))
        for r in final.itertuples()
        if int(r.n_clips) >= 2
    }
    batch = REGISTRY["mm14_audio_fingerprint_dedup"].fn(spark, SF_SMALL).collect()
    want = {r.fp: (r.keeper_doc_id, r.n_clips) for r in batch}
    assert got == want
    assert len(want) > 0


def test_audio_fp_gate_state_survives_checkpointed_restart(spark, tmp_path):
    """Operational pin for the audio ingest gate (mm13's twin has the
    same pin): wave 1 delivers each group's LEADER clip; the query
    stops; wave 2 lands the remaining members; a restart on the SAME
    checkpoint must recover the min-keeper state — settled clusters
    equal the batch clusterer exactly, which is only possible if wave-1
    state survived the restart (a fresh run over wave 2 alone would
    miss every leader)."""
    from xarray_sql_spark.queries import REGISTRY
    from xarray_sql_spark.streaming import dedup as sd
    from xarray_sql_spark.session import table as _table

    docs = _table(spark, SF_SMALL, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    schema = docs.schema
    # wave 1: the group leaders of the audio slot (doc_id % 15 == 1)
    docs.filter("doc_id % 15 = 1").coalesce(1).write.mode("overwrite").parquet(feed)

    out_dir = str(tmp_path / "out")

    def _run():
        stream = spark.readStream.schema(schema).parquet(feed)

        def _sink(bdf, _bid):
            bdf.write.mode("append").parquet(out_dir)

        q = (
            sd.audio_fp_gate(spark, SF_SMALL, stream=stream)
            .writeStream.foreachBatch(_sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _run()
    # wave 2: everything else in the audio slot
    docs.filter("doc_id % 3 = 1 AND doc_id % 15 <> 1").coalesce(1).write.mode(
        "append"
    ).parquet(feed)
    _run()
    pdf2 = spark.read.parquet(out_dir).toPandas()

    final = pdf2.sort_values(["fp", "n_clips"]).groupby("fp").tail(1)
    got = {
        r.fp: (int(r.keeper_doc_id), int(r.n_clips))
        for r in final.itertuples()
        if int(r.n_clips) >= 2
    }
    batch = REGISTRY["mm14_audio_fingerprint_dedup"].fn(spark, SF_SMALL).collect()
    want = {r.fp: (r.keeper_doc_id, r.n_clips) for r in batch}
    assert got == want
    assert len(want) > 0


def test_pipeline_ingest_gate_matches_pl23_exact_stage(spark):
    """pl23's ingest prefix at settle must equal the batch DAG's `exact`
    stage EXACTLY: per content hash among 'allow'-policy documents, the
    keeper is min(doc_id) and the copy count is the allowed-group size.
    The expectation is derived from pl23's own DuckDB oracle body, so
    the streaming twin is pinned to the same engine-independent truth
    the batch hash gate proves."""
    import duckdb

    from xarray_sql_spark.queries.pipeline_ops import _pl23_oracle
    from xarray_sql_spark.streaming import dedup as sd

    out = se.run_to_memory(
        sd.pipeline_ingest_gate(spark, SF_SMALL),
        "t_ingest_gate",
        output_mode="update",
    )
    pdf = out.toPandas()
    final = pdf.sort_values(["chash", "n_copies"]).groupby("chash").tail(1)
    got = {
        r.chash: (int(r.keeper_doc_id), int(r.n_copies))
        for r in final.itertuples()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet')"
    )
    o = _pl23_oracle()
    body = o[: o.rindex("SELECT domain, max(tier)")]
    want_df = con.execute(
        body
        + "SELECT chash, CAST(min(doc_id) AS BIGINT) AS k,"
        " CAST(count(*) AS BIGINT) AS n FROM allowed GROUP BY chash"
    ).df()
    want = {
        r.chash: (int(r.k), int(r.n)) for r in want_df.itertuples()
    }
    assert got == want
    assert len(want) > 0


def test_pipeline_ingest_gate_state_survives_checkpointed_restart(
    spark, tmp_path
):
    """Operational pin for the composed ingest gate: wave 1 delivers an
    arbitrary subset; the query stops; wave 2 lands the rest; a restart
    on the SAME checkpoint must recover the per-hash min-keeper state so
    settled clusters equal the batch oracle's exact stage — impossible
    unless wave-1 state survived the restart."""
    import duckdb

    from xarray_sql_spark.queries.pipeline_ops import _pl23_oracle
    from xarray_sql_spark.session import table as _table
    from xarray_sql_spark.streaming import dedup as sd

    docs = _table(spark, SF_SMALL, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    schema = docs.schema
    docs.filter("doc_id % 5 = 0").coalesce(1).write.mode("overwrite").parquet(feed)

    def _run():
        stream = spark.readStream.schema(schema).parquet(feed)

        def _sink(bdf, _bid):
            bdf.write.mode("append").parquet(out_dir)

        q = (
            sd.pipeline_ingest_gate(spark, SF_SMALL, stream=stream)
            .writeStream.foreachBatch(_sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _run()
    docs.filter("doc_id % 5 <> 0").coalesce(1).write.mode("append").parquet(feed)
    _run()
    pdf = spark.read.parquet(out_dir).toPandas()
    final = pdf.sort_values(["chash", "n_copies"]).groupby("chash").tail(1)
    got = {
        r.chash: (int(r.keeper_doc_id), int(r.n_copies))
        for r in final.itertuples()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet')"
    )
    o = _pl23_oracle()
    body = o[: o.rindex("SELECT domain, max(tier)")]
    want_df = con.execute(
        body
        + "SELECT chash, CAST(min(doc_id) AS BIGINT) AS k,"
        " CAST(count(*) AS BIGINT) AS n FROM allowed GROUP BY chash"
    ).df()
    want = {r.chash: (int(r.k), int(r.n)) for r in want_df.itertuples()}
    assert got == want
    assert len(want) > 0


def _run_banded_gate(spark, feed, ckpt, out_dir):
    """One availableNow pass of the banded ingest gate over `feed`,
    appending each micro-batch's emissions to `out_dir` tagged with the
    batch id (ingest_gate_survivors settles by latest batch)."""
    from xarray_sql_spark.streaming import dedup as sd

    stream = spark.readStream.schema(sd.DOCS_SCHEMA).parquet(feed)

    def _sink(bdf, bid):
        bdf.withColumn("batch_id", F.lit(bid)).write.mode("append").parquet(
            out_dir
        )

    q = (
        sd.pipeline_ingest_gate_banded(spark, SF_SMALL, stream=stream)
        .writeStream.foreachBatch(_sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _oracle_nodup_ids(view_sql: str) -> list[int]:
    import duckdb

    from xarray_sql_spark.queries.pipeline_ops import _pl23_oracle

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS {view_sql}")
    o = _pl23_oracle()
    body = o[: o.rindex("SELECT domain, max(tier)")]
    return [
        int(r[0])
        for r in con.execute(
            body + "SELECT doc_id FROM nodup ORDER BY doc_id"
        ).fetchall()
    ]


def test_banded_ingest_gate_settles_to_pl23_nodup(spark, tmp_path):
    """The composed license -> exact -> banded-claim gate, settled, must
    equal batch pl23's `nodup` stage exactly (the oracle re-derives it in
    DuckDB, so the pin is engine-independent). At this SF the corpus has
    no exact duplicates but 91 of 199 allowed docs die to the banded
    confirm, so the near-dup path is the one doing the work."""
    from xarray_sql_spark.session import table as _table
    from xarray_sql_spark.streaming import dedup as sd

    docs = _table(spark, SF_SMALL, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    feed = str(tmp_path / "feed")
    docs.coalesce(1).write.mode("overwrite").parquet(feed)
    _run_banded_gate(
        spark, feed, str(tmp_path / "ckpt"), str(tmp_path / "out")
    )
    surv = sd.ingest_gate_survivors(
        spark.read.parquet(str(tmp_path / "out"))
    )
    got = [int(r[0]) for r in surv.orderBy("doc_id").collect()]
    want = _oracle_nodup_ids(
        f"SELECT * FROM read_parquet('{SF_SMALL}/documents.parquet')"
    )
    assert got == want
    assert 0 < len(want) < 199  # the gate actually gated something


def test_banded_ingest_gate_restart_claimant_flip_and_exact_kill(
    spark, tmp_path
):
    """Operational pin for the composed gate: wave 1 delivers the HIGHER
    doc_ids (doc_id % 5 != 0) so bands are claimed by interim leaders;
    the query stops; wave 2 lands the % 5 == 0 docs (including doc 0 —
    claimants FLIP, forcing the groups to re-emit corrected verdicts)
    plus exact text duplicates at doc_id + 10000 (exercising the 'c'
    kill: identical text, higher id, must die). A restart on the SAME
    checkpoint must recover the member-list state; the settled survivor
    set must equal batch pl23's nodup over the union corpus — impossible
    unless wave-1 state survived AND stale wave-1 verdicts were
    superseded by re-emission."""
    from xarray_sql_spark.session import table as _table
    from xarray_sql_spark.streaming import dedup as sd

    docs = _table(spark, SF_SMALL, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    dups = docs.filter("doc_id % 7 = 3").selectExpr(
        "doc_id + 10000 AS doc_id", "text", "lang", "source", "n_chars"
    )
    docs.filter("doc_id % 5 <> 0").coalesce(1).write.mode("overwrite").parquet(feed)
    _run_banded_gate(spark, feed, ckpt, out_dir)
    docs.filter("doc_id % 5 = 0").unionByName(dups).coalesce(1).write.mode(
        "append"
    ).parquet(feed)
    _run_banded_gate(spark, feed, ckpt, out_dir)
    surv = sd.ingest_gate_survivors(spark.read.parquet(out_dir))
    got = [int(r[0]) for r in surv.orderBy("doc_id").collect()]
    src = f"read_parquet('{SF_SMALL}/documents.parquet')"
    view_sql = (
        f"SELECT doc_id, text, lang, source, n_chars FROM {src} "
        "UNION ALL "
        "SELECT doc_id + 10000, text, lang, source, n_chars "
        f"FROM {src} WHERE doc_id % 7 = 3"
    )
    want = _oracle_nodup_ids(view_sql)
    assert got == want
    # The 'c' kill: every allowed doc sharing a content hash with an
    # allowed earlier doc must be gone. (Not all +10000 dups qualify:
    # the synthetic-URL fallback folds doc_id into the domain, so a
    # dup can land under a different policy than its original.)
    import duckdb

    from xarray_sql_spark.queries.pipeline_ops import _pl23_oracle

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS {view_sql}")
    o = _pl23_oracle()
    body = o[: o.rindex("SELECT domain, max(tier)")]
    losers = [
        int(r[0])
        for r in con.execute(
            body + """SELECT doc_id FROM (
                SELECT doc_id, min(doc_id) OVER (PARTITION BY chash) AS k
                FROM allowed
            ) WHERE doc_id <> k"""
        ).fetchall()
    ]
    assert len(losers) > 0  # the union corpus really has exact-dup pairs
    assert not set(losers) & set(got)  # and every loser died


def test_banded_ingest_gate_emission_is_delta_based(spark, tmp_path):
    """Emission-volume pin for the hot-band case: when wave 1 delivers
    each group's LOWEST doc_ids (claimants never change afterwards),
    wave 2's arrivals must NOT re-emit the settled wave-1 members — a
    hot band otherwise emits O(members^2) rows over its lifetime. Every
    wave-1 doc appears exactly once per group it belongs to (its 'c'
    group + its bands), i.e. its sink row count equals its wave-1 count."""
    from xarray_sql_spark.session import table as _table

    docs = _table(spark, SF_SMALL, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    # wave 1: the LOW half of doc ids; wave 2: the high half. min-claims
    # set in wave 1 can never be displaced by wave 2.
    docs.filter("doc_id < 250").coalesce(1).write.mode("overwrite").parquet(feed)
    _run_banded_gate(spark, feed, ckpt, out_dir)
    w1 = spark.read.parquet(out_dir).groupBy("doc_id").count().collect()
    w1_counts = {int(r["doc_id"]): int(r["count"]) for r in w1}
    docs.filter("doc_id >= 250").coalesce(1).write.mode("append").parquet(feed)
    _run_banded_gate(spark, feed, ckpt, out_dir)
    all_counts = {
        int(r["doc_id"]): int(r["count"])
        for r in spark.read.parquet(out_dir).groupBy("doc_id").count().collect()
    }
    re_emitted = {
        d: (w1_counts[d], all_counts[d])
        for d in w1_counts
        if all_counts[d] != w1_counts[d]
    }
    assert not re_emitted, f"settled members re-emitted: {re_emitted}"
