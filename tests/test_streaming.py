"""Streaming operators vs their batch twins — the same events parquet pushed
through readStream (availableNow → memory sink) must reproduce the batch
pipeline's rows."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from deusu_spark import streaming

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_stream_dir(spark):
    # stream source dir = a copy of the events parquet
    d = tempfile.mkdtemp(prefix="deusu_stream_")
    spark.read.parquet(f"{SF_DIR}/events.parquet").coalesce(2).write.mode(
        "overwrite"
    ).parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_stream(spark, df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_hourly_counts_stream_matches_batch(spark, events_stream_dir):
    schema = spark.read.parquet(events_stream_dir).schema
    src = spark.readStream.schema(schema).parquet(events_stream_dir)
    got = _run_stream(
        spark, streaming.hourly_counts_stream(src), "hourly_stream"
    ).collect()
    want = (
        spark.read.parquet(events_stream_dir)
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .collect()
    )
    g = {(r["hour"], r["event_type"]): (r["n"], r["sum_value"]) for r in got}
    # append mode emits a window only once the watermark passes its end:
    # windows inside the final 2h-watermark horizon stay in state (correct
    # streaming semantics) — compare against the batch result below that
    # horizon
    import datetime

    max_ts = (
        spark.read.parquet(events_stream_dir).agg(F.max("ts")).first()[0]
    )
    horizon = max_ts - datetime.timedelta(hours=2)
    w = {
        (r["hour"], r["event_type"]): (r["n"], r["sum_value"])
        for r in want
        if r["hour"] + datetime.timedelta(hours=1) <= horizon
    }
    assert w.items() <= g.items(), sorted(w.items() - g.items())[:3]
    extra = g.keys() - w.keys()
    # anything extra must sit inside the horizon window
    assert all(h + datetime.timedelta(hours=1) > horizon for h, _ in extra)
    assert len(g) > 10


def test_idle_session_timeout_flush(spark):
    """An idle user's open session must emit WITHOUT a subsequent event:
    sessionize_stream(idle_timeout_s=...) flushes it on the processing-time
    timer (empty micro-batches run the timers — noDataMicroBatches)."""
    import datetime
    import time

    d = tempfile.mkdtemp(prefix="deusu_idle_")
    try:
        t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
        spark.createDataFrame(
            [(1, t0), (1, t0 + datetime.timedelta(seconds=10))],
            "user_id long, ts timestamp",
        ).coalesce(1).write.mode("overwrite").parquet(d)
        src = spark.readStream.schema("user_id long, ts timestamp").parquet(d)
        q = (
            streaming.sessionize_stream(src, idle_timeout_s=3)
            .writeStream.format("memory")
            .queryName("idle_sessions")
            .outputMode("append")
            .trigger(processingTime="1 second")
            .start()
        )
        try:
            rows = []
            deadline = time.time() + 60
            while time.time() < deadline and not rows:
                time.sleep(1)
                rows = spark.table("idle_sessions").collect()
            assert rows, "idle session never flushed"
            (r,) = rows
            assert r["user_id"] == 1
            assert r["n_events"] == 2
            assert r["session_start"] == t0
            assert r["session_end"] == t0 + datetime.timedelta(seconds=10)
        finally:
            q.stop()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_sessionize_stream_matches_batch(spark, events_stream_dir):
    schema = spark.read.parquet(events_stream_dir).schema
    src = spark.readStream.schema(schema).parquet(events_stream_dir)
    got = _run_stream(
        spark, streaming.sessionize_stream(src), "sessions_stream"
    ).collect()
    closed = {}
    for r in got:
        closed.setdefault(r["user_id"], []).append(
            (r["session_start"], r["session_end"], r["n_events"])
        )

    # batch truth: per-user 30-min-gap sessions; the stream emits all but
    # each user's LAST (still-open) session
    ev = (
        spark.read.parquet(events_stream_dir)
        .select("user_id", "ts")
        .orderBy("user_id", "ts")
        .collect()
    )
    sessions: dict[int, list] = {}
    for r in ev:
        u, t = r["user_id"], r["ts"]
        runs = sessions.setdefault(u, [])
        if runs and (t - runs[-1][1]).total_seconds() <= streaming.SESSION_GAP_S:
            s, _, n = runs[-1]
            runs[-1] = (s, t, n + 1)
        else:
            runs.append((t, t, 1))
    expected_closed = {
        u: runs[:-1] for u, runs in sessions.items() if len(runs) > 1
    }
    assert closed.keys() == expected_closed.keys()
    for u, runs in expected_closed.items():
        assert sorted(closed[u]) == sorted(runs), u
    # sanity: a meaningful number of closed sessions streamed out
    assert sum(len(v) for v in closed.values()) > 50


def test_interval_join_stream_matches_batch(spark, events_stream_dir):
    """Stream-stream interval join == the batch range join exactly: inner
    joins emit as soon as both sides' rows meet, so availableNow over the
    full corpus must reproduce every (error, purchase) containment pair
    that pipelines.q_range_join finds on the same events."""
    from deusu_spark import pipelines

    schema = spark.read.parquet(events_stream_dir).schema
    err_src = spark.readStream.schema(schema).parquet(events_stream_dir)
    pur_src = spark.readStream.schema(schema).parquet(events_stream_dir)
    got = _run_stream(
        spark,
        streaming.interval_join_stream(err_src, pur_src),
        "interval_join_stream",
    ).collect()
    want = pipelines.q_range_join(spark, SF_DIR).collect()

    def key(r):
        return (r["error_id"], r["purchase_id"], r["user_id"], r["delay_s"])

    assert sorted(map(key, got)) == sorted(map(key, want))
    assert len(got) >= 3  # sf0.001 plants a small but non-empty pair set


def test_dedup_stream_suppresses_replays(spark, events_stream_dir):
    """Every event written TWICE into the source: the streamed output must
    equal the batch distinct-by-key result exactly (first occurrence kept,
    replay dropped). The watermark is set beyond the corpus's event-time
    span so in-horizon semantics (exact dedup) apply to every row
    regardless of how availableNow slices microbatches."""
    import os

    dup_dir = tempfile.mkdtemp(prefix="deusu_dupstream_")
    try:
        base = spark.read.parquet(events_stream_dir)
        base.write.mode("overwrite").parquet(dup_dir)
        base.write.mode("append").parquet(dup_dir)  # the replay
        schema = base.schema
        src = spark.readStream.schema(schema).parquet(dup_dir)
        got = _run_stream(
            spark,
            streaming.dedup_stream(src, keys=["event_id"], watermark="20000 hours"),
            "dedup_stream",
        )
        got_ids = sorted(r["event_id"] for r in got.select("event_id").collect())
        want_ids = sorted(
            r["event_id"] for r in base.select("event_id").distinct().collect()
        )
        assert got_ids == want_ids
        # and the doubled batch input really had every id twice
        n_all = spark.read.parquet(dup_dir).count()
        assert n_all == 2 * len(want_ids)
    finally:
        shutil.rmtree(dup_dir, ignore_errors=True)


def test_enrich_stream_matches_batch_and_keeps_dim_misses(spark, events_stream_dir):
    """Stream-static broadcast enrichment == the same batch left join; no
    event is lost on a dimension miss (the LEFT-join contract)."""
    schema = spark.read.parquet(events_stream_dir).schema
    src = spark.readStream.schema(schema).parquet(events_stream_dir)
    dim = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    got = _run_stream(
        spark, streaming.enrich_stream(src, dim), "enrich_stream"
    ).collect()
    want = streaming.enrich_stream(
        spark.read.parquet(events_stream_dir), dim
    ).collect()

    def key(r):
        return (r["event_id"], r["user_id"], r["event_type"], r["mkt_segment"])

    assert sorted(map(key, got)) == sorted(map(key, want))
    assert len(got) == spark.read.parquet(events_stream_dir).count()
    segs = {r["mkt_segment"] for r in got}
    assert len(segs - {"UNKNOWN"}) >= 1  # the join really enriched
