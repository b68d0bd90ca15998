"""Structured Streaming operators (SURVEY §2 streaming analogs).

The reference is batch-only (the deusu.sh loop re-runs GenDb); its Spark
rebuild adds the streaming shapes a transcript/event firehose needs:

  hourly_counts_stream   watermarked tumbling-window aggregation — the
                         streaming twin of pipelines.q_events_hourly; late
                         rows beyond the watermark are dropped, state is
                         bounded by (watermark + window) per key
  sessionize_stream      custom stateful operator via applyInPandasWithState
                         — the streaming twin of pipelines.q_user_sessions
                         (30-min-gap sessionization); per-user state carries
                         (session_start, last_ts, n_events), closed sessions
                         emit downstream, the open tail stays in state

  interval_join_stream   stream-stream interval join — the streaming twin
                         of pipelines.q_range_join (purchases within the
                         window opened by each error, same user); both
                         sides watermarked, join predicate time-bounded so
                         buffered state expires with the watermark

  dedup_stream           streaming exact dedup / replay suppression — the
                         streaming twin of the batch exact-dedup stage
                         (pipelines.q_dedup_exact): first occurrence of a
                         key passes through immediately, duplicates within
                         the watermark horizon are dropped, and per-key
                         state expires once the watermark passes the key's
                         event time + delay (bounded state; duplicates
                         older than the horizon are the documented
                         at-least-once residue every streaming dedup has)

All are tested for BATCH EQUIVALENCE: the same events parquet pushed
through the stream (availableNow trigger → memory sink) must produce the
rows the batch pipeline computes. That is the property that lets one
codebase serve the backfill and the live feed.

Incremental INDEX maintenance (the streaming sink that appends index
segments) lives in incremental.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_S = 1800

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def hourly_counts_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """(hour, event_type, n, sum_value) over a streaming events source.

    Tumbling 1-hour event-time windows with a watermark: state per
    (window, event_type) is dropped once the watermark passes the window
    end, so state size is O(active windows), not O(stream length)."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("hour"), "event_type", "n", "sum_value")
    )


def _emit_sessions(rows) -> pd.DataFrame:
    out = pd.DataFrame(
        rows, columns=["user_id", "session_start", "session_end", "n_events"]
    )
    out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
    out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
    return out


def _make_session_fn(idle_timeout_ms: int | None):
    def _session_fn(key, pdf_iter, state: GroupState):
        """Per-user sessionizer: fold this batch's events into (start, last,
        n) runs split on > SESSION_GAP_S gaps; emit every CLOSED session,
        keep the open tail in state. Event-time ordering within the batch is
        restored by sorting (micro-batches preserve no order). With an idle
        timeout configured, a group whose timer fired flushes its open
        session and clears state — an idle user's session emits without
        waiting for their next event."""
        (uid,) = key
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield _emit_sessions([(uid, start_us, last_us, n)])
            return

        rows = []
        ts_all = []
        for pdf in pdf_iter:
            ts_all.append(pd.to_datetime(pdf["ts"]))
        if ts_all:
            ts = pd.concat(ts_all).sort_values()
            us = (ts.astype("int64") // 1000).to_numpy()  # microseconds
        else:
            us = []

        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = -1
            n = 0

        gap_us = SESSION_GAP_S * 1_000_000
        for t in us:
            if start_us < 0:
                start_us, last_us, n = t, t, 1
            elif t > last_us + gap_us:
                rows.append((uid, start_us, last_us, n))
                start_us, last_us, n = t, t, 1
            elif t >= start_us:
                # in-order or late-but-inside the open session: the session
                # end must never move backward (late events across batches)
                last_us, n = max(last_us, t), n + 1
            elif start_us - t <= gap_us:
                # late event just before the open session: extend its start
                start_us, n = t, n + 1
            # else: older than the open session by more than a gap — the
            # batch truth would put it in an already-emitted session; with
            # no watermark to reopen history the event is dropped
            # (documented late-data limit)
        if start_us >= 0:
            state.update((int(start_us), int(last_us), int(n)))
            if idle_timeout_ms is not None:
                state.setTimeoutDuration(idle_timeout_ms)
        if rows:
            yield _emit_sessions(rows)

    return _session_fn


def sessionize_stream(
    events: DataFrame, idle_timeout_s: int | None = None
) -> DataFrame:
    """Closed 30-min-gap sessions per user — custom stateful streaming
    operator (applyInPandasWithState).

    ``idle_timeout_s=None`` (default): the open tail of each user's stream
    stays in state until a later event closes it — exactly batch-equivalent
    for closed sessions. With a timeout, an idle user's open session
    flushes after ``idle_timeout_s`` of processing time with no new events
    (state removed; a later event starts a NEW session). The trade-off is
    documented: a processing-time flush may split what batch event-time
    logic would merge if the user returns within the event-time gap —
    that is the standard liveness/completeness trade of session windows."""
    timeout = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_s is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_session_fn(
                None if idle_timeout_s is None else idle_timeout_s * 1000
            ),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )


RANGE_W_S = 3600  # interval width, mirrors pipelines.RANGE_W_S


def interval_join_stream(
    errors: DataFrame,
    purchases: DataFrame,
    watermark: str = "2 hours",
    window_s: int = RANGE_W_S,
) -> DataFrame:
    """Stream-stream interval join — the streaming twin of
    pipelines.q_range_join: purchases falling inside the ``window_s``
    window opened by each error of the same user.

    Both sides carry a watermark and the join predicate bounds the
    right-side event time against the left's (``p_ts`` in
    [err_ts, err_ts + window_s]), which is what lets Spark expire buffered
    rows: each side's state is bounded by watermark + window, not stream
    length. The equi-key (user_id) keeps the join a hash join per key —
    the batch twin's bucketization exists to bound skew in one big batch
    shuffle, while here the micro-batch + state horizon bounds it in time.
    ``delay_s`` is computed in whole (truncated) unix seconds exactly like
    the batch op, so batch equivalence is exact."""
    err = (
        errors.where(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            "user_id",
            F.col("ts").cast("timestamp").alias("err_ts"),
        )
        .withWatermark("err_ts", watermark)
    )
    pur = (
        purchases.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").cast("timestamp").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    joined = err.join(
        pur,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("err_ts"))
        & (F.col("p_ts") <= F.col("err_ts") + F.expr(f"INTERVAL {window_s} SECONDS")),
    )
    return (
        joined.withColumn(
            "delay_s", F.unix_timestamp("p_ts") - F.unix_timestamp("err_ts")
        )
        # the raw-timestamp range condition above is the superset Spark can
        # use for state cleanup; the whole-second filter below pins the
        # boundary semantics to the batch op's truncated-seconds contract
        .where((F.col("delay_s") >= 0) & (F.col("delay_s") <= window_s))
        .select("error_id", "purchase_id", "user_id", "delay_s")
    )


def dedup_stream(
    src: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "24 hours",
) -> DataFrame:
    """Streaming exact dedup / replay suppression over an event-time
    source: the first row per key passes through immediately (append
    mode emits it without waiting for the watermark); any duplicate
    arriving within the watermark horizon is dropped; per-key state
    expires once the watermark passes the key's event time + delay, so
    state is bounded by the horizon's key cardinality, not the stream's.

    This is the streaming twin of the batch exact-dedup stage
    (pipelines.q_dedup_exact / the training pipeline's dedup step):
    default key is the normalized-content fingerprint when the source has
    a text column, else pass explicit key columns (e.g. ["event_id"] for
    ingestion replay suppression). Duplicates older than the horizon are
    the documented at-least-once residue every streaming dedup has —
    production picks the horizon to cover the replay window of its bus."""
    src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    if keys is None:
        fp = F.md5(
            F.concat_ws(
                " ",
                F.filter(
                    F.split(F.lower("text"), "[^a-z0-9]+"),
                    lambda x: x != "",
                ),
            )
        )
        src = src.withColumn("fp", fp)
        keys = ["fp"]
    return src.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys
    )


def enrich_stream(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static dimension enrichment — the canonical streaming fact ×
    dimension join (events stream enriched with the customer's market
    segment). The static side rides a BROADCAST hash join, so the
    streaming side never shuffles and the join is STATELESS: no
    watermark, no buffered state; every micro-batch joins against the
    broadcast copy (Spark re-resolves the static relation per batch, so a
    dim refresh is picked up on the next micro-batch — the slowly
    changing dimension story). LEFT join keeps events whose user has no
    dimension row, with the segment defaulted — dropping facts on a dim
    miss is the classic enrichment bug. Batch twin: the same join on the
    same tables (test_streaming pins equality)."""
    d = F.broadcast(
        dim.select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("mkt_segment"),
        )
    )
    return (
        events.select("event_id", "user_id", "event_type", "ts")
        .join(d, "user_id", "left")
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.coalesce("mkt_segment", F.lit("UNKNOWN")).alias("mkt_segment"),
        )
    )
