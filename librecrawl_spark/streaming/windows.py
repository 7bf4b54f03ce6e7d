"""Event-time streaming operators: watermarked tumbling windows, native
session windows, and an applyInPandasWithState stateful sessionizer.

The reference has no event-time processing at all (its only "stream" is
the 2s poll loop, main.py:944-966); these are the Spark-idiomatic
operators a crawl/event pipeline needs once results feed downstream
consumers. All three work over the ``events`` table shape
(event_id, ts, user_id, event_type, value, props).

Scale notes
-----------
- ``tumbling_counts`` / ``session_window_stats`` are plain streaming
  aggregations: state is bounded by the watermark (late rows beyond it
  are dropped and their state evicted), partial aggregation happens
  map-side, and the shuffle key (window/user) is the natural one.
- ``sessionize_stateful`` keeps O(1) state per user (last_ts + two
  counters) — the canonical applyInPandasWithState shape; state size is
  independent of event volume, so 10^9 users is a memory question for
  the state store, not the operator.
- In batch mode the same window/session_window expressions evaluate
  identically (minus the watermark no-op), which is how the driver
  oracle checks them (``events_session_window`` in __spark_entry__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def tumbling_counts(events: DataFrame, window_dur: str = "1 hour",
                    watermark: str = "2 hours", ts_col: str = "ts") -> DataFrame:
    """Watermarked tumbling-window counts per event_type.

    Streaming: state for a window is dropped once the watermark passes
    its end — bounded memory under unbounded input. Batch: identical
    result, watermark is a no-op. TIMESTAMP_NTZ columns are cast to
    TIMESTAMP (session tz is pinned UTC in session.py, so the cast is
    deterministic) — Spark's event-time machinery requires it."""
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_dur).alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
    )


def session_window_stats(events: DataFrame, gap: str = "30 minutes",
                         ts_col: str = "ts") -> DataFrame:
    """One row per (user, session) using Spark's native gap-based
    ``session_window`` — merge rule: an event extends the session iff it
    starts strictly before previous-event-ts + gap."""
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.groupBy("user_id", F.session_window(ts_col, gap).alias("sw"))
        .agg(F.count("*").alias("n_events"))
    )


def user_session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user rollup of session_window_stats: (user_id, n_sessions,
    n_events)."""
    return (
        session_window_stats(events, gap)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"),
             F.sum("n_events").alias("n_events"))
    )


SESSION_OUT_SCHEMA = "user_id long, n_sessions long, n_events long"
SESSION_STATE_SCHEMA = "last_ts double, n_sessions long, n_events long"


def sessionize_stateful(events_stream: DataFrame, gap_seconds: float = 1800.0) -> DataFrame:
    """Custom stateful sessionization via applyInPandasWithState
    (streaming only): per-user running (n_sessions, n_events) with a
    strict ``gap > gap_seconds`` split — byte-identical semantics to the
    batch ``events_sessionize`` driver query, maintained incrementally
    across micro-batches.

    Emits the running totals for every user touched by the micro-batch
    (update mode); the latest row per user is the final answer. Within a
    batch rows are ordered by (ts, event_id); across batches the caller
    must feed event-time-ordered files (or front a watermark+sort) —
    the tests drive it with maxFilesPerTrigger=1 over time-split files.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        import pandas as pd

        if state.exists:
            last_ts, n_sess, n_ev = state.get
        else:
            last_ts, n_sess, n_ev = None, 0, 0
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts in pdf["ts"]:
                t = ts.timestamp()
                if last_ts is None or (t - last_ts) > gap_seconds:
                    n_sess += 1
                last_ts = t
                n_ev += 1
        state.update((last_ts, n_sess, n_ev))
        yield pd.DataFrame(
            [{"user_id": key[0], "n_sessions": n_sess, "n_events": n_ev}]
        )

    return events_stream.groupBy("user_id").applyInPandasWithState(
        fn, SESSION_OUT_SCHEMA, SESSION_STATE_SCHEMA, "update",
        GroupStateTimeout.NoTimeout,
    )
