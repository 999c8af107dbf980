"""Event-stream analytics operators (the Structured-Streaming-shaped surface
of the pipeline, expressed so the SAME code runs in batch and streaming).

The reference has no aggregation engine of its own (it defers to OpenSearch
core); a training-data pipeline over 100 TB of logs does need these, so they
are first-class here (task brief: windowed aggs + watermarks for late data):

* tumbling_counts — fixed-window counts/sums per event type via ``F.window``.
  The expression is streaming-native: feed a ``readStream`` DataFrame and add
  ``withWatermark`` (see tests/test_streaming.py) and Spark maintains the
  same aggregation incrementally with late-data handling; on a batch
  DataFrame it is a plain hash aggregate.
* sessionize — gap-based session windows per user (the
  ``applyInPandasWithState`` use-case, expressed with lag + cumulative-sum
  window functions so it stays JVM-side and SQL-verifiable; the stateful
  streaming variant would swap the window functions for state handles with
  identical semantics).
* user_rollup — per-user profile aggregates incl. JSON property extraction
  (``get_json_object`` pushes into codegen; no Python).

Timestamps are exchanged as epoch seconds (timezone-proof across engines).

Scale notes: all three are single-shuffle hash/window aggregations keyed by
(window), (user) — Catalyst applies partial aggregation map-side; skewed
users in sessionize are bounded by per-user event counts, and the session
window itself never crosses users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, window: str = "1 day") -> DataFrame:
    """Per (tumbling window, event_type): event count, value sum/mean.
    Streaming-ready: the same expression works under readStream +
    withWatermark."""
    return (
        events.groupBy(
            F.window(F.col("ts"), window).alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            # no avg column: sum/count division lands on exact rounding
            # midpoints where engines' float summation orders disagree —
            # consumers derive means from (sum, count)
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the time since
    the user's previous event exceeds the gap. Returns one row per session
    (user_id, session_id 0-based per user, n_events, start/end epoch,
    total value). Window functions only — JVM-side, no state in batch mode.
    """
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = gap_minutes * 60
    with_flag = (
        events.withColumn("_ts", F.unix_timestamp("ts").cast("long"))
        .withColumn("_prev", F.lag("_ts").over(w_user))
        .withColumn(
            "_new",
            F.when(
                F.col("_prev").isNull() | (F.col("_ts") - F.col("_prev") > gap),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "session_id",
            (F.sum("_new").over(
                w_user.rowsBetween(Window.unboundedPreceding, 0)
            ) - 1).cast("long"),
        )
    )
    return (
        with_flag.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("_ts").cast("long").alias("start_epoch"),
            F.max("_ts").cast("long").alias("end_epoch"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def sessionize_stream(
    events: DataFrame, gap_minutes: int = 30, timeout_ms: int | None = None
):
    """STREAMING sessionization — the custom stateful operator surface
    (``applyInPandasWithState``): per user, an open session lives in group
    state across micro-batches; completed sessions are emitted as soon as a
    gap closes them, and idle state emits on processing-time timeout.

    Gap semantics match :func:`sessionize` (same rule, same 0-based per-user
    session ids — the counter survives timeouts); the difference is
    operational: state is bounded by (users x one open session), not by
    history. ``timeout_ms`` defaults to the GAP itself, so under real-time
    arrival the processing-time flush approximates the event-time gap; an
    out-of-order replay can flush a session the batch operator would still
    extend — use the batch operator for exact retrospective sessions. The
    kernel is vectorized numpy over each batch's events (flags -> reduceat
    aggregates), no per-row Python.

    Input: a streaming DataFrame with (user_id, event_id, ts, value).
    Output rows are CLOSED sessions only — the final open session per user
    surfaces when its timeout fires (or compare against batch sessions minus
    each user's last, as the tests do)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap = gap_minutes * 60
    if timeout_ms is None:
        timeout_ms = gap * 1000
    out_schema = (
        "user_id long, session_id long, n_events long, "
        "start_epoch long, end_epoch long, sum_value double"
    )
    state_schema = (
        "session_id long, last_ts long, n long, start_ts long, sum_v double"
    )

    def fn(key, pdf_iter, state):
        # local imports: the stateful-function closure is shipped standalone
        # to workers (module globals are not captured)
        import numpy as np
        import pandas as pd

        uid = int(key[0])

        def row(sid, n, start, end, sv):
            return {
                "user_id": uid,
                "session_id": int(sid),
                "n_events": int(n),
                "start_epoch": int(start),
                "end_epoch": int(end),
                "sum_value": round(float(sv), 4),
            }

        if state.hasTimedOut:
            sid, last, n, start, sv = state.get
            if n > 0:
                # flush the open session but KEEP the state row (n=0 marks
                # "no open session") so the per-user session_id counter
                # survives — a later event must not reuse an emitted id
                state.update((int(sid), int(last), 0, 0, 0.0))
                state.setTimeoutDuration(timeout_ms)
                yield pd.DataFrame([row(sid, n, start, last, sv)])
            else:
                state.remove()  # idle twice with nothing open: clean up
            return

        ts_parts, val_parts, eid_parts = [], [], []
        for pdf in pdf_iter:
            if len(pdf):
                ts_parts.append(pdf["_ts"].to_numpy(dtype=np.int64))
                val_parts.append(pdf["value"].to_numpy(dtype=np.float64))
                eid_parts.append(pdf["event_id"].to_numpy(dtype=np.int64))
        if not ts_parts:
            return
        t = np.concatenate(ts_parts)
        v = np.concatenate(val_parts)
        e = np.concatenate(eid_parts)
        order = np.lexsort((e, t))
        t, v = t[order], v[order]

        if state.exists:
            sid, last, n0, start0, sv0 = state.get
            has_open = n0 > 0  # n=0: counter-only state after a timeout flush
            if not has_open:
                last = None
        else:
            sid, last, n0, start0, sv0 = -1, None, 0, 0, 0.0
            has_open = False

        flags = np.empty(t.size, dtype=bool)
        flags[0] = (last is None) or (t[0] - last > gap)
        flags[1:] = np.diff(t) > gap
        starts_idx = np.flatnonzero(flags)
        bounds = np.append(starts_idx, t.size)
        # group aggregates, one reduceat each (no per-row Python)
        if starts_idx.size:
            g_n = np.diff(bounds)
            g_sum = np.add.reduceat(v, starts_idx)
            g_start = t[starts_idx]
            g_end = t[bounds[1:] - 1]
        else:
            g_n = np.empty(0, dtype=np.int64)
            g_sum = g_start = g_end = g_n

        out = []
        # the open state either continues into the first rows (no flag at 0)
        # or closes before them
        if has_open and flags[0]:
            out.append(row(sid, n0, start0, last, sv0))
            has_open = False
        if has_open and not flags[0]:
            # merge leading rows (up to the first flag or end) into the
            # open session
            head_end = int(starts_idx[0]) if starts_idx.size else t.size
            n0 += head_end
            sv0 += float(v[:head_end].sum())
            last = int(t[head_end - 1]) if head_end else last
            if starts_idx.size:  # a later gap closes the merged session
                out.append(row(sid, n0, start0, last, sv0))
                has_open = False
        # fresh groups: all but the final one close; the final stays open
        n_groups = int(starts_idx.size)
        for j in range(n_groups):
            closing = j < n_groups - 1
            sid += 1
            if closing:
                out.append(row(sid, g_n[j], g_start[j], g_end[j], g_sum[j]))
            else:
                state.update((int(sid), int(g_end[j]), int(g_n[j]), int(g_start[j]), float(g_sum[j])))
        if has_open and n_groups == 0:
            state.update((int(sid), int(last), int(n0), int(start0), float(sv0)))
        state.setTimeoutDuration(timeout_ms)
        if out:
            yield pd.DataFrame(out)

    prepped = events.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        F.unix_timestamp("ts").cast("long").alias("_ts"),
        F.col("value").cast("double").alias("value"),
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.ProcessingTimeTimeout
    )


def user_rollup(events: DataFrame) -> DataFrame:
    """Per-user profile: event counts (total + per hot type), value stats,
    distinct days active, and the max of the JSON property ``$.k`` —
    everything a built-in column expression (get_json_object is codegen'd)."""
    return events.groupBy(F.col("user_id").cast("long").alias("user_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n_purchases"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.countDistinct(F.to_date("ts")).cast("long").alias("days_active"),
        F.max(F.get_json_object("props", "$.k").cast("long")).alias("max_prop_k"),
    )
