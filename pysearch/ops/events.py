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
