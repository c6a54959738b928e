"""Watermarked tumbling-window aggregation over the events stream
(SURVEY.md §2.5: the Structured Streaming shape for late data).

One definition serves both engines:
- on a STREAM, ``withWatermark`` bounds state: a window's row is
  emitted (append mode) once the watermark — max event time seen minus
  the lateness allowance — passes the window end, and events arriving
  later than the allowance for an already-closed window are DROPPED
  (tested with a deliberately late record);
- on a BATCH frame the same plan is a plain windowed groupBy (the
  watermark is a no-op), which keeps the aggregation oracle-able.

State size is O(open windows x event types), the minimum for this agg;
the shuffle is one hash partitioning on (window, event_type).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: "str | None" = "2 hours",
) -> DataFrame:
    """(window_start, window_end, event_type, n_events, sum_value).
    Pass ``watermark=None`` for batch frames whose ts column is
    TIMESTAMP_NTZ (watermarks require event-time semantics)."""
    src = events
    if watermark is not None:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n_events", "sum_value",
        )
    )
