"""Gap-based sessionization — the canonical custom stateful operator
(SURVEY.md §2.5 streaming; training-pipeline analytics over the events
table).

Two implementations with identical session semantics (a session ends
when the next event of the same user arrives more than ``gap`` after
the previous one):

- :func:`sessionize_batch`: pure DataFrame algebra — lag window to mark
  session starts, running sum to number them, then one aggregation.
  Exactly expressible in ANSI SQL, so it is oracle-checked against
  DuckDB in the correctness gate.
- :func:`sessionize_stream`: Structured Streaming via
  ``applyInPandasWithState`` — per-user state carries the OPEN session
  (start, last-seen, count, value sum); a batch's events fold in
  chronologically and every session CLOSED by a gap is emitted
  downstream. Deterministic without timers: closure happens on the
  next event's arrival, so tests don't depend on wall-clock timeouts
  (the open tail session stays in state until more data or stream
  end).

Scale notes: both shapes shuffle once on user_id. The batch form's
window sort is per-user (no global sort); the streaming form's state
is O(open sessions) = O(active users), the minimum any gap
sessionizer can hold.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)
from pyspark.sql.window import Window

DEFAULT_GAP_MINUTES = 30.0


def sessionize_batch(events: DataFrame, gap_minutes: float = DEFAULT_GAP_MINUTES) -> DataFrame:
    """(user_id, session_seq, session_start, session_end, n_events,
    sum_value) — one row per closed-or-open session in the batch."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = gap_minutes * 60.0
    # gap arithmetic needs epoch seconds; TIMESTAMP_NTZ (parquet default
    # for naive timestamps) can't cast to double directly, so route via
    # an LTZ copy — only DIFFERENCES are used, so the zone shift cancels
    ts_sec = F.col("ts").cast("timestamp_ltz").cast("double")
    marked = events.select(
        "user_id", "ts", "event_id", "value",
        F.when(
            ts_sec - F.lag(ts_sec).over(w) > gap_s,
            1,
        ).otherwise(0).alias("new_session"),
    ).withColumn(
        "session_seq",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        marked.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


_SESSION_OUT = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
])

_SESSION_STATE = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n", LongType()),
    StructField("sv", DoubleType()),
])


def sessionize_stream(
    events: DataFrame, gap_minutes: float = DEFAULT_GAP_MINUTES
) -> DataFrame:
    """Streaming gap sessionizer: groupBy(user_id).applyInPandasWithState.
    Emits each session when a later event closes it (gap exceeded); the
    open tail session lives in the group state."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = int(gap_minutes * 60.0 * 1_000_000)

    def fold(key, pdfs, state: "GroupState"):
        (user_id,) = key
        if state.exists:
            start_us, last_us, n, sv = state.get
        else:
            start_us = last_us = -1
            n, sv = 0, 0.0
        closed = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            # normalize to ns first: Arrow may hand pandas a us-resolution
            # datetime64, whose raw int64 view would be off by 1000x
            ts_us = pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000
            for t, v in zip(ts_us.to_numpy(), pdf["value"].to_numpy()):
                t = int(t)
                if n and t - last_us > gap_us:
                    closed.append((user_id, start_us, last_us, n, sv))
                    n, sv = 0, 0.0
                if n == 0:
                    start_us = t
                n += 1
                sv += float(v)
                last_us = t
        state.update((start_us, last_us, n, sv))
        if closed:
            out = pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end",
                         "n_events", "sum_value"],
            )
            out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
            out["sum_value"] = out["sum_value"].round(6)
            yield out

    return events.groupBy("user_id").applyInPandasWithState(
        fold, _SESSION_OUT, _SESSION_STATE, "append",
        GroupStateTimeout.NoTimeout,
    )
