"""Time-window aggregation, batch form (OP-54/55).

The reference's only windowing is the DAG schedule interval — each
Airflow run is an implicit tumbling window over "whatever changed since
last run" (s3_key_monitor.py:37-42). The engine makes windows explicit
DataFrame operators over event time; the same functions run under
Structured Streaming (sparkobs.streaming) with watermarks.

Scale notes: all three window forms are single-shuffle grouped
aggregations. ``F.window``/``F.session_window`` are Catalyst-native
(no UDF); session windows merge within the aggregation, not via a
sort-based islands pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_agg(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    """Tumbling-window metrics (OP-54): per-window count + value stats."""
    return (
        events.groupBy(F.window("ts", duration).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value", "avg_value")
    )


def sliding_agg(
    events: DataFrame, duration: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding-window metrics (OP-55): each event lands in
    duration/slide windows; Spark expands rows window-side before the
    grouped agg (one shuffle, no self-join)."""
    return (
        events.groupBy(F.window("ts", duration, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_agg(events: DataFrame, key: str = "user_id", gap: str = "30 minutes") -> DataFrame:
    """Session-window metrics (OP-55): per-key sessions closed after
    ``gap`` of inactivity. ``session_window.end`` is last event + gap
    (Spark semantics); we also emit the observed last-event time so the
    output is oracle-comparable without gap arithmetic."""
    return (
        events.groupBy(F.col(key), F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .select(key, "first_ts", "last_ts", "n_events")
    )
