"""Watermarked tumbling-window aggregation over an event stream.

The Structured-Streaming twin of pipeline_ops.sessions.windowed_event_
counts: same tumbling epoch-aligned windows, same output grain, plus a
watermark so late events are folded in for ``watermark_minutes`` and the
state store can drop closed windows (bounded state — the thing a naive
groupBy on an unbounded stream lacks). Append mode emits each window
exactly once after the watermark passes it; update mode re-emits on late
arrivals (the test drains with complete/update to compare final state
against the batch twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_event_window_counts(
    events_stream: DataFrame,
    window_minutes: int = 60,
    *,
    watermark_minutes: int = 120,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """(window_start, event_type, n_events, total_value) — streaming."""
    w = F.window(F.col(ts_col), f"{window_minutes} minutes")
    return (
        events_stream.withWatermark(ts_col, f"{watermark_minutes} minutes")
        .groupBy(w.alias("w"), F.col(type_col).alias("event_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(value_col).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def streaming_cms_counts(
    events_stream: DataFrame,
    value_col: str,
    *,
    depth: int = 4,
    width: int = 64,
    weight_col: str | None = None,
) -> DataFrame:
    """Incrementally-maintained Count-Min sketch over a stream — the
    streaming twin of pipeline_ops.sketches.cms_counts, and literally
    the SAME plan applied to a streaming frame: the sketch is a
    groupBy(j, bucket) aggregate, so Structured Streaming's state store
    holds exactly depth·width rows no matter how much data flows
    through (update/complete mode; no watermark needed — the state is
    fixed-size by construction, the property that makes CMS the
    canonical streaming summary). Point-query/heavy-hitter probes run
    against the memory-sink table between micro-batches.
    """
    from ..pipeline_ops.sketches import cms_counts

    return cms_counts(
        events_stream, value_col, depth=depth, width=width,
        weight_col=weight_col,
    )
