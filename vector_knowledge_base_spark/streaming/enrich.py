"""Stream-static enrichment: a streaming fact joined with a slowly-
changing dimension table, then window-aggregated per enriched key — the
most common production streaming shape (enrich events with user/account
metadata before rollup). The reference has no streams; this widens the
engine's Structured Streaming surface (SURVEY §2.10 family).

Scale notes:
- the static side is a plain batch DataFrame; Spark re-plans it per
  micro-batch, so a broadcast-sized dimension costs one broadcast per
  batch and NEVER shuffles the stream;
- the stream side keeps its watermark through the join, so the windowed
  aggregate downstream still evicts state on time;
- a big (non-broadcastable) dimension would force a per-batch shuffle
  join — at that size prefer pre-bucketing the dimension on the join key
  or denormalizing upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_dimension(
    events: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Left-join the (possibly streaming) event fact with a static
    dimension on ``key``. Left join: events with no dimension row pass
    through with NULLs rather than being dropped mid-stream."""
    if broadcast_dim:
        dim = F.broadcast(dim)
    return events.join(dim, key, "left")


def enriched_windowed_value(
    events: DataFrame,
    dim: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    segment_col: str = "segment",
) -> DataFrame:
    """Tumbling-window sum of event value per dimension segment.

    Works identically on batch and streaming inputs (Spark's unified
    Dataset semantics — the parity test asserts equality). Expected
    columns: events(ts, user_id, value), dim(user_id, segment).
    """
    ev = events
    if ev.isStreaming:
        ev = ev.withWatermark("ts", watermark)
    enriched = enrich_with_dimension(ev, dim)
    return (
        enriched.groupBy(
            F.window("ts", window).alias("w"),
            F.coalesce(F.col(segment_col), F.lit("unknown")).alias("segment"),
        )
        .agg(F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "segment",
            "total_value",
        )
    )
