"""Stream-stream joins: the continuous form of the batch interval join
(queries.py range_join_clicks_after_purchase). The reference has no
streams at all; this is part of the engine's Structured Streaming
surface (SURVEY §2.10 family).

State-boundedness is the whole game for a join that runs for weeks on a
1000-executor cluster: BOTH inputs carry watermarks and the join
condition bounds event time on both sides, so Spark can prove when a
buffered row can never match again and evict it. Without the time bound
the state store grows with the full stream history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_clicks_after_purchases(
    purchases: DataFrame,
    clicks: DataFrame,
    max_lag: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Clicks within ``max_lag`` after each purchase by the same user —
    works identically on batch and streaming inputs (pass streaming
    DataFrames and both sides get watermarks; state for a buffered click
    is held at most ``watermark`` + ``max_lag`` past its event time).

    Expected columns: purchases(event_id, user_id, ts),
    clicks(event_id, user_id, ts). The equi-key (user_id) carries the
    shuffle; the interval is a residual predicate — never a cross join.
    Output: one row per (purchase, matching click).
    """
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("c_ts"),
    )
    if p.isStreaming:
        p = p.withWatermark("p_ts", watermark)
    if c.isStreaming:
        c = c.withWatermark("c_ts", watermark)
    return p.join(
        c,
        (p.user_id == c.user_id)
        & (c.c_ts > p.p_ts)
        & (c.c_ts <= p.p_ts + F.expr(f"INTERVAL {max_lag}")),
    ).select("purchase_id", "click_id", p.user_id.alias("user_id"), "p_ts", "c_ts")
