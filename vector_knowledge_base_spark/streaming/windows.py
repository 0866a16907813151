"""Structured Streaming operators (SURVEY §2.10 — capability addition;
the reference has no streams, its 'background' is an in-memory job dict,
/root/reference/backend/jobs.py:34).

Each aggregation here is written once and runs in BOTH modes: the same
function works on a batch DataFrame (as the oracle-checked queries in
queries.py prove) and on a ``readStream`` DataFrame with a watermark —
Spark's unified batch/streaming semantics. Watermarks bound state for
late data: events later than the watermark are dropped, everything else
updates its window's state.

``streaming_ingest`` is the continuous version of the ingest pipeline
(SURVEY §7 phase 3): a file-source stream of documents flowing through
the same extract→chunk→embed stages into an append sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    events: DataFrame,
    window: str = "1 day",
    watermark: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window count/sum per event_type. Pass a watermark when
    ``events`` is streaming (state eviction for late data)."""
    if watermark:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    window: str = "2 days",
    slide: str = "1 day",
    watermark: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding-window aggregate (each event in window/slide windows)."""
    if watermark:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(F.window(ts_col, window, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


def session_window_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Session windows per user (gap-based); stateful merge in streaming."""
    if watermark:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(F.session_window(ts_col, gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


def read_events_stream(
    spark, input_dir: str, schema=None, max_files_per_trigger: int = 10
) -> DataFrame:
    """File-source stream of event parquet: the continuous-ingest analog
    of the reference's request-driven uploads."""
    if schema is None:
        schema = (
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def streaming_ingest(
    spark, input_dir: str, checkpoint_dir: str, output_dir: str, embedding_dim: int = 64
):
    """Continuous document ingest: stream of (doc_id, text, lang) parquet
    → chunk → embed → append parquet sink. Returns the StreamingQuery.

    The batch ingest plan (pipeline/ingest.py) and this differ only in
    source/sink: the transform stages are reused verbatim — mapInPandas
    and pandas UDFs are streaming-compatible (stateless per-row ops)."""
    from vector_knowledge_base_spark.pipeline.chunker import chunk_documents_df
    from vector_knowledge_base_spark.pipeline.embed import embed_df

    docs = (
        spark.readStream.schema("doc_id long, text string, lang string")
        .parquet(input_dir)
    )
    chunks = chunk_documents_df(docs)
    chunks = embed_df(chunks, dim=embedding_dim)
    return (
        chunks.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
