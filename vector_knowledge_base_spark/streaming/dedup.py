"""Streaming deduplication (SURVEY §2.10 capability + north-star dedup
family): exact content dedup applied to a document stream, the
continuous-ingest guard a training-data pipeline puts in front of its
corpus (the reference has no streams; its batch upload dedups nothing —
re-uploading a file simply overwrites, backend/ingestion.py:62-133).

Two state regimes, both built on Spark's streaming dedup state store:

- ``dedup_stream_exact``: unbounded keys, state grows with distinct
  content hashes — right when the corpus is the state (bounded by corpus
  size, e.g. an ingest front-door that must never re-admit a document).
- ``dedup_stream_within_watermark``: state evicted once the watermark
  passes — right for at-least-once sources (Kafka replays, retried file
  drops) where duplicates arrive close together and unbounded state
  would OOM a 1000-executor cluster over weeks of uptime.

Keying on md5(content) not content keeps state rows at 32 bytes + id
regardless of document size — the same trick the batch exact-dedup
query uses to group without shuffling text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_content_key(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Add the 32-byte dedup key: md5 of the text column."""
    return docs.withColumn("content_key", F.md5(F.col(text_col)))


def dedup_stream_exact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """First-writer-wins exact dedup over the whole stream lifetime.
    State: one row per distinct content hash, forever — bounded by
    corpus cardinality, not stream length."""
    return with_content_key(docs, text_col).dropDuplicates(["content_key"])


def dedup_stream_within_watermark(
    docs: DataFrame,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Exact dedup with bounded state: duplicates arriving within the
    watermark horizon are dropped; state for a key is evicted once the
    watermark passes its event time (``dropDuplicatesWithinWatermark``,
    the streaming-native bounded-memory dedup)."""
    keyed = with_content_key(docs, text_col).withWatermark(ts_col, watermark)
    return keyed.dropDuplicatesWithinWatermark(["content_key"])
