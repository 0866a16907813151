from vector_knowledge_base_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    streaming_ingest,
    tumbling_window_agg,
)

__all__ = [
    "session_window_agg",
    "sliding_window_agg",
    "streaming_ingest",
    "tumbling_window_agg",
]
