"""Exactly-once streaming sink into a txlog transactional table.

The plain parquet streaming sink (streaming/windows.py streaming_ingest)
gets exactly-once from the file-sink manifest that Spark maintains —
but that manifest is private to the sink and invisible to batch
mutations (delete_where would desynchronize it). Committing micro-
batches into the txlog table instead gives ONE log that serves
streaming appends, batch copy-on-write deletes, time travel, and CDC —
the integration a transactional format exists for.

Exactly-once contract (the standard foreachBatch + idempotent-sink
pattern): Structured Streaming guarantees a replayed micro-batch
carries the SAME batch_id and the SAME data; txlog.append_table
records batch_id in the manifest and turns a replayed commit into a
no-op. Crash windows:

- crash after data write, before manifest rename → orphan files,
  invisible to readers; replay rewrites and commits fresh;
- crash after manifest rename, before checkpoint → replay sees the
  committed batch_id and skips — no duplicate rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from vector_knowledge_base_spark.sources.txlog import (
    _list_versions,
    append_table,
    create_table,
)


def txlog_foreach_batch(table_path: str):
    """The foreachBatch callback: commit each micro-batch to the txlog
    table, idempotent on batch_id."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if not _list_versions(table_path):
            create_table(spark, table_path, batch_df, batch_id=batch_id)
        else:
            append_table(spark, table_path, batch_df, batch_id=batch_id)

    return sink


def streaming_ingest_txlog(
    spark,
    input_dir: str,
    checkpoint_dir: str,
    table_path: str,
    embedding_dim: int = 64,
):
    """Continuous document ingest into a TRANSACTIONAL table: stream of
    (doc_id, text, lang) parquet → chunk → embed → txlog commit per
    micro-batch. Same transform stages as the plain-parquet ingest
    (streaming/windows.py); only the sink differs. Returns the
    StreamingQuery (availableNow trigger)."""
    from vector_knowledge_base_spark.pipeline.chunker import chunk_documents_df
    from vector_knowledge_base_spark.pipeline.embed import embed_df

    docs = (
        spark.readStream.schema("doc_id long, text string, lang string")
        .parquet(input_dir)
    )
    chunks = embed_df(chunk_documents_df(docs), dim=embedding_dim)
    return (
        chunks.writeStream.foreachBatch(txlog_foreach_batch(table_path))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
