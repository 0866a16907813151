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


def txlog_merge_foreach_batch(
    table_path: str,
    key_cols: list[str],
    seq_col: str | None = None,
    mode: str = "cow",
    compact_dv_ratio: float | None = None,
    compact_target_files: int = 8,
):
    """CDC-APPLY foreachBatch callback: upsert each micro-batch into
    the txlog table by key — the streaming-MERGE recipe (Delta's
    documented foreachBatch-merge pattern), which the plain append sink
    cannot express: a changed row must REPLACE its stored version, not
    accumulate next to it.

    With ``seq_col``, the LATEST row per key within the micro-batch
    wins (last-writer-wins, the standard CDC collapse — a key updated
    3 times inside one batch lands once); without it the batch must
    carry one row per key (merge_table's contract). Caller contract:
    ``seq_col`` is unique per key within a batch (a change-log LSN /
    offset is); equal seqs collapse to ONE row, but which one is not
    defined — same as Delta's MERGE with duplicate source keys. Exactly-once is
    strict: merge_table records batch_id, so a crash-replayed batch is
    a no-op rather than a second rewrite of the touched files.

    ``mode="dv"`` (r9, VERDICT r8 #5) merges MERGE-ON-READ: each
    micro-batch soft-deletes the matched rows via one churn-sized
    deletion-vector batch and appends the update rows — ZERO
    pre-existing data files rewritten per batch, the right trade for
    an update-heavy CDC feed over wide files where per-batch CoW
    rewrites the same hot files over and over. Reads pay a growing
    anti-join until compaction materializes; ``compact_dv_ratio``
    (only meaningful with dv mode) fires ``compact_if_dv_ratio``
    after each merge, so the maintenance loop runs MID-STREAM — the
    soft-deleted fraction stays bounded without an external scheduler.
    (A compaction commit is a non-append change: downstream tailers of
    this table need ignore_changes, same as after any OPTIMIZE.)

    100 TB shape: cow — each micro-batch rewrites only the files
    containing matched keys (cost ∝ churn); dv — each micro-batch
    writes O(batch) bytes regardless of file width, with ratio-
    triggered materialization amortizing the rewrite across many
    batches. With the table compacted clustered on the key, the
    stats-pruned affected-file scan touches O(matching files)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from vector_knowledge_base_spark.sources.txlog import (
        compact_if_dv_ratio,
        merge_table,
    )

    if mode not in ("cow", "dv"):
        raise ValueError(f"txlog_merge_foreach_batch: unknown mode {mode!r}")
    if compact_dv_ratio is not None and mode != "dv":
        raise ValueError(
            "txlog_merge_foreach_batch: compact_dv_ratio requires mode='dv'"
        )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        df = batch_df
        if seq_col is not None:
            w = Window.partitionBy(*key_cols).orderBy(F.desc(seq_col))
            df = (
                df.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .drop("_rn")
            )
        if not _list_versions(table_path):
            create_table(spark, table_path, df, batch_id=batch_id)
        else:
            merge_table(
                spark, table_path, df, key_cols, batch_id=batch_id, mode=mode
            )
        if compact_dv_ratio is not None:
            # not batch_id-gated: compaction is state-idempotent (a
            # replayed trigger sees ratio below threshold and no-ops)
            compact_if_dv_ratio(
                spark,
                table_path,
                threshold=compact_dv_ratio,
                target_files=compact_target_files,
            )

    return sink


def streaming_cdc_apply_txlog(
    spark,
    input_dir: str,
    checkpoint_dir: str,
    table_path: str,
    key_cols: list[str],
    seq_col: str | None = None,
    schema: str = "doc_id long, seq long, text string, lang string",
    mode: str = "cow",
    compact_dv_ratio: float | None = None,
):
    """Continuous CDC apply: a stream of keyed change rows MERGEs into
    one transactional table — each micro-batch collapsed to its latest
    row per key, upserted copy-on-write (or merge-on-read with
    ``mode="dv"``; see txlog_merge_foreach_batch), exactly-once on
    batch_id. The streaming twin of the batch merge_table verb (driver
    row: txlog_merge_upsert); together with
    streaming_ingest_dedup_txlog it completes the ingest surface:
    append-only, dedup-gated, and update-in-place streams all landing
    in the same log."""
    changes = spark.readStream.schema(schema).parquet(input_dir)
    return (
        changes.writeStream.foreachBatch(
            txlog_merge_foreach_batch(
                table_path,
                key_cols,
                seq_col=seq_col,
                mode=mode,
                compact_dv_ratio=compact_dv_ratio,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def dedup_ingest_foreach_batch(
    docs_table: str,
    sigs_table: str,
    bands: int = 4,
    rows_per_band: int = 2,
):
    """foreachBatch callback for DEDUPLICATED streaming ingest — the
    production training-data shape: each arriving micro-batch is probed
    against the STORED corpus signature table (MinHash + LSH banding,
    work ∝ batch, never ∝ corpus), batch-internal duplicate groups are
    collapsed to one canonical survivor, and the surviving documents
    AND their signatures are committed to their txlog tables —
    idempotent on batch_id, so crash replay cannot double-ingest.

    Dedup policy: a batch doc sharing an LSH band with ANY stored
    corpus doc is dropped (it already exists); within the batch, only
    the min-id member of each band-connected group survives (the same
    canonical rule as incremental_canonical_assign). LSH candidates are
    used as-is (no exact verify) — the streaming gate favors recall;
    the batch-side exact audit is the lsh_candidate_precision query."""
    from pyspark.sql import functions as F

    from vector_knowledge_base_spark.operators.components import (
        connected_components,
    )
    from vector_knowledge_base_spark.operators.text_dedup import (
        lsh_candidates_between,
        minhash_lsh_candidates,
        minhash_signatures,
    )
    from vector_knowledge_base_spark.sources.txlog import read_table

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.localCheckpoint(eager=True)
        sigs = minhash_signatures(batch).localCheckpoint(eager=True)
        # gate on the table this branch READS (sigs_table), not its
        # sibling: a crash between the first batch's two commits
        # (docs_table created, sigs_table not yet) would otherwise make
        # every replay raise 'txlog: no table' and wedge the stream —
        # a missing signature table simply means the corpus probe has
        # nothing to probe yet (ADVICE r5)
        if _list_versions(sigs_table):
            stored_sigs = read_table(spark, sigs_table)
            dup_vs_corpus = lsh_candidates_between(
                sigs, stored_sigs, bands=bands, rows_per_band=rows_per_band
            ).select(F.col("new_id").alias("doc_id")).distinct()
        else:
            dup_vs_corpus = None
        within = minhash_lsh_candidates(
            sigs, bands=bands, rows_per_band=rows_per_band
        )
        comp = connected_components(within, src="doc_id_a", dst="doc_id_b")
        # batch-internal survivors: the min-id member of each group
        non_canonical = comp.where(F.col("id") != F.col("component")).select(
            F.col("id").alias("doc_id")
        )
        drop = (
            non_canonical
            if dup_vs_corpus is None
            else non_canonical.unionAll(dup_vs_corpus).distinct()
        )
        keep = batch.join(drop, "doc_id", "left_anti").localCheckpoint(eager=True)
        keep_sigs = sigs.join(drop, "doc_id", "left_anti")
        for table, df in ((docs_table, keep), (sigs_table, keep_sigs)):
            if _list_versions(table):
                append_table(spark, table, df, batch_id=batch_id)
            else:
                create_table(spark, table, df, batch_id=batch_id)

    return sink


def streaming_ingest_dedup_txlog(
    spark,
    input_dir: str,
    checkpoint_dir: str,
    docs_table: str,
    sigs_table: str,
):
    """Deduplicated continuous document ingest into transactional
    tables: stream of (doc_id, text, lang) parquet → per-micro-batch
    LSH dedup against the stored corpus → txlog commits of surviving
    docs + their signature rows. The signature table doubles as the
    durable dedup index (the stored artifact the batch operators probe
    — tests/test_text_dedup_edges.py exercises the same table shape).

    At 100 TB: the corpus signature table is banded/bucketed at write
    time so the probe join prunes to touched buckets; each micro-batch
    costs O(batch) regardless of corpus size; and both tables share the
    txlog exactly-once guarantee across restarts."""
    docs = (
        spark.readStream.schema("doc_id long, text string, lang string")
        .parquet(input_dir)
    )
    return (
        docs.writeStream.foreachBatch(
            dedup_ingest_foreach_batch(docs_table, sigs_table)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def txlog_mv_foreach_batch(table_path: str, mv_paths: list):
    """foreachBatch callback keeping materialized views CONTINUOUSLY
    fresh: commit the micro-batch to the txlog table (idempotent on
    batch_id), then ``refresh_matview`` every registered view — each
    refresh folds exactly this batch's CDC into the stored state, so
    the views trail the table by at most one micro-batch.

    Crash windows compose with the append contract: a crash between
    the table commit and a view refresh leaves the view STALE, never
    wrong — the replayed batch's append no-ops (batch_id) and the
    refresh then catches up from the same CDC. The view's own commit
    is atomic (state + base watermark in one manifest), so a replayed
    refresh that already landed sees base_version == current and
    no-ops too. This is the streaming half of the classic summary-
    table pattern: the base table absorbs appends at ingest speed, and
    aggregate readers hit O(groups) state instead of rescanning."""
    from vector_knowledge_base_spark.sources.matview import refresh_matview

    inner = txlog_foreach_batch(table_path)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        inner(batch_df, batch_id)
        for mv in mv_paths:
            refresh_matview(batch_df.sparkSession, mv)

    return sink
