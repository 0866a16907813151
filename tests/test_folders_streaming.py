"""Folder-hierarchy operators (J2-J4) and Structured Streaming windows."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from vector_knowledge_base_spark.operators.folders import (
    file_paths,
    files_by_folder,
    resolve_folder_paths,
    unsorted_files,
)


@pytest.fixture(scope="module")
def folder_fixtures(spark):
    folders = spark.createDataFrame(
        [
            ("f1", "docs", None),
            ("f2", "work", "f1"),
            ("f3", "2024", "f2"),
            ("f4", "misc", None),
        ],
        "id string, name string, parent_id string",
    )
    file_folders = spark.createDataFrame(
        [
            ("d1", "a.txt", "f3"),
            ("d2", "b.txt", "f1"),
            ("d3", "c.txt", None),
        ],
        "document_id string, filename string, folder_id string",
    )
    documents = spark.createDataFrame(
        [("d1", "a.txt"), ("d2", "b.txt"), ("d3", "c.txt"), ("d4", "orphan.txt")],
        "document_id string, filename string",
    )
    return folders, file_folders, documents


def test_resolve_folder_paths(spark, folder_fixtures):
    folders, _, _ = folder_fixtures
    paths = {r.id: r.path for r in resolve_folder_paths(folders).collect()}
    assert paths == {
        "f1": "docs",
        "f2": "docs/work",
        "f3": "docs/work/2024",
        "f4": "misc",
    }


def test_unsorted_files_anti_join(spark, folder_fixtures):
    folders, file_folders, documents = folder_fixtures
    un = {r.document_id for r in unsorted_files(documents, file_folders).collect()}
    assert un == {"d4"}


def test_files_by_folder_null_sentinel(spark, folder_fixtures):
    _, file_folders, _ = folder_fixtures
    rows = {r.folder_id: r for r in files_by_folder(file_folders).collect()}
    assert rows["null"].n_files == 1  # root files grouped under sentinel
    assert rows["f3"].files[0]["document_id"] == "d1"


def test_file_paths(spark, folder_fixtures):
    folders, file_folders, documents = folder_fixtures
    rows = {r.document_id: r.folder_path for r in
            file_paths(documents, file_folders, folders).collect()}
    assert rows["d1"] == "docs/work/2024"
    assert rows["d3"] == ""  # root
    assert rows["d4"] == ""  # orphan


# ---- Structured Streaming ------------------------------------------------

def test_streaming_tumbling_matches_batch(spark, tmp_path):
    """The SAME aggregation function runs streaming (file source,
    availableNow) and batch; results must agree — Spark's unified
    semantics, verified."""
    from vector_knowledge_base_spark.sources.tables import load_table
    from vector_knowledge_base_spark.streaming.windows import (
        read_events_stream,
        tumbling_window_agg,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / "events_in")
    events.write.parquet(src)

    batch_rows = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in tumbling_window_agg(events).collect()
    }

    stream = read_events_stream(spark, src)
    assert stream.isStreaming
    out = tumbling_window_agg(stream, watermark="1 day")
    q = (
        out.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("select * from tumbling_test").collect()
    }
    assert got == batch_rows


def test_streaming_ingest_pipeline(spark, tmp_path):
    """Continuous ingest: docs stream -> chunk -> embed -> parquet sink."""
    from vector_knowledge_base_spark.sources.tables import load_table
    from vector_knowledge_base_spark.streaming.windows import streaming_ingest

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text", "lang"
    )
    src = str(tmp_path / "docs_in")
    docs.limit(50).write.parquet(src)

    q = streaming_ingest(
        spark,
        src,
        checkpoint_dir=str(tmp_path / "ckpt"),
        output_dir=str(tmp_path / "chunks_out"),
    )
    q.awaitTermination(180)
    out = spark.read.parquet(str(tmp_path / "chunks_out"))
    assert out.count() == 50  # 1 chunk per doc on this corpus
    row = out.first()
    assert len(row.embedding) == 64


def test_streaming_dedup_exact(spark, tmp_path):
    """Duplicate documents across micro-batches are admitted once:
    first-writer-wins state keyed on md5(content)."""
    from vector_knowledge_base_spark.streaming.dedup import dedup_stream_exact

    src = str(tmp_path / "dedup_in")
    spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text"), (3, "alpha text")],
        "doc_id long, text string",
    ).write.parquet(src)
    spark.createDataFrame(
        [(4, "beta text"), (5, "gamma text")], "doc_id long, text string"
    ).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        dedup_stream_exact(stream)
        .writeStream.format("memory")
        .queryName("dedup_exact_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select text from dedup_exact_test").collect()
    texts = sorted(r.text for r in rows)
    assert texts == ["alpha text", "beta text", "gamma text"]


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Watermark-bounded dedup: duplicates inside the horizon are
    dropped; the state store stays bounded by eviction."""
    from vector_knowledge_base_spark.streaming.dedup import (
        dedup_stream_within_watermark,
    )
    from datetime import datetime

    src = str(tmp_path / "dedup_wm_in")
    t0 = datetime(2024, 1, 1, 12, 0, 0)
    t1 = datetime(2024, 1, 1, 12, 10, 0)
    spark.createDataFrame(
        [(1, t0, "alpha"), (2, t1, "alpha"), (3, t1, "beta")],
        "doc_id long, ts timestamp, text string",
    ).write.parquet(src)

    stream = spark.readStream.schema(
        "doc_id long, ts timestamp, text string"
    ).parquet(src)
    q = (
        dedup_stream_within_watermark(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_wm_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    texts = sorted(
        r.text for r in spark.sql("select text from dedup_wm_test").collect()
    )
    assert texts == ["alpha", "beta"]


def test_coords3d_materialize_and_invalidate(spark, tmp_path):
    """M9: the materialized 3-D projection serves from parquet while the
    fingerprint matches and rebuilds when the corpus mutates."""
    from vector_knowledge_base_spark.operators.projection import (
        coords3d_stale,
        materialize_coords3d,
        refresh_coords3d_if_stale,
    )
    from vector_knowledge_base_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    out = str(tmp_path / "coords3d")
    assert coords3d_stale(emb, out)  # never built
    materialize_coords3d(emb, out, model_path=str(tmp_path / "pca"))
    assert not coords3d_stale(emb, out)
    n = spark.read.parquet(out).count()
    assert n == emb.count()

    mutated = emb.where("vec_id <> 0")  # delete one row -> stale
    assert coords3d_stale(mutated, out)
    refreshed = refresh_coords3d_if_stale(spark, mutated, out)
    assert refreshed.count() == n - 1
    assert not coords3d_stale(mutated, out)


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream interval join (watermarked both sides) produces the
    same pairs as the batch interval join over the same events."""
    from vector_knowledge_base_spark.sources.tables import load_table
    from vector_knowledge_base_spark.streaming.joins import (
        interval_join_clicks_after_purchases,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    purchases = ev.where(F.col("event_type") == "purchase")
    clicks = ev.where(F.col("event_type") == "click")

    expected = {
        (r.purchase_id, r.click_id)
        for r in interval_join_clicks_after_purchases(purchases, clicks).collect()
    }
    assert expected, "fixture produced no purchase→click pairs"

    p_dir, c_dir = str(tmp_path / "purchases"), str(tmp_path / "clicks")
    purchases.write.parquet(p_dir)
    clicks.write.parquet(c_dir)
    schema = "event_id long, user_id long, event_type string, ts timestamp"
    p_stream = spark.readStream.schema(schema).parquet(p_dir)
    c_stream = spark.readStream.schema(schema).parquet(c_dir)
    out = interval_join_clicks_after_purchases(p_stream, c_stream)
    assert out.isStreaming

    q = (
        out.writeStream.format("memory")
        .queryName("ssj_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.purchase_id, r.click_id)
        for r in spark.sql("select * from ssj_test").collect()
    }
    assert got == expected


def test_stream_static_enrichment_matches_batch(spark, tmp_path):
    """Stream-static enrichment (streaming fact ⋈ broadcast dimension →
    windowed agg per segment) agrees with the batch run of the same
    plan, including events whose user has no dimension row (coalesced
    to the 'unknown' segment by the left join)."""
    from vector_knowledge_base_spark.sources.tables import load_table
    from vector_knowledge_base_spark.streaming.enrich import enriched_windowed_value

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "ts", "user_id", "value"
    )
    # dimension covering only even user ids -> odd ids hit the NULL path
    dim = (
        ev.select("user_id")
        .distinct()
        .where(F.col("user_id") % 2 == 0)
        .withColumn(
            "segment",
            F.when(F.col("user_id") % 4 == 0, "gold").otherwise("silver"),
        )
    )

    expected = {
        (r.window_start, r.segment, r.total_value)
        for r in enriched_windowed_value(ev, dim).collect()
    }
    assert any(seg == "unknown" for _, seg, _ in expected), (
        "fixture must exercise the missing-dimension path"
    )

    ev_dir = str(tmp_path / "events")
    ev.write.parquet(ev_dir)
    stream = (
        spark.readStream.schema("ts timestamp, user_id long, value double")
        .parquet(ev_dir)
    )
    out = enriched_windowed_value(stream, dim)
    assert out.isStreaming

    q = (
        out.writeStream.format("memory")
        .queryName("enrich_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.segment, r.total_value)
        for r in spark.sql("select * from enrich_test").collect()
    }
    assert got == expected


def test_streaming_registry_upsert_matches_batch(spark, tmp_path):
    """foreachBatch registry maintenance: chunks streamed one file per
    micro-batch MERGE into the registry; the final table equals the
    one-shot batch registry (the merge rules are associative, so
    batching cannot change the result)."""
    import datetime as dt

    from vector_knowledge_base_spark.pipeline.ingest import (
        build_registry,
        streaming_registry_sink,
    )

    rows = []
    for d in range(6):
        for c in range(d % 3 + 1):
            rows.append(
                (d, f"doc{d}.txt", dt.datetime(2024, 1, 1 + d, c), d % 3 + 1)
            )
    chunks = spark.createDataFrame(
        rows, "doc_id long, filename string, upload_date timestamp, total_chunks int"
    )
    src = str(tmp_path / "chunks_in")
    chunks.repartition(4).write.parquet(src)

    expected = {
        r.doc_id: (r.filename, r.upload_date, r.total_chunks, r.n_chunks)
        for r in build_registry(chunks).collect()
    }

    stream = (
        spark.readStream.schema(
            "doc_id long, filename string, upload_date timestamp, total_chunks int"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    reg_path = str(tmp_path / "registry")
    q = streaming_registry_sink(
        stream, reg_path, str(tmp_path / "ckpt")
    ).start()
    q.awaitTermination(120)

    got = {
        r.doc_id: (r.filename, r.upload_date, r.total_chunks, r.n_chunks)
        for r in spark.read.parquet(reg_path).collect()
    }
    assert got == expected


def test_streaming_ingest_checkpoint_resume_exactly_once(spark, tmp_path):
    """Checkpoint recovery: a second availableNow run over the SAME
    checkpoint processes only files added since the first run — no
    reprocessing, no duplicates (the exactly-once contract scheduled
    ingest depends on)."""
    from pyspark.sql import functions as F

    from vector_knowledge_base_spark.sources.tables import load_table
    from vector_knowledge_base_spark.streaming.windows import streaming_ingest

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text", "lang"
    )
    src = str(tmp_path / "docs_in")
    out = str(tmp_path / "chunks_out")
    ckpt = str(tmp_path / "ckpt")
    docs.where(F.col("doc_id") < 20).write.parquet(src)

    streaming_ingest(spark, src, checkpoint_dir=ckpt, output_dir=out).awaitTermination(180)
    n1 = spark.read.parquet(out).count()
    assert n1 >= 20

    # second wave of files lands; resume from the same checkpoint
    docs.where((F.col("doc_id") >= 20) & (F.col("doc_id") < 30)).write.mode(
        "append"
    ).parquet(src)
    streaming_ingest(spark, src, checkpoint_dir=ckpt, output_dir=out).awaitTermination(180)

    got = spark.read.parquet(out)
    assert got.count() == n1 + 10  # only the delta was processed
    # and every doc id appears exactly once per chunk index
    dups = (
        got.groupBy("doc_id", "chunk_index").count().where(F.col("count") > 1).count()
    )
    assert dups == 0


def test_session_window_boundary_merges_adjacent(spark):
    """Pins the session_window boundary rule the dynamic-gap oracle
    depends on (r5, verified vs an advisory claiming the opposite): an
    event at EXACTLY prev_ts + gap MERGES into the running session —
    Spark coalesces adjacent [a,b)/[b,c) session windows — matching the
    oracle's strict `ts >` break condition. If a Spark upgrade flips
    this to strict non-overlap semantics, this test fails before the
    driver hash does."""
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00"),
            (1, "2024-01-01 00:30:00"),  # exactly prev + gap
            (1, "2024-01-01 01:00:01"),  # 1s past the merged session end
        ],
        "user_id int, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    out = (
        df.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .count()
        .collect()
    )
    counts = sorted(r["count"] for r in out)
    assert counts == [1, 2], f"boundary event no longer merges: {out}"
