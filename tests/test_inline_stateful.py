"""Inline string-document source (S21), ZIP export sink (S19), and the
custom stateful streaming operator."""

from __future__ import annotations

import zipfile

import pytest

from pyspark.sql import functions as F


def test_create_document_pipeline(spark):
    from vector_knowledge_base_spark.sources.inline import create_document

    chunks = create_document(
        spark,
        "note.md",
        "First sentence here. Second sentence there. Third one too.",
        category="mcp",
        tags=["inline"],
    ).collect()
    assert len(chunks) == 1  # short doc → one chunk
    c = chunks[0]
    assert c.filename == "note.md"
    assert c.total_chunks == 1 and c.chunk_index == 0
    assert len(c.embedding) == 64
    assert c.tags == ["inline"]


def test_create_document_rejects_bad_ext(spark):
    from vector_knowledge_base_spark.sources.inline import create_document

    with pytest.raises(ValueError, match="inline documents"):
        create_document(spark, "evil.exe", "x")


def test_create_document_rejects_oversize(spark):
    from vector_knowledge_base_spark.sources.inline import create_document

    with pytest.raises(ValueError, match="exceeds"):
        create_document(spark, "big.txt", "x" * (101 * 1024))


def test_export_zip_with_folder_paths(spark, tmp_path):
    from vector_knowledge_base_spark.sources.inline import export_zip

    files = spark.createDataFrame(
        [
            ("docs/work", "a.txt", b"alpha"),
            ("", "root.txt", b"root"),
        ],
        "folder_path string, filename string, content binary",
    )
    zp = str(tmp_path / "export.zip")
    n = export_zip(files, zp)
    assert n == 2
    with zipfile.ZipFile(zp) as zf:
        assert set(zf.namelist()) == {"docs/work/a.txt", "root.txt"}
        assert zf.read("docs/work/a.txt") == b"alpha"


def test_stateful_user_profile_stream(spark, tmp_path):
    """applyInPandasWithState across TWO micro-batches: state must carry
    over (counts accumulate, last_ts advances)."""
    from vector_knowledge_base_spark.sources.tables import load_table
    from vector_knowledge_base_spark.streaming.stateful import user_profile_stream

    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "ts", "value", "event_id"
    )
    # two files → two micro-batches with maxFilesPerTrigger=1
    src = tmp_path / "ev"
    half1 = events.where(F.col("event_id") % 2 == 0)
    half2 = events.where(F.col("event_id") % 2 == 1)
    half1.coalesce(1).write.parquet(str(src / "b1"))
    half2.coalesce(1).write.parquet(str(src / "b2"))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double, event_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        user_profile_stream(stream)
        .writeStream.format("memory")
        .queryName("profiles")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # final state per user == batch aggregate over all events
    expect = {
        r.user_id: (r.n, round(r.s, 2))
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    # memory sink in update mode appends every update; take the LAST row
    # per user (max n_events)
    rows = spark.sql(
        """select user_id, max_by(n_events, n_events) n_events,
                  max_by(total_value, n_events) total_value
           from profiles group by user_id"""
    ).collect()
    got = {r.user_id: (r.n_events, r.total_value) for r in rows}
    assert got == expect
