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


def test_transform_with_state_v2_plan_builds(spark):
    """Without protobuf the query can't RUN, but the v2 operator must
    still construct and analyze — guards the API usage (state schema,
    output mode, time mode) against Spark upgrades."""
    from vector_knowledge_base_spark.streaming.transform_state import (
        user_profile_stream_v2,
    )

    stream = spark.readStream.format("rate").load().selectExpr(
        "value as user_id", "CAST(value AS DOUBLE) as value"
    )
    out = user_profile_stream_v2(stream)
    assert out.isStreaming
    assert set(out.columns) == {"user_id", "n_events", "total_value"}


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState's Python state server requires protobuf "
    "(absent from this container); the operator module itself is "
    "import-clean and analysis-checked below",
)
def test_transform_with_state_v2_stream(spark, tmp_path):
    """transformWithStateInPandas (Spark-4 stateful v2) across TWO
    micro-batches: the ValueState handle must carry counts over."""
    from vector_knowledge_base_spark.sources.tables import load_table
    from vector_knowledge_base_spark.streaming.transform_state import (
        user_profile_stream_v2,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "value", "event_id"
    )
    src = tmp_path / "ev2"
    events.where(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(str(src / "b1"))
    events.where(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(str(src / "b2"))

    stream = (
        spark.readStream.schema("user_id long, value double, event_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    # transformWithState is RocksDB-state-store-only (SPARK-42931)
    old_provider = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            user_profile_stream_v2(stream)
            .writeStream.format("memory")
            .queryName("profiles_v2")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        if old_provider:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", old_provider
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    expect = {
        r.user_id: (r.n, round(r.s, 2))
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    rows = spark.sql(
        """select user_id, max_by(n_events, n_events) n_events,
                  max_by(total_value, n_events) total_value
           from profiles_v2 group by user_id"""
    ).collect()
    got = {r.user_id: (r.n_events, r.total_value) for r in rows}
    assert got == expect


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
