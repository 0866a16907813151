"""Round-2 additions: storage mutations (S17 delete / S18 reset +
crash-safe rewrite), PCA model persistence (M8), extension-preserving
filename cap (F5), and the A8 batch-upload status summary."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from vector_knowledge_base_spark.sources.storage import (
    compact,
    delete_where,
    reset_table,
)


@pytest.fixture()
def small_table(spark, tmp_path):
    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(i, f"doc_{i % 3}.txt", float(i)) for i in range(30)],
        "chunk_id long, filename string, score double",
    ).write.parquet(path)
    return path


def test_delete_where_removes_matches(spark, small_table):
    delete_where(spark, small_table, F.col("filename") == "doc_0.txt")
    left = spark.read.parquet(small_table)
    assert left.where(F.col("filename") == "doc_0.txt").count() == 0
    assert left.count() == 20  # the complement survives intact


def test_delete_where_string_predicate(spark, small_table):
    delete_where(spark, small_table, "chunk_id >= 15")
    assert spark.read.parquet(small_table).agg(F.max("chunk_id")).first()[0] == 14


def test_delete_where_null_predicate_rows_kept(spark, tmp_path):
    # Qdrant's must-match selector only deletes rows that positively
    # match: a NULL predicate result means "not matched" → keep.
    path = str(tmp_path / "nulls")
    spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "id long, tag string"
    ).write.parquet(path)
    delete_where(spark, path, F.col("tag") == "a")
    assert sorted(r[0] for r in spark.read.parquet(path).collect()) == [2, 3]


def test_reset_keeps_schema_drops_rows(spark, small_table):
    before = spark.read.parquet(small_table).schema
    reset_table(spark, small_table)
    after = spark.read.parquet(small_table)
    assert after.count() == 0
    assert after.schema == before
    # appends still work against the preserved schema
    spark.createDataFrame([(99, "x.txt", 1.0)], before).write.mode(
        "append"
    ).parquet(small_table)
    assert spark.read.parquet(small_table).count() == 1


def test_rewrite_leaves_no_temp_dirs(spark, small_table):
    compact(spark, small_table, target_partitions=1)
    parent = os.path.dirname(small_table)
    leftovers = [d for d in os.listdir(parent) if "__" in d]
    assert leftovers == []
    assert spark.read.parquet(small_table).count() == 30


def test_pca_model_save_load_roundtrip(spark, tmp_path):
    from vector_knowledge_base_spark.operators.projection import (
        load_projection_model,
        project_3d,
        save_projection_model,
        transform_query,
    )

    emb = spark.createDataFrame(
        [(i, [float(i), float(i % 5), float(i % 7), 1.0]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    coords, model = project_3d(emb)
    path = str(tmp_path / "pca_model")
    save_projection_model(model, path)
    loaded = load_projection_model(path)
    assert loaded is not None
    q = [1.0, 2.0, 3.0, 4.0]
    assert transform_query(loaded, q) == pytest.approx(transform_query(model, q))
    # missing path → None (reference load_model returns False)
    assert load_projection_model(str(tmp_path / "nope")) is None


def test_sanitize_filename_preserves_extension(spark):
    from vector_knowledge_base_spark.functions.text import sanitize_filename

    long_stem = "a" * 250
    rows = spark.createDataFrame(
        [(long_stem + ".pdf",), ("ok.txt",), ("no_extension_" + "b" * 250,)],
        "name string",
    ).select(sanitize_filename("name").alias("s")).collect()
    capped_pdf, ok, no_ext = (r[0] for r in rows)
    assert capped_pdf.endswith(".pdf") and len(capped_pdf) == 200
    assert ok == "ok.txt"
    assert len(no_ext) == 200  # extensionless names get a plain cap


def test_batch_upload_summary(spark):
    from vector_knowledge_base_spark.pipeline.ingest import (
        batch_upload_summary,
        file_statuses,
    )

    extracted = spark.createDataFrame(
        [
            ("good.txt", "hello world", None),
            ("empty.txt", "", None),
            ("broken.pdf", None, "no PDF extractor"),
        ],
        "filename string, text string, error string",
    )
    st = {r["filename"]: r for r in file_statuses(extracted).collect()}
    assert st["good.txt"]["status"] == "success"
    assert st["empty.txt"]["reason"] == "empty text"
    assert st["broken.pdf"]["reason"] == "no PDF extractor"

    summary = batch_upload_summary(file_statuses(extracted)).first()
    assert (summary["status"], summary["uploaded"], summary["rejected"]) == (
        "success",
        1,
        2,
    )
    all_bad = extracted.where(F.col("filename") != "good.txt")
    summary2 = batch_upload_summary(file_statuses(all_bad)).first()
    assert summary2["status"] == "partial_success" and summary2["uploaded"] == 0
