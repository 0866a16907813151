"""local_df (r14 optimization): the arrow-path local frame must be
value- and schema-identical to spark.createDataFrame, land as a
LocalRelation (no pickled-RDD re-evaluation per action), and fall back
to the legacy path whenever it cannot guarantee identity."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import types as T

from vector_knowledge_base_spark.sources.localframe import local_df


CASES = [
    ([(1, "a"), (2, None)], "doc_id long, tag string"),
    ([(None, "x")], "k int, va string"),
    ([(1, [1.0, 2.0]), (2, None)], "id int, v array<double>"),
    ([("a", ["x", "y"]), ("b", [])], "s string, t array<string>"),
    ([(b"ab", True), (None, None)], "b binary, ok boolean"),
    ([], "x long, y string"),
    ([(0, 0.123456), (1, -2.5)], "doc_id long, score double"),
    ([(datetime.date(2024, 1, 2), 1)], "d date, n int"),
]


@pytest.mark.parametrize("data,schema", CASES)
def test_value_and_schema_parity(spark, data, schema):
    legacy = spark.createDataFrame(data, schema)
    arrow = local_df(spark, data, schema)
    assert arrow.collect() == legacy.collect()
    assert [(f.name, f.dataType) for f in arrow.schema.fields] == [
        (f.name, f.dataType) for f in legacy.schema.fields
    ]


def test_lands_as_local_relation(spark):
    df = local_df(spark, [(1, "a")], "doc_id long, tag string")
    plan = df._jdf.queryExecution().optimizedPlan().getClass().getName()
    assert plan.endswith("LocalRelation")


def test_timestamp_falls_back_with_identical_values(spark):
    data = [("doc1", datetime.datetime(2024, 1, 1, 12, 0))]
    schema = "document_id string, upload_date timestamp"
    legacy = spark.createDataFrame(data, schema)
    routed = local_df(spark, data, schema)
    assert routed.collect() == legacy.collect()
    assert routed.schema == legacy.schema


def test_non_nullable_schema_falls_back(spark):
    st = T.StructType([T.StructField("x", T.LongType(), nullable=False)])
    df = local_df(spark, [(1,)], st)
    assert df.schema["x"].nullable is False
    assert df.collect() == spark.createDataFrame([(1,)], st).collect()


def test_bad_row_width_matches_legacy_error(spark):
    with pytest.raises(Exception):
        local_df(spark, [(1, "a", "extra")], "x long, y string").collect()


def test_type_mismatch_still_rejected(spark):
    # the legacy verifier rejects a float in a long column; the arrow
    # path must not silently truncate it either
    with pytest.raises(Exception):
        local_df(spark, [(1.5,)], "x long").collect()
