"""Hive-style partitioned txlog tables (sources/txlog.py partition_by,
r7 — VERDICT r6 #4): per-file partition values recorded in the
manifest make eq/IN pruning DEFINITIONAL (not footer-inferred) and
enable dynamic partition overwrite. Partition columns stay inside the
data files, so every existing read path (time travel, CDC, streaming
source) is untouched — these tests pin exactly that."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from vector_knowledge_base_spark.sources import txlog as tx


def _ns(rows):
    return sorted(rows, key=lambda t: tuple((x is None, x) for x in t))


def _mkpart(spark, path):
    df = spark.createDataFrame(
        [
            ("2024-01-01", 1, 10.0),
            ("2024-01-01", 2, 20.0),
            ("2024-01-02", 3, 30.0),
            (None, 4, 40.0),
        ],
        "day string, id long, v double",
    )
    tx.create_table(spark, path, df, partition_by=["day"])
    return df


def test_create_records_pvals_and_reads_back(spark, tmp_path):
    p = str(tmp_path / "t")
    _mkpart(spark, p)
    m = tx._read_manifest(p, 0)
    assert m["partition_by"] == ["day"]
    pvals = [st["pvals"]["day"] for st in m["stats"].values()]
    assert sorted(pvals, key=lambda x: (x is None, x)) == [
        "2024-01-01",
        "2024-01-01",
        "2024-01-02",
        None,
    ]
    got = _ns(
        (r["day"], r["id"], r["v"]) for r in tx.read_table(spark, p).collect()
    )
    assert got == [
        ("2024-01-01", 1, 10.0),
        ("2024-01-01", 2, 20.0),
        ("2024-01-02", 3, 30.0),
        (None, 4, 40.0),
    ]


def test_partition_pruning_is_exact(spark, tmp_path):
    p = str(tmp_path / "t")
    _mkpart(spark, p)
    m = tx._read_manifest(p, 0)
    # eq: only that partition's files survive; the NULL partition is
    # provably skippable for any eq/IN (SQL: = never matches NULL)
    assert len(tx._prune_files(p, m, {"day": "2024-01-01"})) == 2
    assert len(tx._prune_files(p, m, {"day": "2024-01-03"})) == 0
    assert (
        len(tx._prune_files(p, m, {"day": ["2024-01-01", "2024-01-02"]})) == 3
    )
    # ranges fall back to the typed footer stats (min == max == value
    # for a partitioned file) — still exact, NULL partition kept out
    # by absent stats only when footers recorded none
    pruned = tx._prune_files(p, m, {"day": {"gte": "2024-01-02"}})
    assert len(pruned) <= 2  # at most the 01-02 file + the NULL file
    read = tx.read_table(spark, p, filters={"day": "2024-01-02"})
    assert [r["id"] for r in read.collect()] == [3]


def test_int_partition_values_normalize(spark, tmp_path):
    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(5, 1), (10, 2), (10, 3)], "bucket int, id long"
    )
    tx.create_table(spark, p, df, partition_by=["bucket"])
    m = tx._read_manifest(p, 0)
    # int filter value vs path-string pvals: normalized through the
    # logged schema type, so 10 matches "10" and never "5" (one
    # partition value may span several part files — compare by value)
    def _vals(filters):
        files = tx._prune_files(p, m, filters)
        return {
            m["stats"][tx._rel(p, f)]["pvals"]["bucket"] for f in files
        }

    assert _vals({"bucket": 10}) == {"10"}
    assert _vals({"bucket": [5, 10]}) == {"5", "10"}
    assert _vals({"bucket": 7}) == set()


def test_append_and_mutations_preserve_layout(spark, tmp_path):
    p = str(tmp_path / "t")
    _mkpart(spark, p)
    tx.append_table(
        spark,
        p,
        spark.createDataFrame(
            [("2024-01-02", 5, 50.0)], "day string, id long, v double"
        ),
    )
    m1 = tx._read_manifest(p, 1)
    assert m1["partition_by"] == ["day"]
    new = set(m1["files"]) - set(tx._read_manifest(p, 0)["files"])
    assert all("_pt_day=" in e for e in new)
    # CoW delete keeps the property and the survivors' pvals
    tx.delete_where(spark, p, F.col("id") == 1)
    m2 = tx._read_manifest(p, 2)
    assert m2["partition_by"] == ["day"]
    assert all(
        "pvals" in st for st in m2["stats"].values()
    ), "rewritten survivors lost their partition values"
    got = _ns((r["day"], r["id"]) for r in tx.read_table(spark, p).collect())
    assert got == [
        ("2024-01-01", 2),
        ("2024-01-02", 3),
        ("2024-01-02", 5),
        (None, 4),
    ]


def test_dynamic_partition_overwrite(spark, tmp_path):
    p = str(tmp_path / "t")
    _mkpart(spark, p)
    m0 = tx._read_manifest(p, 0)
    v = tx.overwrite_partitions(
        spark,
        p,
        spark.createDataFrame(
            [("2024-01-01", 9, 99.0)], "day string, id long, v double"
        ),
    )
    m1 = tx._read_manifest(p, v)
    assert m1["op"] == "overwrite_partitions"
    # EXACTLY day=2024-01-01's two files replaced; every other file
    # carried BY REFERENCE (file identity, zero bytes moved)
    untouched = {
        e
        for e in m0["files"]
        if m0["stats"][e]["pvals"]["day"] != "2024-01-01"
    }
    assert untouched <= set(m1["files"])
    assert len(m1.get("rewritten", [])) == 2
    got = _ns((r["day"], r["id"]) for r in tx.read_table(spark, p).collect())
    assert got == [("2024-01-01", 9), ("2024-01-02", 3), (None, 4)]
    # CDC across the overwrite: deletes of 1,2 and insert of 9
    diff = _ns(
        (r["change"], r["id"])
        for r in tx.table_diff(spark, p, 0, v).select("change", "id").collect()
    )
    assert diff == [("delete", 1), ("delete", 2), ("insert", 9)]
    # time travel still serves the pre-overwrite snapshot
    assert tx.read_table(spark, p, 0).count() == 4


def test_overwrite_partitions_guards(spark, tmp_path):
    flat = str(tmp_path / "flat")
    tx.create_table(
        spark, flat, spark.createDataFrame([(1, 1.0)], "id long, v double")
    )
    with pytest.raises(RuntimeError, match="requires a partitioned"):
        tx.overwrite_partitions(
            spark, flat, spark.createDataFrame([(2, 2.0)], "id long, v double")
        )
    p = str(tmp_path / "t")
    _mkpart(spark, p)
    with pytest.raises(RuntimeError, match="schema"):
        tx.overwrite_partitions(
            spark,
            p,
            spark.createDataFrame([("x", 1)], "day string, id long"),
        )


def test_compaction_restore_clone_carry_partitioning(spark, tmp_path):
    p = str(tmp_path / "t")
    _mkpart(spark, p)
    for i in range(3):
        tx.append_table(
            spark,
            p,
            spark.createDataFrame(
                [("2024-01-01", 100 + i, 1.0)], "day string, id long, v double"
            ),
        )
    v = tx.compact_files(spark, p, target_files=1)
    m = tx._read_manifest(p, v)
    assert m["partition_by"] == ["day"]
    assert all("pvals" in st for st in m["stats"].values())
    assert tx.read_table(spark, p).count() == 7
    # restore pins partition_by from the target
    rv = tx.restore_table(spark, p, 0)
    assert tx._read_manifest(p, rv)["partition_by"] == ["day"]
    assert tx.read_table(spark, p).count() == 4
    # a shallow clone inherits the property and its own appends keep it
    c = str(tmp_path / "clone")
    tx.shallow_clone(spark, p, c)
    assert tx._read_manifest(c, 0)["partition_by"] == ["day"]
    tx.append_table(
        spark,
        c,
        spark.createDataFrame(
            [("2024-01-05", 7, 7.0)], "day string, id long, v double"
        ),
    )
    mclone = tx._read_manifest(c, 1)
    assert len(tx._prune_files(c, mclone, {"day": "2024-01-05"})) == 1


def test_vacuum_prunes_nested_dirs_and_fsck_counts_nested_orphans(
    spark, tmp_path
):
    p = str(tmp_path / "t")
    _mkpart(spark, p)
    for i in range(4):
        tx.append_table(
            spark,
            p,
            spark.createDataFrame(
                [("2024-01-0%d" % (i + 1), 200 + i, 1.0)],
                "day string, id long, v double",
            ),
        )
    tx.overwrite_table(
        spark,
        p,
        spark.createDataFrame(
            [("2024-02-01", 1, 1.0)], "day string, id long, v double"
        ),
    )
    removed = tx.compact_log(spark, p, keep_versions=1, orphan_grace_s=0.0)
    assert removed >= 5  # the old partitions' nested files are gone
    assert tx.read_table(spark, p).count() == 1
    assert tx.fsck(spark, p).where("readable = false").count() == 0
    orphans = tx.fsck(spark, p).where("version = -1").collect()[0]["n_files"]
    assert orphans == 0
    # every surviving parquet under data/ is referenced (nested walk)
    m = tx._read_manifest(p, tx._list_versions(p)[-1])
    live = set(tx._manifest_files(p, m))
    on_disk = set(tx._data_files(p))
    assert on_disk == live


def test_nested_table_root_never_vacuumed_by_outer(spark, tmp_path):
    """ADVICE r6 (_owned scoping): a source table living INSIDE the
    clone's directory tree is borrowed, not owned — the outer table's
    compact_log must never delete the inner table's live data."""
    outer = str(tmp_path / "outer")
    inner = os.path.join(outer, "src")
    tx.create_table(
        spark, inner, spark.createDataFrame([(1, 1.0)], "id long, v double")
    )
    tx.shallow_clone(spark, inner, outer)
    # make the borrowed files unreferenced in the outer's retained log
    tx.overwrite_table(
        spark, outer, spark.createDataFrame([(9, 9.0)], "id long, v double")
    )
    for _ in range(3):
        tx.append_table(
            spark, outer, spark.createDataFrame([(9, 9.0)], "id long, v double")
        )
    tx.compact_log(spark, outer, keep_versions=1, orphan_grace_s=0.0)
    # the inner table is intact and readable
    assert tx.fsck(spark, inner).where("readable = false").count() == 0
    assert tx.read_table(spark, inner).count() == 1


def test_streaming_source_tails_partitioned_table(spark, tmp_path):
    """Partition columns live IN the files, so the txlog streaming
    source reads a partitioned table with zero changes."""
    from vector_knowledge_base_spark.sources.txstream import TxlogStreamReader

    p = str(tmp_path / "t")
    _mkpart(spark, p)
    tx.append_table(
        spark,
        p,
        spark.createDataFrame(
            [("2024-01-03", 6, 60.0)], "day string, id long, v double"
        ),
    )
    import json

    schema_json = json.dumps(tx.table_schema(p).jsonValue())
    r = TxlogStreamReader(
        p,
        ["day", "id", "v"],
        ignore_changes=False,
        start_version=0,
        schema_json=schema_json,
    )
    rows = [
        row
        for part in r.partitions({"version": -1}, {"version": 1})
        for b in [r.read(part)]
        for row in (
            [t for rb in b for t in rb.to_pylist()]
            if not isinstance(b, tuple)
            else [b]
        )
    ]
    ids = sorted(x["id"] for x in rows)
    assert ids == [1, 2, 3, 4, 6]
