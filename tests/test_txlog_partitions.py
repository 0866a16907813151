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


def test_overwrite_partitions_composes_with_live_dvs(spark, tmp_path):
    """VERDICT r8 #7 (carried r7 #6): dynamic partition overwrite over
    a table carrying live deletion vectors — the REPLACED partition's
    rows are fully swapped for the new content (its soft-deleted rows
    can never resurrect: their files leave the manifest together with
    their dv entries), while an UNTOUCHED partition keeps both its
    files and its vectors (soft-deleted rows stay hidden)."""
    p = str(tmp_path / "t")
    _mkpart(spark, p)
    # soft-delete one row in each of the two dated partitions
    tx.delete_where(spark, p, predicate=F.col("id") == 1, mode="dv")
    tx.delete_where(spark, p, predicate=F.col("id") == 3, mode="dv")
    m = tx._read_manifest(p, tx._list_versions(p)[-1])
    assert len(m.get("dv") or {}) >= 2
    got = {(r["day"], r["id"]) for r in tx.read_table(spark, p).collect()}
    assert got == {("2024-01-01", 2), (None, 4)}
    # replace partition 2024-01-01 — id=1's soft-delete must NOT
    # resurrect (the whole partition swaps), and 2024-01-02's vector
    # must survive (id=3 stays hidden)
    v = tx.overwrite_partitions(
        spark,
        p,
        spark.createDataFrame(
            [("2024-01-01", 9, 90.0)], "day string, id long, v double"
        ),
    )
    got = {(r["day"], r["id"]) for r in tx.read_table(spark, p).collect()}
    assert got == {("2024-01-01", 9), (None, 4)}
    m2 = tx._read_manifest(p, v)
    # dv bookkeeping: no dv entry points at a removed file; the kept
    # partition's vector is still referenced
    files2 = set(m2["files"])
    assert all(e in files2 for e in (m2.get("dv") or {}))
    assert m2.get("dv")  # 2024-01-02's vector survived the overwrite
    # fsck agrees nothing dangles (every version fully readable)
    assert tx.fsck(spark, p).where(~F.col("readable")).count() == 0
    # and a follow-up compaction materializes the surviving vector
    tx.compact_files(spark, p, target_files=2)
    mc = tx._read_manifest(p, tx._list_versions(p)[-1])
    assert (mc.get("dv") or {}) == {}
    got = {(r["day"], r["id"]) for r in tx.read_table(spark, p).collect()}
    assert got == {("2024-01-01", 9), (None, 4)}


def test_partition_filter_stream_composes_with_dv_merge_feed(
    spark, tmp_path
):
    """VERDICT r8 #7, streaming half: a partition_filter consumer with
    ignore_changes=true tailing a dv-merge (merge-on-read CDC) feed —
    each merge_dv commit adds update files and hides old rows via
    vectors; the consumer plans tasks ONLY for its own partition's
    added files (planning-time pruning) and re-emits updated copies
    (dedup downstream on the key, Delta's documented ignoreChanges
    contract), never rows from other partitions."""
    import json

    from vector_knowledge_base_spark.sources.txstream import (
        TxlogStreamReader,
    )

    src = str(tmp_path / "src")
    tx.create_table(
        spark,
        src,
        spark.createDataFrame(
            [("a", 1, "a1"), ("a", 2, "a2"), ("b", 10, "b1")],
            "g string, k long, txt string",
        ),
        partition_by=["g"],
    )
    # dv-merge feed: one update per partition per commit
    tx.merge_table(
        spark,
        src,
        spark.createDataFrame(
            [("a", 1, "a1v2"), ("b", 10, "b1v2")],
            "g string, k long, txt string",
        ),
        ["g", "k"],
        mode="dv",
    )
    m = tx._read_manifest(src, tx._list_versions(src)[-1])
    assert m["op"] == "merge_dv" and m.get("dv")
    r = TxlogStreamReader(
        src,
        ["g", "k", "txt"],
        ignore_changes=True,
        start_version=0,
        schema_json=json.dumps(tx.table_schema(src).jsonValue()),
        partition_filter=json.dumps({"g": "a"}),
    )

    def _emitted(lo, hi):
        out = []
        for part in r.partitions({"version": lo}, {"version": hi}):
            if part.file is None:
                continue
            for rb in r.read(part):
                out.extend((t["k"], t["txt"]) for t in rb.to_pylist())
        return sorted(out)

    # initial snapshot: partition a only (b's file pruned at planning)
    assert _emitted(-1, 0) == [(1, "a1"), (2, "a2")]
    # the merge_dv commit: ONLY partition a's updated copy is planned;
    # the dv-hide of the old row is skipped under ignore_changes
    assert _emitted(0, 1) == [(1, "a1v2")]
    # without ignore_changes the same commit refuses loudly (it hides
    # rows), so a consumer can never silently miss the soft-deletes
    r2 = TxlogStreamReader(
        src,
        ["g", "k", "txt"],
        ignore_changes=False,
        start_version=0,
        schema_json=json.dumps(tx.table_schema(src).jsonValue()),
        partition_filter=json.dumps({"g": "a"}),
    )
    with pytest.raises(ValueError, match="ignore_changes"):
        r2.partitions({"version": 0}, {"version": 1})


def test_partition_scoped_compaction_optimize_where(spark, tmp_path):
    """r11: compact_files(partition_filter=...) — the Delta
    OPTIMIZE ... WHERE economics. Pinned: only the matching
    partition's files rewrite (out-of-scope entries are carried BY
    REFERENCE, byte-identical); out-of-scope deletion vectors
    survive untouched (clearing them would resurrect soft-deleted
    rows); in-scope vectors materialize; reads equal before/after;
    non-partition keys and unpartitioned tables are refused."""
    p = str(tmp_path / "t")
    rows = [(f"2024-01-0{1 + (i % 2)}", i, float(i)) for i in range(40)]
    df = spark.createDataFrame(rows, "day string, id long, v double")
    tx.create_table(spark, p, df.repartition(4), partition_by=["day"])
    # several appends → many small files per partition
    for lo in (100, 200):
        add = spark.createDataFrame(
            [(f"2024-01-0{1 + (i % 2)}", i, float(i))
             for i in range(lo, lo + 20)],
            "day string, id long, v double",
        )
        tx.append_table(spark, p, add.repartition(3))
    # soft-delete one row in EACH partition (dv mode)
    tx.delete_where(spark, p, F.col("id") == 0, mode="dv")    # day 01
    tx.delete_where(spark, p, F.col("id") == 1, mode="dv")    # day 02
    before = _ns([(r["day"], r["id"], r["v"])
                  for r in tx.read_table(spark, p).collect()])
    m0 = tx._read_manifest(p, tx._list_versions(p)[-1])
    day2_before = [e for e in m0["files"] if "_pt_day=2024-01-02" in e]
    assert len(day2_before) > 1
    assert any("_pt_day=2024-01-02" in e for e in (m0.get("dv") or {}))

    v = tx.compact_files(
        spark, p, target_files=1, partition_filter={"day": "2024-01-01"}
    )
    m1 = tx._read_manifest(p, v)
    # out-of-scope (day 02) files carried by reference, dv intact
    day2_after = [e for e in m1["files"] if "_pt_day=2024-01-02" in e]
    assert sorted(day2_after) == sorted(day2_before)
    assert any("_pt_day=2024-01-02" in e for e in (m1.get("dv") or {}))
    # in-scope (day 01) compacted to one file, its dv materialized
    day1_after = [e for e in m1["files"] if "_pt_day=2024-01-01" in e]
    assert len(day1_after) == 1
    assert not any("_pt_day=2024-01-01" in e for e in (m1.get("dv") or {}))
    # reads identical (both soft-deleted rows still hidden)
    after = _ns([(r["day"], r["id"], r["v"])
                 for r in tx.read_table(spark, p).collect()])
    assert after == before
    assert not any(r[1] in (0, 1) for r in after)

    # guards
    with pytest.raises(ValueError, match="partition columns"):
        tx.compact_files(spark, p, partition_filter={"id": 3})
    flat = str(tmp_path / "flat")
    tx.create_table(spark, flat, spark.range(5))
    with pytest.raises(ValueError, match="partition columns"):
        tx.compact_files(spark, flat, partition_filter={"day": "x"})
