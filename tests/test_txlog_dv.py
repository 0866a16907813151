"""Deletion vectors (sources/txlog.py delete_where(mode='dv') — the
public Delta merge-on-read idea, r7): a delete writes one churn-sized
(entry, row_index) sidecar batch instead of rewriting data files;
DV-aware reads anti-join the hidden rows away; any rewrite of a file
MATERIALIZES its vectors. The invariant every test defends: a DV
table is OBSERVATIONALLY IDENTICAL to the same table maintained with
copy-on-write deletes — readers, CDC, time travel, matviews, vacuum,
and the streaming guard must all agree."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from vector_knowledge_base_spark.sources import txlog as tx


def _ks(spark, path, version=None):
    return sorted(r["k"] for r in tx.read_table(spark, path, version).collect())


def test_dv_delete_hides_rows_without_moving_files(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.create_table(
        spark, p, spark.range(0, 60).withColumnRenamed("id", "k").coalesce(3)
    )
    files0 = set(tx._read_manifest(p, 0)["files"])
    v = tx.delete_where(spark, p, F.col("k") % 4 == 0, mode="dv")
    m = tx._read_manifest(p, v)
    assert m["op"] == "delete_where_dv"
    assert set(m["files"]) == files0  # zero data files moved
    assert _ks(spark, p) == [k for k in range(60) if k % 4 != 0]
    # filters + DV compose (pruned scan still DV-aware)
    got = tx.read_table(spark, p, filters={"k": {"gte": 0, "lte": 9}})
    assert sorted(r["k"] for r in got.collect()) == [1, 2, 3, 5, 6, 7, 9]
    # time travel: pre-delete snapshot still full
    assert len(_ks(spark, p, 0)) == 60


def test_dv_redelete_idempotent_and_accumulates(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.create_table(
        spark, p, spark.range(0, 40).withColumnRenamed("id", "k").coalesce(2)
    )
    v1 = tx.delete_where(spark, p, F.col("k") < 5, mode="dv")
    dv1 = tx._read_manifest(p, v1)["dv"]
    # re-deleting already-hidden rows nets ZERO new vectors (the scan
    # is DV-aware) — a pure-metadata commit
    v2 = tx.delete_where(spark, p, F.col("k") < 5, mode="dv")
    assert tx._read_manifest(p, v2)["dv"] == dv1
    # a second real delete ACCUMULATES per-file vector lists
    tx.delete_where(spark, p, F.col("k") >= 38, mode="dv")
    assert _ks(spark, p) == list(range(5, 38))
    # write-first no-match detection (r14): the empty sidecar a
    # no-match delete probes with is removed before commit — only
    # the two REAL dv batches exist on disk
    import os

    data = os.path.join(p, "data")
    dv_dirs = [d for d in os.listdir(data) if d.startswith("dv")]
    assert len(dv_dirs) == 2


def test_dv_cdc_and_matview_follow_soft_deletes(spark, tmp_path):
    """table_diff must surface DV-hidden rows as deletes (file set
    unchanged!), and therefore a matview refresh follows them."""
    from vector_knowledge_base_spark.sources.matview import (
        create_matview,
        read_matview,
        refresh_matview,
    )

    p, mv = str(tmp_path / "t"), str(tmp_path / "mv")
    df = spark.createDataFrame(
        [("a", i, float(i)) for i in range(10)]
        + [("b", 10 + i, 10.0 + i) for i in range(10)],
        "g string, k long, v double",
    )
    tx.create_table(spark, p, df.coalesce(2))
    create_matview(spark, mv, p, ["g"], [("sum", "v"), ("count", "*")])
    v = tx.delete_where(spark, p, F.col("k") < 5, mode="dv")
    d = tx.table_diff(spark, p, v - 1, v)
    assert sorted((r["change"], r["k"]) for r in d.collect()) == [
        ("delete", i) for i in range(5)
    ]
    assert refresh_matview(spark, mv)["mode"] == "delta"
    got = {r["g"]: (r["sum_v"], r["count_star"])
           for r in read_matview(spark, mv).collect()}
    assert got == {"a": (sum(map(float, range(5, 10))), 5),
                   "b": (sum(10.0 + i for i in range(10)), 10)}


def test_rewrites_materialize_vectors_no_resurrection(spark, tmp_path):
    """CoW delete / merge / compact over DV'd files must read
    DV-aware (no hidden row resurrects) and drop the materialized
    entries from the dv map."""
    p = str(tmp_path / "t")
    tx.create_table(
        spark, p, spark.range(0, 30).withColumnRenamed("id", "k").coalesce(1)
    )
    tx.delete_where(spark, p, F.col("k") < 10, mode="dv")
    # CoW delete touching the SAME file: survivors must exclude the
    # dv-hidden rows, and the file's dv entry disappears
    v = tx.delete_where(spark, p, F.col("k").between(10, 14))
    m = tx._read_manifest(p, v)
    assert (m.get("dv") or {}) == {}
    assert _ks(spark, p) == list(range(15, 30))
    # merge over a dv'd file
    p2 = str(tmp_path / "t2")
    tx.create_table(
        spark,
        p2,
        spark.createDataFrame(
            [(i, "old") for i in range(10)], "k long, tag string"
        ).coalesce(1),
    )
    tx.delete_where(spark, p2, F.col("k") < 3, mode="dv")
    tx.merge_table(
        spark,
        p2,
        spark.createDataFrame([(5, "new"), (99, "ins")], "k long, tag string"),
        key_cols=["k"],
    )
    got = {r["k"]: r["tag"] for r in tx.read_table(spark, p2).collect()}
    assert got == {**{i: "old" for i in range(3, 10) if i != 5},
                   5: "new", 99: "ins"}
    assert (tx._read_manifest(p2, tx._list_versions(p2)[-1]).get("dv") or {}) == {}
    # compaction materializes
    p3 = str(tmp_path / "t3")
    tx.create_table(
        spark, p3, spark.range(0, 20).withColumnRenamed("id", "k").coalesce(4)
    )
    tx.delete_where(spark, p3, F.col("k") % 2 == 0, mode="dv")
    tx.compact_files(spark, p3, target_files=1)
    ml = tx._read_manifest(p3, tx._list_versions(p3)[-1])
    assert (ml.get("dv") or {}) == {}
    assert _ks(spark, p3) == list(range(1, 20, 2))


def test_dv_on_partitioned_table_and_restore(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.create_table(
        spark,
        p,
        spark.createDataFrame(
            [("x", i) for i in range(6)] + [("y", 10 + i) for i in range(6)],
            "g string, k long",
        ),
        partition_by=["g"],
    )
    v = tx.delete_where(spark, p, F.col("k").isin(0, 1, 10), mode="dv")
    assert _ks(spark, p) == [2, 3, 4, 5, 11, 12, 13, 14, 15]
    # restore to pre-delete brings the rows back (dv rides manifests)
    tx.restore_table(spark, p, v - 1)
    assert len(_ks(spark, p)) == 12
    # and restoring forward to the dv version hides them again
    tx.restore_table(spark, p, v)
    assert _ks(spark, p) == [2, 3, 4, 5, 11, 12, 13, 14, 15]


def test_dv_clone_borrows_vectors_and_vacuum_keeps_live_dv(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "clone")
    tx.create_table(
        spark, src, spark.range(0, 20).withColumnRenamed("id", "k").coalesce(1)
    )
    tx.delete_where(spark, src, F.col("k") < 5, mode="dv")
    tx.shallow_clone(spark, src, dst)
    assert _ks(spark, dst) == list(range(5, 20))  # clone sees the DV
    # the clone's own dv delete lands in ITS dv map, source untouched
    tx.delete_where(spark, dst, F.col("k") >= 18, mode="dv")
    assert _ks(spark, dst) == list(range(5, 18))
    assert _ks(spark, src) == list(range(5, 20))
    # vacuum on the source must never remove a LIVE dv batch
    for i in range(6):
        tx.append_table(
            spark, src, spark.range(100 + i, 101 + i).withColumnRenamed("id", "k")
        )
    tx.compact_log(spark, src, keep_versions=2, orphan_grace_s=0.0)
    assert _ks(spark, src)[:3] == [5, 6, 7]  # dv still applied
    assert tx.fsck(spark, src).where("readable = false").count() == 0


def test_dv_vacuumed_when_materialized_and_history_dropped(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.create_table(
        spark, p, spark.range(0, 20).withColumnRenamed("id", "k").coalesce(4)
    )
    tx.delete_where(spark, p, F.col("k") < 5, mode="dv")
    tx.compact_files(spark, p, target_files=1)  # materializes, dv cleared
    assert (
        tx._read_manifest(p, tx._list_versions(p)[-1]).get("dv") or {}
    ) == {}
    for i in range(4):
        tx.append_table(
            spark, p, spark.range(50 + i, 51 + i).withColumnRenamed("id", "k")
        )
    tx.compact_log(spark, p, keep_versions=2, orphan_grace_s=0.0)
    # the dv batch is unreferenced by every retained manifest → gone
    leftover = [
        f
        for f in tx._data_files(p)
        if os.path.basename(os.path.dirname(f)).startswith("dv")
    ]
    assert leftover == []
    assert tx.fsck(spark, p).where("version = -1").collect()[0]["n_files"] == 0
    assert sorted(
        r["k"] for r in tx.read_table(spark, p).collect()
    ) == list(range(5, 20)) + list(range(50, 54))


def test_txstream_guard_trips_on_dv_commit(spark, tmp_path):
    """A DV commit hides rows WITHOUT touching the file set — the
    streaming source must treat it as a non-append change."""
    from vector_knowledge_base_spark.sources.txstream import TxlogStreamReader

    p = str(tmp_path / "t")
    tx.create_table(
        spark, p, spark.range(0, 10).withColumnRenamed("id", "k").coalesce(1)
    )
    tx.delete_where(spark, p, F.col("k") < 3, mode="dv")
    r = TxlogStreamReader(p, ["k"], ignore_changes=False, start_version=0)
    with pytest.raises(ValueError, match="changed the file set"):
        r.partitions({"version": 0}, {"version": 1})
    r2 = TxlogStreamReader(p, ["k"], ignore_changes=True, start_version=0)
    parts = r2.partitions({"version": 0}, {"version": 1})
    assert [row for pt in parts for row in r2.read(pt)] == []


def test_dv_equals_cow_observationally(spark, tmp_path):
    """The defining property: the same delete sequence via DV and via
    CoW yields identical readable state at every version offset."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    base = spark.range(0, 50).withColumnRenamed("id", "k").coalesce(2)
    tx.create_table(spark, a, base)
    tx.create_table(spark, b, base)
    for pred in (F.col("k") % 3 == 0, F.col("k") > 40, F.col("k") == 1):
        tx.delete_where(spark, a, pred, mode="dv")
        tx.delete_where(spark, b, pred)  # cow
    assert _ks(spark, a) == _ks(spark, b)
    for v in range(4):
        assert _ks(spark, a, v) == _ks(spark, b, v), f"version {v}"
    # and the cumulative CDC agrees
    da = tx.table_diff(spark, a, 0, 3).groupBy("change").count().collect()
    db = tx.table_diff(spark, b, 0, 3).groupBy("change").count().collect()
    assert {(r["change"], r["count"]) for r in da} == {
        (r["change"], r["count"]) for r in db
    }


def test_update_where_cow_and_dv_equal_and_atomic(spark, tmp_path):
    """SQL UPDATE in both modes: identical observable result; dv mode
    moves no pre-existing files (old files untouched, updated copies
    appended + old rows vectored out in ONE commit); CDC reads the
    update as delete(old)+insert(new); constraints check the UPDATED
    rows; casts pin the schema."""
    from vector_knowledge_base_spark.sources.txlog import (
        TxConstraintViolation,
        add_constraint,
        update_where,
    )

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    base = spark.createDataFrame(
        [(i, float(i), "x" if i % 2 else "y") for i in range(20)],
        "k long, v double, tag string",
    ).coalesce(2)
    tx.create_table(spark, a, base)
    tx.create_table(spark, b, base)
    files_before = set(tx._read_manifest(a, 0)["files"])
    va = update_where(
        spark, a, F.col("tag") == "y", {"v": F.col("v") * 10}, mode="dv"
    )
    update_where(spark, b, F.col("tag") == "y", {"v": "v * 10"})  # cow, SQL str
    want = sorted(
        (i, float(i) * (10 if i % 2 == 0 else 1)) for i in range(20)
    )
    got_a = sorted(
        (r["k"], r["v"]) for r in tx.read_table(spark, a).collect()
    )
    got_b = sorted(
        (r["k"], r["v"]) for r in tx.read_table(spark, b).collect()
    )
    assert got_a == want and got_b == want
    ma = tx._read_manifest(a, va)
    assert ma["op"] == "update_where_dv"
    assert files_before <= set(ma["files"])  # old files untouched
    assert ma.get("dv")  # and vectored
    # CDC: delete(old y rows) + insert(new y rows). k=0 updates
    # 0.0 → 0.0, an IDENTICAL tuple, so it correctly nets to zero in
    # the multiset diff — 9 of the 10 matched rows actually changed.
    d = tx.table_diff(spark, a, 0, va)
    counts = {r["change"]: r["count"] for r in d.groupBy("change").count().collect()}
    assert counts == {"delete": 9, "insert": 9}
    # updated value type is CAST back to the column type (no drift)
    assert (
        tx.table_schema(a).simpleString()
        == tx.table_schema(b).simpleString()
    )
    # constraints see the POST-update rows
    add_constraint(spark, a, "v_small", "v < 1000")
    with pytest.raises(TxConstraintViolation, match="v_small"):
        update_where(spark, a, F.col("k") == 2, {"v": F.lit(5000.0)}, mode="dv")
    with pytest.raises(TxConstraintViolation, match="v_small"):
        update_where(spark, a, F.col("k") == 2, {"v": F.lit(5000.0)})
    # unknown SET column is a named error; no-op UPDATE commits metadata
    with pytest.raises(ValueError, match="unknown columns"):
        update_where(spark, a, F.col("k") == 2, {"nope": F.lit(1)})
    n_before = len(tx._list_versions(a))
    update_where(spark, a, F.col("k") == 99999, {"v": F.lit(1.0)}, mode="dv")
    assert len(tx._list_versions(a)) == n_before + 1  # idempotent no-op op
    assert tx.read_table(spark, a).count() == 20


def test_update_where_dv_on_partitioned_respects_layout(spark, tmp_path):
    from vector_knowledge_base_spark.sources.txlog import update_where

    p = str(tmp_path / "t")
    tx.create_table(
        spark,
        p,
        spark.createDataFrame(
            [("a", 1, 1.0), ("a", 2, 2.0), ("b", 3, 3.0)],
            "g string, k long, v double",
        ),
        partition_by=["g"],
    )
    update_where(spark, p, F.col("g") == "a", {"v": F.col("v") + 0.5}, mode="dv")
    m = tx._read_manifest(p, tx._list_versions(p)[-1])
    # the appended updated copies keep the hive layout + pvals
    new = [e for e in m["files"] if e not in tx._read_manifest(p, 0)["files"]]
    assert new and all("_pt_g=" in e for e in new)
    assert all("pvals" in m["stats"][e] for e in new)
    got = sorted((r["g"], r["k"], r["v"]) for r in tx.read_table(spark, p).collect())
    assert got == [("a", 1, 1.5), ("a", 2, 2.5), ("b", 3, 3.0)]
    # partition pruning still exact post-update
    pruned = tx._prune_files(p, m, {"g": "b"})
    assert all(
        (m["stats"][tx._rel(p, f)]["pvals"] or {}).get("g") == "b"
        for f in pruned
    )


def test_merge_dv_equals_cow_and_moves_no_files(spark, tmp_path):
    """MERGE in dv mode: observationally identical to the CoW merge,
    zero pre-existing files moved, batch_id idempotent, CDC reads it
    as delete(old matched)+insert(updates)."""
    from vector_knowledge_base_spark.sources.txlog import merge_table

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    base = spark.createDataFrame(
        [(i, "old", float(i)) for i in range(20)], "k long, tag string, v double"
    ).coalesce(2)
    tx.create_table(spark, a, base)
    tx.create_table(spark, b, base)
    ups = spark.createDataFrame(
        [(3, "upd", 33.0), (7, "upd", 77.0), (100, "ins", 1.0)],
        "k long, tag string, v double",
    )
    files0 = set(tx._read_manifest(a, 0)["files"])
    va = merge_table(spark, a, ups, key_cols=["k"], batch_id=42, mode="dv")
    merge_table(spark, b, ups, key_cols=["k"])
    got_a = sorted((r["k"], r["tag"], r["v"]) for r in tx.read_table(spark, a).collect())
    got_b = sorted((r["k"], r["tag"], r["v"]) for r in tx.read_table(spark, b).collect())
    assert got_a == got_b and len(got_a) == 21
    ma = tx._read_manifest(a, va)
    assert ma["op"] == "merge_dv"
    assert files0 <= set(ma["files"]) and ma.get("dv")
    # batch_id replay is a no-op
    assert merge_table(spark, a, ups, ["k"], batch_id=42, mode="dv") == va
    assert tx.read_table(spark, a).count() == 21
    # CDC: matched old rows deleted, all update rows inserted
    d = tx.table_diff(spark, a, 0, va)
    counts = {r["change"]: r["count"] for r in d.groupBy("change").count().collect()}
    assert counts == {"delete": 2, "insert": 3}
    # merging on top of existing vectors: hidden rows cannot re-match
    merge_table(spark, a, spark.createDataFrame(
        [(3, "upd2", 34.0)], "k long, tag string, v double"), ["k"], mode="dv")
    rows3 = [r for r in tx.read_table(spark, a).collect() if r["k"] == 3]
    assert len(rows3) == 1 and rows3[0]["tag"] == "upd2"
    # compaction materializes everything
    tx.compact_files(spark, a, target_files=2)
    assert (tx._read_manifest(a, tx._list_versions(a)[-1]).get("dv") or {}) == {}
    assert tx.read_table(spark, a).count() == 21


def test_dv_stats_and_ratio_triggered_compaction(spark, tmp_path):
    """DV accounting + the maintenance policy: dv_stats reports the
    soft-deleted fraction from footers only; compact_if_dv_ratio
    no-ops below threshold and materializes above it."""
    from vector_knowledge_base_spark.sources.txlog import (
        compact_if_dv_ratio,
        dv_stats,
    )

    p = str(tmp_path / "t")
    tx.create_table(
        spark, p, spark.range(0, 100).withColumnRenamed("id", "k").coalesce(4)
    )
    s0 = dv_stats(spark, p)
    assert s0["hidden_rows"] == 0 and s0["hidden_ratio"] == 0.0
    tx.delete_where(spark, p, F.col("k") < 5, mode="dv")  # 5%
    s1 = dv_stats(spark, p)
    assert s1["hidden_rows"] == 5 and abs(s1["hidden_ratio"] - 0.05) < 1e-9
    assert s1["physical_rows"] == 100 and s1["n_dv_batches"] == 1
    assert compact_if_dv_ratio(spark, p, threshold=0.10) is None  # below
    tx.delete_where(spark, p, F.col("k") >= 90, mode="dv")  # now 15%
    assert dv_stats(spark, p)["hidden_rows"] == 15
    v = compact_if_dv_ratio(spark, p, threshold=0.10)
    assert v is not None
    s2 = dv_stats(spark, p)
    assert s2["hidden_rows"] == 0 and s2["n_dv_files"] == 0
    assert s2["physical_rows"] == 85
    assert _ks(spark, p) == list(range(5, 90))
    # time-travel accounting: the pre-compact snapshot still reports
    assert dv_stats(spark, p, version=v - 1)["hidden_rows"] == 15
