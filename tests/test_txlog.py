"""Transactional manifest layer (sources/txlog.py): commit atomicity,
time travel, copy-on-write delete, file-churn-proportional CDC, vacuum.

Reference parity: the reference mutates stores in place
(backend/document_registry.py delete/upsert); at 100 TB mutations must
be metadata + touched-file rewrites, which is what these tests pin —
including the property that untouched data files are carried BY
REFERENCE (same inode, never rewritten)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from vector_knowledge_base_spark.sources.txlog import (
    append_table,
    compact_log,
    create_table,
    delete_where,
    read_table,
    table_diff,
    table_versions,
)


def _raw(p: str, v: int) -> dict:
    """The manifest exactly as stored on disk (may be delta-encoded)."""
    return json.load(open(p + "/_txlog/%08d.json" % v))


def _m(p: str, v: int) -> dict:
    """The manifest MATERIALIZED (files/stats resolved through any
    delta chain) — what every reader sees."""
    from vector_knowledge_base_spark.sources.txlog import _read_manifest

    return _read_manifest(p, v)


def _mfiles(p: str, v: int) -> list[str]:
    """Manifest file entries resolved to absolute paths (r6: manifests
    store table-root-relative paths so tables are relocatable)."""
    return [
        f if os.path.isabs(f) else os.path.join(p, f) for f in _m(p, v)["files"]
    ]


@pytest.fixture()
def orders(spark):
    from vector_knowledge_base_spark.sources.tables import load_table

    return load_table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


def test_create_read_roundtrip(spark, orders, tmp_path):
    p = str(tmp_path / "t")
    v = create_table(spark, p, orders)
    assert v == 0
    got = read_table(spark, p)
    assert got.count() == orders.count()
    assert set(got.columns) == set(orders.columns)
    with pytest.raises(RuntimeError):
        create_table(spark, p, orders)  # refuses to overwrite


def test_append_and_time_travel(spark, orders, tmp_path):
    p = str(tmp_path / "t")
    first = orders.where(F.col("o_orderkey") < 1000)
    rest = orders.where(F.col("o_orderkey") >= 1000)
    create_table(spark, p, first)
    v1 = append_table(spark, p, rest)
    assert v1 == 1
    assert read_table(spark, p).count() == orders.count()
    # time travel: v0 still shows only the first batch
    assert read_table(spark, p, version=0).count() == first.count()


def test_append_does_not_rewrite_existing_files(spark, orders, tmp_path):
    p = str(tmp_path / "t")
    create_table(spark, p, orders.where(F.col("o_orderkey") < 1000))
    inodes_before = {f: os.stat(f).st_ino for f in _mfiles(p, 0)}
    append_table(spark, p, orders.where(F.col("o_orderkey") >= 1000))
    # every v0 file carried by reference: same path, same inode
    v1_files = set(_mfiles(p, 1))
    for f, ino in inodes_before.items():
        assert f in v1_files
        assert os.stat(f).st_ino == ino


def test_delete_where_is_copy_on_write(spark, orders, tmp_path):
    p = str(tmp_path / "t")
    # two batches -> v1 manifest has two file sets; delete rows that
    # exist ONLY in the second batch and assert batch-1 files untouched
    create_table(spark, p, orders.where(F.col("o_orderkey") < 1000))
    append_table(spark, p, orders.where(F.col("o_orderkey") >= 1000))
    m1 = _m(p, 1)
    v0_files = set(_m(p, 0)["files"])  # relative entries
    inodes = {f: os.stat(os.path.join(p, f)).st_ino for f in v0_files}

    v2 = delete_where(spark, p, F.col("o_orderkey") >= 1000)
    m2 = _m(p, v2)
    # only batch-2 files were rewritten
    assert set(m2["rewritten"]) == set(m1["files"]) - v0_files
    for f in v0_files:
        assert f in m2["files"]
        assert os.stat(os.path.join(p, f)).st_ino == inodes[f]
    got = read_table(spark, p)
    assert got.count() == orders.where(F.col("o_orderkey") < 1000).count()
    assert got.where(F.col("o_orderkey") >= 1000).count() == 0
    # and time travel still reads the pre-delete table
    assert read_table(spark, p, version=1).count() == orders.count()


def test_delete_where_no_match_is_metadata_only(spark, orders, tmp_path):
    p = str(tmp_path / "t")
    create_table(spark, p, orders)
    v1 = delete_where(spark, p, F.col("o_orderkey") < 0)
    m0, m1 = _m(p, 0), _m(p, v1)
    assert m1["files"] == m0["files"]
    assert m1["rewritten"] == []
    # and the no-op delete is stored as an EMPTY delta (no file list)
    assert _raw(p, v1)["delta"] == {
        "base": 0, "add": [], "remove": [], "stats_add": {}
    }


def test_delete_where_null_predicate_rows_survive(spark, tmp_path):
    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "id long, tag string"
    )
    create_table(spark, p, df)
    delete_where(spark, p, F.col("tag") == "a")
    got = {r["id"] for r in read_table(spark, p).collect()}
    # SQL DELETE semantics: only TRUE rows go; the NULL-tag row stays
    assert got == {2, 3}


def test_table_diff_reads_changed_files_only(spark, orders, tmp_path):
    p = str(tmp_path / "t")
    create_table(spark, p, orders)
    delete_where(spark, p, F.col("o_orderstatus") == "F")
    diff = table_diff(spark, p, 0, 1)
    n_f = orders.where(F.col("o_orderstatus") == "F").count()
    by_change = {
        r["change"]: r["n"]
        for r in diff.groupBy("change").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_change.get("delete", 0) == n_f
    assert by_change.get("insert", 0) == 0
    # reverse diff flips the change kinds
    rev = table_diff(spark, p, 1, 0)
    assert rev.where(F.col("change") == "insert").count() == n_f


def test_crash_before_commit_is_invisible(spark, orders, tmp_path):
    """Orphan data files (crash after data write, before manifest
    rename) must be ignored by readers — the manifest is the commit
    point."""
    p = str(tmp_path / "t")
    create_table(spark, p, orders.where(F.col("o_orderkey") < 1000))
    n = read_table(spark, p).count()
    # simulate the crash: a data batch lands with NO manifest
    orphan = os.path.join(p, "data", "borphan")
    orders.where(F.col("o_orderkey") >= 1000).write.parquet(orphan)
    assert read_table(spark, p).count() == n
    # history unaffected
    assert [r["version"] for r in table_versions(spark, p).collect()] == [0]


def test_compact_log_vacuums_unreferenced_files(spark, orders, tmp_path):
    p = str(tmp_path / "t")
    create_table(spark, p, orders)
    delete_where(spark, p, F.col("o_orderstatus") == "F")  # v1 rewrites all
    m1_files = set(_mfiles(p, 1))
    dead = [f for f in _mfiles(p, 0) if f not in m1_files]
    assert dead  # the delete rewrote at least one file
    removed = compact_log(spark, p, keep_versions=1)
    assert removed == len(dead)
    assert all(not os.path.exists(f) for f in dead)
    # latest version still reads fine; v0 is gone from history
    assert read_table(spark, p).count() == orders.where(
        F.col("o_orderstatus") != "F"
    ).count()
    with pytest.raises(RuntimeError):
        read_table(spark, p, version=0)


def test_streaming_ingest_txlog_exactly_once(spark, tmp_path):
    """Streaming ingest committed INTO the transactional table: restart
    from the same checkpoint processes only the delta; a re-delivered
    micro-batch (same batch_id, crash-before-checkpoint simulation) is
    a manifest no-op — row counts never double; and the txlog table
    immediately supports a batch copy-on-write delete over the
    streamed-in data (the one-log-for-everything point)."""
    from vector_knowledge_base_spark.sources.tables import load_table
    from vector_knowledge_base_spark.sources.txlog import _read_manifest
    from vector_knowledge_base_spark.streaming.txsink import (
        streaming_ingest_txlog,
        txlog_foreach_batch,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text", "lang"
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    table = str(tmp_path / "table")
    docs.where(F.col("doc_id") < 20).write.parquet(src)

    streaming_ingest_txlog(spark, src, ckpt, table).awaitTermination(180)
    n1 = read_table(spark, table).count()
    assert n1 >= 20

    # crash-before-checkpoint simulation: re-deliver the committed
    # batch id with the same data — must be a no-op
    last_v = table_versions(spark, table).agg(F.max("version")).first()[0]
    bid = _read_manifest(table, last_v)["batch_id"]
    redelivered = read_table(spark, table)  # same rows, same id
    txlog_foreach_batch(table)(redelivered, bid)
    assert read_table(spark, table).count() == n1

    # second wave; resume from the same checkpoint → delta only
    docs.where((F.col("doc_id") >= 20) & (F.col("doc_id") < 30)).write.mode(
        "append"
    ).parquet(src)
    streaming_ingest_txlog(spark, src, ckpt, table).awaitTermination(180)
    got = read_table(spark, table)
    n2 = got.count()
    assert n2 > n1
    dups = (
        got.groupBy("doc_id", "chunk_index")
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert dups == 0

    # and the streamed table is a first-class txlog table: batch delete
    delete_where(spark, table, F.col("doc_id") < 5)
    assert read_table(spark, table).where(F.col("doc_id") < 5).count() == 0
    # pre-delete version still readable (time travel over streamed data)
    vs = [r["version"] for r in table_versions(spark, table).collect()]
    assert read_table(spark, table, version=sorted(vs)[-2]).count() == n2


def test_streaming_cdc_apply_upserts_latest_per_key(spark, tmp_path):
    """r6 streaming MERGE sink: keyed change rows stream into ONE
    transactional table — within a micro-batch the latest row per key
    wins, across micro-batches the merge replaces stored rows
    copy-on-write, and a crash-replayed batch (same batch_id) is a
    strict no-op (no extra log version, no second rewrite)."""
    from vector_knowledge_base_spark.streaming.txsink import (
        streaming_cdc_apply_txlog,
        txlog_merge_foreach_batch,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    table = str(tmp_path / "table")
    # wave 1: keys 1,2,3 — key 2 updated twice IN the same batch
    spark.createDataFrame(
        [(1, 10, "a1", "en"), (2, 11, "b1", "en"),
         (2, 12, "b2", "en"), (3, 13, "c1", "de")],
        "doc_id long, seq long, text string, lang string",
    ).write.parquet(src)
    streaming_cdc_apply_txlog(
        spark, src, ckpt, table, ["doc_id"], seq_col="seq"
    ).awaitTermination(180)
    got = {r["doc_id"]: r["text"] for r in read_table(spark, table).collect()}
    assert got == {1: "a1", 2: "b2", 3: "c1"}  # last-writer-wins in-batch

    # wave 2: update key 1, insert key 4 → merge replaces + inserts
    spark.createDataFrame(
        [(1, 20, "a2", "en"), (4, 21, "d1", "fr")],
        "doc_id long, seq long, text string, lang string",
    ).write.mode("append").parquet(src)
    streaming_cdc_apply_txlog(
        spark, src, ckpt, table, ["doc_id"], seq_col="seq"
    ).awaitTermination(180)
    got = {r["doc_id"]: r["text"] for r in read_table(spark, table).collect()}
    assert got == {1: "a2", 2: "b2", 3: "c1", 4: "d1"}
    assert read_table(spark, table).count() == 4  # replaced, not accumulated

    # crash-replay: re-deliver the last committed batch id — no new
    # version, no state change
    from vector_knowledge_base_spark.sources.txlog import _read_manifest

    vs = [r["version"] for r in table_versions(spark, table).collect()]
    bid = _read_manifest(table, max(vs))["batch_id"]
    redelivered = spark.createDataFrame(
        [(1, 20, "a2", "en"), (4, 21, "d1", "fr")],
        "doc_id long, seq long, text string, lang string",
    )
    txlog_merge_foreach_batch(table, ["doc_id"], seq_col="seq")(
        redelivered, bid
    )
    vs2 = [r["version"] for r in table_versions(spark, table).collect()]
    assert vs2 == vs  # strict no-op: not even a log version
    got = {r["doc_id"]: r["text"] for r in read_table(spark, table).collect()}
    assert got == {1: "a2", 2: "b2", 3: "c1", 4: "d1"}


def test_streaming_cdc_apply_dv_mode_zero_rewrite(spark, tmp_path):
    """r9 (VERDICT r8 #5): the CDC-apply sink in merge-on-read mode —
    every micro-batch soft-deletes matched rows via a deletion-vector
    batch and appends updates, so NO pre-existing data file is ever
    rewritten by a merge batch (the file set only grows); the
    compact_dv_ratio maintenance hook fires MID-STREAM once the
    soft-deleted fraction crosses the threshold, materializing the
    vectors and clearing the dv map without an external scheduler."""
    from vector_knowledge_base_spark.sources.txlog import _read_manifest
    from vector_knowledge_base_spark.streaming.txsink import (
        txlog_merge_foreach_batch,
    )

    table = str(tmp_path / "table")
    sink = txlog_merge_foreach_batch(
        table, ["doc_id"], seq_col="seq", mode="dv"
    )
    schema = "doc_id long, seq long, text string, lang string"
    sink(
        spark.createDataFrame(
            [(i, 0, f"v0_{i}", "en") for i in range(8)], schema
        ),
        0,
    )
    files0 = set(_read_manifest(table, 0)["files"])
    # batch 1 updates half the keys: dv + append, zero rewrites
    sink(
        spark.createDataFrame(
            [(i, 1, f"v1_{i}", "en") for i in range(4)], schema
        ),
        1,
    )
    vs = [r["version"] for r in table_versions(spark, table).collect()]
    m1 = _read_manifest(table, max(vs))
    assert files0 <= set(m1["files"])  # pre-existing files untouched
    assert m1.get("dv")  # matched rows soft-deleted, not rewritten
    got = {r["doc_id"]: r["text"] for r in read_table(spark, table).collect()}
    assert got == {
        **{i: f"v1_{i}" for i in range(4)},
        **{i: f"v0_{i}" for i in range(4, 8)},
    }
    # replay of batch 1 is a strict no-op (batch_id gate, dv mode too)
    sink(
        spark.createDataFrame(
            [(i, 1, f"v1_{i}", "en") for i in range(4)], schema
        ),
        1,
    )
    assert max(
        r["version"] for r in table_versions(spark, table).collect()
    ) == max(vs)
    # with a ratio hook, a heavy-update batch triggers MID-STREAM
    # materialization: vectors cleared, contents unchanged
    sink_c = txlog_merge_foreach_batch(
        table, ["doc_id"], seq_col="seq", mode="dv",
        compact_dv_ratio=0.25, compact_target_files=2,
    )
    sink_c(
        spark.createDataFrame(
            [(i, 2, f"v2_{i}", "en") for i in range(6)], schema
        ),
        2,
    )
    vs2 = [r["version"] for r in table_versions(spark, table).collect()]
    mc = _read_manifest(table, max(vs2))
    assert (mc.get("dv") or {}) == {}  # materialized mid-stream
    assert mc["op"] == "compact"
    got = {r["doc_id"]: r["text"] for r in read_table(spark, table).collect()}
    assert got == {
        **{i: f"v2_{i}" for i in range(6)},
        **{i: f"v0_{i}" for i in range(6, 8)},
    }
    # option validation: the hook is dv-only
    import pytest as _pytest

    with _pytest.raises(ValueError, match="compact_dv_ratio"):
        txlog_merge_foreach_batch(table, ["doc_id"], compact_dv_ratio=0.1)


def test_compact_files_transactional(spark, orders, tmp_path):
    """Compaction rewrites many small files into few WITHOUT changing
    contents, as a new version (old version still readable), and is a
    no-op when already compact."""
    from vector_knowledge_base_spark.sources.txlog import compact_files

    p = str(tmp_path / "t")
    create_table(spark, p, orders.where(F.col("o_orderkey") < 500).repartition(6))
    for lo, hi in ((500, 1500), (1500, 3000), (3000, 10**9)):
        append_table(
            spark,
            p,
            orders.where(
                (F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < hi)
            ).repartition(6),
        )
    pre_v = table_versions(spark, p).agg(F.max("version")).first()[0]
    n_files_pre = _m(p, pre_v)["files"]
    assert len(n_files_pre) >= 10
    n_rows = read_table(spark, p).count()

    v = compact_files(spark, p, target_files=4)
    m = _m(p, v)
    assert m["op"] == "compact" and len(m["files"]) <= 4
    got = read_table(spark, p)
    assert got.count() == n_rows == orders.count()
    # old version still readable (no read outage during compaction)
    assert read_table(spark, p, version=pre_v).count() == n_rows
    # idempotent when already compact
    assert compact_files(spark, p, target_files=4) == v


def test_delete_where_table_path_with_spaces(spark, orders, tmp_path):
    """input_file_name() returns percent-encoded file:// URIs; a table
    path containing spaces must still match the manifest paths (the
    pre-fix code silently skipped the delete — worse than failing)."""
    p = str(tmp_path / "dir with spaces" / "t")
    create_table(spark, p, orders)
    delete_where(spark, p, F.col("o_orderstatus") == "F")
    got = read_table(spark, p)
    assert got.where(F.col("o_orderstatus") == "F").count() == 0
    assert got.count() == orders.where(F.col("o_orderstatus") != "F").count()


def test_txlog_model_based_op_sequence(spark, tmp_path):
    """Model-based check: a seeded random sequence of append /
    delete_where / overwrite / compact ops applied to BOTH the txlog
    table and an in-memory pandas model must agree on the full table
    contents after EVERY op — the whole-system invariant none of the
    single-op tests compose."""
    import random

    import pandas as pd

    from vector_knowledge_base_spark.sources.txlog import (
        compact_files,
        overwrite_table,
    )

    rng = random.Random(42)
    p = str(tmp_path / "t")

    def fresh_batch(n):
        rows = [
            (rng.randrange(10**6), rng.choice("abcde"), rng.randrange(100))
            for _ in range(n)
        ]
        return rows

    def to_df(rows):
        return spark.createDataFrame(rows, "id long, tag string, v long")

    model = pd.DataFrame(fresh_batch(40), columns=["id", "tag", "v"])
    create_table(spark, p, to_df(list(model.itertuples(index=False))))

    def check():
        got = (
            read_table(spark, p)
            .toPandas()
            .sort_values(["id", "tag", "v"])
            .reset_index(drop=True)
        )
        want = (
            model.sort_values(["id", "tag", "v"]).reset_index(drop=True)
        ).astype(got.dtypes.to_dict())
        pd.testing.assert_frame_equal(got, want)

    for step in range(10):
        op = rng.choice(["append", "delete", "overwrite", "compact"])
        if op == "append":
            rows = fresh_batch(rng.randrange(1, 25))
            append_table(spark, p, to_df(rows))
            model = pd.concat(
                [model, pd.DataFrame(rows, columns=["id", "tag", "v"])],
                ignore_index=True,
            )
        elif op == "delete":
            tag = rng.choice("abcde")
            delete_where(spark, p, F.col("tag") == tag)
            model = model[model["tag"] != tag]
        elif op == "overwrite":
            rows = fresh_batch(rng.randrange(1, 15))
            overwrite_table(spark, p, to_df(rows))
            model = pd.DataFrame(rows, columns=["id", "tag", "v"])
        else:
            compact_files(spark, p, target_files=2)
        check()  # incl. the fully-deleted case: schema comes from the log


def test_delete_all_rows_leaves_readable_empty_table(spark, tmp_path):
    """Deleting every row is a legal state: the table reads back empty
    with the schema reconstructed from the log, and appends keep
    working afterwards."""
    p = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, tag string")
    create_table(spark, p, df)
    delete_where(spark, p, F.lit(True))
    got = read_table(spark, p)
    assert got.count() == 0
    assert got.columns == ["id", "tag"]
    append_table(spark, p, df.where(F.col("id") == 1))
    assert read_table(spark, p).count() == 1


def test_append_schema_enforcement(spark, tmp_path):
    """Schema drift on append is refused (silent drift poisons every
    future read — parquet readers take the first footer); evolution is
    an explicit overwrite."""
    from vector_knowledge_base_spark.sources.txlog import overwrite_table

    p = str(tmp_path / "t")
    create_table(
        spark, p, spark.createDataFrame([(1, "a")], "id long, tag string")
    )
    with pytest.raises(RuntimeError, match="schema"):
        append_table(
            spark, p, spark.createDataFrame([(2, 3.5)], "id long, score double")
        )
    # same-schema append still fine; explicit overwrite evolves
    append_table(spark, p, spark.createDataFrame([(2, "b")], "id long, tag string"))
    overwrite_table(
        spark, p, spark.createDataFrame([(9, 1.5)], "id long, score double")
    )
    assert read_table(spark, p).columns == ["id", "score"]


def test_fsck_reports_missing_and_orphans(spark, orders, tmp_path):
    from vector_knowledge_base_spark.sources.txlog import fsck

    p = str(tmp_path / "t")
    create_table(spark, p, orders)
    # clean table: everything readable, no orphans
    rep = {r["version"]: r for r in fsck(spark, p).collect()}
    assert rep[0]["readable"] and rep[0]["n_missing"] == 0
    assert rep[-1]["n_files"] == 0  # orphans row
    # orphan debris (crash before commit) is counted but harmless
    orders.limit(5).write.parquet(os.path.join(p, "data", "bcrash"))
    rep = {r["version"]: r for r in fsck(spark, p).collect()}
    assert rep[-1]["n_files"] >= 1
    assert rep[0]["readable"]
    # delete a referenced file -> version flagged unreadable
    victim = _mfiles(p, 0)[0]
    os.remove(victim)
    rep = {r["version"]: r for r in fsck(spark, p).collect()}
    assert not rep[0]["readable"] and rep[0]["n_missing"] == 1


def test_merge_table_upsert_copy_on_write(spark, orders, tmp_path):
    """MERGE: matched keys replaced, unmatched inserted, untouched files
    carried by reference (inode check), one op='merge' version; the
    pre-merge version stays readable."""
    from vector_knowledge_base_spark.sources.txlog import merge_table

    p = str(tmp_path / "t")
    lo = orders.where(F.col("o_orderkey") < 1000)
    hi = orders.where(F.col("o_orderkey") >= 1000)
    create_table(spark, p, lo)
    append_table(spark, p, hi)
    v0_files = set(_m(p, 0)["files"])  # relative entries
    inodes = {f: os.stat(os.path.join(p, f)).st_ino for f in v0_files}

    # updates: rewrite two EXISTING hi-side orders + one brand-new key
    existing = {
        r["o_orderkey"]
        for r in hi.orderBy("o_orderkey").limit(2).collect()
    }
    upd = spark.createDataFrame(
        [(k, 1, "X", 9.99) for k in sorted(existing)] + [(999999999, 1, "X", 3.0)],
        orders.schema,
    )
    n_before = read_table(spark, p).count()
    v = merge_table(spark, p, upd, ["o_orderkey"])
    m = _m(p, v)
    assert m["op"] == "merge"
    got = read_table(spark, p)
    assert got.count() == n_before + 1  # 2 updates in place + 1 insert
    # matched rows replaced
    assert got.where(
        F.col("o_orderkey").isin([int(k) for k in existing])
        & (F.col("o_orderstatus") == "X")
    ).count() == 2
    assert got.where(F.col("o_orderkey") == 999999999).count() == 1
    # lo-side files untouched unless they held a matched key
    for f in v0_files - set(m["rewritten"]):
        assert os.stat(os.path.join(p, f)).st_ino == inodes[f]
    # time travel to pre-merge
    assert read_table(spark, p, version=v - 1).count() == n_before


def test_streaming_ingest_dedup_against_stored_corpus(spark, tmp_path):
    """The deduplicated streaming ingest: wave 1 seeds the corpus (and
    its signature table); wave 2 carries exact copies of wave-1 docs
    under NEW ids plus a batch-internal duplicate pair plus genuinely
    new docs — after the second run, the corpus contains each text
    exactly once and the signature table stays row-aligned with it."""
    from vector_knowledge_base_spark.sources.tables import load_table
    from vector_knowledge_base_spark.streaming.txsink import (
        streaming_ingest_dedup_txlog,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text", "lang"
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    dt = str(tmp_path / "docs_tx")
    st = str(tmp_path / "sigs_tx")

    wave1 = docs.where(F.col("doc_id") < 20)
    wave1.write.parquet(src)
    streaming_ingest_dedup_txlog(spark, src, ckpt, dt, st).awaitTermination(180)
    n1 = read_table(spark, dt).count()
    assert n1 > 0

    # wave 2: copies of two wave-1 docs under new ids, one internal dup
    # pair (same text twice), and fresh docs
    copies = wave1.where(F.col("doc_id") < 2).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text", "lang"
    )
    internal_dup = spark.createDataFrame(
        [(2000, "a brand new unique document body entirely", "en"),
         (2001, "a brand new unique document body entirely", "en")],
        "doc_id long, text string, lang string",
    )
    fresh = docs.where((F.col("doc_id") >= 20) & (F.col("doc_id") < 25))
    copies.unionAll(internal_dup).unionAll(fresh).write.mode("append").parquet(src)
    streaming_ingest_dedup_txlog(spark, src, ckpt, dt, st).awaitTermination(180)

    corpus = read_table(spark, dt)
    # every stored text is unique (cross-wave and batch-internal dedup)
    assert corpus.count() == corpus.select("text").distinct().count()
    # the wave-1 copies were dropped; the internal dup collapsed to min id
    assert corpus.where(F.col("doc_id").isin([1000, 1001])).count() == 0
    assert [r["doc_id"] for r in corpus.where(
        F.col("text").startswith("a brand new")).collect()] == [2000]
    # fresh docs landed
    assert corpus.where(
        (F.col("doc_id") >= 20) & (F.col("doc_id") < 25)
    ).count() == 5
    # signature table row-aligned with the corpus
    assert read_table(spark, st).count() == corpus.count()


# ---------------------------------------------------------------------------
# Round 6 — optimistic concurrency (CAS commit), manifest file statistics
# + pruning, relocatable relative paths, batch-id retention across vacuum,
# empty-table mutation edges, crash-recovery of the dedup ingest stream.
# ---------------------------------------------------------------------------


def test_two_concurrent_appenders_both_survive(spark, tmp_path):
    """VERDICT r5 #2: two writers racing the same version slot must
    NEVER silently drop a commit — the CAS (os.link create-exclusive)
    makes one win and the other rebase-retry. Both appended row sets
    are present afterwards, versions are sequential, fsck is clean."""
    import threading

    from vector_knowledge_base_spark.sources.txlog import fsck

    p = str(tmp_path / "t")
    create_table(spark, p, spark.createDataFrame([(0, "seed")], "id long, tag string"))
    errs = []

    def writer(lo: int):
        try:
            df = spark.createDataFrame(
                [(lo + i, f"w{lo}") for i in range(20)], "id long, tag string"
            )
            append_table(spark, p, df)
        except Exception as e:  # pragma: no cover - surfaced via assert
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(lo,)) for lo in (100, 200, 300, 400)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    got = read_table(spark, p)
    assert got.count() == 1 + 4 * 20  # nothing lost
    assert [r["version"] for r in table_versions(spark, p).collect()] == [0, 1, 2, 3, 4]
    rep = fsck(spark, p).collect()
    assert all(r["readable"] for r in rep)


def test_append_rebases_onto_stolen_slot(spark, tmp_path):
    """Deterministic CAS-conflict path (no thread timing): steal the
    version-1 slot with a manual manifest between snapshot and commit —
    append_table must rebase onto the winner's file list, committing at
    version 2 with BOTH the winner's and its own files."""
    from vector_knowledge_base_spark.sources.txlog import (
        TxConflict,
        _commit,
        _read_manifest,
    )

    p = str(tmp_path / "t")
    create_table(spark, p, spark.createDataFrame([(1,)], "id long"))
    m0 = _read_manifest(p, 0)
    # the thief commits version 1 first (empty append — metadata only)
    _commit(
        p,
        {
            "version": 1,
            "op": "append",
            "files": m0["files"],
            "stats": m0.get("stats") or {},
            "parent": 0,
            "batch_id": None,
            "schema": m0["schema"],
        },
    )
    # the loser's direct _commit at version 1 must raise TxConflict...
    with pytest.raises(TxConflict):
        _commit(p, {"version": 1, "op": "append", "files": [], "parent": 0})
    # ...and the public append lands cleanly at version 2
    v = append_table(spark, p, spark.createDataFrame([(2,)], "id long"))
    assert v == 2
    assert {r["id"] for r in read_table(spark, p).collect()} == {1, 2}


def test_manifest_stats_prune_disjoint_files(spark, tmp_path):
    """VERDICT r5 #3: manifests carry per-file row counts and column
    min/max; a declarative filter on a stats-disjoint range must skip
    the file before Spark ever reads it."""
    from vector_knowledge_base_spark.sources.txlog import (
        _prune_files,
        _read_manifest,
    )

    p = str(tmp_path / "t")
    lo = spark.createDataFrame([(i, f"a{i}") for i in range(100)], "id long, tag string")
    hi = spark.createDataFrame([(i, f"z{i}") for i in range(1000, 1100)], "id long, tag string")
    create_table(spark, p, lo.coalesce(1))
    append_table(spark, p, hi.coalesce(1))
    m = _read_manifest(p, 1)
    assert len(m["files"]) == 2
    # every file carries rows + id min/max from the parquet footer
    for entry in m["files"]:
        s = m["stats"][entry]
        assert s["rows"] == 100
        assert "id" in s["min"] and "id" in s["max"]
    # eq / IN / range prune to exactly the one overlapping file
    for filt in ({"id": 1050}, {"id": [1050, 1051]}, {"id": {"gte": 1000}}):
        pruned = _prune_files(p, m, filt)
        assert len(pruned) == 1 and "data/" in pruned[0].replace(p, "")
    # a read with filters equals read-everything-then-filter
    got = {r["id"] for r in read_table(spark, p, filters={"id": {"gte": 1005, "lte": 1010}}).collect()}
    assert got == set(range(1005, 1011))
    # string stats prune too (lexicographic min/max: the lo file's
    # [a0, a99] range is disjoint from any z-prefixed tag)
    assert len(_prune_files(p, m, {"tag": "z1050"})) == 1


def test_delete_where_filters_scans_only_candidate_files(spark, tmp_path):
    """A point delete with declarative filters must leave the stats-
    disjoint file's inode untouched AND never list it as rewritten —
    the affected-file scan ran over the pruned candidate set only."""
    from vector_knowledge_base_spark.sources.txlog import _read_manifest

    p = str(tmp_path / "t")
    lo = spark.createDataFrame([(i, i * 10) for i in range(100)], "id long, v long")
    hi = spark.createDataFrame([(i, i * 10) for i in range(1000, 1100)], "id long, v long")
    create_table(spark, p, lo.coalesce(1))
    append_table(spark, p, hi.coalesce(1))
    lo_entry = _read_manifest(p, 0)["files"][0]
    ino = os.stat(os.path.join(p, lo_entry)).st_ino
    v = delete_where(spark, p, filters={"id": 1050})
    m = _read_manifest(p, v)
    assert m["rewritten"] and lo_entry not in m["rewritten"]
    assert lo_entry in m["files"] and os.stat(os.path.join(p, lo_entry)).st_ino == ino
    got = read_table(spark, p)
    assert got.count() == 199 and got.where(F.col("id") == 1050).count() == 0


def test_table_directory_is_relocatable(spark, tmp_path):
    """Manifests store table-root-relative paths: moving the whole
    directory keeps every version readable (absolute-path manifests
    would dangle)."""
    import shutil

    p = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, tag string")
    create_table(spark, p, df)
    delete_where(spark, p, F.col("id") == 2)
    moved = str(tmp_path / "relocated")
    shutil.move(p, moved)
    assert {r["id"] for r in read_table(spark, moved).collect()} == {1}
    # time travel survives the move too
    assert read_table(spark, moved, version=0).count() == 2


def test_batch_id_idempotency_survives_compact_log(spark, tmp_path):
    """ADVICE r5: vacuuming manifests must not forget their batch_ids —
    a streaming replay older than the retention window would otherwise
    re-append its rows and break exactly-once. compact_log carries the
    dropped ids into _batchids.json."""
    p = str(tmp_path / "t")
    df1 = spark.createDataFrame([(1,)], "id long")
    df2 = spark.createDataFrame([(2,)], "id long")
    create_table(spark, p, df1, batch_id=0)
    append_table(spark, p, df2, batch_id=1)
    append_table(spark, p, spark.createDataFrame([(3,)], "id long"), batch_id=2)
    compact_log(spark, p, keep_versions=1)  # drops the manifests of batch 0, 1
    n = read_table(spark, p).count()
    # replay of a vacuumed batch: must be a no-op, not a duplicate append
    v = append_table(spark, p, df2, batch_id=1)
    assert read_table(spark, p).count() == n
    assert v == table_versions(spark, p).agg(F.max("version")).first()[0]


def test_delete_twice_on_only_document_is_idempotent(spark, tmp_path):
    """ADVICE r5: delete_where on a fully-deleted table (files == [])
    must commit a metadata no-op, not crash on an empty parquet read —
    service.delete_document called twice on the only document."""
    p = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "only.txt")], "id long, filename string")
    create_table(spark, p, df)
    delete_where(spark, p, F.col("filename") == "only.txt")
    assert read_table(spark, p).count() == 0
    v = delete_where(spark, p, F.col("filename") == "only.txt")  # idempotent
    assert read_table(spark, p).count() == 0
    assert v == 2


def test_merge_into_fully_deleted_table_inserts_all(spark, tmp_path):
    """ADVICE r5: merge_table on the legal files==[] state treats every
    update row as an insert instead of crashing on an empty read."""
    from vector_knowledge_base_spark.sources.txlog import merge_table

    p = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], "id long, tag string")
    create_table(spark, p, df)
    delete_where(spark, p, F.lit(True))
    merge_table(
        spark, p, spark.createDataFrame([(7, "x"), (8, "y")], "id long, tag string"),
        ["id"],
    )
    assert {r["id"] for r in read_table(spark, p).collect()} == {7, 8}


def test_compact_files_clustered_rewrite_enables_pruning(spark, tmp_path):
    """r6: compact_files(order_by=[...]) is a clustered rewrite —
    repartitionByRange + in-partition sort makes each output file cover
    a DISJOINT key range, so the manifest stats become a real index: a
    point/range predicate prunes to O(matching) files (Delta's
    OPTIMIZE ... ZORDER in its exact 1-D linear form)."""
    from vector_knowledge_base_spark.sources.txlog import (
        _prune_files,
        _read_manifest,
        compact_files,
    )

    p = str(tmp_path / "t")
    # interleaved appends: every file's id range spans the whole domain,
    # so BEFORE clustering no predicate can prune anything
    for k in range(4):
        df = spark.createDataFrame(
            [(i, i * 2) for i in range(k, 4000, 4)], "id long, v long"
        )
        if k == 0:
            create_table(spark, p, df.coalesce(1))
        else:
            append_table(spark, p, df.coalesce(1))
    m = _read_manifest(p, 3)
    assert len(m["files"]) == 4
    assert len(_prune_files(p, m, {"id": 7})) == 4  # interleaved: no skip
    v = compact_files(spark, p, target_files=4, order_by=["id"])
    m = _read_manifest(p, v)
    assert m["op"] == "compact" and len(m["files"]) == 4
    # ranges are DISJOINT (exact, not approximate): sort by min, assert
    # each file's max < the next file's min
    spans = sorted(
        (m["stats"][e]["min"]["id"], m["stats"][e]["max"]["id"])
        for e in m["files"]
    )
    assert all(spans[i][1] < spans[i + 1][0] for i in range(len(spans) - 1))
    # a point predicate now touches exactly one file; a range a minority
    assert len(_prune_files(p, m, {"id": 7})) == 1
    assert len(_prune_files(p, m, {"id": {"gte": 100, "lte": 200}})) <= 2
    # contents unchanged by the rewrite
    got = read_table(spark, p)
    assert got.count() == 4000
    assert got.agg(F.sum("v")).first()[0] == sum(i * 2 for i in range(4000))
    # and the pruned filtered read is still correct
    assert read_table(spark, p, filters={"id": 7}).first()["v"] == 14


def test_clustered_compact_of_fully_deleted_table_is_noop(spark, tmp_path):
    """compact_files(order_by=...) on the legal files==[] state must
    return the current version, not crash on an empty parquet read —
    the same guard class as delete-twice / merge-into-empty (ADVICE
    r5); the order_by path bypassed the small-table short-circuit."""
    from vector_knowledge_base_spark.sources.txlog import compact_files

    from vector_knowledge_base_spark.sources.txlog import _read_manifest

    p = str(tmp_path / "t")
    create_table(
        spark,
        p,
        spark.createDataFrame([(1, "a")], "id long, tag string").coalesce(1),
    )
    delete_where(spark, p, F.lit(True))
    assert _read_manifest(p, 1)["files"] == []  # the true empty state
    v = compact_files(spark, p, target_files=2, order_by=["id"])
    assert v == 1  # the delete version; no new commit
    assert read_table(spark, p).count() == 0


def test_compact_drops_empty_files_metadata_only(spark, tmp_path):
    """A 1-row frame written at session parallelism carries 0-row part
    files forever (the affected-file scan never selects them). Compact
    proves them empty FROM STATS and drops their references without
    reading or rewriting anything — the surviving file keeps its entry
    and inode."""
    from vector_knowledge_base_spark.sources.txlog import (
        _read_manifest,
        compact_files,
    )

    p = str(tmp_path / "t")
    # no coalesce: local[N] writes N-1 empty parts next to the data
    create_table(
        spark, p, spark.createDataFrame([(1, "a")], "id long, tag string")
    )
    m0 = _read_manifest(p, 0)
    nonempty = [e for e in m0["files"] if m0["stats"][e]["rows"] > 0]
    assert len(m0["files"]) > 1 and len(nonempty) == 1
    ino = os.stat(os.path.join(p, nonempty[0])).st_ino
    v = compact_files(spark, p, target_files=8)
    m1 = _read_manifest(p, v)
    assert m1["op"] == "compact" and m1["files"] == nonempty
    assert os.stat(os.path.join(p, nonempty[0])).st_ino == ino  # no rewrite
    assert read_table(spark, p).count() == 1
    # idempotent: a second compact is a no-op
    assert compact_files(spark, p, target_files=8) == v


def test_compact_log_vacuums_aged_orphans_only(spark, tmp_path):
    """Crash debris (a batch dir no manifest references — e.g. a write
    that died before its CAS, or a lost-CAS retry's abandoned files)
    must be vacuumable, but ONLY past the grace window: a young
    unreferenced batch may be a concurrent writer's in-flight commit
    (the Delta VACUUM retention model)."""
    import shutil as sh

    from vector_knowledge_base_spark.sources.txlog import fsck

    p = str(tmp_path / "t")
    create_table(
        spark, p, spark.createDataFrame([(1, "a")], "id long, tag string").coalesce(1)
    )
    # simulate the crash: clone the committed batch dir into a fresh
    # uncommitted one — a real parquet file no manifest references
    data = os.path.join(p, "data")
    src_batch = os.path.join(data, os.listdir(data)[0])
    orphan_batch = os.path.join(data, "bdeadbeef0000")
    sh.copytree(src_batch, orphan_batch)
    orphans = lambda: (  # noqa: E731
        fsck(spark, p).where("version = -1").first()["n_files"]
    )
    assert orphans() == 1
    # young orphan + default grace: NOT removed (may be in-flight)
    assert compact_log(spark, p, keep_versions=10) == 0
    assert orphans() == 1
    # aged out (grace 0): removed; fsck clean; table intact
    assert compact_log(spark, p, keep_versions=10, orphan_grace_s=0.0) == 1
    assert orphans() == 0
    assert read_table(spark, p).count() == 1


def test_append_merge_schema_adds_column_metadata_only(spark, tmp_path):
    """r6 schema evolution: an opted-in append may ADD columns — the
    logged schema becomes the union, existing files never move (zero
    bytes rewritten: the only acceptable cost at 100 TB), and reads
    null-fill the evolved column for pre-evolution files."""
    from vector_knowledge_base_spark.sources.txlog import (
        _read_manifest,
        table_schema,
    )

    p = str(tmp_path / "t")
    v0 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, tag string")
    create_table(spark, p, v0.coalesce(1))
    old_entry = _read_manifest(p, 0)["files"][0]
    ino = os.stat(os.path.join(p, old_entry)).st_ino
    evolved = spark.createDataFrame(
        [(3, "c", "en")], "id long, tag string, lang string"
    )
    # without the opt-in: refused (enforcement unchanged)
    with pytest.raises(RuntimeError, match="merge_schema"):
        append_table(spark, p, evolved)
    append_table(spark, p, evolved, merge_schema=True)
    # the old file is carried by reference, not rewritten
    assert os.stat(os.path.join(p, old_entry)).st_ino == ino
    # logged schema is the union; reads null-fill pre-evolution rows
    assert [f.name for f in table_schema(p).fields] == ["id", "tag", "lang"]
    got = {r["id"]: r["lang"] for r in read_table(spark, p).collect()}
    assert got == {1: None, 2: None, 3: "en"}
    # time travel: version 0 keeps its ORIGINAL two-column schema
    assert [f.name for f in read_table(spark, p, version=0).schema.fields] == [
        "id", "tag",
    ]
    # an append may also OMIT evolved columns (null-filled the same way)
    append_table(
        spark, p,
        spark.createDataFrame([(4, "d")], "id long, tag string"),
        merge_schema=True,
    )
    got = {r["id"]: r["lang"] for r in read_table(spark, p).collect()}
    assert got == {1: None, 2: None, 3: "en", 4: None}
    assert [f.name for f in table_schema(p).fields] == ["id", "tag", "lang"]
    # a TYPE change is refused even under merge_schema
    with pytest.raises(RuntimeError, match="cannot change column"):
        append_table(
            spark, p,
            spark.createDataFrame([(5, 7, "x")], "id long, tag long, lang string"),
            merge_schema=True,
        )


def test_evolved_column_filter_skips_preevolution_files(spark, tmp_path):
    """A filter on an evolved column PROVABLY skips files written before
    the evolution (the column is physically absent there → all NULL →
    no match) — stats-level pruning without any stats on the column."""
    from vector_knowledge_base_spark.sources.txlog import (
        _prune_files,
        _read_manifest,
    )

    p = str(tmp_path / "t")
    create_table(
        spark, p,
        spark.createDataFrame([(i,) for i in range(50)], "id long").coalesce(1),
    )
    append_table(
        spark, p,
        spark.createDataFrame([(100, "en"), (101, "de")], "id long, lang string").coalesce(1),
        merge_schema=True,
    )
    m = _read_manifest(p, 1)
    assert len(m["files"]) == 2
    pruned = _prune_files(p, m, {"lang": "en"})
    assert len(pruned) == 1  # the pre-evolution file is skipped
    got = read_table(spark, p, filters={"lang": "en"})
    assert [r["id"] for r in got.collect()] == [100]
    # delete on the evolved column touches only the post-evolution file
    v = delete_where(spark, p, filters={"lang": "de"})
    m2 = _read_manifest(p, v)
    assert len(m2["rewritten"]) == 1
    assert read_table(spark, p).count() == 51


def test_dedup_ingest_replay_survives_partial_first_commit(spark, tmp_path):
    """ADVICE r5: a crash between the first micro-batch's two commits
    (docs_table created, sigs_table not yet) must not wedge the stream —
    the replayed foreachBatch treats the missing signature table as an
    empty corpus, no-ops the docs append (batch_id), and creates the
    signature table."""
    from vector_knowledge_base_spark.sources.txlog import create_table as ct
    from vector_knowledge_base_spark.streaming.txsink import (
        dedup_ingest_foreach_batch,
    )

    dt = str(tmp_path / "docs_tx")
    st = str(tmp_path / "sigs_tx")
    batch = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta", "en"),
         (2, "one two three four five six seven", "en")],
        "doc_id long, text string, lang string",
    )
    # simulate the crash window: docs_table committed for batch 0,
    # sigs_table never created
    ct(spark, dt, batch, batch_id=0)
    sink = dedup_ingest_foreach_batch(dt, st)
    sink(batch, 0)  # the replay — r5 code raised 'txlog: no table' here
    docs = read_table(spark, dt)
    assert docs.count() == 2  # no duplicate ingest (batch_id no-op)
    assert read_table(spark, st).count() == 2  # signatures recovered
    # and the NEXT batch probes the recovered corpus normally
    batch2 = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta", "en"),  # dup of doc 1
         (11, "totally fresh content words here now", "en")],
        "doc_id long, text string, lang string",
    )
    sink(batch2, 1)
    assert {r["doc_id"] for r in read_table(spark, dt).collect()} == {1, 2, 11}


# ---------------------------------------------------------------------------
# replace_where (r6 continuation): Delta's predicate-scoped overwrite —
# the declarative form of dynamic partition overwrite, on manifest stats
# instead of partition directories.
# ---------------------------------------------------------------------------


def test_replace_where_swaps_region_atomically(spark, tmp_path):
    from vector_knowledge_base_spark.sources.txlog import replace_where

    p = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(i, "old", i * 10) for i in range(1, 9)], "id long, tag string, v long"
    )
    create_table(spark, p, base)
    new = spark.createDataFrame(
        [(3, "new", 333), (4, "new", 444)], "id long, tag string, v long"
    )
    v = replace_where(spark, p, {"id": {"gte": 3, "lte": 4}}, new)
    assert v == 1
    got = {r["id"]: (r["tag"], r["v"]) for r in read_table(spark, p).collect()}
    want = {i: ("old", i * 10) for i in (1, 2, 5, 6, 7, 8)}
    want.update({3: ("new", 333), 4: ("new", 444)})
    assert got == want
    # time travel still shows the pre-replace region
    old = {r["id"]: r["tag"] for r in read_table(spark, p, version=0).collect()}
    assert old[3] == "old"
    assert _m(p, 1)["op"] == "replace_where"


def test_replace_where_rejects_out_of_region_rows(spark, tmp_path):
    """The validation that makes replaceWhere safe: inserted rows
    outside the declared region must fail BEFORE any commit."""
    from vector_knowledge_base_spark.sources.txlog import replace_where

    p = str(tmp_path / "t")
    create_table(
        spark, p, spark.createDataFrame([(1, "a")], "id long, tag string")
    )
    bad = spark.createDataFrame(
        [(3, "in"), (99, "OUT")], "id long, tag string"
    )
    with pytest.raises(ValueError, match="violate the replace predicate"):
        replace_where(spark, p, {"id": {"gte": 1, "lte": 10}}, bad)
    # nothing committed, table unchanged
    assert [r["version"] for r in table_versions(spark, p).collect()] == [0]
    assert read_table(spark, p).count() == 1


def test_replace_where_empty_region_is_pure_insert(spark, tmp_path):
    """Replacing a region with no current rows = dynamic partition
    overwrite of a NEW partition: no file is rewritten, the new batch
    just lands."""
    from vector_knowledge_base_spark.sources.txlog import replace_where

    p = str(tmp_path / "t")
    create_table(
        spark, p, spark.createDataFrame([(1, "a")], "id long, tag string")
    )
    f0 = set(_mfiles(p, 0))
    ins = spark.createDataFrame([(50, "new"), (51, "new")], "id long, tag string")
    replace_where(spark, p, {"id": {"gte": 50, "lte": 59}}, ins)
    assert _m(p, 1)["rewritten"] == []
    assert f0 <= set(_mfiles(p, 1))  # old file carried by reference
    assert read_table(spark, p).count() == 3


def test_replace_where_prunes_via_cluster_stats(spark, tmp_path):
    """On a table clustered by the replace key, a region replace must
    rewrite ONLY the files whose [min,max] intersects the region."""
    from vector_knowledge_base_spark.sources.txlog import (
        compact_files,
        replace_where,
    )

    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(100)], "id long, v long"
    ).repartition(4)
    create_table(spark, p, df)
    compact_files(spark, p, target_files=4, order_by=["id"])
    latest = max(
        int(n[:-5])
        for n in os.listdir(p + "/_txlog")
        if n.endswith(".json") and not n.startswith((".", "_"))
    )
    n_files = len(_m(p, latest)["files"])
    assert n_files >= 3  # clustered into disjoint ranges
    new = spark.createDataFrame([(5, 5555)], "id long, v long")
    v = replace_where(spark, p, {"id": {"gte": 0, "lte": 10}}, new)
    m = _m(p, v)
    # only files whose clustered range intersects [0,10] are rewritten:
    # 1 in the ideal quartile layout, ≤2 if the range-partitioner's
    # sample put a boundary inside the region — never the whole table
    assert 1 <= len(m["rewritten"]) <= 2 < n_files
    got = {r["id"]: r["v"] for r in read_table(spark, p).collect()}
    assert got[5] == 5555
    assert 0 not in got and 10 not in got and got[11] == 110
    assert len(got) == 100 - 11 + 1


def test_replace_where_refuses_empty_filters_and_schema_drift(spark, tmp_path):
    from vector_knowledge_base_spark.sources.txlog import replace_where

    p = str(tmp_path / "t")
    create_table(
        spark, p, spark.createDataFrame([(1, "a")], "id long, tag string")
    )
    with pytest.raises(ValueError, match="empty filters"):
        replace_where(spark, p, {}, spark.createDataFrame([(1, "x")], "id long, tag string"))
    # 2.0 == 2 passes the region validation, so the type drift itself
    # is what gets refused
    drifted = spark.createDataFrame([(2.0, "x")], "id double, tag string")
    with pytest.raises(RuntimeError, match="does not match the table schema"):
        replace_where(spark, p, {"id": 2}, drifted)


def test_multiwriter_mixed_ops_stress(spark, tmp_path):
    """CAS under real contention with HETEROGENEOUS ops (the r5 test
    raced only appends): four appenders on disjoint key ranges, one
    merger upserting a fixed key set, one deleter removing a seed
    range — all concurrently. Invariants afterwards: no commit lost
    (version count == successful ops + 1), final state exactly equals
    the deterministic expectation (ops touch disjoint key spaces, so
    interleaving cannot change the outcome), fsck fully readable, and
    every version in the log parses."""
    import threading

    from vector_knowledge_base_spark.sources.txlog import fsck, merge_table

    p = str(tmp_path / "t")
    # seed: keys 0..9 (deleter's target range) + merge seed keys 900..904
    seed = [(i, "seed", 0) for i in range(10)] + [
        (900 + i, "seed", 0) for i in range(5)
    ]
    create_table(
        spark, p, spark.createDataFrame(seed, "id long, tag string, v long")
    )
    errs = []

    def appender(lo):
        try:
            df = spark.createDataFrame(
                [(lo + i, f"a{lo}", 1) for i in range(10)],
                "id long, tag string, v long",
            )
            append_table(spark, p, df)
        except Exception as e:
            errs.append(e)

    def merger():
        try:
            df = spark.createDataFrame(
                [(900 + i, "merged", 7) for i in range(5)],
                "id long, tag string, v long",
            )
            merge_table(spark, p, df, key_cols=["id"])
        except Exception as e:
            errs.append(e)

    def deleter():
        try:
            delete_where(spark, p, filters={"id": {"gte": 0, "lte": 9}})
        except Exception as e:
            errs.append(e)

    threads = (
        [threading.Thread(target=appender, args=(lo,)) for lo in (100, 200, 300, 400)]
        + [threading.Thread(target=merger), threading.Thread(target=deleter)]
    )
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    versions = [r["version"] for r in table_versions(spark, p).collect()]
    assert versions == list(range(7))  # create + 6 ops, none lost
    got = {r["id"]: (r["tag"], r["v"]) for r in read_table(spark, p).collect()}
    want = {900 + i: ("merged", 7) for i in range(5)}
    for lo in (100, 200, 300, 400):
        want.update({lo + i: (f"a{lo}", 1) for i in range(10)})
    assert got == want
    rep = fsck(spark, p).collect()
    assert all(r["readable"] for r in rep)


def test_restore_rolls_back_metadata_only(spark, tmp_path):
    from vector_knowledge_base_spark.sources.txlog import restore_table

    p = str(tmp_path / "t")
    create_table(spark, p, spark.range(0, 10).withColumnRenamed("id", "k"))
    append_table(spark, p, spark.range(10, 20).withColumnRenamed("id", "k"))
    delete_where(spark, p, predicate=F.col("k") < 5)
    assert read_table(spark, p).count() == 15
    v0_files = set(_mfiles(p, 0))
    inodes_before = {os.stat(f).st_ino for f in v0_files}
    v = restore_table(spark, p, 0)
    assert v == 3
    # restored state == version 0, by reference (same inodes, no data moved)
    assert read_table(spark, p).count() == 10
    assert set(_mfiles(p, 3)) == v0_files
    assert {os.stat(f).st_ino for f in _mfiles(p, 3)} == inodes_before
    assert _m(p, 3)["op"] == "restore"
    # bad versions remain time-travelable until compact_log
    assert read_table(spark, p, version=2).count() == 15
    # CDC across the restore is the inverse of the undone changes:
    # net effect vs v2 = +5 restored rows (k<5) and -10 appended rows
    d = table_diff(spark, p, 2, 3)
    ins = d.where("change = 'insert'").count()
    dels = d.where("change = 'delete'").count()
    assert (ins, dels) == (5, 10)
    # restore to an unknown version is a named error
    with pytest.raises(RuntimeError, match="restore"):
        restore_table(spark, p, 99)


def test_shallow_clone_zero_copy_and_divergence(spark, tmp_path):
    from vector_knowledge_base_spark.sources.txlog import shallow_clone

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    create_table(spark, src, spark.range(0, 100).withColumnRenamed("id", "k"))
    append_table(spark, src, spark.range(100, 200).withColumnRenamed("id", "k"))
    shallow_clone(spark, src, dst)
    # zero data files under the clone's root; reads equal the source
    assert not os.path.isdir(os.path.join(dst, "data"))
    assert read_table(spark, dst).count() == 200
    src_inodes = {os.stat(f).st_ino for f in _mfiles(src, 1)}
    assert {os.stat(f).st_ino for f in _mfiles(dst, 0)} == src_inodes
    # divergence: CoW delete on the clone rewrites INTO the clone only
    delete_where(spark, dst, predicate=F.col("k") >= 150)
    assert read_table(spark, dst).count() == 150
    assert read_table(spark, src).count() == 200  # source untouched
    assert {os.stat(f).st_ino for f in _mfiles(src, 1)} == src_inodes
    # appends to the source after the clone are invisible to the clone
    append_table(spark, src, spark.range(200, 210).withColumnRenamed("id", "k"))
    assert read_table(spark, dst).count() == 150
    # the clone's stats carried over: a disjoint-range read prunes
    got = read_table(spark, dst, filters={"k": {"gte": 0, "lte": 9}})
    assert got.count() == 10


def test_clone_vacuum_never_deletes_borrowed_files(spark, tmp_path):
    from vector_knowledge_base_spark.sources.txlog import shallow_clone

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    create_table(spark, src, spark.range(0, 50).withColumnRenamed("id", "k"))
    shallow_clone(spark, src, dst)
    # make the borrowed-file version droppable: overwrite the clone,
    # then compact its log down to 1 version
    from vector_knowledge_base_spark.sources.txlog import overwrite_table

    overwrite_table(spark, dst, spark.range(0, 5).withColumnRenamed("id", "k"))
    compact_log(spark, dst, keep_versions=1, orphan_grace_s=0.0)
    # the borrowed source files must survive the clone's vacuum
    assert read_table(spark, src).count() == 50
    # clone at a PINNED older version reads that snapshot
    append_table(spark, src, spark.range(50, 60).withColumnRenamed("id", "k"))
    dst2 = str(tmp_path / "dst2")
    shallow_clone(spark, src, dst2, version=0)
    assert read_table(spark, dst2).count() == 50


def test_zorder_compaction_prunes_both_dimensions(spark, tmp_path):
    """compact_files(zorder_by=[x, y]): Morton-interleaved layout gives
    BOTH columns file-level locality — a range predicate on either
    dimension alone prunes a real fraction of files, where the 1-D
    clustered rewrite gives its second column no locality at all."""
    from vector_knowledge_base_spark.sources.txlog import (
        _prune_files,
        _read_manifest,
        compact_files,
    )

    # 64×64 grid, rows shuffled across 4 interleaved appends so no
    # pre-compaction file has any locality in x OR y
    rows = [(x, y, x * 64 + y) for x in range(64) for y in range(64)]
    pz = str(tmp_path / "tz")
    p1 = str(tmp_path / "t1")
    for p in (pz, p1):
        for k in range(4):
            df = spark.createDataFrame(
                [r for i, r in enumerate(rows) if i % 4 == k],
                "x long, y long, v long",
            )
            (create_table if k == 0 else append_table)(spark, p, df.coalesce(1))
    with pytest.raises(ValueError, match="at most one"):
        compact_files(spark, pz, order_by=["x"], zorder_by=["x", "y"])
    vz = compact_files(spark, pz, target_files=16, zorder_by=["x", "y"])
    v1 = compact_files(spark, p1, target_files=16, order_by=["x"])
    mz, m1 = _read_manifest(pz, vz), _read_manifest(p1, v1)
    assert len(mz["files"]) == 16 and len(m1["files"]) == 16
    # predicate on x alone: both layouts prune
    fx = {"x": {"gte": 0, "lte": 7}}
    assert len(_prune_files(pz, mz, fx)) <= 8
    assert len(_prune_files(p1, m1, fx)) <= 4  # exact 1-D is tighter on x
    # predicate on y alone: ONLY the z-ordered layout prunes
    fy = {"y": {"gte": 0, "lte": 7}}
    assert len(_prune_files(pz, mz, fy)) <= 8
    assert len(_prune_files(p1, m1, fy)) == 16  # x-sorted: y spans every file
    # contents unchanged; filtered reads correct through the pruning
    got = read_table(spark, pz, filters={"x": 3, "y": 5})
    assert [r["v"] for r in got.collect()] == [3 * 64 + 5]
    assert read_table(spark, pz).count() == 64 * 64


def test_delta_manifest_commit_cost_is_o_touched_files(spark, tmp_path):
    """Commit metadata is O(touched files): appends store a 1-entry
    delta against their parent, not the whole file list; every 8th
    version is a FULL checkpoint bounding the chain; a copy-on-write
    delete stores only its removed/rewritten entries; resolution is
    lossless (reads + time travel + stats pruning unchanged); and
    compact_log materializes retained deltas before vacuuming their
    bases so retention never breaks a chain."""
    from vector_knowledge_base_spark.sources.txlog import (
        _FULL_MANIFEST_INTERVAL,
        fsck,
    )

    p = str(tmp_path / "t")
    create_table(
        spark, p, spark.range(0, 10).withColumnRenamed("id", "k").coalesce(1)
    )
    for i in range(1, 13):
        append_table(
            spark,
            p,
            spark.range(10 * i, 10 * (i + 1))
            .withColumnRenamed("id", "k")
            .coalesce(1),
        )
    assert _FULL_MANIFEST_INTERVAL == 8
    for v in range(13):
        raw, resolved = _raw(p, v), _m(p, v)
        assert len(resolved["files"]) == v + 1  # lossless materialization
        assert set(resolved["stats"]) == set(resolved["files"])
        if v == 0 or v % 8 == 0:
            assert "delta" not in raw and len(raw["files"]) == v + 1
        else:
            d = raw["delta"]
            assert "files" not in raw and "stats" not in raw
            assert d["base"] == v - 1 and d["remove"] == []
            assert len(d["add"]) == 1 == len(d["stats_add"])  # O(touched)
    assert read_table(spark, p).count() == 130
    assert read_table(spark, p, version=5).count() == 60  # delta time travel
    # stats pruning works through a resolved chain: point read on the
    # clustered-by-construction k opens exactly one file
    from vector_knowledge_base_spark.sources.txlog import _prune_files

    assert len(_prune_files(p, _m(p, 12), {"k": 125})) == 1
    # CoW delete of one file's rows: delta stores 1 remove, ≤1 add
    v = delete_where(spark, p, filters={"k": {"gte": 40, "lte": 44}})
    d = _raw(p, v)["delta"]
    assert len(d["remove"]) == 1 and len(d["add"]) <= 1
    assert read_table(spark, p).count() == 125
    # retention: v13's base chain reaches back past the cut; survivors
    # are materialized, reads stay correct, fsck stays clean
    compact_log(spark, p, keep_versions=2, orphan_grace_s=0.0)
    assert "delta" not in _raw(p, 12) or _raw(p, 12)["delta"]["base"] >= 12
    assert read_table(spark, p).count() == 125
    assert read_table(spark, p, version=12).count() == 130
    bad = fsck(spark, p).where(~F.col("readable")).count()
    assert bad == 0


def test_storm_8_appenders_delete_compact(spark, tmp_path):
    """r7 storm (VERDICT r6 #6, beyond the 6-writer mixed test): EIGHT
    concurrent appenders (each with a batch_id) + one predicate delete
    + one file compaction, all racing the same log. Invariants that
    must hold under ANY interleaving: every commit survives or retries
    cleanly (no exceptions), no version lost (create + 10 ops = 11
    slots, contiguous), content equals the deterministic expectation
    (key spaces are disjoint, compaction is content-neutral), fsck
    fully readable, and a full REPLAY of all eight appends with their
    original batch_ids afterwards is a no-op (idempotence held across
    interleaved retries — a retry loser must re-check committed ids
    against the winner's snapshot, not its stale one)."""
    import threading

    from vector_knowledge_base_spark.sources.txlog import compact_files, fsck

    p = str(tmp_path / "t")
    seed = [(i, "doomed") for i in range(10)] + [
        (1000 + i, "stable") for i in range(5)
    ]
    create_table(spark, p, spark.createDataFrame(seed, "id long, tag string"))
    errs = []

    def appender(lo):
        try:
            df = spark.createDataFrame(
                [(lo + i, f"a{lo}") for i in range(10)], "id long, tag string"
            )
            append_table(spark, p, df, batch_id=lo)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    def deleter():
        try:
            delete_where(spark, p, filters={"id": {"gte": 0, "lte": 9}})
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    def compactor():
        try:
            compact_files(spark, p, target_files=2)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = (
        [
            threading.Thread(target=appender, args=(lo,))
            for lo in range(100, 900, 100)
        ]
        + [threading.Thread(target=deleter), threading.Thread(target=compactor)]
    )
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    versions = [r["version"] for r in table_versions(spark, p).collect()]
    assert versions == list(range(11))  # create + 10 ops, none lost
    got = {r["id"]: r["tag"] for r in read_table(spark, p).collect()}
    want = {1000 + i: "stable" for i in range(5)}
    for lo in range(100, 900, 100):
        want.update({lo + i: f"a{lo}" for i in range(10)})
    assert got == want
    assert all(r["readable"] for r in fsck(spark, p).collect())
    # interleaved-replay idempotence: same batch_ids land as no-ops
    before = len(table_versions(spark, p).collect())
    for lo in range(100, 900, 100):
        append_table(
            spark,
            p,
            spark.createDataFrame([(lo, "dup")], "id long, tag string"),
            batch_id=lo,
        )
    assert len(table_versions(spark, p).collect()) == before
    assert read_table(spark, p).count() == len(want)


def test_retry_exhaustion_raises_named_error(spark, tmp_path, monkeypatch):
    """When a writer loses every CAS retry it must surface the NAMED
    TxConflict ('lost N CAS races'), never silently drop the commit."""
    from vector_knowledge_base_spark.sources import txlog as txmod

    p = str(tmp_path / "t")
    create_table(spark, p, spark.createDataFrame([(1, "a")], "id long, tag string"))
    monkeypatch.setattr(txmod, "_MAX_COMMIT_RETRIES", 0)
    with pytest.raises(txmod.TxConflict, match="lost 0 CAS races"):
        txmod.append_table(
            spark, p, spark.createDataFrame([(2, "b")], "id long, tag string")
        )
    with pytest.raises(txmod.TxConflict, match="CAS races"):
        txmod.delete_where(spark, p, filters={"id": 1})


def test_check_constraints_enforced_on_every_writer(spark, tmp_path):
    """Delta-style CHECK constraints (r7): add-time validation of the
    existing table, enforcement on append / merge / replace_where /
    overwrite with the NAMED error, SQL NULL-passes semantics, carried
    by every commit (even ops that never mention constraints), and
    droppable."""
    from vector_knowledge_base_spark.sources.txlog import (
        TxConstraintViolation,
        add_constraint,
        drop_constraint,
        merge_table,
        overwrite_table,
        replace_where,
    )

    p = str(tmp_path / "t")
    create_table(
        spark,
        p,
        spark.createDataFrame(
            [(1, 10.0, "a"), (2, None, "b")], "id long, v double, tag string"
        ),
    )
    # add-time validation refuses a constraint existing rows violate
    with pytest.raises(TxConstraintViolation, match="existing rows"):
        add_constraint(spark, p, "v_big", "v >= 100")
    add_constraint(spark, p, "v_nonneg", "v >= 0")  # NULL v passes (SQL)
    v_before = table_versions(spark, p).count()

    # append: violating batch refused with the named error, no version
    with pytest.raises(TxConstraintViolation, match="v_nonneg"):
        append_table(
            spark,
            p,
            spark.createDataFrame([(3, -1.0, "c")], "id long, v double, tag string"),
        )
    assert table_versions(spark, p).count() == v_before
    # NULL evaluates the check to NULL -> passes
    append_table(
        spark,
        p,
        spark.createDataFrame([(4, None, "d")], "id long, v double, tag string"),
    )
    # the carry test: delete_where never mentions constraints, yet the
    # NEXT append is still checked (commit-level inheritance)
    delete_where(spark, p, filters={"id": 1})
    with pytest.raises(TxConstraintViolation, match="v_nonneg"):
        append_table(
            spark,
            p,
            spark.createDataFrame([(5, -2.0, "e")], "id long, v double, tag string"),
        )
    # merge and replace_where validate their incoming rows
    with pytest.raises(TxConstraintViolation, match="merge"):
        merge_table(
            spark,
            p,
            spark.createDataFrame([(2, -5.0, "b")], "id long, v double, tag string"),
            key_cols=["id"],
        )
    with pytest.raises(TxConstraintViolation, match="replace_where"):
        replace_where(
            spark,
            p,
            {"tag": "b"},
            spark.createDataFrame([(2, -5.0, "b")], "id long, v double, tag string"),
        )
    with pytest.raises(TxConstraintViolation, match="overwrite"):
        overwrite_table(
            spark,
            p,
            spark.createDataFrame([(9, -9.0, "z")], "id long, v double, tag string"),
        )
    # drop -> previously-refused rows land
    drop_constraint(spark, p, "v_nonneg")
    append_table(
        spark,
        p,
        spark.createDataFrame([(6, -3.0, "f")], "id long, v double, tag string"),
    )
    got = {r["id"] for r in read_table(spark, p).collect()}
    assert got == {2, 4, 6}
    with pytest.raises(RuntimeError, match="no constraint"):
        drop_constraint(spark, p, "v_nonneg")


def test_check_constraint_on_partitioned_overwrite(spark, tmp_path):
    from vector_knowledge_base_spark.sources.txlog import (
        TxConstraintViolation,
        add_constraint,
        overwrite_partitions,
    )

    p = str(tmp_path / "t")
    create_table(
        spark,
        p,
        spark.createDataFrame([("a", 1, 1.0), ("b", 2, 2.0)], "k string, id long, v double"),
        partition_by=["k"],
    )
    add_constraint(spark, p, "v_pos", "v > 0")
    with pytest.raises(TxConstraintViolation, match="v_pos"):
        overwrite_partitions(
            spark,
            p,
            spark.createDataFrame([("a", 9, -1.0)], "k string, id long, v double"),
        )
    overwrite_partitions(
        spark,
        p,
        spark.createDataFrame([("a", 9, 9.0)], "k string, id long, v double"),
    )
    got = {(r["k"], r["id"]) for r in read_table(spark, p).collect()}
    assert got == {("a", 9), ("b", 2)}


# ---------------------------------------------------------------------------
# ADVICE r7 fixes: '+'-safe row↔file identity, float partition pvals,
# constraint re-validation on overwrite retry, RESTORE metadata semantics
# ---------------------------------------------------------------------------


def test_plus_in_table_path_dv_and_update_identity(spark, tmp_path):
    """ADVICE r7 (medium): F.url_decode implements form-urlencoding and
    turns a literal '+' into a space, while the CoW paths decode with
    the plus-safe urllib unquote. A table path containing '+' broke the
    row↔file identity join: update_where(mode='cow') silently kept the
    old rows AND appended updated copies (duplicates); DV deletes
    failed loudly with 'stray entries'. The %XX-only decode must
    round-trip '+' through both paths."""
    from vector_knowledge_base_spark.sources.txlog import update_where

    p = str(tmp_path / "c+d+e" / "t")
    create_table(
        spark,
        p,
        spark.createDataFrame(
            [(i, i * 10) for i in range(20)], "id long, v long"
        ).coalesce(2),
    )
    # CoW update: exactly one row changes and the count stays 20 —
    # the pre-fix bug would have yielded 21 rows (silent duplicate)
    update_where(spark, p, F.col("id") == 3, {"v": F.lit(999)})
    got = read_table(spark, p)
    assert got.count() == 20
    assert got.where("id = 3").collect()[0]["v"] == 999
    # DV delete: row hidden, no stray-entries error
    delete_where(spark, p, F.col("id") == 7, mode="dv")
    got = read_table(spark, p)
    assert got.count() == 19 and got.where("id = 7").count() == 0
    # DV update on top (soft-delete + append in one commit)
    update_where(spark, p, F.col("id") == 8, {"v": F.lit(-1)}, mode="dv")
    got = read_table(spark, p)
    assert got.count() == 19
    assert got.where("id = 8").collect()[0]["v"] == -1


def test_plus_in_string_partition_value_roundtrips(spark, tmp_path):
    """The same '+' hazard via a string PARTITION value: the hive dir
    key embeds the value in the file path, so the DV identity join and
    the pvals parse must both round-trip it."""
    p = str(tmp_path / "t")
    create_table(
        spark,
        p,
        spark.createDataFrame(
            [("a+b", 1), ("a+b", 2), ("c", 3)], "g string, id long"
        ),
        partition_by=["g"],
    )
    delete_where(spark, p, F.col("id") == 1, mode="dv")
    got = read_table(spark, p)
    assert {r["id"] for r in got.collect()} == {2, 3}
    # eq filter on the partitioned value still matches (pvals pruning
    # must not normalize '+' away)
    got = read_table(spark, p, filters={"g": "a+b"})
    assert {r["id"] for r in got.collect()} == {2}


def test_float_partition_eq_filter_scientific_notation(spark, tmp_path):
    """ADVICE r7 (medium): Java Double.toString writes '1.0E-7' into
    the hive dir name where Python str() writes '1e-07' — the string-
    normalized pvals compare concluded 'provably no match' and pruned
    a file that MATCHES, silently dropping rows. float/double
    partition columns must compare numerically."""
    from vector_knowledge_base_spark.sources.txlog import _pval_matches

    p = str(tmp_path / "t")
    create_table(
        spark,
        p,
        spark.createDataFrame(
            [(1e-07, 1), (0.5, 2), (1234567890.123, 3)],
            "rate double, id long",
        ),
        partition_by=["rate"],
    )
    for val, want in [(1e-07, {1}), (0.5, {2}), (1234567890.123, {3})]:
        got = read_table(spark, p, filters={"rate": val})
        assert {r["id"] for r in got.collect()} == want, val
    # IN-list form
    got = read_table(spark, p, filters={"rate": [1e-07, 0.5]})
    assert {r["id"] for r in got.collect()} == {1, 2}
    # unit pins: numeric equality across the two notations; abstain
    # (None) on an unparseable recorded value, never a false skip
    assert _pval_matches("1.0E-7", [1e-07], "double") is True
    assert _pval_matches("1.0E-7", [2e-07], "double") is False
    assert _pval_matches("not-a-float", [1.0], "double") is None


def test_overwrite_revalidates_constraints_on_cas_retry(
    spark, tmp_path, monkeypatch
):
    """ADVICE r7 (low): overwrite_table used to validate CHECK
    constraints once before its retry loop — a concurrent
    add_constraint landing mid-retry was never re-checked, so a
    violating overwrite could commit after the constraint existed.
    Validation now runs inside the loop (same caching as append)."""
    import vector_knowledge_base_spark.sources.txlog as tx

    p = str(tmp_path / "t")
    create_table(
        spark, p, spark.createDataFrame([(1, 5.0)], "id long, v double")
    )
    real_write = tx._write_batch
    fired = {"done": False}

    def hooked(df, path, partition_by=None, colmap=None):
        out = real_write(df, path, partition_by, colmap)
        if not fired["done"]:
            # simulate the concurrent writer: the constraint lands
            # AFTER overwrite validated against the old manifest but
            # BEFORE its commit — the commit loses the CAS race and
            # must re-validate against the winner's constraint set
            fired["done"] = True
            tx.add_constraint(spark, p, "v_pos", "v > 0")
        return out

    monkeypatch.setattr(tx, "_write_batch", hooked)
    with pytest.raises(tx.TxConstraintViolation, match="v_pos"):
        tx.overwrite_table(
            spark,
            p,
            spark.createDataFrame([(2, -1.0)], "id long, v double"),
        )
    # the table still holds the original row and the constraint
    assert {r["id"] for r in read_table(spark, p).collect()} == {1}


def test_restore_restores_constraint_metadata(spark, tmp_path):
    """ADVICE r7 (low): RESTORE carries the TARGET version's table
    metadata (Delta RESTORE semantics) — restoring past an
    add_constraint drops the constraint instead of silently keeping it
    over restored data it was never validated against; re-adding
    re-validates via the add-time scan."""
    from vector_knowledge_base_spark.sources.txlog import (
        TxConstraintViolation,
        _read_manifest,
        add_constraint,
        restore_table,
    )

    p = str(tmp_path / "t")
    create_table(
        spark, p, spark.createDataFrame([(1, -5.0)], "id long, v double")
    )  # v0 contains a negative row
    delete_where(spark, p, filters={"id": 1})  # v1: remove it
    append_table(
        spark, p, spark.createDataFrame([(2, 3.0)], "id long, v double")
    )  # v2
    add_constraint(spark, p, "v_pos", "v > 0")  # v3: validates v2 fine
    v = restore_table(spark, p, 0)  # restored data violates v_pos
    m = _read_manifest(p, v)
    assert not (m.get("constraints") or {})  # constraint restored away
    # writes after the restore are governed by the restored (empty)
    # constraint set — v0 semantics, not v3's
    append_table(
        spark, p, spark.createDataFrame([(3, -1.0)], "id long, v double")
    )
    # re-adding the constraint re-validates and refuses
    with pytest.raises(TxConstraintViolation, match="existing rows"):
        add_constraint(spark, p, "v_pos", "v > 0")
    # restoring forward to v3 brings the constraint BACK with its data
    v = restore_table(spark, p, 3)
    m = _read_manifest(p, v)
    assert "v_pos" in (m.get("constraints") or {})
    with pytest.raises(TxConstraintViolation, match="v_pos"):
        append_table(
            spark, p, spark.createDataFrame([(4, -2.0)], "id long, v double")
        )


def test_stats_rowcount_matches_count_and_abstains(spark, tmp_path):
    """stats_rowcount (r14): metadata-only COUNT(*) from the manifest —
    exact per version on append-only tables, abstains (None) whenever a
    deletion vector makes the manifest sum inexact, and on missing
    tables/versions."""
    from vector_knowledge_base_spark.sources.txlog import stats_rowcount

    p = str(tmp_path / "t")
    assert stats_rowcount(p) is None  # no table yet

    df = spark.range(10).withColumn("v", F.col("id") * 2)
    create_table(spark, p, df)
    append_table(spark, p, spark.range(10, 15).withColumn("v", F.col("id")))
    # exact at latest AND at every historical version
    assert stats_rowcount(p) == read_table(spark, p).count() == 15
    assert stats_rowcount(p, version=0) == 10
    assert stats_rowcount(p, version=99) is None  # unknown version

    # a DV (soft delete) makes the manifest sum inexact -> abstain,
    # never a wrong answer
    delete_where(spark, p, F.col("id") < 3, mode="dv")
    assert stats_rowcount(p) is None
    assert read_table(spark, p).count() == 12
    # historical pre-DV version still answerable from metadata
    assert stats_rowcount(p, version=0) == 10
