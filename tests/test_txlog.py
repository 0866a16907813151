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
    m0 = json.load(open(p + "/_txlog/00000000.json"))
    inodes_before = {f: os.stat(f).st_ino for f in m0["files"]}
    append_table(spark, p, orders.where(F.col("o_orderkey") >= 1000))
    m1 = json.load(open(p + "/_txlog/00000001.json"))
    # every v0 file carried by reference: same path, same inode
    for f, ino in inodes_before.items():
        assert f in m1["files"]
        assert os.stat(f).st_ino == ino


def test_delete_where_is_copy_on_write(spark, orders, tmp_path):
    p = str(tmp_path / "t")
    # two batches -> v1 manifest has two file sets; delete rows that
    # exist ONLY in the second batch and assert batch-1 files untouched
    create_table(spark, p, orders.where(F.col("o_orderkey") < 1000))
    append_table(spark, p, orders.where(F.col("o_orderkey") >= 1000))
    m1 = json.load(open(p + "/_txlog/00000001.json"))
    v0_files = set(json.load(open(p + "/_txlog/00000000.json"))["files"])
    inodes = {f: os.stat(f).st_ino for f in v0_files}

    v2 = delete_where(spark, p, F.col("o_orderkey") >= 1000)
    m2 = json.load(open(p + "/_txlog/%08d.json" % v2))
    # only batch-2 files were rewritten
    assert set(m2["rewritten"]) == set(m1["files"]) - v0_files
    for f in v0_files:
        assert f in m2["files"] and os.stat(f).st_ino == inodes[f]
    got = read_table(spark, p)
    assert got.count() == orders.where(F.col("o_orderkey") < 1000).count()
    assert got.where(F.col("o_orderkey") >= 1000).count() == 0
    # and time travel still reads the pre-delete table
    assert read_table(spark, p, version=1).count() == orders.count()


def test_delete_where_no_match_is_metadata_only(spark, orders, tmp_path):
    p = str(tmp_path / "t")
    create_table(spark, p, orders)
    v1 = delete_where(spark, p, F.col("o_orderkey") < 0)
    m0 = json.load(open(p + "/_txlog/00000000.json"))
    m1 = json.load(open(p + "/_txlog/%08d.json" % v1))
    assert m1["files"] == m0["files"]
    assert m1["rewritten"] == []


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
    m0_files = json.load(open(p + "/_txlog/00000000.json"))["files"]
    m1_files = set(json.load(open(p + "/_txlog/00000001.json"))["files"])
    dead = [f for f in m0_files if f not in m1_files]
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
    n_files_pre = json.load(open(p + "/_txlog/%08d.json" % pre_v))["files"]
    assert len(n_files_pre) >= 10
    n_rows = read_table(spark, p).count()

    v = compact_files(spark, p, target_files=4)
    m = json.load(open(p + "/_txlog/%08d.json" % v))
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
    victim = json.load(open(p + "/_txlog/00000000.json"))["files"][0]
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
    v0_files = set(json.load(open(p + "/_txlog/00000000.json"))["files"])
    inodes = {f: os.stat(f).st_ino for f in v0_files}

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
    m = json.load(open(p + "/_txlog/%08d.json" % v))
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
        assert os.stat(f).st_ino == inodes[f]
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
