"""Incrementally-maintained materialized views (sources/matview.py):
every refresh mode must be indistinguishable from a full recompute of
the view query over the current base snapshot."""

import os
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from vector_knowledge_base_spark.sources import txlog
from vector_knowledge_base_spark.sources.matview import (
    create_matview,
    matview_info,
    read_matview,
    refresh_matview,
)

@pytest.fixture()
def tdir():
    d = f"/tmp/mv_test_{uuid.uuid4().hex[:10]}"
    os.makedirs(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _rows(df, keys):
    return sorted(
        (tuple(r[k] for k in keys), tuple(v for k, v in r.asDict().items() if k not in keys))
        for r in df.collect()
    )


def _full(spark, base_path, keys, agg_cols):
    return txlog.read_table(spark, base_path).groupBy(*keys).agg(*agg_cols)


AGGS = [("sum", "v"), ("count", "*"), ("count", "v")]
AGG_COLS = lambda: [  # noqa: E731
    F.sum("v").alias("sum_v"),
    F.count(F.lit(1)).cast("long").alias("count_star"),
    F.count("v").cast("long").alias("count_v"),
]


def _mk(spark, tdir, rows):
    base = os.path.join(tdir, "base")
    df = spark.createDataFrame(rows, "k string, id long, v double")
    txlog.create_table(spark, base, df)
    return base


def test_create_equals_direct_aggregate(spark, tdir):
    base = _mk(spark, tdir, [("a", 1, 1.0), ("a", 2, 2.0), ("b", 3, 5.0)])
    mv = os.path.join(tdir, "mv")
    create_matview(spark, mv, base, ["k"], AGGS)
    got = _rows(read_matview(spark, mv), ["k"])
    want = _rows(_full(spark, base, ["k"], AGG_COLS()), ["k"])
    assert got == want
    assert matview_info(mv)["base_version"] == 0


def test_delta_refresh_after_append_and_delete(spark, tdir):
    base = _mk(spark, tdir, [(c, i, float(i)) for i, c in enumerate("aabbcc")])
    mv = os.path.join(tdir, "mv")
    create_matview(spark, mv, base, ["k"], AGGS)
    txlog.append_table(
        spark, base,
        spark.createDataFrame([("a", 10, 7.0), ("d", 11, 9.0)],
                              "k string, id long, v double"),
    )
    info = refresh_matview(spark, mv)
    assert info["mode"] == "delta" and (info["from"], info["to"]) == (0, 1)
    txlog.delete_where(spark, base, filters={"k": "b"})
    info = refresh_matview(spark, mv)
    assert info["mode"] == "delta"
    got = _rows(read_matview(spark, mv), ["k"])
    want = _rows(_full(spark, base, ["k"], AGG_COLS()), ["k"])
    assert got == want
    # group 'b' must have VANISHED, not linger at count 0
    assert not any(k == ("b",) for k, _ in got)


def test_noop_refresh(spark, tdir):
    base = _mk(spark, tdir, [("a", 1, 1.0)])
    mv = os.path.join(tdir, "mv")
    create_matview(spark, mv, base, ["k"], AGGS)
    assert refresh_matview(spark, mv)["mode"] == "noop"


def test_sum_returns_to_null_when_last_nonnull_deleted(spark, tdir):
    base = os.path.join(tdir, "base")
    df = spark.createDataFrame(
        [("a", 1, 3.0), ("a", 2, None), ("a", 3, None)],
        "k string, id long, v double",
    )
    txlog.create_table(spark, base, df)
    mv = os.path.join(tdir, "mv")
    create_matview(spark, mv, base, ["k"], AGGS)
    txlog.delete_where(spark, base, filters={"id": 1})
    assert refresh_matview(spark, mv)["mode"] == "delta"
    row = read_matview(spark, mv).collect()[0]
    assert row["sum_v"] is None  # NOT 0.0
    assert row["count_star"] == 2 and row["count_v"] == 0
    want = _rows(_full(spark, base, ["k"], AGG_COLS()), ["k"])
    assert _rows(read_matview(spark, mv), ["k"]) == want


def test_minmax_rescan_after_extremum_delete(spark, tdir):
    base = _mk(spark, tdir, [("a", 1, 1.0), ("a", 2, 9.0), ("b", 3, 5.0)])
    mv = os.path.join(tdir, "mv")
    aggs = [("min", "v"), ("max", "v"), ("count", "*")]
    create_matview(spark, mv, base, ["k"], aggs)
    txlog.delete_where(spark, base, filters={"id": 2})  # removes a's max
    info = refresh_matview(spark, mv)
    assert info["mode"] == "rescan"
    got = {r["k"]: (r["min_v"], r["max_v"], r["count_star"])
           for r in read_matview(spark, mv).collect()}
    assert got == {"a": (1.0, 1.0, 1), "b": (5.0, 5.0, 1)}


def test_refresh_after_merge_and_replace_where(spark, tdir):
    base = _mk(spark, tdir, [(c, i, float(i)) for i, c in enumerate("aabbcc")])
    mv = os.path.join(tdir, "mv")
    create_matview(spark, mv, base, ["k"], AGGS)
    # CoW MERGE: update one row, insert one
    txlog.merge_table(
        spark, base,
        spark.createDataFrame([("a", 0, 100.0), ("e", 20, 2.0)],
                              "k string, id long, v double"),
        key_cols=["id"],
    )
    refresh_matview(spark, mv)
    # predicate-scoped overwrite of k='c'
    txlog.replace_where(
        spark, base, {"k": "c"},
        spark.createDataFrame([("c", 30, 1.5)], "k string, id long, v double"),
    )
    refresh_matview(spark, mv)
    got = _rows(read_matview(spark, mv), ["k"])
    want = _rows(_full(spark, base, ["k"], AGG_COLS()), ["k"])
    assert got == want


def test_definition_survives_reopen_and_plain_table_rejected(spark, tdir):
    base = _mk(spark, tdir, [("a", 1, 1.0)])
    mv = os.path.join(tdir, "mv")
    create_matview(spark, mv, base, ["k"], [("sum", "v"), ("count", "*")])
    info = matview_info(mv)  # re-read from disk, no in-memory state
    assert info["base_path"] == base
    assert info["aggs"] == [["sum", "v"], ["count", "*"]]
    with pytest.raises(RuntimeError, match="plain table"):
        matview_info(base)
    with pytest.raises(RuntimeError, match="already exists"):
        create_matview(spark, mv, base, ["k"], [("count", "*")])


def test_vacuumed_watermark_raises_named_error(spark, tdir):
    base = _mk(spark, tdir, [("a", 1, 1.0)])
    mv = os.path.join(tdir, "mv")
    create_matview(spark, mv, base, ["k"], [("count", "*")])
    for i in range(3):
        txlog.append_table(
            spark, base,
            spark.createDataFrame([("a", 10 + i, 1.0)],
                                  "k string, id long, v double"),
        )
    txlog.compact_log(spark, base, keep_versions=1, orphan_grace_s=1e9)
    with pytest.raises(RuntimeError, match="vacuumed"):
        refresh_matview(spark, mv)


def test_multi_key_and_unsupported_fn(spark, tdir):
    base = os.path.join(tdir, "base")
    df = spark.createDataFrame(
        [("a", "x", 1, 1.0), ("a", "y", 2, 2.0), ("b", "x", 3, 3.0)],
        "k string, g string, id long, v double",
    )
    txlog.create_table(spark, base, df)
    mv = os.path.join(tdir, "mv")
    create_matview(spark, mv, base, ["k", "g"], [("sum", "v"), ("count", "*")])
    txlog.append_table(
        spark, base,
        spark.createDataFrame([("b", "y", 9, 4.0)],
                              "k string, g string, id long, v double"),
    )
    refresh_matview(spark, mv)
    want = _rows(
        _full(spark, base, ["k", "g"],
              [F.sum("v").alias("sum_v"),
               F.count(F.lit(1)).cast("long").alias("count_star")]),
        ["k", "g"],
    )
    assert _rows(read_matview(spark, mv), ["k", "g"]) == want
    with pytest.raises(ValueError, match="unsupported"):
        create_matview(spark, os.path.join(tdir, "mv2"), base, ["k"],
                       [("median", "v")])
    with pytest.raises(ValueError, match="not a thing"):
        create_matview(spark, os.path.join(tdir, "mv3"), base, ["k"],
                       [("sum", "*")])


def test_compaction_is_invisible_to_delta_refresh(spark, tdir):
    """Base-table COMPACTION (file rewrite, identical rows) must leave
    the view untouched: table_diff's multiset except cancels rewritten
    rows, so the delta fold sees an empty CDC — the refresh advances
    the watermark without changing state."""
    base = _mk(spark, tdir, [(c, i, float(i)) for i, c in enumerate("aabbcc")])
    mv = os.path.join(tdir, "mv")
    create_matview(spark, mv, base, ["k"], AGGS)
    before = _rows(read_matview(spark, mv), ["k"])
    txlog.compact_files(spark, base, target_files=1)
    info = refresh_matview(spark, mv)
    assert info["mode"] == "delta"
    assert matview_info(mv)["base_version"] == 1
    assert _rows(read_matview(spark, mv), ["k"]) == before


def test_refresh_spanning_many_versions_in_one_hop(spark, tdir):
    """A stale view catches up across N base commits with ONE refresh
    (the CDC is computed endpoint-to-endpoint, not per version)."""
    base = _mk(spark, tdir, [("a", 1, 1.0)])
    mv = os.path.join(tdir, "mv")
    create_matview(spark, mv, base, ["k"], AGGS)
    for i in range(4):
        txlog.append_table(
            spark, base,
            spark.createDataFrame([(chr(97 + i % 2), 10 + i, float(i))],
                                  "k string, id long, v double"),
        )
    txlog.delete_where(spark, base, filters={"id": 1})
    info = refresh_matview(spark, mv)
    assert info["mode"] == "delta" and (info["from"], info["to"]) == (0, 5)
    want = _rows(_full(spark, base, ["k"], AGG_COLS()), ["k"])
    assert _rows(read_matview(spark, mv), ["k"]) == want


def test_streaming_sink_keeps_view_fresh(spark, tdir):
    """txlog_mv_foreach_batch: after an availableNow run over a file
    stream, the view must equal a from-scratch aggregate of the table
    every micro-batch committed — the streaming summary-table shape."""
    from vector_knowledge_base_spark.streaming.txsink import (
        txlog_mv_foreach_batch,
    )

    src = os.path.join(tdir, "src")
    os.makedirs(src)
    for i in range(3):
        spark.createDataFrame(
            [(chr(97 + j % 2), i * 10 + j, float(j)) for j in range(4)],
            "k string, id long, v double",
        ).coalesce(1).write.mode("append").parquet(src)
    base = os.path.join(tdir, "base")
    mv = os.path.join(tdir, "mv")
    # seed the table + view from the first slice so the stream has a
    # view to maintain (a view over a not-yet-created table is the
    # caller's ordering bug, same contract as dedup_ingest)
    seed = spark.createDataFrame([("a", 900, 5.0)], "k string, id long, v double")
    txlog.create_table(spark, base, seed)
    create_matview(spark, mv, base, ["k"], AGGS)
    stream = (
        spark.readStream.schema("k string, id long, v double").parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(txlog_mv_foreach_batch(base, [mv]))
        .option("checkpointLocation", os.path.join(tdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert matview_info(mv)["base_version"] == txlog._list_versions(base)[-1]
    want = _rows(_full(spark, base, ["k"], AGG_COLS()), ["k"])
    assert _rows(read_matview(spark, mv), ["k"]) == want


def test_delta_refresh_across_restore_commit(spark, tdir):
    """RESTORE is a pure file-list commit; table_diff across it is the
    inverse of the undone changes, so the signed-fold delta refresh
    must roll the view state back too — stale-never-wrong composes
    with rollback."""
    base = _mk(spark, tdir, [("a", 1, 1.0), ("a", 2, 2.0), ("b", 3, 5.0)])
    mv = os.path.join(tdir, "mv")
    create_matview(spark, mv, base, ["k"], AGGS)
    df2 = spark.createDataFrame([("b", 4, 7.0), ("c", 5, 9.0)], "k string, id long, v double")
    txlog.append_table(spark, base, df2)
    info = refresh_matview(spark, mv)
    assert info["mode"] == "delta"
    txlog.restore_table(spark, base, 0)
    info = refresh_matview(spark, mv)
    assert info["mode"] == "delta"
    got = _rows(read_matview(spark, mv), ["k"])
    want = _rows(_full(spark, base, ["k"], AGG_COLS()), ["k"])
    assert got == want  # the 'c' group vanished, 'b' rolled back
    assert [t[0] for t in got] == [("a",), ("b",)]


def _nrows(df, keys):
    """Like _rows but NULL-key tolerant: sort on (is-null, value) per
    key so None never compares against str."""
    out = [
        (
            tuple(r[k] for k in keys),
            tuple(v for k, v in r.asDict().items() if k not in keys),
        )
        for r in df.collect()
    ]
    return sorted(
        out, key=lambda p: tuple((x is None, x) for x in p[0])
    )


def test_null_group_key_survives_delta_refresh(spark, tdir):
    """ADVICE r6: NULL group keys must merge NULL-SAFELY — with plain
    equality the NULL group duplicates into two rows on delta refresh.
    Pin: after churn ON the NULL group, the view equals a full
    recompute (one NULL row, right totals)."""
    base = os.path.join(tdir, "base")
    txlog.create_table(
        spark,
        base,
        spark.createDataFrame(
            [(None, 1, 1.0), (None, 2, 2.0), ("a", 3, 3.0)],
            "k string, id long, v double",
        ),
    )
    mv = os.path.join(tdir, "mv")
    create_matview(spark, mv, base, ["k"], AGGS)
    txlog.append_table(
        spark,
        base,
        spark.createDataFrame(
            [(None, 4, 10.0), ("b", 5, 5.0)], "k string, id long, v double"
        ),
    )
    txlog.delete_where(spark, base, F.col("id") == 1)
    assert refresh_matview(spark, mv)["mode"] == "delta"
    got = _nrows(read_matview(spark, mv), ["k"])
    want = _nrows(_full(spark, base, ["k"], AGG_COLS()), ["k"])
    assert got == want
    assert sum(1 for kt, _ in got if kt == (None,)) == 1  # no dup NULL row


def test_null_group_key_survives_rescan_refresh(spark, tdir):
    """Same NULL-key pin for the min/max rescan path: with null-unsafe
    semi/anti joins the NULL group goes permanently stale."""
    base = os.path.join(tdir, "base")
    txlog.create_table(
        spark,
        base,
        spark.createDataFrame(
            [(None, 1, 9.0), (None, 2, 2.0), ("a", 3, 3.0)],
            "k string, id long, v double",
        ),
    )
    mv = os.path.join(tdir, "mv")
    create_matview(spark, mv, base, ["k"], [("min", "v"), ("max", "v")])
    txlog.delete_where(spark, base, F.col("id") == 1)  # NULL group's max
    assert refresh_matview(spark, mv)["mode"] == "rescan"
    got = _nrows(read_matview(spark, mv), ["k"])
    want = _nrows(
        _full(
            spark,
            base,
            ["k"],
            [F.min("v").alias("min_v"), F.max("v").alias("max_v")],
        ),
        ["k"],
    )
    assert got == want  # NULL group now (2.0, 2.0), not stale (2.0, 9.0)


def test_avg_served_from_sum_and_nn_counter(spark, tdir):
    """avg is pure plumbing over sum + the hidden non-null counter:
    incrementally maintained through append and delete, NULL when the
    last non-null value is deleted, coexists with an explicit sum."""
    base = os.path.join(tdir, "base")
    txlog.create_table(
        spark,
        base,
        spark.createDataFrame(
            [("a", 1, 2.0), ("a", 2, 4.0), ("b", 3, None), ("b", 4, 6.0)],
            "k string, id long, v double",
        ),
    )
    mv = os.path.join(tdir, "mv")
    create_matview(
        spark, mv, base, ["k"], [("avg", "v"), ("sum", "v"), ("count", "*")]
    )
    cols = read_matview(spark, mv).columns
    assert cols == ["k", "avg_v", "sum_v", "count_star"]
    txlog.append_table(
        spark,
        base,
        spark.createDataFrame([("a", 5, 6.0)], "k string, id long, v double"),
    )
    # deleting b's only non-null v → avg_v and sum_v return to NULL
    txlog.delete_where(spark, base, F.col("id") == 4)
    assert refresh_matview(spark, mv)["mode"] == "delta"
    got = _nrows(read_matview(spark, mv), ["k"])
    want = _nrows(
        _full(
            spark,
            base,
            ["k"],
            [
                F.avg("v").alias("avg_v"),
                F.sum("v").alias("sum_v"),
                F.count(F.lit(1)).cast("long").alias("count_star"),
            ],
        ),
        ["k"],
    )
    assert got == want
    by_k = dict(got)
    assert by_k[("a",)][0] == 4.0  # (2+4+6)/3
    assert by_k[("b",)][0] is None and by_k[("b",)][1] is None


def test_rollup_view_incremental_equals_full_recompute(spark, tdir):
    """A rollup view maintains EVERY grouping set in one state table
    (disambiguated by gid) and stays delta-maintainable: after append
    + delete, each grouping set — including the grand total — equals
    the full rollup recompute. NULL-safe merging is load-bearing here:
    rollup totals carry NULL key values by construction."""
    base = os.path.join(tdir, "base")
    txlog.create_table(
        spark,
        base,
        spark.createDataFrame(
            [("a", "x", 1, 1.0), ("a", "y", 2, 2.0), ("b", "x", 3, 4.0)],
            "k string, g string, id long, v double",
        ),
    )
    mv = os.path.join(tdir, "mv")
    create_matview(
        spark,
        mv,
        base,
        ["k", "g"],
        [("sum", "v"), ("count", "*"), ("avg", "v")],
        grouping="rollup",
    )
    txlog.append_table(
        spark,
        base,
        spark.createDataFrame(
            [("b", "y", 4, 8.0), ("a", "x", 5, 16.0)],
            "k string, g string, id long, v double",
        ),
    )
    txlog.delete_where(spark, base, F.col("id") == 2)
    assert refresh_matview(spark, mv)["mode"] == "delta"
    served = read_matview(spark, mv)
    assert served.columns == ["k", "g", "gid", "sum_v", "count_star", "avg_v"]
    want_df = (
        txlog.read_table(spark, base)
        .rollup("k", "g")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.sum("v").alias("sum_v"),
            F.count(F.lit(1)).cast("long").alias("count_star"),
            F.avg("v").alias("avg_v"),
        )
        .select("k", "g", "gid", "sum_v", "count_star", "avg_v")
    )
    assert _nrows(served, ["k", "g", "gid"]) == _nrows(
        want_df, ["k", "g", "gid"]
    )
    # the grand total row exists exactly once and is right
    totals = [p for p in _nrows(served, ["k", "g", "gid"]) if p[0][2] == 3]
    assert len(totals) == 1 and totals[0][1][0] == 29.0  # 1+4+8+16


def test_cube_view_and_minmax_grouping_rejected(spark, tdir):
    base = os.path.join(tdir, "base")
    txlog.create_table(
        spark,
        base,
        spark.createDataFrame(
            [("a", "x", 1, 1.0), ("b", "y", 2, 2.0)],
            "k string, g string, id long, v double",
        ),
    )
    mv = os.path.join(tdir, "mv")
    create_matview(
        spark, mv, base, ["k", "g"], [("count", "*")], grouping="cube"
    )
    txlog.append_table(
        spark,
        base,
        spark.createDataFrame(
            [("a", "y", 3, 3.0)], "k string, g string, id long, v double"
        ),
    )
    refresh_matview(spark, mv)
    want = (
        txlog.read_table(spark, base)
        .cube("k", "g")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).cast("long").alias("count_star"),
        )
        .select("k", "g", "gid", "count_star")
    )
    assert _nrows(read_matview(spark, mv), ["k", "g", "gid"]) == _nrows(
        want, ["k", "g", "gid"]
    )
    with pytest.raises(ValueError, match="invertible"):
        create_matview(
            spark,
            os.path.join(tdir, "mv2"),
            base,
            ["k"],
            [("min", "v")],
            grouping="rollup",
        )
    with pytest.raises(ValueError, match="grouping"):
        create_matview(
            spark,
            os.path.join(tdir, "mv3"),
            base,
            ["k"],
            [("count", "*")],
            grouping="sets",
        )


def test_concurrent_refreshes_recompute_on_lost_cas(spark, tdir):
    """ADVICE r6: a refresh that loses the CAS race must re-read the
    winner's watermark and recompute — never re-commit stale state at
    a later version. Pin the invariants under real contention: the
    final state equals a full recompute, and the maintained
    base_version never DECREASES across mv versions."""
    import threading

    base = os.path.join(tdir, "base")
    txlog.create_table(
        spark,
        base,
        spark.createDataFrame([("a", 1, 1.0)], "k string, id long, v double"),
    )
    mv = os.path.join(tdir, "mv")
    create_matview(spark, mv, base, ["k"], AGGS)
    errs = []

    def _churn(i):
        try:
            txlog.append_table(
                spark,
                base,
                spark.createDataFrame(
                    [("a", 10 + i, float(i)), ("b", 20 + i, 2.0 * i)],
                    "k string, id long, v double",
                ),
            )
            refresh_matview(spark, mv)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=_churn, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    refresh_matview(spark, mv)  # settle to the final base version
    assert matview_info(mv)["base_version"] == txlog._list_versions(base)[-1]
    got = _nrows(read_matview(spark, mv), ["k"])
    want = _nrows(_full(spark, base, ["k"], AGG_COLS()), ["k"])
    assert got == want
    # base_version monotone across the mv's own history
    vs = txlog._list_versions(mv)
    watermarks = [
        txlog._read_manifest(mv, v)["mv"]["base_version"] for v in vs
    ]
    assert watermarks == sorted(watermarks)


def test_matview_follows_base_column_rename(spark, tdir):
    """r9: views resolve their definition through PHYSICAL identity
    (the base's colmap), so ALTER TABLE RENAME COLUMN on the base is
    transparent to refresh in BOTH modes — and the view's OUTPUT
    schema keeps its creation-time names (SQL view semantics)."""
    base, mv, mv2 = f"{tdir}/b", f"{tdir}/mv", f"{tdir}/mv2"
    txlog.create_table(
        spark,
        base,
        spark.createDataFrame([("x", 1), ("y", 2)], "g string, v long"),
    )
    create_matview(spark, mv, base, ["g"], [("sum", "v")])
    txlog.rename_column(spark, base, "v", "w")
    txlog.append_table(
        spark, base, spark.createDataFrame([("x", 5)], "g string, w long")
    )
    r = refresh_matview(spark, mv)
    assert r["mode"] == "delta"
    got = {
        (row["g"], row["sum_v"]) for row in read_matview(spark, mv).collect()
    }
    assert got == {("x", 6), ("y", 2)}  # defn name sum_v, renamed data in
    # rescan mode (min/max), view created on the ALREADY-renamed base,
    # then renamed AGAIN — physical identity chains through
    create_matview(spark, mv2, base, ["g"], [("max", "w")])
    txlog.rename_column(spark, base, "w", "z")
    txlog.append_table(
        spark, base, spark.createDataFrame([("y", 9)], "g string, z long")
    )
    r2 = refresh_matview(spark, mv2)
    assert r2["mode"] == "rescan"
    got = {
        (row["g"], row["max_w"])
        for row in read_matview(spark, mv2).collect()
    }
    assert got == {("x", 5), ("y", 9)}


def test_matview_refuses_refresh_after_base_column_drop(spark, tdir):
    """r9: a definition column whose physical identity is gone (drop,
    or drop + re-add under a fresh physical name) refuses refresh with
    a named error — the aggregate history is unmaintainable; silent
    null-folding would serve wrong sums forever."""
    base, mv = f"{tdir}/b", f"{tdir}/mv"
    txlog.create_table(
        spark,
        base,
        spark.createDataFrame([("x", 1, 2)], "g string, a long, b long"),
    )
    create_matview(spark, mv, base, ["g"], [("sum", "a")])
    txlog.drop_column(spark, base, "a")
    txlog.append_table(
        spark, base, spark.createDataFrame([("x", 7)], "g string, b long")
    )
    with pytest.raises(RuntimeError, match="dropped"):
        refresh_matview(spark, mv)
    # drop + merge_schema re-add of the same name: STILL refused (the
    # re-added column is a different physical column)
    txlog.append_table(
        spark,
        base,
        spark.createDataFrame([("x", 8, 1)], "g string, b long, a long"),
        merge_schema=True,
    )
    with pytest.raises(RuntimeError, match="dropped"):
        refresh_matview(spark, mv)
