"""TIMESTAMP AS OF time travel (wave 101, sources/txlog.py — the
Delta/Iceberg contract): every commit stamps its wall-time in the
manifest; ``version_at_timestamp`` resolves a moment to the LATEST
version committed at or before it, and ``read_table(timestamp=...)``
reads that state. Version-based travel is unchanged."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from vector_knowledge_base_spark.sources.txlog import (
    _read_manifest,
    append_table,
    create_table,
    read_table,
    table_versions,
    version_at_timestamp,
)


def _row(spark, k):
    return spark.createDataFrame([(k,)], "k long")


def test_timestamp_as_of_resolves_between_commits(spark, tmp_path):
    tbl = str(tmp_path / "t")
    create_table(spark, tbl, _row(spark, 0))
    t_after_v0 = time.time()
    time.sleep(0.05)
    append_table(spark, tbl, _row(spark, 1))
    t_after_v1 = time.time()
    time.sleep(0.05)
    append_table(spark, tbl, _row(spark, 2))

    assert version_at_timestamp(tbl, t_after_v0) == 0
    assert version_at_timestamp(tbl, t_after_v1) == 1
    assert version_at_timestamp(tbl, time.time()) == 2
    assert read_table(spark, tbl, timestamp=t_after_v0).count() == 1
    assert read_table(spark, tbl, timestamp=t_after_v1).count() == 2
    assert read_table(spark, tbl).count() == 3
    # the commit time itself resolves to that commit (<=, not <)
    ts0 = _read_manifest(tbl, 0)["ts"]
    assert version_at_timestamp(tbl, ts0) == 0


def test_timestamp_before_table_refused(spark, tmp_path):
    tbl = str(tmp_path / "t")
    create_table(spark, tbl, _row(spark, 0))
    ts0 = _read_manifest(tbl, 0)["ts"]
    with pytest.raises(RuntimeError, match="predates"):
        version_at_timestamp(tbl, ts0 - 10.0)
    with pytest.raises(ValueError, match="version OR timestamp"):
        read_table(spark, tbl, version=0, timestamp=ts0)


def test_history_exposes_commit_times_monotone(spark, tmp_path):
    tbl = str(tmp_path / "t")
    create_table(spark, tbl, _row(spark, 0))
    append_table(spark, tbl, _row(spark, 1))
    hist = table_versions(spark, tbl).orderBy("version").collect()
    assert [r["version"] for r in hist] == [0, 1]
    assert all(r["ts"] is not None for r in hist)
    assert hist[0]["ts"] <= hist[1]["ts"]


def test_pre_ts_manifests_still_resolve(spark, tmp_path):
    """Manifests written before the ts field existed (or hand-edited
    away) sort as version order: a missing ts never blocks resolution
    of LATER stamped commits."""
    import json
    import os

    tbl = str(tmp_path / "t")
    create_table(spark, tbl, _row(spark, 0))
    mf = os.path.join(tbl, "_txlog", "00000000.json")
    with open(mf) as fh:
        m = json.load(fh)
    m.pop("ts", None)
    with open(mf, "w") as fh:
        json.dump(m, fh)
    append_table(spark, tbl, _row(spark, 1))
    assert table_versions(spark, tbl).where(F.col("ts").isNull()).count() == 1
    assert version_at_timestamp(tbl, time.time()) == 1
    ts1 = _read_manifest(tbl, 1)["ts"]
    # a moment before v1's stamp falls through to the unstamped v0
    assert version_at_timestamp(tbl, ts1 - 0.001) == 0


def test_commit_ts_clamped_monotone_under_clock_skew(spark, tmp_path, monkeypatch):
    """REGRESSION (r11, ADVICE): commit ts is wall-clock; under
    multi-writer clock skew a LATER version could stamp EARLIER than
    its parent (v1 ts=100, v2 ts=90), and version_at_timestamp — which
    stops at the first manifest stamped past the target — would
    resolve ts=95 to v0, skipping v2 entirely. The Delta fix, pinned
    here: _commit clamps ts to max(parent_ts, now), so stamps are
    monotone non-decreasing and resolution is well-defined."""
    import vector_knowledge_base_spark.sources.txlog as tx

    tbl = str(tmp_path / "t")
    create_table(spark, tbl, _row(spark, 0))
    ts0 = _read_manifest(tbl, 0)["ts"]
    # a skewed writer whose clock reads BEFORE the parent's stamp
    monkeypatch.setattr(tx.time, "time", lambda: ts0 - 50.0)
    append_table(spark, tbl, _row(spark, 1))
    monkeypatch.undo()
    ts1 = _read_manifest(tbl, 1)["ts"]
    assert ts1 >= ts0  # clamped, not the skewed clock's raw reading
    # resolution: at-or-after both stamps → latest version, always
    assert version_at_timestamp(tbl, ts1) == 1
    with pytest.raises(RuntimeError, match="predates"):
        version_at_timestamp(tbl, ts0 - 60.0)
