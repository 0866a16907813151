"""Streaming SOURCE over a txlog table: tail the manifest log as a
structured stream (``format("txlog_stream")``) — the missing half of
the exactly-once loop. ``streaming/txsink.py`` writes streams INTO the
log; this module reads the log AS a stream, so txlog tables compose
into multi-hop pipelines (bronze→silver→gold) with exactly-once on
both sides — the public Delta-Lake streaming-source idea, built on the
Spark 4 Python DataSource API.

Reference parity: the reference has no change feed at all — consumers
poll collections (backend/document_registry.py listings). A log-backed
table gives tailing for free: OFFSETS ARE LOG VERSIONS ({"version": V}
= every commit ≤ V consumed). Offset planning is pure metadata (a
manifest diff — no data read on the driver), and data files are
immutable, so any offset range replays byte-identically: exactly the
determinism the engine's checkpoint-recovery contract requires.
Partitions are the files ADDED per version, read on EXECUTORS (one
task per file).

Contract: APPEND-ONLY tailing. A non-append commit that changed the
file set AT ALL (delete / merge / compact / rewrite / restore —
whether it added rewritten files or only removed files) raises unless
``ignore_changes=true``, which re-emits any rewritten files' rows and
silently skips pure removals (Delta's documented ignoreChanges
semantics — deduplicate downstream on a key). Versions vacuumed by
``compact_log`` cannot replay; keep the retention window longer than
the longest consumer lag (same trade as Delta).

Backlog admission control (``max_versions_per_trigger``, like Delta's
maxFilesPerTrigger): a consumer restarting after long downtime must
not replan the whole backlog as ONE micro-batch — at 100 TB that is
an OOM/latency cliff. With the cap set, ``latestOffset`` advances at
most N versions past the planning floor per trigger, so catch-up
splits into bounded micro-batches. The floor recovers three ways,
most-defensive first: (1) with ``consumer_id`` set it is persisted to
a sidecar under ``_txlog/_consumers/`` at every commit (survives any
engine call order); (2) on restart Spark 4.1 re-plans the committed
batch via ``partitions(committed, committed)`` BEFORE its first
``latestOffset`` call (verified empirically for both processingTime
and availableNow triggers); (3) a fresh query knows it from
``start_version``. ``latestOffset`` is additionally clamped to never
regress below the floor, so a capped offset can never rewind the
checkpoint (no duplicate replay). Note:
``Trigger.AvailableNow`` falls back to single-batch execution for
Python sources, so with a cap it drains at most N versions per RUN —
loop runs (or use a processingTime trigger) to drain a backlog.

Scale notes: read() hands Spark Arrow RecordBatches (the logged Spark
schema fixes the Arrow types; pre-evolution files null-fill, columns
cast to declared types) — zero per-row Python conversion; a row-tuple
fallback covers exotic types Arrow conversion rejects. Per-microbatch
work ∝ newly-added files, never table size, and the driver touches
only manifests.
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from vector_knowledge_base_spark.sources.txlog import (
    _entry,
    _list_versions,
    _manifest_file,
    _partition_types,
    _pval_matches,
    _read_manifest,
    _resolve,
)

_APPEND_OPS = {"create", "append"}


def _consumer_file(path: str, consumer_id: str) -> str:
    """Sidecar recording a capped consumer's committed planning floor
    (advisory — see ``consumer_id`` option). The id is restricted to a
    safe charset so it can never escape ``_txlog/_consumers/``."""
    import re

    if not re.fullmatch(r"[A-Za-z0-9._-]{1,128}", consumer_id):
        raise ValueError(
            f"txlog_stream: consumer_id {consumer_id!r} must match "
            "[A-Za-z0-9._-]{1,128}"
        )
    return os.path.join(path, "_txlog", "_consumers", f"{consumer_id}.json")


def _load_consumer_floor(path: str, consumer_id: str) -> int | None:
    import json as _json

    f = _consumer_file(path, consumer_id)
    try:
        with open(f) as fh:
            return int(_json.load(fh)["floor"])
    except (OSError, ValueError, KeyError, TypeError):
        return None


def _save_consumer_floor(path: str, consumer_id: str, floor: int) -> None:
    """Atomic (tmp+rename) and monotone: never lowers a recorded
    floor, so a lagging writer cannot shrink a peer's recovery. The
    read-compare-write runs under an flock on a sibling lock file so
    two processes sharing a consumer_id cannot interleave a TOCTOU
    regression (ADVICE r8 low); the sidecar stays advisory — a lost
    lock (non-POSIX fs) degrades to the old last-writer-wins."""
    import json as _json

    f = _consumer_file(path, consumer_id)
    os.makedirs(os.path.dirname(f), exist_ok=True)
    lockpath = f + ".lock"
    lock_fh = None
    try:
        try:
            import fcntl

            lock_fh = open(lockpath, "a")
            fcntl.flock(lock_fh.fileno(), fcntl.LOCK_EX)
        except (ImportError, OSError):
            lock_fh = None
        prev = _load_consumer_floor(path, consumer_id)
        if prev is not None and prev >= floor:
            return
        tmp = f + ".tmp"
        with open(tmp, "w") as fh:
            _json.dump({"floor": floor}, fh)
        os.replace(tmp, f)
    finally:
        if lock_fh is not None:
            lock_fh.close()


def _reset_consumer_floor(path: str, consumer_id: str, floor: int) -> None:
    """NON-monotone sidecar write for the fresh-checkpoint path (r9
    ADVICE low): ``initialOffset`` resets the in-memory floor for a
    from-scratch reprocess, but the monotone save would keep the dead
    query's higher floor on disk — so the reprocessing query's FIRST
    RESTART would re-adopt the stale floor and silently disable the
    catch-up cap. A fresh checkpoint is an explicit new consumer
    epoch; rewind the persisted floor with it (same flock, same
    atomic tmp+rename)."""
    import json as _json

    f = _consumer_file(path, consumer_id)
    os.makedirs(os.path.dirname(f), exist_ok=True)
    lockpath = f + ".lock"
    lock_fh = None
    try:
        try:
            import fcntl

            lock_fh = open(lockpath, "a")
            fcntl.flock(lock_fh.fileno(), fcntl.LOCK_EX)
        except (ImportError, OSError):
            lock_fh = None
        tmp = f + ".tmp"
        with open(tmp, "w") as fh:
            _json.dump({"floor": floor}, fh)
        os.replace(tmp, f)
    finally:
        if lock_fh is not None:
            lock_fh.close()


class _AddedFilePartition(InputPartition):
    def __init__(
        self,
        file: str | None,
        columns: list[str],
        schema_json: str = "",
        colmap_json: str = "",
    ):
        self.file = file
        self.columns = columns
        self.schema_json = schema_json
        # the reader's registration-time column mapping (logical name
        # -> physical parquet name), shared by every partition — the
        # logical schema is the latest manifest's, so its colmap is
        # the one that resolves it (r9; physical names are immutable)
        self.colmap_json = colmap_json


def _added_files(path: str, version: int) -> tuple[dict, list[str], bool]:
    """(manifest, files added by ``version``, anything-hidden flag) —
    the file-level commit delta, resolved to absolute paths. version 0
    adds everything. The flag matters for the append-only guard: a
    delete that removes whole files with no rewritten survivors, or a
    deletion-vector commit that hides rows without touching the file
    set, still changes what downstream sees."""
    if not os.path.exists(_manifest_file(path, version)) or (
        version > 0 and not os.path.exists(_manifest_file(path, version - 1))
    ):
        raise ValueError(
            f"txlog_stream: the manifests needed to plan version "
            f"{version}'s commit delta were vacuumed — keep the "
            "compact_log retention window longer than consumer lag"
        )
    m = _read_manifest(path, version)
    if version == 0:
        return m, [_resolve(path, e) for e in m["files"]], False
    prev_m = _read_manifest(path, version - 1)
    prev = set(prev_m["files"])
    cur = set(m["files"])
    added = [_resolve(path, e) for e in m["files"] if e not in prev]
    # a deletion-vector change hides rows WITHOUT touching the file
    # set — downstream consumers must treat it like any other
    # non-append change (raise, or skip under ignore_changes)
    dv_changed = (prev_m.get("dv") or {}) != (m.get("dv") or {})
    return m, added, bool(prev - cur) or dv_changed


class TxlogStreamDataSource(DataSource):
    """``spark.readStream.format("txlog_stream").option("path", p)
    .load()`` — requires ``spark.dataSource.register`` first (or use
    the ``stream_txlog_table`` helper). Options: ``path`` (table
    root), ``ignore_changes`` (accept non-append commits by re-
    emitting their rewritten files), ``start_version`` (skip history
    before it; default 0 = initial snapshot + tail),
    ``max_versions_per_trigger`` (bound how many log versions one
    micro-batch may cover; 0 = unbounded),
    ``consumer_id`` (optional, recommended with a cap: persists the
    admission-control planning floor to
    ``<table>/_txlog/_consumers/<id>.json`` on every commit, so a
    restarted capped consumer recovers its floor WITHOUT relying on
    the engine re-planning the committed batch before the first
    latestOffset — ADVICE r7. The sidecar is advisory only: offsets
    stay monotone with or without it, it bounds batch SIZE, never
    correctness. Distinct consumers need distinct ids),
    ``partition_filter`` (JSON object of eq/IN conditions on
    PARTITION columns: added files of non-matching partitions are
    pruned at PLANNING time from the manifest's recorded partition
    values — no task is ever scheduled for them; the per-file value
    is definitional, so the filter is exact. Non-partition columns or
    files without recorded values are conservatively kept)."""

    @classmethod
    def name(cls) -> str:
        return "txlog_stream"

    def schema(self):
        from pyspark.sql import types as T

        path = self.options["path"]
        versions = _list_versions(path)
        if not versions:
            raise ValueError(f"txlog_stream: no table at {path}")
        logged = _read_manifest(path, versions[-1]).get("schema")
        if logged is None:
            raise ValueError(
                f"txlog_stream: table at {path} has no logged schema"
            )
        return T.StructType.fromJson(logged)

    def streamReader(self, schema) -> "TxlogStreamReader":
        import json as _json

        return TxlogStreamReader(
            path=self.options["path"],
            columns=[f.name for f in schema.fields],
            schema_json=_json.dumps(schema.jsonValue()),
            ignore_changes=str(
                self.options.get("ignore_changes", "false")
            ).lower()
            == "true",
            start_version=int(self.options.get("start_version", 0)),
            max_versions_per_trigger=int(
                self.options.get("max_versions_per_trigger", 0)
            ),
            partition_filter=self.options.get("partition_filter", ""),
            consumer_id=self.options.get("consumer_id", ""),
        )


class TxlogStreamReader(DataSourceStreamReader):
    """Offsets are manifest versions; partitions are added files.

    The reader object is pickled to executors for read(), so it holds
    only plain strings/ints. Determinism: manifests and data files are
    immutable, so partitions(start, end) replans identically after a
    checkpoint restart — the replay contract."""

    def __init__(
        self,
        path: str,
        columns: list[str],
        ignore_changes: bool,
        start_version: int,
        schema_json: str = "",
        max_versions_per_trigger: int = 0,
        partition_filter: str = "",
        consumer_id: str = "",
    ):
        import json as _json

        self.path = path
        self.columns = columns
        self.schema_json = schema_json
        self.ignore_changes = ignore_changes
        self.start_version = start_version
        self.max_versions_per_trigger = max_versions_per_trigger
        self.partition_filter = (
            _json.loads(partition_filter) if partition_filter else None
        )
        self.consumer_id = consumer_id or None
        # Column mapping: the reader's logical schema is the LATEST
        # manifest's (captured at registration by schema()), so the
        # matching colmap is the latest one too — captured ONCE here
        # and used for EVERY partition. Shipping each version's own
        # colmap (the r8 shape) null-filled renamed columns when
        # replaying pre-rename versions: the new logical name missed
        # in the old/empty colmap (ADVICE r8 high). Physical parquet
        # names are immutable, so the latest mapping resolves files
        # from all versions; a column dropped then re-added mid-history
        # gets a fresh physical name, so pre-re-add files null-fill —
        # Delta columnMapping identity semantics.
        try:
            versions = _list_versions(path)
            latest_cm = (
                _read_manifest(path, versions[-1]).get("colmap") or {}
                if versions
                else {}
            )
        except (OSError, KeyError, ValueError):
            latest_cm = {}
        self._colmap_json = _json.dumps(latest_cm) if latest_cm else ""
        # Planning floor for admission control: the highest version
        # known planned/committed. Fresh queries know it from
        # start_version; on restart the engine's re-plan of the
        # committed batch (partitions(committed, committed) — fires
        # before the first latestOffset) and/or its commit() call
        # restore it. With consumer_id the floor ALSO recovers from a
        # persisted sidecar written at every commit() (ADVICE r7), so
        # the cap's effectiveness no longer depends on that engine
        # call order — defense in depth, not a correctness need
        # (offsets are clamped monotone either way). Driver-side only
        # (never pickled to executors for read(), which gets
        # _AddedFilePartition objects).
        self._floor = start_version - 1
        if self.consumer_id is not None:
            persisted = _load_consumer_floor(path, self.consumer_id)
            if persisted is not None:
                self._floor = max(self._floor, persisted)

    def initialOffset(self) -> dict:
        # the engine calls this ONLY for a fresh checkpoint — a
        # persisted floor from a PREVIOUS query reusing this
        # consumer_id must not apply here, or the first micro-batch
        # of a from-scratch reprocess spans the whole history uncapped
        # while offsets silently start at the old query's floor
        # (ADVICE r8 low). Restarts never reach this method, so their
        # sidecar recovery is untouched. The PERSISTED floor rewinds
        # too (r9 ADVICE low): without it, the reprocessing query's
        # first restart re-adopts the old query's sidecar floor and
        # the reset silently dies after one restart.
        self._floor = self.start_version - 1
        if self.consumer_id is not None:
            _reset_consumer_floor(
                self.path, self.consumer_id, self.start_version - 1
            )
        return {"version": self.start_version - 1}

    def latestOffset(self) -> dict:
        versions = _list_versions(self.path)
        latest = max(versions) if versions else -1
        if self.max_versions_per_trigger > 0:
            latest = min(latest, self._floor + self.max_versions_per_trigger)
        # never regress below the floor: a capped (or vacuumed/dropped)
        # offset must not rewind the checkpoint — monotone offsets are
        # what make capping safe against duplicate replay
        latest = max(latest, self._floor)
        self._floor = latest
        return {"version": latest}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["version"]), int(end["version"])
        self._floor = max(self._floor, lo, hi)
        out: list[_AddedFilePartition] = []
        for v in range(lo + 1, hi + 1):
            m, added, removed = _added_files(self.path, v)
            if (
                m["op"] not in _APPEND_OPS
                and (added or removed)
                and not self.ignore_changes
            ):
                raise ValueError(
                    f"txlog_stream: version {v} is op={m['op']!r} and "
                    "changed the file set — the source tails appends "
                    "only; pass ignore_changes=true to re-emit rewritten "
                    "files and skip removals (dedup downstream on a key)"
                )
            out.extend(
                _AddedFilePartition(
                    f, self.columns, self.schema_json, self._colmap_json
                )
                for f in added
                if self._partition_match(m, f)
            )
        if not out:  # engine requires ≥1 partition per (possibly empty) batch
            out.append(_AddedFilePartition(None, self.columns, self.schema_json))
        return out

    def read(self, partition: _AddedFilePartition):
        if partition.file is None:
            return iter(())
        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pq.read_table(partition.file)
        n = tbl.num_rows
        try:
            # fast path: hand Spark Arrow RecordBatches (zero per-row
            # Python conversion — the 100 TB shape). The logged Spark
            # schema defines the exact Arrow types; files written
            # before a schema evolution null-fill, every column casts
            # to the declared type.
            from pyspark.sql import types as T
            from pyspark.sql.pandas.types import to_arrow_schema

            import json as _json

            if not partition.schema_json:
                raise ValueError("no logged schema shipped")
            arrow_schema = to_arrow_schema(
                T.StructType.fromJson(_json.loads(partition.schema_json))
            )
            # column mapping: the parquet file stores PHYSICAL names;
            # look each logical field up through the adding commit's
            # colmap (identity when unmapped)
            cmap = (
                _json.loads(partition.colmap_json)
                if partition.colmap_json
                else {}
            )
            arrays = [
                tbl.column(cmap.get(f.name, f.name)).combine_chunks().cast(f.type)
                if cmap.get(f.name, f.name) in tbl.column_names
                else pa.nulls(n, type=f.type)
                for f in arrow_schema
            ]
            out = pa.Table.from_arrays(arrays, schema=arrow_schema)
            return iter(out.to_batches(max_chunksize=65536))
        except Exception:
            # conversion fallback (exotic types): row tuples
            import json as _json2

            cmap = (
                _json2.loads(partition.colmap_json)
                if partition.colmap_json
                else {}
            )
            cols = [
                tbl.column(cmap.get(name, name)).to_pylist()
                if cmap.get(name, name) in tbl.column_names
                else [None] * n
                for name in partition.columns
            ]
            return iter(zip(*cols))

    def _partition_match(self, m: dict, f: str) -> bool:
        """Planning-time partition pruning: keep the file unless its
        RECORDED partition value provably fails an eq/IN condition
        (values normalized through the logged schema types, same rule
        as the batch reader's _file_can_skip)."""
        if not self.partition_filter:
            return True
        st = (m.get("stats") or {}).get(_entry(self.path, f)) or {}
        pvals = st.get("pvals") or {}
        ptypes = _partition_types(m)
        for key, value in self.partition_filter.items():
            if key not in pvals:
                continue  # not a recorded partition value: keep
            pv = pvals[key]
            if pv is None:
                return False  # eq/IN never matches a NULL partition
            jt = ptypes.get(key)
            if jt is None:
                continue
            cand = (
                list(value) if isinstance(value, (list, tuple)) else [value]
            )
            if _pval_matches(pv, cand, jt) is False:
                return False
        return True

    def commit(self, end: dict) -> None:
        # offsets are durable in the engine checkpoint; keep the
        # admission-control floor in sync (restart path)
        self._floor = max(self._floor, int(end["version"]))
        if self.consumer_id is not None:
            # best-effort: losing a write only means the next restart
            # recovers a slightly older floor (or falls back to the
            # engine re-plan) — batch SIZE, never correctness
            try:
                _save_consumer_floor(self.path, self.consumer_id, self._floor)
            except OSError:
                pass

    def stop(self) -> None:
        pass


def stream_txlog_table(
    spark,
    path: str,
    ignore_changes: bool = False,
    start_version: int = 0,
    max_versions_per_trigger: int = 0,
    partition_filter: dict | None = None,
    consumer_id: str | None = None,
):
    """Register the source (idempotent) and open the table as a
    streaming DataFrame. ``partition_filter`` ({col: value-or-list})
    prunes added files of non-matching partitions at planning time —
    a consumer of one partition of a 100 TB feed schedules tasks for
    exactly its own files."""
    import json as _json

    spark.dataSource.register(TxlogStreamDataSource)
    reader = (
        spark.readStream.format("txlog_stream")
        .option("path", path)
        .option("ignore_changes", str(ignore_changes).lower())
        .option("start_version", start_version)
        .option("max_versions_per_trigger", max_versions_per_trigger)
    )
    if partition_filter:
        reader = reader.option(
            "partition_filter", _json.dumps(partition_filter)
        )
    if consumer_id:
        reader = reader.option("consumer_id", consumer_id)
    return reader.load()
