"""Minimal transactional table layer: versioned manifests over parquet.

The reference mutates its stores in place (Qdrant collection upserts /
deletes, ``backend/document_registry.py``); this repo's ``delete_where``
/ ``reset_table`` are crash-safe whole-directory parquet rewrites. At
100 TB a whole-directory rewrite for a 0.1% delete is the wrong cost
model — mutations must be METADATA operations plus copy-on-write of
only the touched files. That is the core public idea behind Delta Lake
/ Apache Iceberg (a numbered log of file-list manifests whose atomic
rename is the commit point); this module implements the smallest honest
version of it on plain parquet + POSIX rename, with no external library.

Layout::

    table/
      _txlog/
        00000000.json     {"version":0,"op":"create","files":[...],...}
        00000001.json     {"version":1,"op":"delete_where", ...}
      data/
        b0/part-*.parquet  (immutable once committed)
        b1/part-*.parquet

Guarantees (single-writer; a real deployment adds a log-store lock):

- The manifest rename is the COMMIT POINT: a crash anywhere before it
  leaves orphan data files (ignored by every reader — readers only
  trust manifest file lists), never a corrupt or half-visible table.
- Data files are immutable; every version's file list remains readable
  forever → time travel (``read_table(version=...)``) and file-level
  CDC (``table_diff``) come free from the log.
- ``delete_where`` reads the predicate ONCE to find affected files
  (input_file_name projection), rewrites ONLY those files without the
  matching rows, and commits a manifest swapping old→new. Untouched
  files are carried by reference — a 0.1% delete touches 0.1% of files.

Scale notes: the manifest lists absolute file paths (a real system uses
relative paths + checksums + column stats for file skipping; column
stats ARE already exploited at the parquet-rowgroup level by Spark's
scan, so the skipping story here is partition-directory + file-list
pruning). Version resolution is one directory listing of _txlog — O(versions),
kept small by compact().
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_LOG_DIR = "_txlog"
_DATA_DIR = "data"


def _log_path(path: str) -> str:
    return os.path.join(path, _LOG_DIR)


def _manifest_file(path: str, version: int) -> str:
    return os.path.join(_log_path(path), f"{version:08d}.json")


def _list_versions(path: str) -> list[int]:
    d = _log_path(path)
    if not os.path.isdir(d):
        return []
    out = []
    for n in os.listdir(d):
        if n.endswith(".json") and not n.startswith("."):
            try:
                out.append(int(n[:-5]))
            except ValueError:
                continue
    return sorted(out)


def _read_manifest(path: str, version: int) -> dict:
    with open(_manifest_file(path, version)) as f:
        return json.load(f)


def _commit(path: str, manifest: dict) -> int:
    """Atomic commit: write to a dot-temp in _txlog, fsync, rename into
    the numbered slot. POSIX rename within one directory is atomic —
    readers see the old latest or the new latest, never a partial file.
    Refuses to overwrite an existing version (single-writer guard)."""
    os.makedirs(_log_path(path), exist_ok=True)
    version = manifest["version"]
    final = _manifest_file(path, version)
    if os.path.exists(final):
        raise RuntimeError(
            f"txlog: version {version} already committed at {path} "
            "(concurrent writer?)"
        )
    tmp = os.path.join(_log_path(path), f".{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, final)
    return version


def _write_batch(df: DataFrame, path: str) -> list[str]:
    """Write a new immutable data batch; return its parquet file list.
    The batch dir is invisible to readers until a manifest references
    it (crash → orphan files, never a visible partial write)."""
    batch = os.path.join(path, _DATA_DIR, f"b{uuid.uuid4().hex[:12]}")
    df.write.mode("error").parquet(batch)
    return sorted(
        os.path.join(batch, n)
        for n in os.listdir(batch)
        if n.endswith(".parquet")
    )


def _schema_key(schema) -> list:
    """(name, type) pairs — the drift-detection identity; nullability
    and column metadata are deliberately excluded."""
    return [(f.name, f.dataType.simpleString()) for f in schema.fields]


def _logged_schema_key(logged: dict) -> list:
    from pyspark.sql import types as T

    return _schema_key(T.StructType.fromJson(logged))


def _committed_batch_ids(path: str) -> set:
    return {
        m.get("batch_id")
        for m in (_read_manifest(path, v) for v in _list_versions(path))
        if m.get("batch_id") is not None
    }


def create_table(
    spark: SparkSession, path: str, df: DataFrame, batch_id: int | None = None
) -> int:
    """Create version 0 from ``df``. Fails if the table exists."""
    if _list_versions(path):
        raise RuntimeError(f"txlog: table already exists at {path}")
    files = _write_batch(df, path)
    return _commit(
        path,
        {
            "version": 0,
            "op": "create",
            "files": files,
            "parent": None,
            "batch_id": batch_id,
            "schema": df.schema.jsonValue(),
        },
    )


def append_table(
    spark: SparkSession, path: str, df: DataFrame, batch_id: int | None = None
) -> int:
    """Append ``df`` as a new version: new files + carried references.
    The table data already on disk is NOT read or rewritten.

    ``batch_id`` (optional) makes the append IDEMPOTENT for streaming
    sinks: if any retained manifest already carries this id, the call
    is a no-op returning that version — foreachBatch re-delivery after
    a crash-before-checkpoint lands exactly once (the standard
    transactional-sink contract; the engine guarantees a replayed batch
    has the same id and the same data)."""
    versions = _list_versions(path)
    if not versions:
        raise RuntimeError(f"txlog: no table at {path}")
    if batch_id is not None:
        for v in versions:
            if _read_manifest(path, v).get("batch_id") == batch_id:
                return v  # already committed: replay is a no-op
    latest = versions[-1]
    m = _read_manifest(path, latest)
    files = m["files"]
    # schema ENFORCEMENT (not evolution): an append whose columns or
    # types drift from the logged schema is refused — silent drift
    # poisons every future read (parquet takes the first file's footer);
    # evolving the schema is an explicit overwrite_table. Compared on
    # (name, type) only — nullability/metadata differences are benign
    # (an embed stage and an inline frame disagree on nullable flags)
    logged = m.get("schema")
    if logged is not None and _schema_key(df.schema) != _logged_schema_key(logged):
        from pyspark.sql import types as T

        want = T.StructType.fromJson(logged).simpleString()
        raise RuntimeError(
            f"txlog: append schema {df.schema.simpleString()} does not "
            f"match the table schema {want}; use overwrite_table to evolve"
        )
    new_files = _write_batch(df, path)
    return _commit(
        path,
        {
            "version": latest + 1,
            "op": "append",
            "files": files + new_files,
            "parent": latest,
            "batch_id": batch_id,
            "schema": df.schema.jsonValue(),
        },
    )


def overwrite_table(spark: SparkSession, path: str, df: DataFrame) -> int:
    """Replace the table contents as a NEW VERSION (op='rewrite'): the
    manifest references only the new batch; prior versions stay
    readable until compact_log vacuums them. The transactional form of
    a full-table rewrite (e.g. clustering label write-back) — readers
    concurrent with the rewrite keep a consistent old snapshot, and a
    crash mid-write leaves the old version intact (the manifest rename
    is still the only commit point)."""
    versions = _list_versions(path)
    if not versions:
        return create_table(spark, path, df)
    latest = versions[-1]
    new_files = _write_batch(df, path)
    return _commit(
        path,
        {
            "version": latest + 1,
            "op": "rewrite",
            "files": new_files,
            "parent": latest,
            "schema": df.schema.jsonValue(),
        },
    )


def compact_files(
    spark: SparkSession, path: str, target_files: int = 8
) -> int:
    """Small-file compaction as a TRANSACTION: rewrite the current
    contents into ``target_files`` files and commit op='compact'. The
    streaming sink produces one batch dir per micro-batch — hundreds of
    tiny files throttle scan parallelism planning at scale; compaction
    restores uniform splits WITHOUT a read outage (readers of the old
    version keep their immutable files; compact_log vacuums them once
    retention allows). No-op (returns the current version) if the table
    already has <= target_files files."""
    versions = _list_versions(path)
    if not versions:
        raise RuntimeError(f"txlog: no table at {path}")
    latest = versions[-1]
    files = _read_manifest(path, latest)["files"]
    if len(files) <= target_files:
        return latest
    df = spark.read.parquet(*files).coalesce(target_files)
    new_files = _write_batch(df, path)
    return _commit(
        path,
        {
            "version": latest + 1,
            "op": "compact",
            "files": new_files,
            "parent": latest,
            "schema": _read_manifest(path, latest).get("schema"),
        },
    )


def merge_table(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
) -> int:
    """Copy-on-write MERGE (upsert): rows whose ``key_cols`` match an
    update row are REPLACED by it; update rows matching nothing are
    INSERTED — committed as one op='merge' version. Only files
    containing a matching key are rewritten; everything else is carried
    by reference (cost ∝ churn). Caller contract: ``updates`` carries
    one row per key (both rows land otherwise — same as a SQL MERGE
    with duplicate source keys). Schema must match the logged schema
    (same enforcement as append)."""
    versions = _list_versions(path)
    if not versions:
        raise RuntimeError(f"txlog: no table at {path}")
    latest = versions[-1]
    m = _read_manifest(path, latest)
    files = m["files"]
    logged = m.get("schema")
    if logged is not None and _schema_key(updates.schema) != _logged_schema_key(logged):
        raise RuntimeError(
            f"txlog: merge schema {updates.schema.simpleString()} does not "
            "match the table schema"
        )
    from urllib.parse import unquote, urlparse

    cur = spark.read.parquet(*files)
    keys = updates.select(*key_cols).distinct()
    # project input_file_name() BEFORE the semi-join: Spark refuses the
    # expression once the plan has more than one source
    tagged = cur.select(F.input_file_name().alias("f"), *key_cols)
    hit_files = {
        unquote(urlparse(r["f"]).path)
        for r in tagged.join(F.broadcast(keys), key_cols, "left_semi")
        .select("f")
        .distinct()
        .collect()
    }
    affected = hit_files & set(files)
    if hit_files - affected:
        raise RuntimeError(
            f"txlog: matching rows in files outside the manifest: "
            f"{sorted(hit_files - affected)[:3]}"
        )
    survivors = (
        spark.read.parquet(*sorted(affected)).join(
            F.broadcast(keys), key_cols, "left_anti"
        )
        if affected
        else None
    )
    merged = (
        survivors.unionByName(updates) if survivors is not None else updates
    )
    new_files = _write_batch(merged, path)
    kept = [f for f in files if f not in affected]
    return _commit(
        path,
        {
            "version": latest + 1,
            "op": "merge",
            "files": kept + new_files,
            "parent": latest,
            "rewritten": sorted(affected),
            "schema": logged if logged is not None else updates.schema.jsonValue(),
        },
    )


def fsck(spark: SparkSession, path: str) -> DataFrame:
    """Log/file integrity check (the 'is this table safe to read'
    report a scheduler runs before a big job): for every retained
    version — does every referenced data file exist on disk, and are
    there orphan data files no manifest references (crash debris the
    vacuum will clear)? Returns (version, op, n_files, n_missing,
    readable) plus one 'orphans' summary row (version = -1)."""
    versions = _list_versions(path)
    referenced: set[str] = set()
    rows = []
    for v in versions:
        m = _read_manifest(path, v)
        missing = [f for f in m["files"] if not os.path.exists(f)]
        referenced.update(m["files"])
        rows.append((v, m["op"], len(m["files"]), len(missing), not missing))
    data = os.path.join(path, _DATA_DIR)
    n_orphans = 0
    if os.path.isdir(data):
        for d in os.listdir(data):
            full = os.path.join(data, d)
            if os.path.isdir(full):
                n_orphans += sum(
                    1
                    for n in os.listdir(full)
                    if n.endswith(".parquet")
                    and os.path.join(full, n) not in referenced
                )
    rows.append((-1, "orphans", n_orphans, 0, True))
    return spark.createDataFrame(
        rows, "version int, op string, n_files int, n_missing int, readable boolean"
    )


def drop_table(path: str) -> None:
    """Remove the table: data, log, everything. (The reference's
    /admin/reset analog for a txlog-backed store.)"""
    shutil.rmtree(path, ignore_errors=True)


def read_table(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read the table at ``version`` (default: latest). Time travel is
    free: every version's manifest lists immutable files."""
    versions = _list_versions(path)
    if not versions:
        raise RuntimeError(f"txlog: no table at {path}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise RuntimeError(f"txlog: version {v} not in {versions}")
    m = _read_manifest(path, v)
    files = m["files"]
    if not files:
        # a fully-deleted table is a legal state: reconstruct an empty
        # DataFrame from the schema recorded in the log (the reason
        # real formats log the schema, not just the file list)
        if m.get("schema") is None:
            raise RuntimeError(f"txlog: version {v} is empty and unschema'd")
        from pyspark.sql import types as T

        return spark.createDataFrame([], T.StructType.fromJson(m["schema"]))
    return spark.read.parquet(*files)


def delete_where(spark: SparkSession, path: str, predicate: Column) -> int:
    """Copy-on-write delete: only files CONTAINING matching rows are
    rewritten (without those rows); everything else is carried by
    reference in the new manifest. One scan finds the affected file
    set (input_file_name projection over the predicate — at scale this
    is where manifest column stats would prune most files before the
    scan); the rewrite reads only the affected files."""
    versions = _list_versions(path)
    if not versions:
        raise RuntimeError(f"txlog: no table at {path}")
    latest = versions[-1]
    files = _read_manifest(path, latest)["files"]
    cur = spark.read.parquet(*files)
    # input_file_name() yields file:// URIs with percent-encoding —
    # unquote before matching against manifest paths, and HARD-FAIL on
    # any unmatched hit rather than silently skipping a delete
    from urllib.parse import unquote, urlparse

    hit_files = {
        unquote(urlparse(r["f"]).path)
        for r in cur.where(predicate)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    affected = hit_files & set(files)
    if hit_files - affected:
        raise RuntimeError(
            f"txlog: matching rows in files outside the manifest: "
            f"{sorted(hit_files - affected)[:3]}"
        )
    if not affected:
        # no matching rows anywhere: pure metadata commit (a no-op
        # delete at 100 TB costs one scan + one manifest write)
        return _commit(
            path,
            {
                "version": latest + 1,
                "op": "delete_where",
                "files": files,
                "parent": latest,
                "rewritten": [],
                "schema": _read_manifest(path, latest).get("schema"),
            },
        )
    # SQL DELETE semantics: remove rows where the predicate is TRUE;
    # NULL-evaluating rows survive (plain ~predicate would drop them)
    survivors = spark.read.parquet(*sorted(affected)).where(
        ~F.coalesce(predicate, F.lit(False))
    )
    new_files = _write_batch(survivors, path) if survivors.limit(1).count() else []
    kept = [f for f in files if f not in affected]
    return _commit(
        path,
        {
            "version": latest + 1,
            "op": "delete_where",
            "files": kept + new_files,
            "parent": latest,
            "rewritten": sorted(affected),
            "schema": _read_manifest(path, latest).get("schema"),
        },
    )


def table_versions(spark: SparkSession, path: str) -> DataFrame:
    """(version, op, n_files, parent) — the table history, from the log
    alone (no data files opened)."""
    rows = [
        (
            m["version"],
            m["op"],
            len(m["files"]),
            m["parent"],
        )
        for m in (_read_manifest(path, v) for v in _list_versions(path))
    ]
    return spark.createDataFrame(
        rows, "version int, op string, n_files int, parent int"
    )


def table_diff(
    spark: SparkSession, path: str, v_from: int, v_to: int
) -> DataFrame:
    """Row-level CDC between two versions, computed from CHANGED FILES
    ONLY: files present in both manifests carry identical immutable
    rows and are never read — inserts = rows(files added) EXCEPT ALL
    rows(files removed), deletes the reverse. At 100 TB the diff cost
    is proportional to the churn, not the table. Returns the union with
    a ``change`` column ('insert' | 'delete')."""
    a = set(_read_manifest(path, v_from)["files"])
    b = set(_read_manifest(path, v_to)["files"])
    removed, added = sorted(a - b), sorted(b - a)
    schema_src = read_table(spark, path, v_to)
    old = (
        spark.read.parquet(*removed)
        if removed
        else schema_src.limit(0)
    )
    new = (
        spark.read.parquet(*added)
        if added
        else schema_src.limit(0)
    )
    return new.exceptAll(old).withColumn(
        "change", F.lit("insert")
    ).unionAll(old.exceptAll(new).withColumn("change", F.lit("delete")))


def compact_log(spark: SparkSession, path: str, keep_versions: int = 10) -> int:
    """Drop manifests older than the newest ``keep_versions`` and any
    data file no retained manifest references (vacuum). Returns the
    number of data files removed. Time travel windows shrink to the
    retained versions — the standard retention trade."""
    versions = _list_versions(path)
    drop = versions[:-keep_versions]
    if not drop:
        return 0
    keep = versions[-keep_versions:]
    live: set[str] = set()
    for v in keep:
        live.update(_read_manifest(path, v)["files"])
    removed = 0
    for v in drop:
        for f in _read_manifest(path, v)["files"]:
            if f not in live and os.path.exists(f):
                os.remove(f)
                removed += 1
        os.remove(_manifest_file(path, v))
    # prune empty batch dirs
    data = os.path.join(path, _DATA_DIR)
    if os.path.isdir(data):
        for d in os.listdir(data):
            full = os.path.join(data, d)
            if os.path.isdir(full) and not any(
                n.endswith(".parquet") for n in os.listdir(full)
            ):
                shutil.rmtree(full, ignore_errors=True)
    return removed
