"""Incrementally-maintained materialized views over txlog tables.

A materialized view here is a GROUP-BY aggregate of one txlog base
table, itself stored as a txlog table whose manifest additionally
records ``{"mv": {base_path, base_version, keys, aggs, grouping}}`` —
the view definition and the exact base snapshot the state reflects
ride in the SAME atomic commit as the state, so a crash between
"state written" and "watermark advanced" cannot exist.

Maintenance follows the classic change-propagation split (Gupta &
Mumick, "Maintenance of Materialized Views: Problems, Techniques, and
Applications", IEEE Data Eng. Bulletin 1995 — public):

* ``sum`` / ``count`` / ``avg`` have an INVERSE, so the view is
  self-maintainable: refresh reads ONLY the row-level CDC between the
  maintained and the current base version (``txlog.table_diff`` —
  changed files only, cost ∝ churn, never ∝ table), folds it into
  signed per-group deltas, and full-outer-merges those with the stored
  state. The base table's unchanged files are never opened — the
  property that makes an MV worth having at 100 TB. ``avg`` stores no
  state of its own: it is served as ``sum/nonnull_count`` from the
  hidden counters a sum already maintains (pure plumbing).
* ``min`` / ``max`` are NOT self-maintainable under deletes (removing
  the current extremum needs the runner-up, which the state no longer
  has). Refresh then falls back to AFFECTED-GROUP rescan: groups named
  in the CDC are recomputed from the current base snapshot (semi-join
  pushes the group filter into the scan; manifest file stats prune
  where they can), untouched groups are carried from the old state
  unread. Still churn-proportional in the number of groups touched.

Grouping sets: ``grouping="rollup"`` / ``"cube"`` maintains every
grouping set of the keys in ONE state table, disambiguated by a
``grouping_id()`` column (served as ``gid``, SQL-standard bit
encoding, leftmost key = MSB). Each grouping set is independently
self-maintainable, so the same signed-delta merge covers all of them
— but only for invertible aggregates: a min/max ROLLUP total would
need a full-table rescan on any delete, so that combination is
rejected at create time rather than silently degrading.

Null semantics are preserved exactly: each ``sum_x`` is maintained
alongside a hidden non-null counter so a group whose last non-null
``x`` is deleted returns to ``SUM(x) = NULL`` (not 0), and groups
whose row count reaches zero vanish from the view — both pinned by
tests against full-recompute oracles. NULL group-key values (which
Spark groupBy does produce, and which rollup/cube produce by design)
merge with NULL-SAFE equality throughout, so a NULL-keyed group
neither duplicates on delta refresh nor goes stale on rescan.

Concurrency: a refresh that loses the CAS commit race re-reads the
winner's manifest and RECOMPUTES against the winner's base watermark
(no-op if the winner already covered it) — never re-commits stale
precomputed state at a later version.

The reference engine has no transactional tables and recomputes every
aggregate per request (e.g. collection stats re-scan,
backend/filesystem_db.py); this module is the Spark-shaped answer for
aggregates a 100 TB ingest loop reads constantly but mutates in small
increments.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .txlog import (
    _commit,
    _file_stats,
    _list_versions,
    _read_manifest,
    _rel,
    _write_batch,
    TxConflict,
    read_table,
    table_diff,
)

_FNS = ("sum", "count", "min", "max", "avg")
# fns with an inverse: deletes fold in as negated inserts
_INVERTIBLE = ("sum", "count", "avg")
_GROUPINGS = ("rollup", "cube")
_GID = "_mv_gid"  # grouping_id column for rollup/cube state
_MAX_REFRESH_RETRIES = 16


def _col_name(fn: str, col: str) -> str:
    return f"{fn}_star" if col == "*" else f"{fn}_{col}"


def _nn_name(col: str) -> str:
    return f"_mv_nn_{col}"


def _physical(aggs: list) -> list:
    """The aggregates the STATE physically maintains: ``avg(c)`` is
    served from ``sum(c)`` and the hidden non-null counter, so it
    stores as ``sum(c)`` (deduplicated against an explicit sum)."""
    phys: list = []
    for fn, col in aggs:
        p = ("sum", col) if fn == "avg" else (fn, col)
        if p not in phys:
            phys.append(p)
    return phys


def _state_aggs(aggs: list) -> list:
    """Aggregate columns for a FULL compute of the state (also used for
    affected-group rescan). Hidden columns: ``_mv_n`` (group liveness)
    and one non-null counter per summed column (null-restoration +
    avg denominators). Expects PHYSICAL aggs (no avg)."""
    cols = []
    for fn, col in aggs:
        name = _col_name(fn, col)
        if fn == "count":
            src = F.lit(1) if col == "*" else F.col(col)
            cols.append(F.count(src).cast("long").alias(name))
        else:
            cols.append(getattr(F, fn)(F.col(col)).alias(name))
    for col in sorted({c for fn, c in aggs if fn == "sum"}):
        cols.append(F.count(F.col(col)).cast("long").alias(_nn_name(col)))
    cols.append(F.count(F.lit(1)).cast("long").alias("_mv_n"))
    return cols


def _aggregate(
    df: DataFrame, keys: list, aggs: list, grouping: str | None = None
) -> DataFrame:
    """Full-compute the state. For rollup/cube the grouping_id rides
    as a state key right after the group keys (same position every
    version — one layout)."""
    cols = _state_aggs(_physical(aggs))
    if grouping:
        gb = getattr(df, grouping)(*keys)
        return gb.agg(F.grouping_id().cast("long").alias(_GID), *cols)
    return df.groupBy(*keys).agg(*cols)


def _state_keys(keys: list, grouping: str | None) -> list:
    return list(keys) + ([_GID] if grouping else [])


def _validate(keys: list, aggs: list, grouping: str | None) -> None:
    if not keys:
        raise ValueError("matview: at least one group key required")
    for fn, col in aggs:
        if fn not in _FNS:
            raise ValueError(f"matview: unsupported aggregate fn {fn!r}")
        if col == "*" and fn != "count":
            raise ValueError(f"matview: {fn}(*) is not a thing")
    if grouping is not None:
        if grouping not in _GROUPINGS:
            raise ValueError(
                f"matview: grouping must be one of {_GROUPINGS}, "
                f"got {grouping!r}"
            )
        bad = [fn for fn, _ in aggs if fn not in _INVERTIBLE]
        if bad:
            raise ValueError(
                "matview: rollup/cube views support only invertible "
                f"aggregates (sum/count/avg) — {bad[0]} over a grouping "
                "total is not churn-proportional to rescan"
            )


def _null_safe_cond(left: str, right: str, keys: list) -> Column:
    """AND of per-key NULL-SAFE equalities between two aliased sides —
    NULL group keys (plain groupBy nulls, rollup/cube totals) must
    match each other, which ``on=keys`` equality would not."""
    return reduce(
        Column.__and__,
        [F.col(f"{left}.{k}").eqNullSafe(F.col(f"{right}.{k}")) for k in keys],
    )


def _mv_commit(
    path: str,
    files: list,
    stats: dict,
    schema: dict,
    mv: dict,
    op: str,
    parent: int | None,
) -> int:
    """ONE commit attempt of MV state + definition + base watermark
    (atomic CAS slot-claim, same as every txlog commit). ``parent``
    MUST be the mv version the caller READ its state from — the commit
    targets exactly ``parent + 1``, so any refresh that won in between
    surfaces as ``TxConflict`` and the caller re-reads the winner's
    manifest and recomputes. Taking "the next free slot" instead would
    let a stale refresh land AFTER a newer one, regressing the
    maintained base watermark (ADVICE r6)."""
    return _commit(
        path,
        {
            "version": 0 if parent is None else parent + 1,
            "op": op,
            "files": files,
            "stats": stats,
            "parent": parent,
            "schema": schema,
            "mv": mv,
        },
    )


def matview_info(mv_path: str) -> dict:
    """The view definition + maintained base version, from the latest
    manifest (the only authoritative copy)."""
    versions = _list_versions(mv_path)
    if not versions:
        raise RuntimeError(f"matview: no view at {mv_path}")
    m = _read_manifest(mv_path, versions[-1])
    if "mv" not in m:
        raise RuntimeError(f"matview: {mv_path} is a plain table, not a view")
    return m["mv"]


def create_matview(
    spark: SparkSession,
    mv_path: str,
    base_path: str,
    keys: list,
    aggs: list,
    grouping: str | None = None,
) -> int:
    """Full initial compute of ``GROUP BY keys`` / ``aggs`` (list of
    ``(fn, col)`` with fn in sum|count|min|max|avg, col '*' allowed
    for count) over the CURRENT base version; state + definition
    committed atomically as MV version 0. ``grouping="rollup"|"cube"``
    maintains every grouping set (invertible aggs only)."""
    _validate(keys, aggs, grouping)
    if _list_versions(mv_path):
        raise RuntimeError(f"matview: view already exists at {mv_path}")
    base_versions = _list_versions(base_path)
    if not base_versions:
        raise RuntimeError(f"matview: no base table at {base_path}")
    base_v = base_versions[-1]
    state = _aggregate(
        read_table(spark, base_path, base_v), keys, aggs, grouping
    )
    # record the base's PHYSICAL name for every referenced column
    # (identity when unmapped): refresh resolves the definition
    # through physical identity, so ALTER TABLE RENAME on the base
    # never breaks the view (r9; same principle as CDC across a
    # rename — the view's OUTPUT keeps its creation-time names, SQL
    # view semantics)
    base_cm = _read_manifest(base_path, base_v).get("colmap") or {}
    referenced = list(
        dict.fromkeys(list(keys) + [c for _fn, c in aggs if c != "*"])
    )
    files = _write_batch(state, mv_path)
    try:
        return _mv_commit(
            mv_path,
            [_rel(mv_path, f) for f in files],
            _file_stats(mv_path, files),
            state.schema.jsonValue(),
            {
                "base_path": base_path,
                "base_version": base_v,
                "keys": list(keys),
                "aggs": [list(a) for a in aggs],
                "grouping": grouping,
                "base_phys": {c: base_cm.get(c, c) for c in referenced},
            },
            "mv_create",
            parent=None,
        )
    except TxConflict:
        raise RuntimeError(
            f"matview: a concurrent create won version 0 at {mv_path}"
        ) from None


def read_matview(
    spark: SparkSession, mv_path: str, version: int | None = None
) -> DataFrame:
    """The served view: group keys (plus ``gid`` = SQL grouping_id for
    rollup/cube views), then the REQUESTED aggregates in definition
    order — avg computed as sum/nonnull-count from the hidden
    counters, hidden ``_mv_*`` bookkeeping and unrequested physical
    columns dropped. O(groups), never touches the base table."""
    info = matview_info(mv_path)
    aggs = [tuple(a) for a in info["aggs"]]
    df = read_table(spark, mv_path, version)
    cols = [F.col(k) for k in info["keys"]]
    if info.get("grouping"):
        cols.append(F.col(_GID).alias("gid"))
    for fn, col in aggs:
        name = _col_name(fn, col)
        if fn == "avg":
            cols.append(
                (
                    F.col(_col_name("sum", col))
                    / F.nullif(F.col(_nn_name(col)), F.lit(0))
                ).alias(name)
            )
        else:
            cols.append(F.col(name))
    return df.select(*cols)


def _delta_merge(
    old: DataFrame,
    cdc: DataFrame,
    keys: list,
    aggs: list,
    grouping: str | None,
) -> DataFrame:
    """Self-maintenance for invertible views: fold the CDC into signed
    per-group deltas (per grouping set, for rollup/cube), then
    NULL-SAFE full-outer-merge with the stored state. Touches ZERO
    base-table files beyond the CDC's changed set."""
    phys = _physical(aggs)
    sign = F.when(F.col("change") == "insert", F.lit(1)).otherwise(F.lit(-1))
    dcols = []
    for fn, col in phys:
        name = _col_name(fn, col)
        if fn == "count":
            hit = (
                F.lit(1)
                if col == "*"
                else F.col(col).isNotNull().cast("int")
            )
            dcols.append(F.sum(sign * hit).cast("long").alias(name))
        else:  # sum
            dcols.append(
                F.sum(
                    F.when(F.col(col).isNotNull(), sign * F.col(col))
                ).alias(name)
            )
    for col in sorted({c for fn, c in phys if fn == "sum"}):
        dcols.append(
            F.sum(sign * F.col(col).isNotNull().cast("int"))
            .cast("long")
            .alias(_nn_name(col))
        )
    dcols.append(F.sum(sign).cast("long").alias("_mv_n"))
    if grouping:
        delta = getattr(cdc, grouping)(*keys).agg(
            F.grouping_id().cast("long").alias(_GID), *dcols
        )
    else:
        delta = cdc.groupBy(*keys).agg(*dcols)

    mkeys = _state_keys(keys, grouping)
    merged = old.alias("o").join(
        delta.alias("d"),
        on=_null_safe_cond("o", "d", mkeys),
        how="full_outer",
    )

    def _summed(name: str) -> Column:
        return F.coalesce(F.col(f"o.{name}"), F.lit(0)) + F.coalesce(
            F.col(f"d.{name}"), F.lit(0)
        )

    # column order mirrors _aggregate so every MV version shares one
    # layout: keys [, gid], aggregates, hidden non-null counters, _mv_n
    out = [
        F.coalesce(F.col(f"o.{k}"), F.col(f"d.{k}")).alias(k) for k in mkeys
    ]
    for fn, col in phys:
        name = _col_name(fn, col)
        if fn == "count":
            out.append(_summed(name).alias(name))
        else:  # sum: NULL only when NO non-null value remains
            nn = _summed(_nn_name(col))
            out.append(F.when(nn > 0, _summed(name)).alias(name))
    for col in sorted({c for fn, c in phys if fn == "sum"}):
        out.append(_summed(_nn_name(col)).alias(_nn_name(col)))
    out.append(_summed("_mv_n").alias("_mv_n"))
    return merged.select(*out).where(F.col("_mv_n") > 0)


def _rescan_merge(
    spark: SparkSession,
    base_path: str,
    base_v: int,
    old: DataFrame,
    cdc: DataFrame,
    keys: list,
    aggs: list,
    colmap: dict | None = None,
) -> DataFrame:
    """Affected-group rescan for min/max views: recompute ONLY the
    groups the CDC names from the current base snapshot; carry every
    other group from the old state without reading it from base.
    NULL-SAFE joins keep a NULL-keyed group from going stale.
    ``colmap`` (defn name → base's current logical name, r9) aliases
    the rescan back to definition names across a base-column rename."""
    affected = cdc.select(*keys).distinct().localCheckpoint(eager=True)
    base = read_table(spark, base_path, base_v)
    if colmap and any(cur != c for c, cur in colmap.items()):
        base = base.select(
            *[F.col(cur).alias(c) for c, cur in colmap.items()]
        )
    recomputed = _aggregate(
        base.alias("b").join(
            F.broadcast(affected.alias("a")),
            on=_null_safe_cond("b", "a", keys),
            how="left_semi",
        ),
        keys,
        aggs,
    )
    kept = old.alias("b").join(
        F.broadcast(affected.alias("a")),
        on=_null_safe_cond("b", "a", keys),
        how="left_anti",
    )
    return kept.unionByName(recomputed)


def refresh_matview(spark: SparkSession, mv_path: str) -> dict:
    """Advance the view to the base table's current version. Returns
    ``{"mode": "noop"|"delta"|"rescan", "from": v0, "to": v1,
    "mv_version": n}``. Mode is chosen by the view definition: all
    aggregates invertible → pure CDC delta merge (no base files read
    beyond the diff's changed files); any min/max → affected-group
    rescan. Either way the cost is proportional to the churn, not the
    base table. A lost CAS race re-reads the winner's watermark and
    recomputes (no-op if the winner already covered this refresh)."""
    for _ in range(_MAX_REFRESH_RETRIES):
        mv_versions = _list_versions(mv_path)
        if not mv_versions:
            raise RuntimeError(f"matview: no view at {mv_path}")
        mv_parent = mv_versions[-1]
        m = _read_manifest(mv_path, mv_parent)
        if "mv" not in m:
            raise RuntimeError(
                f"matview: {mv_path} is a plain table, not a view"
            )
        info = m["mv"]
        base_path, v0 = info["base_path"], info["base_version"]
        keys = list(info["keys"])
        aggs = [tuple(a) for a in info["aggs"]]
        grouping = info.get("grouping")
        base_versions = _list_versions(base_path)
        if not base_versions:
            raise RuntimeError(f"matview: base table {base_path} vanished")
        v1 = base_versions[-1]
        if v0 not in base_versions:
            raise RuntimeError(
                f"matview: maintained base version {v0} was vacuumed from "
                f"{base_path}; recreate the view (retention must cover the "
                "refresh cadence, same contract as any CDC consumer)"
            )
        if v1 <= v0:
            return {
                "mode": "noop",
                "from": v0,
                "to": v0,
                "mv_version": mv_parent,
            }
        # diff only the columns the view reads: the projected multiset
        # delta is exactly what aggregate maintenance needs, the scan is
        # column-pruned, and non-comparable base columns (MAP) never
        # enter the set operation. Definition columns are resolved to
        # the base's CURRENT logical names through PHYSICAL identity
        # (r9): a base-column rename between refreshes is transparent —
        # the CDC reads the current name and aliases back to the
        # definition's name, so the view's output schema never moves.
        # A definition column whose physical identity is GONE (dropped,
        # or dropped-and-re-added under a fresh physical name) refuses
        # loudly: its aggregate history is unmaintainable.
        defn_need = list(
            dict.fromkeys(
                [c for c in keys]
                + [c for _fn, c in _physical(aggs) if c != "*"]
            )
        )
        base_cm = _read_manifest(base_path, v1).get("colmap") or {}
        create_phys = info.get("base_phys") or {}
        inv = {p: l for l, p in base_cm.items()}

        def _cur(c: str) -> str:
            phys = create_phys.get(c, c)
            if not base_cm:
                return c  # unmapped base: names ARE physical
            if phys in inv:
                return inv[phys]
            raise RuntimeError(
                f"matview: base column {c!r} (physical {phys!r}) was "
                f"dropped from {base_path}; the view's aggregate "
                "history cannot be maintained — recreate the view"
            )

        need = [_cur(c) for c in defn_need]
        cdc = table_diff(spark, base_path, v0, v1, columns=need)
        if need != defn_need:  # rename happened: restore defn names
            cdc = cdc.toDF(*(defn_need + ["change"]))
        cdc = cdc.localCheckpoint(eager=True)
        old = read_table(spark, mv_path, mv_parent)
        invertible = all(fn in _INVERTIBLE for fn, _ in aggs)
        if invertible:
            new_state = _delta_merge(old, cdc, keys, aggs, grouping)
            mode = "delta"
        else:
            new_state = _rescan_merge(
                spark, base_path, v1, old, cdc, keys, aggs,
                colmap={c: _cur(c) for c in defn_need},
            )
            mode = "rescan"
        # write the merged state directly — the write is its ONLY
        # consumer, so the pre-write eager checkpoint was a second full
        # materialization of the same plan (r14, guide §1.2; the cdc /
        # affected checkpoints above stay: they feed multiple branches)
        files = _write_batch(new_state, mv_path)
        try:
            mv_version = _mv_commit(
                mv_path,
                [_rel(mv_path, f) for f in files],
                _file_stats(mv_path, files),
                new_state.schema.jsonValue(),
                {**info, "base_version": v1},
                "mv_refresh",
                parent=mv_parent,
            )
        except TxConflict:
            continue  # recompute against the winner's watermark
        return {"mode": mode, "from": v0, "to": v1, "mv_version": mv_version}
    raise TxConflict(
        f"matview: refresh at {mv_path} lost {_MAX_REFRESH_RETRIES} CAS races"
    )
