"""Partitioned storage layout for the chunks corpus (100 TB posture).

The reference stores everything in one Qdrant collection + flat upload
dir. At scale, layout IS the index:

- ``write_chunks``: chunks partitioned by ``upload_date`` day (time-
  pruning for the date_range filter F3) — the write-side half of
  predicate pushdown. `maxRecordsPerFile` bounds file sizes so a
  1000-executor scan gets uniform splits.
- ``write_ivf_corpus``: embedding corpus partitioned by IVF cell
  (operators/ann.build_ivf) — an ANN probe reads n_probe/n_cells of the
  data at the FILE level, the distributed analog of Qdrant's HNSW
  neighborhood visits.
- ``compact``: small-file compaction (streaming ingest produces one
  file per micro-batch; periodic rewrite to target file counts keeps
  scan parallelism healthy).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_chunks(
    chunks: DataFrame,
    path: str,
    mode: str = "append",
    max_records_per_file: int = 1_000_000,
) -> None:
    """Write the chunks table partitioned by upload day."""
    (
        chunks.withColumn("upload_day", F.to_date("upload_date"))
        .write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("upload_day")
        .parquet(path)
    )


def write_ivf_corpus(
    assigned: DataFrame,
    path: str,
    mode: str = "overwrite",
) -> None:
    """Write an IVF-assigned corpus partitioned by cell — ANN probes
    become partition-pruned scans."""
    assigned.write.mode(mode).partitionBy("ivf_cell").parquet(path)


def read_ivf_cells(spark: SparkSession, path: str, cells: list[int]) -> DataFrame:
    """Probe: read only the chosen cells. The `isin` filter on the
    partition column prunes directories before any file is opened."""
    return spark.read.parquet(path).where(F.col("ivf_cell").isin(cells))


def _swap_in(path: str, tmp: str) -> None:
    """Replace ``path`` with ``tmp``, keeping the old data recoverable at
    every step: the old directory is moved aside (path__old), the new one
    moved into place, and only then is the old copy deleted — a crash
    mid-swap leaves either the original or the rename-aside, never
    nothing. (A real deployment uses a transactional table format —
    Delta/Iceberg — which this container doesn't ship.)"""
    import shutil

    old = path.rstrip("/") + "__old"
    if os.path.exists(old):
        shutil.rmtree(old)
    shutil.move(path, old)
    try:
        shutil.move(tmp, path)
    except Exception:
        shutil.move(old, path)  # roll back: restore the original
        raise
    shutil.rmtree(old)


def _rewrite(df, path: str) -> None:
    """Write ``df`` to a temp dir then swap it in over ``path``; the temp
    dir is cleaned up if the write itself fails. The file-listing cache
    for ``path`` is invalidated afterwards — Spark memoizes the
    InMemoryFileIndex per path, and a reader planned against the
    pre-swap listing would chase deleted part files."""
    import shutil

    tmp = path.rstrip("/") + "__rewrite"
    try:
        df.write.mode("overwrite").parquet(tmp)
    except Exception:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    _swap_in(path, tmp)
    df.sparkSession.catalog.refreshByPath(path)


def compact(spark: SparkSession, path: str, target_partitions: int) -> None:
    """Rewrite a table to ``target_partitions`` files (small-file fix
    after streaming appends)."""
    df = spark.read.parquet(path)
    _rewrite(df.repartition(target_partitions), path)


def delete_where(spark: SparkSession, path: str, predicate: "F.Column | str") -> None:
    """S17: delete rows matching ``predicate`` from a parquet table —
    the reference's delete-by-metadata-field
    (/root/reference/backend/vector_db.py:204-228, Qdrant FilterSelector).

    On immutable parquet a delete is a filtered rewrite: keep the
    complement (~predicate, with null-safe semantics — rows where the
    predicate is NULL are kept, matching Qdrant's must-match selector
    which only deletes rows that positively match). At 100 TB with a
    partitioned layout, the scan prunes to the partitions the predicate
    can touch and untouched files could be hard-linked instead of
    rewritten; a transactional format would make this a metadata-only
    MERGE/DELETE."""
    cond = F.expr(predicate) if isinstance(predicate, str) else predicate
    df = spark.read.parquet(path)
    kept = df.where(~F.coalesce(cond, F.lit(False)))
    _rewrite(kept, path)


def reset_table(spark: SparkSession, path: str) -> None:
    """S18: collection reset — drop all rows but keep the schema
    (/root/reference/backend/vector_db.py:50-60 deletes and recreates the
    Qdrant collection). The empty-but-typed parquet preserves the schema
    contract so readers and appends keep working."""
    df = spark.read.parquet(path)
    _rewrite(df.limit(0), path)


def write_range_clustered(
    df: DataFrame, path: str, col: str, n_files: int, mode: str = "overwrite"
) -> None:
    """Range-cluster a table on ``col`` before writing: rows land in
    ``n_files`` contiguous, (almost) non-overlapping value ranges, one
    per output file. Parquet footers then carry tight min/max stats for
    ``col``, so any engine's row-group pruning (Spark, DuckDB, Trino)
    skips the files a range predicate can't match — the sort-key half
    of data skipping, complementing ``write_chunks``'s partition-column
    half. repartitionByRange samples the distribution, so the ranges
    are balanced even when the column is skewed; sortWithinPartitions
    keeps row groups internally ordered for finer-grained pruning."""
    (
        df.repartitionByRange(n_files, F.col(col))
        .sortWithinPartitions(col)
        .write.mode(mode)
        .parquet(path)
    )


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order (Morton-curve) clustering for MULTI-column data skipping
    — the technique behind Delta's OPTIMIZE ZORDER, built from plain
    Spark expressions: each cluster column is min-max scaled to a
    ``bits``-bit integer (one broadcast 1-row bounds row; swap in
    approx quantile ranks for heavily skewed columns), the bit planes
    are interleaved into one Morton key, and the table is range-
    partitioned + sorted on that key. Every output file then covers a
    small hyper-rectangle of the value space, so parquet footer min/max
    stats prune files for predicates on ANY of the clustered columns —
    where ``write_range_clustered`` only serves its single sort column.
    The interleave is pure shift/and/or column arithmetic: whole-stage
    codegen, no UDF."""
    bounds = df.agg(
        *[F.min(c).alias(f"_lo_{c}") for c in cols],
        *[F.max(c).alias(f"_hi_{c}") for c in cols],
    )
    scaled = df.crossJoin(F.broadcast(bounds))
    top = (1 << bits) - 1
    keys = []
    for c in cols:
        span = F.col(f"_hi_{c}") - F.col(f"_lo_{c}")
        frac = F.when(span > 0, (F.col(c) - F.col(f"_lo_{c}")) / span).otherwise(
            F.lit(0.0)
        )
        keys.append(F.round(frac * top).cast("long"))
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, k in enumerate(keys):
            bit = F.shiftright(k, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * len(keys) + j))
    (
        scaled.withColumn("_zkey", z)
        .select(*df.columns, "_zkey")
        .repartitionByRange(n_files, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode(mode)
        .parquet(path)
    )


def overwrite_partitions(
    df: DataFrame, path: str, partition_col: str = "upload_day"
) -> None:
    """Idempotent backfill: rewrite ONLY the partitions present in
    ``df``, leaving every other partition untouched (dynamic partition
    overwrite — static mode would wipe the whole table). This is the
    reprocessing verb of a day-partitioned lakehouse: re-run one bad
    day through the pipeline and land it atomically per-partition; run
    the same backfill twice and the table is unchanged (idempotent by
    construction, no dedup pass needed)."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
