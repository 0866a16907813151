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


def compact(spark: SparkSession, path: str, target_partitions: int) -> None:
    """Rewrite a table to ``target_partitions`` files (small-file fix
    after streaming appends). Writes to a temp suffix then swaps."""
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compact"
    df.repartition(target_partitions).write.mode("overwrite").parquet(tmp)
    # swap via filesystem move (atomic enough for a maintenance window;
    # a real deployment uses a table format with transactions — Delta/
    # Iceberg — which this container doesn't ship)
    import shutil

    shutil.rmtree(path)
    shutil.move(tmp, path)
