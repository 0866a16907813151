"""Folder hierarchy operators (SURVEY §2.4 J2-J4).

The reference keeps folders in SQLite — ``folders(id, name, parent_id)``
self-referencing and ``file_folders(document_id, filename, folder_id)``
(/root/reference/backend/filesystem_db.py:36-53) — and resolves paths by
walking parent pointers one SELECT per level (:179-223).

Spark design: the folder table is broadcast-size by construction (human-
created hierarchy), so path resolution is an iterative self-join driven
to fixpoint — depth iterations of a broadcast join, not a generic
recursive operator (SURVEY §7 'hard parts' guidance)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NULL_FOLDER_SENTINEL = "null"  # /root/reference/backend/constants.py:17
MAX_DEPTH = 32


def resolve_folder_paths(folders: DataFrame, sep: str = "/") -> DataFrame:
    """(id, name, parent_id) → (id, path) with path = 'a/b/c'.

    Iterative broadcast self-join: each pass prepends one ancestor level;
    terminates when no row still has an unresolved parent (≤ depth
    passes; MAX_DEPTH guards cycles)."""
    cur = folders.select(
        "id", F.col("name").alias("path"), F.col("parent_id").alias("next_parent")
    )
    for _ in range(MAX_DEPTH):
        if cur.where(F.col("next_parent").isNotNull()).count() == 0:
            break
        parents = folders.select(
            F.col("id").alias("p_id"),
            F.col("name").alias("p_name"),
            F.col("parent_id").alias("p_parent"),
        )
        cur = (
            cur.join(F.broadcast(parents), cur.next_parent == parents.p_id, "left")
            .select(
                "id",
                F.when(
                    F.col("p_name").isNotNull(),
                    F.concat_ws(sep, "p_name", "path"),
                )
                .otherwise(F.col("path"))
                .alias("path"),
                F.col("p_parent").alias("next_parent"),
            )
        )
    return cur.select("id", "path")


def unsorted_files(documents: DataFrame, file_folders: DataFrame) -> DataFrame:
    """J2: documents assigned to no folder — left_anti join (replaces the
    reference's Python set difference, filesystem_db.py:151-163)."""
    return documents.join(
        file_folders.select("document_id"), "document_id", "left_anti"
    )


def files_by_folder(file_folders: DataFrame) -> DataFrame:
    """A5: folder_id → [(document_id, filename)] with the 'null' sentinel
    for root files (filesystem_db.py:135-149)."""
    return (
        file_folders.groupBy(
            F.coalesce(F.col("folder_id"), F.lit(NULL_FOLDER_SENTINEL)).alias(
                "folder_id"
            )
        )
        .agg(
            F.sort_array(
                F.collect_list(F.struct("document_id", "filename"))
            ).alias("files"),
            F.count(F.lit(1)).alias("n_files"),
        )
    )


def file_paths(
    documents: DataFrame, file_folders: DataFrame, folders: DataFrame
) -> DataFrame:
    """Full path per document (ZIP-export path reconstruction,
    /root/reference/backend/main.py:926-951): resolve folder paths once,
    broadcast-join files onto them; root files get path ''."""
    paths = resolve_folder_paths(folders)
    assignments = file_folders.select("document_id", "folder_id")
    return (
        documents.join(assignments, "document_id", "left")
        .join(F.broadcast(paths), F.col("folder_id") == paths.id, "left")
        .select(
            "document_id",
            "filename",
            F.coalesce("path", F.lit("")).alias("folder_path"),
        )
    )
