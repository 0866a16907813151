"""Deduplication operators (north-star LLM-pipeline family).

Exact dedup is a hash-groupBy (see queries.dedup_exact). This module holds
the *near*-dup operators:

- ``allpairs_cosine_blocked`` — exact all-pairs cosine above a threshold,
  executed as block-matrix multiplication: the corpus is grouped into
  blocks of ~``block_size`` vectors, block pairs are joined (upper
  triangle), and each pair is scored with one vectorized numpy matmul
  inside ``applyInPandas``. Work is O(n²/2) like any exact all-pairs, but
  (a) BLAS does the inner loop ~100× faster than per-row expression
  evaluation, and (b) the block-pair grid parallelizes across executors
  evenly — at 100 TB you bound executor memory by block_size and let the
  grid fan out. This replaces the naive non-equi self-join, which
  compiles to BroadcastNestedLoopJoin with per-pair array folds.

- ``minhash_neardup`` / helpers live in queries (SQL-expressible shingle
  pipeline) — see queries.py minhash section.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAIR_SCHEMA = T.StructType(
    [
        T.StructField("vec_id_a", T.LongType()),
        T.StructField("vec_id_b", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def allpairs_cosine_blocked(
    emb: DataFrame,
    threshold: float = 0.9,
    block_size: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """All (a, b) pairs with a < b and dot(a, b) > threshold (unit-norm
    vectors ⇒ cosine). Exact — used as the correctness oracle for the
    approximate LSH path.

    Plan shape:
      1. assign block id = floor(row_id / block_size) — contiguous by id
         so the driver needs no shuffle-side balancing;
      2. pack each block into one row (collect_list) — ~block_size×dim
         floats per row;
      3. join the block table with itself on blk_a <= blk_b (grid upper
         triangle, tiny relation: B rows → B(B+1)/2 pairs);
      4. per grid cell: numpy matmul, emit surviving pairs.
    """
    import numpy as np

    blocks = (
        emb.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_vec"),
            (F.col(id_col) / block_size).cast("long").alias("_blk"),
        )
        .groupBy("_blk")
        .agg(
            F.collect_list(F.struct("_id", "_vec")).alias("_rows"),
        )
    )
    a = blocks.select(
        F.col("_blk").alias("blk_a"), F.col("_rows").alias("rows_a")
    )
    b = blocks.select(
        F.col("_blk").alias("blk_b"), F.col("_rows").alias("rows_b")
    )
    grid = a.join(b, F.col("blk_a") <= F.col("blk_b"))

    thr = float(threshold)

    def score_cell(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            for _, row in pdf.iterrows():
                ids_a = np.array([r["_id"] for r in row["rows_a"]], dtype=np.int64)
                mat_a = np.array(
                    [r["_vec"] for r in row["rows_a"]], dtype=np.float64
                )
                ids_b = np.array([r["_id"] for r in row["rows_b"]], dtype=np.int64)
                mat_b = np.array(
                    [r["_vec"] for r in row["rows_b"]], dtype=np.float64
                )
                scores = mat_a @ mat_b.T
                ia, ib = np.where(scores > thr)
                if len(ia) == 0:
                    continue
                va, vb = ids_a[ia], ids_b[ib]
                keep = va < vb  # upper triangle at the id level
                if not keep.any():
                    continue
                yield pd.DataFrame(
                    {
                        "vec_id_a": va[keep],
                        "vec_id_b": vb[keep],
                        "score": np.round(scores[ia[keep], ib[keep]], round_digits),
                    }
                )

    return grid.mapInPandas(score_cell, schema=PAIR_SCHEMA)


NN_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("nn_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def exact_nn_blocked(
    emb: DataFrame,
    block_size: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact nearest neighbor (top-1 by dot product, self excluded) for
    EVERY vector, via the same block-matrix grid as
    ``allpairs_cosine_blocked``: per grid cell a BLAS matmul reduces
    each row to its best in-cell candidate, and a hash aggregate merges
    per-cell winners into the global argmax. O(n²) by design — this is
    the exact audit/oracle path (the reciprocal-NN dedup-confidence
    report consumes it); LSH/IVF (operators/ann.py) are the scale path.

    Determinism: candidates are ranked by (score ROUNDED to
    ``round_digits``, then smallest id) both inside the numpy kernel
    and in the merging aggregate, so block boundaries can never flip a
    tie differently than a single-pass ranking would.
    """
    import numpy as np

    blocks = (
        emb.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_vec"),
            (F.col(id_col) / block_size).cast("long").alias("_blk"),
        )
        .groupBy("_blk")
        .agg(F.collect_list(F.struct("_id", "_vec")).alias("_rows"))
    )
    a = blocks.select(F.col("_blk").alias("blk_a"), F.col("_rows").alias("rows_a"))
    b = blocks.select(F.col("_blk").alias("blk_b"), F.col("_rows").alias("rows_b"))
    grid = a.join(b, F.lit(True))  # full grid: NN candidates of A against B

    def best_in_cell(pdfs):
        for pdf in pdfs:
            for _, row in pdf.iterrows():
                ids_a = np.array([r["_id"] for r in row["rows_a"]], dtype=np.int64)
                mat_a = np.array([r["_vec"] for r in row["rows_a"]], dtype=np.float64)
                ids_b = np.array([r["_id"] for r in row["rows_b"]], dtype=np.int64)
                mat_b = np.array([r["_vec"] for r in row["rows_b"]], dtype=np.float64)
                scores = np.round(mat_a @ mat_b.T, round_digits)
                scores[np.equal.outer(ids_a, ids_b)] = -np.inf  # exclude self
                # rank in-cell by (score desc, id asc): sort column order
                # by id so argmax returns the smallest-id tie
                order = np.argsort(ids_b)
                scores, ids_s = scores[:, order], ids_b[order]
                j = np.argmax(scores, axis=1)
                sc = scores[np.arange(len(ids_a)), j]
                ok = np.isfinite(sc)
                if not ok.any():
                    continue
                yield pd.DataFrame(
                    {
                        "vec_id": ids_a[ok],
                        "nn_id": ids_s[j[ok]],
                        "score": sc[ok],
                    }
                )

    cell_best = grid.mapInPandas(best_in_cell, schema=NN_SCHEMA)
    # merge per-cell winners: max of (score, -id) = best score, then
    # smallest id — the same key the kernel used
    merged = cell_best.groupBy("vec_id").agg(
        F.max(F.struct(F.col("score"), (-F.col("nn_id")).alias("neg_id"))).alias("m")
    )
    return merged.select(
        "vec_id",
        (-F.col("m.neg_id")).cast("long").alias("nn_id"),
        F.col("m.score").alias("score"),
    )
