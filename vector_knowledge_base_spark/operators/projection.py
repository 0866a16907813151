"""PCA 3-D projection (SURVEY §2.9 M7-M9).

The reference fits sklearn PCA(3) on the full collected matrix, caches
the projection module-globally, and invalidates on every mutation
(/root/reference/backend/dimensionality_reduction.py:50-115,
/root/reference/backend/main.py:62-76). Here:

- MLlib ``PCA(k=3)`` fits distributed (covariance via one pass over the
  vector column), producing a ``coords3d`` table — the materialized-view
  analog of the reference's cache; refresh = re-run on data change.
- query-point transform = multiply by the broadcast principal-components
  matrix (model.pc), no second fit — mirroring the reference's
  transform-only path for queries
  (/root/reference/backend/dimensionality_reduction.py:117-158).
- corpora with < 3 rows (or < 3 dims) zero-pad the missing components
  (reference :67-94).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def project_3d(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, "object"]:
    """Fit PCA(k=3) and project every row → (id, x, y, z). Returns
    (coords3d DataFrame, fitted PCAModel) — keep the model to transform
    query vectors without re-fitting."""
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    n = emb.count()
    dim = len(emb.select(vec_col).first()[0])
    k = min(3, n, dim)

    vecs = emb.select(F.col(id_col), array_to_vector(F.col(vec_col)).alias("features"))
    model = PCA(k=k, inputCol="features", outputCol="pca").fit(vecs)
    arr = model.transform(vecs).select(
        F.col(id_col), vector_to_array(F.col("pca")).alias("coords")
    )
    # zero-pad to exactly 3 components (reference :67-94)
    comps = [
        (F.col("coords")[i] if i < k else F.lit(0.0)).alias(name)
        for i, name in enumerate(("x", "y", "z"))
    ]
    return arr.select(F.col(id_col), *comps), model


def transform_query(model, query_vector) -> list[float]:
    """Project one query vector with the fitted model's components —
    a driver-side matmul against the broadcast pc matrix (the k=10
    3-D query path, /root/reference/backend/main.py:691-754)."""
    import numpy as np

    pc = model.pc.toArray()  # (dim, k)
    q = np.asarray(query_vector, dtype=np.float64)
    out = q @ pc
    return list(out) + [0.0] * (3 - out.shape[0])
