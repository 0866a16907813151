"""Vector math as native Spark SQL expressions — the engine's replacement
for Qdrant's cosine scorer (/root/reference/backend/vector_db.py:41,
``Distance.COSINE``).

Everything here is a Column expression built from ``zip_with`` /
``aggregate`` higher-order functions: it executes inside whole-stage
codegen on the JVM, never crossing into Python. That is the difference
between O(rows) vectorized execution and a per-row Python UDF at 100 TB.

Accumulation is in DOUBLE regardless of the storage type (testdata stores
``array<float>``): element order is the array order, so the fold is
deterministic and bit-comparable with any engine that also folds
left-to-right in double (DuckDB's list_dot_product does).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Σ a[i]*b[i], accumulated in double, JVM-side."""
    a, b = _as_col(a), _as_col(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm of an array column."""
    a = _as_col(a)
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def l2_normalize(a: Column | str) -> Column:
    """Unit-normalize an array column (write-time invariant: normalized
    embeddings make cosine ≡ dot product, saving a norm per comparison —
    the reference gets this from Qdrant's internal normalization)."""
    a = _as_col(a)
    nrm = l2_norm(a)
    return F.transform(a, lambda x: x.cast("double") / nrm)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Full cosine (dot / norms). Use ``dot_product`` directly when both
    sides are unit-normalized."""
    a, b = _as_col(a), _as_col(b)
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def l2_normalize_arrow(df, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Arrow-native batch normalization via ``mapInArrow`` — the
    zero-copy sibling of the pandas-UDF path: each Arrow RecordBatch's
    list<float> column is viewed as a contiguous (n, dim) float64
    matrix (one ``flatten`` — no per-row Python objects, no pandas
    boxing), normalized with BLAS-backed numpy, and re-emitted as Arrow
    arrays. Use this shape for wide numeric kernels where even the
    pandas-UDF Arrow→pandas→Arrow round-trip is measurable; semantics
    are identical to the JVM-side ``l2_norm`` expression, which is the
    oracle-checked reference.

    Returns (id, l2_norm, unit_x) where unit_x is the first component
    of the unit-normalized vector."""

    def _batches(it):
        import numpy as np
        import pyarrow as pa

        for batch in it:
            ids = batch.column(0)
            emb = batch.column(1)
            n = len(emb)
            if n == 0:
                continue
            flat = emb.flatten().to_numpy(zero_copy_only=False).astype("float64")
            m = flat.reshape(n, len(flat) // n)
            norms = np.sqrt(np.einsum("ij,ij->i", m, m))
            unit_x = m[:, 0] / norms
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(np.round(norms, 6)), pa.array(np.round(unit_x, 6))],
                names=[id_col, "l2_norm", "unit_x"],
            )

    return df.select(id_col, vec_col).mapInArrow(
        _batches, f"{id_col} long, l2_norm double, unit_x double"
    )
