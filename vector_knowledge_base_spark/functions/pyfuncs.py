"""The remaining Python-function families of SURVEY §2.11: a grouped-
aggregate pandas UDF (UDAF) and a Spark-4 Python UDTF.

The production hot paths in this engine are scalar pandas UDFs and
mapInPandas (Arrow-batched — pipeline/embed.py, pipeline/extract.py);
these two exist because a complete engine must also cover the
aggregate- and table-function surfaces. The UDTF is row-based by
API design — for bulk explosion prefer the native ``explode`` /
``posexplode`` (JVM) or ``mapInPandas`` (Arrow); the UDTF is for logic
that genuinely needs per-row Python with multi-row output and lateral
references.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf("double")
def geomean_udaf(v: pd.Series) -> float:
    """Grouped-aggregate pandas UDF: geometric mean of a positive
    series, computed in log space (Arrow ships the group's values as
    one Series; the mean-of-logs form never overflows the product)."""
    import numpy as np

    return float(np.exp(np.log(v.to_numpy(dtype="float64")).mean()))


@F.udtf(returnType="pos int, token string")
class TokenizeUDTF:
    """Python UDTF (Spark 4 surface): one text in → one row per token,
    with its 0-based position. Used via lateral join:
    ``df.lateralJoin(tokenize_udtf(F.col("text").outer()))``."""

    def eval(self, text: str):
        if text is None:
            return
        for i, tok in enumerate(text.split(" ")):
            yield i, tok
