"""Skew-aware join (100 TB posture).

AQE's skew-join split handles most runtime skew
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py); explicit
salting is the plan-level fallback when one build-side key dominates so
badly that even split partitions overwhelm a task — the classic fix for
power-law keys in training-data pipelines (one domain = billions of
rows).

``salted_join``: the skewed (large) side gets a random salt in
[0, salt); the small side is exploded ×salt so every (key, salt) bucket
finds its match. Result is IDENTICAL to the plain join — only the
shuffle distribution changes — so it is oracle-checkable against the
unsalted SQL join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``large ⋈ small`` on ``key`` with an ``salt``-way salted
    shuffle. The salt column is dropped from the output."""
    salted_large = large.withColumn(
        "_salt", (F.rand(seed=42) * salt).cast("int")
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_large.join(salted_small, [key, "_salt"], how)
    return out.drop("_salt")
