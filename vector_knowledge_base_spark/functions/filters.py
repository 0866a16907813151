"""Filter-DSL translation (SURVEY.md §2.2 F1).

The reference converts a ``{key: value}`` dict into Qdrant ``Filter``
objects (/root/reference/backend/vector_db.py:136-163): scalar → equality
(MatchValue), list → IN (MatchAny), ``date_range {gte, lte}`` → Range on
``upload_date``; all conditions conjoined (``must``).

Here the same DSL becomes one boolean Column. Because it is a plain
Catalyst predicate, it is pushed into the Parquet scan automatically —
the distributed analog of Qdrant evaluating payload filters inside HNSW
traversal rather than post-filtering.
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F

# UI sentinel for "no cluster filter" (/root/reference/backend/constants.py:12,
# handled at /root/reference/backend/main.py:203-207).
ALL_CLUSTERS_SENTINEL = "all"


def filter_dsl_to_mask(
    filters: Mapping[str, Any] | None,
    pdf,
    date_column: str = "upload_date",
):
    """The SAME filter DSL evaluated against a driver-held pandas
    payload frame — the serving-tier twin of ``filter_dsl_to_column``,
    kept in this module so the two translations evolve together (the
    facade's ``search(mode="serve")`` pre-filters the in-process kNN
    artifact with this mask; Qdrant's payload-filter-inside-the-walk
    regime, reference backend/vector_db.py:136-163).

    Semantics mirror the Column form: conditions AND-ed, scalar →
    equality, list → IN, ``date_range {gte, lte}`` → bounds on
    ``date_column``, ``cluster == "all"`` skipped, and NULL payload
    values never match (pandas NaN comparisons are False, same as
    Spark's null-rejecting predicates)."""
    import pandas as pd

    mask = pd.Series(True, index=pdf.index)
    if not filters:
        return mask
    for key, value in filters.items():
        if key == "date_range":
            if not isinstance(value, Mapping):
                raise ValueError("date_range filter must be a mapping")
            gte, lte = value.get("gte"), value.get("lte")
            col = pd.to_datetime(pdf[date_column])
            if gte is not None:
                mask &= col >= pd.to_datetime(gte)
            if lte is not None:
                mask &= col <= pd.to_datetime(lte)
        elif key == "cluster" and value == ALL_CLUSTERS_SENTINEL:
            continue
        elif isinstance(value, (list, tuple, set)):
            mask &= pdf[key].isin(list(value))
        else:
            mask &= pdf[key] == value
    return mask


def filter_dsl_to_column(
    filters: Mapping[str, Any] | None,
    date_column: str = "upload_date",
) -> Column:
    """Translate the reference's filter dict into a single AND-ed predicate.

    - scalar value        → col == value
    - list value          → col IN values
    - "date_range" key    → date_column BETWEEN gte AND lte (either bound
                            optional, matching Range semantics)
    - "cluster" == "all"  → skipped (sentinel)
    """
    cond = F.lit(True)
    if not filters:
        return cond
    for key, value in filters.items():
        if key == "date_range":
            if not isinstance(value, Mapping):
                raise ValueError("date_range filter must be a mapping")
            gte, lte = value.get("gte"), value.get("lte")
            if gte is not None:
                cond = cond & (F.col(date_column) >= F.lit(gte))
            if lte is not None:
                cond = cond & (F.col(date_column) <= F.lit(lte))
        elif key == "cluster" and value == ALL_CLUSTERS_SENTINEL:
            continue
        elif isinstance(value, (list, tuple, set)):
            cond = cond & F.col(key).isin(list(value))
        else:
            cond = cond & (F.col(key) == F.lit(value))
    return cond
