"""Scalar text functions (SURVEY §2.2 F4-F6, §2.8 C-family) as native
Column expressions — each mirrors a reference behavior."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sanitize_filename(col: Column | str) -> Column:
    """F5: filename sanitization
    (/root/reference/backend/ingestion.py:27-55): strip path components,
    drop control chars, replace Windows-illegal chars with '_', cap at
    200 chars preserving the extension (the reference splits the
    extension first and truncates only the stem, so a >200-char name
    keeps its extension and downstream extension-based dispatch still
    works), empty → 'unnamed_file'."""
    c = F.col(col) if isinstance(col, str) else col
    base = F.element_at(F.split(c, r"[/\\]"), -1)
    cleaned = F.regexp_replace(base, r"[\x00-\x1f\x7f]", "")
    replaced = F.regexp_replace(cleaned, r'[<>:"/\\|?*]', "_")
    # extension-preserving cap: stem is truncated to 200 − len(ext)
    ext = F.regexp_extract(replaced, r"(\.[^.]+)$", 1)
    ext_len = F.length(ext)
    stem_part = F.substring(replaced, F.lit(1), F.length(replaced) - ext_len)
    capped = F.when(
        F.length(replaced) > 200,
        F.concat(F.substring(stem_part, F.lit(1), F.lit(200) - ext_len), ext),
    ).otherwise(replaced)
    trimmed = F.trim(capped)
    return F.when(trimmed == "", F.lit("unnamed_file")).otherwise(trimmed)


def file_extension(col: Column | str) -> Column:
    """C4: lower-cased extension extraction
    (/root/reference/backend/extractors/factory.py:62-63)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_extract(c, r"(\.[^./\\]+)$", 1))


def split_tags(col: Column | str) -> Column:
    """C3: comma-split tags, trimmed, empties dropped
    (/root/reference/backend/main.py:310-312)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.transform(F.split(c, ","), lambda t: F.trim(t)), lambda t: t != ""
    )


def coalesce_payload(primary: str, fallback: str) -> Column:
    """F6: payload field coalescing (filename|course_name, text|content —
    /root/reference/backend/document_registry.py:199)."""
    return F.coalesce(F.col(primary), F.col(fallback))


def snippet(col: Column | str, max_len: int = 200) -> Column:
    """C7: truncate to max_len with '...' (frontend/search.js:283-284)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        F.length(c) > max_len, F.concat(F.substring(c, 1, max_len), F.lit("..."))
    ).otherwise(c)
