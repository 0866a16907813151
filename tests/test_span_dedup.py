"""Wave 78 — C4-style span-level dedup (Raffel et al. 2020 §2.2).

The registry oracle test already hash-checks all three queries against
DuckDB at sf0.01; this file pins the SEMANTICS on a hand-derived inline
fixture (so a correct-but-different interpretation of "span" or
"canonical occurrence" cannot slip past two engines agreeing on the
wrong thing) plus the scale-bound assumptions the arithmetic occurrence
key relies on.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_knowledge_base_spark.queries import (
    _SPAN_W,
    _span_occurrences,
    q_c4_span_dedup,
    q_c4_span_dedup_rewrite,
)

SF_DIR = "/root/testdata/sf0.001"


def _spans(text: str) -> list[str]:
    toks = text.split(" ")
    return [
        " ".join(toks[i : i + _SPAN_W]) for i in range(0, len(toks), _SPAN_W)
    ]


def _python_dedup(docs: dict[int, str]):
    """Independent pure-Python rerun of the C4 rule: first occurrence
    (doc_id, span_idx) of each distinct span survives, later ones drop."""
    seen: dict[str, tuple[int, int]] = {}
    kept: dict[int, list[str]] = {d: [] for d in docs}
    removed: dict[int, int] = {d: 0 for d in docs}
    for doc_id in sorted(docs):
        for idx, span in enumerate(_spans(docs[doc_id])):
            if span in seen and seen[span] != (doc_id, idx):
                removed[doc_id] += 1
            else:
                seen.setdefault(span, (doc_id, idx))
                kept[doc_id].append(span)
    return kept, removed


@pytest.fixture(scope="module")
def inline_docs(spark, tmp_path_factory):
    # doc 2 repeats doc 1's opening span; doc 3 repeats a span WITHIN
    # itself; doc 4 is entirely a duplicate of doc 1 (drops fully from
    # the rewrite); doc 5 has a trailing partial span.
    docs = {
        1: "a b c d e f",
        2: "a b c x y z",
        3: "p q r p q r",
        4: "a b c d e f",
        5: "m n o g h",
    }
    d = tmp_path_factory.mktemp("span_dedup")
    spark.createDataFrame(
        [(k, v, "en", "inline", len(v)) for k, v in docs.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d), docs


def test_span_slicing_matches_python(spark, inline_docs):
    sf, docs = inline_docs
    got = {
        (r["doc_id"], r["span_idx"]): r["span"]
        for r in _span_occurrences(spark, sf).collect()
    }
    want = {
        (d, i): s for d, t in docs.items() for i, s in enumerate(_spans(t))
    }
    assert got == want


def test_dedup_counts_match_python(spark, inline_docs):
    sf, docs = inline_docs
    _, removed = _python_dedup(docs)
    rows = {r["doc_id"]: r for r in q_c4_span_dedup(spark, sf).collect()}
    for d, t in docs.items():
        assert rows[d]["n_spans"] == len(_spans(t))
        assert rows[d]["n_removed"] == removed[d], f"doc {d}"
        assert rows[d]["n_kept"] == len(_spans(t)) - removed[d]


def test_rewrite_matches_python(spark, inline_docs):
    sf, docs = inline_docs
    kept, _ = _python_dedup(docs)
    rows = {
        r["doc_id"]: r for r in q_c4_span_dedup_rewrite(spark, sf).collect()
    }
    import hashlib

    for d in docs:
        clean = " ".join(kept[d])
        if not kept[d]:
            assert d not in rows  # fully-duplicate doc drops out
            continue
        assert rows[d]["n_chars_clean"] == len(clean)
        assert (
            rows[d]["clean_fingerprint"]
            == hashlib.md5(clean.encode()).hexdigest()
        )
    # doc 4 (exact duplicate of doc 1) must have dropped entirely
    assert 4 not in rows


def test_occ_key_bound_holds_on_real_data(spark):
    """The arithmetic occurrence key doc_id*100000+span_idx is a valid
    lexicographic encoding only while span_idx < 100000; assert the
    bound on real testdata so a corpus change that breaks it fails
    loudly here, not as a silent mis-canonicalization."""
    mx = (
        _span_occurrences(spark, SF_DIR)
        .agg(F.max("span_idx").alias("m"))
        .first()["m"]
    )
    assert mx < 100000
