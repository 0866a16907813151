"""Chunker invariants (FIXTURES.md §3): pure-Python fast tests."""

from __future__ import annotations

from vector_knowledge_base_spark.pipeline.chunker import (
    CHUNK_OVERLAP,
    CHUNK_SIZE,
    MAX_MODEL_TOKENS,
    chunk_document,
    count_tokens_ws,
    split_oversized,
)


def make_prose(n_sentences: int, words_per_sentence: int = 12) -> str:
    return " ".join(
        "Word " * (words_per_sentence - 1) + f"end{i}." for i in range(n_sentences)
    )


def test_empty_text():
    assert chunk_document("") == []
    assert chunk_document(None) == []


def test_single_sentence():
    chunks = chunk_document("Hello world.")
    assert len(chunks) == 1
    assert chunks[0]["chunk_index"] == 0
    assert chunks[0]["token_count"] == 2


def test_token_cap_invariant():
    text = make_prose(400)  # 400 sentences x 12 tokens = 4800 tokens
    chunks = chunk_document(text)
    assert len(chunks) > 1
    for c in chunks:
        assert c["token_count"] <= CHUNK_SIZE


def test_chunk_index_dense():
    chunks = chunk_document(make_prose(300))
    assert [c["chunk_index"] for c in chunks] == list(range(len(chunks)))


def test_overlap_at_least_min():
    """Consecutive chunks share ≥ CHUNK_OVERLAP tokens: the suffix of
    chunk N reappears as the prefix of chunk N+1 (sentence-level
    backtrack, reference chunker.py:135-152)."""
    chunks = chunk_document(make_prose(300))
    assert len(chunks) > 2
    for a, b in zip(chunks, chunks[1:]):
        aw, bw = a["text"].split(), b["text"].split()
        max_k = 0
        for k in range(1, min(len(aw), len(bw)) + 1):
            if aw[-k:] == bw[:k]:
                max_k = k
        assert max_k >= CHUNK_OVERLAP


def test_coverage():
    """Every input sentence appears in at least one chunk."""
    text = make_prose(100)
    chunks = chunk_document(text)
    joined = " ".join(c["text"] for c in chunks)
    for i in range(100):
        assert f"end{i}." in joined


def test_oversized_sentence_split():
    # one "sentence" with 1200 tokens and no boundaries
    text = "word " * 1200
    pieces = split_oversized(text.strip())
    assert all(count_tokens_ws(p) <= MAX_MODEL_TOKENS for p in pieces)
    assert sum(count_tokens_ws(p) for p in pieces) == 1200
    chunks = chunk_document(text.strip())
    assert all(c["token_count"] <= CHUNK_SIZE for c in chunks)


def test_python_code_chunking():
    code = "\n".join(
        f"def f{i}():\n    return {i}" for i in range(600)
    )  # each def ~ 5 tokens
    chunks = chunk_document(code, language="py")
    assert len(chunks) > 1
    assert all(c["token_count"] <= CHUNK_SIZE for c in chunks)
    # node boundaries respected: every chunk starts with a def
    assert all(c["text"].startswith("def ") for c in chunks)


def test_code_syntax_error_falls_back_to_prose():
    bad = "def broken(:\n    pass. This is not Python. At all."
    chunks = chunk_document(bad, language="py")
    assert len(chunks) >= 1  # prose fallback produced chunks


def test_non_python_code_uses_prose():
    js = "function f() { return 1; } This is. Treated as prose."
    assert chunk_document(js, language="js") == chunk_document(js, language=None)
