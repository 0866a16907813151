"""Iterative BPE training (operators/bpe.py): live cross-check against
an independent pure-Python BPE implementation, the exact symbol-count
invariant (each adopted merge with weighted count n removes exactly n
symbols), and the fertility drop on real testdata."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from vector_knowledge_base_spark.operators.bpe import (
    bpe_train,
    word_frequencies,
)

SF_DIR = "/root/testdata/sf0.001"


def _py_bpe(word_counts: dict[str, int], k: int):
    """Independent reference: same argmax rule (count desc, pair
    lexicographic), same greedy left-to-right re-segmentation."""
    seg = {w: list(w) for w in word_counts}
    merges = []
    for rnd in range(k):
        c: Counter = Counter()
        for w, n in word_counts.items():
            s = seg[w]
            for i in range(len(s) - 1):
                c[(s[i], s[i + 1])] += n
        if not c:
            break
        (a, b), cnt = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((rnd, a, b, cnt))
        for w in seg:
            s, out, i = seg[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seg[w] = out
    return merges, seg


def _total_syms(seg_df) -> int:
    return seg_df.select(
        F.sum(F.size("syms") * F.col("n")).alias("t")
    ).collect()[0]["t"]


def test_bpe_train_matches_pure_python_reference(spark):
    texts = [
        "banana bandana ban banana and sand band",
        "sandal banana and and band bandana standard",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    wf = word_frequencies(docs)
    counts = {r["word"]: r["n"] for r in wf.collect()}
    merges, seg = bpe_train(wf, k=8)
    ref_merges, ref_seg = _py_bpe(counts, 8)
    assert merges == ref_merges
    got_seg = {r["word"]: r["syms"] for r in seg.collect()}
    assert got_seg == ref_seg


def test_bpe_symbol_count_invariant_on_testdata(spark):
    """On real documents: adopting a merge with weighted count n must
    reduce the total weighted symbol count by EXACTLY n — the sharp
    per-round conservation law of BPE (two symbols become one per
    occurrence). Checked for every round, plus strict fertility drop."""
    from vector_knowledge_base_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(200)
    wf = word_frequencies(docs).localCheckpoint(eager=True)
    n_occ = wf.select(F.sum("n")).collect()[0][0]

    totals = []
    merges_so_far: list = []
    # re-run training at increasing k: round i's seg total must equal
    # round i-1's minus the adopted count (bpe_train re-derives the
    # same prefix each time — determinism of the argmax rule)
    for k in range(4):
        merges, seg = bpe_train(wf, k=k)
        if k > 0:
            assert merges[: len(merges_so_far)] == merges_so_far
        merges_so_far = merges
        totals.append(_total_syms(seg))
    for i, (_, _, _, cnt) in enumerate(merges_so_far[:3]):
        assert totals[i] - totals[i + 1] == cnt
    fertility = [t / n_occ for t in totals]
    assert all(a > b for a, b in zip(fertility, fertility[1:]))


def test_bpe_split_empty_produces_single_chars(spark):
    df = spark.createDataFrame([("abc",)], ["word"])
    got = df.select(F.split("word", "").alias("s")).collect()[0]["s"]
    assert got == ["a", "b", "c"]


def test_bpe_apply_matches_python_reference(spark):
    """Tokenizer APPLY (bpe_apply): encoding words — including unseen
    ones — under a trained merge list must equal the pure-Python greedy
    replay, merge by merge in adoption order."""
    from vector_knowledge_base_spark.operators.bpe import bpe_apply

    texts = [
        "low low low low low lower lower newest newest",
        "newest newest newest newest widest lowest lowest new",
        "lower newest widest widest low new new wider",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    wf = word_frequencies(docs)
    merges, _ = bpe_train(wf, k=6)

    def py_apply(word):
        s = list(word)
        for _r, a, b, _n in merges:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        return s

    eval_words = ["lowest", "newer", "slow", "widest", "news", "unseen",
                  "lowlow", "a", "", "wwww"]
    frame = spark.createDataFrame([(w,) for w in eval_words], "word string")
    got = {r["word"]: r["syms"] for r in bpe_apply(frame, merges).collect()}
    for w in eval_words:
        assert got[w] == py_apply(w), w


def test_bpe_apply_accepts_bare_pairs_and_checkpoints(spark):
    """bpe_apply accepts bare (a, b) pairs (a persisted merge file
    without counts) and survives lineage truncation mid-list."""
    from vector_knowledge_base_spark.operators.bpe import bpe_apply

    frame = spark.createDataFrame([("abab",), ("aabb",)], "word string")
    got = {
        r["word"]: r["syms"]
        for r in bpe_apply(
            frame, [("a", "b"), ("ab", "ab")], checkpoint_every=1
        ).collect()
    }
    assert got["abab"] == ["abab"]
    assert got["aabb"] == ["a", "ab", "b"]
