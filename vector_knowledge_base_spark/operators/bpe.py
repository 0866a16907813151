"""Iterative BPE tokenizer-vocabulary training (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units" — the
public algorithm behind GPT-2/LLaMA-style tokenizers; reference repo
has no tokenizer trainer, this is part of the LLM-training-data
operator family).

The classic formulation trains on the WORD-FREQUENCY dictionary, not
the raw corpus: aggregate words once (corpus-scale shuffle of short
strings), then iterate k merge rounds over the distinct-word table —
typically orders of magnitude smaller than the corpus, and the only
state carried between rounds. Each round is:

1. count adjacent symbol pairs weighted by word frequency
   (explode → map-side-combinable hash-agg; shuffle keys are tiny
   symbol pairs);
2. adopt the most frequent pair (deterministic tie-break: count desc,
   then pair lexicographic) — one driver ``first()``, the per-round
   argmax every BPE trainer performs (iterative algorithm, same
   driver-loop shape as KMeans);
3. re-segment every word by greedy left-to-right replacement of that
   pair (an ``aggregate`` fold over the symbol array — interpreted
   lambda, but over the distinct-word table, not the corpus), then
   ``localCheckpoint`` to truncate the k-deep lineage.

Invariant (tested): adopting a merge with weighted count n reduces the
total weighted symbol count by EXACTLY n — each occurrence replaces
two symbols with one. Fertility (symbols per word occurrence) is
therefore strictly decreasing in k while merges remain adoptable.

At 100 TB: the word-frequency aggregation is the only corpus-scale
stage; the k-round loop runs on the |vocab|-sized table (tens of
millions of rows at web scale — a few GB), so round cost is
independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_frequencies(
    docs: DataFrame, text_col: str = "text", min_len: int = 2
) -> DataFrame:
    """(word, n) distinct-word frequency table — BPE's training input."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.length("word") >= min_len)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _segment_chars(word: Column) -> Column:
    """Initial segmentation: one single-character symbol per position.
    Spark's split('', '') yields [''] where the algorithm needs [] —
    the empty word must encode to zero tokens (the training path never
    sees it through the min_len filter, but bpe_apply can)."""
    return F.when(
        F.length(word) == 0, F.expr("CAST(array() AS array<string>)")
    ).otherwise(F.split(word, ""))


def _pair_counts(seg: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word frequency."""
    # zip_with over two shifted slices: slice length 0 is an empty
    # array, so 1-symbol words emit no pair (sequence(1, size-1) would
    # instead produce the DESCENDING [1, 0] and index out of bounds)
    pairs = seg.select(
        F.explode(
            F.expr(
                "zip_with(slice(syms, 1, size(syms) - 1),"
                "         slice(syms, 2, size(syms) - 1),"
                "         (x, y) -> struct(x AS a, y AS b))"
            )
        ).alias("p"),
        "n",
    )
    return pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b")).agg(
        F.sum("n").alias("cnt")
    )


def _merge_pair(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right replacement of adjacent (a, b) with a+b —
    the standard BPE application order ('aaa' + merge(a,a) → [aa, a]).
    Built with the Column API (literals bound via F.lit), never by
    splicing symbol text into SQL strings."""

    def step(acc: Column, x: Column) -> Column:
        mergeable = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b))
        )
        return F.when(
            mergeable,
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(
        syms, F.expr("CAST(array() AS array<string>)"), step
    )


def bpe_train(
    words: DataFrame, k: int, max_rounds_without_pair: bool = True
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Train k BPE merges over a (word, n) frequency table.

    Returns (merges, segmented): ``merges`` is
    [(round, left_symbol, right_symbol, weighted_count), ...] in
    adoption order; ``segmented`` is the final (word, n, syms) table
    re-segmented under all adopted merges. Stops early if no adjacent
    pair remains (every word fully merged)."""
    seg = words.select(
        "word", "n", _segment_chars(F.col("word")).alias("syms")
    ).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for rnd in range(k):
        best = (
            _pair_counts(seg)
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], best[0]["cnt"]
        merges.append((rnd, a, b, int(cnt)))
        seg = seg.select(
            "word", "n", _merge_pair(F.col("syms"), a, b).alias("syms")
        ).localCheckpoint(eager=True)
    return merges, seg


def bpe_apply(
    words: DataFrame, merges: list, checkpoint_every: int = 4
) -> DataFrame:
    """Tokenizer APPLY: segment each ``word`` under an already-trained
    merge list (adoption order matters — BPE encodes new text by
    replaying merges in training order, which is what makes the
    vocabulary stable across corpora). Input: any frame with a ``word``
    column; output: same frame + ``syms`` (the token array).

    Scale shape: like training, apply runs on the DISTINCT-WORD table
    and fans back to the corpus with one broadcast/hash join — the k
    folds never touch corpus-scale data. The k ``aggregate`` folds
    chain in one plan; lineage is truncated every ``checkpoint_every``
    rounds so deep vocabularies don't build unbounded expression trees.
    """
    seg = words.withColumn("syms", _segment_chars(F.col("word")))
    for i, m in enumerate(merges):
        # accept (round, a, b, n) training tuples or bare (a, b) pairs
        a, b = (m[1], m[2]) if len(m) >= 3 else (m[0], m[1])
        seg = seg.withColumn("syms", _merge_pair(F.col("syms"), a, b))
        if (i + 1) % checkpoint_every == 0:
            seg = seg.localCheckpoint(eager=True)
    return seg
