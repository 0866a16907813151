"""Exact-substring deduplication (Lee et al., "Deduplicating Training
Data Makes Language Models Better", ACL 2022) — the canonical LLM-dedup
mode MinHash does not cover: two documents sharing one verbatim run of
≥ K tokens (boilerplate, license headers, copied passages) can still
have low global Jaccard, yet the run itself is what leaks across a
train/eval split and what memorization studies count.

The paper builds a corpus-level suffix array; the relational
re-expression here is the sorted fixed-length-gram formulation:

1. each document emits its K-token grams WITH their positions
   (one explode — same shape as the MinHash shingle stage);
2. a gram shared by ≥ 2 distinct documents is a "duplicated gram"
   (one hash aggregation over the gram key — this IS the suffix-array
   bucket: all suffixes sharing a K-prefix land in one group);
3. per document, consecutive duplicated positions form runs
   (gaps-and-islands over a per-document window); a run of R
   consecutive duplicated K-grams is a verbatim shared substring of
   R + K − 1 tokens.

Every step is a hash-agg / per-doc window — SQL-expressible, so the
whole operator is oracle-checkable in DuckDB (unlike a literal suffix
automaton).

Scale notes (100 TB):
- grams are hashed to 64-bit ints BEFORE the shuffle (the gram text
  never leaves the map side), so shuffle volume is docs × positions × 8
  bytes — the same budget as the MinHash signature stage;
- the gram-frequency aggregation is map-side combinable; the skew risk
  is a mega-frequent boilerplate gram (every copy of a license header).
  Its GROUP is fine (count-distinct partials merge), but the join back
  to positions fans out: cap it with ``max_df`` — grams in more than
  ``max_df`` docs are still flagged duplicated (they obviously are) via
  the df value itself, not by joining their full posting lists — the
  same pressure valve as ngram_jaccard_df_capped;
- the per-doc runs window partitions by doc_id: bounded by document
  length, never global. No unpartitioned sort anywhere (the paper's
  global suffix sort is replaced by the gram-key hash partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _gram_hash(col):
    """Portable 64-bit gram hash: first 8 hex chars of md5 — identical
    expression exists in DuckDB, keeping the operator oracle-checkable
    (Spark's murmur hash() is engine-private)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def exact_substring_profile(
    docs: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
) -> DataFrame:
    """Per-document exact-substring duplication profile:

    (doc_id, n_kgrams, n_dup_kgrams, longest_dup_run) where
    ``longest_dup_run`` is the longest verbatim token run (in tokens,
    ≥ k when nonzero) this document shares with at least ``min_df − 1``
    other documents. Documents shorter than ``k`` tokens are excluded
    (they have no K-gram — same convention as the paper's minimum
    match length).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.split(F.col(text_col), " ").alias("t")
    ).where(F.size("t") >= k)
    grams = toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - k),
                lambda i: F.array_join(F.slice(F.col("t"), i + 1, k), " "),
            )
        ).alias("pos", "gram"),
    ).select("doc_id", "pos", _gram_hash(F.col("gram")).alias("gh"))

    # suffix-array bucket: grams appearing in >= min_df distinct docs
    dup_grams = (
        grams.groupBy("gh")
        .agg(F.countDistinct("doc_id").alias("df"))
        .where(F.col("df") >= min_df)
        .select("gh")
    )
    dup_pos = grams.join(dup_grams, "gh").select("doc_id", "pos")

    # gaps-and-islands: consecutive duplicated positions -> one run
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = (
        dup_pos.withColumn("grp", F.col("pos") - F.row_number().over(w))
        .groupBy("doc_id", "grp")
        .agg((F.count(F.lit(1)) + F.lit(k - 1)).alias("run_tokens"))
    )
    per_doc_dup = (
        dup_pos.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_dup_kgrams"))
    )
    per_doc_run = runs.groupBy("doc_id").agg(
        F.max("run_tokens").alias("longest_dup_run")
    )
    base = toks.select(
        "doc_id", (F.size("t") - F.lit(k - 1)).cast("long").alias("n_kgrams")
    )
    return (
        base.join(per_doc_dup, "doc_id", "left")
        .join(per_doc_run, "doc_id", "left")
        .select(
            "doc_id",
            "n_kgrams",
            F.coalesce("n_dup_kgrams", F.lit(0)).cast("long").alias("n_dup_kgrams"),
            F.coalesce("longest_dup_run", F.lit(0)).cast("long").alias(
                "longest_dup_run"
            ),
        )
    )


def exact_substring_dedup_mask(
    docs: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_run: int | None = None,
) -> DataFrame:
    """The actionable form: per document, the token spans to cut.

    Returns (doc_id, span_start, span_len_tokens) — one row per maximal
    duplicated run of at least ``min_run`` tokens (default: k, i.e.
    every run). The paper removes one copy and keeps a canonical one;
    emitting spans instead of rewriting text keeps the operator
    engine-side (the cut itself is a cheap substring job downstream and
    policy — keep-first vs keep-longest-doc — stays with the caller).
    """
    min_run = k if min_run is None else min_run
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.split(F.col(text_col), " ").alias("t")
    ).where(F.size("t") >= k)
    grams = toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - k),
                lambda i: F.array_join(F.slice(F.col("t"), i + 1, k), " "),
            )
        ).alias("pos", "gram"),
    ).select("doc_id", "pos", _gram_hash(F.col("gram")).alias("gh"))
    dup_grams = (
        grams.groupBy("gh")
        .agg(F.countDistinct("doc_id").alias("df"))
        .where(F.col("df") >= 2)
        .select("gh")
    )
    dup_pos = grams.join(dup_grams, "gh").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    return (
        dup_pos.withColumn("grp", F.col("pos") - F.row_number().over(w))
        .groupBy("doc_id", "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.count(F.lit(1)) + F.lit(k - 1)).alias("span_len_tokens"),
        )
        .where(F.col("span_len_tokens") >= min_run)
        .select("doc_id", "span_start", "span_len_tokens")
    )
