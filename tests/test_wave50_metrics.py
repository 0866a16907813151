"""Wave 50 — batch-efficiency + corpus-diversity metrics: value edge
cases and plan-shape guards (the oracle harness covers full-value
parity at sf0.01; these tests pin the scale-relevant plan properties
and the small-input edge semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_knowledge_base_spark.plans.inspect import explain_str
from vector_knowledge_base_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_padding_waste_bucket_arithmetic(spark):
    rows = QUERIES["padding_waste_by_bucket"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.bucket_cap % 64 == 0 and r.bucket_cap > 0
        # docs in a bucket have tokens in (cap-64, cap]
        assert 0 <= r.pad_tokens < 64 * r.n_docs
        assert abs(r.waste_frac - r.pad_tokens / (r.n_docs * r.bucket_cap)) < 1e-4
        assert r.sum_tokens + r.pad_tokens == r.n_docs * r.bucket_cap


def test_ngram_novelty_bounded_and_no_cartesian(spark):
    df = QUERIES["ngram_novelty_by_source"](spark, SF)
    plan = explain_str(df)
    assert "Cartesian" not in plan  # posting-list joins only
    rows = df.collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_novel <= r.n_grams
        assert 0.0 <= r.novelty_frac <= 1.0


def test_vocab_coverage_monotone(spark):
    rows = sorted(
        QUERIES["vocab_coverage_quantile"](spark, SF).collect(),
        key=lambda r: r.coverage_p,
    )
    assert [r.coverage_p for r in rows] == [0.50, 0.90, 0.95, 0.99]
    sizes = [r.vocab_size for r in rows]
    assert sizes == sorted(sizes)  # more coverage needs no smaller vocab
    assert len({r.total_tokens for r in rows}) == 1
    # the stats frames join as broadcasts, never a shuffled cross join
    plan = explain_str(QUERIES["vocab_coverage_quantile"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_vocab_coverage_window_runs_on_aggregated_vocab(spark):
    """The global window must consume the term-frequency AGGREGATE (vocab
    size), never per-token rows: assert the plan has a HashAggregate
    below the Window."""
    df = QUERIES["vocab_coverage_quantile"](spark, SF)
    plan = explain_str(df)
    w = plan.find("Window")
    assert w != -1
    assert "HashAggregate" in plan[w:], plan[:2000]


def test_compression_ratio_orders_repetitive_below_shuffled(spark):
    """Property: repetitive text compresses strictly below high-entropy
    text of the same length — the discrimination the Dolma-style filter
    relies on; plus ratio sanity bounds on the real corpus."""
    from pyspark.sql import functions as F

    from vector_knowledge_base_spark.operators.compression import (
        compression_ratios,
    )
    from vector_knowledge_base_spark.sources.tables import load_table

    rep = "token " * 200
    # deterministic pseudo-random text of comparable length
    import hashlib

    rnd = " ".join(
        hashlib.md5(str(i).encode()).hexdigest()[:5] for i in range(200)
    )
    df = spark.createDataFrame(
        [(0, rep), (1, rnd)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["ratio"] for r in compression_ratios(df).collect()}
    assert got[0] < got[1] / 3  # repetition compresses dramatically better
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    stats = (
        compression_ratios(docs)
        .agg(F.min("ratio").alias("lo"), F.max("ratio").alias("hi"))
        .first()
    )
    assert 0.0 < stats["lo"] <= stats["hi"] < 2.0
