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


def test_segment_migration_cells_cover_all_customers(spark):
    """The (was, became) matrix must partition the customer universe:
    cell counts sum to the distinct customers with any order, and no
    (absent, absent) cell can exist."""
    from vector_knowledge_base_spark import queries as q
    from vector_knowledge_base_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    rows = q.QUERIES["customer_segment_migration"](spark, sf).collect()
    total = sum(r["n_customers"] for r in rows)
    n_cust = (
        load_table(spark, sf, "orders").select("o_custkey").distinct().count()
    )
    assert total == n_cust
    assert not any(
        r["seg_p1"] == "absent" and r["seg_p2"] == "absent" for r in rows
    )


def test_peak_detection_rows_are_peaks(spark):
    """Every reported peak exceeds 1.5x the mean by construction."""
    from vector_knowledge_base_spark import queries as q

    rows = q.QUERIES["events_peak_detection"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    # >= not >: vs_mean is rounded to 4 decimals by the query, so a
    # legitimate peak at c/mean ~ 1.50004 rounds to exactly 1.5; the
    # unrounded filter (c > 1.5*mean) can never round BELOW 1.5
    assert all(r["vs_mean"] >= 1.5 for r in rows)


def test_quantile_normalization_bounds(spark):
    """Normalized means must lie within the raw score's global range
    (the quantile map cannot extrapolate)."""
    from pyspark.sql import functions as F

    from vector_knowledge_base_spark import queries as q
    from vector_knowledge_base_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    rows = q.QUERIES["quality_quantile_normalization"](spark, sf).collect()
    docs = load_table(spark, sf, "documents")
    words = F.split("text", " ")
    score = F.size(F.array_distinct(words)) / F.size(words)
    lohi = docs.agg(
        F.min(score).alias("lo"), F.max(score).alias("hi")
    ).first()
    for r in rows:
        assert lohi["lo"] - 1e-9 <= r["avg_normalized"] <= lohi["hi"] + 1e-9


def test_knn_vote_accuracy_bounded_and_complete(spark):
    """Vote accuracies are valid fractions and the per-label query
    counts sum to the sampled query count."""
    from vector_knowledge_base_spark import queries as q

    rows = q.QUERIES["knn_vote_accuracy"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert sum(r["n_queries"] for r in rows) == 100
    for r in rows:
        assert 0.0 <= r["vote5_accuracy"] <= 1.0
        assert r["n_correct"] <= r["n_queries"]


def test_dsir_target_language_dominates(spark):
    """The DSIR importance model must actually separate the target
    domain: lang='en' (the target) gets the highest average importance
    weight of any language, and the top-100 selection is ENRICHED in en
    well beyond the corpus base rate (64 hash buckets are deliberately
    coarse — individual off-target docs can score high, but the
    selection as a whole must shift toward the target; that enrichment
    IS the DSIR claim)."""
    from vector_knowledge_base_spark import queries as q
    from vector_knowledge_base_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.01"
    rows = q.QUERIES["dsir_importance_by_lang"](spark, sf).collect()
    by_lang = {r["lang"]: r["avg_log_weight"] for r in rows}
    assert by_lang["en"] == max(by_lang.values())
    top = q.QUERIES["dsir_topk_selection"](spark, sf).collect()
    en_share_top = sum(1 for r in top if r["lang"] == "en") / len(top)
    docs = load_table(spark, sf, "documents")
    en_base = docs.where(F.col("lang") == "en").count() / docs.count()
    # 1.2x enrichment floor: the synthetic languages share most of
    # their vocabulary (bucket-sweep measured: 256 buckets -> ~1.3x,
    # finer buckets WORSE — smoothing dominates rare buckets), so the
    # corpus bounds achievable separation; on a real multilingual crawl
    # the same operator separates far harder
    assert en_share_top > en_base * 1.2, (en_share_top, en_base)
