"""Benchmark runner (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value", "unit", "queries": {name: sec}, "sf"}.

Each query is timed to FULL materialization via a noop-format write:
``count()`` lets Catalyst prune every projected column (a scan-projection
query collapses to an empty-column row count — r01 overstated ~8 queries
this way), while the noop sink forces every output expression to execute
on the executors with zero driver-transfer or disk cost.

Per-query time is the MEDIAN of 3 runs (this container's CPU scheduling
is noisy; a single run can swing 2-10×, min-of-N hides steady-state
regressions). A warm-up query first absorbs JVM/codegen startup and
spawns the Python worker pool.

Also reported: ``knn_batch_qps`` — batch-kNN throughput in queries/sec,
the honest BASELINE.md comparison (the reference's per-query HNSW
latency is a regime Spark job dispatch can't match; batch throughput at
the same corpus scale is the apples-to-apples number). The qps and
serving-latency anchors are the round-over-round regression signal, so
they run ≥5 dedicated repetitions and record ``*_band`` =
{median,min,max} alongside the scalar median — one contended run must
not be able to fake a regression or mask a recovery (the r6 lesson:
recorded 9.5 qps vs quiet-host 13.3 on the same build).
"""

from __future__ import annotations

import json
import os
import re
import statistics
import time

HEADLINE = [
    "knn_topk_cosine",
    "knn_topk_filtered",
    "knn_batch",
    "embedding_neardup_cosine",
    "dedup_exact",
    "doc_fingerprint",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "ngram_jaccard_df_capped",
    "simhash_fingerprint",
    "language_id_heuristic",
    "text_stats",
    "text_quality_score",
    "pipeline_chunk_documents",
    "pipeline_embed_knn",
    "pricing_summary",
    "top_customers_by_spend",
    "multiway_join_revenue",
    "volume_shipping_q7",
    "orders_with_returns_q4",
    "customers_without_orders",
    "order_first_line",
    "rollup_sales",
    "asof_last_click_before_purchase",
    "range_join_clicks_after_purchase",
    "orders_above_customer_avg",
    "running_spend_per_customer",
    "shipping_priority_q3",
    "large_quantity_orders_q18",
    "events_tumbling_window",
    "events_session_window",
    # wave 8
    "dedup_connected_components",
    "quality_filter_gopher",
    "repetition_top_bigram",
    "cluster_centroids",
    "range_search_radius",
    "promo_revenue_q14",
    "disjunctive_filter_q19",
    "rich_inactive_customers_q22",
    # wave 9
    "local_supplier_volume_q5",
    "embedding_quantize_int8",
    "pipeline_clean_corpus",
    # wave 10
    "events_pivot_type_by_hour",
    "sample_hash_10pct",
    "train_test_split_hash",
    "sample_by_source_weights",
    "pack_sequences_greedy",
    # wave 11
    "decontaminate_train_eval",
    "semdedup_representatives",
    # wave 12
    "events_hourly_gapfill",
    "grouping_sets_orders",
    # wave 13
    "small_quantity_revenue_q17",
    "events_rolling_1h_window",
    # ML anchors (BASELINE.md: "HDBSCAN 1k pts < 1s incl. naming",
    # "PCA 3-D 1k embeddings < 100ms" — here at 5k embeddings)
    "pca_projection_3d",
    "cluster_naming_tfidf",
    # wave 15
    "winnowing_fingerprints",
    "incremental_lsh_dedup",
    # wave 16 — remaining TPC-H shapes
    "forecast_revenue_q6",
    "market_share_q8",
    "product_profit_q9",
    "late_shipment_q12",
    "customer_distribution_q13",
    "top_supplier_q15",
    "waiting_suppliers_q21",
    # wave 17 — corpus analysis
    "vocab_top_terms",
    "type_token_ratio",
    "df_idf_vocabulary",
    "doc_length_band_filter",
    # wave 18 — relational surface + mixing
    "nation_balance_full_outer",
    "set_except_all_custkeys",
    "unpivot_order_price_stats",
    "sample_temperature_mixture",
    # wave 19 — window surface + fuzzy matching
    "customer_spend_percent_rank",
    "orders_monthly_growth",
    "fuzzy_name_match_levenshtein",
    # wave 20 — hybrid retrieval + vector geometry
    "hybrid_search_rrf",
    "knn_topk_doc_filtered",
    "centroid_similarity_matrix",
    "embedding_norm_stats",
    # wave 21 — event analytics
    "funnel_view_click_purchase",
    "retention_cohorts_daily",
    # wave 22 — sessionization + market basket
    "session_stats_lag_gap",
    "copurchase_part_pairs",
    # wave 23 — quality proxy + keep-best dedup
    "unigram_logprob_quality",
    "dedup_keep_best",
    # wave 24 — data quality + smoothing
    "dq_constraint_report",
    "events_ewma_final",
    # wave 25 — Spark-4 surface
    "variant_props_extract",
    "collation_case_insensitive_group",
    # wave 26 — statistical aggregates + sketches
    "events_value_trend_regression",
    "hll_cardinality_by_source",
    # wave 27 — graph analytics + intra-doc dedup + entropy + quantiles
    "triangle_count_copurchase",
    "pagerank_copurchase",
    "doc_intra_dedup_tokens",
    "token_entropy_quality",
    "stratified_sample_fixed_n",
    "events_value_exact_percentiles",
    # wave 28 — max_by top-1, skew diagnostics, chi-square audit
    "latest_event_per_user",
    "join_key_skew_report",
    "lang_source_chisq",
    # wave 29 — exact mergeable distinct, paragraph-level dedup
    "bitmap_distinct_customers_monthly",
    "paragraph_dup_fraction",
    # wave 30 — mapInArrow kernel, try_* error-safe arithmetic
    "embedding_l2_normalize_arrow",
    "safe_ratio_try_divide",
    # wave 31 — LSH precision audit, deterministic weighted sampling
    "lsh_candidate_precision",
    "weighted_sample_priority",
    # wave 32 — BM25, TF-IDF cosine, token-budget mix, source dup matrix
    "bm25_keyword_search",
    "tfidf_cosine_pairs",
    "token_budget_mixture",
    "cross_source_dup_matrix",
    # wave 33 — PQ ANN, incremental agg maintenance, retrieve+rerank
    "pq_ann_topk",
    "incremental_agg_maintenance",
    "rerank_pipeline_topk",
    # wave 34 — TPC-H Q10, bloom decontamination, bigram LM, Zipf audit
    "returned_item_reporting_q10",
    "decontaminate_bloom",
    "bigram_logprob_quality",
    "zipf_slope_by_source",
    # serving-batch kNN throughput anchor
    "knn_batch_100",
    # wave 35 — silhouette quality gate, RFM segments, MAD outliers
    "cluster_silhouette_simplified",
    "rfm_segmentation",
    "mad_outlier_orders",
    # wave 36 — rolling z-score anomalies, corr, lang-ID confusion
    "events_anomaly_zscore_rolling",
    "discount_quantity_corr",
    "langid_confusion_matrix",
    # wave 37 — PSI drift, dedup yield histogram, df skew profile
    "source_drift_psi",
    "neardup_cluster_histogram",
    "shingle_df_skew_profile",
    # wave 38 — sweep-line concurrency, Pareto share, re-order cadence
    "open_orders_sweep",
    "pareto_revenue_8020",
    "order_gap_percentiles",
    # wave 39 — MinHash calibration audit, time-to-first-purchase
    "minhash_calibration_audit",
    "time_to_first_purchase",
    # wave 40 (r4) — ML-family invariant projections (driver-green twins)
    "kmeans_cluster_invariants",
    "pca_variance_invariants",
    "ann_lsh_recall_report",
    "pq_shortlist_rerank_topk",
    "ann_ivf_adaptive",
    "hll_vs_exact_by_source",
    # wave 41 (r4) — exact-substring dedup (Lee et al.)
    "exact_substring_profile",
    "exact_substring_spans",
    # wave 42 (r4) — Z-order layout, sketch audit, tokenizer fertility
    "zorder_layout_stats",
    "quantile_sketch_audit",
    "tokenizer_fertility_by_source",
    # waves 43-49 (r4) — curation, entity resolution, warehouse mutations,
    # time-series regularization, contrastive-training support
    "boilerplate_segment_removal",
    "domain_quality_quota",
    "quality_classifier_invariants",
    "entity_resolution_blocked",
    "scd2_from_event_log",
    "merge_upsert_classify",
    "events_gapfill_ffill",
    "events_ohlc_hourly",
    "compaction_bin_packing",
    "mmr_diversified_topk",
    "heavy_hitters_sketch_audit",
    "woe_iv_binning",
    "jaccard_part_similarity",
    "hard_negative_mining",
    "embedding_class_margin",
    "split_leakage_audit",
    # wave 50 (r4) — batch-efficiency + corpus-diversity metrics
    "padding_waste_by_bucket",
    "ngram_novelty_by_source",
    "vocab_coverage_quantile",
    # wave 51 (r4) — warehouse CDC + event-sequence analytics
    "snapshot_diff_orders",
    "event_type_transitions",
    "events_hourly_autocorr",
    # wave 52 (r4) — reciprocal-NN dedup confidence + mixture planning
    "mutual_knn_pairs",
    "curriculum_quality_bands",
    "domain_mixture_reweight",
    # wave 53 (r4) — threshold sweep, seasonal profile, mutual information
    "minhash_threshold_sweep",
    "seasonal_hour_profile",
    "mi_lang_source",
    # wave 54 (r4) — embedding/retrieval eval + growth decomposition
    "knn_loo_label_accuracy",
    "retrieval_eval_mrr",
    "users_new_vs_returning",
    # wave 55 (r4) — containment dedup + SimHash hamming-radius candidates
    "shingle_containment_pairs",
    "simhash_hamming_candidates",
    # wave 56 (r4) — yield funnel, leak-free splits, embedding drift
    "pipeline_yield_funnel",
    "split_by_component_leakfree",
    "label_centroid_drift",
    # wave 57 (r4) — temporal PSI, backlog aging, compression quality
    "events_weekly_psi_drift",
    "orders_backlog_aging",
    "compression_ratio_by_source",
    # wave 58 (r4) — audio decode, corpus datasheet, IVF probe curve
    "multimodal_audio_meta_inline",
    "dataset_datasheet_summary",
    "txlog_snapshot_read",
    "txlog_cdc_diff",
    "txlog_merge_upsert",
    "ann_probe_recall_curve",
    # wave 59 (r4) — Spark-4 SQL surface
    "pipe_syntax_orders_summary",
    "region_nations_listagg",
    "events_session_dynamic_gap",
    # wave 60 (r4) — incremental dedup assignment + encoding quality
    "incremental_dedup_assign",
    "ascii_ratio_inline",
    # wave 61 (r4) — SLA / distribution audits
    "events_error_rate_sla",
    "ecdf_order_values",
    "gini_order_concentration",
    # wave 62 (r4) — burstiness, per-source vocab, filtered batch kNN
    "events_burstiness_fano",
    "top_terms_per_source",
    "knn_batch_filtered",
    # wave 63 (r4) — seasonal decomposition, segment migration
    "events_seasonal_decomposition",
    "customer_segment_migration",
    # wave 64 (r4) — score calibration, vocabulary kinship
    "quality_quantile_normalization",
    "source_vocab_overlap",
    # wave 65 (r4) — simhash precision audit, peak detection
    "simhash_precision_audit",
    "events_peak_detection",
    # wave 66 (r4) — feature correlation matrix, discount effectiveness
    "lineitem_corr_matrix",
    "discount_band_effectiveness",
    # wave 67 (r4) — k-vote kNN classification probe
    "knn_vote_accuracy",
    # wave 68 (r5) — incremental-dedup equivalence proof (delta×delta gap closed)
    "incremental_dedup_equivalence",
    # wave 70 (r5) — DSIR importance-resampling data selection
    "dsir_importance_by_lang",
    "dsir_topk_selection",
    # wave 71 (r5) — real BMP pixel decode (image analog of the WAV decoder)
    "multimodal_image_pixels_inline",
    # wave 72 (r5) — BPE first-merge vocabulary induction
    "bpe_merge_candidates",
    # wave 73/74 (r6) — streaming+txlog+dedup audit, k-round BPE train
    "streaming_dedup_ingest_audit",
    "bpe_vocab_train_k",
    # wave 75 (r6) — IVF-PQ composed index, clustered txlog compaction
    "ivfpq_serving_invariants",
    "txlog_clustered_compaction",
    # wave 76 (r6) — schema evolution, streaming CDC-apply (MERGE) sink
    "txlog_schema_evolution",
    "streaming_cdc_upsert_audit",
    # wave 77 (r6) — OPQ learned-rotation refinement of PQ serving
    "opq_shortlist_exact_topk",
    # wave 78 (r6) — C4-style span-level dedup (audit, boilerplate, rewrite)
    "c4_span_dedup",
    "boilerplate_spans_top",
    "c4_span_dedup_rewrite",
    # wave 79 (r6) — txlog replaceWhere (predicate-scoped overwrite)
    "txlog_replace_where",
    # wave 80 (r6) — OPQ-pretransformed IVF-PQ composed index
    "opq_ivfpq_exact_topk",
    # wave 81 (r6) — BPE tokenizer apply (train→serve pair)
    "bpe_encode_apply",
    # wave 82 (r6) — CDC-maintained incremental materialized view
    "txlog_incremental_mv",
    # wave 83 (r6) — Count-Min sketch point-query audit
    "countmin_sketch_audit",
    # wave 84 (r6) — KMV/Theta sketch set-expression cardinality
    "theta_sketch_set_expressions",
    # wave 85 (r6) — txlog RESTORE + zero-copy SHALLOW CLONE
    "txlog_restore_clone",
    # wave 86 (r6) — deterministic label-propagation communities
    "label_propagation_communities",
    # wave 87 (r6) — z-order (Morton) clustered compaction + pruning
    "txlog_zorder_pruning",
    # wave 88 (r6) — delta-encoded manifests (O(touched-files) commits)
    "txlog_delta_manifest_audit",
    # wave 89 (r6) — txlog streaming source, multi-hop exactly-once
    "txlog_stream_multihop",
    # wave 90 (r7) — hive partition_by + dynamic partition overwrite
    "txlog_partition_overwrite",
    # wave 90 (r7) — A2 listing served by the rescan-mode matview
    "registry_matview_listing",
    # wave 90 (r7) — PQ/OPQ/IVF-PQ recall-per-byte curve (anisotropic)
    "opq_recall_per_byte_curve",
    # wave 90 (r7) — incrementally-maintained ROLLUP matview
    "matview_rollup_incremental",
    # wave 90 (r7) — txstream backlog admission control audit
    "txlog_stream_backpressure",
    # wave 91 (r7) — Delta-style CHECK constraints on the txlog
    "txlog_check_constraints",
    # wave 91 (r7) — merge-on-read deletion vectors
    "txlog_deletion_vectors",
    # wave 91 (r7) — SQL UPDATE as a merge-on-read commit
    "txlog_update_where",
    # wave 95 (r9) — column mapping: metadata-only RENAME/DROP lifecycle
    "txlog_column_mapping",
    # wave 96 (r9) — in-process serving tier parity (exact top-k)
    "knn_serving_parity",
    # wave 97 (r10) — PQ-code serving tier parity (ADC + rerank)
    "pq_serving_parity",
    # wave 98 (r10) — k-anonymity / l-diversity governance audit
    "k_anonymity_audit",
    # wave 99 (r10) — composed IVF-PQ serving tier parity
    "ivfpq_inproc_serving_parity",
    # wave 100 (r10) — bloom-filter file skipping for point lookups
    "txlog_bloom_pruning",
    # wave 102 (r10) — CUSUM change-point on the hourly event rate
    "events_cusum_changepoint",
    # wave 103 (r10) — hybrid RRF served in-process, batch-plan oracle
    "hybrid_serving_parity",
    # wave 104 (r10) — kNN-graph hubness audit (in-degree concentration)
    "knn_hubness_audit",
    # wave 105 (r11) — FILTERED hybrid serving (allowed_ids pre-filter)
    "hybrid_filtered_serving_parity",
    # wave 106 (r11) — BM25 keyword ranking served in-process
    "bm25_serving_parity",
    # wave 107 (r11) — sharded hybrid fan-out, one-oracle-three-regimes
    "hybrid_sharded_serving_parity",
    # wave 108 (r11) — partition-scoped compaction (OPTIMIZE WHERE)
    "txlog_scoped_compaction",
    # wave 109 (r12) — sharded vector fan-out, plain + filtered regimes
    "vector_sharded_serving_parity",
    # wave 110 (r13) — batch serving verb, both topologies
    "knn_batch_serving_parity",
    # wave 111 (r13) — batch HYBRID serving verb, both topologies
    "hybrid_batch_serving_parity",
    # wave 112 (r14) — batch-hybrid one-job Spark plan (the
    # search_hybrid_batch(mode="spark") path)
    "hybrid_batch_rrf_plan",
    # wave 113 (r14) — filtered batch on the PQ code tiers
    "pq_batch_filtered_serving_parity",
    # wave 114 (r14) — batched keyword verb, 8 regimes
    "keyword_batch_serving_parity",
    # wave 115 (r14) — batched IVF Spark plan (union-pruned scan)
    "ivf_batch_topk_plan",
]

# Integration rows whose cost is fixed overhead (streaming runs with
# checkpoints, multi-commit txlog fixtures), not a data-proportional
# kernel: a median-of-3 buys no precision and spends ~2 minutes of the
# bench budget re-running streams. One timed run each.
SINGLE_RUN = {
    "streaming_dedup_ingest_audit",
    "streaming_cdc_upsert_audit",
    "txlog_schema_evolution",
    "txlog_clustered_compaction",
    "txlog_snapshot_read",
    "txlog_cdc_diff",
    "txlog_merge_upsert",
    "txlog_replace_where",
    "txlog_restore_clone",
    "txlog_zorder_pruning",
    "txlog_delta_manifest_audit",
    "txlog_stream_multihop",
    "txlog_partition_overwrite",
    "registry_matview_listing",
    "opq_recall_per_byte_curve",
    "matview_rollup_incremental",
    "txlog_stream_backpressure",
    "txlog_check_constraints",
    "txlog_deletion_vectors",
    "txlog_update_where",
    "txlog_column_mapping",
    "knn_serving_parity",
    "pq_serving_parity",
    "ivfpq_inproc_serving_parity",
    "txlog_bloom_pruning",
    "hybrid_serving_parity",
    "hybrid_filtered_serving_parity",
    "bm25_serving_parity",
    "hybrid_sharded_serving_parity",
    "txlog_scoped_compaction",
    "vector_sharded_serving_parity",
    "knn_batch_serving_parity",
    "hybrid_batch_serving_parity",
    "pq_batch_filtered_serving_parity",
    "keyword_batch_serving_parity",
    "ivf_batch_topk_plan",
}

KNN_BATCH_N_QUERIES = 5  # matches the knn_batch query definition

RUNS_PER_QUERY = 3


def _materialize(df) -> None:
    """Execute the full plan: every output column is computed and shipped
    to the noop sink (nothing pruned, nothing collected to the driver)."""
    df.write.format("noop").mode("overwrite").save()


def _band(samples: list) -> dict:
    """{median,min,max} over ≥5 samples — the r6 lesson: a single
    contended run can fake a regression (recorded 9.5 qps) or mask a
    recovery (quiet-host 13.3); the record must carry its own error
    bar so the driver snapshot is self-adjudicating."""
    return {
        "median": round(statistics.median(samples), 3),
        "min": round(min(samples), 3),
        "max": round(max(samples), 3),
    }


def _quiesce(spark, max_wait_s: float = 6.0) -> float:
    """Wait for the CPU to actually be available before timing a
    sub-millisecond verb (r13): after the 10×-corpus anchors the JVM
    keeps executor/cleaner threads busy for SECONDS, and a fixed
    0.2 s settle recorded 5.9 ms medians for a verb that measures
    0.057 ms in isolation — sustained starvation, not a GC pause.
    Ask the JVM to collect, then probe a tiny matmul (same shape of
    work as the lanes being timed) every 100 ms until two consecutive
    probes run at full speed or ``max_wait_s`` elapses. Returns the
    seconds waited (recorded nowhere; the bands stay the honesty
    mechanism — if the host never quiets, the lane is measured anyway
    and its band shows the spread)."""
    import numpy as np

    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:  # noqa: BLE001 — settle is best-effort
        pass
    mat = np.random.rand(4000, 64)
    q = np.random.rand(64)
    mat @ q  # warm the BLAS path
    t_begin = time.time()
    fast = 0
    while time.time() - t_begin < max_wait_s:
        t0 = time.perf_counter()
        mat @ q
        dt = time.perf_counter() - t0
        if dt < 0.0005:  # full-speed probe ≈ 0.03-0.05 ms
            fast += 1
            if fast >= 2:
                break
        else:
            fast = 0
        time.sleep(0.1)
    return time.time() - t_begin


def _qps_anchor(spark, sf_dir, extra, errors) -> None:
    """Dedicated ≥5-run loops for the two batch-kNN qps anchors (r6
    verdict #3). These are the round-over-round regression signal, so
    they get their own repetitions + bands instead of inheriting the
    main loop's budget-cut median-of-3. The scalar keys stay (median)
    for cross-round comparability; the *_band keys carry the bar."""
    try:
        import vector_knowledge_base_spark.queries as q

        for name, n_queries, key in (
            ("knn_batch", KNN_BATCH_N_QUERIES, "knn_batch_qps"),
            ("knn_batch_100", 100, "knn_batch100_qps"),
        ):
            samples = []
            for _ in range(5):
                t0 = time.time()
                _materialize(q.QUERIES[name](spark, sf_dir))
                samples.append(n_queries / (time.time() - t0))
            extra[key] = round(statistics.median(samples), 3)
            extra[f"{key}_band"] = _band(samples)
    except Exception as e:  # noqa: BLE001
        errors["qps_anchor"] = (
            f"{type(e).__name__}: {str(e).splitlines()[0][:200]}"
        )


def _scale_anchor(spark, sf_dir, extra, errors) -> None:
    """Scale-up anchor (r3 verdict #6): batch-100 kNN against a 10×
    self-replicated corpus (lazy union of 10 offset-id scans — real
    10× scan volume, no pre-materialization). Near-flat qps between
    knn_batch100_qps and this number is the EMPIRICAL form of the
    "corpus scanned once, queries broadcast" scale claim — the
    reference's own 100k-vector capacity ceiling sits at 1× here."""
    try:
        from pyspark.sql import functions as SF

        from vector_knowledge_base_spark.operators.knn import batch_knn
        from vector_knowledge_base_spark.sources.tables import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        queries100 = emb.where(SF.col("vec_id") < 100).select(
            SF.col("vec_id").alias("query_id"),
            SF.col("embedding").alias("query_vec"),
        )
        big = emb.select("vec_id", "embedding")
        for i in range(1, 10):
            big = big.unionAll(
                emb.select(
                    (SF.col("vec_id") + SF.lit(i * 100_000_000)).alias("vec_id"),
                    "embedding",
                )
            )
        runs10 = []
        for _ in range(2):
            t0 = time.time()
            _materialize(batch_knn(queries100, big, k=5))
            runs10.append(time.time() - t0)
        t10 = statistics.median(runs10)
        extra["knn_batch100_qps_10x_corpus"] = round(100 / t10, 3)
        extra["knn_batch100_10x_corpus_sec"] = round(t10, 3)
    except Exception as e:  # noqa: BLE001
        errors["knn_batch100_10x_corpus"] = (
            f"{type(e).__name__}: {str(e).splitlines()[0][:200]}"
        )


def _dedup_scale_anchor(spark, sf_dir, extra, errors) -> None:
    """Dedup scale anchor: MinHash SIGNATURE throughput (docs/sec) on
    the corpus vs a lazily 10×-replicated corpus (offset doc ids, a
    per-replica suffix token so replicas aren't byte-identical). The
    signature stage is the part of the dedup family whose cost is
    CLAIMED linear in docs (map-side combine, shuffle = docs × 8
    longs) — near-flat docs/sec at 10× is that claim, measured. The
    candidate/banding stage is deliberately excluded: replicating a
    corpus makes every replica group a real near-dup cluster, so its
    pair count grows quadratically BY CONSTRUCTION (that regime is what
    max_df/banding audits are for, not a throughput anchor)."""
    try:
        from pyspark.sql import functions as SF

        from vector_knowledge_base_spark.operators.text_dedup import (
            minhash_signatures,
        )
        from vector_knowledge_base_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        n1 = docs.count()
        big = docs.select("doc_id", "text")
        for i in range(1, 10):
            big = big.unionAll(
                docs.select(
                    (SF.col("doc_id") + SF.lit(i * 100_000_000)).alias("doc_id"),
                    SF.concat(SF.col("text"), SF.lit(f" rep{i}")).alias("text"),
                )
            )
        t1 = []
        for _ in range(2):
            t0 = time.time()
            _materialize(minhash_signatures(docs))
            t1.append(time.time() - t0)
        t10 = []
        for _ in range(2):
            t0 = time.time()
            _materialize(minhash_signatures(big))
            t10.append(time.time() - t0)
        extra["minhash_sig_docs_per_sec_1x"] = round(
            n1 / statistics.median(t1), 1
        )
        extra["minhash_sig_docs_per_sec_10x"] = round(
            n1 * 10 / statistics.median(t10), 1
        )
    except Exception as e:  # noqa: BLE001
        errors["minhash_sig_scale_anchor"] = (
            f"{type(e).__name__}: {str(e).splitlines()[0][:200]}"
        )


def _chunker_scale_anchor(spark, sf_dir, extra, errors) -> None:
    """Python-path scale anchor: Arrow-batched chunker throughput
    (docs/sec) on the corpus vs a lazily 10×-replicated corpus — the
    third empirical scale claim, covering the mapInPandas/Arrow UDF
    lane (kNN anchors cover JVM vector math, the MinHash anchor covers
    codegen hash-aggs). Near-flat-or-better docs/sec at 10× = the
    Python crossing amortizes per batch, not per row."""
    try:
        from pyspark.sql import functions as SF

        from vector_knowledge_base_spark.pipeline.chunker import (
            chunk_documents_df,
        )
        from vector_knowledge_base_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "lang"
        )
        n1 = docs.count()
        big = docs
        for i in range(1, 10):
            big = big.unionAll(
                docs.withColumn(
                    "doc_id", SF.col("doc_id") + SF.lit(i * 100_000_000)
                )
            )
        t1, t10 = [], []
        for _ in range(2):
            t0 = time.time()
            _materialize(chunk_documents_df(docs))
            t1.append(time.time() - t0)
        for _ in range(2):
            t0 = time.time()
            _materialize(chunk_documents_df(big))
            t10.append(time.time() - t0)
        extra["chunker_docs_per_sec_1x"] = round(n1 / statistics.median(t1), 1)
        extra["chunker_docs_per_sec_10x"] = round(
            n1 * 10 / statistics.median(t10), 1
        )
    except Exception as e:  # noqa: BLE001
        errors["chunker_scale_anchor"] = (
            f"{type(e).__name__}: {str(e).splitlines()[0][:200]}"
        )


def _serving_latency_anchor(spark, sf_dir, extra, errors) -> None:
    """Serving-latency anchors at 1× AND a 10×-replicated corpus (r4
    nit: the end-of-run placement silently fell off the record once 205
    queries preceded it; it now runs in the anchors-first block).

    At 1× both full-scan and IVF land on the same ~160-250 ms job-
    dispatch floor — the empirical form of BASELINE.md's "online ANN
    serving requires a specialized runtime" concession. The 10× corpus
    is where scan work finally exceeds dispatch, so the IVF layout's
    partition pruning (probe 4/32 cells of a cell-partitioned parquet
    corpus = directory pruning before any file opens) becomes
    MEASURABLE rather than argued: expect ivf_10x < fullscan_10x.

    Serving realism choices: KMeans trains ONCE on the 1× corpus and
    replicas inherit their original's cell (identical vectors ⇒
    identical assignment — index build cost is amortized, like any
    production index); the reader holds ONE long-lived DataFrame handle
    per corpus (schema/partition discovery paid at open, as a serving
    session would), with partition pruning still per-query. Median ms
    over 5 single-query jobs, collect() as the sink (serving returns
    rows to a caller)."""
    try:
        import shutil
        import tempfile

        import numpy as np

        from pyspark.sql import functions as SF

        from vector_knowledge_base_spark.operators.ann import build_ivf
        from vector_knowledge_base_spark.operators.knn import cosine_topk
        from vector_knowledge_base_spark.sources.storage import write_ivf_corpus
        from vector_knowledge_base_spark.sources.tables import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        qrows = (
            emb.where(SF.col("vec_id") < 5).select("vec_id", "embedding").collect()
        )
        big = emb.select("vec_id", "embedding")
        for i in range(1, 10):
            big = big.unionAll(
                emb.select(
                    (SF.col("vec_id") + SF.lit(i * 100_000_000)).alias("vec_id"),
                    "embedding",
                )
            )
        centroids, assigned = build_ivf(emb, n_partitions=32)
        assigned_big = assigned
        for i in range(1, 10):
            assigned_big = assigned_big.unionAll(
                assigned.select(
                    (SF.col("vec_id") + SF.lit(i * 100_000_000)).alias("vec_id"),
                    "embedding",
                    "ivf_cell",
                )
            )

        for label, corpus, idx in (("", emb, assigned), ("_10x", big, assigned_big)):
            tmpd = tempfile.mkdtemp(prefix="ivf_bench_")
            try:
                write_ivf_corpus(idx, tmpd)
                base = spark.read.parquet(tmpd)  # held open, like a server
                full_lat, lat = [], []
                for _pass in range(2):  # 5 queries × 2 passes = 10 samples
                    for r in qrows:
                        qv = [float(x) for x in r["embedding"]]
                        t0 = time.time()
                        cosine_topk(corpus, qv, k=10).collect()
                        full_lat.append(time.time() - t0)
                    for r in qrows:
                        qv = [float(x) for x in r["embedding"]]
                        d = ((centroids - np.asarray(qv)) ** 2).sum(axis=1)
                        probe = [int(c) for c in np.argsort(d)[:4]]
                        t0 = time.time()
                        sub = base.where(SF.col("ivf_cell").isin(probe))
                        cosine_topk(sub, qv, k=10).collect()
                        lat.append(time.time() - t0)
                extra[f"knn_single_fullscan{label}_ms"] = round(
                    1000 * statistics.median(full_lat), 1
                )
                extra[f"knn_single_ivf_persisted{label}_ms"] = round(
                    1000 * statistics.median(lat), 1
                )
                extra[f"knn_single_fullscan{label}_ms_band"] = _band(
                    [1000 * s for s in full_lat]
                )
                extra[f"knn_single_ivf_persisted{label}_ms_band"] = _band(
                    [1000 * s for s in lat]
                )
            finally:
                shutil.rmtree(tmpd, ignore_errors=True)
        # r9: the in-process serving tier (operators/serving.KnnServer —
        # Spark builds the IVF artifact, the server answers point
        # queries from memory; no JVM dispatch in the query path). This
        # is the regime the reference's <50 ms @10k number lives in:
        # its Qdrant index IS such a tier. Same 5 queries × 2 passes.
        from vector_knowledge_base_spark.operators.serving import KnnServer

        srv = KnnServer(centroids, assigned)
        srv_big = KnnServer(centroids, assigned_big, max_vectors=10_000_000)
        # r13 (same root cause as the facade lane): a ~0.06 ms verb
        # sampled right after the 10×-corpus Spark jobs gets starved by
        # residual JVM work for SECONDS — quiesce adaptively, then
        # sample 30× so any remaining pause lands in the band, not the
        # median
        _quiesce(spark)
        for label, s in (("", srv), ("_10x", srv_big)):
            qlat = []
            for _pass in range(6):
                for r in qrows:
                    qv = [float(x) for x in r["embedding"]]
                    t0 = time.time()
                    s.query(qv, k=10, n_probe=4)
                    qlat.append(time.time() - t0)
            extra[f"knn_single_inproc{label}_ms"] = round(
                1000 * statistics.median(qlat), 3
            )
            extra[f"knn_single_inproc{label}_ms_band"] = _band(
                [1000 * x for x in qlat]
            )
        # r10: vectorized in-process BATCH serving (query_batch — one
        # matmul over the union of probed cells scores the whole
        # batch). 100 queries per call, median of 3 calls; the in-proc
        # twin of knn_batch100_qps, measuring the serving tier's
        # multi-query throughput rather than Spark's.
        qrows100 = (
            emb.where(SF.col("vec_id") < 100)
            .select("vec_id", "embedding")
            .collect()
        )
        batch_vecs = [[float(x) for x in r["embedding"]] for r in qrows100]
        for label, s in (("", srv), ("_10x", srv_big)):
            s.query_batch(batch_vecs[:5], k=10, n_probe=4)  # warm
            rates = []
            for _ in range(5):  # r13: 3 → 5 calls (GC pause ∉ median)
                t0 = time.time()
                s.query_batch(batch_vecs, k=10, n_probe=4)
                rates.append(len(batch_vecs) / (time.time() - t0))
            extra[f"knn_batch_inproc{label}_qps"] = round(
                statistics.median(rates), 1
            )
            extra[f"knn_batch_inproc{label}_qps_band"] = _band(rates)
        # r10 wave 99: the composed IVF-PQ in-process tier
        # (IvfPqKnnServer — m bytes/vector AND probed-fraction work;
        # the 10⁹-vector shard shape). 1× corpus only: the build cost
        # of a second index is real and the 10× scan economics are
        # already proven by the float tier above; this anchor records
        # the point-query latency of cell-pruned ADC.
        from vector_knowledge_base_spark.operators.ann import build_ivfpq
        from vector_knowledge_base_spark.operators.serving import (
            IvfPqKnnServer,
        )

        pq_cents, pq_books, pq_index = build_ivfpq(
            emb.select("vec_id", "embedding"), n_cells=8, m=8, ksub=16
        )
        pq_srv = IvfPqKnnServer(pq_cents, pq_books, pq_index)
        pq_srv.query(batch_vecs[0], k=10, n_probe=4)  # warm
        qlat = []
        for _pass in range(2):
            for r in qrows:
                qv = [float(x) for x in r["embedding"]]
                t0 = time.time()
                pq_srv.query(qv, k=10, n_probe=4)
                qlat.append(time.time() - t0)
        extra["knn_single_ivfpq_inproc_ms"] = round(
            1000 * statistics.median(qlat), 3
        )
        extra["knn_single_ivfpq_inproc_ms_band"] = _band(
            [1000 * x for x in qlat]
        )
        assigned.unpersist()
    except Exception as e:  # noqa: BLE001
        errors["knn_single_serving_anchor"] = (
            f"{type(e).__name__}: {str(e).splitlines()[0][:200]}"
        )


def _facade_serve_anchor(spark, sf_dir, extra, errors) -> None:
    """End-to-end /search latency THROUGH THE SERVICE FACADE in serve
    mode (r10: KnowledgeBase.search(mode='serve') — the reference's
    flagship regime, backend/main.py:185-230, <50 ms bar): a 200-doc
    corpus is uploaded once (offline tier), then each timed search
    pays query embedding + the in-process KnnServer + the hit
    projection's collect — everything a caller experiences. The
    spark-mode twin is recorded alongside as the honest cost of
    serving the SAME verb from the engine (per-job JVM dispatch)."""
    try:
        import shutil
        import tempfile

        from vector_knowledge_base_spark.service import KnowledgeBase
        from vector_knowledge_base_spark.sources.tables import load_table

        docs = (
            load_table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .limit(200)
            .collect()
        )
        srcd = tempfile.mkdtemp(prefix="kb_src_")
        wsd = tempfile.mkdtemp(prefix="kb_ws_")
        try:
            for r in docs:
                with open(os.path.join(srcd, f"d{r['doc_id']}.txt"), "w") as fh:
                    fh.write(r["text"] or "empty")
            kb = KnowledgeBase(spark, os.path.join(wsd, "ws"), storage="txlog")
            kb.upload_directory(srcd)
            kb.search("warm up query", k=5, mode="serve").collect()  # artifact
            qtexts = [
                "data pipeline orders", "customer analytics report",
                "spark shuffle partitions", "language model tokens",
                "hello world example",
            ]
            # the serving regime proper: search_hits returns plain rows
            # (the reference's JSON response shape) — no DataFrame
            # round-trip in the hot path. r13 (VERDICT r12 next-round
            # #2, root-caused): the verb itself measures 0.106 ms in
            # isolation (40-rep median, this host, this code) — the
            # 3-4 ms medians recorded r12 came from residual JVM
            # GC/executor turbulence of the six PRECEDING 10×-corpus
            # anchors stealing cores during a 10-sample window on a
            # ~0.1 ms-scale measurement. So: quiesce adaptively (wait
            # for a probe matmul to run at full speed) before EVERY
            # pass — this host's contention is bursty on a seconds
            # scale (six recorded runs: medians 0.095-3.4 ms with a
            # single up-front settle, i.e. a per-lane lottery), so
            # re-probing per pass lets the majority of the 30 samples
            # land in quiet windows and the median report the verb,
            # while the band still records the spread honestly.
            lats = []
            for _pass in range(6):
                _quiesce(spark, max_wait_s=2.0)
                for qt in qtexts:
                    t0 = time.time()
                    kb.search_hits(qt, k=5)
                    lats.append(time.time() - t0)
            extra["facade_search_serve_ms"] = round(
                1000 * statistics.median(lats), 3
            )
            extra["facade_search_serve_ms_band"] = _band(
                [1000 * x for x in lats]
            )
            # the DataFrame forms, recorded as the honest cost of the
            # composable return type: serve-mode pays the local-relation
            # JVM round-trip, spark-mode pays a full scoring job
            for mode in ("serve", "spark"):
                lats = []
                for _pass in range(2):
                    for qt in qtexts:
                        t0 = time.time()
                        kb.search(qt, k=5, mode=mode).collect()
                        lats.append(time.time() - t0)
                extra[f"facade_search_{mode}_df_ms"] = round(
                    1000 * statistics.median(lats), 2
                )
                extra[f"facade_search_{mode}_df_ms_band"] = _band(
                    [1000 * x for x in lats]
                )
            # r11: the hybrid verb — first call pays the keyword
            # artifact build (the Spark-side postings aggregation,
            # recorded as its own anchor per the r10 verdict), then
            # the steady-state fused query latency
            t0 = time.time()
            kb.search_hybrid("data pipeline orders", k=5)
            extra["facade_hybrid_build_ms"] = round(
                1000 * (time.time() - t0), 2
            )
            lats = []
            for _pass in range(2):
                for qt in qtexts:
                    t0 = time.time()
                    kb.search_hybrid(qt, k=5)
                    lats.append(time.time() - t0)
            extra["facade_search_hybrid_ms"] = round(
                1000 * statistics.median(lats), 3
            )
            extra["facade_search_hybrid_ms_band"] = _band(
                [1000 * x for x in lats]
            )
            # r13: the batch verb — 100 queries through ONE
            # query_batch call (one matmul for the whole batch); the
            # anchor the VERDICT asked for alongside the parity test
            qbatch = [
                f"{a} {b} batch probe"
                for a in ("data", "spark", "token", "vector", "report",
                          "orders", "cluster", "index", "stream", "text")
                for b in ("alpha", "beta", "gamma", "delta", "epsilon",
                          "zeta", "eta", "theta", "iota", "kappa")
            ]
            _quiesce(spark)
            lats = []
            for _pass in range(3):
                t0 = time.time()
                kb.search_batch(qbatch, k=5)
                lats.append(time.time() - t0)
            extra["facade_search_batch_qps"] = round(
                len(qbatch) / statistics.median(lats), 1
            )
            # r14: the batch HYBRID verb (VERDICT r13 next-round #3 —
            # shipped r13 with no dedicated anchor): 100 (terms,
            # vector) queries through ONE hybrid_query_batch call
            _quiesce(spark)
            lats = []
            for _pass in range(3):
                t0 = time.time()
                kb.search_hybrid_batch(qbatch, k=5)
                lats.append(time.time() - t0)
            extra["facade_search_hybrid_batch_qps"] = round(
                len(qbatch) / statistics.median(lats), 1
            )
            # r14: the same batch as ONE Spark job (mode="spark" — the
            # regime parquet-storage corpora use); wall seconds for
            # the whole 100-query batch, qps derived
            _quiesce(spark)
            lats = []
            for _pass in range(2):
                t0 = time.time()
                kb.search_hybrid_batch(qbatch, k=5, mode="spark").collect()
                lats.append(time.time() - t0)
            extra["facade_search_hybrid_batch_spark_qps"] = round(
                len(qbatch) / statistics.median(lats), 1
            )
            # r12: the sharded topology through the facade — one-time
            # ShardedHybridServer build (3 shards), then steady-state
            # fan-out latency for the vector and hybrid verbs; the
            # parity with single-shard answers is pytest-pinned, this
            # records what the exactness costs end-to-end
            kb.serve_sharded(3)
            t0 = time.time()
            kb.search_hits("data pipeline orders", k=5)
            extra["facade_sharded_build_ms"] = round(
                1000 * (time.time() - t0), 2
            )
            _quiesce(spark)
            for verb, key in (
                (lambda qt: kb.search_hits(qt, k=5),
                 "facade_search_sharded_ms"),
                (lambda qt: kb.search_hybrid(qt, k=5),
                 "facade_search_sharded_hybrid_ms"),
            ):
                lats = []
                for _pass in range(2):
                    for qt in qtexts:
                        t0 = time.time()
                        verb(qt)
                        lats.append(time.time() - t0)
                extra[key] = round(1000 * statistics.median(lats), 3)
                extra[key + "_band"] = _band([1000 * x for x in lats])
            # r13: the batch verb over the sharded fan-out (one
            # matmul per shard for the whole batch)
            _quiesce(spark)
            lats = []
            for _pass in range(3):
                t0 = time.time()
                kb.search_batch(qbatch, k=5)
                lats.append(time.time() - t0)
            extra["facade_search_batch_sharded_qps"] = round(
                len(qbatch) / statistics.median(lats), 1
            )
            # r14: batch hybrid over the sharded fan-out (one matmul
            # per shard scores the whole batch's cosine side)
            _quiesce(spark)
            lats = []
            for _pass in range(3):
                t0 = time.time()
                kb.search_hybrid_batch(qbatch, k=5)
                lats.append(time.time() - t0)
            extra["facade_search_hybrid_batch_sharded_qps"] = round(
                len(qbatch) / statistics.median(lats), 1
            )
        finally:
            shutil.rmtree(srcd, ignore_errors=True)
            shutil.rmtree(wsd, ignore_errors=True)
    except Exception as e:  # noqa: BLE001
        errors["facade_serve_anchor"] = (
            f"{type(e).__name__}: {str(e).splitlines()[0][:200]}"
        )


def _dedup_chain_anchor(spark, sf_dir, extra, errors) -> None:
    """End-to-end PAIR-PRODUCING dedup chain at two corpus scales (r4
    verdict #4: the kNN/MinHash/chunker anchors prove the scan/agg
    lanes scale; this one covers the candidate/banding/components
    lane). Chain: MinHash signatures → LSH banding candidates →
    connected components → canonical labels, materialized.

    Replicas are made HETEROGENEOUS by suffixing every token with the
    replica index (regexp token rewrite): every shingle differs across
    replicas, so the 10× pair graph is 10 disjoint copies of the 1×
    graph — linear growth, the honest model of a 10× real corpus. (A
    plain text replica would make every replica group a true near-dup
    cluster: quadratic pairs BY CONSTRUCTION, a different regime.) The
    1× run applies the same rep-0 rewrite so per-token cost is
    identical at both scales."""
    try:
        from pyspark.sql import functions as SF

        from vector_knowledge_base_spark.operators.components import (
            connected_components,
        )
        from vector_knowledge_base_spark.operators.text_dedup import (
            minhash_lsh_candidates,
            minhash_signatures,
        )
        from vector_knowledge_base_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        n1 = docs.count()

        def replica(i: int):
            return docs.select(
                (SF.col("doc_id") + SF.lit(i * 100_000_000)).alias("doc_id"),
                SF.regexp_replace("text", r"(\S+)", f"$1x{i}").alias("text"),
            )

        one = replica(0)
        big = replica(0)
        for i in range(1, 10):
            big = big.unionAll(replica(i))

        def chain_secs(corpus) -> float:
            runs = []
            for _ in range(2):
                t0 = time.time()
                pairs = minhash_lsh_candidates(minhash_signatures(corpus))
                _materialize(
                    connected_components(pairs, src="doc_id_a", dst="doc_id_b")
                )
                runs.append(time.time() - t0)
            return statistics.median(runs)

        extra["dedup_chain_docs_per_sec_1x"] = round(n1 / chain_secs(one), 1)
        extra["dedup_chain_docs_per_sec_10x"] = round(
            n1 * 10 / chain_secs(big), 1
        )
    except Exception as e:  # noqa: BLE001
        errors["dedup_chain_anchor"] = (
            f"{type(e).__name__}: {str(e).splitlines()[0][:200]}"
        )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from vector_knowledge_base_spark import queries as q
    from vector_knowledge_base_spark.session import get_spark

    spark = get_spark("vkb-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: a tiny end-to-end job (JVM + codegen + parquet footer reads)
    # plus one Python-UDF stage so the pool of Python workers is spawned
    # before timing begins — bench measures steady-state throughput, not
    # interpreter cold-start.
    _materialize(q.QUERIES["cluster_stats"](spark, sf_dir))
    par = spark.sparkContext.defaultParallelism
    warm = spark.range(par * 4).repartition(par)
    warm.mapInPandas(lambda it: it, "id long").count()

    # Per-query fault isolation: one failing query must never zero the
    # round's entire perf evidence (r2's BENCH was a stack trace because a
    # single AnalysisException aborted the loop). Errors are recorded and
    # the JSON summary line is ALWAYS printed.
    # Wall-clock self-budget: the driver's harness timeout is unknown, and
    # 110+ queries x 3 runs must never run into it — past 60% of budget
    # drop to 2 runs, past 80% to 1, so the JSON line always lands.
    # r7: 242 headline rows (20 of them single-run integration
    # fixtures costing ~110 s cold) + the widened 5-run anchors pushed
    # a 480 s budget's worst case past ~590 s wall including JVM
    # startup — the JSON line must ALWAYS land, so the default budget
    # drops to 420 s and the run-count cuts trigger earlier (50%/72%).
    # r10: 480 → 520. A throttled host (rows 1.5-2x slower) was landing
    # 3 tail skips right at the old budget with wall ~490 s — ~100 s of
    # headroom left to the ~590 s harness limit. The skip mechanism
    # still bounds a pathologically slow host; the JSON line always
    # lands either way.
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "520"))
    t_start = time.time()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    extra: dict[str, float] = {}

    # Scale-up anchors FIRST (r4: with 162 headline queries the old
    # end-of-run placement fell past the 80% budget cut and the anchor
    # silently vanished from BENCH_r; they are the round's key empirical
    # scale claims, so they spend their ~20 s before the loop).
    import sys as _sys

    def _trace(msg: str) -> None:
        # stderr progress (stdout stays the single JSON line)
        print(f"[bench +{time.time()-t_start:.0f}s] {msg}", file=_sys.stderr)

    for _name, _fn in (
        ("qps_anchor", _qps_anchor),
        ("scale_anchor", _scale_anchor),
        ("dedup_scale_anchor", _dedup_scale_anchor),
        ("chunker_scale_anchor", _chunker_scale_anchor),
        ("dedup_chain_anchor", _dedup_chain_anchor),
        ("serving_latency_anchor", _serving_latency_anchor),
        ("facade_serve_anchor", _facade_serve_anchor),
    ):
        _fn(spark, sf_dir, extra, errors)
        _trace(f"anchor {_name} done")

    # SINGLE_RUN integration fixtures run FIRST: they are fixed-cost
    # and carry the round's newest evidence, so a budget-exhausted
    # skip can only ever hit redundant cheap relational rows at the
    # tail, never the new rows (r7: the first ordering skipped 25
    # rows including every wave-90/91 addition). TRACKED rows run
    # second (r9): the CPU-bound kernels compared round-over-round
    # for drift adjudication — on a slow host the budget skip must
    # never eat the very rows the comparison needs (it did in three
    # r9 contended runs; the clean-run numbers existed but only off
    # the record).
    tracked = [
        "label_propagation_communities",
        "simhash_precision_audit",
        "countmin_sketch_audit",
        "bpe_vocab_train_k",
        "bpe_encode_apply",
        "incremental_dedup_equivalence",
        "theta_sketch_set_expressions",
        "txlog_incremental_mv",
        "opq_ivfpq_exact_topk",
        "c4_span_dedup_rewrite",
        "minhash_lsh_candidates",
    ]
    _tier = {n: 0 for n in HEADLINE if n in SINGLE_RUN}
    _tier.update({n: 1 for n in tracked if n in HEADLINE and n not in _tier})
    ordered = sorted(HEADLINE, key=lambda n: _tier.get(n, 2))
    for name in ordered:
        if name not in q.QUERIES:
            errors[name] = "not_registered"
            continue
        frac = (time.time() - t_start) / budget
        # r10: degrade earlier (0.3/0.55, was 0.4/0.65) — a throttled
        # host (rows 1.5-2x slower; see the r8/r9 adjudications) was
        # still hitting budget_exhausted skips on the tail despite the
        # sub-second trim below. Medians-of-fewer on late cheap rows
        # beat recorded holes; the bands carry the noise story.
        n_runs = RUNS_PER_QUERY if frac < 0.3 else (2 if frac < 0.55 else 1)
        if name in SINGLE_RUN:
            n_runs = 1
        if frac > 1.0:
            # the JSON line must ALWAYS land: once the budget is spent,
            # remaining queries are SKIPPED and recorded as such —
            # an explicit hole beats a truncated record (r7: the
            # integration tail grew past the wall on slow hosts)
            errors[name] = "budget_exhausted_skipped"
            continue
        runs = []
        try:
            for _i in range(n_runs):
                t0 = time.time()
                _materialize(q.QUERIES[name](spark, sf_dir))
                runs.append(time.time() - t0)
                # r10 (VERDICT r9 #4): sub-second rows don't need a
                # median-of-3 — the third run buys noise reduction the
                # band already carries, and across ~150 cheap rows it
                # is the minute that pushed contended hosts into
                # budget_exhausted skips. Two runs, keep the band.
                if _i == 0 and n_runs > 2 and runs[0] < 1.0:
                    n_runs = 2
        except Exception as e:  # noqa: BLE001 — record and keep benching
            errors[name] = f"{type(e).__name__}: {str(e).splitlines()[0][:200]}"
            continue
        timings[name] = round(statistics.median(runs), 3)
        if len(timings) % 50 == 0:
            _trace(f"{len(timings)} queries timed")

    total = round(sum(timings.values()), 3)
    # Key ORDER is part of the driver contract (r12, VERDICT r11
    # Missing #4): the driver records only the TAIL (~1.5 KB) of the
    # final line, so the big per-query dict goes FIRST and the audit
    # summary — metric/value, n_queries/n_errors/n_skips and the
    # (capped) error map — goes LAST, guaranteeing the recorded
    # BENCH_r{N}.json is self-auditing without the quiet local twin.
    out = {
        "queries": timings,
        "sf": sf,
        "runs_per_query": RUNS_PER_QUERY,
    }
    # the dedicated 5-run _qps_anchor bands are authoritative; derive
    # from the main-loop timing only if the anchor itself errored
    if "knn_batch_qps" not in extra and timings.get("knn_batch"):
        out["knn_batch_qps"] = round(KNN_BATCH_N_QUERIES / timings["knn_batch"], 3)
    if "knn_batch100_qps" not in extra and timings.get("knn_batch_100"):
        out["knn_batch100_qps"] = round(100 / timings["knn_batch_100"], 3)
    out.update(extra)
    skips = {n: e for n, e in errors.items() if e == "budget_exhausted_skipped"}
    hard_errors = {n: e for n, e in errors.items() if n not in skips}
    # cap the tail-resident error map so a pathological run can't push
    # the scalar summary back out of the capture window; the counts
    # below say how much was capped
    out["errors"] = dict(list(hard_errors.items())[:8])
    if len(hard_errors) > 8:
        out["errors_truncated"] = len(hard_errors) - 8
    if skips:
        out["skipped"] = sorted(skips)[:8]
        # mirror the hard-error truncation marker (r13, ADVICE r12
        # #4): n_skips preserves the count, this names how many
        # skipped-query NAMES the cap dropped
        if len(skips) > 8:
            out["skipped_truncated"] = len(skips) - 8
    # the scalar audit summary goes at the VERY end of the line
    out["metric"] = "headline_queries_total_wall"
    out["value"] = total
    out["unit"] = "sec"
    out["n_queries"] = len(timings)
    out["n_errors"] = len(hard_errors)
    out["n_skips"] = len(skips)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
