"""Plan-shape guardrails (pushdown / pruning / broadcast) and multimodal
column operators."""

from __future__ import annotations

import struct

import pytest

from pyspark.sql import functions as F

from vector_knowledge_base_spark.operators.multimodal import (
    image_features,
    image_metadata,
    sample_frames,
)
from vector_knowledge_base_spark.plans.inspect import (
    explain_str,
    has_broadcast_join,
    pushed_filters,
    scan_read_schema,
)
from vector_knowledge_base_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


# ---- plan guardrails -----------------------------------------------------

@pytest.fixture(autouse=True)
def _clear_cache(spark):
    """Another module's .cache() of the same parquet path would swap the
    file scan for InMemoryTableScan (which has no PushedFilters) — plan
    assertions need the real scan."""
    spark.catalog.clearCache()
    yield


def test_filter_pushdown_reaches_scan(spark):
    li = load_table(spark, SF, "lineitem")
    df = li.where(F.col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    pf = pushed_filters(df)
    assert any("l_quantity" in f for f in pf), f"no pushdown: {pf}"


def test_column_pruning(spark):
    li = load_table(spark, SF, "lineitem")
    df = li.select("l_orderkey", "l_quantity")
    schemas = scan_read_schema(df)
    assert schemas, "no ReadSchema found"
    # only the 2 projected columns are read, not all 11
    assert all(s.count(":") <= 2 for s in schemas), schemas


def test_knn_pushes_filter_below_topk(spark):
    from vector_knowledge_base_spark.operators.knn import cosine_topk

    emb = load_table(spark, SF, "embeddings")
    q = emb.select("embedding").first()[0]
    df = cosine_topk(emb, q, k=5, filters={"label": [1, 2]})
    pf = pushed_filters(df)
    assert any("label" in f for f in pf), f"label filter not pushed: {pf}"
    assert "TakeOrderedAndProject" in explain_str(df)


def test_dimension_join_broadcasts(spark):
    orders = load_table(spark, SF, "orders")
    customer = load_table(spark, SF, "customer")
    df = orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
    assert has_broadcast_join(df)


def test_multiway_join_no_cartesian(spark):
    from vector_knowledge_base_spark.queries import QUERIES

    df = QUERIES["multiway_join_revenue"](spark, SF)
    assert "CartesianProduct" not in explain_str(df)


# ---- multimodal ----------------------------------------------------------

def _png_bytes(w: int, h: int) -> bytes:
    # minimal PNG header: signature + IHDR length/type + w/h
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", w, h)
        + b"\x08\x02\x00\x00\x00" + b"\x00" * 16
    )


@pytest.fixture(scope="module")
def media_df(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("media")
    (d / "img1.png").write_bytes(_png_bytes(640, 480))
    (d / "img2.png").write_bytes(_png_bytes(32, 32))
    (d / "clip.bin").write_bytes(bytes(range(256)) * 200)  # 51200 B “video”
    return spark.read.format("binaryFile").load(str(d))


def test_image_metadata(spark, media_df):
    rows = {r.path.split("/")[-1]: r for r in image_metadata(media_df).collect()}
    assert rows["img1.png"].format == "png"
    assert (rows["img1.png"].width, rows["img1.png"].height) == (640, 480)
    assert (rows["img2.png"].width, rows["img2.png"].height) == (32, 32)
    assert rows["clip.bin"].format == "unknown"


def test_image_features_deterministic_unit(spark, media_df):
    import numpy as np

    f1 = {r.path: list(r.feature) for r in image_features(media_df).collect()}
    f2 = {r.path: list(r.feature) for r in image_features(media_df).collect()}
    assert f1 == f2  # deterministic
    for v in f1.values():
        assert len(v) == 64
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5


def test_sample_frames_udtf_shape(spark, media_df):
    frames = sample_frames(media_df, every_n=10).collect()
    clip_frames = [r for r in frames if r.path.endswith("clip.bin")]
    # 51200 B → 50 pseudo-frames → sampled every 10 → 5
    assert len(clip_frames) == 5
    assert all(len(r.frame) == 1024 for r in clip_frames)


def test_decontaminate_broadcasts_eval_set(spark):
    """The eval n-gram set must broadcast (the train corpus must never
    shuffle for the contamination semi-join)."""
    from vector_knowledge_base_spark.plans.inspect import (
        assert_no_cartesian,
        has_broadcast_join,
    )
    from vector_knowledge_base_spark.queries import QUERIES

    df = QUERIES["decontaminate_train_eval"](spark, SF)
    assert has_broadcast_join(df)
    assert_no_cartesian(df)


def test_approx_sketches_within_corridor(spark):
    """The approx swap-ins a 100 TB run would use (HLL distinct count,
    quantile sketch) stay within tight relative error of the exact
    answers on the events table — the evidence behind the README claim."""
    from vector_knowledge_base_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events")
    exact = ev.select(F.countDistinct("user_id")).first()[0]
    approx = ev.select(F.approx_count_distinct("user_id", rsd=0.02)).first()[0]
    assert abs(approx - exact) / exact <= 0.05, (exact, approx)

    exact_p50 = ev.selectExpr("percentile(value, 0.5)").first()[0]
    approx_p50 = ev.selectExpr("approx_percentile(value, 0.5, 10000)").first()[0]
    spread = ev.selectExpr("max(value) - min(value)").first()[0]
    assert abs(approx_p50 - exact_p50) <= 0.01 * spread, (exact_p50, approx_p50)


def test_dynamic_partition_pruning(spark, tmp_path):
    """A fact table partitioned on disk by day, joined to a filtered dim
    of days, must prune partitions at RUNTIME (dynamicpruning expression
    in the scan) — at 100 TB this is the difference between scanning 2
    partitions and 3 years of them."""
    from vector_knowledge_base_spark.plans.inspect import explain_str
    from vector_knowledge_base_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "day", F.to_date("ts")
    )
    fact_dir = str(tmp_path / "events_by_day")
    dim_dir = str(tmp_path / "day_dim")
    ev.write.partitionBy("day").parquet(fact_dir)
    # day dimension on storage with a selective LITERAL predicate — the
    # canonical DPP shape (join key = partition column, filtered dim;
    # a bare boolean-attribute filter is not judged selective by the
    # PartitionPruning rule, a literal comparison is)
    ev.select("day").distinct().withColumn(
        "dow", F.dayofweek("day")
    ).write.parquet(dim_dir)
    spark.read.parquet(fact_dir).createOrReplaceTempView("dpp_fact")
    spark.read.parquet(dim_dir).createOrReplaceTempView("dpp_dim")
    # pin the rule's cost heuristics: at fixture scale the stats-based
    # benefit estimate would veto pruning that is a clear win at 100 TB
    old = {
        "spark.sql.adaptive.enabled": spark.conf.get("spark.sql.adaptive.enabled"),
        "spark.sql.optimizer.dynamicPartitionPruning.useStats": spark.conf.get(
            "spark.sql.optimizer.dynamicPartitionPruning.useStats"
        ),
    }
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
        joined = spark.sql(
            "SELECT SUM(f.value) AS s FROM dpp_fact f "
            "JOIN dpp_dim d ON f.day = d.day WHERE d.dow = 2"
        )
        txt = explain_str(joined)
        assert "dynamicpruning" in txt.lower(), txt
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key join WITHOUT a shuffle on
    either side (no Exchange above the scans) — the co-located join
    layout a 100 TB fact⋈fact pipeline pre-arranges at write time."""
    import uuid

    from vector_knowledge_base_spark.plans.inspect import explain_str
    from vector_knowledge_base_spark.sources.tables import load_table

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, "/root/testdata/sf0.001", "orders")
        cust = load_table(spark, "/root/testdata/sf0.001", "customer")
        t1, t2 = f"orders_b_{uuid.uuid4().hex[:8]}", f"cust_b_{uuid.uuid4().hex[:8]}"
        orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable(t1)
        cust.write.bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable(t2)
        joined = spark.table(t1).join(
            spark.table(t2), F.col("o_custkey") == F.col("c_custkey")
        )
        txt = explain_str(joined)
        assert "SortMergeJoin" in txt, txt
        # bucketed scans feed the join directly: no Exchange anywhere
        assert "Exchange hashpartitioning" not in txt, txt
        spark.sql(f"DROP TABLE {t1}")
        spark.sql(f"DROP TABLE {t2}")
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_hll_sketch_union_matches_rescan(spark):
    """Sketch mergeability: the union of per-group HLL sketches and a
    single sketch over all rows both land within 5% of the exact count
    (union changes the estimator path, so the two estimates may differ
    slightly — the corridor is the contract, not bit-equality)."""
    from vector_knowledge_base_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    merged = (
        docs.groupBy("source")
        .agg(F.hll_sketch_agg("doc_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .first()["est"]
    )
    direct = docs.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("doc_id")).alias("est")
    ).first()["est"]
    exact = docs.select("doc_id").distinct().count()
    assert abs(merged - exact) / exact < 0.05
    assert abs(direct - exact) / exact < 0.05


def test_bloom_filter_runtime_join_filter(spark):
    """AQE injects a bloom-filter runtime filter on the fact side of a
    selective join (size thresholds pinned for fixture scale) — the
    shuffle-side row pruning a 100 TB fact⋈filtered-dim join relies on
    when broadcast is off the table."""
    from vector_knowledge_base_spark.plans.inspect import explain_str
    from vector_knowledge_base_spark.sources.tables import load_table

    old = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        ),
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
        orders = load_table(spark, "/root/testdata/sf0.001", "orders").where(
            F.col("o_totalprice") > 400000
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey).agg(
            F.sum("l_quantity")
        )
        assert "bloom_filter_agg" in explain_str(j), explain_str(j)
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_max_by_top1_has_no_window_sort(spark):
    """latest_event_per_user's claim: top-1-per-group compiles to a hash
    aggregate (max_by), never a Window + per-partition sort — the
    cost-class difference the docstring promises at scale."""
    from vector_knowledge_base_spark import queries as q

    plan = explain_str(q.QUERIES["latest_event_per_user"](spark, SF))
    assert "Window" not in plan, plan
    assert "max_by" in plan or "Aggregate" in plan


def test_hybrid_rrf_prunes_before_ranking(spark):
    """hybrid_search_rrf must prune each side to top-N candidates via
    TakeOrderedAndProject (per-partition heap) BEFORE any row_number
    Window — the corpus is never globally sorted; every Window in the
    plan ranks an already-limited N-row candidate list."""
    from vector_knowledge_base_spark import queries as q

    plan = explain_str(q.QUERIES["hybrid_search_rrf"](spark, SF))
    # r2's global-rank plan had exactly ONE TakeOrderedAndProject (the
    # final limit) with both Windows sorting the raw corpus; prune-first
    # shows three: kw candidate prune, vec candidate prune, final top-10.
    # The Windows' own Exchange SinglePartition still appears, but it now
    # moves only the N pruned candidate rows.
    assert plan.count("TakeOrderedAndProject") >= 3, plan


def test_bm25_single_scan_broadcast_stats(spark):
    """bm25_keyword_search's claim: corpus stats reduce to ONE broadcast
    row joined back — the plan shows a broadcast join and a top-20
    TakeOrderedAndProject, and the documents scan reads only the two
    needed columns."""
    from vector_knowledge_base_spark import queries as q

    df = q.QUERIES["bm25_keyword_search"](spark, SF)
    plan = explain_str(df)
    # keyless 1-row stats join compiles to BroadcastNestedLoopJoin (the
    # right operator for a single-row build side), not BroadcastHashJoin
    assert "BroadcastExchange" in plan, plan
    assert "TakeOrderedAndProject" in plan
    schemas = scan_read_schema(df)
    assert all(s.count(":") <= 2 for s in schemas), schemas


def test_bloom_decontamination_broadcasts_filter(spark):
    """decontaminate_bloom probes a BROADCAST word-bitmap table — the
    whole point vs broadcasting raw shingles — and never a cartesian."""
    from vector_knowledge_base_spark import queries as q
    from vector_knowledge_base_spark.plans.inspect import assert_no_cartesian

    df = q.QUERIES["decontaminate_bloom"](spark, SF)
    assert has_broadcast_join(df)
    assert_no_cartesian(df)


def test_silhouette_broadcasts_centroids(spark):
    """cluster_silhouette_simplified scores points against the BROADCAST
    (label x dim) centroid table — O(n*k*d) scan-side, no shuffle of the
    exploded dimension stream beyond its two hash aggregates."""
    from vector_knowledge_base_spark import queries as q

    df = q.QUERIES["cluster_silhouette_simplified"](spark, SF)
    assert has_broadcast_join(df)


def test_rerank_pipeline_prunes_before_rerank(spark):
    """rerank_pipeline_topk's two stages both compile to
    TakeOrderedAndProject (candidate prune + final top-10): the reranker
    input is never corpus-sized."""
    from vector_knowledge_base_spark import queries as q

    plan = explain_str(q.QUERIES["rerank_pipeline_topk"](spark, SF))
    assert plan.count("TakeOrderedAndProject") >= 2, plan


def test_triangle_join_broadcasts_edges(spark):
    """Triangle enumeration probes broadcast copies of the (small,
    support-thresholded) edge list — no sort-merge join, no cartesian."""
    from vector_knowledge_base_spark import queries as q
    from vector_knowledge_base_spark.plans.inspect import assert_no_cartesian

    df = q.QUERIES["triangle_count_copurchase"](spark, SF)
    assert has_broadcast_join(df)
    assert_no_cartesian(df)


def test_pack_sequences_window_is_sharded(spark):
    """The r3 verdict's one surviving scale-killer: sequence packing must
    NOT run its cumulative-sum window over a single global partition.
    The plan must hash-partition on the shard column and contain no
    SinglePartition exchange."""
    from vector_knowledge_base_spark import queries as q

    plan = explain_str(q.QUERIES["pack_sequences_greedy"](spark, SF))
    assert "SinglePartition" not in plan, plan
    assert "hashpartitioning(shard" in plan, plan


def test_transitions_window_is_user_partitioned(spark):
    """event_type_transitions' per-row window must partition by user —
    never a global-order single-partition sort of the stream."""
    from vector_knowledge_base_spark import queries as q

    plan = explain_str(q.QUERIES["event_type_transitions"](spark, SF))
    win_lines = [l for l in plan.splitlines() if "partitionBy" in l.lower() or "windowspecdefinition" in l.lower()]
    assert "user_id" in plan
    assert "CartesianProduct" not in plan
    # the raw-stream window carries the user partition key
    assert any("user_id" in l for l in plan.splitlines() if "Window" in l or "windowspec" in l.lower()) or "user_id" in " ".join(win_lines)


def test_curriculum_bands_no_global_rank(spark):
    """curriculum_quality_bands must assign bands by comparing to
    broadcast percentile BOUNDS — no ntile/row_number global rank over
    the corpus (the single-partition-sort anti-pattern)."""
    from vector_knowledge_base_spark import queries as q

    plan = explain_str(q.QUERIES["curriculum_quality_bands"](spark, SF))
    # "percentile(" ends in "ntile(" — strip it before the rank check
    deperc = plan.replace("percentile(", "PCTL(")
    assert "ntile(" not in deperc
    assert "row_number(" not in deperc
    # the 1-row bounds side joins as a broadcast
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_snapshot_diff_single_equijoin(spark):
    """snapshot_diff_orders is ONE key-equijoin (full outer SMJ/SHJ) —
    no nested-loop, no cartesian, nothing quadratic."""
    from vector_knowledge_base_spark import queries as q

    plan = explain_str(q.QUERIES["snapshot_diff_orders"](spark, SF))
    assert "FullOuter" in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_simhash_candidates_equijoin_only(spark):
    """simhash_hamming_candidates joins on (chunk, value) equality —
    the pigeonhole trick means NO all-pairs operator may appear."""
    from vector_knowledge_base_spark import queries as q

    plan = explain_str(q.QUERIES["simhash_hamming_candidates"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_simhash_candidates_single_lineage_no_distinct(spark):
    """Regression guard for the r4 double-lineage finding: the
    fingerprint pipeline (token explode + 32 SUM aggregates) must be
    materialized ONCE (localCheckpoint -> ExistingRDD scan) before the
    pigeonhole self-join, and the first-match-only predicate must have
    replaced the post-join .distinct() — so the final plan contains NO
    aggregate at all and both join sides read the checkpointed RDD."""
    from vector_knowledge_base_spark import queries as q

    plan = explain_str(q.QUERIES["simhash_hamming_candidates"](spark, SF))
    assert "ExistingRDD" in plan, "fingerprints not materialized pre-join"
    # the 32-SUM simhash aggregate and the distinct() would both show
    # up as HashAggregate; neither may survive in the candidate plan
    assert "HashAggregate" not in plan
    assert "Scan parquet" not in plan, "raw docs rescanned past the barrier"
    # and the checkpointed fingerprints must be re-spread across the
    # cluster: AQE coalesces the tiny fingerprint shuffle to ONE
    # partition, which would serialize the collision join + hamming
    # verify through a single task (measured 18s single-task vs ~1s
    # parallel on the audit's 1.5M pairs at sf0.1)
    assert "RoundRobinPartitioning" in plan, "candidate join not parallelized"


def test_ivfpq_serving_plan_is_codegen_topk(spark):
    """IVF-PQ serving plan guard (r6): against a MATERIALIZED index the
    hot path must be pure JVM — the ADC score is literal-array lookups
    (no Python UDF may appear past the encode), the cell probe is a
    pushable filter, and both the shortlist and the final rerank
    compile to TakeOrderedAndProject (per-partition heaps, no global
    sort). This is the plan that makes the codes-only scan claim true
    at 100 TB."""
    from vector_knowledge_base_spark.operators.ann import (
        build_ivfpq,
        ivfpq_topk,
    )
    from vector_knowledge_base_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    centroids, codebooks, index = build_ivfpq(emb, n_cells=8, m=8, ksub=16)
    plan = explain_str(
        ivfpq_topk(
            centroids, codebooks, index, emb, q,
            k=10, n_probe=4, shortlist=100,
        )
    )
    assert "TakeOrderedAndProject" in plan
    for udf_node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert udf_node not in plan, f"Python stage {udf_node} in serving plan"
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_batch_hybrid_rrf_single_exchange_plan(spark):
    """r14 plan guard: the batch-hybrid fusion plan must keep BOTH
    window ranks AND the fused top-k on ONE query-id exchange (the
    three row_number windows share the partitioning), broadcast the
    query side, prune the final top-k with WindowGroupLimit, and
    never sort-merge or cartesian-join. A regression that splits the
    windows onto separate exchanges (or materializes the fusion as a
    real join) fails here, not in a bench record."""
    import re

    from vector_knowledge_base_spark.operators.knn import batch_hybrid_rrf
    from vector_knowledge_base_spark.plans.inspect import assert_no_cartesian

    emb = load_table(spark, SF, "embeddings")
    docs = load_table(spark, SF, "documents")
    corpus = docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id", "text", "embedding"
    )
    qv = [float(x) for x in emb.select("embedding").first()[0]]
    qdf = spark.createDataFrame(
        [(0, ["vector"], qv), (1, ["data", "vector"], qv)],
        "query_id int, terms array<string>, query_vec array<double>",
    )
    df = batch_hybrid_rrf(qdf, corpus, k=10, n=1000)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert "WindowGroupLimit" in plan
    assert "SortMergeJoin" not in plan
    assert len(re.findall(r"\bWindow\b", plan)) >= 3  # rk, rv, fused rank
    assert_no_cartesian(df)


def test_facade_batch_spark_hydration_broadcasts_hits(spark, tmp_path):
    """r14 plan guard: both batch verbs' spark-mode hydration joins
    must be INNER BroadcastHashJoins building the N×k hits side — a
    left-outer here could only broadcast-build the corpus side, which
    at 100 TB degrades to a sort-merge shuffle of the table."""
    import re

    from vector_knowledge_base_spark.service import KnowledgeBase

    kb = KnowledgeBase(spark, str(tmp_path / "ws"), storage="parquet")
    kb.create_document("a.txt", "vector search spark join")
    for df in (
        kb.search_batch(["vector"], k=2, mode="spark"),
        kb.search_hybrid_batch(["vector"], k=2, mode="spark"),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        hydr = [
            l for l in plan.splitlines()
            if "BroadcastHashJoin" in l and "chunk_id" in l
        ]
        assert hydr and all(
            "Inner, BuildRight" in l for l in hydr
        ), plan
        assert "SortMergeJoin" not in plan
