"""Edge inputs for the text-dedup family: short/empty docs, exact
duplicates, unicode — the cases the synthetic corpus never produces
(every fixture doc has ≥10 ascii tokens) but any real corpus does."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_knowledge_base_spark.operators.text_dedup import (
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash16,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_short_docs_emit_no_signature(spark):
    # < shingle_n tokens → no shingles → absent from signatures (the
    # oracle's absent-row semantics; ADVICE r01: NULL signatures must
    # never become LSH catch-all buckets)
    docs = _docs(spark, [(1, "one two"), (2, ""), (3, "a b c d e")])
    sig = minhash_signatures(docs)
    assert [r["doc_id"] for r in sig.collect()] == [3]
    cands = minhash_lsh_candidates(sig)
    assert cands.count() == 0


def test_exact_duplicates_are_lsh_candidates_and_jaccard_1(spark):
    text = "alpha beta gamma delta epsilon zeta"
    docs = _docs(spark, [(1, text), (2, text), (3, "totally different words here now")])
    sig = minhash_signatures(docs)
    rows = {r["doc_id"]: tuple(v for k, v in r.asDict().items() if k != "doc_id")
            for r in sig.collect()}
    assert rows[1] == rows[2] != rows[3]
    cands = {(r[0], r[1]) for r in minhash_lsh_candidates(sig).collect()}
    assert (1, 2) in cands
    jac = {(r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(docs, threshold=0.05).collect()}
    assert jac == {(1, 2): 1.0}


def test_simhash_identical_for_duplicates_and_total_for_all(spark):
    docs = _docs(spark, [(1, "x y z"), (2, "x y z"), (3, "p q r"), (4, "")])
    out = {r["doc_id"]: r["simhash"] for r in simhash16(docs).collect()}
    # every doc (even empty text: split('') → ['']) gets a fingerprint
    assert set(out) == {1, 2, 3, 4}
    assert out[1] == out[2]


def test_unicode_shingles_survive(spark):
    docs = _docs(
        spark,
        [(1, "日本語 トークン の テスト です よ"), (2, "日本語 トークン の テスト です よ"), (3, "völlig anderer text hier übrig")],
    )
    jac = {(r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert jac == {(1, 2): 1.0}
    sig = minhash_signatures(docs)
    assert sig.count() == 3


def test_jaccard_max_df_drops_universal_shingle(spark):
    # a shingle present in EVERY doc is dropped by the cap, so docs whose
    # only overlap is that stop-shingle produce no pair
    common = "the quick brown"
    docs = _docs(
        spark,
        [(i, f"{common} unique{i} tail{i} more{i}") for i in range(1, 6)],
    )
    uncapped = ngram_jaccard_pairs(docs, threshold=0.01)
    assert uncapped.count() == 10  # all pairs share the stop-shingle
    capped = ngram_jaccard_pairs(docs, threshold=0.01, max_df=3)
    assert capped.count() == 0


def test_winnowing_guarantee_shared_run_shares_fingerprint(spark):
    from vector_knowledge_base_spark.operators.text_dedup import winnowing_fingerprints

    # docs 1 and 2 share a 7-token run (>= window+shingle_n-1 = 6):
    # winnowing guarantees a common fingerprint
    shared = "one two three four five six seven"
    docs = _docs(
        spark,
        [
            (1, f"prefix tokens here {shared} alpha beta gamma"),
            (2, f"{shared} completely different tail words now"),
            (3, "no overlap with anything else at all in this document"),
        ],
    )
    fps = winnowing_fingerprints(docs)
    by_doc = {
        i: {r["fp"] for r in fps.where(F.col("doc_id") == i).collect()}
        for i in (1, 2, 3)
    }
    assert by_doc[1] & by_doc[2], "shared 7-token run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    # fingerprints are a strict subset of the full shingle hash set
    from vector_knowledge_base_spark.operators.text_dedup import doc_shingles
    n_sh = doc_shingles(docs).count()
    assert fps.count() < n_sh


# ---- exact-substring dedup (Lee et al. K-gram runs) ----------------------

def _subs_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_substring_profile_detects_shared_run(spark):
    """Two docs sharing a verbatim 12-token run (K=10): both get
    n_dup_kgrams = 3 (positions of the 3 shared 10-grams inside the
    12-token run) and longest_dup_run = 12; an unrelated doc gets 0."""
    from vector_knowledge_base_spark.operators.substring_dedup import (
        exact_substring_profile,
    )

    shared = " ".join(f"s{i}" for i in range(12))
    rows = [
        (1, shared + " tail1 tail2"),
        (2, "head1 head2 " + shared),
        (3, " ".join(f"u{i}" for i in range(20))),
    ]
    out = {
        r["doc_id"]: r
        for r in exact_substring_profile(_subs_docs(spark, rows), k=10).collect()
    }
    assert out[1]["n_dup_kgrams"] == 3 and out[1]["longest_dup_run"] == 12
    assert out[2]["n_dup_kgrams"] == 3 and out[2]["longest_dup_run"] == 12
    assert out[3]["n_dup_kgrams"] == 0 and out[3]["longest_dup_run"] == 0


def test_substring_profile_short_docs_excluded(spark):
    from vector_knowledge_base_spark.operators.substring_dedup import (
        exact_substring_profile,
    )

    rows = [(1, "only three tokens"), (2, " ".join(f"w{i}" for i in range(10)))]
    out = exact_substring_profile(_subs_docs(spark, rows), k=10).collect()
    assert [r["doc_id"] for r in out] == [2]
    assert out[0]["n_kgrams"] == 1


def test_substring_spans_positions(spark):
    """Span starts are 0-based token offsets of the maximal shared runs;
    runs below min_run are dropped."""
    from vector_knowledge_base_spark.operators.substring_dedup import (
        exact_substring_dedup_mask,
    )

    shared = " ".join(f"s{i}" for i in range(25))
    rows = [
        (1, "p0 p1 " + shared + " q0 q1"),   # run at token offset 2
        (2, shared),                          # run at token offset 0
        (3, " ".join(f"z{i}" for i in range(30))),
    ]
    spans = {
        r["doc_id"]: (r["span_start"], r["span_len_tokens"])
        for r in exact_substring_dedup_mask(
            _subs_docs(spark, rows), k=10, min_run=20
        ).collect()
    }
    assert spans[1] == (2, 25)
    assert spans[2] == (0, 25)
    assert 3 not in spans


def test_component_split_has_zero_leaks(spark):
    """The component-keyed split must produce NO cross-split near-dup
    pair — the property that makes it the remedy for the leakage
    audit (split_leakage_audit shows the doc-keyed split leaks)."""
    from vector_knowledge_base_spark import queries as q

    rows = q.QUERIES["split_by_component_leakfree"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows, "pair graph unexpectedly empty"
    assert all(not r["is_leak"] for r in rows)
    # and the doc-keyed audit DOES leak on the same corpus at sf0.01
    # (checked there because sf0.001 may have too few pairs to leak)


def test_simhash_hamming_candidates_verified(spark):
    """Every emitted candidate pair's hamming distance really is within
    the radius, and the pair set is symmetric-free (a < b) and distinct."""
    from vector_knowledge_base_spark.operators.text_dedup import (
        simhash_hamming_candidates,
        simhash_nbit,
    )
    from vector_knowledge_base_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = simhash_hamming_candidates(docs, max_hamming=3, nbits=32).collect()
    sims = {r["doc_id"]: r["simhash"] for r in simhash_nbit(docs, 32).collect()}
    seen = set()
    for r in got:
        a, b = r["doc_id_a"], r["doc_id_b"]
        assert a < b
        assert (a, b) not in seen
        seen.add((a, b))
        assert bin(sims[a] ^ sims[b]).count("1") == r["hamming"] <= 3


def test_incremental_dedup_against_stored_signatures(spark, tmp_path):
    """The production ingest chain over a REAL stored artifact: corpus
    MinHash signatures persisted to parquet once, the arriving batch
    probed against the STORED table — candidates identical to the
    in-memory computation (the signature table is a valid durable
    index, not a per-run recomputation)."""
    from vector_knowledge_base_spark.operators.text_dedup import (
        lsh_candidates_between,
        minhash_signatures,
    )
    from vector_knowledge_base_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    corpus = docs.where(F.col("doc_id") < 400)
    batch = docs.where(F.col("doc_id") >= 400)
    sig_path = str(tmp_path / "corpus_sigs")
    minhash_signatures(corpus).write.parquet(sig_path)

    stored = spark.read.parquet(sig_path)
    got = {
        (r["new_id"], r["corpus_id"])
        for r in lsh_candidates_between(
            minhash_signatures(batch), stored
        ).collect()
    }
    want = {
        (r["new_id"], r["corpus_id"])
        for r in lsh_candidates_between(
            minhash_signatures(batch), minhash_signatures(corpus)
        ).collect()
    }
    assert got == want and len(got) > 0


def test_ingest_chain_stored_artifacts_assignment_equivalence(spark, tmp_path):
    """The FULL production ingest chain over stored artifacts (r5,
    ROADMAP candidate #6): corpus MinHash signatures AND the corpus
    canonical table persisted to parquet once; an arriving batch is
    banded against the STORED signature table (corpus×batch), banded
    against itself (batch×batch), and assigned canonicals via
    incremental_canonical_assign over the STORED canonical artifact.
    The assignment must equal a full component rerun over
    corpus ∪ batch using the same candidate generator — nothing about
    reading the artifacts from disk may change the semantics."""
    from vector_knowledge_base_spark.operators.components import (
        connected_components,
        dedup_canonical,
        incremental_canonical_assign,
    )
    from vector_knowledge_base_spark.operators.text_dedup import (
        lsh_candidates_between,
        minhash_lsh_candidates,
        minhash_signatures,
    )
    from vector_knowledge_base_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    corpus = docs.where(F.col("doc_id") < 400)
    batch = docs.where(F.col("doc_id") >= 400)

    # ingest-time artifacts: signature table + canonical table
    sig_path = str(tmp_path / "corpus_sigs")
    canon_path = str(tmp_path / "corpus_canon")
    minhash_signatures(corpus).write.parquet(sig_path)
    corpus_pairs = minhash_lsh_candidates(minhash_signatures(corpus))
    dedup_canonical(corpus, corpus_pairs).write.parquet(canon_path)

    # batch arrival: probe stored signatures + band the batch itself
    stored_sigs = spark.read.parquet(sig_path)
    stored_canon = spark.read.parquet(canon_path)
    batch_sigs = minhash_signatures(batch)
    cross = lsh_candidates_between(batch_sigs, stored_sigs).select(
        F.col("corpus_id").alias("doc_id_a"), F.col("new_id").alias("doc_id_b")
    )
    within = minhash_lsh_candidates(batch_sigs)
    got = {
        (r["doc_id"], r["canonical_id"])
        for r in incremental_canonical_assign(
            stored_canon, batch, cross.unionAll(within)
        ).collect()
    }

    # full rerun over the union with the same generator
    all_pairs = corpus_pairs.unionAll(cross).unionAll(within)
    comp = connected_components(all_pairs, src="doc_id_a", dst="doc_id_b")
    full = {
        (r["doc_id"], r["canonical_id"])
        for r in batch.select("doc_id")
        .join(comp.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("canonical_id"),
        )
        .collect()
    }
    assert got == full and len(got) == batch.count()
    # the chain must have found at least one cross-partner adoption,
    # otherwise the test is vacuous
    assert any(c < 400 for _, c in got)


def test_doc_shingle_hash_sets_match_string_shingles(spark):
    """The r14 broadcast-verify artifact must be a faithful stand-in
    for string shingles: per-doc set SIZE and per-pair INTERSECTION
    size computed from the xxhash64 arrays equal the values computed
    from the string shingle sets (the quantities every precision /
    calibration audit derives from it)."""
    from vector_knowledge_base_spark.operators.text_dedup import (
        doc_shingle_hash_sets,
        doc_shingles,
    )
    from vector_knowledge_base_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    strings = {
        r["doc_id"]: set(r["sh"])
        for r in doc_shingles(docs)
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("sh"))
        .collect()
    }
    hashes = {
        r["doc_id"]: set(r["sh"]) for r in doc_shingle_hash_sets(docs).collect()
    }
    assert set(strings) == set(hashes)
    for d in strings:
        assert len(strings[d]) == len(hashes[d]), d
    ids = sorted(strings)
    pairs = [(a, b) for i, a in enumerate(ids[:30]) for b in ids[i + 1 : 30]]
    for a, b in pairs:
        assert len(strings[a] & strings[b]) == len(hashes[a] & hashes[b]), (a, b)


def test_attach_shingle_hash_sets_size_gate_fallback_identical(spark):
    """r15 (VERDICT r14 item #4): the four shingle audits' verify seam
    broadcasts the per-doc hash-set arrays only WITHIN a configurable
    budget; past it the same relations join sort-merge. Pin: the
    fallback path produces identical rows, and the physical plans
    really differ (BroadcastHashJoin within budget, SortMergeJoin past
    it — the gate is code, not a docstring)."""
    from vector_knowledge_base_spark.operators.text_dedup import (
        attach_shingle_hash_sets,
        doc_shingle_hash_sets,
        minhash_lsh_candidates,
        minhash_signatures,
    )
    from vector_knowledge_base_spark.plans.inspect import explain_str
    from vector_knowledge_base_spark.sources.tables import load_table

    # parquet-backed corpus: the gate reads the optimizer's size
    # estimate, which is only meaningful on a scan-derived lineage (a
    # pickled-RDD lineage estimates at defaultSizeInBytes-scale and
    # would conservatively take the fallback — also covered below)
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    cand = minhash_lsh_candidates(minhash_signatures(docs)).localCheckpoint(
        eager=True
    )
    arr = doc_shingle_hash_sets(docs).localCheckpoint(eager=True)
    bc = attach_shingle_hash_sets(cand, arr, broadcast_max_bytes=1 << 30)
    sm = attach_shingle_hash_sets(cand, arr, broadcast_max_bytes=0)
    assert "BroadcastHashJoin" in explain_str(bc)
    txt = explain_str(sm)
    assert "SortMergeJoin" in txt and "BroadcastHashJoin" not in txt, txt
    key = ["doc_id_a", "doc_id_b"]
    rows_bc = sorted(
        (r["doc_id_a"], r["doc_id_b"], sorted(r["sa"]), sorted(r["sb"]))
        for r in bc.collect()
    )
    rows_sm = sorted(
        (r["doc_id_a"], r["doc_id_b"], sorted(r["sa"]), sorted(r["sb"]))
        for r in sm.collect()
    )
    assert rows_bc == rows_sm and rows_bc
