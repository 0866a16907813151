"""Text near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard
(north-star dedup family; no reference counterpart — the reference dedups
only by exact document identity, /root/reference/backend/document_registry.py:193-203).

Everything is built from native Spark SQL expressions (md5-based hashing,
zip-slice shingle construction, explode + hash-aggregate), so the same
pipeline is expressible in ANSI SQL for the DuckDB oracle and stays
inside whole-stage codegen — no Python anywhere, and no higher-order
array lambdas either: Spark evaluates transform/filter lambdas
INTERPRETED, and ``InferFiltersFromGenerate`` clones generator-input
expressions into pushed-down filters, so lambda-built arrays get
evaluated up to 3× per row (this module's r01→r02 rewrite was worth
2-5× on every operator).

Cross-engine-deterministic hashing: where the oracle must reproduce the
VALUE (MinHash/SimHash signatures), hashes use the first 8 hex chars of
md5 → int64 ("h32"), identical in any engine with md5. Where only
IDENTITY matters (Jaccard posting-list keys), the cheaper engine-local
``xxhash64`` is used and the oracle keeps the string form — identical
results modulo 64-bit collisions (~n²/2⁶⁵).

Scale notes:
- signature operators shuffle exactly ONE pre-combined row per document
  (map-side partial aggregation; a doc's tokens live in one input row),
  independent of document length — and never document text;
- the inverted-index Jaccard and LSH banding shuffle 8-byte hashed keys;
- document-frequency capping (``max_df``) drops degenerate high-
  frequency shingles that would otherwise create quadratic skew at
  100 TB (the classic salting-free skew fix for similarity joins);
- MinHash/LSH turns all-pairs O(n²) into O(candidates); band count and
  rows-per-band tune the jaccard threshold s ≈ (1/bands)^(1/rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# fixed affine-hash parameters: h_i(x) = (A[i]*h32(x) + B[i]) mod P
# P prime > 2^32; A[i] < 1e6 keeps A*h32 < 2^63 (no overflow).
MINHASH_P = 4_294_967_311
MINHASH_A = [433_494, 514_229, 831_571, 287_117, 963_581, 121_393, 655_357, 749_471]
MINHASH_B = [377_011, 917_113, 102_931, 582_119, 271_829, 838_861, 461_717, 299_709]


def h32(col: Column | str) -> Column:
    """Engine-portable 32-bit string hash: first 8 hex chars of md5."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("binary")), 1, 8), 16, 10).cast("bigint")


def shingle_structs(tokens_col: str = "toks", n: int = 3) -> Column:
    """Word n-gram shingles from a PRE-MATERIALIZED token-array column,
    as ``array<struct>`` of n-token windows — built from ``arrays_zip``
    over n shifted ``slice``s.

    Why structs, not strings: higher-order lambdas (``transform`` with a
    per-element ``concat_ws∘slice``) are INTERPRETED in Spark — and worse,
    ``InferFiltersFromGenerate`` clones the generator-input expression
    into a pushed-down filter, so an expensive shingle array gets
    evaluated up to 3× per row (measured 2.3s vs 0.6s at sf0.1). The
    zip-of-slices form is plain codegen'd expressions; even when the
    optimizer duplicates it, it stays cheap. Callers needing the string
    form concat AFTER the explode (per-row codegen, evaluated once).

    Guarded for short texts (< n tokens): ``slice`` with a negative
    length throws under ANSI mode, so short docs short-circuit to an
    empty array (→ no shingles, doc absent downstream — the same
    absent-row semantics as the SQL oracles)."""
    slices = ", ".join(
        f"slice({tokens_col}, {i + 1}, size({tokens_col}) - {n - 1})" for i in range(n)
    )
    return F.expr(
        f"CASE WHEN size({tokens_col}) >= {n} THEN arrays_zip({slices}) "
        f"ELSE CAST(array() AS ARRAY<STRUCT<{', '.join(f'`{i}`: STRING' for i in range(n))}>>) END"
    )


def _shingle_text(n: int = 3, struct_col: str = "s") -> Column:
    """Space-joined shingle string from one exploded shingle struct
    (``arrays_zip`` names fields "0".."n-1")."""
    return F.concat_ws(" ", *[F.col(f"{struct_col}.{i}") for i in range(n)])


def doc_shingles(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(doc_id, shingle) distinct — the inverted-index base relation.

    Repartitions the (narrow) document rows across the cluster before
    the explode fan-out: a single dense input file must not serialize
    the whole shingle pipeline through one task."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.select(F.col(id_col), F.split(F.col(text_col), " ").alias("toks"))
        .repartition(par)
        .select(F.col(id_col), F.explode(shingle_structs("toks", n)).alias("s"))
        .select(F.col(id_col), _shingle_text(n).alias("shingle"))
        .distinct()
    )


def doc_shingle_hash_sets(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(doc_id, array<long>) — per-doc DISTINCT-shingle xxhash64 sets,
    the broadcastable exact-verify artifact (r14): precision/calibration
    audits intersect these arrays per CANDIDATE pair instead of
    shuffle-joining the full exploded shingle relation (two sort-merge
    joins + a pair aggregation + sizes joins become one per-row
    ``array_intersect``). Hash equality stands in for string equality,
    the same convention as the posting-list operators
    (``ngram_jaccard_pairs`` / ``shingle_containment_pairs``); longs
    intersect far cheaper than shingle strings and broadcast ~3x
    smaller. |set| and |intersection| equal the string-shingle values
    (pinned by tests/test_text_dedup_edges.py)."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.select(F.col(id_col), F.split(F.col(text_col), " ").alias("toks"))
        .repartition(par)
        .select(F.col(id_col), F.explode(shingle_structs("toks", n)).alias("s"))
        .select(
            F.col(id_col),
            F.xxhash64(*[F.col(f"s.{i}") for i in range(n)]).alias("sh"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("sh").alias("sh"))
    )


def attach_shingle_hash_sets(
    cand: DataFrame,
    arr: DataFrame,
    a_col: str = "doc_id_a",
    b_col: str = "doc_id_b",
    broadcast_max_bytes: int | None = None,
) -> DataFrame:
    """Join the per-doc hash-set arrays (``doc_shingle_hash_sets``
    output, materialized by the caller) onto both id columns of a
    candidate-pair stream as ``sa``/``sb`` — the shared verify seam of
    the four shingle audits (lsh_candidate_precision,
    minhash_calibration_audit, minhash_threshold_sweep,
    simhash_precision_audit).

    SIZE-GATED broadcast (r15, VERDICT r14 item #4 — the r14 form
    broadcast unconditionally and only documented the limit): within
    ``broadcast_max_bytes`` (default 128 MiB, env override
    ``SPARK_GRAFT_AUDIT_BROADCAST_MAX_BYTES`` — sized to what one
    executor + the driver can hold twice, guide §3.1) the arrays
    broadcast and the candidate stream is never shuffled; past it the
    verify falls back to sort-merge equi-joins of the SAME relations
    (hinted, so the choice never depends on planner estimates) —
    identical rows either way, only the physical join strategy moves.
    The estimate is the optimizer's own size of the materialized
    array relation (zero jobs — localCheckpoint carries exact stats);
    an unavailable estimate conservatively takes the shuffle path."""
    import os

    if broadcast_max_bytes is None:
        broadcast_max_bytes = int(
            os.environ.get(
                "SPARK_GRAFT_AUDIT_BROADCAST_MAX_BYTES",
                str(128 * 1024 * 1024),
            )
        )
    try:
        est = int(
            arr._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # noqa: BLE001 — no estimate → conservative path
        est = None
    sa = arr.select(F.col("doc_id").alias(a_col), F.col("sh").alias("sa"))
    sb = arr.select(F.col("doc_id").alias(b_col), F.col("sh").alias("sb"))
    if est is not None and est <= broadcast_max_bytes:
        sa, sb = F.broadcast(sa), F.broadcast(sb)
    else:
        sa, sb = sa.hint("merge"), sb.hint("merge")
    return cand.join(sa, a_col).join(sb, b_col)


def minhash_signatures(
    docs: DataFrame,
    n_hashes: int = 8,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document MinHash signature as columns mh_0..mh_{n-1}.

    Explode + single hash-aggregate — the whole pipeline is codegen'd
    (split → zip-slice shingles → explode → md5 → n MIN aggregates).
    MIN over a multiset equals MIN over the set, so no distinct pass is
    needed. The groupBy shuffles ONE row per (doc × partition) thanks to
    map-side partial aggregation — and since a document's tokens live in
    one row (hence one partition), exactly one row per doc: at 100 TB
    the shuffle is |docs| × (8 longs), independent of document length.

    (The previous zero-shuffle formulation — array_min over transform
    lambdas in a scan projection — was 4.7× slower at sf0.1: higher-order
    lambdas are interpreted, and 8 signature columns meant 9 interpreted
    array passes per row. A tiny pre-combined shuffle beats that.)

    Docs shorter than shingle_n tokens have no shingles: explode emits
    no row, so they are absent from the output — matching the SQL
    oracle, which derives docs from exploded shingles."""
    assert n_hashes <= len(MINHASH_A)
    par = docs.sparkSession.sparkContext.defaultParallelism
    h = (
        docs.select(F.col(id_col), F.split(F.col(text_col), " ").alias("toks"))
        .repartition(par)
        .select(F.col(id_col), F.explode(shingle_structs("toks", shingle_n)).alias("s"))
        .select(F.col(id_col), h32(_shingle_text(shingle_n)).alias("h"))
    )
    aggs = [
        F.min((F.lit(MINHASH_A[i]) * F.col("h") + F.lit(MINHASH_B[i])) % F.lit(MINHASH_P)).alias(
            f"mh_{i}"
        )
        for i in range(n_hashes)
    ]
    return h.groupBy(id_col).agg(*aggs)


def _pairs_from_sorted_ids(ids_col: str = "ids") -> Column:
    """All (a < b) pairs from a SORTED id array, as array<struct>.

    ``transform``'s 2-arg lambda binds (element, 0-based index); element
    i pairs with every later element, i.e. ``slice`` starting at 1-based
    position i+2 (slice clamps past the end)."""
    return F.expr(
        f"flatten(transform({ids_col}, (x, i) -> "
        f"transform(slice({ids_col}, i + 2, size({ids_col})), "
        f"y -> struct(x AS doc_id_a, y AS doc_id_b))))"
    )


def minhash_lsh_candidates(
    signatures: DataFrame,
    bands: int = 4,
    rows_per_band: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing at least one LSH band.

    The signature is split into ``bands`` bands of ``rows_per_band``
    minhashes; each band becomes a grouping key (band_idx, band_key).
    Formulated as ONE groupBy (bucket members collected per band key,
    pairs generated inside each bucket) rather than a band-key self-join:
    a self-join executes the full scan→shingle→minhash lineage once per
    side (r01's 2nd-slowest headline query), while the groupBy runs it
    once, with no cache to leak. Bucket sizes are O(band collisions) —
    tiny for near-dup-scale thresholds — so the per-bucket pair arrays
    are bounded; candidates stay O(collisions), never O(n²).
    Output: (doc_id_a < doc_id_b) distinct.
    """
    band_cols = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.concat_ws(
                "_", *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
            ).alias("band_key"),
        )
        for b in range(bands)
    ]
    banded = signatures.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("band")
    ).select(id_col, "band.band_idx", "band.band_key")
    buckets = (
        banded
        # null-guard: concat_ws collapses NULL minhashes to "" — such
        # rows must not become a catch-all bucket (defense in depth;
        # minhash_signatures already drops shingle-less docs)
        .where(F.col("band_key") != "")
        .groupBy("band_idx", "band_key")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .where(F.size("ids") >= 2)
    )
    return (
        buckets.select(F.explode(_pairs_from_sorted_ids("ids")).alias("p"))
        .select("p.doc_id_a", "p.doc_id_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.05,
    shingle_n: int = 3,
    max_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle.

    Inverted-index formulation, never a cross join — ONE lineage, ONE
    scan, TWO shuffles, ZERO joins:

    - each doc's distinct-shingle count |A| is computed in the scan
      projection and carried THROUGH the inverted index as part of the
      posting entry ``struct(id, n_sh)`` — so when pairs are emitted
      from inside a posting list, both sizes ride along and the union
      |A|+|B|−|A∩B| needs no size-lookup join afterwards;
    - the pair count groups on (id_a, n_a, id_b, n_b); n is functionally
      dependent on id, so the grouping is equivalent to (id_a, id_b);
    - no branch reuses ``base`` (the r01 version computed the shingle
      lineage once per join side and needed a cache it leaked; the
      intermediate version still computed it twice for the sizes side).

    ``max_df`` drops shingles whose posting list exceeds that many docs
    (the skew cap): without it a stop-shingle in d docs contributes
    O(d²) pairs — quadratic on power-law corpora. Uncapped mode is the
    small-corpus exactness oracle; at scale ALWAYS set ``max_df``, which
    also bounds every posting-list pair array to max_df²/2.

    The inverted index groups on ``xxhash64`` of the shingle (8-byte
    shuffle keys instead of ~25-byte strings; intersection counts only
    need shingle IDENTITY, not its text). A 64-bit collision would merge
    two shingles' posting lists — probability ~n²/2⁶⁵ for n distinct
    shingles, negligible below ~10¹² shingles and at worst perturbing
    one pair's intersection count by 1.
    """
    par = docs.sparkSession.sparkContext.defaultParallelism
    postings = (
        docs.select(F.col(id_col), F.split(F.col(text_col), " ").alias("toks"))
        # spread dense input files before the explode fan-out (see
        # doc_shingles note)
        .repartition(par)
        .select(
            F.col(id_col),
            F.array_distinct(shingle_structs("toks", shingle_n)).alias("sh"),
        )
        .select(
            F.struct(F.col(id_col).alias("id"), F.size("sh").alias("n")).alias(
                "doc"
            ),
            F.explode("sh").alias("s"),
        )
        .select(
            "doc",
            F.xxhash64(*[F.col(f"s.{i}") for i in range(shingle_n)]).alias("shingle"),
        )
        .groupBy("shingle")
        # sort_array on struct orders by first field (id) — pair
        # generation below needs id-sorted lists for a < b
        .agg(F.sort_array(F.collect_list("doc")).alias("ids"))
    )
    keep = F.size("ids") >= 2
    if max_df is not None:
        keep = keep & (F.size("ids") <= max_df)
    pairs = (
        postings.where(keep)
        .select(F.explode(_pairs_from_sorted_ids("ids")).alias("p"))
        .groupBy(
            F.col("p.doc_id_a.id").alias("doc_id_a"),
            F.col("p.doc_id_a.n").alias("n_a"),
            F.col("p.doc_id_b.id").alias("doc_id_b"),
            F.col("p.doc_id_b.n").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        pairs.where(jac >= threshold)
        .select("doc_id_a", "doc_id_b", F.round(jac, 6).alias("jaccard"))
    )


def simhash16(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """16-bit SimHash over distinct whitespace tokens.

    bit b of the fingerprint = sign of Σ_tokens (±1 by token-hash bit b);
    near-dup docs differ in few bits (compare via hamming distance).

    Explode + single hash-aggregate, fully codegen'd: distinct tokens
    explode to rows, each bit-sum is a ``SUM(CASE WHEN bit THEN 1 ELSE
    -1)`` aggregate, and the 16 sums fold into the fingerprint in a
    final projection. Map-side partial aggregation means the shuffle is
    one 16-long row per document (a doc's tokens live in one input row),
    independent of document length. (A zero-shuffle variant — 16
    higher-order ``filter`` lambdas over the token-hash array — loses
    ~4× at any scale: Spark evaluates array lambdas interpreted, outside
    whole-stage codegen.)
    """
    par = docs.sparkSession.sparkContext.defaultParallelism
    h = (
        docs.select(
            F.col(id_col), F.array_distinct(F.split(F.col(text_col), " ")).alias("toks")
        )
        .repartition(par)
        .select(F.col(id_col), F.explode("toks").alias("tok"))
        .select(F.col(id_col), h32(F.col("tok")).alias("h"))
    )
    sums = [
        F.sum(
            F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s_{b}")
        for b in range(16)
    ]
    s = h.groupBy(id_col).agg(*sums)
    sim = None
    for b in range(16):
        bit = F.when(F.col(f"s_{b}") >= 0, F.lit(2**b)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return s.select(F.col(id_col), sim.cast("bigint").alias("simhash"))


def winnowing_fingerprints(
    docs: DataFrame,
    shingle_n: int = 3,
    window: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing (MOSS-style) document fingerprints: the distinct set of
    windowed-minimum shingle hashes — every window of ``window``
    consecutive shingles contributes its minimum hash, guaranteeing any
    shared run of ≥ window+shingle_n−1 tokens between two documents
    shares a fingerprint, at a fraction of the full shingle set's size.

    All codegen: zip-slice shingles → posexplode → md5 hash (h32 — the
    VALUES are the output, so the engine-portable hash, not xxhash64) →
    one per-doc ROWS window MIN → distinct. The window partitions by
    document, so there is no global sort; the shuffle carries (doc,
    pos, 8-byte hash) rows once.
    """
    par = docs.sparkSession.sparkContext.defaultParallelism
    from pyspark.sql import Window as W

    sh = (
        docs.select(F.col(id_col), F.split(F.col(text_col), " ").alias("toks"))
        .repartition(par)
        .select(F.col(id_col), F.posexplode(shingle_structs("toks", shingle_n)).alias("pos", "s"))
        .select(F.col(id_col), F.col("pos"), h32(_shingle_text(shingle_n)).alias("h"))
    )
    w_min = W.partitionBy(id_col).orderBy("pos").rowsBetween(0, window - 1)
    w_all = W.partitionBy(id_col)
    return (
        sh.select(
            F.col(id_col),
            F.col("pos"),
            F.min("h").over(w_min).alias("fp"),
            F.count(F.lit(1)).over(w_all).alias("n_sh"),
        )
        .where(F.col("pos") <= F.col("n_sh") - window)
        .select(F.col(id_col), F.col("fp"))
        .distinct()
    )


def _banded(signatures: DataFrame, bands: int, rows_per_band: int, id_col: str) -> DataFrame:
    """(id, band_idx, band_key) rows — one per signature band."""
    band_cols = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.concat_ws(
                "_", *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
            ).alias("band_key"),
        )
        for b in range(bands)
    ]
    return (
        signatures.select(F.col(id_col), F.explode(F.array(*band_cols)).alias("band"))
        .select(id_col, "band.band_idx", "band.band_key")
        .where(F.col("band_key") != "")
    )


def lsh_candidates_between(
    new_sigs: DataFrame,
    corpus_sigs: DataFrame,
    bands: int = 4,
    rows_per_band: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental dedup: candidate pairs BETWEEN an arriving batch and
    the existing corpus — the production ingest pattern (dedup the delta
    against what's stored; never re-pair the corpus against itself).

    The new batch is tiny relative to the corpus, so its banded rows
    BROADCAST; the corpus side streams through the join with no shuffle
    and no self-pairing. At 100 TB the corpus band table is a stored,
    bucketed-by-band_key artifact written at ingest time — this join
    then prunes to the buckets the batch actually touches.
    Output: (new_id, corpus_id) distinct."""
    nb = _banded(new_sigs, bands, rows_per_band, id_col).withColumnsRenamed(
        {id_col: "new_id"}
    )
    cb = _banded(corpus_sigs, bands, rows_per_band, id_col).withColumnsRenamed(
        {id_col: "corpus_id"}
    )
    return (
        cb.join(F.broadcast(nb), ["band_idx", "band_key"])
        .select("new_id", "corpus_id")
        .distinct()
    )


def shingle_containment_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    shingle_n: int = 3,
    max_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Asymmetric CONTAINMENT near-dup pairs: containment = |A∩B| /
    min(|A|,|B|) — the quote-inclusion detector. Jaccard misses a short
    document fully embedded in a long one (union dominated by the long
    side); containment flags it at 1.0. Output is oriented:
    (contained_id, container_id) with the smaller shingle set first
    (ties by id).

    Same single-lineage posting-list formulation as
    ``ngram_jaccard_pairs`` (sizes ride through the inverted index as
    struct posting entries; one scan, two shuffles, zero joins;
    ``max_df`` caps stop-shingle blowup at scale).
    """
    par = docs.sparkSession.sparkContext.defaultParallelism
    postings = (
        docs.select(F.col(id_col), F.split(F.col(text_col), " ").alias("toks"))
        .repartition(par)
        .select(
            F.col(id_col),
            F.array_distinct(shingle_structs("toks", shingle_n)).alias("sh"),
        )
        .select(
            F.struct(F.col(id_col).alias("id"), F.size("sh").alias("n")).alias(
                "doc"
            ),
            F.explode("sh").alias("s"),
        )
        .select(
            "doc",
            F.xxhash64(*[F.col(f"s.{i}") for i in range(shingle_n)]).alias(
                "shingle"
            ),
        )
        .groupBy("shingle")
        .agg(F.sort_array(F.collect_list("doc")).alias("ids"))
    )
    keep = F.size("ids") >= 2
    if max_df is not None:
        keep = keep & (F.size("ids") <= max_df)
    pairs = (
        postings.where(keep)
        .select(F.explode(_pairs_from_sorted_ids("ids")).alias("p"))
        .groupBy(
            F.col("p.doc_id_a.id").alias("doc_id_a"),
            F.col("p.doc_id_a.n").alias("n_a"),
            F.col("p.doc_id_b.id").alias("doc_id_b"),
            F.col("p.doc_id_b.n").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    cont = F.col("n_inter") / F.least("n_a", "n_b")
    a_contained = (F.col("n_a") < F.col("n_b")) | (
        (F.col("n_a") == F.col("n_b")) & (F.col("doc_id_a") < F.col("doc_id_b"))
    )
    return (
        pairs.where(cont >= threshold)
        .select(
            F.when(a_contained, F.col("doc_id_a"))
            .otherwise(F.col("doc_id_b"))
            .alias("contained_id"),
            F.when(a_contained, F.col("doc_id_b"))
            .otherwise(F.col("doc_id_a"))
            .alias("container_id"),
            F.round(cont, 6).alias("containment"),
        )
    )


def simhash_nbit(
    docs: DataFrame,
    nbits: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Generalized n-bit SimHash (same construction as ``simhash16``,
    parameterized width). Wider fingerprints discriminate better —
    16 bits saturate on small vocabularies (every doc within a few
    bits of every other); 32/64 bits keep hamming distances spread."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    h = (
        docs.select(
            F.col(id_col),
            F.array_distinct(F.split(F.col(text_col), " ")).alias("toks"),
        )
        .repartition(par)
        .select(F.col(id_col), F.explode("toks").alias("tok"))
        .select(F.col(id_col), h32(F.col("tok")).alias("h"))
    )
    sums = [
        F.sum(
            F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s_{b}")
        for b in range(nbits)
    ]
    s = h.groupBy(id_col).agg(*sums)
    sim = None
    for b in range(nbits):
        bit = F.when(F.col(f"s_{b}") >= 0, F.lit(2**b)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return s.select(F.col(id_col), sim.cast("bigint").alias("simhash"))


def simhash_hamming_candidates(
    docs: DataFrame,
    max_hamming: int = 3,
    nbits: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash near-dup candidates within a hamming radius, via
    PIGEONHOLE banding: split the ``nbits``-bit fingerprint into
    ``max_hamming + 1`` chunks — a pair within the radius must agree on
    at least one whole chunk, so an equijoin on (chunk_idx,
    chunk_value) finds every such pair while touching only
    chunk-collisions (the multi-index trick from Manku et al.,
    WWW'07 — O(collisions), never O(n²)). Candidates are verified
    exactly with bit_count(xor) ≤ max_hamming. Width matters: 16-bit
    sketches saturate on small vocabularies (dense collisions); 32+
    bits keep the candidate set sparse at the same radius.
    """
    n_chunks = max_hamming + 1
    bits = nbits // n_chunks
    mask = (1 << bits) - 1
    # materialize the fingerprints BEFORE the pigeonhole self-join:
    # both sides (`a`, `b`) derive from this lineage — a full scan →
    # token explode → 32 SUM aggregates — and without a barrier Spark
    # executes that pipeline once per side (measured 3.9s → ~1.9s at
    # sf0.1). One bigint per doc is tiny; at 100 TB checkpoint to
    # storage instead, but the principle is the same (same lesson as
    # components.py edge materialization pre-mirror).
    # Then REPARTITION the checkpointed rows: AQE coalesces the tiny
    # fingerprint shuffle to one partition, which would serialize the
    # whole pigeonhole join + hamming verify (the expensive part —
    # collision pairs, not fingerprints) through a single task.
    par = docs.sparkSession.sparkContext.defaultParallelism
    sim = (
        simhash_nbit(docs, nbits=nbits, id_col=id_col, text_col=text_col)
        .localCheckpoint(eager=True)
        .repartition(par)
    )
    chunks = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("chunk"),
                    F.shiftright("simhash", bits * c)
                    .bitwiseAND(F.lit(mask))
                    .alias("ck"),
                )
                for c in range(n_chunks)
            ]
        )
    )
    banded = sim.select(F.col(id_col), "simhash", chunks.alias("b")).select(
        F.col(id_col), "simhash", "b.chunk", "b.ck"
    )
    a = banded.select(
        F.col(id_col).alias("doc_id_a"),
        F.col("simhash").alias("sim_a"),
        "chunk",
        "ck",
    )
    b = banded.select(
        F.col(id_col).alias("doc_id_b"),
        F.col("simhash").alias("sim_b"),
        "chunk",
        "ck",
    )
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    # first-match-only dedup: a pair within the radius can agree on
    # SEVERAL chunks and would be emitted once per agreeing chunk; the
    # old plan removed the dupes with .distinct() — a full shuffle of
    # the candidate set (1.5M rows / 2.7s at sf0.1; at 100 TB the
    # dominant shuffle of the operator). Instead emit the pair only at
    # the SMALLEST agreeing chunk index: both fingerprints ride along
    # in the joined row, so "no earlier chunk agrees" is a pure
    # codegen predicate — same pair set, zero extra shuffle
    # (measured 2.7s -> 1.2s at sf0.1, identical 1,501,875 pairs).
    def _chunk_of(col, j):
        return F.shiftright(col, bits * j).bitwiseAND(F.lit(mask))

    first_match = F.lit(True)
    for j in range(n_chunks - 1):
        first_match = first_match & (
            (F.col("chunk") <= j)
            | (_chunk_of(F.col("sim_a"), j) != _chunk_of(F.col("sim_b"), j))
        )
    return (
        a.join(b, ["chunk", "ck"])
        .where(F.col("doc_id_a") < F.col("doc_id_b"))
        .where(ham <= max_hamming)
        .where(first_match)
        .select(
            "doc_id_a", "doc_id_b", ham.cast("long").alias("hamming")
        )
    )
