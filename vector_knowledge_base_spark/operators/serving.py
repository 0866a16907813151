"""In-process kNN SERVING tier over a Spark-built IVF artifact.

The reference serves single queries from an in-process HNSW index
(<50 ms @10k vectors — BASELINE.md Table 7; reference README "sub-50ms"
claim). A Spark plan cannot match that REGIME — not because the math is
slow, but because every query pays fixed JVM job dispatch (~100-150 ms
on this container; the carried perf-weak since round 4). The honest
production architecture is the one every Spark shop uses: **Spark
builds and maintains the index offline; a serving layer holds the
bounded artifact in memory and answers point queries in-process** —
the exact split the reference itself embodies (Qdrant is the serving
tier; its ingest pipeline is the offline tier).

``KnnServer`` is that serving layer: it loads an IVF-assigned corpus
(built by ``operators/ann.build_ivf`` — KMeans centroids + cell-tagged
vectors) ONCE into contiguous numpy arrays grouped by cell, then
answers queries with two small matmuls (query→centroids, query→probed
cells). Results reproduce ``operators/knn.cosine_topk`` semantics
bit-for-bit at full probe coverage: same score rounding, same
(-score, vec_id) tie-break — pinned by tests.

Freshness: built from a txlog table, the server records the TABLE
VERSION it loaded; ``refresh_if_stale`` reloads when the log advanced
(the matview idea applied to an index artifact). Serving is always a
consistent snapshot, never a torn read — the swap is one attribute
assignment.

100 TB shape, stated plainly: the in-memory tier holds a BOUNDED
SHARD, not the table. float32 vectors cost 4·dim bytes/vector (64-dim
→ 256 MB per million); beyond RAM you move to PQ codes (~16 B/vector,
see ``operators/ann.build_pq`` — 1B vectors ≈ 16 GB/shard) and/or
shard the corpus across servers, fan the query out, and merge top-k —
the standard ANN serving topology. ``max_vectors`` enforces the bound
LOUDLY instead of letting a 100 TB collect() take the driver down;
Spark remains the system of record and the index builder, exactly as
it is for the batch paths (``ivf_topk``, ``pq_topk``), which stay the
right tool for high-throughput BATCH scoring.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

ROUND_DIGITS = 6  # match operators/knn.py cosine_topk


def _topk(ids, scores, k: int) -> list[tuple[int, float]]:
    """Shared (-score, id) lexicographic top-k over rounded scores,
    without a full sort: cutoff via partition, keep every boundary tie
    (ties resolve by ascending id, so none may be dropped early)."""
    import numpy as np

    if scores.shape[0] == 0:
        return []
    kk = min(k, scores.shape[0])
    cutoff = np.partition(scores, scores.shape[0] - kk)[scores.shape[0] - kk]
    cand = np.flatnonzero(scores >= cutoff)
    order = sorted(cand, key=lambda i: (-scores[i], ids[i]))[:kk]
    return [(int(ids[i]), float(scores[i])) for i in order]


class KnnServer:
    """Point-query kNN over an in-memory IVF artifact.

    Build from an assigned corpus (``KnnServer(centroids, assigned)``)
    or straight from a txlog table (``KnnServer.from_txlog``). Query
    with ``query(vec, k, n_probe)`` → ``[(vec_id, score), ...]``;
    ``n_probe=None`` probes every cell = EXACT search (equals
    ``cosine_topk`` output, including rounding and tie-breaks).
    """

    def __init__(
        self,
        centroids,
        assigned: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        max_vectors: int = 5_000_000,
        _table_version: int | None = None,
        _table_path: str | None = None,
    ):
        import numpy as np

        n = assigned.count()
        if n > max_vectors:
            raise RuntimeError(
                f"KnnServer: corpus has {n} vectors > max_vectors="
                f"{max_vectors}. The in-memory serving tier holds a "
                "BOUNDED shard: raise the bound only with the RAM to "
                "back it (4*dim bytes/vector), or serve PQ codes / "
                "shard the corpus and merge top-k across servers."
            )
        rows = assigned.select(id_col, vec_col, "ivf_cell").collect()
        self.centroids = np.asarray(centroids, dtype=np.float64)
        k_cells = self.centroids.shape[0]
        by_cell: list[list] = [[] for _ in range(k_cells)]
        for r in rows:
            by_cell[r["ivf_cell"]].append((r[id_col], r[vec_col]))
        ids, mats, offsets, off = [], [], [0], 0
        for cell_rows in by_cell:
            for i, v in cell_rows:
                ids.append(i)
                mats.append(v)
            off += len(cell_rows)
            offsets.append(off)
        self.ids = np.asarray(ids, dtype=np.int64)
        self.mat = (
            np.asarray(mats, dtype=np.float64)
            if mats
            else np.zeros((0, self.centroids.shape[1]))
        )
        self.offsets = offsets
        self.table_version = _table_version
        self.table_path = _table_path

    # -- construction ------------------------------------------------------

    @classmethod
    def from_txlog(
        cls,
        spark: SparkSession,
        table_path: str,
        n_partitions: int = 32,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        max_vectors: int = 5_000_000,
    ) -> "KnnServer":
        """Build the serving artifact from the CURRENT version of a
        txlog table; the loaded version is recorded for
        ``refresh_if_stale``."""
        from vector_knowledge_base_spark.operators.ann import build_ivf
        from vector_knowledge_base_spark.sources.txlog import (
            _list_versions,
            read_table,
        )

        v = _list_versions(table_path)[-1]
        emb = read_table(spark, table_path, v)
        centroids, assigned = build_ivf(
            emb, n_partitions=n_partitions, id_col=id_col, vec_col=vec_col
        )
        srv = cls(
            centroids,
            assigned,
            id_col=id_col,
            vec_col=vec_col,
            max_vectors=max_vectors,
            _table_version=v,
            _table_path=table_path,
        )
        assigned.unpersist()
        return srv

    def refresh_if_stale(self, spark: SparkSession) -> bool:
        """Reload when the backing txlog table advanced past the loaded
        version. Returns True if a reload happened. The rebuilt arrays
        swap in atomically (attribute assignment), so concurrent
        queries see the old or the new snapshot, never a mix."""
        from vector_knowledge_base_spark.sources.txlog import _list_versions

        if self.table_path is None:
            raise RuntimeError(
                "KnnServer: not built from a txlog table — nothing to "
                "track (use from_txlog)"
            )
        latest = _list_versions(self.table_path)[-1]
        loaded = self.table_version if self.table_version is not None else -1
        if latest <= loaded:  # version 0 is a real version (not falsy)
            return False
        fresh = KnnServer.from_txlog(
            spark,
            self.table_path,
            n_partitions=self.centroids.shape[0],
        )
        self.__dict__.update(fresh.__dict__)
        return True

    # -- serving -----------------------------------------------------------

    def query(
        self,
        query_vector: Sequence[float],
        k: int = 10,
        n_probe: int | None = 4,
    ) -> list[tuple[int, float]]:
        """Top-k by cosine score (unit-norm corpus contract, same as
        cosine_topk's assume_normalized): probe the ``n_probe`` nearest
        cells (None/≥cells = exact), one matmul over their contiguous
        rows, scores rounded to 6 digits, ties broken by ascending id."""
        import numpy as np

        q = np.asarray(list(query_vector), dtype=np.float64)
        k_cells = self.centroids.shape[0]
        if n_probe is None or n_probe >= k_cells:
            rows = self.mat
            ids = self.ids
        else:
            d = ((self.centroids - q) ** 2).sum(axis=1)
            probe = np.argsort(d)[:n_probe]
            slices = [
                (self.offsets[c], self.offsets[c + 1]) for c in sorted(probe)
            ]
            rows = np.concatenate([self.mat[a:b] for a, b in slices]) if slices else self.mat[:0]
            ids = np.concatenate([self.ids[a:b] for a, b in slices]) if slices else self.ids[:0]
        if rows.shape[0] == 0:
            return []
        scores = np.round(rows @ q, ROUND_DIGITS)
        return _topk(ids, scores, k)

    def query_batch(
        self,
        query_vectors: Sequence[Sequence[float]],
        k: int = 10,
        n_probe: int | None = 4,
    ) -> list[list[tuple[int, float]]]:
        """Vectorized multi-query serving (one matmul per query's probe
        set). For LARGE batches use the Spark batch paths instead —
        that regime is theirs."""
        return [self.query(q, k=k, n_probe=n_probe) for q in query_vectors]


class PqKnnServer:
    """Point-query ADC serving over PQ CODES — the memory-bound shard
    tier the float server's ``max_vectors`` error points at: ``m``
    bytes per vector (32× smaller than 64-dim float32 here), so one
    server holds ~10⁹ vectors of codes where the float tier holds
    ~10⁷. Scoring reproduces ``operators/ann.pq_topk`` exactly (same
    asymmetric-distance lookup tables, same rounding and tie-break,
    pinned by tests): per query, one (m × ksub) inner-product table,
    then m table-lookups + adds per vector — no vector math in the hot
    loop, all vectorized numpy fancy-indexing.

    Same build/serve split as ``KnnServer``: Spark trains the
    codebooks and encodes the corpus distributed
    (``operators/ann.build_pq``); this tier only collects the CODES.
    Recall is PQ's: serve a shortlist (k ≫ final k) and let a rerank
    stage (the float tier over the shortlist, or the Spark exact path)
    finish — the standard two-stage ANN serving topology."""

    def __init__(
        self,
        codebooks,
        codes: DataFrame,
        id_col: str = "vec_id",
        max_vectors: int = 200_000_000,
    ):
        import numpy as np

        n = codes.count()
        if n > max_vectors:
            raise RuntimeError(
                f"PqKnnServer: corpus has {n} vectors > max_vectors="
                f"{max_vectors}; shard the corpus and merge top-k "
                "across servers"
            )
        self.codebooks = np.asarray(codebooks, dtype=np.float64)
        m, ksub, _dsub = self.codebooks.shape
        rows = codes.select(id_col, "codes").collect()
        self.ids = np.asarray([r[id_col] for r in rows], dtype=np.int64)
        dtype = np.uint8 if ksub <= 256 else np.int32
        self.codes = (
            np.asarray([r["codes"] for r in rows], dtype=dtype)
            if rows
            else np.zeros((0, m), dtype=dtype)
        )

    def query(
        self, query_vector: Sequence[float], k: int = 10
    ) -> list[tuple[int, float]]:
        import numpy as np

        q = np.asarray(list(query_vector), dtype=np.float64)
        m, ksub, dsub = self.codebooks.shape
        # lut[j, c] = dot(q_j, codebook[j][c]) — the ADC table pq_topk
        # broadcasts as a literal; here it stays a local ndarray
        lut = (self.codebooks * q.reshape(m, 1, dsub)).sum(axis=2)
        scores = np.zeros(self.codes.shape[0], dtype=np.float64)
        for j in range(m):
            scores += lut[j][self.codes[:, j]]
        return _topk(self.ids, np.round(scores, ROUND_DIGITS), k)


class ShardedKnnServer:
    """Fan-out front over N shard servers — the last mile of the
    100 TB serving topology the single-shard docstrings point at: the
    corpus is split across shards (each a bounded ``KnnServer``), a
    query fans out to every shard and the per-shard top-k lists merge
    under the SAME (-score, id) contract, so the sharded answer is
    IDENTICAL to one giant server's (pinned by tests — merging top-k
    of disjoint shards is exact, not approximate, because every
    corpus row lives in exactly one shard and per-shard top-k keeps
    any row that could reach the global top-k).

    Build with ``ShardedKnnServer.from_dataframe(centroids, assigned,
    n_shards)`` — shards split by a stable hash of the id so growth
    rebalances deterministically — or pass pre-built shard servers
    (the production shape: one per host). ``query`` fans out
    serially here (shards share this process); a real deployment
    parallelizes the fan-out over RPC — the merge contract is the
    part that must be exact, and is."""

    def __init__(self, shards: list):
        if not shards:
            raise ValueError("ShardedKnnServer: need at least one shard")
        self.shards = list(shards)

    @classmethod
    def from_dataframe(
        cls,
        centroids,
        assigned: DataFrame,
        n_shards: int = 2,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        max_vectors_per_shard: int = 5_000_000,
    ) -> "ShardedKnnServer":
        from pyspark.sql import functions as F

        shards = []
        sharded = assigned.withColumn(
            "_shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
        )
        for s in range(n_shards):
            shards.append(
                KnnServer(
                    centroids,
                    sharded.where(F.col("_shard") == s).drop("_shard"),
                    id_col=id_col,
                    vec_col=vec_col,
                    max_vectors=max_vectors_per_shard,
                )
            )
        return cls(shards)

    def query(
        self,
        query_vector: Sequence[float],
        k: int = 10,
        n_probe: int | None = 4,
    ) -> list[tuple[int, float]]:
        """Fan out, merge: per-shard top-k under the shared contract,
        then one global (-score, id) sort of ≤ n_shards·k rows."""
        merged: list[tuple[int, float]] = []
        for shard in self.shards:
            merged.extend(shard.query(query_vector, k=k, n_probe=n_probe))
        merged.sort(key=lambda t: (-t[1], t[0]))
        return merged[:k]
