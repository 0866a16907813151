"""Diversified reranking: Maximal Marginal Relevance over a bounded
retrieval shortlist (Carbonell & Goldstein 1998).

Every serving stack diversifies AFTER a distributed retrieval stage
has reduced the corpus to a shortlist of tens of rows — MMR's greedy
argmax is inherently sequential in k, so running it on the shortlist
(driver-side numpy, bounded at `shortlist_n` rows) is the correct
placement, mirroring the registry's two-stage retrieve→rerank query.
The distributed work — scoring 100 TB of vectors down to the shortlist
— is `cosine_topk_df`, which never collects more than the shortlist.

No counterpart in /root/reference (its vector store returns plain
top-k; /root/reference/backend/main.py:185-230)."""

from __future__ import annotations

from vector_knowledge_base_spark.sources.localframe import local_df as _local_df

import numpy as np
from pyspark.sql import DataFrame, SparkSession


def mmr_rerank(
    spark: SparkSession,
    shortlist: DataFrame,
    k: int = 10,
    lam: float = 0.5,
) -> DataFrame:
    """Greedy MMR over a (vec_id, score, embedding) shortlist frame.

    score = relevance (cosine to the query, higher better); embeddings
    are assumed unit-norm so document-document similarity is a dot
    product. Returns (rank, vec_id, relevance, mmr_score).
    """
    rows = shortlist.select("vec_id", "score", "embedding").collect()
    ids = [r["vec_id"] for r in rows]
    rel = np.array([r["score"] for r in rows], dtype=np.float64)
    emb = np.array([r["embedding"] for r in rows], dtype=np.float64)
    sim = emb @ emb.T  # shortlist x shortlist, bounded
    selected: list[int] = []
    remaining = set(range(len(ids)))
    out = []
    for rank in range(min(k, len(ids))):
        if not selected:
            best = int(np.argmax(rel))
            best_score = float(rel[best])
        else:
            best, best_score = -1, -np.inf
            for i in sorted(remaining):
                max_sim = max(float(sim[i, j]) for j in selected)
                score = lam * float(rel[i]) - (1 - lam) * max_sim
                # deterministic tie-break on vec_id via sorted iteration
                if score > best_score:
                    best, best_score = i, score
        selected.append(best)
        remaining.discard(best)
        out.append((rank + 1, ids[best], float(rel[best]), best_score))
    return _local_df(spark, 
        out, "rank int, vec_id long, relevance double, mmr_score double"
    )
