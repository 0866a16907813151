"""MMR diversified rerank (operators/rerank.py) — rows-only query, so
its correctness evidence lives here: exactness of the first pick,
strict diversity improvement over plain top-k, and determinism."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_DIR_CORRECTNESS
from vector_knowledge_base_spark import queries as q


@pytest.fixture(scope="module")
def mmr_rows(spark):
    df = q.QUERIES["mmr_diversified_topk"](spark, SF_DIR_CORRECTNESS)
    return df.orderBy("rank").collect()


def _embedding_map(spark, ids):
    from vector_knowledge_base_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR_CORRECTNESS, "embeddings")
    rows = emb.filter(emb.vec_id.isin(list(ids))).collect()
    return {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}


def test_mmr_shape_and_determinism(spark, mmr_rows):
    assert len(mmr_rows) == 10
    ids = [r["vec_id"] for r in mmr_rows]
    assert len(set(ids)) == 10
    again = (
        q.QUERIES["mmr_diversified_topk"](spark, SF_DIR_CORRECTNESS)
        .orderBy("rank")
        .collect()
    )
    assert [r["vec_id"] for r in again] == ids


def test_mmr_first_pick_is_exact_top1(spark, mmr_rows):
    top1 = (
        q.QUERIES["knn_topk_cosine"](spark, SF_DIR_CORRECTNESS)
        .filter("vec_id != 0")  # MMR's shortlist excludes the query itself
        .orderBy("score", ascending=False)
        .first()
    )
    assert mmr_rows[0]["vec_id"] == top1["vec_id"]


def test_mmr_improves_diversity(spark, mmr_rows):
    """Mean pairwise similarity of the MMR set must not exceed the
    plain top-10's — diversification is the operator's whole point."""
    mmr_ids = [r["vec_id"] for r in mmr_rows]
    topk_ids = [
        r["vec_id"]
        for r in q.QUERIES["knn_topk_cosine"](spark, SF_DIR_CORRECTNESS).collect()
    ]
    embs = _embedding_map(spark, set(mmr_ids) | set(topk_ids))

    def mean_pairwise(ids):
        sims = [
            float(embs[a] @ embs[b])
            for i, a in enumerate(ids)
            for b in ids[i + 1 :]
        ]
        return sum(sims) / len(sims)

    assert mean_pairwise(mmr_ids) <= mean_pairwise(topk_ids)
