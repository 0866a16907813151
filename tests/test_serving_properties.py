"""Property tests (hypothesis) for the serving kernel's pure-numpy
contracts — the randomized twin of test_serving.py's fixture parity
pins. No Spark session needed: snapshots are constructed directly, so
thousands of adversarial corpora run in seconds. Pinned properties:
``_topk`` equals a naive full sort under ANY scores/ids (including
heavy ties and boundary ties at the cutoff — the np.partition
shortcut's risk surface), and the vectorized ``query_batch`` equals
the single-query loop for any corpus, cell layout, batch, and probe
width (the one-matmul union path's risk surface)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from vector_knowledge_base_spark.operators.serving import (
    KnnServer,
    _Snapshot,
    _topk,
)

# few distinct score values -> dense ties; the interesting regime
_SCORE = st.sampled_from([-0.5, -0.25, 0.0, 0.25, 0.25, 0.5, 1.0])


def _naive_topk(ids, scores, k):
    order = sorted(range(len(ids)), key=lambda i: (-scores[i], ids[i]))[:k]
    return [(int(ids[i]), float(scores[i])) for i in order]


@settings(max_examples=200, deadline=None, derandomize=True)
@given(
    scores=st.lists(_SCORE, min_size=0, max_size=60),
    k=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_topk_equals_naive_sort_under_ties(scores, k, seed):
    rng = np.random.RandomState(seed)
    ids = rng.permutation(len(scores)).astype(np.int64)
    s = np.asarray(scores, dtype=np.float64)
    assert _topk(ids, s, k) == _naive_topk(ids, s, k)


def _mk_server(rng, n, k_cells, dim):
    """A KnnServer around a hand-built snapshot: random unit-ish rows
    grouped into arbitrary cells (parity between query paths must not
    depend on rows actually being nearest their cell)."""
    srv = object.__new__(KnnServer)
    mat = rng.randn(n, dim)
    cuts = np.sort(rng.randint(0, n + 1, size=k_cells - 1)) if k_cells > 1 else np.array([], dtype=int)
    offsets = [0, *cuts.tolist(), n]
    srv._snap = _Snapshot(
        centroids=rng.randn(k_cells, dim),
        ids=rng.permutation(n).astype(np.int64),
        mat=mat,
        offsets=offsets,
        version=None,
    )
    return srv


@settings(max_examples=80, deadline=None, derandomize=True)
@given(
    n=st.integers(min_value=0, max_value=48),
    k_cells=st.integers(min_value=1, max_value=6),
    nq=st.integers(min_value=0, max_value=7),
    n_probe=st.one_of(st.none(), st.integers(min_value=1, max_value=8)),
    k=st.integers(min_value=1, max_value=10),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_query_batch_equals_loop_on_random_corpora(
    n, k_cells, nq, n_probe, k, seed
):
    rng = np.random.RandomState(seed)
    dim = 4
    srv = _mk_server(rng, n, k_cells, dim)
    queries = [rng.randn(dim).tolist() for _ in range(nq)]
    batch = srv.query_batch(queries, k=k, n_probe=n_probe)
    loop = [srv.query(q, k=k, n_probe=n_probe) for q in queries]
    assert batch == loop


@settings(max_examples=80, deadline=None, derandomize=True)
@given(
    n=st.integers(min_value=1, max_value=48),
    keep_mod=st.integers(min_value=1, max_value=5),
    k=st.integers(min_value=1, max_value=10),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_allowed_ids_equals_post_filtered_full_ranking(n, keep_mod, k, seed):
    """Pre-filtering with allowed_ids at full probe must equal
    filtering the FULL ranking afterwards — i.e. it is exact filtered
    kNN, not an approximation."""
    rng = np.random.RandomState(seed)
    srv = _mk_server(rng, n, 3, 4)
    q = rng.randn(4).tolist()
    allowed = [int(i) for i in srv.ids.tolist() if i % keep_mod == 0]
    got = srv.query(q, k=k, n_probe=None, allowed_ids=allowed)
    full = srv.query(q, k=n, n_probe=None)  # the entire ranking
    want = [(i, s) for i, s in full if i % keep_mod == 0][:k]
    assert got == want


def _mk_ivfpq_server(rng, n, k_cells, m, ksub, dsub):
    """An IvfPqKnnServer around a hand-built snapshot: random
    codebooks, random codes grouped into arbitrary cells — the batch
    union path and the filter path must agree with the single-query
    loop regardless of whether codes are 'real' encodings."""
    from vector_knowledge_base_spark.operators.serving import (
        IvfPqKnnServer,
        _IvfPqSnapshot,
    )

    srv = object.__new__(IvfPqKnnServer)
    cuts = (
        np.sort(rng.randint(0, n + 1, size=k_cells - 1))
        if k_cells > 1
        else np.array([], dtype=int)
    )
    offsets = [0, *cuts.tolist(), n]
    srv._snap = _IvfPqSnapshot(
        centroids=rng.randn(k_cells, m * dsub),
        codebooks=rng.randn(m, ksub, dsub),
        ids=rng.permutation(n).astype(np.int64),
        codes=rng.randint(0, ksub, size=(n, m)).astype(np.uint8),
        offsets=offsets,
        version=None,
    )
    return srv


@settings(max_examples=80, deadline=None, derandomize=True)
@given(
    n=st.integers(min_value=0, max_value=48),
    k_cells=st.integers(min_value=1, max_value=6),
    nq=st.integers(min_value=0, max_value=7),
    n_probe=st.one_of(st.none(), st.integers(min_value=1, max_value=8)),
    k=st.integers(min_value=1, max_value=10),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_ivfpq_query_batch_equals_loop_on_random_snapshots(
    n, k_cells, nq, n_probe, k, seed
):
    rng = np.random.RandomState(seed)
    m, ksub, dsub = 2, 4, 2
    srv = _mk_ivfpq_server(rng, n, k_cells, m, ksub, dsub)
    queries = [rng.randn(m * dsub).tolist() for _ in range(nq)]
    batch = srv.query_batch(queries, k=k, n_probe=n_probe)
    loop = [srv.query(q, k=k, n_probe=n_probe) for q in queries]
    assert batch == loop


@settings(max_examples=80, deadline=None, derandomize=True)
@given(
    n=st.integers(min_value=1, max_value=48),
    keep_mod=st.integers(min_value=1, max_value=5),
    k=st.integers(min_value=1, max_value=10),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_ivfpq_allowed_ids_equals_post_filtered_full_ranking(
    n, keep_mod, k, seed
):
    rng = np.random.RandomState(seed)
    srv = _mk_ivfpq_server(rng, n, 3, 2, 4, 2)
    q = rng.randn(4).tolist()
    allowed = [int(i) for i in srv.ids.tolist() if i % keep_mod == 0]
    got = srv.query(q, k=k, n_probe=None, allowed_ids=allowed)
    full = srv.query(q, k=n, n_probe=None)
    want = [(i, s) for i, s in full if i % keep_mod == 0][:k]
    assert got == want
