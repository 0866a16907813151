"""Out-of-process shard spin-off (r14, VERDICT r13 next-round #5 —
the payoff of the r13 payload-locality split).

The sharded serving topology's docstrings have always pointed at the
production shape: one shard per host, Spark as the offline builder.
This module makes that move MECHANICAL: ``export_shard_standalone``
serializes everything one shard needs to answer queries — its vector
half (the ``KnnServer`` snapshot arrays), its keyword half (the
``_HybridSnapshot`` postings), and the facade's per-shard payload
frame (``payload_by_shard[s]``, already keyed by the SAME
``pmod(xxhash64(id), n)`` routing hash the halves were built with) —
as plain numpy/parquet/json files, and ``load_shard_standalone``
reconstructs a fully-functional ``HybridKnnServer`` in a FRESH
process with NO SparkSession, no JVM, and no txlog directory: just
numpy + pyarrow. Answers from the spun-off shard are byte-equal to
the in-process shard's (pinned by a subprocess round-trip test).

Why this is the 100 TB deployment story: Spark builds and refreshes
the shard artifacts as a batch job (bounded per shard by
``serve_max_rows``); each serving host loads ONE shard directory and
answers point/batch queries in-process; the fan-out front merges
per-shard top-k/top-n under the exact contracts the in-process
``ShardedKnnServer``/``ShardedHybridServer`` pin. The export is one
dict entry + three files per shard — no re-partitioning, no
re-hashing, no Spark on the serving host.

File layout of an exported shard directory::

    meta.json      — version, ids dtype, avgdl, n_docs, counts
    vector.npz     — ids, mat, centroids, offsets
    keyword.npz    — doc_ids, dl, terms, term_offsets,
                     post_rows, post_counts
    payload.parquet (optional) — the shard's payload rows

Versions are carried verbatim so a spun-off shard still refuses to
join a mixed-version fan-out (the ``ShardedHybridServer`` constructor
check works unchanged on loaded shards).
"""

from __future__ import annotations

import json
import os


def export_shard_standalone(shard, path: str, payload=None) -> str:
    """Serialize one ``HybridKnnServer`` shard (vector + keyword
    halves) and optionally its payload frame to ``path``. Pure
    driver-side numpy/parquet writes — no Spark job. Returns
    ``path``."""
    import numpy as np

    os.makedirs(path, exist_ok=True)
    vsnap = shard.knn._snap
    ksnap = shard._snap
    np.savez(
        os.path.join(path, "vector.npz"),
        ids=vsnap.ids,
        mat=vsnap.mat,
        centroids=vsnap.centroids,
        offsets=np.asarray(vsnap.offsets, dtype=np.int64),
    )
    terms = sorted(ksnap.postings)
    term_offsets = [0]
    rows_parts, count_parts = [], []
    for t in terms:
        ri, c = ksnap.postings[t]
        rows_parts.append(np.asarray(ri, dtype=np.int64))
        count_parts.append(np.asarray(c, dtype=np.float64))
        term_offsets.append(term_offsets[-1] + len(ri))
    np.savez(
        os.path.join(path, "keyword.npz"),
        doc_ids=ksnap.doc_ids,
        dl=ksnap.dl,
        terms=np.asarray(terms, dtype=np.str_),  # unicode, pickle-free
        term_offsets=np.asarray(term_offsets, dtype=np.int64),
        post_rows=(
            np.concatenate(rows_parts)
            if rows_parts
            else np.zeros(0, dtype=np.int64)
        ),
        post_counts=(
            np.concatenate(count_parts)
            if count_parts
            else np.zeros(0, dtype=np.float64)
        ),
    )
    meta = {
        "version": shard.table_version,
        "table_path": shard.table_path,
        "avgdl": ksnap.avgdl,
        "n_docs": ksnap.n_docs,
        "id_col": shard.id_col,
        "text_col": shard.text_col,
        "max_docs": shard.max_docs,
        "knn_id_col": shard.knn.id_col,
        "knn_vec_col": shard.knn.vec_col,
        "knn_max_vectors": shard.knn.max_vectors,
        "has_payload": payload is not None,
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    if payload is not None:
        payload.to_parquet(os.path.join(path, "payload.parquet"))
    return path


def load_shard_standalone(path: str):
    """Reconstruct ``(HybridKnnServer, payload frame | None)`` from an
    exported shard directory — in ANY process, with NO SparkSession.
    The snapshots are rebuilt as the same immutable generation objects
    the in-process tier serves from, so every query verb
    (``query``/``query_batch``/``keyword_topn``/``hybrid_query``/
    ``hybrid_query_batch``) answers byte-identically to the shard it
    was exported from."""
    import numpy as np

    from vector_knowledge_base_spark.operators.serving import (
        HybridKnnServer,
        KnnServer,
        _HybridSnapshot,
        _Snapshot,
    )

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    vec = np.load(os.path.join(path, "vector.npz"), allow_pickle=False)
    kw = np.load(os.path.join(path, "keyword.npz"), allow_pickle=False)

    knn = object.__new__(KnnServer)
    knn.id_col = meta["knn_id_col"]
    knn.vec_col = meta["knn_vec_col"]
    knn.max_vectors = meta["knn_max_vectors"]
    knn.table_path = meta["table_path"]
    knn.last_refresh_mode = None
    knn._snap = _Snapshot(
        centroids=vec["centroids"],
        ids=vec["ids"],
        mat=vec["mat"],
        offsets=[int(x) for x in vec["offsets"]],
        version=meta["version"],
    )

    terms = [str(t) for t in kw["terms"]]
    term_offsets = kw["term_offsets"]
    post_rows, post_counts = kw["post_rows"], kw["post_counts"]
    postings = {
        t: (
            post_rows[term_offsets[i] : term_offsets[i + 1]],
            post_counts[term_offsets[i] : term_offsets[i + 1]],
        )
        for i, t in enumerate(terms)
    }
    shard = object.__new__(HybridKnnServer)
    shard.knn = knn
    shard.id_col = meta["id_col"]
    shard.text_col = meta["text_col"]
    shard.max_docs = meta["max_docs"]
    shard.table_path = meta["table_path"]
    shard.last_refresh_mode = None
    shard._docs_source = None  # standalone: no Spark frame to re-read
    shard._snap = _HybridSnapshot(
        doc_ids=kw["doc_ids"],
        dl=kw["dl"],
        postings=postings,
        avgdl=float(meta["avgdl"]),
        n_docs=int(meta["n_docs"]),
        version=meta["version"],
    )
    payload = None
    if meta.get("has_payload"):
        import pandas as pd

        payload = pd.read_parquet(os.path.join(path, "payload.parquet"))
    return shard, payload


def export_sharded_standalone(front, path: str, payload_by_shard=None) -> str:
    """Export EVERY shard of a ``ShardedHybridServer`` — each via
    ``export_shard_standalone`` into ``path/shard<s>/`` — plus a
    front manifest (``front.json``) recording the shard count and the
    ONE table version the set pins. ``payload_by_shard`` (the facade's
    r13 locality split) rides with its shard. One directory per
    serving host, one manifest for the router."""
    front_meta = {
        "n_shards": len(front.shards),
        "version": front.table_version,
        "table_path": front.table_path,
    }
    os.makedirs(path, exist_ok=True)
    for s, sh in enumerate(front.shards):
        export_shard_standalone(
            sh,
            os.path.join(path, f"shard{s}"),
            payload=(payload_by_shard or {}).get(s),
        )
    with open(os.path.join(path, "front.json"), "w") as f:
        json.dump(front_meta, f)
    return path


def load_sharded_standalone(path: str):
    """Reconstruct ``(ShardedHybridServer, {shard: payload frame})``
    from an exported front directory — fresh process, no SparkSession.
    The constructor's mixed-version refusal runs unchanged on the
    loaded shards, so a torn export (shards written around a refresh)
    is rejected exactly like a torn in-process build would be. The
    loaded front answers every fan-out verb (``vector_query[_batch]``,
    ``keyword_topn``, ``hybrid_query[_batch]``) byte-identically to
    the front it was exported from (subprocess-pinned)."""
    from vector_knowledge_base_spark.operators.serving import (
        ShardedHybridServer,
    )

    with open(os.path.join(path, "front.json")) as f:
        front_meta = json.load(f)
    shards, payloads = [], {}
    for s in range(front_meta["n_shards"]):
        sh, p = load_shard_standalone(os.path.join(path, f"shard{s}"))
        shards.append(sh)
        if p is not None:
            payloads[s] = p
    return ShardedHybridServer(shards), payloads


def export_pq_standalone(server, path: str) -> str:
    """Serialize a PQ-code serving tier — ``PqKnnServer`` (codebooks +
    codes) or ``IvfPqKnnServer`` (+ coarse centroids, cell offsets,
    optional OPQ rotation) — to ``path``. These are the tiers a 10⁹-
    vector deployment actually spins off: ~16 B/vector of codes
    instead of 4·dim B of floats, so one exported directory IS a
    billion-vector serving host's working set. Pure numpy writes."""
    import numpy as np

    from vector_knowledge_base_spark.operators.serving import (
        IvfPqKnnServer,
        PqKnnServer,
    )

    if not isinstance(server, (PqKnnServer, IvfPqKnnServer)):
        raise TypeError(
            f"export_pq_standalone: expected PqKnnServer or "
            f"IvfPqKnnServer, got {type(server).__name__}"
        )
    os.makedirs(path, exist_ok=True)
    snap = server._snap
    if isinstance(server, IvfPqKnnServer):
        arrays = dict(
            ids=snap.ids,
            codes=snap.codes,
            codebooks=snap.codebooks,
            centroids=snap.centroids,
            offsets=np.asarray(snap.offsets, dtype=np.int64),
        )
        if snap.rotation is not None:
            arrays["rotation"] = snap.rotation
        tier = "ivfpq"
    else:
        arrays = dict(
            ids=snap.ids, codes=snap.codes, codebooks=snap.codebooks
        )
        tier = "pq"
    np.savez(os.path.join(path, "codes.npz"), **arrays)
    meta = {
        "tier": tier,
        "version": server.table_version,
        "table_path": server.table_path,
        "id_col": server.id_col,
        "max_vectors": server.max_vectors,
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    return path


def load_pq_standalone(path: str):
    """Reconstruct the exported PQ-code tier in a fresh Spark-free
    process. The snapshot is rebuilt as the same immutable generation
    object, so ``query``/``query_batch`` (including the r14
    ``allowed_ids`` filtered-batch paths and their memoized masks)
    answer byte-identically to the exported server."""
    import numpy as np

    from vector_knowledge_base_spark.operators.serving import (
        IvfPqKnnServer,
        PqKnnServer,
        _IvfPqSnapshot,
        _PqSnapshot,
    )

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    arrs = np.load(os.path.join(path, "codes.npz"), allow_pickle=False)
    if meta["tier"] == "ivfpq":
        srv = object.__new__(IvfPqKnnServer)
        srv._snap = _IvfPqSnapshot(
            centroids=arrs["centroids"],
            codebooks=arrs["codebooks"],
            ids=arrs["ids"],
            codes=arrs["codes"],
            offsets=[int(x) for x in arrs["offsets"]],
            version=meta["version"],
            rotation=arrs["rotation"] if "rotation" in arrs else None,
        )
    elif meta["tier"] == "pq":
        srv = object.__new__(PqKnnServer)
        srv._snap = _PqSnapshot(
            codebooks=arrs["codebooks"],
            ids=arrs["ids"],
            codes=arrs["codes"],
            version=meta["version"],
        )
    else:
        raise ValueError(f"load_pq_standalone: unknown tier {meta['tier']!r}")
    srv.id_col = meta["id_col"]
    srv.max_vectors = meta["max_vectors"]
    srv.table_path = meta["table_path"]
    srv._build_params = {}
    srv.last_refresh_mode = None
    return srv
