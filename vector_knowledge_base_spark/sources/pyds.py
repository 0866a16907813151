"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic-documents source, registered as ``format("synthetic_docs")``.

Why this exists: the reference ingests from REST uploads
(/root/reference/backend/main.py:284-292) — a push source. A Spark
engine pulls; anything that can enumerate records (an HTTP API, a queue,
a proprietary store) becomes a first-class table via this API, with the
engine's partitioning driving parallel fetch. This source demonstrates
the contract end-to-end: options → schema → partition planning → per-
partition record generation, all driver-checked by a deterministic
content hash in tests.

Scale note: ``partitions()`` is the parallelism contract — each
InputPartition becomes one task, so a real connector maps shards/
key-ranges/log-segments to partitions and each task reads only its own
slice. Nothing flows through the driver.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_WORDS = [
    "spark", "vector", "table", "query", "index", "batch", "stream",
    "merge", "scan", "join", "filter", "window", "agg", "sort",
]


def synthetic_text(doc_id: int, n_tokens: int = 12) -> str:
    """Deterministic pseudo-text for a doc id (md5-driven token picks)."""
    toks = []
    seed = hashlib.md5(str(doc_id).encode()).digest()
    for i in range(n_tokens):
        toks.append(_WORDS[seed[i % len(seed)] % len(_WORDS)])
        if i % len(seed) == len(seed) - 1:
            seed = hashlib.md5(seed).digest()
    return " ".join(toks)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs").option("n", 100)
    .option("num_partitions", 4).load()``"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string"

    def reader(self, schema) -> "SyntheticDocsReader":
        return SyntheticDocsReader(
            n=int(self.options.get("n", 100)),
            num_partitions=int(self.options.get("num_partitions", 4)),
        )


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, n: int, num_partitions: int):
        self.n = n
        self.num_partitions = max(1, num_partitions)

    def partitions(self):
        step = -(-self.n // self.num_partitions)  # ceil div
        return [
            _RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition):
        for doc_id in range(partition.start, partition.end):
            yield (doc_id, synthetic_text(doc_id))


class SyntheticDocsStreamDataSource(DataSource):
    """Streaming twin of the synthetic source (Spark 4
    SimpleDataSourceStreamReader contract): emits ``batch_size`` docs
    per microbatch until ``n_total``, with exactly-once offsets.

    ``spark.readStream.format("synthetic_docs_stream")
    .option("n_total", 60).option("batch_size", 20).load()``

    The offset is a plain dict checkpointed by the engine;
    ``readBetweenOffsets`` replays any offset range deterministically —
    the recovery contract a production connector (queue/CDC feed/log
    tailer) must honor for end-to-end exactly-once.
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs_stream"

    def schema(self) -> str:
        return "doc_id bigint, text string"

    def simpleStreamReader(self, schema) -> "SyntheticDocsStreamReader":
        return SyntheticDocsStreamReader(
            n_total=int(self.options.get("n_total", 60)),
            batch_size=int(self.options.get("batch_size", 20)),
        )


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """SimpleDataSourceStreamReader: driver-side reads (rows flow
    through the offset log) — right for low-volume control streams;
    a high-volume source implements the partitioned
    DataSourceStreamReader instead so executors fetch in parallel."""

    def __init__(self, n_total: int, batch_size: int):
        self.n_total = n_total
        self.batch_size = batch_size

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        lo = int(start["pos"])
        hi = min(lo + self.batch_size, self.n_total)
        return (
            iter([(i, synthetic_text(i)) for i in range(lo, hi)]),
            {"pos": hi},
        )

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [
                (i, synthetic_text(i))
                for i in range(int(start["pos"]), int(end["pos"]))
            ]
        )

    def commit(self, end: dict) -> None:
        pass


class SyntheticDocsPartitionedStreamDataSource(DataSource):
    """High-volume streaming twin: the PARTITIONED
    DataSourceStreamReader contract — offsets planned on the driver,
    rows read BY EXECUTORS (one task per InputPartition per
    microbatch). This is the connector shape for sources too big to
    funnel through the driver (the SimpleDataSourceStreamReader above
    routes rows through the offset log — right for control streams,
    wrong for a firehose).

    ``spark.readStream.format("synthetic_docs_pstream")
    .option("n_total", 90).option("batch_size", 30)
    .option("num_partitions", 3).load()``
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs_pstream"

    def schema(self) -> str:
        return "doc_id bigint, text string"

    def streamReader(self, schema) -> "SyntheticDocsPartitionedStreamReader":
        return SyntheticDocsPartitionedStreamReader(
            n_total=int(self.options.get("n_total", 90)),
            batch_size=int(self.options.get("batch_size", 30)),
            num_partitions=int(self.options.get("num_partitions", 3)),
        )


class SyntheticDocsPartitionedStreamReader(DataSourceStreamReader):
    """DataSourceStreamReader: latestOffset() advances the high-water
    mark batch_size at a time; partitions(start, end) splits the offset
    range into executor tasks; read(partition) runs ON EXECUTORS."""

    def __init__(self, n_total: int, batch_size: int, num_partitions: int):
        self.n_total = n_total
        self.batch_size = batch_size
        self.num_partitions = max(1, num_partitions)
        self._latest = 0

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def latestOffset(self) -> dict:
        self._latest = min(self._latest + self.batch_size, self.n_total)
        return {"pos": self._latest}

    def partitions(self, start: dict, end: dict):
        # recovery monotonicity: after a checkpoint restart this object
        # is fresh (_latest = 0) but the engine replans from the
        # COMMITTED offset — ratchet the high-water mark against engine
        # state so latestOffset never regresses below it (a regressed
        # mark re-advances past already-committed ranges and re-emits
        # them: duplicate rows, contradicting exactly-once recovery)
        self._latest = max(self._latest, int(start["pos"]))
        lo, hi = int(start["pos"]), int(end["pos"])
        n = hi - lo
        if n <= 0:
            return [_RangePartition(lo, lo)]
        step = -(-n // self.num_partitions)
        return [
            _RangePartition(p, min(p + step, hi)) for p in range(lo, hi, step)
        ]

    def read(self, partition: _RangePartition):
        for doc_id in range(partition.start, partition.end):
            yield (doc_id, synthetic_text(doc_id))

    def commit(self, end: dict) -> None:
        # same ratchet on commit: the engine's committed end is the
        # durable floor for any future latestOffset() call
        self._latest = max(self._latest, int(end["pos"]))

    def stop(self) -> None:
        pass
