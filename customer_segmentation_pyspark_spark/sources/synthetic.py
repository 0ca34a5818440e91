"""Custom Python Data Source (Spark 4 DataSource API): deterministic
synthetic document generator.

Demonstrates the engine's ingestion extensibility: a from-scratch source
that Spark schedules like any other — the driver plans N independent
partitions, each executor materializes its own rows (seeded by partition
id, so output is deterministic and re-executable — a failed task
regenerates identical data, preserving exactly-once semantics
downstream). The same shape plugs in web-crawl shards, API pages, or any
partitioned external system.

Usage:
    spark.dataSource.register(SyntheticDocsSource)
    df = spark.read.format("synthetic_docs")
         .option("n_docs", 1000).option("n_partitions", 8).load()
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

SCHEMA_DDL = "doc_id bigint, text string, lang string, n_tokens bigint"

_WORDS = (
    "data spark query join filter table scan row column merge sort hash "
    "stream batch window group agg key value fast slow small large the a"
).split()
_LANGS = ("en", "es", "fr", "de", "zh")


class _DocsPartition(InputPartition):
    def __init__(self, pid: int, start: int, end: int):
        self.pid = pid
        self.start = start
        self.end = end


class _DocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))

    def partitions(self):
        per = -(-self.n_docs // self.n_partitions)
        return [
            _DocsPartition(i, i * per, min((i + 1) * per, self.n_docs))
            for i in range(self.n_partitions)
            if i * per < self.n_docs
        ]

    def read(self, partition: _DocsPartition):
        # deterministic per doc_id (NOT per task attempt): retries of this
        # partition regenerate byte-identical rows
        for doc_id in range(partition.start, partition.end):
            yield _gen_doc(doc_id)


class SyntheticDocsSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str | StructType:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return _DocsReader(self.options)

    def streamReader(self, schema: StructType) -> "_DocsStreamReader":
        return _DocsStreamReader(self.options)


def _gen_doc(doc_id: int):
    """Shared row generator — batch and streaming paths emit byte-identical
    rows for the same doc_id (retries and replays are exactly-once)."""
    import random

    rng = random.Random(doc_id * 2654435761 % (2**31))
    n_tokens = 40 + rng.randrange(200)
    text = " ".join(rng.choice(_WORDS) for _ in range(n_tokens))
    lang = _LANGS[rng.randrange(len(_LANGS))]
    return (doc_id, text, lang, n_tokens)


class _DocsStreamReader(DataSourceStreamReader):
    """Streaming half of the custom source (Spark 4 Python streaming
    DataSource API): the offset is a doc_id cursor; each micro-batch
    advances it by ``batch_docs`` and plans ``n_partitions`` independent
    id-range splits.  Offsets are JSON-serializable dicts checkpointed by
    the engine — a restarted query resumes from the committed cursor and
    regenerates identical rows (deterministic per doc_id)."""

    def __init__(self, options):
        self.batch_docs = int(options.get("batch_docs", 100))
        self.n_partitions = int(options.get("n_partitions", 4))
        self._cursor = 0

    def initialOffset(self):
        return {"cursor": 0}

    def latestOffset(self):
        self._cursor += self.batch_docs
        return {"cursor": self._cursor}

    def partitions(self, start, end):
        lo, hi = int(start["cursor"]), int(end["cursor"])
        self._cursor = max(self._cursor, hi)
        per = -(-(hi - lo) // self.n_partitions)
        return [
            _DocsPartition(i, lo + i * per, min(lo + (i + 1) * per, hi))
            for i in range(self.n_partitions)
            if lo + i * per < hi
        ]

    def read(self, partition: _DocsPartition):
        for doc_id in range(partition.start, partition.end):
            yield _gen_doc(doc_id)

    def commit(self, end):
        pass


class _ShardCommit(WriterCommitMessage):
    def __init__(self, tmp: str, rows: int):
        self.tmp = tmp
        self.rows = rows


class _JsonlShardWriter(DataSourceWriter):
    """Task side of the two-phase commit: each task writes its shard to
    a hidden ``.tmp-*`` file and reports it in the commit message;
    nothing becomes visible unless the DRIVER commits. A retried or
    speculated task just leaves an orphan tmp that abort/commit cleans
    — the reader never observes partial output (same protocol shape as
    sinks.crash_safe_swap, per-file instead of per-directory)."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_shards requires .option('path', ...)")
        self.overwrite = overwrite

    def write(self, iterator):
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".tmp-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _ShardCommit(tmp=tmp, rows=n)

    def commit(self, messages):
        import glob as _glob
        import os

        if self.overwrite:
            for old in _glob.glob(os.path.join(self.path, "part-*.jsonl")):
                os.remove(old)
        for i, msg in enumerate(messages):
            os.rename(
                msg.tmp,
                os.path.join(self.path, f"part-{i:05d}.jsonl"),
            )
        # clean tmps stranded by retried/speculated tasks
        for stale in _glob.glob(os.path.join(self.path, ".tmp-*.jsonl")):
            os.remove(stale)

    def abort(self, messages):
        import os

        for msg in messages:
            if msg is not None and os.path.exists(msg.tmp):
                os.remove(msg.tmp)


class JsonlShardSink(DataSource):
    """Custom Python Data Source WRITE path (Spark 4 DataSource API):
    ``df.write.format("jsonl_shards").option("path", p).save()`` —
    the sink twin of ``SyntheticDocsSource``. Local filesystem here;
    a production version swaps file renames for an object-store
    multipart-commit, keeping the same two-phase protocol."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_shards"

    def writer(self, schema: StructType, overwrite: bool):
        return _JsonlShardWriter(self.options, overwrite)
