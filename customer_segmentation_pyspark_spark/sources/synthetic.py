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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
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
        import random

        for doc_id in range(partition.start, partition.end):
            rng = random.Random(doc_id * 2654435761 % (2**31))
            n_tokens = 40 + rng.randrange(200)
            text = " ".join(rng.choice(_WORDS) for _ in range(n_tokens))
            lang = _LANGS[rng.randrange(len(_LANGS))]
            yield (doc_id, text, lang, n_tokens)


class SyntheticDocsSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str | StructType:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return _DocsReader(self.options)
