"""Custom Python DataSource (Spark 4 API): deterministic synthetic
document corpus — "graftdocs".

Why this exists: the engine's scaling probes replicate the parquet
corpus driver-side (scripts/scaling_probe.py), which caps out at what
fits on disk.  A generating SOURCE produces an arbitrarily large
corpus lazily, partitioned, with zero input I/O — each of
``partitions`` input splits generates its own id range on the
executor, so a 10^9-doc load test is just a parameter, and filter
pushdown on ``doc_id`` (pushFilters) can skip whole splits.

Determinism contract: content is a pure function of doc_id (md5-seeded
word picks), so any engine — or a re-run — reproduces the corpus
exactly; near-dup structure is injected by making every ``dup_every``-th
document a copy of its predecessor (exercises the dedup family at
synthetic scale).

Usage:
    spark.dataSource.register(GraftDocsDataSource)
    df = (spark.read.format("graftdocs")
          .option("n_docs", 100000).option("partitions", 32).load())
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

VOCAB = (
    "spark data table row column scan filter join group merge sort "
    "batch stream window value key index bucket shuffle stage task "
    "plan query engine vector text slow fast small big dup part"
).split()

SCHEMA_DDL = "doc_id bigint, text string, n_words int"


def _words_for(doc_id: int, n_words: int) -> list[str]:
    h = hashlib.md5(f"graftdoc:{doc_id}".encode()).digest()
    out = []
    x = int.from_bytes(h[:8], "big")
    for i in range(n_words):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        # index with HIGH bits: an LCG's low k bits cycle with period
        # 2^k, and len(VOCAB)=32 would read exactly those bits — every
        # doc collapsed onto ~31 distinct word streams until this used
        # the top of the state
        out.append(VOCAB[(x >> 33) % len(VOCAB)])
    return out


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class GraftDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.n_words = int(options.get("words_per_doc", 40))
        self.dup_every = int(options.get("dup_every", 10))

    def partitions(self):
        per = max(1, (self.n_docs + self.n_parts - 1) // self.n_parts)
        return [
            _Range(lo, min(lo + per, self.n_docs))
            for lo in range(0, self.n_docs, per)
        ]

    def read(self, partition: _Range):
        for doc_id in range(partition.start, partition.end):
            src = doc_id - 1 if (
                self.dup_every and doc_id % self.dup_every == 0 and doc_id > 0
            ) else doc_id
            words = _words_for(src, self.n_words)
            yield (doc_id, " ".join(words), len(words))


class GraftDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "graftdocs"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema) -> DataSourceReader:
        return GraftDocsReader(self.options)
