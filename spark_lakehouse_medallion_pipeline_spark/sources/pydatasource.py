"""Python Data Source API (Spark 4) — a custom batch source.

The reference reads only parquet and catalog tables (SURVEY.md §2a
S3/S4); real training-data pipelines also ingest from feeds that have no
built-in connector (internal shard services, sample servers, quota'd
APIs). Spark 4's Python Data Source API is the supported way to write
those connectors without JVM code: a ``DataSource`` declares schema +
options, its reader SPLITS INTO PARTITIONS on the driver, and each
partition generates/fetches rows on an executor — full scan parallelism,
no driver funnel, arbitrary Python per partition.

This module ships a deterministic synthetic-corpus source
(``synthetic_docs``) as the reference connector: every value is a pure
function of (row id, options) via the engine-portable Knuth mix used by
operators.text.mixture_uniform, so output is identical across runs,
partitionings, and engines — which is what lets the q124 oracle verify a
CUSTOM SOURCE value-for-value in DuckDB.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

# same constants as operators.text.mixture_uniform (kept literal here so
# the source has no package deps when pickled to executors)
_P = 1_000_003
_K = 2_654_435_761
_M = 4_294_967_296


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs")`` batch source.

    Options:
      rows        total row count (default 1000)
      partitions  scan parallelism (default 8)
      shards      number of shard labels (default 4)
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, bucket bigint, u double, shard string"

    def reader(self, schema) -> "SyntheticDocsReader":
        return SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticDocsStreamReader":
        return SyntheticDocsStreamReader(self.options)


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.n_parts = max(1, int(options.get("partitions", 8)))
        self.shards = max(1, int(options.get("shards", 4)))

    def partitions(self):
        # contiguous id ranges: each partition knows its slice from the
        # partition value alone — no driver-side row materialization
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition: InputPartition):
        per = -(-self.rows // self.n_parts)  # ceil division
        start = partition.value * per
        end = min(start + per, self.rows)
        for doc_id in range(start, end):
            yield _row(doc_id, self.shards)


def _row(doc_id: int, shards: int) -> tuple:
    mixed = (doc_id % _P) * _K % _M
    return (doc_id, mixed % 4096, mixed / _M, f"shard{mixed % shards}")


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Streaming variant of the same feed: each microbatch advances the
    offset by ``batch`` ids until ``rows`` is exhausted — the
    incremental-shard-ingest shape (new corpus slices arriving over
    time) with EXACTLY the batch source's values, so stream output ==
    batch output row-for-row (pinned in pytest). Offsets are plain
    ``{"pos": n}`` dicts: checkpointable, replayable
    (readBetweenOffsets re-derives any committed range exactly — the
    source is a pure function of id, so replay after failure is
    deterministic)."""

    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.batch = max(1, int(options.get("batch", 100)))
        self.shards = max(1, int(options.get("shards", 4)))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        pos = start["pos"]
        end = min(pos + self.batch, self.rows)
        return (
            iter([_row(i, self.shards) for i in range(pos, end)]),
            {"pos": end},
        )

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_row(i, self.shards) for i in range(start["pos"], end["pos"])])


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(SyntheticDocsDataSource)
