"""Custom Python DataSource: the reference's poll sources, engine-native.

The reference hand-rolls two pollers — an HTTP API poll every 30 s
(cbddl/src/big_data/streaming_processor.py:105-129, S15) and a DB
change-query poll with a ``last_processed`` cursor stored in Redis
(streaming_processor.py:131-169,380-412, S14/ST2). Spark 4's Python
DataSource API lets both become first-class sources:

- **batch**: ``spark.read.format("business_events")`` — one input
  partition per API page, so page fetches run in PARALLEL across
  executors (the reference fetches serially on one thread);
- **streaming**: ``spark.readStream.format("business_events")`` — the
  poll cursor IS the stream offset, persisted in the engine checkpoint.
  Restarting the query resumes exactly where it left off with no Redis,
  no hand-rolled cursor writes (ST2 made structural).

No network exists in this environment, so the "fetch" is a
deterministic synthetic page generator (clearly marked below); a real
deployment replaces ``_fetch_page``'s body with the HTTP/DB call and
NOTHING else changes — partitioning, offsets, and recovery semantics
all live in the engine.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

EVENT_TYPES = ("view", "click", "purchase", "signup", "error")
SCHEMA = "event_id bigint, user_id bigint, event_type string, value double"


def _fetch_page(page: int, page_size: int):
    """STUB for the remote fetch — deterministic synthetic rows.

    A real source issues ``GET /api/business-data?page={page}`` (or the
    ``WHERE created_at > :cursor ORDER BY created_at LIMIT n`` change
    query) here. Determinism matters even in production: a page/cursor
    must return the same rows on task retry or the source breaks
    exactly-once recovery.
    """
    base = page * page_size
    for i in range(page_size):
        event_id = base + i
        # cheap integer hash → stable pseudo-randomness, no RNG state
        h = (event_id * 2654435761) % 2**32
        yield (
            event_id,
            h % 150,
            EVENT_TYPES[h % len(EVENT_TYPES)],
            round((h % 49_000) / 100.0, 2),
        )


class _PageReader(DataSourceReader):
    def __init__(self, options):
        self.n_pages = int(options.get("pages", 4))
        self.page_size = int(options.get("page_size", 100))

    def partitions(self):
        # one partition per remote page → executors fetch concurrently
        return [InputPartition(p) for p in range(self.n_pages)]

    def read(self, partition):
        yield from _fetch_page(partition.value, self.page_size)


class _PollCursorStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch poll with the cursor as the engine-managed offset."""

    def __init__(self, options):
        self.page_size = int(options.get("page_size", 100))

    def initialOffset(self):
        return {"cursor": 0}

    def read(self, start):
        cursor = start["cursor"]
        rows = list(_fetch_page(cursor, self.page_size))
        return iter(rows), {"cursor": cursor + 1}

    def readBetweenOffsets(self, start, end):
        # replay for recovery: offsets are page numbers, so the range
        # regenerates deterministically
        rows = []
        for page in range(start["cursor"], end["cursor"]):
            rows.extend(_fetch_page(page, self.page_size))
        return iter(rows)


class BusinessEventsDataSource(DataSource):
    """``business_events`` — registerable batch + streaming source."""

    @classmethod
    def name(cls) -> str:
        return "business_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema):
        return _PageReader(self.options)

    def simpleStreamReader(self, schema):
        return _PollCursorStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(BusinessEventsDataSource)
