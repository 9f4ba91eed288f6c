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

import json
import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
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


# ---------------------------------------------------------------------------
# Custom streaming SINK: the two-phase commit protocol, visible
# ---------------------------------------------------------------------------


@dataclass
class _TaskFileCommit(WriterCommitMessage):
    tmp_path: str
    rows: int


class _WebhookStreamWriter(DataSourceStreamWriter):
    """S11-shaped delivery sink with an explicit 2-phase commit.

    The reference fires Kafka/webhook sends per event with no
    transactional boundary (streaming_processor.py:331-352) — a task
    retry double-delivers. Here the engine's sink protocol makes the
    boundary real: ``write`` (executor-side) stages each task's rows to
    a temp file and returns it as the commit message; ``commit``
    (driver-side, once per micro-batch, only after EVERY task
    succeeded) gathers the staged files into a per-batch directory and
    publishes it with ONE atomic rename — a consumer listing the
    output dir sees each ``batch-N`` directory fully or not at all,
    regardless of how many tasks wrote it. ``abort`` discards the
    staged files. Commit also sweeps orphans left by tasks that died
    mid-write (they returned no commit message, so nothing else would
    ever clean them); micro-batches are serial per query, so anything
    in staging at commit time belongs to this batch's failed attempts.

    Assumes driver and executors share a filesystem (local mode, NFS,
    fuse mounts) — the same assumption Spark's own file sinks make of
    their staging dirs. On an object store, the atomic-rename step
    becomes a manifest/_SUCCESS-marker publish; the protocol shape is
    unchanged.
    """

    def __init__(self, options):
        self.out_dir = options.get("path")
        if not self.out_dir:
            raise ValueError("webhook sink requires option 'path'")
        self.stage_dir = os.path.join(self.out_dir, "_staging")

    def write(self, iterator):
        os.makedirs(self.stage_dir, exist_ok=True)
        tmp = os.path.join(self.stage_dir, f"task-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _TaskFileCommit(tmp_path=tmp, rows=n)

    def commit(self, messages, batchId):
        # Replay-safe: if the query crashed AFTER the atomic publish
        # rename but BEFORE the engine recorded the batch commit, the
        # restarted query re-runs the same batchId. An existing
        # batch-N target is proof the batch was already delivered —
        # re-publishing would rename onto a non-empty directory and
        # wedge the query, so discard this attempt's staging instead.
        if os.path.isdir(os.path.join(self.out_dir, f"batch-{batchId}")):
            self._sweep_orphans()
            return
        publish_tmp = os.path.join(self.stage_dir, f"publish-{batchId}")
        # A leftover publish dir is a PRIOR attempt that crashed between
        # gathering and the atomic rename; its task files belong to that
        # dead attempt (this attempt's complete set is in `messages`).
        # Reusing the dir would publish BOTH attempts' files — double
        # delivery — so clear it first.
        if os.path.isdir(publish_tmp):
            shutil.rmtree(publish_tmp)
        os.makedirs(publish_tmp)
        for m in messages:
            if m is None:
                continue
            os.rename(
                m.tmp_path,
                os.path.join(publish_tmp, os.path.basename(m.tmp_path)),
            )
        # single atomic publish: the whole batch appears at once
        os.rename(publish_tmp, os.path.join(self.out_dir, f"batch-{batchId}"))
        self._sweep_orphans()

    def abort(self, messages, batchId):
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)
        self._sweep_orphans()

    def _sweep_orphans(self):
        # Removes stranded task files (tasks that died mid-write) AND
        # stranded publish-* dirs (commit attempts that died before the
        # atomic rename). Safe because micro-batches are serial per
        # query: nothing else can be staging concurrently.
        if not os.path.isdir(self.stage_dir):
            return
        for name in os.listdir(self.stage_dir):
            p = os.path.join(self.stage_dir, name)
            if os.path.isfile(p):
                os.remove(p)
            elif os.path.isdir(p):
                shutil.rmtree(p)


class WebhookSinkDataSource(DataSource):
    """``webhook_sink`` — registerable streaming sink (2-phase commit)."""

    @classmethod
    def name(cls) -> str:
        return "webhook_sink"

    def schema(self) -> str:
        return SCHEMA

    def streamWriter(self, schema, overwrite):
        return _WebhookStreamWriter(self.options)


def register_sink(spark) -> None:
    spark.dataSource.register(WebhookSinkDataSource)
