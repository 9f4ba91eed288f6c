"""Kafka plan-builder tests (S11/S12) — no broker in the image, so the
testable halves are exercised for real: the exact option maps, the
(key, value) wire projection, and a lossless to_json → from_json
round-trip through a genuine micro-batch stream. Only the final
``.format("kafka").load()/start()`` needs the connector jar.

Also pins the webhook sink's replay idempotency: a micro-batch whose
publish rename completed but whose engine commit record was lost gets
re-committed on restart, and must be a no-op, not a crash.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from chicago_business_owners_data_engineering_spark.streaming.jobs import (
    EVENT_SCHEMA,
    decode_kafka_value,
    kafka_payload,
    kafka_sink_options,
    kafka_source_options,
    read_event_stream,
)

SF = "/root/testdata/sf0.001"


def test_kafka_option_maps_exact():
    assert kafka_sink_options("b1:9092,b2:9092", "events.out") == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "topic": "events.out",
    }
    assert kafka_source_options("b1:9092", "events.in") == {
        "kafka.bootstrap.servers": "b1:9092",
        "subscribe": "events.in",
    }


def test_kafka_payload_schema_and_json_shape(spark):
    events = spark.read.parquet(f"{SF}/events.parquet")
    payload = kafka_payload(events.limit(50))
    # the kafka sink contract: exactly (key, value), both string
    assert [(f.name, f.dataType.simpleString()) for f in payload.schema.fields] == [
        ("key", "string"),
        ("value", "string"),
    ]
    rows = payload.collect()
    assert len(rows) == 50
    for r in rows[:5]:
        doc = json.loads(r["value"])
        assert set(doc) <= {f.name for f in EVENT_SCHEMA.fields}
        assert r["key"] == str(doc["event_id"])


def test_kafka_roundtrip_batch_lossless(spark):
    events = spark.read.parquet(f"{SF}/events.parquet").limit(200)
    decoded = decode_kafka_value(kafka_payload(events))
    assert decoded.schema == EVENT_SCHEMA
    orig = {tuple(r) for r in events.collect()}
    back = {tuple(r) for r in decoded.collect()}
    assert back == orig


def test_kafka_decode_in_streaming_plan(spark, tmp_path):
    """decode_kafka_value composes into a real micro-batch stream: stage
    the wire format (value JSON strings) as the S12 source would deliver
    it, stream it, and get typed rows out."""
    events = spark.read.parquet(f"{SF}/events.parquet").limit(100)
    src = tmp_path / "wire"
    # stage the wire-shaped frame as parquet so the stream reads
    # (key string, value string) exactly like kafka's deserialized form
    kafka_payload(events).write.parquet(str(src))
    wire_schema = "key string, value string"
    stream = spark.readStream.schema(wire_schema).parquet(str(src))
    typed = decode_kafka_value(stream)
    assert typed.isStreaming
    q = (
        typed.writeStream.format("memory")
        .queryName("t_kafka_decode")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    out = spark.sql("SELECT * FROM t_kafka_decode")
    assert out.schema == EVENT_SCHEMA
    assert out.count() == 100
    assert out.filter(F.col("event_id").isNull()).count() == 0


def test_webhook_commit_replay_idempotent(tmp_path):
    """Crash between publish-rename and engine commit record → the
    restarted query re-commits the same batchId; an existing batch-N
    directory must make commit a clean no-op (and sweep staging), not
    an os.rename onto a non-empty target."""
    from chicago_business_owners_data_engineering_spark.sources.python_datasource import (
        _TaskFileCommit,
        _WebhookStreamWriter,
    )

    out = tmp_path / "out"
    writer = _WebhookStreamWriter({"path": str(out)})
    os.makedirs(writer.stage_dir)

    # batch 0 was already published by the pre-crash attempt
    published = out / "batch-0"
    published.mkdir()
    (published / "task-old.jsonl").write_text('{"event_id": 1}\n')

    # the replayed attempt staged its own task file
    replay_tmp = os.path.join(writer.stage_dir, "task-replay.jsonl")
    with open(replay_tmp, "w") as f:
        f.write('{"event_id": 1}\n')

    writer.commit([_TaskFileCommit(tmp_path=replay_tmp, rows=1)], batchId=0)

    # original publish untouched, replay staging swept, no second copy
    assert (published / "task-old.jsonl").read_text() == '{"event_id": 1}\n'
    assert os.listdir(writer.stage_dir) == []
    assert sorted(os.listdir(out)) == ["_staging", "batch-0"]


def test_webhook_commit_discards_stale_publish_dir(tmp_path):
    """Crash BETWEEN gathering and the atomic publish rename leaves a
    stale publish-N dir holding the dead attempt's task files. The
    replayed commit must publish ONLY its own attempt's files — reusing
    the stale dir would double-deliver every row of the batch."""
    from chicago_business_owners_data_engineering_spark.sources.python_datasource import (
        _TaskFileCommit,
        _WebhookStreamWriter,
    )

    out = tmp_path / "out"
    writer = _WebhookStreamWriter({"path": str(out)})
    stale = os.path.join(writer.stage_dir, "publish-3")
    os.makedirs(stale)
    with open(os.path.join(stale, "task-dead.jsonl"), "w") as f:
        f.write('{"event_id": 9}\n')

    replay_tmp = os.path.join(writer.stage_dir, "task-new.jsonl")
    with open(replay_tmp, "w") as f:
        f.write('{"event_id": 9}\n')

    writer.commit([_TaskFileCommit(tmp_path=replay_tmp, rows=1)], batchId=3)

    published = out / "batch-3"
    assert sorted(os.listdir(published)) == ["task-new.jsonl"]
    assert os.listdir(writer.stage_dir) == []
