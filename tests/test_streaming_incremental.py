"""Streaming incremental gold maintenance: merge correctness + replay safety."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from chicago_business_owners_data_engineering_spark.streaming.jobs import (
    foreach_batch_incremental_rollup,
    read_event_stream,
)


def _stage_events(tmp_path, n_files=3):
    pdf = duckdb.sql("SELECT * FROM '/root/testdata/sf0.001/events.parquet'").df()
    src = tmp_path / "inc_src"
    src.mkdir()
    step = len(pdf) // n_files
    for i in range(n_files):
        chunk = pdf.iloc[i * step : None if i == n_files - 1 else (i + 1) * step]
        chunk.to_parquet(str(src / f"batch{i}.parquet"))
    return src, pdf


def _run(spark, src, gold, ckpt):
    q = (
        read_event_stream(spark, str(src), max_files_per_trigger=1)
        .writeStream.foreachBatch(foreach_batch_incremental_rollup(str(gold)))
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_incremental_gold_matches_batch_rollup(spark, tmp_path):
    src, pdf = _stage_events(tmp_path)
    gold = tmp_path / "gold"
    _run(spark, src, gold, tmp_path / "ckpt")

    got = {
        (r["day"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in spark.read.parquet(str(gold / "data")).collect()
    }
    batch = spark.createDataFrame(pdf)
    want = {
        (r["day"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in batch.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type"
        )
        .agg(F.sum("value").alias("sum_value"), F.count("*").alias("n_events"))
        .collect()
    }
    assert set(got) == set(want)
    for k, (n, s) in want.items():
        assert got[k][0] == n
        assert abs(got[k][1] - s) < 1e-4


def test_incremental_gold_replay_does_not_double_count(spark, tmp_path):
    src, pdf = _stage_events(tmp_path)
    gold = tmp_path / "gold"
    _run(spark, src, gold, tmp_path / "ckpt")
    before = spark.read.parquet(str(gold / "data"))
    total_before = before.agg(F.sum("n_events")).collect()[0][0]

    # Replay the whole source with a FRESH checkpoint (the crashed-and-
    # lost-offsets scenario): every epoch re-fires, the ledger must
    # swallow all of them.
    _run(spark, src, gold, tmp_path / "ckpt2")
    after = spark.read.parquet(str(gold / "data"))
    total_after = after.agg(F.sum("n_events")).collect()[0][0]
    assert total_after == total_before == len(pdf)


def test_vector_index_streaming_append(spark, tmp_path):
    """Online PQ-index maintenance: SDC dedup + epoch-ledger replay safety."""
    import duckdb as _duck

    from chicago_business_owners_data_engineering_spark.plans.vector_pipeline import (
        build_vector_index,
        foreach_batch_index_append,
    )

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "vec")
    card = build_vector_index(spark, sf, out)
    base = spark.read.parquet(str(tmp_path / "vec" / "pq_index")).count()

    # stage a stream: one batch with an EXACT copy of an indexed vector
    # (new id) and one clearly novel vector
    pdf = _duck.sql(f"SELECT * FROM '{sf}/embeddings.parquet' LIMIT 50").df()
    indexed_ids = {
        r["vec_id"] for r in spark.read.parquet(str(tmp_path / "vec" / "pq_index")).collect()
    }
    src_row = pdf[pdf.vec_id.isin(list(indexed_ids))].iloc[0]
    import numpy as np
    import pandas as pd

    batch = pd.DataFrame(
        {
            "vec_id": [900001, 900002],
            "embedding": [src_row["embedding"], np.full(64, 123.0, dtype=np.float32)],
            "label": [int(src_row["label"]), 99],
        }
    )
    src = tmp_path / "stream_vecs"
    src.mkdir()
    batch.to_parquet(str(src / "b0.parquet"))

    schema = "vec_id long, embedding array<float>, label long"
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(
            foreach_batch_index_append(out, card["codebook"])
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    idx = spark.read.parquet(str(tmp_path / "vec" / "pq_index"))
    ids = {r["vec_id"] for r in idx.collect()}
    assert 900002 in ids, "novel vector must be appended"
    assert 900001 not in ids, "exact copy of an indexed vector must be SDC-deduped"
    assert idx.count() == base + 1

    # full replay with a fresh checkpoint: ledger must swallow epoch 0
    q2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(
            foreach_batch_index_append(out, card["codebook"])
        )
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    assert spark.read.parquet(str(tmp_path / "vec" / "pq_index")).count() == base + 1
