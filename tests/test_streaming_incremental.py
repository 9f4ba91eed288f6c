"""Streaming incremental gold maintenance: merge correctness + replay safety."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from chicago_business_owners_data_engineering_spark.streaming.jobs import (
    foreach_batch_incremental_rollup,
    read_event_stream,
    read_versioned,
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
        for r in read_versioned(spark, str(gold)).collect()
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
    before = read_versioned(spark, str(gold))
    total_before = before.agg(F.sum("n_events")).collect()[0][0]

    # Replay the whole source with a FRESH checkpoint (the crashed-and-
    # lost-offsets scenario): every epoch re-fires, the ledger must
    # swallow all of them.
    _run(spark, src, gold, tmp_path / "ckpt2")
    after = read_versioned(spark, str(gold))
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


# ---------------------------------------------------------------------------
# Streaming near-dup admission control (foreach_batch_neardup_dedup)
# ---------------------------------------------------------------------------

_BASE = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lam mu nu xi omicron pi rho sigma tau upsilon"
)
_VARIANT = _BASE.replace("kappa", "kappa2")  # high-Jaccard near-dup
_OTHER = (
    "one two three four five six seven eight nine ten eleven twelve "
    "thirteen fourteen fifteen sixteen"
)


def _stage_docs(tmp_path):
    import pandas as pd

    src = tmp_path / "nd_src"
    src.mkdir()
    # batch0: original + an in-batch near-dup + an unrelated doc
    pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": [_BASE, _VARIANT, _OTHER]}
    ).to_parquet(str(src / "b0.parquet"))
    # batch1: a cross-batch near-dup of doc 1 + a fresh doc
    pd.DataFrame(
        {
            "doc_id": [10, 11],
            "text": [
                _BASE + " omega",
                "completely fresh content nothing shared with any prior document at all today",
            ],
        }
    ).to_parquet(str(src / "b1.parquet"))
    return src


def _run_neardup(spark, src, index, ckpt):
    from chicago_business_owners_data_engineering_spark.streaming.jobs import (
        foreach_batch_neardup_dedup,
    )

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(foreach_batch_neardup_dedup(str(index)))
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    q.processAllAvailable()
    q.stop()


def _admitted(spark, index):
    return {
        r.doc_id
        for r in spark.read.parquet(str(index / "hsets")).select("doc_id").collect()
    }


def test_neardup_stream_admission(spark, tmp_path):
    src = _stage_docs(tmp_path)
    index = tmp_path / "nd_index"
    _run_neardup(spark, src, index, tmp_path / "nd_ckpt")
    got = _admitted(spark, index)
    # doc 2 (in-batch near-dup of 1) and doc 10 (cross-batch near-dup
    # of indexed doc 1) must be dropped; 1, 3, 11 admitted.
    assert got == {1, 3, 11}, got


def test_neardup_stream_replay_is_idempotent(spark, tmp_path):
    src = _stage_docs(tmp_path)
    index = tmp_path / "nd_index2"
    _run_neardup(spark, src, index, tmp_path / "nd_ckpt2")
    first = spark.read.parquet(str(index / "hsets")).count()
    # Fresh checkpoint replays every batch from scratch — admissions
    # and index contents must not duplicate (epoch dirs overwrite,
    # ledger short-circuits).
    _run_neardup(spark, src, index, tmp_path / "nd_ckpt3")
    assert spark.read.parquet(str(index / "hsets")).count() == first
    assert _admitted(spark, index) == {1, 3, 11}


def test_neardup_stream_chain_admits_unblocked_doc(spark, tmp_path):
    """A~B, B~C, A≁C in ONE batch: B drops (matches admitted A), but C
    must be ADMITTED — its only match B was itself dropped. The
    admitted-blocker rule, not transitive component closure."""
    import pandas as pd

    words = [f"w{i}" for i in range(12)]
    a = list(words)
    b = list(words); b[4] = "CHANGED-B"
    c = list(b);     c[9] = "CHANGED-C"  # differs from a at 4 AND 9
    src = tmp_path / "chain_src"
    src.mkdir()
    pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": [" ".join(a), " ".join(b), " ".join(c)]}
    ).to_parquet(str(src / "b0.parquet"))
    index = tmp_path / "chain_index"
    _run_neardup(spark, src, index, tmp_path / "chain_ckpt")
    assert _admitted(spark, index) == {1, 3}


def test_neardup_stream_crash_before_marker_replay(spark, tmp_path):
    """Crash AFTER publishing epoch=N but BEFORE the ledger marker:
    the replay must not self-match the batch against its own published
    rows (which would empty the epoch) — the index probe reads only
    epochs strictly before the current one."""
    import shutil

    from chicago_business_owners_data_engineering_spark.streaming.jobs import (
        foreach_batch_neardup_dedup,
    )

    index = tmp_path / "crash_index"
    sink = foreach_batch_neardup_dedup(str(index))
    batch = spark.createDataFrame(
        [(1, _BASE), (2, _OTHER)], "doc_id long, text string"
    )
    sink(batch, 0)
    assert _admitted(spark, index) == {1, 2}
    # simulate the crash window: publish happened, marker lost
    shutil.rmtree(str(index / "_ledger"))
    sink(batch, 0)
    assert _admitted(spark, index) == {1, 2}
    # and a genuinely new epoch still dedups against epoch 0
    batch2 = spark.createDataFrame(
        [(7, _BASE + " omega"), (8, "brand new words never seen anywhere before today honestly")],
        "doc_id long, text string",
    )
    sink(batch2, 1)
    assert _admitted(spark, index) == {1, 2, 8}


def test_neardup_stream_rejects_mismatched_index_params(spark, tmp_path):
    """Resuming an index with different LSH parameters must RAISE —
    probing an incompatible band format matches nothing and would
    silently admit near-dups of indexed docs."""
    import pytest

    from chicago_business_owners_data_engineering_spark.streaming.jobs import (
        foreach_batch_neardup_dedup,
    )

    index = tmp_path / "meta_index"
    batch = spark.createDataFrame([(1, _BASE)], "doc_id long, text string")
    foreach_batch_neardup_dedup(str(index))(batch, 0)
    other = foreach_batch_neardup_dedup(str(index), num_hashes=16, band_size=4)
    with pytest.raises(ValueError, match="incompatible band format"):
        other(spark.createDataFrame([(2, _OTHER)], "doc_id long, text string"), 1)


def test_neardup_stream_dup_storm_fallback(spark, tmp_path):
    """With max_driver_pairs=0 the distributed one-shot fallback runs:
    on the chain A~B, B~C, A≁C it conservatively drops BOTH B and C
    (chain-tail over-drop is the documented bounded failure mode),
    where the driver greedy admits C."""
    from chicago_business_owners_data_engineering_spark.streaming.jobs import (
        foreach_batch_neardup_dedup,
    )

    words = [f"w{i}" for i in range(12)]
    a = list(words)
    b = list(words); b[4] = "CHANGED-B"
    c = list(b);     c[9] = "CHANGED-C"
    batch = spark.createDataFrame(
        [(1, " ".join(a)), (2, " ".join(b)), (3, " ".join(c))],
        "doc_id long, text string",
    )
    index = tmp_path / "storm_index"
    foreach_batch_neardup_dedup(str(index), max_driver_pairs=0)(batch, 0)
    assert _admitted(spark, index) == {1}
