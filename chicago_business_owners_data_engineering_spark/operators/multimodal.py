"""Multimodal (binary) column handling (SURVEY.md §2.11).

Images/audio/video are opaque ``binary`` columns plus a typed metadata
struct. The container ships no codec libraries, so the *decode* step is
a clearly-marked stub (deterministic fake) — but every Spark-side piece
is real: binary column construction, typed metadata schema, Arrow-batch
``mapInPandas`` plumbing with bounded batch sizes, and partition-safe
feature extraction.

The ``documents`` table stands in for a media table: ``text`` bytes play
the payload; the same plumbing applies unchanged to real JPEG/WAV bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

# Schema the decode stub would produce for real media.
DECODED_SCHEMA = (
    "doc_id long, media_type string, byte_len long, "
    "width int, height int, n_frames int, checksum string"
)


def decode_media(payload: bytes, media_type: str) -> dict:
    """STUB — media decoding is not available in this environment.

    A real deployment plugs pillow/ffmpeg here. The deterministic fake
    below derives pseudo-dimensions from the payload bytes so the
    pipeline around it (schema, batching, partitioning) is fully
    exercised and testable.
    """
    if media_type not in ("image", "audio", "video", "text"):
        raise NotImplementedError(f"no decoder for media_type={media_type!r}")
    h = 0
    for byt in payload[:64]:
        h = (h * 131 + byt) % 100000
    return {
        "width": 64 + h % 1024,
        "height": 64 + (h // 7) % 1024,
        "n_frames": 1 + h % 32,
    }


@query(
    "mm01_binary_metadata",
    oracle="""
    SELECT doc_id,
           OCTET_LENGTH(CAST(text AS BLOB)) AS byte_len,
           MD5(text) AS checksum,
           'text' AS media_type
    FROM documents
    """,
)
def mm01_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column + typed metadata, all native.

    Payload bytes → length + checksum + modality tag. At scale this is
    the manifest pass over a media lake: pure projection, no shuffle,
    and the binary column's pages are only read for these two cheap
    expressions.
    """
    documents = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return documents.select(
        "doc_id",
        F.octet_length(payload).alias("byte_len"),
        F.md5(payload).alias("checksum"),
        F.lit("text").alias("media_type"),
    )


@query("mm02_decode_features", oracle=None)  # decode stub is engine-side → rows-only check
def mm02_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode/feature-extract over mapInPandas.

    The real multimodal hot path: binary payloads stream through
    ``mapInPandas`` in bounded Arrow batches (never one row per Python
    call, never a whole partition materialized), emitting a typed
    feature row per media object. The decoder itself is the documented
    stub in :func:`decode_media`.
    """
    documents = load_table(spark, sf_dir, "documents")
    src = documents.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_media(bytes(p), "text") for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": "text",
                    "byte_len": pdf["payload"].map(len).astype("int64"),
                    "width": pd.Series([f["width"] for f in feats], dtype="int32"),
                    "height": pd.Series([f["height"] for f in feats], dtype="int32"),
                    "n_frames": pd.Series([f["n_frames"] for f in feats], dtype="int32"),
                    "checksum": [__import__("hashlib").md5(bytes(p)).hexdigest() for p in pdf["payload"]],
                }
            )
            yield out

    return src.mapInPandas(extract, schema=DECODED_SCHEMA)


@query(
    "mm03_frame_sample_plan",
    oracle="""
    SELECT doc_id, frame_idx
    FROM (
        SELECT doc_id, UNNEST(RANGE(0, GREATEST(1, CAST(FLOOR(n_chars / 100) AS BIGINT)))) AS frame_idx
        FROM documents
    )
    WHERE frame_idx % 2 = 0
    """,
)
def mm03_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plan: one row per (media, sampled frame index).

    The explode-based fan-out a video pipeline uses to schedule frame
    decodes — generated natively from metadata (duration → frame count
    → stride sample) so the expensive decode only runs on sampled
    frames. n_chars/100 stands in for a duration-derived frame count.
    """
    documents = load_table(spark, sf_dir, "documents")
    n_frames = F.greatest(F.lit(1).cast("long"), F.floor(F.col("n_chars") / 100).cast("long"))
    return (
        documents.select(
            "doc_id", F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx")
        )
        .filter(F.col("frame_idx") % 2 == 0)
    )


@query(
    "mm04_arrow_batch_stats",
    oracle="""
    SELECT doc_id,
           OCTET_LENGTH(CAST(text AS BLOB)) AS byte_len,
           OCTET_LENGTH(CAST(text AS BLOB)) % 256 AS first_tile
    FROM documents
    """,
)
def mm04_arrow_batch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the zero-copy tier below mapInPandas.

    For pure-bytes work (media codecs, tokenizers with Arrow bindings)
    the pandas conversion in mapInPandas is overhead — mapInArrow hands
    the raw Arrow RecordBatch to Python and takes one back, no Series
    materialization. The computation here (payload length + a fake
    tile selector) is deliberately trivial and deterministic so the
    Arrow path itself is what's oracle-checked; a real decoder slots
    into the same batch loop.
    """
    import pyarrow as pa

    documents = load_table(spark, sf_dir, "documents")
    src = documents.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))

    def batch_stats(batches):
        for batch in batches:
            ids = batch.column("payload")
            lens = pa.compute.binary_length(ids).cast(pa.int64())
            # pyarrow.compute has no mod kernel; subtract(l, 256*(l//256))
            tiles = pa.compute.subtract(
                lens,
                pa.compute.multiply(
                    pa.compute.divide(lens, pa.scalar(256, pa.int64())), pa.scalar(256, pa.int64())
                ),
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column("doc_id"), lens, tiles],
                names=["doc_id", "byte_len", "first_tile"],
            )

    return src.mapInArrow(batch_stats, schema="doc_id long, byte_len long, first_tile long")


SHARD_BUDGET_BYTES = 4000


def shard_id_over(partition_cols: tuple[str, ...], budget: int = SHARD_BUDGET_BYTES):
    """Byte-budget shard id: ``floor(bytes_before_this_doc / budget)``.

    The single definition of the shard-assignment rule — mm05 and the
    curation pipeline's stage 5 both use it, so a budget or ordering
    change can't silently diverge the pipeline from the operator it
    composes. Prefix sums run per partition-key group ordered by
    doc_id (append-stable: new docs only extend the tail).
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*partition_cols)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bytes_before = F.sum("n_chars").over(w) - F.col("n_chars")
    return F.floor(bytes_before / float(budget))


@query(
    "mm05_shard_manifest",
    oracle=f"""
    SELECT doc_id, source,
           CAST(FLOOR((SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - n_chars) / {SHARD_BUDGET_BYTES}.0) AS BIGINT) AS shard_id
    FROM documents
    """,
)
def mm05_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-budget shard assignment — the webdataset-style shard planner.

    Media-training pipelines pack payloads into fixed-size shards
    (~N MB of tar/parquet per file) so a training job streams whole
    shards sequentially. The planner is a running byte sum per source
    (ordered by doc_id for determinism), with a document assigned to
    ``floor(bytes_before_it / budget)`` — documents never split across
    shards and shard boundaries are stable under append (new docs only
    extend the tail). One shuffle on source; the subsequent payload
    write is ``partitionBy(source, shard_id)``. A single source bigger
    than one task's memory upgrades to the standard two-phase prefix
    sum (per-partition subtotals + broadcast offsets) — the plan shape
    the docstring of tp05 (sequence packing) shares.
    """
    documents = load_table(spark, sf_dir, "documents")
    return documents.select(
        "doc_id",
        "source",
        shard_id_over(("source",)).alias("shard_id"),
    )


RESIZE_BOX = 64  # target bounding box (square), aspect-preserving


@query("mm06_resize_batch", oracle=None)  # binary payload out → rows-only check
def mm06_resize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving batched resize — the third mapInPandas stage.

    Completes the decode → feature-extract → RESIZE → frame-sample
    multimodal quartet: payloads stream through Arrow batches, each
    "image" is scaled into a RESIZE_BOX² bounding box preserving aspect
    ratio, and the resized payload comes back as a binary column next
    to its new dimensions. The pixel work is the environment-gated stub
    (a real deployment calls pillow's ``Image.resize`` in the same
    loop); everything Spark-side — binary-in/binary-out schema, bounded
    Arrow batch shape, scale arithmetic, partition-preserving plan — is
    real and tested (aspect ratio, box fit, determinism).
    """
    documents = load_table(spark, sf_dir, "documents")
    src = documents.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                meta = decode_media(bytes(payload), "image")
                w, h = meta["width"], meta["height"]
                scale = min(RESIZE_BOX / w, RESIZE_BOX / h, 1.0)
                out_w, out_h = max(1, int(w * scale)), max(1, int(h * scale))
                # STUB resample: real code produces out_w*out_h pixels;
                # the fake keeps a deterministic byte budget instead
                body = bytes(payload)[: out_w * out_h]
                rows.append((int(doc_id), w, h, out_w, out_h, body))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "out_width", "out_height", "resized"],
            )

    return src.mapInPandas(
        resize,
        schema="doc_id long, width int, height int, out_width int, out_height int, resized binary",
    )
