"""Multimodal (image/audio/video) column plumbing (LLM-pipeline extension).

Design: media payloads are opaque ``binary`` columns carried next to a typed
metadata struct — the lakehouse pattern for multimodal pre-training data. The
Spark-side plumbing (schemas, batch iteration, partition sizing, UDF signatures)
is real and tested; the codec inner loops are STUBBED with deterministic fakes
because no image/audio library ships in this container — swap ``_decode_*_stub``
for Pillow/libav calls in production (each is clearly marked).

Why ``mapInPandas``: decode/resize/frame-sample are per-row CPU-bound transforms
over large binary cells. ``mapInPandas`` streams Arrow batches through Python
with bounded memory (no full-partition materialization), preserves partitioning
(no shuffle), and lets one Python worker pipeline per core. Batch size is
governed by ``spark.sql.execution.arrow.maxRecordsPerBatch`` — for multi-MB
payloads set it low (e.g. 64) so a batch stays under a few hundred MB.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),  # opaque encoded payload
        StructField("format", StringType(), True),  # jpeg | png | wav | mp4 ...
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("size_bytes", LongType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("format", StringType(), True),
        StructField("size_bytes", LongType(), True),
        StructField("content_sha256", StringType(), True),
        StructField("feature", StringType(), True),  # placeholder embedding digest
    ]
)


def _decode_image_stub(content: bytes | None) -> dict:
    """STUB — production: ``PIL.Image.open(io.BytesIO(content))``.

    Deterministic fake: derives pseudo-features from a content digest so tests
    are stable and the Arrow plumbing is exercised end-to-end.
    """
    if content is None:
        return {"content_sha256": None, "feature": None}
    digest = hashlib.sha256(content).hexdigest()
    return {"content_sha256": digest, "feature": f"feat_{digest[:16]}"}


def extract_image_features(media: DataFrame) -> DataFrame:
    """Decode + featurize image rows via Arrow-batched ``mapInPandas``.

    The generator signature is the real contract: it must iterate input batches
    lazily and yield output batches — that is what keeps memory bounded when
    cells are multi-megabyte images.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["content"].map(_decode_image_stub)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": pdf["format"],
                    "size_bytes": pdf["size_bytes"],
                    "content_sha256": decoded.map(lambda d: d["content_sha256"]),
                    "feature": decoded.map(lambda d: d["feature"]),
                }
            )

    return media.filter(F.col("modality") == "image").mapInPandas(
        run, schema=IMAGE_FEATURES_SCHEMA
    )


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize plumbing: same media schema out, content re-encoded, metadata
    (width/height/size_bytes) updated — the shape of a pre-training image
    normalization pass. Partitioning is preserved (no shuffle); memory stays
    bounded by the Arrow batch size.

    The resample inner loop is the STUB (production:
    ``PIL.Image.resize`` + re-encode); the fake is deterministic — content is
    digest-tagged, dimensions scale so max(width, height) == max_side with
    aspect preserved (never upscaled).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()

            def scale(w, h):
                if pd.isna(w) or pd.isna(h):  # Arrow nulls surface as NaN here
                    return None, None
                if max(w, h) <= max_side:
                    return int(w), int(h)
                f = max_side / max(w, h)
                return max(1, round(w * f)), max(1, round(h * f))

            dims = [scale(w, h) for w, h in zip(pdf["width"], pdf["height"])]
            # STUB — production: decode, resize, re-encode via Pillow.
            pdf["content"] = [
                None if c is None else b"resized:" + hashlib.sha256(c).digest()
                for c in pdf["content"]
            ]
            pdf["width"] = pd.array([d[0] for d in dims], dtype="Int32")
            pdf["height"] = pd.array([d[1] for d in dims], dtype="Int32")
            pdf["size_bytes"] = pd.array(
                [None if c is None else len(c) for c in pdf["content"]], dtype="Int64"
            )
            yield pdf

    return media.filter(F.col("modality") == "image").mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-relational health stats over the media table (no decode)."""
    return (
        media.groupBy("modality", "format")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("size_bytes").alias("total_bytes"),
            F.avg("size_bytes").alias("avg_bytes"),
            F.max("size_bytes").alias("max_bytes"),
        )
        .orderBy("modality", "format")
    )


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame timestamp.

    The timestamp grid is computed relationally (``sequence``); the actual frame
    decode is the stub (production: av/ffmpeg in ``mapInPandas`` keyed by the
    (media_id, frame_ts) grid this produces).
    """
    frames = media.filter(
        (F.col("modality") == "video") & F.col("duration_ms").isNotNull()
    ).select(
        "media_id",
        "format",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("duration_ms"), F.lit(every_ms).cast("long"))
        ).alias("frame_ts_ms"),
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # STUB — production: seek+decode the frame at frame_ts_ms via PyAV.
            pdf = pdf.copy()
            pdf["frame_key"] = [
                f"{m}@{t}" for m, t in zip(pdf["media_id"], pdf["frame_ts_ms"])
            ]
            yield pdf

    out_schema = StructType(
        frames.schema.fields + [StructField("frame_key", StringType(), True)]
    )
    return frames.mapInPandas(decode, schema=out_schema)
