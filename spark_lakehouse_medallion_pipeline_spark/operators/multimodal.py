"""Multimodal column plumbing (SURVEY.md §2b X21 / driver mandate).

Images / audio / video ride as opaque ``binary`` columns with a typed
metadata struct. The Spark-side machinery — schema, partition sizing,
Arrow-batched mapInPandas, output shapes — is real and tested; the actual
codec calls are STUBBED (this container has no image/audio libraries) with
a deterministic fake keyed on the blob bytes, clearly marked below.

Batch-shape note for 100 TB: blobs are large, so these operators must
bound ``spark.sql.files.maxPartitionBytes`` / use maxRecordsPerBatch to
keep Arrow batches in memory; decode parallelism is per-partition with no
shuffle (pipeline stays embarrassingly parallel until an aggregate).
"""

from __future__ import annotations

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
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("blob", BinaryType()),
        StructField("mime", StringType()),
        StructField("byte_len", LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("mean_luma", StringType()),  # stringified for stable hashing
    ]
)

FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_blob", BinaryType()),
    ]
)


def _fake_decode_dims(blob: bytes) -> tuple[int, int, int, float]:
    """STUB CODEC — deterministic fake 'decode' derived from blob bytes.

    A real deployment replaces this with PIL/libvips/ffmpeg; the Spark
    plumbing around it (Arrow batching, schema, partitioning) is identical.
    """
    import hashlib

    h = int.from_bytes(hashlib.md5(blob).digest()[:4], "big") & 0x7FFFFFFF
    width = 64 + (h % 1024)
    height = 64 + ((h >> 10) % 1024)
    channels = 3
    mean_luma = (h % 25600) / 100.0
    return width, height, channels, mean_luma


def wrap_as_media(df: DataFrame, id_col: str, payload_col: str, kind: str = "image") -> DataFrame:
    """Lift any binary/string column into the typed media schema."""
    blob = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        blob.alias("blob"),
        F.lit(f"application/x-fake-{kind}").alias("mime"),
        F.length(blob).cast("long").alias("byte_len"),
    )


def extract_image_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract via Arrow-batched mapInPandas.

    The UDF body receives pandas batches (vectorized transfer); per-row
    python cost is only the codec call — exactly the profile a real
    decoder would have.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_fake_decode_dims(bytes(b)) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_channels": [d[2] for d in dims],
                    "mean_luma": [f"{d[3]:.2f}" for d in dims],
                }
            )

    return media.mapInPandas(_extract, schema=IMAGE_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 256, max_frames: int = 4) -> DataFrame:
    """Frame sampling for video blobs: emit up to max_frames byte slices
    per blob (STUB — a real impl calls the demuxer). One-to-many via
    mapInPandas keeps the explode on the executor side."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                raw = bytes(blob)
                for i in range(min(max_frames, max(1, len(raw) // every_n_bytes))):
                    ids.append(mid)
                    idxs.append(i)
                    blobs.append(raw[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_blob": blobs})

    return media.mapInPandas(_sample, schema=FRAME_SAMPLE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("blob", BinaryType()),
    ]
)


def resize_images(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Resize stage (driver mandate: decode / feature-extract / RESIZE /
    frame-sample). Plumbing real — Arrow-batched mapInPandas, binary in /
    binary out, byte volume scaled to the target dims so downstream
    sizing math is honest; the pixel resample itself is STUBBED with a
    deterministic byte fold (no image libs in this container — swap
    `_fake_resize` for PIL/cv2 in production)."""

    def _fake_resize(blob: bytes) -> bytes:
        target = max(1, (width * height) // 8)
        if not blob:
            return b"\x00" * target
        reps = (target // len(blob)) + 1
        return (blob * reps)[:target]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "blob": [_fake_resize(b) for b in pdf["blob"]],
                }
            )

    return media.select("media_id", "blob").mapInPandas(fn, RESIZED_SCHEMA)
