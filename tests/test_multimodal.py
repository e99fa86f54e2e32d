"""Multimodal binary-column plumbing (X21): schema, Arrow batching, stub codec."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_lakehouse_medallion_pipeline_spark.operators import multimodal


def test_wrap_as_media_schema(documents):
    media = multimodal.wrap_as_media(documents.limit(10), "doc_id", "text", kind="image")
    assert [f.name for f in media.schema.fields] == [
        "media_id", "kind", "blob", "mime", "byte_len",
    ]
    rows = media.collect()
    assert all(r["byte_len"] == len(bytes(r["blob"])) for r in rows)
    assert all(r["kind"] == "image" for r in rows)


def test_extract_image_features_deterministic(documents):
    media = multimodal.wrap_as_media(documents.limit(30), "doc_id", "text")
    a = sorted(map(tuple, multimodal.extract_image_features(media).collect()))
    b = sorted(map(tuple, multimodal.extract_image_features(media).collect()))
    assert a == b
    assert len(a) == 30
    for r in a:
        mid, w, h, c, luma = r
        assert 64 <= w < 64 + 1024 and 64 <= h < 64 + 1024
        assert c == 3
        assert 0.0 <= float(luma) < 256.0


def test_sample_frames_bounds(documents):
    media = multimodal.wrap_as_media(documents.limit(10), "doc_id", "text", kind="video")
    frames = multimodal.sample_frames(media, every_n_bytes=64, max_frames=3)
    rows = frames.collect()
    per_media: dict[int, int] = {}
    for r in rows:
        per_media[r["media_id"]] = per_media.get(r["media_id"], 0) + 1
        assert len(bytes(r["frame_blob"])) <= 64
    assert all(1 <= n <= 3 for n in per_media.values())
    assert len(per_media) == 10


def test_resize_images_shapes(spark, documents):
    from spark_lakehouse_medallion_pipeline_spark.operators import multimodal

    media = multimodal.wrap_as_media(documents.limit(20), "doc_id", "text", kind="image")
    out = multimodal.resize_images(media, width=32, height=16).collect()
    assert len(out) == 20
    for r in out:
        assert (r["width"], r["height"]) == (32, 16)
        assert len(r["blob"]) == (32 * 16) // 8


def test_binary_file_source_feeds_media_pipeline(spark, tmp_path):
    """binaryFile ingestion -> typed media schema -> mapInPandas features."""
    from spark_lakehouse_medallion_pipeline_spark.sources.io import read_binary_files

    blobs = {"a.bin": b"\x89fakeimg" + b"x" * 100, "b.bin": b"\x89fakeimg" + b"y" * 7}
    for name, payload in blobs.items():
        (tmp_path / name).write_bytes(payload)

    files = read_binary_files(spark, str(tmp_path), glob="*.bin")
    assert set(files.columns) == {"path", "modificationTime", "length", "content"}
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in files.collect()}
    assert rows["a.bin"]["length"] == len(blobs["a.bin"])
    assert bytes(rows["b.bin"]["content"]) == blobs["b.bin"]

    media = multimodal.wrap_as_media(
        files.select(F.expr("length").alias("file_id"), "content"),
        "file_id",
        "content",
        kind="image",
    )
    feats = multimodal.extract_image_features(media).collect()
    assert len(feats) == 2
