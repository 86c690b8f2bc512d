"""Multimodal plumbing: binary media columns through mapInPandas metadata
extraction (decode itself stubbed — no media libs in this container)."""

import hashlib

import pytest

from changedatacapture_spark.functions import multimodal


def _media_rows():
    png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 64
    jpg = b"\xff\xd8\xff\xe0" + b"\x01" * 32
    blob = b"opaque-bytes" * 10
    return [
        ("m1", "image", bytearray(png), "image/png", {"src": "a"}),
        ("m2", "image", bytearray(jpg), "image/jpeg", {"src": "b"}),
        ("m3", "audio", bytearray(blob), "application/octet-stream", {}),
        ("m4", "image", None, None, None),
    ]


def test_decode_image_meta_plumbing(spark):
    df = spark.createDataFrame(_media_rows(), multimodal.MEDIA_SCHEMA)
    out = {r["media_id"]: r.asDict() for r in multimodal.decode_image_meta(df).collect()}
    assert set(out) == {"m1", "m2", "m3", "m4"}
    png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 64
    assert out["m1"]["format"] == "png"
    assert out["m1"]["n_bytes"] == len(png)
    assert out["m1"]["sha"] == hashlib.sha256(png).hexdigest()
    assert out["m2"]["format"] == "jpeg"
    assert out["m3"]["format"] == "unknown"
    assert out["m4"]["n_bytes"] is None  # null blob passes through

    # output schema is the typed contract
    assert [f.name for f in multimodal.decode_image_meta(df).schema.fields] == [
        "media_id", "n_bytes", "sha", "format", "width", "height",
    ]


def test_resize_and_frames_are_gated(spark):
    df = spark.createDataFrame(_media_rows(), multimodal.MEDIA_SCHEMA)
    with pytest.raises(NotImplementedError):
        multimodal.resize_images(df, 64, 64)
    with pytest.raises(NotImplementedError):
        multimodal.sample_video_frames(df, 1.0)


def test_metadata_query_prunes_blob_column(spark, tmp_path):
    """Metadata-only queries must not read the bytes column (column pruning
    on the parquet scan — the 100 TB property)."""
    df = spark.createDataFrame(_media_rows(), multimodal.MEDIA_SCHEMA)
    p = str(tmp_path / "media")
    df.write.parquet(p)
    meta = spark.read.parquet(p).select("media_id", "kind", "mime")
    plan = meta._sc._jvm.PythonSQLUtils.explainString(meta._jdf.queryExecution(), "formatted")
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "bytes" not in read_schema, read_schema
