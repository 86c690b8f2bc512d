"""Multimodal plumbing: binary media columns through mapInPandas metadata
extraction (decode itself stubbed — no media libs in this container)."""

import hashlib

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


def test_resize_images_deterministic_fake(spark):
    """No Pillow in this container → the clearly-marked deterministic fake:
    output payloads are size-faithful (header + w·h·3 bytes), stable across
    runs, and keyed to the input bytes."""
    df = spark.createDataFrame(_media_rows(), multimodal.MEDIA_SCHEMA)
    out = {r["media_id"]: r.asDict() for r in multimodal.resize_images(df, 8, 6).collect()}
    assert set(out) == {"m1", "m2", "m3", "m4"}
    assert out["m4"]["bytes"] is None  # null blob passes through
    b1 = bytes(out["m1"]["bytes"])
    assert b1.startswith(multimodal._FAKE_MAGIC)
    assert len(b1) == len(multimodal._FAKE_MAGIC) + 8 + 8 * 6 * 3
    assert (out["m1"]["width"], out["m1"]["height"]) == (8, 6)
    assert out["m1"]["format"] == "fake-rgb"
    # deterministic: same input → same payload; different input → different
    again = {r["media_id"]: bytes(r["bytes"]) for r in
             multimodal.resize_images(df, 8, 6).collect() if r["bytes"] is not None}
    assert again["m1"] == b1
    assert again["m2"] != b1


def test_sample_video_frames_explode_cardinality(spark):
    """1 blob row → N frame rows at the sampling interval; duration from the
    meta map when present, size-derived otherwise; ordering deterministic."""
    rows = [
        ("v1", "video", bytearray(b"x" * 100), "video/mp4", {"duration_s": "2.5"}),
        ("v2", "video", bytearray(b"y" * 50_000), "video/mp4", {}),  # 5.0 s fake
        ("v3", "video", None, None, None),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.sample_video_frames(df, 1.0).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    assert "v3" not in by_id  # null blob emits nothing
    v1 = sorted(by_id["v1"], key=lambda r: r["frame_index"])
    assert [r["ts_ms"] for r in v1] == [0, 1000, 2000]  # 0..2.5s step 1s
    assert len(by_id["v2"]) == 6  # 0..5.0s inclusive
    assert all(bytes(r["frame_bytes"]).startswith(multimodal._FAKE_MAGIC) for r in v1)
    # frame payloads keyed to (blob, ts): distinct across frames and videos
    assert len({bytes(r["frame_bytes"]) for r in out}) == len(out)


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


def test_decode_audio_meta_parses_real_wav(spark):
    """WAV headers are genuinely parsed (stdlib RIFF walk): a synthesized
    valid WAV yields exact channels/rate/bits/duration; non-WAV blobs fall
    back to the sniff with null audio fields."""
    import struct

    def make_wav(channels=2, rate=16000, bits=16, n_samples=8000):
        data = b"\x00" * (n_samples * channels * (bits // 8))
        fmt = struct.pack("<HHIIHH", 1, channels, rate,
                          rate * channels * bits // 8, channels * bits // 8, bits)
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
               + b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", len(body)) + body

    rows = [
        ("a1", "audio", bytearray(make_wav()), "audio/wav", {}),
        ("a2", "audio", bytearray(b"\xff\xd8\xffnot audio"), "image/jpeg", {}),
        ("a3", "audio", None, None, None),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {r["media_id"]: r.asDict() for r in multimodal.decode_audio_meta(df).collect()}
    a1 = out["a1"]
    assert (a1["format"], a1["channels"], a1["sample_rate"], a1["bits_per_sample"]) == (
        "wav", 2, 16000, 16,
    )
    assert a1["duration_ms"] == 500  # 8000 samples @ 16 kHz
    assert out["a2"]["format"] == "jpeg" and out["a2"]["channels"] is None
    assert out["a3"]["n_bytes"] is None
