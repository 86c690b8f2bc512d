"""Multimodal columns for training-data pipelines: image/audio/video as
opaque ``binary`` columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

Pixel/sample decode is STUBBED where this container lacks media libraries:
:func:`decode_image_meta` and :func:`resize_images` try Pillow behind an
import-guard and otherwise run a clearly-marked DETERMINISTIC FAKE (header
sniff / size-faithful sha256-keyed rasters); :func:`decode_audio_meta`
parses WAV headers FOR REAL (pure stdlib); :func:`sample_video_frames` is
always the deterministic fake (no decoder wired — a deployment swaps PyAV
into the loop). The Spark-side plumbing — schemas, mapInPandas batch
iteration, 1-row→N-frames explode cardinality, partition sizing — is real
and tested (tests/test_multimodal.py).

Scale notes: media blobs dominate row size, so the iterator-of-batches shape
(``mapInPandas``) matters — one row group streams through the Python worker
at a time instead of materializing a partition; pair with
``spark.sql.files.maxPartitionBytes`` sized so a partition of blobs fits in
worker memory, and keep metadata-only queries on the (tiny) meta columns so
parquet column pruning skips the bytes entirely.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), True),  # image | audio | video
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

META_OUT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha", T.StringType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)

_MAGIC = [
    (b"\x89PNG", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF8", "gif"),
    (b"RIFF", "riff"),
    (b"%PDF", "pdf"),
]


def _sniff(b: bytes) -> str:
    for magic, name in _MAGIC:
        if b.startswith(magic):
            return name
    return "unknown"


def decode_image_meta(df: DataFrame) -> DataFrame:
    """binary blobs → typed metadata rows. Uses Pillow when available; the
    deterministic fallback (size + sha + magic-byte format, null dims) keeps
    the pipeline runnable and testable without media libs."""
    try:  # pragma: no cover - optional dependency
        from PIL import Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in it:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["bytes"]):
                if blob is None:
                    rows.append((mid, None, None, None, None, None))
                    continue
                b = bytes(blob)
                w = h = None
                fmt = _sniff(b)
                if have_pil:  # pragma: no cover
                    try:
                        from PIL import Image

                        img = Image.open(io.BytesIO(b))
                        w, h = img.size
                        fmt = (img.format or fmt).lower()
                    except Exception:
                        pass
                rows.append((mid, len(b), hashlib.sha256(b).hexdigest(), fmt, w, h))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_bytes", "sha", "format", "width", "height"]
            )

    return df.select("media_id", "bytes").mapInPandas(batches, META_OUT_SCHEMA)


AUDIO_OUT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("bits_per_sample", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def _parse_wav(b: bytes):
    """Real RIFF/WAVE header parse (pure stdlib — no media libs needed):
    walk chunks for fmt (channels/rate/bits) and data (payload size), derive
    duration. Returns None for non-WAV / truncated input."""
    import struct

    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    channels = rate = bits = data_size = None
    off = 12
    while off + 8 <= len(b):
        cid = b[off : off + 4]
        (size,) = struct.unpack("<I", b[off + 4 : off + 8])
        body = b[off + 8 : off + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            _, channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data_size = size
        off += 8 + size + (size & 1)  # chunks are word-aligned
    if channels is None or not rate:
        return None
    dur_ms = None
    if data_size is not None and channels and bits:
        bytes_per_sec = rate * channels * (bits // 8)
        if bytes_per_sec:
            dur_ms = int(data_size * 1000 / bytes_per_sec)
    return channels, rate, bits, dur_ms


def decode_audio_meta(df: DataFrame) -> DataFrame:
    """Audio blobs → typed metadata. WAV headers are parsed FOR REAL (pure
    stdlib RIFF walk — channels, sample rate, bit depth, duration); other
    containers fall back to the magic-byte sniff with null audio fields."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["bytes"]):
                if blob is None:
                    rows.append((mid, None, None, None, None, None, None))
                    continue
                b = bytes(blob)
                wav = _parse_wav(b)
                if wav is not None:
                    ch, rate, bits, dur = wav
                    rows.append((mid, len(b), "wav", ch, rate, bits, dur))
                else:
                    rows.append((mid, len(b), _sniff(b), None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_bytes", "format", "channels",
                    "sample_rate", "bits_per_sample", "duration_ms",
                ],
            )

    return df.select("media_id", "bytes").mapInPandas(batches, AUDIO_OUT_SCHEMA)


RESIZE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("format", T.StringType(), True),
    ]
)

_FAKE_MAGIC = b"FAKEIMG1"  # clearly-marked deterministic stand-in payloads


def _fake_resize(b: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for the pixel decode+resample: a marked header
    plus sha256(b)-keyed bytes of exactly width*height*3 — stable across
    workers/runs, size-faithful to an RGB raster, and obviously not a real
    image."""
    need = width * height * 3
    key = hashlib.sha256(b).digest()
    body = (key * (need // len(key) + 1))[:need]
    return _FAKE_MAGIC + width.to_bytes(4, "big") + height.to_bytes(4, "big") + body


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize via ``mapInPandas`` (iterator-of-batches: one row group of
    blobs streams through the worker at a time). Pillow does the real
    resample when present; otherwise the DETERMINISTIC FAKE above keeps the
    Spark-side contract — schema, batch shape, output size ∝ width·height —
    real and testable in a media-lib-free container."""
    try:  # pragma: no cover - optional dependency
        from PIL import Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in it:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["bytes"]):
                if blob is None:
                    rows.append((mid, None, None, None, None))
                    continue
                b = bytes(blob)
                if have_pil:  # pragma: no cover
                    try:
                        from PIL import Image

                        img = Image.open(io.BytesIO(b)).resize((width, height))
                        out = io.BytesIO()
                        img.save(out, format="PNG")
                        rows.append((mid, out.getvalue(), width, height, "png"))
                        continue
                    except Exception:
                        pass
                rows.append((mid, _fake_resize(b, width, height), width, height, "fake-rgb"))
            yield pd.DataFrame(
                rows, columns=["media_id", "bytes", "width", "height", "format"]
            )

    return df.select("media_id", "bytes").mapInPandas(batches, RESIZE_OUT_SCHEMA)


FRAME_OUT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_index", T.IntegerType(), True),
        T.StructField("ts_ms", T.LongType(), True),
        T.StructField("frame_bytes", T.BinaryType(), True),
    ]
)


def sample_video_frames(df: DataFrame, every_n_seconds: float) -> DataFrame:
    """Frame sampling: 1 blob row → N frame rows (the UDTF batch shape) via
    ``mapInPandas``. The frame payloads are ALWAYS the DETERMINISTIC FAKE
    (no video decoder is wired yet — swapping PyAV into the inner loop is the
    deployment TODO; unlike resize_images there is no silent real-lib branch,
    so installing PyAV cannot change behavior unnoticed). Duration comes from
    ``meta['duration_s']`` (fallback: 1 s per 10 KB); the explode
    cardinality, schema, and ordering are the real contract and are tested."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            metas = pdf["meta"] if "meta" in pdf.columns else [None] * len(pdf)
            for mid, blob, meta in zip(pdf["media_id"], pdf["bytes"], metas):
                if blob is None:
                    continue
                b = bytes(blob)
                dur = None
                if meta is not None and "duration_s" in meta:
                    try:
                        dur = float(meta["duration_s"])
                    except (TypeError, ValueError):
                        dur = None
                if dur is None:
                    dur = len(b) / 10_000.0  # fake: 1 s per 10 KB
                t = 0.0
                i = 0
                while t <= dur:
                    ts_ms = int(t * 1000)
                    payload = hashlib.sha256(b + ts_ms.to_bytes(8, "big")).digest()
                    rows.append((mid, i, ts_ms, _FAKE_MAGIC + payload))
                    i += 1
                    t += every_n_seconds
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_index", "ts_ms", "frame_bytes"]
            )

    cols = ["media_id", "bytes"] + (["meta"] if "meta" in df.columns else [])
    return df.select(*cols).mapInPandas(batches, FRAME_OUT_SCHEMA)
