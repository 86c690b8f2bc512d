"""Multimodal columns for training-data pipelines: image/audio/video as
opaque ``binary`` columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

The decode step itself is STUBBED (this container has no image/audio
libraries): :func:`decode_image_meta` tries Pillow behind an import-guard and
otherwise falls back to a deterministic header sniff, and
:func:`resize_images` / :func:`sample_video_frames` raise
``NotImplementedError`` unless the optional deps are present. The Spark-side
plumbing — schema, batch iteration, partition sizing — is real and tested
(tests/test_multimodal.py).

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


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize stage — requires Pillow (unavailable in this container).
    The signature/schema is the real contract; the body is gated."""
    try:  # pragma: no cover
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "resize_images needs Pillow; install it on the cluster image "
            "(the mapInPandas plumbing mirrors decode_image_meta)"
        ) from e
    raise NotImplementedError("wire the Pillow resize into a mapInPandas batch fn")


def sample_video_frames(df: DataFrame, every_n_seconds: float) -> DataFrame:
    """Frame sampling stage — requires a video decoder (unavailable here)."""
    raise NotImplementedError(
        "sample_video_frames needs a video decoder (e.g. PyAV); the batch "
        "shape follows decode_image_meta"
    )
