"""The per-event transform as vectorized pandas/Arrow UDFs.

Reference pipeline (EP1 step 7, SURVEY.md §3): fetch row → ``chunk_by_sections``
(main.py:105-159) → embed each chunk (main.py:1071) → build vector records
(main.py:1074-1086). The reference runs this per-row in Python over an HTTP
hop; here the same math runs inside the Spark job as Arrow-batched pandas UDFs
(no per-row Python at the Spark API level, per BASELINE.json input_hint), and
the 1-row→N-chunks UDTF shape (main.py:806-820) becomes
``posexplode(chunk_udf(text))``.

Byte-identity contract: ``extract_text_udf`` ≡ ``oracle.html_to_text`` and
``chunk_udf`` ≡ ``oracle.chunk_by_sections`` element-wise — pinned by
tests/test_transform_parity.py.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .. import oracle
from ..schemas import CHUNK_ARRAY


@pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """binary html → extracted text (oracle.html_to_text, byte-identical)."""
    return html.map(lambda b: None if b is None else oracle.html_to_text(bytes(b)))


@pandas_udf(CHUNK_ARRAY)
def chunk_udf(text: pd.Series) -> pd.Series:
    """text → array<struct> of section chunks (oracle.chunk_by_sections).

    Field names follow the reference chunk record (main.py:810-820) with
    ``section``→``section_title`` and ``size``→``chunk_size`` renames used by
    the sink table.
    """

    def one(t):
        if t is None:
            return None
        return [
            {
                "section_title": c["section"],
                "content": c["content"],
                "chunk_size": c["size"],
                "start_index": c["start_index"],
                "end_index": c["end_index"],
            }
            for c in oracle.chunk_by_sections(t)
        ]

    return text.map(one)


EMBED_DIM = 384  # reference: all-MiniLM-L6-v2, 384-dim (main.py:1155-1160)


@pandas_udf(T.ArrayType(T.FloatType()))
def embed_stub_udf(content: pd.Series) -> pd.Series:
    """Deterministic stand-in for the embedding model (main.py:45 — weights
    are unavailable offline; SURVEY.md §7 declares this a pluggable vectorized
    stage). md5(content) seeds a fixed linear-congruential expansion into a
    unit-norm 384-dim float vector — stable across processes and platforms.
    """

    def one(t):
        if t is None:
            return None
        digest = hashlib.md5(t.encode("utf-8")).digest()
        seed = np.frombuffer(digest, dtype=np.uint64)
        rng = np.random.Generator(np.random.Philox(key=seed))
        v = rng.standard_normal(EMBED_DIM).astype(np.float32)
        n = np.linalg.norm(v)
        return (v / n if n else v).tolist()

    return content.map(one)


def content_hash_col(col: str = "text") -> F.Column:
    """md5 content hash for change-skip / idempotency keys
    (incremental_pinecone_updater.py:139-141) — JVM-side built-in, no UDF."""
    return F.md5(F.encode(F.col(col), "utf-8"))


def extract_pages(df: DataFrame) -> DataFrame:
    """html:binary → text:string on a pages-shaped DataFrame."""
    return df.withColumn("text", extract_text_udf(F.col("html")))


def chunk_pages(pages: DataFrame, with_embeddings: bool = False) -> DataFrame:
    """pages(url, text, ...) → chunks table (1 row per section chunk).

    Deterministic chunk ids ``{url}_chunk_{index}`` replace the reference's
    uuid4 ids (main.py:909) — uuids break idempotent replay (SURVEY.md §2.8
    F7), so the engine derives the sink key from (url, chunk_index).
    """
    chunks = (
        pages.select("url", F.posexplode(chunk_udf(F.col("text"))).alias("chunk_index", "c"))
        .select(
            "url",
            F.col("chunk_index").cast("int").alias("chunk_index"),
            F.col("c.section_title").alias("section_title"),
            F.col("c.content").alias("content"),
            F.col("c.chunk_size").alias("chunk_size"),
            F.col("c.start_index").alias("start_index"),
            F.col("c.end_index").alias("end_index"),
        )
        .withColumn("chunk_id", F.concat_ws("_chunk_", F.col("url"), F.col("chunk_index")))
    )
    if with_embeddings:
        chunks = chunks.withColumn("embedding", embed_stub_udf(F.col("content")))
    return chunks
