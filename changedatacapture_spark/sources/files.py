"""File-folder sources (reference S8/S9, SURVEY.md §2.1).

The reference globs ``*.txt`` and loads whole files (ingest_data.py:54-75)
and accepts byte uploads it utf-8-decodes (main.py:694-729). Spark-side these
are the ``text``/``binaryFile`` readers; both land in the page shape so the
batch-bootstrap path (EP3) can ingest raw corpora with the same transform
pipeline as the CDC feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_folder(spark: SparkSession, path: str, glob: str = "*.txt") -> DataFrame:
    """Whole-file text documents: (url=file path, text=content)."""
    df = spark.read.text(f"{path}/{glob}", wholetext=True)
    return df.select(
        F.input_file_name().alias("url"),
        F.col("value").alias("text"),
    )


def read_binary_folder(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Binary uploads: (url=file path, html=bytes, warc_ts=mtime). The
    utf-8 decode (main.py:699-700) happens in the transform UDF, not here —
    blobs stay opaque until the Arrow batch."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    return df.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
    )
