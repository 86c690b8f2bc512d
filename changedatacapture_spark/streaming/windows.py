"""Event-time windowed aggregations with watermarking — the Structured-
Streaming-native metrics surface (SURVEY.md §2.9: the reference has no
event-time windows; its counters are wall-clock stats,
cdc_kafka_consumer.py:57-65. The engine exposes proper event-time rollups
with bounded state).

``change_rate`` works on both batch and streaming DataFrames (same code
path); streaming input requires the watermark so Spark can drop state for
closed windows (late events beyond the watermark are excluded — the LWW MERGE
still applies them to the table, so the rollup is a monitoring view, not the
source of truth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def change_rate(
    parsed: DataFrame,
    *,
    window: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window change rates per op: (window, op, n_events, n_urls)."""
    df = parsed
    if df.isStreaming:
        df = df.withWatermark("warc_ts", watermark)
    return (
        df.groupBy(F.window("warc_ts", window).alias("w"), F.col("op"))
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct("url").alias("n_urls"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "op",
            "n_events",
            "n_urls",
        )
    )


def site_activity(parsed: DataFrame, *, window: str = "5 minutes", watermark: str = "10 minutes") -> DataFrame:
    """Per-site (url host prefix) tumbling activity — the hot-site monitoring
    view feeding skew decisions."""
    df = parsed
    if df.isStreaming:
        df = df.withWatermark("warc_ts", watermark)
    site = F.regexp_extract(F.col("url"), r"^https?://([^/]+)/", 1).alias("site")
    return (
        df.select(F.col("warc_ts"), site)
        .groupBy(F.window("warc_ts", window).alias("w"), F.col("site"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "site", "n_events")
    )
