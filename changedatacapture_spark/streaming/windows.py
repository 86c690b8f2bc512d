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


def url_sessions(
    parsed: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session windows per url: consecutive events closer than ``gap`` merge
    into one session (Spark's native ``session_window`` — merging state is
    Spark-managed and, on streams, bounded by the watermark). Output:
    (url, session_start, session_end, n_events).

    The batch gate twin (queries.cdc_sessions) computes the same islands with
    lag+cumsum so the DuckDB oracle is exactly mirrorable; this function is
    the streaming-native form.
    """
    df = parsed
    if df.isStreaming:
        df = df.withWatermark("warc_ts", watermark)
    return (
        df.groupBy(F.session_window("warc_ts", gap).alias("w"), F.col("url"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "url",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
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
