"""Batch fold: change-event log → final table state (the op-code dispatch of
auto_gen_rag.py:165-208 / incremental_pinecone_updater.py:204-296 as one
declarative plan).

Used two ways:
- one-shot replay (batch bootstrap, EP3 in SURVEY.md §3);
- inside ``foreachBatch`` as the per-micro-batch reduction before the MERGE
  (sinks.lake.merge_upsert does the cross-batch part).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import lww


def _winners(parsed: DataFrame, salt_buckets: int | None) -> DataFrame:
    """LWW winners. Duplicate deliveries of the same (url, pos) need no
    separate dedup pass: max_by picks one of the identical copies, so the
    winner is byte-identical either way (dedup_deliveries exists for
    accounting, not correctness — keeping it out of the hot path saves a
    full per-event shuffle)."""
    return (
        lww.lww_winners_salted(parsed, salt_buckets) if salt_buckets else lww.lww_winners(parsed)
    )


def fold_final_state(parsed: DataFrame, salt_buckets: int | None = None) -> DataFrame:
    """Final pages state of a (complete) event log: LWW winner per url,
    deletes dropped, payload flattened. Matches oracle.fold_events under the
    snapshot-first contract."""
    winners = _winners(parsed, salt_buckets)
    return (
        winners.where(F.col("op") != "d")
        .select(
            F.col("url"),
            F.col("after.warc_ts").alias("warc_ts"),
            F.col("after.html").alias("html"),
            F.col("after.text").alias("text"),
            F.col("after.lang").alias("lang"),
            F.col("after.extra").alias("extra"),
            F.col("pos"),
            F.col("op").alias("last_op"),
        )
    )


def upsert_deltas(parsed: DataFrame, salt_buckets: int | None = None) -> DataFrame:
    """Per-micro-batch winners *including* deletes as tombstones — the MERGE
    source. Tombstones (is_deleted=1) carry their own (warc_ts, pos) so a
    late replay of an older update can't resurrect a deleted url
    (SURVEY.md §7 'cross-batch LWW with deletes')."""
    winners = _winners(parsed, salt_buckets)
    return winners.select(
        F.col("url"),
        F.col("warc_ts"),
        F.col("pos"),
        F.col("op"),
        (F.col("op") == "d").cast("int").alias("is_deleted"),
        F.col("after.html").alias("html"),
        F.col("after.text").alias("text"),
        F.col("after.lang").alias("lang"),
        F.col("after.extra").alias("extra"),
    )
