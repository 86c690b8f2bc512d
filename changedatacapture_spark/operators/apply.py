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


def fold_final_state(parsed: DataFrame, salt_buckets: int | None = None) -> DataFrame:
    """Final pages state of a (complete) event log: LWW winner per url,
    deletes dropped, payload flattened. Matches oracle.fold_events under the
    snapshot-first contract."""
    deduped = lww.dedup_deliveries(parsed)
    winners = (
        lww.lww_winners_salted(deduped, salt_buckets) if salt_buckets else lww.lww_winners(deduped)
    )
    payload = F.coalesce(F.col("after"), F.col("before"))
    return (
        winners.where(F.col("op") != "d")
        .select(
            F.col("url"),
            payload.getField("warc_ts").alias("warc_ts"),
            payload.getField("html").alias("html"),
            payload.getField("text").alias("text"),
            payload.getField("lang").alias("lang"),
            payload.getField("extra").alias("extra"),
            F.col("pos"),
            F.col("op").alias("last_op"),
        )
    )


def upsert_deltas(parsed: DataFrame, salt_buckets: int | None = None) -> DataFrame:
    """Per-micro-batch winners *including* deletes as tombstones — the MERGE
    source. Tombstones (is_deleted=1) carry their own (warc_ts, pos) so a
    late replay of an older update can't resurrect a deleted url
    (SURVEY.md §7 'cross-batch LWW with deletes')."""
    deduped = lww.dedup_deliveries(parsed)
    winners = (
        lww.lww_winners_salted(deduped, salt_buckets) if salt_buckets else lww.lww_winners(deduped)
    )
    payload = F.coalesce(F.col("after"), F.col("before"))
    return winners.select(
        F.col("url"),
        F.col("warc_ts"),
        F.col("pos"),
        F.col("op"),
        (F.col("op") == "d").cast("int").alias("is_deleted"),
        payload.getField("html").alias("html"),
        payload.getField("text").alias("text"),
        payload.getField("lang").alias("lang"),
        payload.getField("extra").alias("extra"),
    )
