"""Structured Streaming driver: binlog tail → lake MERGE, exactly-once,
checkpoint-resumable (SURVEY.md §7 step 6; replaces reference pipeline steps
EP1.2-8 / the consumer loops S1-S4 with one ``StreamingQuery``).

Shape:

    readStream(segments) → withWatermark(warc_ts) → foreachBatch(apply)

``apply`` per micro-batch:
  1. parse envelope, drop tombstones (operators.envelope)
  2. per-key LWW winners, salted when the batch is skewed (operators.lww/skew)
  3. schema evolution: promote new ``extra`` keys to columns (operators.evolution)
  4. pages MERGE (sinks.lake.merge_lww) — idempotent per epoch
  5. derived chunks: re-chunk upserted urls, drop deleted urls' chunks
     (functions.transform + sinks.lake.replace_keys) — idempotent per epoch
  6. lineage + throughput record (sinks.lineage)

Exactly-once: Spark's checkpoint guarantees each micro-batch is re-delivered
with the same ``epoch_id`` after a crash; both lake tables and the lineage log
de-duplicate on that id, so restart = resume with no duplicate or lost
upserts. ``Trigger.AvailableNow`` replays a bounded log and stops (the
Debezium snapshot+tail analogue); ``processingTime`` tails a growing one.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import transform
from ..operators import apply as apply_ops
from ..operators import envelope, evolution, skew
from ..sinks.lake import LakeTable
from ..sinks.lineage import LineageLog, partition_lineage


class CdcPipeline:
    def __init__(
        self,
        base_dir: str,
        *,
        n_buckets: int = 16,
        salt_buckets: int | None = None,
        auto_salt: bool = False,
        with_chunks: bool = True,
        with_embeddings: bool = False,
        embed_fn=None,
        watermark: str = "30 minutes",
        compact_every: int | None = None,
    ):
        self.pages = LakeTable(os.path.join(base_dir, "pages"), key="url", n_buckets=n_buckets)
        self.chunks = LakeTable(os.path.join(base_dir, "chunks"), key="url", n_buckets=n_buckets)
        self.lineage = LineageLog(os.path.join(base_dir, "lineage"))
        self.salt_buckets = salt_buckets
        self.auto_salt = auto_salt
        self.with_chunks = with_chunks
        self.with_embeddings = with_embeddings
        self.embed_fn = embed_fn
        self.watermark = watermark
        self.compact_every = compact_every
        self.metrics: list[dict] = []

    # -- the foreachBatch body -------------------------------------------------

    def apply_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        t0 = time.monotonic()
        phases: dict[str, float] = {}

        def mark(name: str, since: list[float]) -> None:
            now = time.monotonic()
            phases[name] = round(now - since[0], 3)
            since[0] = now

        tick = [t0]
        spark = batch_df.sparkSession
        parsed = envelope.parse_envelope(batch_df)

        # pass 1 (cheap partial-agg over the raw scan): per-partition lineage;
        # its sum is the batch row count — no separate count() pass, no cache
        # of the raw events
        lin_rows = partition_lineage(parsed, epoch_id).collect()
        mark("lineage", tick)
        rows_in = sum(r["rows_in"] for r in lin_rows)
        if rows_in == 0:
            return

        salt = self.salt_buckets
        if salt is None and self.auto_salt:
            # note: the max_by LWW reduction partially aggregates map-side, so
            # a hot url already collapses to ≤1 row per map partition before
            # the shuffle; explicit salting only pays when single-url state
            # within a map partition is itself the bottleneck. Off by default.
            salt = skew.choose_salt_buckets(parsed)

        # pass 2: LWW winners (the only per-event shuffle), materialized
        # BEFORE the transform — fusing ArrowEvalPython onto the sort-
        # aggregate output anti-scales badly at high thread counts (measured
        # 8× at 32 threads); on cached winners the UDF stage scales cleanly
        winners_raw = apply_ops.upsert_deltas(parsed, salt_buckets=salt)
        winners_raw.persist()
        # one fused probe job: materializes the cache AND returns the MERGE's
        # touched buckets + newly-observed evolved columns
        touched, keys = self.pages.probe_batch(winners_raw)
        mark("winners_probe", tick)
        # the per-event transform on the ~|keys| winners, not the |events|
        # raw stream
        deltas = winners_raw.withColumn(
            "text",
            F.when(
                F.col("text").isNull() & F.col("html").isNotNull(),
                transform.extract_text_udf(F.col("html")),
            ).otherwise(F.col("text")),
        )
        deltas.persist()
        try:
            # schema evolution: promote newly-observed source columns
            if keys:
                deltas2 = evolution.promote_extra_columns(deltas, keys)
            else:
                deltas2 = deltas.drop("extra")

            snap = self.pages.merge_lww(
                spark, deltas2, epoch_id=epoch_id, touched_buckets=touched
            )
            mark("merge", tick)
            pages_replayed = snap is None  # pages already committed this epoch
            if pages_replayed and not self.with_chunks:
                return

            # IMPORTANT: even when the pages table already has this epoch
            # (restart replay), the chunks table may not — a crash between the
            # two commits must not lose the chunks epoch. replace_keys is
            # itself idempotent, so re-attempting is safe either way.
            if self.with_chunks:
                upserted = deltas2.where(F.col("is_deleted") == 0).select("url", "text")
                new_chunks = transform.chunk_pages(
                    upserted, with_embeddings=self.with_embeddings, embed_fn=self.embed_fn
                )
                all_keys = deltas2.select("url")
                self.chunks.replace_keys(spark, new_chunks, all_keys, epoch_id=epoch_id)
                mark("chunks", tick)

            if pages_replayed:
                return  # lineage/metrics were already recorded for this epoch

            wall_ms = int((time.monotonic() - t0) * 1000)
            # driver-side pyarrow write: no Spark job for ~64 tiny rows
            self.lineage.record_rows(
                lin_rows,
                epoch_id,
                snapshot_id=snap["snapshot_id"],
                rows_applied=rows_in,
                wall_ms=wall_ms,
            )
            # periodic maintenance: bound small files / aged tombstones
            # (tombstone horizon = the watermark — older events can no longer
            # arrive, so their tombstones are safe to drop)
            if self.compact_every and (epoch_id + 1) % self.compact_every == 0:
                self.pages.compact(spark)
                if self.with_chunks:
                    self.chunks.compact(spark)
                mark("compact", tick)

            self.metrics.append(
                {
                    "epoch": epoch_id,
                    "rows": rows_in,
                    "wall_ms": wall_ms,
                    "salted": bool(salt),
                    "end_mono": time.monotonic(),
                    "phases": phases,
                }
            )
        finally:
            deltas.unpersist()
            winners_raw.unpersist()

    # -- run -------------------------------------------------------------------

    def run_stream(
        self,
        spark: SparkSession,
        segments_dir: str,
        checkpoint_dir: str,
        *,
        max_files_per_trigger: int | None = None,
        available_now: bool = True,
        timeout_sec: float | None = None,
    ):
        src = envelope.read_segments_stream(spark, segments_dir, max_files=max_files_per_trigger)
        stream = (
            src.withColumn(
                "_event_time", F.coalesce(F.col("after.warc_ts"), F.col("before.warc_ts"))
            )
            .withWatermark("_event_time", self.watermark)
            .drop("_event_time")
        )
        writer = stream.writeStream.foreachBatch(self.apply_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime="5 seconds")
        query = writer.start()
        if available_now:
            query.awaitTermination(timeout_sec)
        return query

    def run_batch(self, spark: SparkSession, segments_dir: str) -> None:
        """Bounded replay without the streaming machinery (EP3 bootstrap —
        identical code path, one epoch)."""
        df = envelope.read_segments(spark, segments_dir)
        self.apply_batch(df, epoch_id=0)
