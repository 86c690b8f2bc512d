"""Per-micro-batch, per-partition lineage + throughput metrics
(north rule: "emits per-partition lineage records (source offsets, rows
applied, commit snapshot-id) and throughput metrics").

The reference keeps an ``update_log`` side table in SQLite
(incremental_pinecone_updater.py:41-59) and in-memory stats counters
(cdc_kafka_consumer.py:57-65). Here lineage is a parquet table appended once
per epoch; the file is named by epoch, so a replayed epoch *overwrites* its
own lineage instead of duplicating it — idempotent like the data commit.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_lineage(parsed: DataFrame, epoch_id: int) -> DataFrame:
    """Per input partition: row count and source offset (pos) range.

    Also carries the partition's max TRUNCATE order (op='t',
    QUICK_START.md:282-288) as ``t_max`` — fused here so a rare truncate
    costs no extra job on the hot path; the driver folds the per-partition
    maxima and passes the horizon to the lake commit. The micros conversion
    happens JVM-side (``unix_micros``) so the driver never touches session-
    timezone-dependent datetimes."""
    return (
        parsed.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(
            F.count("*").alias("rows_in"),
            F.min("pos").alias("min_pos"),
            F.max("pos").alias("max_pos"),
            F.collect_set("src_file").alias("files"),
            F.max(
                F.when(
                    F.col("op") == "t",
                    F.struct(
                        F.unix_micros(F.col("warc_ts")).alias("us"),
                        F.col("pos").alias("pos"),
                    ),
                )
            ).alias("t_max"),
        )
        .select(
            F.lit(epoch_id).cast("long").alias("epoch_id"),
            F.col("_pid").alias("partition_id"),
            "rows_in",
            "min_pos",
            "max_pos",
            "files",
            "t_max",
        )
    )


class LineageLog:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def has_epoch(self, epoch_id: int) -> bool:
        """True iff this epoch's lineage file was published (used by the
        replay path to backfill a record lost to a crash between the data
        commit and the lineage write — ADVICE r1)."""
        d = os.path.join(self.path, f"epoch-{epoch_id:012d}")
        return os.path.isdir(d) and any(f.endswith(".parquet") for f in os.listdir(d))

    def record_rows(
        self,
        rows: list,
        epoch_id: int,
        *,
        snapshot_id: int | None,
        rows_applied: int | None = None,
        wall_ms: int | None = None,
        rows_corrupt: int | None = None,
    ) -> None:
        """Driver-side write of already-collected lineage rows (they are tiny
        — one per input partition): a pyarrow write instead of a Spark job,
        so lineage costs no scheduler round-trip per epoch."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        table = pa.Table.from_pylist(
            [
                {
                    "epoch_id": int(epoch_id),
                    "partition_id": int(r["partition_id"]),
                    "rows_in": int(r["rows_in"]),
                    "min_pos": None if r["min_pos"] is None else int(r["min_pos"]),
                    "max_pos": None if r["max_pos"] is None else int(r["max_pos"]),
                    "files": list(r["files"] or []),
                    "snapshot_id": snapshot_id,
                    "rows_applied": rows_applied,
                    "wall_ms": wall_ms,
                    "rows_corrupt": rows_corrupt,
                }
                for r in rows
            ],
            schema=pa.schema(
                [
                    ("epoch_id", pa.int64()),
                    ("partition_id", pa.int32()),
                    ("rows_in", pa.int64()),
                    ("min_pos", pa.int64()),
                    ("max_pos", pa.int64()),
                    ("files", pa.list_(pa.string())),
                    ("snapshot_id", pa.int64()),
                    ("rows_applied", pa.int64()),
                    ("wall_ms", pa.int64()),
                    ("rows_corrupt", pa.int64()),
                ]
            ),
        )
        d = os.path.join(self.path, f"epoch-{epoch_id:012d}")
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, "_part-0.parquet.tmp")
        pq.write_table(table, tmp)
        os.replace(tmp, os.path.join(d, "part-0.parquet"))

    def record(
        self,
        lineage_df: DataFrame,
        epoch_id: int,
        *,
        snapshot_id: int | None,
        rows_applied: int | None = None,
        wall_ms: int | None = None,
    ) -> None:
        out = lineage_df.withColumn(
            "snapshot_id", F.lit(snapshot_id).cast("long")
        ).withColumn("rows_applied", F.lit(rows_applied).cast("long")).withColumn(
            "wall_ms", F.lit(wall_ms).cast("long")
        )
        out.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self.path, f"epoch-{epoch_id:012d}")
        )

    def read(self, spark) -> DataFrame | None:
        dirs = [
            os.path.join(self.path, d)
            for d in sorted(os.listdir(self.path))
            if d.startswith("epoch-")
        ]
        if not dirs:
            return None
        return spark.read.parquet(*dirs)

class DeadLetterLog:
    """Corrupt-row quarantine (VERDICT r4 item 4): rows the envelope filters
    would silently drop are parked here keyed by (epoch, segment, offset),
    raw line verbatim, instead of vanishing. The reference surfaces only
    skip COUNTERS (cdc_kafka_consumer.py:57-65); keeping the bytes makes
    the skip auditable and replayable. Written like lineage: one
    epoch-named dir overwritten idempotently, so a replayed epoch never
    duplicates its quarantine rows."""

    def __init__(self, path: str):
        self.path = path

    def record(self, batch_df: DataFrame, epoch_id: int) -> int:
        """Quarantine the batch's corrupt rows (``_corrupt_raw`` non-null —
        sources opt in via ``read_segments_jsonl(keep_corrupt=True)``).
        Returns the quarantined row count (from the written footers — no
        second Spark job)."""
        out = batch_df.where(F.col("_corrupt_raw").isNotNull()).select(
            F.lit(epoch_id).cast("long").alias("epoch_id"),
            F.col("_corrupt_src").alias("segment"),
            F.col("_corrupt_offset").cast("long").alias("offset"),
            F.col("_corrupt_raw").alias("raw"),
        )
        d = os.path.join(self.path, f"epoch-{epoch_id:012d}")
        out.write.mode("overwrite").parquet(d)
        import pyarrow.parquet as pq

        n = 0
        for fn in os.listdir(d):
            if fn.endswith(".parquet"):
                n += pq.ParquetFile(os.path.join(d, fn)).metadata.num_rows
        return n

    def read(self, spark) -> DataFrame | None:
        if not os.path.isdir(self.path):
            return None
        dirs = [
            os.path.join(self.path, d)
            for d in sorted(os.listdir(self.path))
            if d.startswith("epoch-")
        ]
        if not dirs:
            return None
        return spark.read.parquet(*dirs)

    # -- replay bookkeeping (round 6, VERDICT r5 item 6) -----------------------
    #
    # A quarantine epoch that has been repaired-and-reinjected is recorded in
    # replayed.json so a second replay call re-feeds nothing; rows a replay
    # itself re-quarantines (still unparseable after repair) get a fresh
    # REPLAY id (>= _REPLAY_BASE — a value column + dir name only, never a
    # stream epoch: stream ids belong to the checkpoint's counter) and stay
    # pending for the next repair attempt.

    _REPLAY_BASE = 1_000_000_000

    def _replayed_path(self) -> str:
        return os.path.join(self.path, "replayed.json")

    def replayed_epochs(self) -> set[int]:
        try:
            with open(self._replayed_path()) as f:
                return set(json.load(f))
        except FileNotFoundError:
            return set()

    def mark_replayed(self, epochs) -> None:
        os.makedirs(self.path, exist_ok=True)
        merged = sorted(self.replayed_epochs() | {int(e) for e in epochs})
        tmp = self._replayed_path() + f".{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump(merged, f)
        os.replace(tmp, self._replayed_path())

    def next_replay_id(self) -> int:
        """A fresh quarantine id for rows re-quarantined BY a replay —
        monotone above _REPLAY_BASE, idempotent per replay attempt (the
        attempt's record() overwrites its own dir on a crash-rerun)."""
        if not os.path.isdir(self.path):
            return self._REPLAY_BASE
        ids = [
            int(d[len("epoch-"):])
            for d in os.listdir(self.path)
            if d.startswith("epoch-") and d[len("epoch-"):].isdigit()
        ]
        return max([i for i in ids if i >= self._REPLAY_BASE] + [self._REPLAY_BASE - 1]) + 1
