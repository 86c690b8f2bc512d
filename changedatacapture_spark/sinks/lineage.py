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

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_lineage(parsed: DataFrame, epoch_id: int) -> DataFrame:
    """Per input partition: row count and source offset (pos) range."""
    return (
        parsed.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(
            F.count("*").alias("rows_in"),
            F.min("pos").alias("min_pos"),
            F.max("pos").alias("max_pos"),
            F.collect_set("src_file").alias("files"),
        )
        .select(
            F.lit(epoch_id).cast("long").alias("epoch_id"),
            F.col("_pid").alias("partition_id"),
            "rows_in",
            "min_pos",
            "max_pos",
            "files",
        )
    )


class LineageLog:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

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
