"""spark-submit entry point: tail a binlog-segment feed into the lake.

    spark-submit --py-files dist/changedatacapture_spark.zip \
        scripts/run_pipeline.py --segments DIR --lake DIR --checkpoint DIR \
        [--tail] [--buckets N] [--max-files N] [--embeddings]
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--segments", required=True)
    ap.add_argument("--lake", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--buckets", type=int, default=1024)
    ap.add_argument("--max-files", type=int, default=None)
    ap.add_argument("--tail", action="store_true", help="keep running (processingTime trigger)")
    ap.add_argument("--embeddings", action="store_true")
    ap.add_argument("--watermark", default="30 minutes")
    ap.add_argument(
        "--compact-every", type=int, default=16,
        help="fold merge-on-read deltas every N epochs (0 disables)",
    )
    args = ap.parse_args()

    from changedatacapture_spark.streaming.driver import CdcPipeline

    spark = SparkSession.builder.appName("cdc-ingest").getOrCreate()
    pipe = CdcPipeline(
        args.lake,
        n_buckets=args.buckets,
        with_chunks=True,
        with_embeddings=args.embeddings,
        watermark=args.watermark,
        compact_every=args.compact_every or None,
    )
    query = pipe.run_stream(
        spark,
        args.segments,
        args.checkpoint,
        max_files_per_trigger=args.max_files,
        available_now=not args.tail,
        timeout_sec=None if args.tail else 24 * 3600,
    )
    if args.tail:
        query.awaitTermination()


if __name__ == "__main__":
    main()
