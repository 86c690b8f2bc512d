"""spark-submit entry point: a continuous downstream feed consumer.

    spark-submit --py-files dist/changedatacapture_spark.zip \
        scripts/run_mirror.py --source LAKE/pages --mirror DIR \
        [--member-key chunk_index] [--vector-index] [--n-planes K] \
        [--poll-sec N] [--once]

Tails a LakeTable's snapshot-window change feed into a downstream replica —
a row/member LakeTable mirror (``FeedMirror``) or, with ``--vector-index``,
an :class:`IncrementalVectorIndex` maintained purely from the feed's
preimages (``VectorFeedMirror`` — the reference's Pinecone updater loop,
incremental_pinecone_updater.py:97-202). The cursor is durable in the
mirror's own commits, so restarting this process resumes exactly where it
stopped; an unservable window (vacuumed past retention, rebucketing
compact) triggers the full re-sync fallback automatically.

Runs locally too: PYTHONPATH=<repo> python scripts/run_mirror.py ...
"""

from __future__ import annotations

import argparse
import sys
import time

from pyspark.sql import SparkSession


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True, help="source LakeTable path")
    ap.add_argument("--mirror", required=True, help="mirror/index path")
    ap.add_argument("--key", default="url")
    ap.add_argument(
        "--mode", default=None, choices=("row", "set"),
        help="source table mode (default: autodetect from its snapshot)",
    )
    ap.add_argument("--buckets", type=int, default=None)
    ap.add_argument(
        "--member-key", default=None,
        help="set-mode member identity column (e.g. chunk_index)",
    )
    ap.add_argument(
        "--vector-index", action="store_true",
        help="mirror into an IncrementalVectorIndex instead of a LakeTable",
    )
    ap.add_argument("--n-planes", type=int, default=8)
    ap.add_argument("--poll-sec", type=float, default=10.0)
    ap.add_argument("--once", action="store_true", help="one sync, then exit")
    ap.add_argument(
        "--verify", action="store_true",
        help="after each sync, assert diff_vs_source == 0 (reads the source "
        "twice — audit runs, not production polls)",
    )
    args = ap.parse_args()

    spark = SparkSession.builder.appName("cdc-feed-mirror").getOrCreate()

    from changedatacapture_spark.sinks.lake import LakeTable
    from changedatacapture_spark.streaming.mirror import FeedMirror, VectorFeedMirror

    # opening by path adopts the persisted layout (n_buckets AND mode)
    source = LakeTable(
        args.source, key=args.key,
        n_buckets=args.buckets or 64, mode=args.mode or "row",
    )
    if source.current_snapshot() is None:
        print("source table has no snapshot yet", file=sys.stderr)
        sys.exit(1)
    mode = source.mode

    if args.vector_index:
        assert mode == "set", "--vector-index consumes a set-mode chunks table"
        mirror = VectorFeedMirror(
            source, args.mirror,
            member_key=args.member_key or "chunk_index",
            n_planes=args.n_planes,
        )
    else:
        mk = args.member_key or ("chunk_index" if mode == "set" else None)
        mirror = FeedMirror(source, args.mirror, member_key=mk)

    while True:
        t0 = time.time()
        status = mirror.sync(spark)
        line = f"sync={status} cursor={mirror.cursor} wall={time.time()-t0:.1f}s"
        if args.verify:
            line += f" diff_vs_source={mirror.diff_vs_source(spark)}"
        print(line, flush=True)
        if args.once:
            break
        time.sleep(args.poll_sec)


if __name__ == "__main__":
    main()
