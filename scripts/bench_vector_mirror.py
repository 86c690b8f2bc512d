"""Vector-mirror sync cost vs consumer-lag window (round 6 part 2): measure
one ``VectorFeedMirror.sync`` wall at several window sizes on one
multi-commit chunks lake — the downstream vector-store consumer's steady
regime. The apply is claimed O(window members) with an append-only index
write (PLANS.md round-6 section); this script puts numbers on it:

- per window size W: bootstrap at commit (tip − W) via the pinned-snapshot
  resync (untimed), then time ONE sync covering the last W commits;
- report feed rows applied, index delta files written, wall.

Usage:
    PYTHONPATH=/root/repo python scripts/bench_vector_mirror.py \
        [--commits 32] [--rows-per 5000] [--windows 1,8,24] [--repeat 2]

Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--commits", type=int, default=32)
    ap.add_argument("--rows-per", type=int, default=5_000)
    ap.add_argument("--urls", type=int, default=40_000)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--n-planes", type=int, default=6)
    ap.add_argument("--windows", default="1,8,24")
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument(
        "--compact-source", action="store_true",
        help="compact the source lake after the build (feed windows survive "
        "via retention_snapshots) — measures the pre-state probe at the "
        "1-file-per-bucket floor",
    )
    ap.add_argument("--workdir", default=f"/tmp/cdc_vmbench_{os.getpid()}")
    args = ap.parse_args()
    windows = [int(w) for w in args.windows.split(",")]
    assert max(windows) < args.commits

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from changedatacapture_spark.sinks.lake import LakeTable
    from changedatacapture_spark.streaming.mirror import VectorFeedMirror

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .config("spark.sql.shuffle.partitions", str(args.cores * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.executorEnv.PYTHONPATH", REPO)
        .getOrCreate()
    )
    shutil.rmtree(args.workdir, ignore_errors=True)

    def wave(epoch):
        # each commit touches rows_per urls (rotating), one member per url,
        # content (→ chunk_id, embedding) keyed by the epoch so every touch
        # is a REAL update (old chunk_id must be tombstoned via preimage)
        return (
            spark.range(args.rows_per)
            .select(
                F.concat(
                    F.lit("u"),
                    ((F.col("id") + epoch * args.rows_per) % args.urls).cast(
                        "string"
                    ),
                ).alias("url"),
                F.lit("u").alias("op"),
                F.timestamp_micros(F.lit(epoch + 1)).alias("warc_ts"),
                (F.col("id") + epoch).cast("long").alias("pos"),
                F.lit(0).cast("int").alias("chunk_index"),
            )
            .withColumn(
                "chunk_id", F.md5(F.concat("url", F.lit(f"@{epoch}")))
            )
            .withColumn("content", F.concat(F.lit(f"e{epoch}:"), "url"))
            .withColumn(
                "embedding",
                F.transform(
                    F.sequence(F.lit(1), F.lit(args.dim)),
                    lambda i: (F.xxhash64(F.col("chunk_id"), i) % 1000).cast(
                        "float"
                    )
                    / 1000.0,
                ),
            )
            .withColumn("is_deleted", F.lit(0))
        )

    t = LakeTable(
        os.path.join(args.workdir, "chunks"),
        key="url",
        n_buckets=args.buckets,
        mode="set",
        retention_snapshots=args.commits + 2,
    )
    t0 = time.time()
    for e in range(args.commits):
        t.merge_sets(spark, wave(e), epoch_id=e, pre_reduced=True)
    build_s = round(time.time() - t0, 1)
    sids = sorted(t.committed_epochs().values())
    tip = sids[-1]
    if args.compact_source:
        t.compact(spark)

    results = {}
    for w in windows:
        base = sids[-1 - w]
        best = None
        for _ in range(args.repeat):
            vm = VectorFeedMirror(
                t,
                os.path.join(args.workdir, f"ix_w{w}_{time.monotonic_ns()}"),
                n_planes=args.n_planes,
            )
            vm.resync(spark, snapshot_id=base)
            files0 = sum(len(v) for v in vm.index.table.bucket_files().values())
            s0 = time.time()
            assert vm.sync(spark) == "applied"
            wall = time.time() - s0
            files1 = sum(len(v) for v in vm.index.table.bucket_files().values())
            feed = t.read_changes(spark, base, tip, member_key="chunk_index")
            rows = feed.count() if feed is not None else 0
            if best is None or wall < best["sync_s"]:
                best = {
                    "sync_s": round(wall, 2),
                    "feed_rows": rows,
                    "index_files_written": files1 - files0,
                }
        results[f"w{w}"] = best

    out = {
        "commits": args.commits,
        "rows_per_commit": args.rows_per,
        "build_s": build_s,
        "cores": args.cores,
        "dim": args.dim,
        "windows": results,
    }
    print(json.dumps(out), flush=True)
    spark.stop()
    shutil.rmtree(args.workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
