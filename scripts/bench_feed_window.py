"""Change-feed window cost curve (round 6, VERDICT r5 item 4): measure
``read_changes`` wall vs window size on one multi-commit lake, with
files-scanned evidence, plus the driver-side snapshot-walk cost in
isolation (the one O(window commits) driver term, lake.py read_changes).

The O(window) claim: feed cost is driven by the window's ``added``
manifests (files written inside the window) + a bloom-pruned probe of the
base snapshot — never O(table). So doubling the COMMIT COUNT of the window
should scale the wall roughly with the window's file/row volume, and a
1-commit window over a 100+-commit table must stay near-constant.

Usage:
    PYTHONPATH=/root/repo python scripts/bench_feed_window.py \
        [--commits 96] [--rows-per 10000] [--windows 1,8,64] [--repeat 2]

Prints one JSON line.
"""

from __future__ import annotations

import argparse
import datetime as dt
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
    ap.add_argument("--commits", type=int, default=96)
    ap.add_argument("--rows-per", type=int, default=10_000)
    ap.add_argument("--urls", type=int, default=200_000)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--windows", default="1,8,64")
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--workdir", default=f"/tmp/cdc_feedwin_{os.getpid()}")
    args = ap.parse_args()
    windows = [int(w) for w in args.windows.split(",")]
    assert max(windows) < args.commits

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from changedatacapture_spark.sinks.lake import LakeTable

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .config("spark.sql.shuffle.partitions", str(args.cores * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.executorEnv.PYTHONPATH", REPO)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(args.workdir, ignore_errors=True)

    t = LakeTable(
        os.path.join(args.workdir, "t"),
        key="url",
        n_buckets=args.buckets,
        retention_snapshots=args.commits + 2,
    )
    t0 = dt.datetime(2024, 1, 1)
    build_t0 = time.monotonic()
    for e in range(args.commits):
        # each commit: rows_per urls (cycling window over the url space so
        # windows mix inserts/updates), deterministic payload per (url, e)
        rows = (
            spark.range(args.rows_per)
            .select(
                F.concat(
                    F.lit("https://w.example/p"),
                    F.pmod(F.col("id") + e * args.rows_per // 3, F.lit(args.urls)).cast("string"),
                ).alias("url"),
                F.when(F.pmod(F.col("id") + e, F.lit(20)) == 0, "d")
                .otherwise("u")
                .alias("op"),
                (F.lit(t0) + F.make_interval(secs=F.lit(e * 100_000) + F.col("id"))).alias(
                    "warc_ts"
                ),
                (F.lit(e) * args.rows_per + F.col("id")).alias("pos"),
                (F.pmod(F.col("id") + e, F.lit(20)) == 0).cast("int").alias("is_deleted"),
                F.concat(F.lit("v"), F.col("id"), F.lit("-"), F.lit(e)).alias("val"),
            )
        )
        t.merge_lww(spark, rows, epoch_id=e)
    build_sec = time.monotonic() - build_t0
    until = t.current_snapshot()["snapshot_id"]
    total_files = sum(len(v) for v in t.bucket_files().values())
    total_rows = args.commits * args.rows_per

    # files each window's `added` manifests reference (the scan volume the
    # O(window) claim predicts the wall tracks)
    def window_files(since):
        n = 0
        for sid in range(since + 1, until + 1):
            s = t.snapshot(sid)
            ref = s.get("added")
            if ref:
                n += len(t._load_manifest(ref))
        return n

    out = {
        "metric": "read_changes wall vs window size",
        "unit": "sec",
        "commits": args.commits,
        "rows_per_commit": args.rows_per,
        "total_rows": total_rows,
        "total_live_files": total_files,
        "build_sec": round(build_sec, 1),
        "windows": {},
    }
    # warmup (codegen/python workers) on the smallest window
    t.read_changes(spark, until - 1).count()
    for w in windows:
        since = until - w
        walls = []
        rows = 0
        for _ in range(args.repeat):
            tt = time.monotonic()
            df = t.read_changes(spark, since)
            rows = df.count() if df is not None else 0
            walls.append(time.monotonic() - tt)
        # driver-side snapshot walk in isolation (the O(window commits)
        # metadata term): uncached JSON loads, timed separately
        t._expired_cache = None
        mt = time.monotonic()
        for sid in range(since + 1, until + 1):
            t.snapshot(sid)
        walk_ms = (time.monotonic() - mt) * 1000
        out["windows"][str(w)] = {
            "wall_sec": round(min(walls), 3),
            "feed_rows": rows,
            "window_files_scanned": window_files(since),
            "driver_snapshot_walk_ms": round(walk_ms, 1),
        }
    shutil.rmtree(args.workdir, ignore_errors=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
