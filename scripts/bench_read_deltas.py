"""Merge-on-read deferred-read cost: resolved-read latency vs delta-stack
depth (VERDICT r2 item 5 — 'the tradeoff is asserted, not measured').

Protocol: a pages-shaped lake (n_buckets=64, ~0.5 KB text payload) gets a
compacted 200k-url base, then D uniform update epochs of 5k urls each (every
epoch touches every bucket — the uniform-hash worst case). At each level we
measure, best-of-K with a warmup:

- full resolved read: sum(length(text)) over read() — pays the per-bucket
  LWW fold over base+deltas;
- 1-url point read via read_keys — shows the per-file bloom skipping
  keeping point latency flat while the stack deepens;
- the same reads after compact() — the deferred merge paid back.

Output: one JSON line per level on stdout; paste the table into
BENCH/BASELINE.md. Run on an otherwise idle host (CLAUDE.md: wall-clock
noise ±30%, interleave/best-of-K).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_spark(cores: int):
    from pyspark.sql import SparkSession

    os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(cores * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config(
            "spark.executorEnv.PYTHONPATH",
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        .getOrCreate()
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--base-rows", type=int, default=200_000)
    ap.add_argument("--delta-rows", type=int, default=5_000)
    ap.add_argument("--levels", default="0,8,64")
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from changedatacapture_spark.sinks.lake import LakeTable

    spark = build_spark(args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    root = f"/tmp/cdc_bench_deltas_{os.getpid()}"
    shutil.rmtree(root, ignore_errors=True)

    def mk_rows(n, offset_pos, n_urls, version):
        return (
            spark.range(0, n, 1, numPartitions=args.cores * 2)
            .select(
                F.concat(F.lit("https://x/"), F.pmod(F.xxhash64("id", F.lit(version)), F.lit(n_urls)).cast("string")).alias("url"),
                F.timestamp_micros(
                    F.lit(offset_pos).cast("long") * F.lit(1_000_000).cast("long")
                    + F.col("id")
                ).alias("warc_ts"),
                (F.lit(offset_pos) + F.col("id")).alias("pos"),
                F.lit("u").alias("op"),
                F.lit(0).alias("is_deleted"),
                F.concat(F.lit("body-"), F.lit(version), F.lit("-"), F.repeat(F.lit("x"), 500)).alias("text"),
            )
        )

    def timed_read(table, probe_url):
        t0 = time.monotonic()
        df = table.read(spark)
        df.agg(F.sum(F.length("text"))).collect()
        full = time.monotonic() - t0
        t0 = time.monotonic()
        got = table.read_keys(spark, [probe_url])
        if got is not None:
            got.collect()
        point = time.monotonic() - t0
        return full, point

    levels = [int(x) for x in args.levels.split(",")]
    for d in levels:
        path = os.path.join(root, f"d{d}")
        table = LakeTable(path, key="url", n_buckets=64)
        base = mk_rows(args.base_rows, 0, args.base_rows, 0)
        # base must be reduced (mk_rows can emit dup urls) — default reduce
        table.merge_lww(spark, base, epoch_id=0)
        table.compact(spark)
        for e in range(d):
            table.merge_lww(
                spark,
                mk_rows(args.delta_rows, (e + 1) * 10_000_000, args.base_rows, e + 1),
                epoch_id=e + 1,
            )
        probe_url = "https://x/12345"
        files_per_bucket = table.max_files_per_bucket()
        probe_files = len(table.files_for_keys(spark, [probe_url]))
        total_files = sum(len(v) for v in table.bucket_files().values())

        full = point = 1e9
        for _ in range(args.repeat + 1):  # first is warmup at this level
            f, p = timed_read(table, probe_url)
            full, point = min(full, f), min(point, p)

        t0 = time.monotonic()
        table.compact(spark)
        compact_sec = time.monotonic() - t0
        cfull = cpoint = 1e9
        for _ in range(args.repeat):
            f, p = timed_read(table, probe_url)
            cfull, cpoint = min(cfull, f), min(cpoint, p)

        print(
            json.dumps(
                {
                    "deltas_per_bucket": files_per_bucket - 0,
                    "delta_epochs": d,
                    "total_files": total_files,
                    "point_probe_files": probe_files,
                    "full_read_sec": round(full, 3),
                    "point_read_sec": round(point, 3),
                    "compact_sec": round(compact_sec, 3),
                    "full_read_after_compact_sec": round(cfull, 3),
                    "point_read_after_compact_sec": round(cpoint, 3),
                }
            ),
            flush=True,
        )
        shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
