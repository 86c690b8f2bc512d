"""Hot-key skew A/B (round 6, VERDICT r5 item 5): a 50%-hot-url feed (half
of all events hit ONE url) replayed with LWW salting OFF vs ON, interleaved
best-of-K — the measurement behind the engine's `auto_salt=False` default.

The argued basis (driver.py:159-165): `max_by` LWW partially aggregates
map-side, so even a url carrying 50% of the feed collapses to ≤1 row per
map partition BEFORE the shuffle — the hot reduce key receives at most
n_map_partitions pre-reduced rows, not n_events/2. The script measures that
directly (`max_reduce_rows_per_key`: partials entering the reduce for the
hottest key) alongside the end-to-end walls.

Usage: PYTHONPATH=/root/repo python scripts/bench_skew.py \
          [--events 1000000] [--hot-frac 0.5] [--repeat 2] [--cores 8]
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
    ap.add_argument("--events", type=int, default=1_000_000)
    ap.add_argument("--hot-frac", type=float, default=0.5)
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--salt-buckets", type=int, default=32)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from changedatacapture_spark import gen
    from changedatacapture_spark.operators import envelope
    from changedatacapture_spark.streaming.driver import CdcPipeline

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .config("spark.sql.shuffle.partitions", str(args.cores * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.executorEnv.PYTHONPATH", REPO)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    log_dir = f"/tmp/cdc_bench_cache/skew_{args.events}_{int(args.hot_frac * 100)}"
    if not os.path.exists(os.path.join(log_dir, "_SUCCESS")):
        shutil.rmtree(log_dir, ignore_errors=True)
        gen.generate_bench(
            spark,
            log_dir,
            n_urls=max(5_000, args.events // 10),
            n_events=args.events,
            n_segments=64,
            pool_size=256,
            hot_frac=args.hot_frac,
            testdata_dir=args.sf_dir,
        )

    parsed = envelope.parse_envelope(envelope.read_segments(spark, log_dir))
    # skew evidence: events per url (top), and partials entering the reduce
    # per key AFTER map-side combine (what the shuffle actually carries)
    top = (
        parsed.groupBy("url").count().orderBy(F.desc("count")).limit(1).first()
    )
    partials = (
        parsed.withColumn("p", F.spark_partition_id())
        .groupBy("url", "p")
        .count()
        .groupBy("url")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )

    def run(salt):
        lake = f"/tmp/cdc_skew_lake_{os.getpid()}"
        shutil.rmtree(lake, ignore_errors=True)
        pipe = CdcPipeline(
            lake, n_buckets=64, with_chunks=False, salt_buckets=salt
        )
        t0 = time.monotonic()
        pipe.run_batch(spark, log_dir)
        wall = time.monotonic() - t0
        shutil.rmtree(lake, ignore_errors=True)
        return wall

    run(None)  # warmup (codegen + python workers), untimed
    walls = {"salt_off": [], "salt_on": []}
    for _ in range(args.repeat):  # interleaved A/B (host wall drift)
        walls["salt_off"].append(run(None))
        walls["salt_on"].append(run(args.salt_buckets))
    off = min(walls["salt_off"])
    on = min(walls["salt_on"])
    print(
        json.dumps(
            {
                "metric": f"hot-url replay, salt off vs on (best-of-{args.repeat})",
                "unit": "sec",
                "events": args.events,
                "hot_url_events": int(top["count"]),
                "max_reduce_rows_per_key_after_map_combine": int(partials),
                "salt_off_sec": round(off, 2),
                "salt_on_sec": round(on, 2),
                "salt_off_events_per_sec": round(args.events / off, 1),
                "salt_on_events_per_sec": round(args.events / on, 1),
                "salt_buckets": args.salt_buckets,
                "cores": args.cores,
                "all_walls": {k: [round(x, 2) for x in v] for k, v in walls.items()},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
