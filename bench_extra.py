"""Optimization-round measurement harness (bench.py is FROZEN — extra
benchmarks live here per the round-7 protocol; OPTIMIZATION_r07.md cites
these numbers).

Modes:
  build  — run the bench's full-path stream replay ONCE into --lake and keep
           it on disk (same commit stacking as bench.py's cdc_stream), then
           print the per-epoch phase breakdown the driver already records.
  feed   — over a kept lake: time the chunks member feed count and the
           vector-mirror bootstrap+sync (the bench's lake_chunk_changes /
           lake_vector_mirror_sync shapes) best-of-K.
  plans  — write .explain("formatted") for the feed plans over a kept lake.
  query  — time one declared query (noop-sink isolated) best-of-K and/or
           dump its plan.

The kept lake makes read-path A/Bs run against BYTE-IDENTICAL state, which
this ±3x-noise host needs (CLAUDE.md bench protocol).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

from bench import build_spark, ensure_bench_log  # noqa: E402


def noop_write(df):
    df.write.format("noop").mode("overwrite").save()


def build_lake(spark, sf_dir, lake_dir, n_events, noop_frac=0.0):
    from changedatacapture_spark.functions import transform
    from changedatacapture_spark.streaming.driver import CdcPipeline

    log_dir = ensure_bench_log(
        spark, sf_dir, n_events, max(5_000, n_events // 10), noop_frac=noop_frac
    )
    shutil.rmtree(lake_dir, ignore_errors=True)
    n_files = len([f for f in os.listdir(log_dir) if f.endswith(".parquet")])
    per_trigger = max(1, n_files // 4)
    pipe = CdcPipeline(
        lake_dir,
        n_buckets=64,
        with_chunks=True,
        with_embeddings=True,
        embed_fn=transform.embed_sim_udf,
        reuse_embeddings=False,
    )
    t0 = time.monotonic()
    pipe.run_stream(
        spark, log_dir, f"{lake_dir}/_ckpt",
        max_files_per_trigger=per_trigger, timeout_sec=3600,
    )
    wall = time.monotonic() - t0
    print(f"stream wall: {wall:.1f}s")
    for m in pipe.metrics:
        print(json.dumps({k: v for k, v in m.items() if k != "end_mono"}))
    return pipe


def open_tables(lake_dir):
    from changedatacapture_spark.sinks.lake import LakeTable

    pages = LakeTable(os.path.join(lake_dir, "pages"), key="url", n_buckets=64)
    chunks = LakeTable(os.path.join(lake_dir, "chunks"), key="url", n_buckets=64)
    return pages, chunks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["build", "feed", "plans", "query"])
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--lake", default="/tmp/cdc_r07_lake")
    ap.add_argument("--events", type=int, default=1_000_000)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--query", default=None, help="declared query name (query mode)")
    ap.add_argument("--out", default=None, help="plan output file")
    ap.add_argument("--noop-frac", type=float, default=0.0)
    args = ap.parse_args()

    spark = build_spark(args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if args.mode == "build":
            build_lake(spark, args.sf_dir, args.lake, args.events, args.noop_frac)
            return

        if args.mode in ("feed", "plans"):
            pages, chunks = open_tables(args.lake)
            csids = sorted(chunks.committed_epochs().values())
            cbase = csids[len(csids) // 2] if csids else 0
            if args.mode == "plans":
                feed = chunks.read_changes(spark, cbase, member_key="chunk_index")
                with open(args.out or "/tmp/plan_chunk_changes.txt", "w") as f:
                    f.write(feed._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
                print("wrote", args.out or "/tmp/plan_chunk_changes.txt")
                return
            # feed timing
            spark.sparkContext.setJobDescription("warmup: chunk feed")
            chunks.read_changes(spark, cbase, member_key="chunk_index").count()
            for i in range(args.repeat):
                spark.sparkContext.setJobDescription(f"chunk feed rep {i}")
                t0 = time.monotonic()
                n = chunks.read_changes(spark, cbase, member_key="chunk_index").count()
                print(f"lake_chunk_changes[{i}]: {time.monotonic() - t0:.3f}s rows={n}")
            # vector mirror: bootstrap at cbase then sync
            from changedatacapture_spark.streaming.mirror import VectorFeedMirror

            for i in range(args.repeat):
                vm = VectorFeedMirror(
                    chunks, os.path.join(args.lake, f"_r07_vm_{i}"), n_planes=6)
                spark.sparkContext.setJobDescription(f"vm bootstrap {i}")
                t0 = time.monotonic()
                vm.resync(spark, snapshot_id=cbase)
                tb = time.monotonic() - t0
                spark.sparkContext.setJobDescription(f"vm sync {i}")
                t0 = time.monotonic()
                assert vm.sync(spark) == "applied"
                ts = time.monotonic() - t0
                print(f"vector_mirror[{i}]: bootstrap={tb:.3f}s sync={ts:.3f}s")
                shutil.rmtree(os.path.join(args.lake, f"_r07_vm_{i}"), ignore_errors=True)
            return

        if args.mode == "query":
            from changedatacapture_spark.queries import QUERIES

            fn = QUERIES[args.query]
            df = fn(spark, args.sf_dir)
            if args.out:
                with open(args.out, "w") as f:
                    f.write(df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
                print("wrote", args.out)
            spark.sparkContext.setJobDescription(f"warmup: {args.query}")
            noop_write(fn(spark, args.sf_dir))
            for i in range(args.repeat):
                spark.sparkContext.setJobDescription(f"{args.query} rep {i}")
                t0 = time.monotonic()
                noop_write(fn(spark, args.sf_dir))
                print(f"{args.query}[{i}]: {time.monotonic() - t0:.3f}s")
            return
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
