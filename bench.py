"""Benchmark harness (driver contract: prints ONE JSON line).

Headline numbers:
- ``cdc_replay`` — the north-star path: replay a generated Common-Crawl-style
  change log (envelope parquet segments, hot-url skew) through the full
  engine (parse → LWW winners → html→text pandas-UDF transform → bucketed
  lake MERGE), measured end-to-end; ``events_per_sec`` is derived from it.
- ``cdc_chunks`` — the derived-chunks transform (section chunker UDF +
  posexplode + key-replace into the chunks table).
- query-surface samples (LWW fold over the events table, minhash dedup, ANN
  top-k) for regression tracking.

Env knobs: $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
$SPARK_GRAFT_CPUS (default 32). The generated replay log is cached under
/tmp keyed by its parameters; generation time is excluded from timings.

Scaling evidence (north rule: efficiency ≥0.8 from N to 4N executors) is
produced by ``bench_scaling.py``, which runs THIS file's cdc_replay at
local[8] and local[32] in fresh JVMs and writes BENCH/BASELINE.md.
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
# executors' python workers must import the package too (spark-submit
# --py-files equivalent for local mode)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
# one BLAS/OMP thread per python worker: N workers × nproc BLAS threads
# otherwise oversubscribes the box quadratically (measured 1.6× drag at 32
# workers on 32 cores)
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")


def build_spark(cores: int):
    from pyspark.sql import SparkSession

    # SPARK_GRAFT_MASTER overrides the master URL — used by bench_scaling's
    # --cluster mode to run the same job under local-cluster[E,C,M] (separate
    # executor JVMs: real serialization/broadcast boundaries local[N] hides).
    # `cores` still names the TOTAL core count for shuffle sizing/labels.
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores}]")
    return (
        SparkSession.builder.master(master)
        .appName(f"cdc-bench-{cores}")
        .config("spark.executorEnv.PYTHONPATH", REPO)
        .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_SHUFFLE", str(max(cores * 2, 16))))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "5000")
        .getOrCreate()
    )


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def bench_log_dir(sf: float, n_events: int, noop_frac: float = 0.0) -> str:
    tag = f"_noop{int(noop_frac * 100)}" if noop_frac else ""
    return f"/tmp/cdc_bench_cache/log_sf{sf}_{n_events}{tag}"


def ensure_bench_log(
    spark, sf_dir: str, n_events: int, n_urls: int, noop_frac: float = 0.0
) -> str:
    from changedatacapture_spark import gen

    out = bench_log_dir(_sf_of(sf_dir), n_events, noop_frac)
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        shutil.rmtree(out, ignore_errors=True)
        gen.generate_bench(
            spark,
            out,
            n_urls=n_urls,
            n_events=n_events,
            n_segments=64,
            pool_size=256,
            hot_frac=0.05,
            noop_frac=noop_frac,
            testdata_dir=sf_dir,
        )
    return out


def _parquet_bytes(path: str) -> int:
    total = 0
    for root, _dirs, fs in os.walk(path):
        for f in fs:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def _live_bytes(table) -> int:
    return sum(
        os.path.getsize(f)
        for bf in table.bucket_files().values()
        for f in bf
        if os.path.exists(f)
    )


def run_bench(cores: int, sf_dir: str, only: list[str] | None = None, n_events: int | None = None):
    from changedatacapture_spark import queries as Q
    from changedatacapture_spark.functions import transform
    from changedatacapture_spark.streaming.driver import CdcPipeline

    sf = _sf_of(sf_dir)
    if n_events is None:
        # scale the replay log with sf: sf0.1 → 1M events over 100k urls
        n_events = max(50_000, int(10_000_000 * sf))
    n_urls = max(5_000, n_events // 10)

    spark = build_spark(cores)
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    try:
        log_dir = ensure_bench_log(spark, sf_dir, n_events, n_urls)

        # warmup: a small untimed replay to JIT-compile the codegen'd plan and
        # fault in the Python-worker pool — cold-JVM effects otherwise dominate
        # (measured 10-20× first-vs-second-run deltas) and would skew the
        # N→4N scaling comparison
        warm_log = ensure_bench_log(spark, sf_dir, 50_000, 5_000)
        warm_lake = f"/tmp/cdc_bench_warm_{os.getpid()}"
        shutil.rmtree(warm_lake, ignore_errors=True)
        CdcPipeline(
            warm_lake,
            n_buckets=16,
            with_chunks=True,
            with_embeddings=True,
            embed_fn=transform.embed_sim_udf,
        ).run_batch(spark, warm_log)
        shutil.rmtree(warm_lake, ignore_errors=True)

        def timed(name, fn):
            if only and name not in only:
                return
            t0 = time.monotonic()
            fn()
            timings[name] = round(time.monotonic() - t0, 3)

        # -- the north-star replay ------------------------------------------
        lake_dir = f"/tmp/cdc_bench_lake_{os.getpid()}"
        shutil.rmtree(lake_dir, ignore_errors=True)
        pipe = CdcPipeline(lake_dir, n_buckets=64, with_chunks=False)

        def replay():
            pipe.run_batch(spark, log_dir)

        timed("cdc_replay", replay)
        if "cdc_replay" in timings:
            extras["events_per_sec"] = round(n_events / timings["cdc_replay"], 1)
            extras["replay_events"] = n_events

        # -- bloom-pruned point read on the replayed lake ---------------------
        # a 1-url lookup through read_keys: bucket pruning + per-file key
        # blooms cut the scan to O(matching files) (PLANS.md round-3 table)
        def point_read():
            got = pipe.pages.read_keys(spark, ["https://site-0.example.com/page/000000"])
            if got is not None:
                got.collect()

        if "cdc_replay" in timings:
            if not only or "lake_point_read" in only:
                point_read()  # untimed warmup: first execution pays codegen
            timed("lake_point_read", point_read)
            if "lake_point_read" in timings:
                # evidence collection OUTSIDE the timed window (it runs its
                # own Spark job + manifest walk)
                url = "https://site-0.example.com/page/000000"
                extras["point_probe_files"] = len(pipe.pages.files_for_keys(spark, [url]))
                extras["point_total_files"] = sum(
                    len(v) for v in pipe.pages.bucket_files().values()
                )

        # -- steady-state multi-epoch streaming tail --------------------------
        # the continuous-CDC shape AND the full product path of the reference
        # (EP1: change event → re-chunk → re-embed → upsert pages+chunks):
        # availableNow over the log in ~4 micro-batches; throughput is
        # measured from the END of epoch 0 to the end of the last epoch, so
        # one-time plan/codegen/worker warmup is excluded and per-epoch driver
        # bookkeeping is included — this is the number that scales with
        # executors on a real cluster. The embedding stage uses the
        # compute-realistic stand-in (still ~30× cheaper than the reference's
        # real CPU model, so the events/sec comparison is conservative).
        def stream_replay(tag: str, src_dir: str, prefix: str):
            stream_lake = f"/tmp/cdc_bench_slake_{tag}_{os.getpid()}"
            shutil.rmtree(stream_lake, ignore_errors=True)
            n_files = len([f for f in os.listdir(src_dir) if f.endswith(".parquet")])
            per_trigger = max(1, n_files // 4)
            spipe = CdcPipeline(
                stream_lake,
                n_buckets=64,
                with_chunks=True,
                with_embeddings=True,
                embed_fn=transform.embed_sim_udf,
                # the generator's updates replace the WHOLE body, so chunk-
                # level embedding reuse can never match — disable the reuse
                # read (a feed with partial edits or an expensive model turns
                # it on; tests/test_incremental_chunks.py pins the semantics).
                # The url-level content-hash skip stays active either way.
                reuse_embeddings=False,
            )
            spipe.run_stream(
                spark,
                src_dir,
                f"{stream_lake}/_ckpt",
                max_files_per_trigger=per_trigger,
                timeout_sec=3600,
            )
            m = spipe.metrics
            if len(m) >= 3:
                steady_rows = sum(x["rows"] for x in m[1:])
                steady_sec = m[-1]["end_mono"] - m[0]["end_mono"]
                extras[f"{prefix}events_per_sec"] = round(steady_rows / steady_sec, 1)
                extras[f"{prefix}epochs"] = len(m) - 1
            # merge-on-read evidence: bytes physically written across all
            # epochs vs the final live table — copy-on-write rewrote every
            # touched bucket per epoch (amplification ≈ n_epochs); MOR
            # appends O(batch) so the ratio stays ~1
            written = _parquet_bytes(f"{stream_lake}/pages/data") + _parquet_bytes(
                f"{stream_lake}/chunks/data"
            )
            live = _live_bytes(spipe.pages) + _live_bytes(spipe.chunks)
            if live:
                extras[f"{prefix}bytes_written_mb"] = round(written / 1e6, 1)
                extras[f"{prefix}write_amplification"] = round(written / live, 3)
            return spipe, stream_lake

        full_state: dict = {}
        timed(
            "cdc_stream",
            lambda: full_state.update(
                zip(("spipe", "lake"), stream_replay("full", log_dir, "steady_"))
            ),
        )
        if full_state:
            # -- incremental-consumer reads over the multi-epoch lake --------
            # (round 5): the event-time tail (read_since, order-pruned) and
            # the snapshot-window change feed (read_changes) are the
            # downstream-sync surface — measured on the lake the stream just
            # built, while its delta commits still stack. Deliberately
            # OUTSIDE the cdc_stream wall so that line stays comparable
            # across rounds.
            from pyspark.sql import functions as F

            pages = full_state["spipe"].pages
            mn, mx = (
                pages.read(spark)
                .agg(F.unix_micros(F.min("warc_ts")), F.unix_micros(F.max("warc_ts")))
                .first()
            )
            lo = [1, int(mx - 0.05 * (mx - mn)), 0]  # last ~5% of event time
            extras["tail_probe_files"] = len(pages.files_for_since(lo))
            extras["tail_total_files"] = sum(
                len(v) for v in pages.bucket_files().values()
            )

            def tail_read():
                df = pages.read_since(spark, lo, include_deletes=True)
                extras["tail_rows"] = df.count() if df is not None else 0

            if not only or "lake_tail_read" in only:
                tail_read()  # untimed warmup (codegen)
            timed("lake_tail_read", tail_read)

            sids = sorted(pages.committed_epochs().values())
            base_sid = sids[len(sids) // 2] if sids else 0

            def changes_feed():
                df = pages.read_changes(spark, base_sid)
                extras["changes_feed_rows"] = df.count() if df is not None else 0

            if not only or "lake_changes_feed" in only:
                changes_feed()  # untimed warmup
            timed("lake_changes_feed", changes_feed)
            extras["changes_window_commits"] = len([s for s in sids if s > base_sid])

            # round 6: the SET-mode member-granular feed on the chunks table
            # — the downstream vector-store sync surface (one row per
            # changed (url, chunk), unchanged members suppressed)
            chunks_t = full_state["spipe"].chunks
            csids = sorted(chunks_t.committed_epochs().values())
            cbase = csids[len(csids) // 2] if csids else 0

            def chunk_feed():
                df = chunks_t.read_changes(spark, cbase, member_key="chunk_index")
                extras["chunk_feed_rows"] = df.count() if df is not None else 0

            if not only or "lake_chunk_changes" in only:
                chunk_feed()  # untimed warmup
            timed("lake_chunk_changes", chunk_feed)

            # round 6 part 2: the feed-driven downstream vector index (the
            # reference's Pinecone updater loop as a consumer). Bootstrap at
            # the mid-stream snapshot (bulk load, recorded untimed in
            # extras), then TIME the incremental sync over the consumer-lag
            # window — member feed with preimages → upsert new vectors +
            # tombstone moved/stale ids in their OLD buckets.
            if not only or "lake_vector_mirror_sync" in only:
                from changedatacapture_spark.streaming.mirror import (
                    VectorFeedMirror,
                )

                vm = VectorFeedMirror(
                    chunks_t,
                    os.path.join(full_state["lake"], "_bench_vec_mirror"),
                    n_planes=6,
                )
                t0 = time.time()
                vm.resync(spark, snapshot_id=cbase)
                extras["vector_mirror_bootstrap_s"] = round(time.time() - t0, 3)

                def vector_mirror_sync():
                    assert vm.sync(spark) == "applied"

                timed("lake_vector_mirror_sync", vector_mirror_sync)
                lr = vm.index.live_rows(spark)  # verification, not sync cost
                extras["vector_mirror_rows"] = lr.count() if lr is not None else 0
            # round 6 removed the feed's persist (ADVICE r5) — no cache to
            # clear between bench queries anymore
            shutil.rmtree(full_state["lake"], ignore_errors=True)

        # -- update-heavy feed: 80% of urls carry content-no-op updates -------
        # (metadata-only row updates — the common CDC case). The content-hash
        # skip means only changed urls re-chunk/re-embed; the reference
        # re-embeds every update (its incremental mode claims the same skip,
        # incremental_pinecone_updater.py:245-277 — this is our twin of it).
        if not only or "cdc_stream_noop" in only:
            # generate OUTSIDE the timed block — a cold /tmp cache would
            # otherwise charge dataset generation to the first run only,
            # corrupting the interleaved best-of-K protocol
            noop_log = ensure_bench_log(spark, sf_dir, n_events, n_urls, noop_frac=0.8)
            noop_state: dict = {}
            timed(
                "cdc_stream_noop",
                lambda: noop_state.update(
                    zip(("spipe", "lake"), stream_replay("noop", noop_log, "noop_"))
                ),
            )
            if noop_state:
                shutil.rmtree(noop_state["lake"], ignore_errors=True)

        # -- derived chunks over the final pages ----------------------------
        def chunks():
            pages = pipe.pages.read(spark)
            if pages is None:
                return
            ch = transform.chunk_pages(pages.select("url", "text"))
            ch.write.mode("overwrite").parquet(f"{lake_dir}/_bench_chunks")

        timed("cdc_chunks", chunks)

        # -- query-surface samples -------------------------------------------
        timed("lww_fold", lambda: Q.cdc_final_state(spark, sf_dir).count())
        timed("dedup_minhash", lambda: Q.dedup_minhash_candidates(spark, sf_dir).count())
        timed("ann_topk", lambda: Q.ann_cosine_topk(spark, sf_dir).count())
        timed("chunk_docs", lambda: Q.doc_chunks(spark, sf_dir).count())

        shutil.rmtree(lake_dir, ignore_errors=True)
    finally:
        spark.stop()

    result = {
        "metric": "end-to-end seconds (headline: cdc_replay events/sec)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cores": cores,
        **extras,
    }
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--only", default=None, help="comma-separated query names")
    ap.add_argument("--events", type=int, default=None, help="override replay log size")
    args = ap.parse_args()
    only = args.only.split(",") if args.only else None
    result = run_bench(args.cores, args.sf_dir, only=only, n_events=args.events)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
