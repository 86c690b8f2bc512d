"""ANN-index probe latency vs delta-stack depth (VERDICT r3 item 5).

The incremental vector index stacks per-epoch delta files in its LSH
buckets exactly like the data lakes stack theirs — bench_read_deltas.py
measured that curve for pages; this script measures it for the index's
multi-probe search path, and shows the SAME maintenance knob
(``compact(min_files=K)``) bounding it.

Protocol: an LSH index (2^8 buckets) gets a compacted base of ``--base``
vectors, then D upsert epochs of ``--delta`` re-embedded vectors each
(identical vectors, newer order keys — the no-move worst case where every
delta stacks on its bucket without tombstone churn). At each level,
best-of-K with warmup:

- ``search_sec``: multi-probe top-10 (n_probes=8) at delta depth D;
- ``search_after_compact_sec``: same probe after ``compact(min_files=4)``
  (partial compaction — only buckets over the knob fold);
- files-per-bucket before/after, probed-file count, compact cost.

Output: one JSON line per level; paste into BENCH/BASELINE.md. Idle host,
interleaved best-of-K (CLAUDE.md noise rules).
"""

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
    for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ[v] = "1"
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(cores * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "8g")
        .config(
            "spark.executorEnv.PYTHONPATH",
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        .getOrCreate()
    )


DIM = 64


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--base", type=int, default=100_000)
    ap.add_argument("--delta", type=int, default=4_000)
    ap.add_argument("--levels", default="0,8,64")
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from changedatacapture_spark.functions.vector_index import IncrementalVectorIndex

    spark = build_spark(args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    root = f"/tmp/cdc_bench_ann_{os.getpid()}"
    shutil.rmtree(root, ignore_errors=True)

    @pandas_udf("array<float>")
    def gen_vec(ids: pd.Series) -> pd.Series:
        def one(i):
            rng = np.random.Generator(np.random.Philox(key=np.uint64(i)))
            v = rng.standard_normal(DIM).astype(np.float32)
            return (v / np.linalg.norm(v)).tolist()

        return ids.map(one)

    def vec_of(i: int):
        rng = np.random.Generator(np.random.Philox(key=np.uint64(i)))
        v = rng.standard_normal(DIM).astype(np.float32)
        return [float(x) for x in v / np.linalg.norm(v)]

    def rows(ids_df, epoch: int):
        # identical vectors, newer order keys: a re-embed that lands in the
        # same bucket — pure delta stacking, the probe-latency worst case
        return ids_df.select(
            F.concat(F.lit("c"), F.col("id").cast("string")).alias("chunk_id"),
            F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
            F.lit("u" if epoch else "r").alias("op"),
            F.timestamp_micros(
                F.lit(epoch).cast("long") * F.lit(10_000_000_000).cast("long")
                + F.col("id")
            ).alias("warc_ts"),
            (F.lit(epoch).cast("long") * F.lit(1_000_000).cast("long") + F.col("id")).alias("pos"),
            gen_vec(F.col("id")).alias("embedding"),
        )

    def timed_search(idx, q, n_probes=8):
        t0 = time.monotonic()
        got = idx.search(spark, q, k=10, n_probes=n_probes).collect()
        return time.monotonic() - t0, got

    def exact_topk(q):
        """Brute-force cosine top-10 over the live id space (vectors are
        version-stable per id, so the live set is ids 0..base) — the recall
        denominator (VERDICT r4 item 6: recall at volume, not just sf0.1)."""
        qlit = F.array(*[F.lit(float(x)) for x in q])
        ids = spark.range(0, args.base, 1, numPartitions=args.cores * 2)
        score = F.aggregate(
            F.zip_with(gen_vec(F.col("id")), qlit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        rows = ids.select("id", score.alias("s")).orderBy(F.desc("s")).limit(10).collect()
        return {f"c{r['id']}" for r in rows}

    def recall_of(got_rows, exact_ids):
        return round(len({r["chunk_id"] for r in got_rows} & exact_ids) / len(exact_ids), 2)

    levels = [int(x) for x in args.levels.split(",")]
    for d in levels:
        path = os.path.join(root, f"d{d}")
        idx = IncrementalVectorIndex(path, n_planes=8, dim=DIM)
        base_ids = spark.range(0, args.base, 1, numPartitions=args.cores * 2)
        idx.upsert(spark, rows(base_ids, 0), epoch_id=None)
        idx.compact(spark)
        for e in range(d):
            ids = spark.range(0, args.delta, 1, numPartitions=args.cores).select(
                (F.col("id") * F.lit(args.base // args.delta) + F.lit(e % (args.base // args.delta))).alias("id")
            )
            idx.upsert(spark, rows(ids, e + 1), epoch_id=e + 1)

        q = vec_of(12345)
        exact = exact_topk(q)
        fpb = idx.table.max_files_per_bucket()
        total_files = sum(len(v) for v in idx.table.bucket_files().values())

        best, got = 1e9, None
        for _ in range(args.repeat + 1):  # first run warms the plan
            sec, rows_out = timed_search(idx, q)
            if sec < best:
                best = sec
            got = rows_out

        # recall-vs-probes sweep (VERDICT r4 item 6): isotropic gaussian
        # vectors are LSH's WORST case (no cluster structure — true top-10
        # barely separates from the bulk), so absolute recall here is a
        # floor; the signal is margin ordering, i.e. recall >> the
        # chance baseline n_probes/256, and rising monotonically with
        # probes toward 1.0. The ≥0.9 pins on structured (stub-embedding)
        # data live in tests/test_similarity.py.
        sweep = {}
        for npb in (8, 32, 96, 256):
            s_sec, s_got = timed_search(idx, q, n_probes=npb)
            sweep[npb] = {
                "recall": recall_of(s_got, exact),
                "chance": round(npb / 256, 3),
                "sec": round(s_sec, 3),
            }

        t0 = time.monotonic()
        idx.compact(spark, min_files=4)
        compact_sec = time.monotonic() - t0
        fpb_after = idx.table.max_files_per_bucket()
        best_after, got_after = 1e9, None
        for _ in range(args.repeat):
            sec, rows_out = timed_search(idx, q)
            if sec < best_after:
                best_after = sec
            got_after = rows_out

        print(
            json.dumps(
                {
                    "delta_epochs": d,
                    "files_per_bucket": fpb,
                    "total_files": total_files,
                    "search_sec": round(best, 3),
                    "recall_at10": recall_of(got, exact),
                    "recall_vs_probes": sweep,
                    "compact_min_files_sec": round(compact_sec, 3),
                    "files_per_bucket_after": fpb_after,
                    "search_after_compact_sec": round(best_after, 3),
                    "recall_after_compact": recall_of(got_after, exact),
                }
            ),
            flush=True,
        )
        shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()