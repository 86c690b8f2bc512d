"""Scaling-efficiency evidence for the north rule (≥0.8 from N to 4N
executors), sandbox protocol per BASELINE.md: the same cdc_replay job on the
same input at local[8] vs local[32] (8→32 cores = N→4N), fresh JVM per level
(subprocess), efficiency = (T_8 / T_32) / 4. Writes BENCH/BASELINE.md.

Usage: python bench_scaling.py [--sf-dir DIR] [--events N] [--repeat K]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))


def run_level(
    cores: int,
    sf_dir: str,
    events: int | None,
    mode: str = "cdc_stream",
    cluster: bool = False,
) -> dict:
    cmd = [
        sys.executable,
        os.path.join(REPO, "bench.py"),
        "--cores",
        str(cores),
        "--sf-dir",
        sf_dir,
        "--only",
        mode,
    ]
    if events:
        cmd += ["--events", str(events)]
    env = dict(os.environ)
    if cluster:
        # SEPARATE executor JVMs (VERDICT r4 item 3): scale EXECUTOR COUNT
        # at 2 cores each, so the N→4N pair crosses real serialization /
        # broadcast / python-worker boundaries that local[N] threads hide
        assert cores % 2 == 0, "cluster levels must be even (2 cores/executor)"
        env["SPARK_GRAFT_MASTER"] = f"local-cluster[{cores // 2},2,4096]"
    out = subprocess.run(cmd, capture_output=True, text=True, check=True, env=env)
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--events", type=int, default=None)
    ap.add_argument("--repeat", type=int, default=2, help="runs per level; best time wins")
    ap.add_argument("--mode", default="cdc_stream", choices=["cdc_stream", "cdc_replay"],
                    help="cdc_stream = steady-state multi-epoch rate (default); cdc_replay = one-shot wall")
    ap.add_argument(
        "--levels",
        default="8,32",
        help="comma-separated core counts for N and 4N (e.g. 2,8 or 8,32)",
    )
    ap.add_argument(
        "--cluster",
        action="store_true",
        help="run each level under local-cluster[cores/2,2,4096] (separate "
        "executor JVMs — real serialization/broadcast boundaries); prints "
        "the pair and SKIPS rewriting BENCH/BASELINE.md (record the number "
        "in the hand-written addendum)",
    )
    args = ap.parse_args()
    lo, hi = (int(x) for x in args.levels.split(","))

    # interleave levels (8,32,8,32,…) and keep the best run per level — the
    # sandbox host's throughput fluctuates (noisy neighbors / throttling), so
    # alternating exposes both levels to the same drift and min() approximates
    # the uncontended time
    results = {}
    all_runs: dict[int, list[float]] = {lo: [], hi: []}
    for _ in range(args.repeat):
        for cores in (lo, hi):
            r = run_level(cores, args.sf_dir, args.events, mode=args.mode, cluster=args.cluster)
            rate = r["steady_events_per_sec"] if args.mode == "cdc_stream" else r["events_per_sec"]
            all_runs[cores].append(rate)
            best = results.get(cores)
            if best is None or rate > best["_rate"]:
                r["_rate"] = rate
                results[cores] = r
            label = f"local-cluster[{cores // 2},2]" if args.cluster else f"local[{cores}]"
            print(f"{label}: {rate} events/s", flush=True)
    for cores in (lo, hi):
        print(f"cores={cores} best: {results[cores]['_rate']} events/s "
              f"(all: {all_runs[cores]})", flush=True)

    rate_n = results[lo]["_rate"]
    rate_4n = results[hi]["_rate"]
    eff = (rate_4n / rate_n) / (hi / lo)
    n_events = results[lo].get("replay_events") or args.events
    if args.cluster:
        print(json.dumps({
            "mode": args.mode,
            "cluster": True,
            "levels": [lo, hi],
            "rate_n": rate_n,
            "rate_4n": rate_4n,
            "efficiency": round(eff, 3),
        }))
        return

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # preserve the hand-written addendum (host calibration, 100 TB
    # extrapolation) below the marker across regenerations
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    addendum = ""
    if os.path.exists(out_path):
        prev = open(out_path).read()
        if "<!-- ADDENDUM -->" in prev:
            addendum = "<!-- ADDENDUM -->" + prev.split("<!-- ADDENDUM -->", 1)[1]
    with open(out_path, "w") as f:
        f.write(f"""# BENCH — scaling-efficiency evidence (north rule)

Protocol (BASELINE.md sandbox evidence): the same end-to-end CDC replay job
(`bench.py --only {args.mode}`) on the same generated change log, run at two
parallelism levels in fresh JVMs — `local[{lo}]` vs `local[{hi}]` ({lo}→{hi} cores =
N→4N executors). Best of {args.repeat} runs per level, levels interleaved.

| level | cores | steady events/sec |
|---|---|---|
| N  | {lo}  | {rate_n:.1f} |
| 4N | {hi} | {rate_4n:.1f} |

- replay log: {n_events} envelope events (hot-url skew 5%, Zipf-style), sf
  dir `{args.sf_dir}`
- job: parse envelope → LWW winners (map-side-combine max_by) → html→text
  pandas-UDF transform → bucketed lake MERGE (64 buckets) with atomic
  idempotent snapshot commit; steady-state rate = events/sec across micro-
  batch epochs 1..N (epoch 0 excluded: one-time plan codegen + python-worker
  pool spin-up that a long-running tail pays once)
- **speedup {lo}→{hi} cores: {rate_4n / rate_n:.2f}×**
- **scaling efficiency = (rate_4N/rate_N)/4 = {eff:.3f}** (target ≥ 0.8)

Reference single-node baseline (BASELINE.md): ~0.3–3 events/sec/process on
the re-chunk/incremental paths; this engine applies
{rate_4n:.0f} events/sec steady-state at local[{hi}] —
{rate_4n / 3:.0f}×+ the reference's best serial rate.

""")
        f.write(addendum)
    print(json.dumps({"levels": [lo, hi], "rate_n": rate_n, "rate_4n": rate_4n, "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
