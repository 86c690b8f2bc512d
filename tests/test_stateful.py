"""applyInPandasWithState version tracker: cross-batch state accumulation and
checkpoint recovery."""

from changedatacapture_spark import gen
from changedatacapture_spark.operators import envelope
from changedatacapture_spark.streaming.stateful import url_version_tracker


_SINKS: dict[str, list] = {}


def _run(spark, seg, ckpt, name):
    src = envelope.parse_envelope(envelope.read_segments_stream(spark, seg, max_files=2))
    rows = _SINKS.setdefault(name, [])

    def sink(batch_df, epoch_id):
        rows.extend(r.asDict() for r in batch_df.collect())

    q = (
        url_version_tracker(src)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination(300)
    return rows


def test_version_tracker_counts_match_log(spark, tmp_path, testdata_dir):
    seg = str(tmp_path / "log")
    events = gen.generate_small(
        seg, n_urls=12, n_events=150, seed=41, n_segments=6, dup_frac=0.0,
        tombstone_frac=0.0, testdata_dir=testdata_dir
    )
    rows = _run(spark, seg, str(tmp_path / "ckpt"), "vt1")

    # update mode emits a row per touched url per batch; latest row per url is
    # the current state
    got: dict[str, tuple] = {}
    for r in rows:
        cur = got.get(r["url"], (0, 0))
        got[r["url"]] = (max(cur[0], r["n_changes"]), max(cur[1], r["n_deletes"]))

    exp_changes: dict[str, int] = {}
    exp_deletes: dict[str, int] = {}
    for e in events:
        p = e.get("after") or e.get("before")
        exp_changes[p["url"]] = exp_changes.get(p["url"], 0) + 1
        if e["op"] == "d":
            exp_deletes[p["url"]] = exp_deletes.get(p["url"], 0) + 1
    assert got == {
        u: (exp_changes[u], exp_deletes.get(u, 0)) for u in exp_changes
    }


def test_version_tracker_state_survives_restart(spark, tmp_path, testdata_dir):
    import os

    seg = str(tmp_path / "log")
    gen.generate_small(
        seg, n_urls=8, n_events=100, seed=43, n_segments=4, dup_frac=0.0,
        tombstone_frac=0.0, testdata_dir=testdata_dir
    )
    # hide the second half, run, restore, rerun same checkpoint
    files = sorted(f for f in os.listdir(seg) if f.endswith(".parquet"))
    hidden = {}
    for f in files[2:]:
        hidden[f] = str(tmp_path / ("h_" + f))
        os.rename(os.path.join(seg, f), hidden[f])
    rows_a = _run(spark, seg, str(tmp_path / "ckpt"), "vt2a")
    partial: dict[str, int] = {}
    for r in rows_a:
        partial[r["url"]] = max(partial.get(r["url"], 0), r["n_changes"])
    for f, p in hidden.items():
        os.rename(p, os.path.join(seg, f))
    rows_b = _run(spark, seg, str(tmp_path / "ckpt"), "vt2b")
    final = dict(partial)  # state carries over; phase-2 rows update it
    for r in rows_b:
        final[r["url"]] = max(final.get(r["url"], 0), r["n_changes"])
    # counts continued from recovered state, not from zero
    assert all(final[u] >= n for u, n in partial.items() if u in final)
    total_events = 0
    from changedatacapture_spark.operators import envelope as env2

    total_events = env2.parse_envelope(env2.read_segments(spark, seg)).count()
    assert sum(final.values()) == total_events
