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


def _write_env_segments(tmp_path, segs):
    """segs: list of lists of (op, url, ts, pos) → one parquet file each."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from changedatacapture_spark.gen import _arrow_envelope_schema

    seg_dir = str(tmp_path / "log")
    os.makedirs(seg_dir, exist_ok=True)
    schema = _arrow_envelope_schema()
    for i, rows in enumerate(segs):
        table = pa.Table.from_pylist(
            [
                {
                    "op": op,
                    "before": None,
                    "after": {"url": u, "warc_ts": ts, "html": None, "text": "t",
                              "lang": "en", "extra": None},
                    "source": {"db": "d", "table": "t", "file": "f", "pos": pos},
                    "ts_ms": 0,
                }
                for op, u, ts, pos in rows
            ],
            schema=schema,
        )
        pq.write_table(table, f"{seg_dir}/segment-{i:05d}.parquet")
    return seg_dir


def test_version_tracker_ttl_evicts_idle_state(spark, tmp_path):
    """Event-time TTL: a url idle past watermark+ttl is evicted — its next
    event restarts the count from zero instead of continuing (bounded state
    at 10^10 urls). Also pins the late-batch last_op rule: a batch of only
    OLDER events must not move last_op."""
    import datetime as dt

    T0 = dt.datetime(2024, 1, 1)
    seg = _write_env_segments(
        tmp_path,
        [
            # batch 1: two 'a' events (count 2) + a 'b'
            [("c", "a", T0, 1), ("u", "a", T0 + dt.timedelta(seconds=1), 2),
             ("c", "b", T0, 3)],
            # batch 2: 'b' far in the future → watermark advances ~2h
            [("u", "b", T0 + dt.timedelta(hours=2), 4)],
            # batch 3: 'b' again (advances watermark; 'a' has NO data, its
            # timeout [last_event+30min < watermark] fires → state evicted);
            # plus a LATE OLDER 'd' for b — must not become last_op
            [("u", "b", T0 + dt.timedelta(hours=2, minutes=5), 5),
             ("d", "b", T0 + dt.timedelta(minutes=30), 6)],
            # batch 4: 'a' reappears → fresh state, count restarts at 1
            [("u", "a", T0 + dt.timedelta(hours=3), 7)],
        ],
    )
    src = envelope.parse_envelope(envelope.read_segments_stream(spark, seg, max_files=1))
    rows: list[dict] = []

    def sink(batch_df, epoch_id):
        rows.extend(r.asDict() for r in batch_df.collect())

    q = (
        url_version_tracker(src, ttl_ms=30 * 60 * 1000, watermark="1 minute")
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(300)

    a_counts = [r["n_changes"] for r in rows if r["url"] == "a"]
    assert a_counts[0] == 2, "first batch should count both 'a' events"
    assert a_counts[-1] == 1, "idle state must be evicted; count restarts at 1"
    b_last = [r for r in rows if r["url"] == "b"][-1]
    assert b_last["n_changes"] == 4  # all b events counted (incl. the late one)
    assert b_last["last_op"] == "u", "late older 'd' must not overwrite last_op"


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
