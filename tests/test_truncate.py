"""TRUNCATE op 't' (reference op set c/u/d/r/t, QUICK_START.md:282-288;
VERDICT r2 'what's missing #3').

Engine semantics: a truncate is metadata-only — the batch's max truncate
order key is committed into the snapshot as a horizon; every stored row
at-or-below it is dead at read time (O(1) per truncate, no data rewrite),
later events rebuild the table, late replays below the horizon stay dead,
and the horizon survives restart and compaction."""

import datetime as dt

from changedatacapture_spark import gen, oracle
from changedatacapture_spark.sinks.lake import LakeTable
from changedatacapture_spark.streaming.driver import CdcPipeline

_SCHEMA = (
    "url string, warc_ts timestamp, pos long, op string, is_deleted int, text string"
)


def _us(spark, ts: str) -> int:
    return spark.sql(f"select unix_micros(timestamp '{ts}')").first()[0]


def test_truncate_mid_stream_matches_oracle(spark, tmp_path, testdata_dir):
    """End-to-end: a feed with mid-stream truncates folds to the same final
    pages AND chunks state as the sequential oracle (t clears state at its
    (warc_ts, pos) position)."""
    seg_dir = str(tmp_path / "log")
    events = gen.generate_small(
        seg_dir,
        n_urls=40,
        n_events=300,
        seed=23,
        truncate_frac=0.02,
        n_segments=6,
        testdata_dir=testdata_dir,
    )
    n_t = sum(1 for e in events if e["op"] == "t")
    assert n_t >= 2, "generator should have emitted truncates"

    pipe = CdcPipeline(str(tmp_path / "lake"), n_buckets=4)
    pipe.run_stream(
        spark, seg_dir, str(tmp_path / "ckpt"), max_files_per_trigger=2, timeout_sec=300
    )

    state = oracle.fold_events(events)
    pages = {r["url"]: r["text"] for r in pipe.pages.read(spark).collect()}
    assert set(pages) == set(state)
    for url, exp in state.items():
        assert pages[url] == exp["text"], f"text mismatch {url}"

    # chunks: truncated pages' chunk sets die with them (same horizon)
    exp_chunks = {u: oracle.chunk_by_sections(p["text"]) for u, p in state.items()}
    got_chunks = {}
    for r in pipe.chunks.read(spark).collect():
        got_chunks.setdefault(r["url"], []).append(r)
    assert set(got_chunks) == {u for u, c in exp_chunks.items() if c}
    for url, rows in got_chunks.items():
        got = sorted(rows, key=lambda r: r["chunk_index"])
        assert [g["content"] for g in got] == [e["content"] for e in exp_chunks[url]]

    assert pipe.pages.current_snapshot().get("truncate") is not None
    assert pipe.chunks.current_snapshot().get("truncate") is not None


def test_truncate_blocks_late_replay_and_survives_compaction(spark, tmp_path):
    table = LakeTable(str(tmp_path / "t"), key="url", n_buckets=2)
    ts = dt.datetime(2024, 1, 1)

    def rows(*rs):
        return spark.createDataFrame(list(rs), _SCHEMA)

    table.merge_lww(
        spark,
        rows(("u1", ts, 1, "c", 0, "v1"), ("u2", ts + dt.timedelta(seconds=2), 2, "c", 0, "w1")),
        epoch_id=0,
    )
    # epoch 1: TRUNCATE at t=5s/pos=5, plus a post-truncate insert at t=6s
    horizon = [1, _us(spark, "2024-01-01 00:00:05"), 5]
    table.merge_lww(
        spark,
        rows(("u3", ts + dt.timedelta(seconds=6), 6, "c", 0, "x1")),
        epoch_id=1,
        truncate=horizon,
    )
    assert {r["url"]: r["text"] for r in table.read(spark).collect()} == {"u3": "x1"}

    # epoch 2: late replay of a pre-truncate update — must stay dead
    table.merge_lww(
        spark,
        rows(("u1", ts + dt.timedelta(seconds=3), 3, "u", 0, "late")),
        epoch_id=2,
    )
    assert {r["url"] for r in table.read(spark).collect()} == {"u3"}

    # compaction physically drops the dead rows but keeps the horizon
    table.compact(spark)
    assert table.current_snapshot()["truncate"] == horizon
    assert {r["url"] for r in table.read(spark).collect()} == {"u3"}
    # an even later pre-truncate replay after compaction still dies
    table.merge_lww(
        spark,
        rows(("u2", ts + dt.timedelta(seconds=4), 4, "u", 0, "late2")),
        epoch_id=3,
    )
    assert {r["url"] for r in table.read(spark).collect()} == {"u3"}

    # a genuinely newer event rebuilds the key
    table.merge_lww(
        spark,
        rows(("u1", ts + dt.timedelta(seconds=9), 9, "c", 0, "fresh")),
        epoch_id=4,
    )
    got = {r["url"]: r["text"] for r in table.read(spark).collect()}
    assert got == {"u3": "x1", "u1": "fresh"}


def test_truncate_only_batch_commits_horizon(spark, tmp_path, testdata_dir):
    """A micro-batch containing ONLY a truncate still commits (epoch recorded,
    horizon set) — replaying it is a no-op and the table reads empty."""
    seg_dir = str(tmp_path / "log")
    events = gen.generate_small(
        seg_dir, n_urls=10, n_events=40, seed=7, n_segments=2, testdata_dir=testdata_dir
    )
    pipe = CdcPipeline(str(tmp_path / "lake"), n_buckets=2)
    pipe.run_batch(spark, seg_dir)
    assert pipe.pages.read(spark).count() > 0

    # hand-craft a truncate-only segment newer than everything
    t_ts = dt.datetime(2024, 1, 2)
    ev = {
        "op": "t",
        "before": None,
        "after": {"url": None, "warc_ts": t_ts, "html": None, "text": None,
                  "lang": None, "extra": None},
        "source": {"db": "testdb", "table": "pages", "file": "binlog.000099",
                   "pos": 10_000_000},
        "ts_ms": 1_700_000_000_000,
    }
    seg2 = str(tmp_path / "log2")
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(seg2, exist_ok=True)
    pq.write_table(
        pa.Table.from_pylist([gen._to_arrow_row(ev)], schema=gen._arrow_envelope_schema()),
        os.path.join(seg2, "segment-00000.parquet"),
    )
    from changedatacapture_spark.operators import envelope as env_ops

    batch = env_ops.read_segments(spark, seg2)
    pipe.apply_batch(batch, epoch_id=1)

    df = pipe.pages.read(spark)
    assert df is None or df.count() == 0
    assert pipe.pages.current_snapshot().get("truncate") is not None
    # replay of the truncate epoch is exactly-once
    sid = pipe.pages.current_snapshot()["snapshot_id"]
    pipe.apply_batch(batch, epoch_id=1)
    assert pipe.pages.current_snapshot()["snapshot_id"] == sid
