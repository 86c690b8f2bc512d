"""t2-tier correctness (FIXTURES.md F6): a larger mixed log — hot-url skew,
out-of-order + late events, duplicate deliveries, tombstones, and a
schema-evolution burst — replayed through the streaming pipeline WITH a
mid-replay restart, must reproduce the oracle fold exactly."""

import os

import pytest

from changedatacapture_spark import gen, oracle
from changedatacapture_spark.streaming.driver import CdcPipeline


@pytest.mark.slow
def test_t2_mixed_replay_with_restart(spark, tmp_path, testdata_dir):
    seg_dir = str(tmp_path / "log")
    events = gen.generate_small(
        seg_dir,
        n_urls=2000,
        n_events=30_000,
        n_segments=12,
        seed=101,
        hot_frac=0.3,
        late_frac=0.03,
        dup_frac=0.03,
        tombstone_frac=0.01,
        evolve_at=0.5,
        testdata_dir=testdata_dir,
    )
    lake = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")

    # phase 1: half the segments, then "crash"
    files = sorted(f for f in os.listdir(seg_dir) if f.endswith(".parquet"))
    hidden = {}
    for f in files[6:]:
        hidden[f] = str(tmp_path / ("h_" + f))
        os.rename(os.path.join(seg_dir, f), hidden[f])
    CdcPipeline(lake, n_buckets=8).run_stream(
        spark, seg_dir, ckpt, max_files_per_trigger=3, timeout_sec=600
    )

    # phase 2: rest of the log appears; fresh pipeline resumes
    for f, p in hidden.items():
        os.rename(p, os.path.join(seg_dir, f))
    pipe = CdcPipeline(lake, n_buckets=8)
    pipe.run_stream(spark, seg_dir, ckpt, max_files_per_trigger=3, timeout_sec=600)

    expected = oracle.fold_events(events)
    pages = {r["url"]: r.asDict() for r in pipe.pages.read(spark).collect()}
    assert set(pages) == set(expected)
    mismatched = [
        u for u, p in expected.items() if pages[u]["text"] != p["text"]
    ]
    assert not mismatched, f"{len(mismatched)} urls differ, e.g. {mismatched[:3]}"

    # evolution landed
    assert "x_title" in pages[next(iter(pages))]

    # chunks: spot-check 50 urls byte-for-byte
    got_chunks: dict[str, list] = {}
    for r in pipe.chunks.read(spark).collect():
        got_chunks.setdefault(r["url"], []).append(r)
    checked = 0
    for u, p in expected.items():
        exp = oracle.chunk_by_sections(p["text"])
        if not exp:
            assert u not in got_chunks
            continue
        got = sorted(got_chunks[u], key=lambda r: r["chunk_index"])
        assert [c["content"] for c in got] == [c["content"] for c in exp], u
        checked += 1
        if checked >= 50:
            break
    assert checked == 50

    # lineage covers every applied epoch and sums to the log volume
    lin = pipe.lineage.read(spark)
    assert lin.agg({"rows_in": "sum"}).first()[0] >= len(events)
