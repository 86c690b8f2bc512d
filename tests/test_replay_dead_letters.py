"""Dead-letter replay (round 6, VERDICT r5 item 6): quarantined rows can be
repaired and re-injected through the NORMAL envelope → LWW → MERGE → chunks
path, with two-layered idempotency — replay markers (a second call re-feeds
nothing) and unlogged merges whose duplicate rows collapse under LWW (a
crash-rerun cannot double-apply)."""

import json
import os

from pyspark.sql import functions as F

from changedatacapture_spark.operators import envelope
from changedatacapture_spark.streaming.driver import CdcPipeline


def _lines(n):
    """n well-formed Debezium-ish JSONL lines; every pos % 3 == 0 line is
    poisoned by swapping the 'op' key for 'xp' (repairable)."""
    out = []
    for i in range(n):
        payload = {
            "url": f"https://q.example/p{i % 7}",
            "warc_ts": f"2024-01-01 00:00:{i % 60:02d}.000000",
            "text": f"1. s\nbody {i}",
        }
        line = json.dumps(
            {
                "op": "u" if i else "c",
                "before": None,
                "after": payload,
                "source": {"db": "d", "table": "t", "file": "s0", "pos": i},
                "ts_ms": 0,
            }
        )
        if i % 3 == 0:
            line = line.replace('"op":', '"xp":', 1)
        out.append(line)
    return out


# a lambda (not a def): cloudpickle serializes it BY VALUE, so executor
# workers don't need this test module importable — real deployments pass an
# importable module:function (scripts/run_pipeline.py --repair)
_repair = lambda line: line.replace('"xp":', '"op":', 1)  # noqa: E731


def _mk_pipe(spark, tmp_path, lines):
    seg = tmp_path / "seg"
    os.makedirs(seg)
    with open(seg / "segment-0.jsonl", "w") as f:
        f.write("\n".join(lines) + "\n")
    pipe = CdcPipeline(str(tmp_path / "lake"), n_buckets=4)
    batch = envelope.read_segments_jsonl(spark, str(seg), keep_corrupt=True)
    pipe.apply_batch(batch, epoch_id=0)
    return pipe


def _state(spark, pipe):
    return {
        r["url"]: (r["text"], r["pos"])
        for r in pipe.pages.read(spark).collect()
    }


def test_poison_quarantine_repair_replay_equals_oracle(spark, tmp_path):
    lines = _lines(30)
    pipe = _mk_pipe(spark, tmp_path, lines)
    # the poisoned lines were quarantined, not applied
    assert pipe.quarantine.read(spark).count() == 10
    partial = _state(spark, pipe)
    # oracle: LWW fold over ALL 30 events (what full repair must restore)
    full = {}
    for i in range(30):
        full[f"https://q.example/p{i % 7}"] = (f"1. s\nbody {i}", i)
    assert partial != full  # the poison actually lost winners

    out = pipe.replay_dead_letters(spark, repair_fn=_repair)
    assert out["rows"] == 10 and out["quarantine_epochs"] == [0]
    assert _state(spark, pipe) == full
    # chunks followed the repaired winners too (cross-table consistency)
    ch = {r["url"]: r["content"] for r in pipe.chunks.read(spark).collect()}
    assert ch == {u: t for u, (t, _p) in full.items()}

    # replay-level idempotency: a second call re-feeds nothing
    again = pipe.replay_dead_letters(spark, repair_fn=_repair)
    assert again == {"quarantine_epochs": [], "rows": 0}
    assert _state(spark, pipe) == full


def test_replay_crash_rerun_cannot_double_apply(spark, tmp_path):
    """Simulate a crash between apply and marker: wipe replayed.json and
    replay again — the identical rows collapse under LWW to the same
    state and the snapshot grows by exactly one (duplicate) commit."""
    pipe = _mk_pipe(spark, tmp_path, _lines(30))
    pipe.replay_dead_letters(spark, repair_fn=_repair)
    ref = _state(spark, pipe)
    os.remove(pipe.quarantine._replayed_path())  # the simulated crash
    out = pipe.replay_dead_letters(spark, repair_fn=_repair)
    assert out["rows"] == 10  # genuinely re-applied
    assert _state(spark, pipe) == ref  # ...to the identical state


def test_still_corrupt_lines_requarantine_and_stay_pending(spark, tmp_path):
    """A repair that fixes only SOME lines: the rest re-quarantine under a
    replay id (>= 1e9, never a stream epoch) and a later, better repair
    drains them."""
    pipe = _mk_pipe(spark, tmp_path, _lines(30))

    def half_repair(line):
        # only repair even positions; odd poisoned lines stay broken
        pos = json.loads(_repair(line))["source"]["pos"]
        return _repair(line) if pos % 2 == 0 else line

    out = pipe.replay_dead_letters(spark, repair_fn=half_repair)
    assert out["rows"] == 10
    q = pipe.quarantine.read(spark)
    requeued = q.where(F.col("epoch_id") >= 1_000_000_000)
    assert requeued.count() == 5  # pos 3,9,15,21,27
    # stream epoch 0's quarantine is marked; the replay id is pending
    assert pipe.quarantine.replayed_epochs() == {0}
    out2 = pipe.replay_dead_letters(spark, repair_fn=_repair)
    assert out2["rows"] == 5
    full = {}
    for i in range(30):
        full[f"https://q.example/p{i % 7}"] = (f"1. s\nbody {i}", i)
    assert _state(spark, pipe) == full


def test_stream_epochs_unaffected_by_replay(spark, tmp_path):
    """The replay claims NO stream epoch: after a replay, the next stream
    epoch id applies normally (no silent skip)."""
    pipe = _mk_pipe(spark, tmp_path, _lines(30))
    pipe.replay_dead_letters(spark, repair_fn=_repair)
    eps_before = set(pipe.pages.committed_epochs())
    assert eps_before == {"0"}  # replay added no epoch entry
    seg2 = tmp_path / "seg2"
    os.makedirs(seg2)
    with open(seg2 / "segment-1.jsonl", "w") as f:
        f.write(json.dumps({
            "op": "u", "before": None,
            "after": {"url": "https://q.example/p0",
                      "warc_ts": "2024-01-02 00:00:00.000000",
                      "text": "1. s\nnewest"},
            "source": {"db": "d", "table": "t", "file": "s1", "pos": 999},
            "ts_ms": 0,
        }) + "\n")
    batch = envelope.read_segments_jsonl(spark, str(seg2), keep_corrupt=True)
    pipe.apply_batch(batch, epoch_id=1)  # the stream's own next epoch
    got = {r["url"]: r["text"] for r in pipe.pages.read(spark).collect()}
    assert got["https://q.example/p0"] == "1. s\nnewest"
    assert set(pipe.pages.committed_epochs()) == {"0", "1"}
