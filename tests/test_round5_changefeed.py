"""Round-5 change-feed surface pins.

The lake becomes a CDC *source* as well as a sink:

- ``read_changes(since_sid, until_sid)`` — net-effect snapshot-window feed
  (insert/update/delete per key, no-ops suppressed exactly), O(window)
  cost via per-commit ``added`` manifests + a bloom-pruned pre-state probe.
- ``read_since(lo)`` — event-time tail read over per-file order-key
  (k0,k1,k2) min/max stats recorded by the commit-time stats job; files
  wholly at-or-below the probe are never scanned.
- ``retention_snapshots=K`` — vacuum keeps the newest K historical
  snapshots' files, so feeds/time travel survive compact()+vacuum up to
  the consumer's lag (Iceberg expire-snapshots contract).
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from changedatacapture_spark.sinks.lake import (
    ChangeFeedUnavailableError,
    LakeTable,
)

_SCHEMA = "url string, op string, warc_ts timestamp, pos long, is_deleted int, val long"


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s)


def _us(s):
    return int(_ts(s).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)


def _mk(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def _feed_table(spark, tmp_path, **kw):
    """Three epochs exercising every feed rule:

    e0: insert a,b,c                  → snapshot 1 (the feed base)
    e1: update b, delete c, insert d, LATE replay of a (older than its
        winner — must be a no-op), and an exact-duplicate-order row later
    e2: delete never-live e (no-op), update b again (supersedes e1's)
    """
    t = LakeTable(str(tmp_path / "t"), key="url", n_buckets=4, **kw)
    t.merge_lww(
        spark,
        _mk(spark, [("a", "c", _ts(1), 1, 0, 10), ("b", "c", _ts(2), 2, 0, 20),
                    ("c", "c", _ts(3), 3, 0, 30)]),
        epoch_id=0,
    )
    base = t.current_snapshot()["snapshot_id"]
    t.merge_lww(
        spark,
        _mk(spark, [("b", "u", _ts(10), 10, 0, 21), ("c", "d", _ts(11), 11, 1, None),
                    ("d", "c", _ts(12), 12, 0, 40), ("a", "u", _ts(0), 0, 0, 99)]),
        epoch_id=1,
    )
    t.merge_lww(
        spark,
        _mk(spark, [("e", "d", _ts(13), 13, 1, None), ("b", "u", _ts(14), 14, 0, 22)]),
        epoch_id=2,
    )
    until = t.current_snapshot()["snapshot_id"]
    return t, base, until


def test_read_changes_classifies_and_suppresses_noops(spark, tmp_path):
    t, base, until = _feed_table(spark, tmp_path)
    rows = {
        r["url"]: r
        for r in t.read_changes(spark, base, until).collect()
    }
    assert set(rows) == {"b", "c", "d"}  # a (late replay) and e (dead delete) gone
    assert rows["b"]["_change_type"] == "update" and rows["b"]["val"] == 22
    assert rows["b"]["_commit_sid"] == until  # e2's row superseded e1's
    assert rows["c"]["_change_type"] == "delete"
    assert rows["d"]["_change_type"] == "insert" and rows["d"]["val"] == 40
    # feed-applied mirror == direct table state (the consumer contract)
    live = {r["url"]: r["val"] for r in t.read(spark).collect()}
    mirror = {"a": 10, "b": 20, "c": 30}  # state at base
    for u, r in rows.items():
        if r["_change_type"] == "delete":
            mirror.pop(u, None)
        else:
            mirror[u] = r["val"]
    assert mirror == live


def test_read_changes_since_zero_is_insert_only_feed(spark, tmp_path):
    t, base, until = _feed_table(spark, tmp_path)
    rows = {r["url"]: r for r in t.read_changes(spark, 0, until).collect()}
    # from empty pre-state: every live winner is an insert; c and e's
    # tombstones are deletes of never-live keys → suppressed
    assert {u: r["_change_type"] for u, r in rows.items()} == {
        "a": "insert", "b": "insert", "d": "insert"
    }
    assert rows["a"]["val"] == 10  # the late e1 replay still loses LWW


def test_read_changes_feed_survives_compaction_with_retention(spark, tmp_path):
    t, base, until = _feed_table(spark, tmp_path, retention_snapshots=8)
    before = sorted(map(tuple, t.read_changes(spark, base, until).collect()))
    t.compact(spark)  # full fold + vacuum — retained snapshots keep files
    assert t.read_changes(spark, base, until) is not None
    after = sorted(map(tuple, t.read_changes(spark, base, until).collect()))
    assert before == after
    # compaction itself is transparent when INSIDE the window
    tail = t.read_changes(spark, base)  # until = current (post-compact) sid
    assert sorted(map(tuple, tail.collect())) == before


def test_read_changes_raises_once_window_vacuumed(spark, tmp_path):
    t, base, until = _feed_table(spark, tmp_path)  # retention 0
    t.compact(spark)  # vacuum reclaims the window commits
    with pytest.raises(ChangeFeedUnavailableError):
        t.read_changes(spark, base, until)


def test_read_changes_truncate_guard(spark, tmp_path):
    t = LakeTable(str(tmp_path / "tr"), key="url", n_buckets=4)
    t.merge_lww(
        spark,
        _mk(spark, [("a", "c", _ts(1), 1, 0, 10), ("b", "c", _ts(2), 2, 0, 20)]),
        epoch_id=0,
    )
    base = t.current_snapshot()["snapshot_id"]
    # truncate horizon at (stream, ts5, 5): kills a and b; c arrives above it
    t.merge_lww(
        spark,
        _mk(spark, [("c", "c", _ts(6), 6, 0, 30)]),
        epoch_id=1,
        truncate=[1, _us(5), 5],
    )
    with pytest.raises(ChangeFeedUnavailableError):
        t.read_changes(spark, base)
    rows = {r["url"]: r for r in t.read_changes(spark, base, allow_truncate=True).collect()}
    # only the surviving (above-horizon) change flows; the mass deletion is
    # carried by the snapshot's truncate metadata, not rows
    assert set(rows) == {"c"} and rows["c"]["_change_type"] == "insert"
    assert t.current_snapshot()["truncate"] == [1, _us(5), 5]


def test_read_changes_serves_replace_rewrites_in_window(spark, tmp_path):
    """Round 6 upgraded the round-5 refusal: a replace commit now records
    its equality-delete sidecar and the window is served as a STATE DIFF
    (tests/test_round6.py covers the full semantics); only a pre-round-6
    replace commit (no sidecar) still refuses."""
    t = LakeTable(str(tmp_path / "rp"), key="url", n_buckets=4)
    t.merge_lww(spark, _mk(spark, [("a", "c", _ts(1), 1, 0, 10)]), epoch_id=0)
    base = t.current_snapshot()["snapshot_id"]
    t.replace_keys(
        spark,
        _mk(spark, [("a", "c", _ts(2), 2, 0, 11)]),
        _mk(spark, [("a", "c", _ts(2), 2, 0, 11)]).select("url"),
    )
    rows = {r["url"]: r for r in t.read_changes(spark, base).collect()}
    assert rows["a"]["_change_type"] == "update" and rows["a"]["val"] == 11
    # a LEGACY replace commit (sidecar record stripped) still refuses
    import json as _json
    import os as _os

    cur = t.current_snapshot()
    p = _os.path.join(t.meta_dir, f"snap-{cur['snapshot_id']:012d}.json")
    cur["meta"].pop("replaced_keys")
    for path in (p, t._current_path()):
        with open(path, "w") as f:
            _json.dump(cur, f)
    with pytest.raises(ChangeFeedUnavailableError):
        t.read_changes(spark, base)


def test_read_since_matches_filtered_full_read_and_prunes_files(spark, tmp_path):
    t = LakeTable(str(tmp_path / "s"), key="url", n_buckets=4)
    # 6 epochs of 30 urls each, disjoint key ranges → old epochs' files sit
    # wholly below a recent probe
    for e in range(6):
        rows = [
            (f"u{e}_{i}", "c", _ts(e * 100 + i), e * 100 + i, 0, e) for i in range(30)
        ]
        if e == 5:
            rows.append(("u0_0", "d", _ts(e * 100 + 50), e * 100 + 50, 1, None))
        t.merge_lww(spark, _mk(spark, rows), epoch_id=e)
    lo = [1, _us(400), 0]  # everything from epoch 4 on
    total = sum(len(v) for v in t.bucket_files().values())
    kept = t.files_for_since(lo)
    assert 0 < len(kept) < total  # strict pruning
    got = sorted(
        (r["url"], r["val"]) for r in t.read_since(spark, lo).collect()
    )
    want = sorted(
        (r["url"], r["val"])
        for r in t.read(spark).where(F.col("pos") >= 400).collect()
    )
    assert got == want
    # include_deletes surfaces the tombstone winner as a delete event
    feed = {
        r["url"]: r["_change_type"]
        for r in t.read_since(spark, lo, include_deletes=True).collect()
    }
    assert feed["u0_0"] == "delete"
    # probe below everything == full live read
    assert t.read_since(spark, [0, -(2**62), 0]).count() == t.read(spark).count()


def test_expire_snapshots_keeps_feed_manifests_in_window(spark, tmp_path):
    """expire_snapshots prunes metadata of old snapshots — but the `added`
    manifests of SURVIVING append snapshots must stay, or a change-feed
    window inside keep_last dies with a raw FileNotFoundError instead of
    serving (the bug this pins)."""
    t, base, until = _feed_table(spark, tmp_path, retention_snapshots=8)
    t.expire_snapshots(keep_last=8)  # every window snapshot survives
    rows = t.read_changes(spark, base, until).collect()
    assert {r["url"] for r in rows} == {"b", "c", "d"}
    # expiring INTO the window turns the feed into the clean refusal
    t.merge_lww(
        spark, _mk(spark, [("z", "c", _ts(30), 30, 0, 1)]), epoch_id=3
    )
    t.expire_snapshots(keep_last=1)
    with pytest.raises(ChangeFeedUnavailableError):
        t.read_changes(spark, base, until)


def test_order_bounds_recorded_and_conservative(spark, tmp_path):
    t = LakeTable(str(tmp_path / "b"), key="url", n_buckets=2)
    t.merge_lww(
        spark,
        _mk(spark, [("a", "c", _ts(5), 5, 0, 1), ("b", "c", _ts(9), 9, 0, 2)]),
        epoch_id=0,
    )
    entries = [e for es in t._entries(t.current_snapshot()).values() for e in es]
    assert entries and all(e.get("o") is not None for e in entries)
    los, his = zip(*[(tuple(e["o"][0]), tuple(e["o"][1])) for e in entries])
    assert min(los) == (1, _us(5), 5) and max(his) == (1, _us(9), 9)
    # entries lacking bounds (legacy) are never pruned
    legacy = [dict(e, o=None) for e in entries]
    assert LakeTable._prune_entries_since(legacy, [1, _us(100), 0]) == legacy
    # a null order component poisons the file's bounds → file kept
    t.merge_lww(
        spark, _mk(spark, [("n", "c", None, 7, 0, 3)]), epoch_id=1
    )
    ent2 = [e for es in t._entries(t.current_snapshot()).values() for e in es]
    nulls = [e for e in ent2 if e.get("o") is None]
    assert len(nulls) == 1  # exactly the new file with the null ts
