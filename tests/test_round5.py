"""Round-5 pins:

- KeyProbe (VERDICT r4 item 1): the executor-built batch-key probe makes
  pruning decisions bit-identical to the exact key-list path at ANY batch
  size — the key_skip_max=4096 driver-side key collect is gone.
- Strict chunks epoch check + pipeline-level reset (ADVICE r4 medium): a
  per-table reset_epoch_log() can no longer silently drop chunk epochs.
- Split-file stats second job (ADVICE r4 low): covered in
  tests/test_round4.py::test_split_file_bloom_partials_rebuild_exactly,
  re-pinned against the new O(bitmap) payload scheme.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from changedatacapture_spark.operators.envelope import ENVELOPE_SCHEMA
from changedatacapture_spark.sinks.lake import (
    LakeTable,
    StaleEpochError,
    build_key_probe,
)
from changedatacapture_spark.streaming.driver import CdcPipeline

TS = dt.datetime(2024, 1, 1)
_SCHEMA = (
    "url string, warc_ts timestamp, pos long, op string, is_deleted int, text string"
)


def _rows(n, epoch, prefix="u"):
    return [
        (
            f"{prefix}{i}",
            TS + dt.timedelta(seconds=epoch),
            epoch * 1000 + i,
            "c",
            0,
            f"v{epoch}",
        )
        for i in range(n)
    ]


def _env_batch(spark, rows):
    """rows: (op, url, text, ts, pos) → envelope-schema batch."""
    data = []
    for op, url, text, ts, pos in rows:
        payload = {
            "url": url,
            "warc_ts": ts,
            "html": None,
            "text": text,
            "lang": "en",
            "extra": None,
        }
        data.append(
            {
                "op": op,
                "before": payload if op == "d" else None,
                "after": None if op == "d" else payload,
                "source": {"db": "d", "table": "t", "file": "f", "pos": pos},
                "ts_ms": 0,
            }
        )
    return spark.createDataFrame(data, ENVELOPE_SCHEMA)


# ---------------------------------------------------------------------------
# KeyProbe
# ---------------------------------------------------------------------------


def test_key_probe_pruning_matches_exact_path(spark, tmp_path):
    """The executor-side probe must keep EXACTLY the files the driver-side
    exact-key path keeps (same _bloom_hashes / bitmap math, evaluated in
    python workers): kept = all-files − proven-misses == files_for_keys."""
    table = LakeTable(str(tmp_path / "t"), key="url", n_buckets=4)
    for epoch in range(3):
        table.merge_lww(
            spark,
            spark.createDataFrame(_rows(40, epoch, prefix=f"e{epoch}_"), _SCHEMA),
            epoch_id=epoch,
        )
    urls = ["e1_0", "e1_7", "e2_13", "never-written"]
    exact = set(table.files_for_keys(spark, urls))

    keys_df = spark.createDataFrame([(u,) for u in urls], "url string")
    all_buckets = list(range(table.n_buckets))
    probe = build_key_probe(spark, keys_df, "url", [(table, all_buckets)])
    every = {
        table._abs(e["p"])
        for es in table._entries(table.current_snapshot()).values()
        for e in es
    }
    kept = every - probe.misses_for(table.path)
    assert kept == exact, "executor probe diverged from exact-path pruning"
    assert probe.stats[table.path]["candidates"] == len(every)
    assert probe.stats[table.path]["pruned"] == len(every) - len(exact)

    # and the resolved result through the probe equals the exact-list result
    via_probe = table.read_bucket_winners(
        spark, all_buckets, columns=["text"], probe_keys=probe
    )
    via_list = table.read_bucket_winners(
        spark, all_buckets, columns=["text"], probe_keys=urls
    )
    a = sorted(map(tuple, via_probe.collect()))
    b = sorted(map(tuple, via_list.collect()))
    assert a == b and len(a) == 3


def test_key_probe_large_batch_still_prunes(spark, tmp_path):
    """Above the retired 4096 cap the old path fell back to no pruning; the
    probe must still prune. Layout: many buckets so probes-per-bucket stay
    small (the regime where file skipping pays at scale), an old commit of
    5000 DISJOINT urls, then a 5000-url probe — most old files must be
    proven misses, and every file holding a probed key must survive."""
    table = LakeTable(str(tmp_path / "big"), key="url", n_buckets=64)
    table.merge_lww(
        spark, spark.createDataFrame(_rows(5000, 0, prefix="old_"), _SCHEMA), epoch_id=0
    )
    table.merge_lww(
        spark, spark.createDataFrame(_rows(5000, 1, prefix="new_"), _SCHEMA), epoch_id=1
    )
    urls = [f"new_{i}" for i in range(5000)]
    keys_df = spark.createDataFrame([(u,) for u in urls], "url string")
    all_buckets = list(range(table.n_buckets))
    probe = build_key_probe(spark, keys_df, "url", [(table, all_buckets)])
    exact = set(table.files_for_keys(spark, urls))
    every = {
        table._abs(e["p"])
        for es in table._entries(table.current_snapshot()).values()
        for e in es
    }
    kept = every - probe.misses_for(table.path)
    assert kept == exact
    # every file of the probed commit survives (no false negatives) — only
    # the disjoint old commit's files may be proven misses
    assert all("commit-000000000002" not in p for p in every - kept), (
        "a file holding probed keys was pruned"
    )
    # …and pruning actually bites: the disjoint epoch-0 files mostly miss
    assert probe.stats[table.path]["pruned"] > 0


def test_pipeline_prunes_pre_merge_reads_beyond_old_cap(spark, tmp_path):
    """End-to-end: a batch larger than the retired key_skip_max cap still
    gets file-pruned pre-merge/reuse reads (phases.probe_pruned recorded)
    and produces correct chunks — the exact scenario the r4 verdict named
    as the remaining scale gap."""
    # 32 buckets keep the 4200-url batch UNDER build_key_probe's
    # probes-per-bucket gate (~131/bucket < 384) — the sparse regime where
    # bloom pruning still has signal; a denser batch would (correctly)
    # skip the probe job entirely as mathematically useless
    pipe = CdcPipeline(str(tmp_path / "lake"), n_buckets=32, with_chunks=True)
    # epoch 0: seed 60 urls in a DISJOINT key space, so later probes can
    # prove their files key-free
    pipe.apply_batch(
        _env_batch(
            spark,
            [("c", f"seed{i}", f"1. s\nseed body {i}", TS, i) for i in range(60)],
        ),
        epoch_id=0,
    )
    # epoch 1: 4200 fresh urls (> the old 4096 cap)
    n = 4200
    pipe.apply_batch(
        _env_batch(
            spark,
            [
                ("c", f"u{i}", f"1. h\nbody {i}", TS + dt.timedelta(seconds=1), 10_000 + i)
                for i in range(n)
            ],
        ),
        epoch_id=1,
    )
    m = pipe.metrics[-1]
    assert m["rows"] == n
    assert m["phases"].get("probe_pruned", 0) > 0, (
        "a >4096-url batch no longer prunes files (the retired cap's regression)"
    )
    live = pipe.pages.read(spark).count()
    assert live == 60 + n
    chunks = pipe.chunks.read(spark)
    assert chunks.where(F.col("url") == "u17").count() == 1
    assert (
        chunks.where(F.col("url") == "u17").collect()[0]["content"] == "1. h\nbody 17"
    )


# ---------------------------------------------------------------------------
# strict chunks epoch check + pipeline-level reset (ADVICE r4 medium)
# ---------------------------------------------------------------------------


def _run_epochs(spark, pipe, first, last):
    for e in range(first, last):
        pipe.apply_batch(
            _env_batch(
                spark,
                [("c", f"u{e}", f"1. s\nbody {e}", TS + dt.timedelta(seconds=e), e)],
            ),
            epoch_id=e,
        )


def test_partial_reset_raises_stale_epoch_on_chunks(spark, tmp_path):
    """Resetting ONLY the pages table then re-pointing a fresh stream must
    fail LOUDLY at the chunks stage — the lenient epoch_committed() gate
    would have silently skipped every chunks epoch below the old floor (the
    exact data loss StaleEpochError exists to prevent, ADVICE r4 medium)."""
    pipe = CdcPipeline(str(tmp_path / "lake"), n_buckets=4, with_chunks=True)
    pipe.pages.epoch_window = 2
    pipe.chunks.epoch_window = 2
    _run_epochs(spark, pipe, 0, 5)  # floors rise above 0 on BOTH tables
    assert int(pipe.chunks.current_snapshot()["epoch_floor"]) >= 0

    pipe.pages.reset_epoch_log()  # the unsafe per-table reset
    with pytest.raises(StaleEpochError):
        pipe.apply_batch(
            _env_batch(spark, [("c", "fresh", "1. s\nnew stream", TS, 999)]),
            epoch_id=0,
        )


def test_pipeline_reset_adopts_new_stream_cleanly(spark, tmp_path):
    """reset_epoch_logs() (the pipeline-level escape hatch) resets pages AND
    chunks together; the re-pointed stream's epoch 0 then applies to both
    tables — no skip, no raise."""
    pipe = CdcPipeline(str(tmp_path / "lake"), n_buckets=4, with_chunks=True)
    pipe.pages.epoch_window = 2
    pipe.chunks.epoch_window = 2
    _run_epochs(spark, pipe, 0, 5)

    pipe.reset_epoch_logs()
    pipe.apply_batch(
        _env_batch(spark, [("c", "fresh", "1. s\nnew stream body", TS, 999)]),
        epoch_id=0,
    )
    assert pipe.pages.read(spark).where(F.col("url") == "fresh").count() == 1
    got = pipe.chunks.read(spark).where(F.col("url") == "fresh").collect()
    assert len(got) == 1 and got[0]["content"] == "1. s\nnew stream body"

# ---------------------------------------------------------------------------
# corrupt-row quarantine (VERDICT r4 item 4)
# ---------------------------------------------------------------------------


def test_corrupt_rows_quarantined_not_dropped(spark, tmp_path):
    """A poisoned JSONL feed: corrupt lines land in the dead-letter table
    keyed by (epoch, segment, offset) with the raw bytes verbatim; the
    lineage epoch carries rows_corrupt; final state matches the good lines
    alone (the reference only counts skips, cdc_kafka_consumer.py:57-65 —
    here the skip is auditable)."""
    import json as _json

    from changedatacapture_spark.operators import envelope

    seg_dir = tmp_path / "segments"
    seg_dir.mkdir()

    def good(op, url, text, pos):
        return _json.dumps(
            {
                "op": op,
                "after": {
                    "url": url,
                    "warc_ts": "2024-01-01 00:00:00",
                    "text": text,
                    "lang": "en",
                },
                "source": {"db": "d", "table": "t", "file": "s0", "pos": pos},
                "ts_ms": 0,
            }
        )

    bad_lines = ['{"op": "c", "broken', "not json at all", "null"]
    lines = [
        good("c", "u1", "1. a\nbody one", 1),
        bad_lines[0],
        good("c", "u2", "1. b\nbody two", 2),
        bad_lines[1],
        bad_lines[2],
    ]
    (seg_dir / "seg-0.jsonl").write_text("\n".join(lines) + "\n")

    pipe = CdcPipeline(str(tmp_path / "lake"), n_buckets=4, with_chunks=True)
    batch = envelope.read_segments_jsonl(spark, str(seg_dir), keep_corrupt=True)
    pipe.apply_batch(batch, epoch_id=0)

    q = pipe.quarantine.read(spark)
    rows = q.collect()
    assert sorted(r["raw"] for r in rows) == sorted(bad_lines)
    assert all(r["epoch_id"] == 0 for r in rows)
    assert all("seg-0.jsonl" in r["segment"] for r in rows)
    assert len({r["offset"] for r in rows}) == 3  # distinct within the scan

    # final state: exactly the good lines
    urls = sorted(r["url"] for r in pipe.pages.read(spark).collect())
    assert urls == ["u1", "u2"]

    # lineage records the corrupt count
    lin = pipe.lineage.read(spark).collect()
    assert all(r["rows_corrupt"] == 3 for r in lin)

    # replay idempotency: re-applying the epoch must not duplicate the
    # quarantine rows (epoch-named overwrite)
    pipe.apply_batch(batch, epoch_id=0)
    assert pipe.quarantine.read(spark).count() == 3

# ---------------------------------------------------------------------------
# typed evolved-column promotion (VERDICT r4 item 5)
# ---------------------------------------------------------------------------


def test_widen_type_lattice():
    from changedatacapture_spark.operators.evolution import widen_type

    assert widen_type(None, "bigint") == "bigint"
    assert widen_type("bigint", "bigint") == "bigint"
    assert widen_type("bigint", "double") == "double"
    assert widen_type("double", "bigint") == "double"
    assert widen_type("bigint", "string") == "string"
    assert widen_type("timestamp", "bigint") == "string"
    assert widen_type("string", "bigint") == "string"  # never narrows


def _env_batch_extra(spark, rows):
    """rows: (op, url, text, ts, pos, extra-dict)."""
    data = []
    for op, url, text, ts, pos, extra in rows:
        payload = {
            "url": url,
            "warc_ts": ts,
            "html": None,
            "text": text,
            "lang": "en",
            "extra": extra,
        }
        data.append(
            {
                "op": op,
                "before": None,
                "after": payload,
                "source": {"db": "d", "table": "t", "file": "f", "pos": pos},
                "ts_ms": 0,
            }
        )
    return spark.createDataFrame(data, ENVELOPE_SCHEMA)


def test_evolved_columns_promote_typed_and_rewiden(spark, tmp_path):
    """Epoch 0: every x_views value parses as bigint → the public read()
    serves x_views AS bigint (logical type; parquet stays string). Epoch 1
    brings a non-numeric value → the column RE-WIDENS to string, old rows
    included — a metadata change, no file rewrite. x_label never parses →
    string from the start; x_score parses as double."""
    pipe = CdcPipeline(str(tmp_path / "lake"), n_buckets=4, with_chunks=False)
    pipe.apply_batch(
        _env_batch_extra(
            spark,
            [
                ("c", "a", "t", TS, 1, {"views": "123", "label": "abc", "score": "1.5"}),
                ("c", "b", "t", TS, 2, {"views": "456", "score": "2"}),
            ],
        ),
        epoch_id=0,
    )
    assert pipe.pages.evolved_types() == {
        "x_views": "bigint",
        "x_label": "string",
        "x_score": "double",
    }
    df = pipe.pages.read(spark)
    types = dict(df.dtypes)
    assert types["x_views"] == "bigint" and types["x_score"] == "double"
    got = {r["url"]: r for r in df.collect()}
    assert got["a"]["x_views"] == 123 and got["b"]["x_score"] == 2.0

    # physical storage stays string (compaction-safe)
    assert dict(pipe.pages.schema_columns())["x_views"] == "string"

    # widening conflict: a later string observation re-widens — old long
    # values come back as their original strings
    pipe.apply_batch(
        _env_batch_extra(
            spark,
            [("c", "c", "t", TS + dt.timedelta(seconds=1), 3, {"views": "many"})],
        ),
        epoch_id=1,
    )
    assert pipe.pages.evolved_types()["x_views"] == "string"
    df2 = pipe.pages.read(spark)
    assert dict(df2.dtypes)["x_views"] == "string"
    vals = {r["url"]: r["x_views"] for r in df2.collect()}
    assert vals == {"a": "123", "b": "456", "c": "many"}

    # the typed view survives compaction (physical rewrite stays string,
    # metadata carries forward like the truncate horizon)
    pipe.pages.compact(spark)
    assert pipe.pages.evolved_types()["x_views"] == "string"
    assert pipe.pages.evolved_types()["x_score"] == "double"
    df3 = pipe.pages.read(spark)
    assert dict(df3.dtypes)["x_score"] == "double"
    assert {r["url"]: r["x_score"] for r in df3.collect()} == {
        "a": 1.5,
        "b": 2.0,
        "c": None,
    }
