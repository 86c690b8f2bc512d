"""Incremental chunk/embedding semantics (ADVICE r1 high + VERDICT r1 #5):

- a batch winner that LOSES the pages LWW (late event older than the stored
  row) takes NO chunk action — chunks must keep reflecting the pages winner;
- a losing tombstone must not remove the url's chunks;
- an update whose content hash is unchanged skips re-chunk/re-embed entirely
  (the reference's incremental cost cut, incremental_pinecone_updater.py:
  245-277);
- within a re-chunked page, unchanged chunks REUSE their stored embeddings —
  only changed chunks hit the embedding stage (RAG_INCREMENTAL_GUIDE.md:
  255-264 'process only changed fields').
"""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from changedatacapture_spark import oracle
from changedatacapture_spark.operators.envelope import ENVELOPE_SCHEMA
from changedatacapture_spark.streaming.driver import CdcPipeline

TS = dt.datetime(2024, 1, 1)

T1 = "1. alpha\nbody-a stays the same\n2. beta\nbody-b version one"
T2 = "1. alpha\nbody-a stays the same\n2. beta\nbody-b version TWO changed"
T0_OLD = "1. alpha\nancient version\n2. beta\nancient too"
S1 = "1. solo\nstable content here"


def _env_batch(spark, rows):
    """rows: (op, url, text, ts, pos). Builds envelope-schema batches."""
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


def _chunks_by_url(spark, pipe):
    out = {}
    for r in pipe.chunks.read(spark).collect():
        out.setdefault(r["url"], []).append(r)
    for v in out.values():
        v.sort(key=lambda r: r["chunk_index"])
    return out


def test_losers_skip_and_embedding_reuse(spark, tmp_path):
    @pandas_udf("array<float>")
    def mark_embed(content: pd.Series) -> pd.Series:
        return content.map(lambda t: None if t is None else [float(len(t)), 1.0])

    pipe = CdcPipeline(
        str(tmp_path / "lake"), n_buckets=4, with_embeddings=True, embed_fn=mark_embed
    )

    # epoch 0: url1=T1, url2=S1
    pipe.apply_batch(
        _env_batch(
            spark,
            [("c", "u1", T1, TS, 1), ("c", "u2", S1, TS, 2)],
        ),
        epoch_id=0,
    )
    chunks0 = _chunks_by_url(spark, pipe)
    assert [c["content"] for c in chunks0["u1"]] == [
        c["content"] for c in oracle.chunk_by_sections(T1)
    ]

    # epoch 1: u1 updated (section 2 changed only), u2 no-op update (same
    # content, newer event). The strict embed fn proves the embedding stage
    # sees ONLY the changed chunk: any other content fails the job.
    @pandas_udf("array<float>")
    def strict_embed(content: pd.Series) -> pd.Series:
        bad = [t for t in content.dropna() if "version TWO changed" not in t]
        if bad:
            raise AssertionError(f"re-embedded unchanged content: {bad!r}")
        return content.map(lambda t: [float(len(t)), 2.0])

    pipe.embed_fn = strict_embed
    pipe.apply_batch(
        _env_batch(
            spark,
            [
                ("u", "u1", T2, TS + dt.timedelta(seconds=10), 10),
                ("u", "u2", S1, TS + dt.timedelta(seconds=10), 11),
            ],
        ),
        epoch_id=1,
    )
    chunks1 = _chunks_by_url(spark, pipe)
    assert [c["content"] for c in chunks1["u1"]] == [
        c["content"] for c in oracle.chunk_by_sections(T2)
    ]
    # unchanged chunk (section 1) kept its epoch-0 embedding (marker 1.0),
    # the changed chunk (section 2) was re-embedded (marker 2.0)
    markers = {c["content"].split("\n")[0]: c["embedding"][1] for c in chunks1["u1"]}
    assert markers["1. alpha"] == 1.0, "unchanged chunk was re-embedded"
    assert markers["2. beta"] == 2.0
    # u2's content hash was unchanged → whole url skipped: chunk rows still
    # carry the epoch-0 order key
    assert chunks1["u2"][0]["pos"] == 2, "no-op update must not re-chunk"

    # epoch 2: LATE losers — an older update for u1 and an older delete for
    # u2. Pages LWW keeps the newer rows; chunks must not regress/vanish.
    @pandas_udf("array<float>")
    def must_not_embed(content: pd.Series) -> pd.Series:
        if len(content.dropna()):
            raise AssertionError(f"losing events reached the embed stage: {content.tolist()!r}")
        return content.map(lambda t: [0.0])

    pipe.embed_fn = must_not_embed
    pipe.apply_batch(
        _env_batch(
            spark,
            [
                ("u", "u1", T0_OLD, TS + dt.timedelta(seconds=5), 5),
                ("d", "u2", None, TS + dt.timedelta(seconds=6), 6),
            ],
        ),
        epoch_id=2,
    )
    pages = {r["url"]: r["text"] for r in pipe.pages.read(spark).collect()}
    assert pages == {"u1": T2, "u2": S1}
    chunks2 = _chunks_by_url(spark, pipe)
    assert [c["content"] for c in chunks2["u1"]] == [
        c["content"] for c in oracle.chunk_by_sections(T2)
    ]
    assert "u2" in chunks2, "losing tombstone removed live chunks"

    # epoch 3: a genuinely newer delete for u2 wins and clears its chunks
    pipe.apply_batch(
        _env_batch(spark, [("d", "u2", None, TS + dt.timedelta(seconds=60), 60)]),
        epoch_id=3,
    )
    assert "u2" not in _chunks_by_url(spark, pipe)
    assert {r["url"] for r in pipe.pages.read(spark).collect()} == {"u1"}


def test_zero_chunk_update_clears_chunks(spark, tmp_path):
    """An update whose new text has no sections must drop the url's chunks
    (LWW set-tombstone), and a later re-sectioned update restores them."""
    pipe = CdcPipeline(str(tmp_path / "lake"), n_buckets=2)
    pipe.apply_batch(_env_batch(spark, [("c", "u1", T1, TS, 1)]), epoch_id=0)
    assert "u1" in _chunks_by_url(spark, pipe)

    pipe.apply_batch(
        _env_batch(
            spark, [("u", "u1", "no headings at all", TS + dt.timedelta(seconds=9), 9)]
        ),
        epoch_id=1,
    )
    assert "u1" not in _chunks_by_url(spark, pipe)

    pipe.apply_batch(
        _env_batch(spark, [("u", "u1", T2, TS + dt.timedelta(seconds=20), 20)]),
        epoch_id=2,
    )
    got = _chunks_by_url(spark, pipe)["u1"]
    assert [c["content"] for c in got] == [c["content"] for c in oracle.chunk_by_sections(T2)]


def test_replay_after_pages_commit_rebuilds_chunks_without_skip(spark, tmp_path):
    """Crash between the pages and chunks commits, where the crashed epoch
    carried a CHANGED content: the replay sees post-merge state (hash equal)
    and must NOT hash-skip, or the chunks epoch would be lost forever."""
    base = str(tmp_path / "lake")
    crashed = CdcPipeline(base, n_buckets=2, with_chunks=False)
    b0 = _env_batch(spark, [("c", "u1", T1, TS, 1)])
    crashed.apply_batch(b0, epoch_id=0)
    assert crashed.chunks.current_snapshot() is None

    pipe = CdcPipeline(base, n_buckets=2, with_chunks=True)
    pipe.apply_batch(b0, epoch_id=0)  # replay: pages idempotent, chunks applied
    got = _chunks_by_url(spark, pipe)["u1"]
    assert [c["content"] for c in got] == [c["content"] for c in oracle.chunk_by_sections(T1)]


@pytest.mark.parametrize("late_op", ["u", "d"])
def test_cross_epoch_late_loser_never_diverges(spark, tmp_path, late_op):
    """The exact ADVICE r1 scenario, minimal form: winner in epoch N, loser
    (older update / older tombstone) in epoch N+1 → pages and chunks must
    agree afterwards."""
    pipe = CdcPipeline(str(tmp_path / "lake"), n_buckets=2)
    pipe.apply_batch(
        _env_batch(spark, [("c", "u1", T2, TS + dt.timedelta(seconds=50), 50)]), epoch_id=0
    )
    pipe.apply_batch(
        _env_batch(
            spark,
            [(late_op, "u1", T0_OLD if late_op == "u" else None, TS + dt.timedelta(seconds=10), 10)],
        ),
        epoch_id=1,
    )
    pages = {r["url"]: r["text"] for r in pipe.pages.read(spark).collect()}
    assert pages == {"u1": T2}
    got = _chunks_by_url(spark, pipe)["u1"]
    assert [c["content"] for c in got] == [c["content"] for c in oracle.chunk_by_sections(T2)]
