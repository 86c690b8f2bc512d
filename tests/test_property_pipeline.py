"""Property-based end-to-end pipeline testing: random op sequences split into
micro-batch epochs (with cross-epoch LATE events via a deterministic
interleave) must leave pages AND derived chunks exactly at the oracle fold —
exercising the merge-on-read LWW, the won/changed chunk gating, the
content-hash no-op skip (values collide on purpose), and zero-chunk
tombstones (headingless texts)."""

import datetime as dt
import shutil
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from changedatacapture_spark import oracle
from changedatacapture_spark.schemas import ENVELOPE_SCHEMA
from changedatacapture_spark.streaming.driver import CdcPipeline

T0 = dt.datetime(2024, 1, 1)

_stream_op = st.sampled_from(["c", "u", "d"])
# values collide (0..3) → frequent content-no-op updates; val%5==0 → text
# with no headings → zero chunks
_key_seq = st.tuples(
    st.booleans(),
    st.lists(st.tuples(_stream_op, st.integers(0, 400), st.integers(0, 5)), min_size=1, max_size=7),
)
_log = st.dictionaries(st.integers(0, 4), _key_seq, min_size=1, max_size=5)


def _text(val: int) -> str:
    if val % 5 == 0:
        return f"plain text without headings {val}"
    return f"1. section {val}\nbody line {val}\n## extra\ntail {val}"


def _build_events(log_spec):
    events = []
    pos = 0
    for key_id, (snap, ops) in sorted(log_spec.items()):
        url = f"https://k/{key_id}"
        if snap:
            pos += 1
            payload = {"url": url, "warc_ts": T0, "html": None,
                       "text": _text(1), "lang": "en", "extra": None}
            events.append({"op": "r", "before": None, "after": payload,
                           "source": {"db": "d", "table": "t", "file": "f", "pos": pos},
                           "ts_ms": 0})
        for op, ts_off, val in ops:
            pos += 1
            ts = T0 + dt.timedelta(seconds=1 + ts_off)
            payload = {"url": url, "warc_ts": ts, "html": None,
                       "text": _text(val), "lang": "en", "extra": None}
            ev = ({"op": "d", "before": payload, "after": None}
                  if op == "d" else {"op": op, "before": None, "after": payload})
            ev["source"] = {"db": "d", "table": "t", "file": "f", "pos": pos}
            ev["ts_ms"] = 0
            events.append(ev)
    return events


@pytest.mark.slow
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(_log, st.integers(0, 3))
def test_epoched_pipeline_matches_oracle(spark, log_spec, n_extra_epochs):
    events = _build_events(log_spec)
    # deterministic interleave so per-key sequences SPAN epochs (late events
    # arrive in later epochs than newer ones)
    arrival = sorted(events, key=lambda e: (e["source"]["pos"] * 2654435761) % (1 << 32))
    n_epochs = min(1 + n_extra_epochs, len(arrival))
    per = (len(arrival) + n_epochs - 1) // n_epochs

    work = tempfile.mkdtemp()
    try:
        pipe = CdcPipeline(work + "/lake", n_buckets=2)
        for epoch, start in enumerate(range(0, len(arrival), per)):
            batch = spark.createDataFrame(arrival[start : start + per], ENVELOPE_SCHEMA)
            pipe.apply_batch(batch, epoch_id=epoch)

        expected = oracle.fold_events(events)
        pages_df = pipe.pages.read(spark)
        pages = ({r["url"]: r.asDict() for r in pages_df.collect()}
                 if pages_df is not None else {})
        assert set(pages) == set(expected), (log_spec, n_epochs)
        for url, exp in expected.items():
            assert pages[url]["text"] == exp["text"], (url, log_spec, n_epochs)

        got_chunks: dict[str, list] = {}
        chunks_df = pipe.chunks.read(spark)
        if chunks_df is not None:
            for r in chunks_df.collect():
                got_chunks.setdefault(r["url"], []).append(r)
        for url, exp in expected.items():
            exp_chunks = oracle.chunk_by_sections(exp["text"])
            if not exp_chunks:
                assert url not in got_chunks, (url, log_spec, n_epochs)
                continue
            got = sorted(got_chunks[url], key=lambda r: r["chunk_index"])
            assert [c["content"] for c in got] == [c["content"] for c in exp_chunks], (
                url, log_spec, n_epochs,
            )
        assert set(got_chunks) <= set(expected)
    finally:
        shutil.rmtree(work, ignore_errors=True)
