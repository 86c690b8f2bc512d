"""Property-based LWW fold testing (SURVEY.md §5.6): random op sequences per
key must fold to the same final state as the sequential oracle — including
out-of-order timestamps, ties broken by pos, snapshot-first r events, and
delete/re-create interleavings."""

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from changedatacapture_spark import oracle
from changedatacapture_spark.operators import apply as apply_ops
from changedatacapture_spark.schemas import ENVELOPE_SCHEMA

T0 = dt.datetime(2024, 1, 1)

# per-key op sequences: r only allowed first (Debezium snapshot-first contract)
_stream_op = st.sampled_from(["c", "u", "d"])
_key_seq = st.tuples(
    st.booleans(),  # leading snapshot read?
    st.lists(st.tuples(_stream_op, st.integers(0, 500), st.integers(0, 99)), min_size=1, max_size=8),
)
_log = st.dictionaries(st.integers(0, 5), _key_seq, min_size=1, max_size=6)


def _build_events(log_spec):
    events = []
    pos = 0
    for key_id, (snap, ops) in sorted(log_spec.items()):
        url = f"https://k/{key_id}"
        if snap:
            pos += 1
            payload = {
                "url": url,
                "warc_ts": T0,
                "html": None,
                "text": "snapshot",
                "lang": "en",
                "extra": None,
            }
            events.append(
                {"op": "r", "before": None, "after": payload,
                 "source": {"db": "d", "table": "t", "file": "f", "pos": pos}, "ts_ms": 0}
            )
        for op, ts_off, val in ops:
            pos += 1
            ts = T0 + dt.timedelta(seconds=1 + ts_off)
            payload = {
                "url": url, "warc_ts": ts, "html": None,
                "text": f"v{val}", "lang": "en", "extra": None,
            }
            if op == "d":
                ev = {"op": "d", "before": payload, "after": None}
            else:
                ev = {"op": op, "before": None, "after": payload}
            ev["source"] = {"db": "d", "table": "t", "file": "f", "pos": pos}
            ev["ts_ms"] = 0
            events.append(ev)
    return events


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(_log)
def test_random_op_sequences_fold_like_oracle(spark, log_spec):
    events = _build_events(log_spec)
    expected = oracle.fold_events(events)

    from changedatacapture_spark.operators import envelope as env_ops

    df = spark.createDataFrame(events, ENVELOPE_SCHEMA)
    parsed = env_ops.parse_envelope(df)
    got = {r["url"]: r.asDict() for r in apply_ops.fold_final_state(parsed).collect()}

    assert set(got) == set(expected)
    for url, exp in expected.items():
        assert got[url]["text"] == exp["text"], (url, got[url], exp, events)
        assert got[url]["warc_ts"] == exp["warc_ts"]
