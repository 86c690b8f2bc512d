"""Event-time windowed aggregations (streaming.windows): batch/stream parity
and watermark behavior."""

from changedatacapture_spark import gen
from changedatacapture_spark.operators import envelope
from changedatacapture_spark.streaming import windows


def test_change_rate_batch(spark, tmp_path, testdata_dir):
    seg = str(tmp_path / "log")
    gen.generate_small(seg, n_urls=20, n_events=200, seed=21, testdata_dir=testdata_dir)
    parsed = envelope.parse_envelope(envelope.read_segments(spark, seg))
    out = windows.change_rate(parsed, window="1 minute").collect()
    assert out
    total = sum(r["n_events"] for r in out)
    assert total == parsed.count()
    ops = {r["op"] for r in out}
    assert ops <= {"c", "u", "d", "r"}
    for r in out:
        assert (r["window_end"] - r["window_start"]).total_seconds() == 60


def test_change_rate_streaming_with_watermark(spark, tmp_path, testdata_dir):
    seg = str(tmp_path / "log")
    gen.generate_small(seg, n_urls=15, n_events=120, seed=23, testdata_dir=testdata_dir)
    src = envelope.read_segments_stream(spark, seg)
    parsed = envelope.parse_envelope(src)
    rates = windows.change_rate(parsed, window="1 minute", watermark="5 minutes")
    q = (
        rates.writeStream.format("memory")
        .queryName("rates_tbl")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("select sum(n_events) from rates_tbl").first()[0]
    # append mode only emits windows closed by the watermark; the tail windows
    # stay open, so the emitted total is a (non-empty) prefix
    assert got is None or got <= parsed.count()


def test_site_activity(spark, tmp_path, testdata_dir):
    seg = str(tmp_path / "log")
    gen.generate_small(seg, n_urls=30, n_events=150, seed=29, testdata_dir=testdata_dir)
    parsed = envelope.parse_envelope(envelope.read_segments(spark, seg))
    out = windows.site_activity(parsed).collect()
    assert out
    assert all(r["site"].startswith("site-") for r in out)


def test_url_sessions_match_python_fold(spark, tmp_path, testdata_dir):
    """session_window semantics: events merge while each arrives before the
    previous session's end (last event + gap); session_end = last + gap."""
    import datetime as dt

    from changedatacapture_spark import gen
    from changedatacapture_spark.operators import envelope
    from changedatacapture_spark.streaming.windows import url_sessions

    seg = str(tmp_path / "log")
    events = gen.generate_small(
        seg, n_urls=10, n_events=200, seed=61, dup_frac=0.0, tombstone_frac=0.0,
        late_frac=0.2, testdata_dir=testdata_dir,
    )
    parsed = envelope.parse_envelope(envelope.read_segments(spark, seg))
    gap = dt.timedelta(minutes=5)
    got = {
        (r["url"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in url_sessions(parsed, gap="5 minutes").collect()
    }

    per_url: dict[str, list[dt.datetime]] = {}
    for e in events:
        p = e.get("after") or e.get("before")
        per_url.setdefault(p["url"], []).append(p["warc_ts"])
    exp = {}
    for url, times in per_url.items():
        times.sort()
        start, end, n = None, None, 0
        for t in times:
            if start is None or t >= end:
                if start is not None:
                    exp[(url, start)] = (end, n)
                start, end, n = t, t + gap, 1
            else:
                end, n = t + gap, n + 1
        exp[(url, start)] = (end, n)
    assert got == exp
