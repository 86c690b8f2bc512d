"""Real-model embedding adapter (VERDICT r3 item 4): the import-guarded
``make_model_embed_fn`` drives the model's BATCHED encode path, the
chunk-level reuse join still gates it (only changed chunks reach encode),
and without the library it degrades to the oracle-pinned deterministic stub
— mirroring multimodal.py's Pillow guard."""

import datetime as dt
import hashlib
import json

import numpy as np
import pandas as pd

from changedatacapture_spark import oracle
from changedatacapture_spark.functions.embed_adapter import (
    have_sentence_transformers,
    make_model_embed_fn,
)
from changedatacapture_spark.operators.envelope import ENVELOPE_SCHEMA
from changedatacapture_spark.streaming.driver import CdcPipeline

TS = dt.datetime(2024, 1, 1)
T1 = "1. alpha\nbody-a stays the same\n2. beta\nbody-b version one\n3. gamma\nthird part"
T2 = "1. alpha\nbody-a stays the same\n2. beta\nbody-b version TWO changed\n3. gamma\nthird part"
S1 = "1. solo\nstable content here"


def _env_batch(spark, rows):
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


def test_adapter_batching_path_and_reuse_gating(spark, tmp_path):
    """The fake model object (the adapter's injection seam) logs every
    encode call from inside the executor workers: epoch 0 must arrive
    BATCHED (several texts per call, each call ≤ batch_size), and after an
    update that changes one chunk of one url, epoch 1's encode log must
    contain ONLY that chunk — the reuse join gates the adapter exactly as
    it gates the stub."""
    log = str(tmp_path / "encode_log")

    class FakeModel:
        def __init__(self, log_path):
            self.log_path = log_path

        def encode(self, texts, batch_size=None):
            with open(self.log_path, "a") as f:
                f.write(
                    json.dumps(
                        [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
                    )
                    + "\n"
                )
            return np.stack(
                [np.array([float(len(t)), 7.0, 0.0], dtype=np.float32) for t in texts]
            )

    fn = make_model_embed_fn(model=FakeModel(log), batch_size=2, normalize=False)
    pipe = CdcPipeline(
        str(tmp_path / "lake"), n_buckets=2, with_embeddings=True, embed_fn=fn
    )

    pipe.apply_batch(
        _env_batch(spark, [("c", "u1", T1, TS, 1), ("c", "u2", S1, TS, 2)]),
        epoch_id=0,
    )
    calls0 = [json.loads(line) for line in open(log).read().splitlines()]
    seen0 = {h for call in calls0 for h in call}
    exp0 = {
        hashlib.md5(c["content"].encode("utf-8")).hexdigest()
        for t in (T1, S1)
        for c in oracle.chunk_by_sections(t)
    }
    assert seen0 == exp0, "epoch 0 must embed exactly the initial chunks"
    assert all(len(c) <= 2 for c in calls0), "a call exceeded batch_size"
    assert any(len(c) > 1 for c in calls0), (
        "every call had one text — the batching path never engaged"
    )

    # stored vectors came through the model (len marker), not the stub
    embs = {
        r["content"]: list(r["embedding"])
        for r in pipe.chunks.read(spark).collect()
    }
    for content, v in embs.items():
        assert v == [float(len(content)), 7.0, 0.0]

    # epoch 1: u1 changes ONE chunk; u2 is a content-identical no-op
    open(log, "w").close()
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
    calls1 = [json.loads(line) for line in open(log).read().splitlines()]
    seen1 = {h for call in calls1 for h in call}
    changed = {
        hashlib.md5(c["content"].encode("utf-8")).hexdigest()
        for c in oracle.chunk_by_sections(T2)
        if c["content"] not in [x["content"] for x in oracle.chunk_by_sections(T1)]
    }
    assert seen1 == changed, (
        "reuse join failed to gate the adapter: encode saw unchanged chunks"
    )
    # table state is the oracle's, with reused epoch-0 vectors intact
    got = {}
    for r in pipe.chunks.read(spark).collect():
        got.setdefault(r["url"], []).append(r)
    u1 = sorted(got["u1"], key=lambda r: r["chunk_index"])
    assert [c["content"] for c in u1] == [
        c["content"] for c in oracle.chunk_by_sections(T2)
    ]
    for r in u1:
        assert list(r["embedding"]) == [float(len(r["content"])), 7.0, 0.0]


def test_adapter_fallback_matches_pinned_stub(spark):
    """With fallback=True explicitly opted in (the r5 default is False —
    a missing library must raise, ADVICE r4), the adapter degrades to the
    byte-pinned deterministic stub — same vectors the DuckDB oracle
    recomputes."""
    assert not have_sentence_transformers(), (
        "container grew the real library — this test now needs a skip guard"
    )
    from changedatacapture_spark.functions.transform import embed_stub_udf

    df = spark.createDataFrame(
        [("a", "1. s\nhello world"), ("b", "2. t\nanother text"), ("c", None)],
        "id string, content string",
    ).repartition(2)
    fn = make_model_embed_fn(fallback=True)  # explicit opt-in to the stub
    rows = (
        df.withColumn("adapter", fn(df["content"]))
        .withColumn("stub", embed_stub_udf(df["content"]))
        .collect()
    )
    for r in rows:
        a = None if r["adapter"] is None else list(r["adapter"])
        s = None if r["stub"] is None else list(r["stub"])
        assert a == s, f"fallback diverged from the pinned stub for id={r['id']}"


def test_adapter_default_raises_without_library(spark):
    """DEFAULT behavior without the library and without model=: the first
    batch raises ImportError instead of silently shipping stub vectors
    (ADVICE r4 low — fallback is opt-in now)."""
    assert not have_sentence_transformers()
    import pytest

    df = spark.createDataFrame([("a", "text")], "id string, content string")
    fn = make_model_embed_fn()
    with pytest.raises(Exception) as ei:
        df.withColumn("v", fn(df["content"])).collect()
    assert "ImportError" in str(ei.value) or "sentence_transformers" in str(ei.value)
