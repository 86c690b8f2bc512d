"""Import-guarded REAL-model embedding adapter (VERDICT r3 item 4).

The reference embeds chunks with a sentence-transformers model loaded once
per process (main.py:45 ``SentenceTransformer('all-MiniLM-L6-v2')``,
incremental_pinecone_updater.py:25-27). This engine keeps the embedding
stage pluggable (``CdcPipeline(embed_fn=...)``); this module supplies the
production plug the same way ``multimodal.py`` guards Pillow:

- ``sentence-transformers`` present → the model is loaded LAZILY, ONCE PER
  PYTHON WORKER (a module-level cache keyed by model name — never pickled,
  never re-loaded per batch), and chunks are encoded in ``batch_size``
  slices through ``model.encode`` — the Arrow-batched vectorized path.
- absent (this container) → a hard ImportError at first batch by DEFAULT
  (``fallback=False`` — a deployment missing the library on its executor
  workers must fail loudly, never silently ship stub vectors; ADVICE r4);
  ``fallback=True`` is the explicit opt-in to the clearly-marked
  deterministic stub (``transform.stub_embed_one``, the oracle-pinned
  md5-arithmetic stub), and even then each python worker logs ONE warning
  to stderr the first time the fallback engages.
- ``model=`` injects a ready model OBJECT (any ``.encode(list[str]) →
  ndarray``) — the test seam that exercises the real batching path without
  the library (tests/test_embed_adapter.py).

Scale notes: the UDF body sees one Arrow batch at a time, so model memory is
per-worker O(1) and throughput scales with executor python workers; keep
OMP/BLAS threads at 1 per worker (CLAUDE.md) so N workers don't fight over
cores. The chunk-level reuse join in the driver
(streaming/driver.py apply_chunks) gates this stage exactly as it gates the
stub: only CHANGED chunks reach ``encode``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf

from .transform import stub_embed_one

# one model instance per python worker process, keyed by model name
_WORKER_MODELS: dict[str, object] = {}
# once-per-worker stub-fallback warning latch (keyed by model name)
_WARNED_FALLBACK: set[str] = set()


def _warn_fallback_once(model_name: str) -> None:
    if model_name in _WARNED_FALLBACK:
        return
    _WARNED_FALLBACK.add(model_name)
    import sys

    print(
        f"changedatacapture_spark.embed_adapter: sentence-transformers is not "
        f"importable in this python worker — falling back to the DETERMINISTIC "
        f"STUB instead of model '{model_name}'. Stub vectors are NOT real "
        f"embeddings; install the library on executors or pass model=.",
        file=sys.stderr,
        flush=True,
    )


def _load_model(model_name: str):
    """Lazy per-worker model load; raises ImportError when the library is
    unavailable (caller decides whether to fall back)."""
    mdl = _WORKER_MODELS.get(model_name)
    if mdl is None:
        from sentence_transformers import SentenceTransformer  # import-guard

        mdl = SentenceTransformer(model_name)
        _WORKER_MODELS[model_name] = mdl
    return mdl


def have_sentence_transformers() -> bool:
    try:
        import sentence_transformers  # noqa: F401

        return True
    except ImportError:
        return False


def make_model_embed_fn(
    model_name: str = "sentence-transformers/all-MiniLM-L6-v2",
    *,
    batch_size: int = 64,
    normalize: bool = True,
    model=None,
    fallback: bool = False,
):
    """Build a ``pandas_udf("array<float>")`` suitable for
    ``CdcPipeline(embed_fn=...)`` / ``transform.chunk_pages(embed_fn=...)``.

    A user wiring real MiniLM writes exactly::

        pipe = CdcPipeline(lake, with_embeddings=True,
                           embed_fn=make_model_embed_fn("all-MiniLM-L6-v2"))

    ``model`` (test seam / pre-loaded object) takes precedence over
    ``model_name``; it must expose ``encode(list[str], batch_size=...)``
    returning a 2-D ndarray. With neither the library nor ``model``, the
    DEFAULT ``fallback=False`` raises ImportError at the first batch —
    stub vectors must never ship unnoticed (ADVICE r4); ``fallback=True``
    explicitly opts into the deterministic stub and logs a once-per-worker
    stderr warning when it engages.
    """
    injected = model

    @pandas_udf("array<float>")
    def model_embed(content: pd.Series) -> pd.Series:
        mdl = injected
        if mdl is None:
            try:
                mdl = _load_model(model_name)
            except ImportError:
                if not fallback:
                    raise
                _warn_fallback_once(model_name)
                return content.map(stub_embed_one)
        # encode ONLY the non-null texts, in batch_size slices — the
        # vectorized shape the model amortizes (tokenizer + forward pass
        # batched), never one text per call
        texts: list[str] = []
        positions: list[int] = []
        for i, t in enumerate(content.tolist()):
            if t is not None:
                positions.append(i)
                texts.append(t)
        out: list[list[float] | None] = [None] * len(content)
        for start in range(0, len(texts), batch_size):
            chunk = texts[start : start + batch_size]
            vecs = np.asarray(
                mdl.encode(chunk, batch_size=batch_size), dtype=np.float32
            )
            if normalize:
                norms = np.linalg.norm(vecs, axis=1, keepdims=True)
                norms[norms == 0.0] = 1.0
                vecs = vecs / norms
            for j, v in enumerate(vecs):
                out[positions[start + j]] = [float(x) for x in v]
        return pd.Series(out, index=content.index)

    return model_embed
