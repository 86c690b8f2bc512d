"""Iceberg-style lake table on plain parquet + an atomic JSON snapshot log,
with **merge-on-read** MERGE semantics.

This sandbox has no Iceberg/Delta jars (SURVEY.md §7 'design stance'), so the
engine ships a thin lake layer with the same semantics the north rule needs;
the interface is exactly what an Iceberg backend would implement:

- **Atomic commits**: each commit writes data files into an immutable
  ``data/commit-{snapshot}-{tag}/`` directory first, then publishes a
  snapshot JSON and atomically swaps the ``_meta/_current.json`` pointer
  (``os.replace``). A crash between the two leaves only unreferenced files —
  never a torn table (SURVEY.md §7 'idempotent commits without real
  Iceberg').
- **Optimistic concurrency (round 6)**: multiple writer PROCESSES are safe —
  the publish is a CAS on the snapshot id serialized by an advisory flock
  (``_publish``); a commit built against a superseded snapshot raises
  :class:`CommitConflictError`, append commits rebuild + retry inside
  ``_commit``, and compact/replace_keys re-plan their whole body against
  fresh state, so a maintenance job racing the streaming driver can never
  drop either side's commit (tests/test_concurrency.py).
- **Idempotent epoch commits**: every snapshot records the ``epoch_id`` it
  applied; the write methods no-op when the epoch is already in the log — so
  ``foreachBatch`` replays after a crash are exactly-once (the reference is
  at-most-once: auto-commit before apply, kafka_cdc_to_rag.py:26).
- **Merge-on-read MERGE**: ``merge_lww``/``merge_sets`` APPEND the batch's
  rows as per-bucket delta files and resolve LWW at read time with the same
  ``max_by`` order key; ``compact`` folds deltas back into one file per
  bucket. Per-epoch write cost is **O(batch)**, not O(touched table data) —
  round 1's copy-on-write rewrite of every touched bucket was per-epoch
  read+write amplification ≈ O(live table) (VERDICT r1 'scale-killer'),
  because uniformly-hashed keys touch every bucket regardless of
  ``n_buckets``. Equivalent to Iceberg v2 merge-on-read (positional/equality
  deletes + data files resolved at scan).
- **Bucket layout**: rows are hash-bucketed by the merge key
  (``pmod(xxhash64(url), n_buckets)``); the bucket id is stable across
  batches, so delta files co-locate with their base files by construction
  and point lookups prune to one bucket's file list.
- **Manifest split (Iceberg manifest-file twin)**: the snapshot JSON holds
  one content-addressed manifest *reference* per bucket; the per-bucket file
  list (path, row count, key bloom) lives in an immutable side manifest that
  is rewritten only when that bucket changes. A commit therefore rewrites
  O(touched buckets) metadata, never O(total live files) — at 10^5 buckets ×
  lazy compaction the old inline file map was a per-epoch driver-side
  O(files) JSON serialization (VERDICT r2 'what's wrong #3').
- **File-level key skipping**: every data file's manifest entry carries a
  Bloom filter over its merge keys (built at commit time from the written
  file's key column — the Iceberg puffin/bloom stats twin). Reads that know
  their probe keys (`read_keys`, `read_bucket_winners(probe_keys=...)`)
  skip files whose bloom excludes every probe key: a 1-url point read
  touches its bucket's *matching* delta files only, not all of them, and the
  driver's pre-MERGE probe / embedding-reuse pre-read prune the same way
  (VERDICT r2 'scale-killer to name this round'). No false negatives: a
  file containing a probe key is always kept; files too large to bloom
  (``bloom_max_keys``) are conservatively always read.
- **LWW tombstones**: deletes are kept as ``is_deleted=1`` rows carrying
  their (warc_ts, pos), so replayed older events cannot resurrect a deleted
  key; readers filter them after resolution (SURVEY.md §7 'cross-batch LWW
  with deletes').
- **Schema merge**: the snapshot carries the table schema; readers scan with
  that explicit schema, so older delta/base files are null-filled for later
  columns (Iceberg schema-evolution twin; mirrors detect_json_changes,
  rag/incremental_rag_system.py:216-243) and no footer inference runs.

Resolution modes (constructor ``mode``):

- ``"row"`` — ≤1 live row per key; winner = ``max_by(payload, order_key)``
  (the pages table).
- ``"set"`` — a key's rows form a *set* sharing one (op, warc_ts, pos)
  order key (e.g. all chunks of one page version); the winning set is the
  key's max-order group, kept wholesale (the chunks table). A delete or a
  zero-row set is a single ``is_deleted=1`` marker row. Cross-epoch
  duplicate deliveries of the same set (outside the epoch log's window) are
  broken deterministically by the commit file name — the newest commit's
  copy wins, never both.
- ``"replace"`` — no resolution; the table is maintained by
  ``replace_keys`` full-bucket rewrites only (reference SET1 semantics).

Write contract: ``merge_lww``/``merge_sets`` reduce the batch to per-key
winners/sets themselves by default (``pre_reduced=False``), so every data
file holds ≤1 row-set per key — the invariant the ≤1-file-per-bucket
resolution fast path rests on. Callers that already reduced (the CDC driver:
operators.apply.upsert_deltas) pass ``pre_reduced=True`` to skip the
redundant aggregation.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import shutil
import uuid
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from ..operators.evolution import widen_type
from ..operators.lww import _order_key


def _truncate_lit(horizon: list) -> F.Column:
    """The truncate horizon as a literal order-key struct, field-for-field
    comparable with operators.lww.order_key_cols output."""
    k0, k1, k2 = horizon
    return F.struct(
        F.lit(int(k0)).cast("int").alias("k0"),
        F.lit(int(k1)).cast("bigint").alias("k1"),
        F.lit(int(k2)).cast("bigint").alias("k2"),
    )


def _bucket_col(key: str, n_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")


# ---------------------------------------------------------------------------
# Per-file key Bloom filters (manifest stats). Pure-python + md5 so the
# driver can both build (from the written file's key column) and test
# (membership of probe keys) without a Spark job; ~10 bits/key ≈ 1% FP —
# a false positive only costs one extra file read, never a wrong result.
# ---------------------------------------------------------------------------

_BLOOM_BITS_PER_KEY = 10
_BLOOM_K = 7


def _bloom_hashes(key: str) -> tuple[int, int]:
    d = hashlib.md5(key.encode("utf-8")).digest()
    return int.from_bytes(d[:8], "little"), int.from_bytes(d[8:], "little") | 1


def _bloom_hash_pairs(keys) -> list[tuple[int, int]]:
    return [_bloom_hashes(k) for k in keys]


def _bloom_from_pairs(pairs) -> list | None:
    n = len(pairs)
    if n == 0:
        return None
    m = _bloom_m_for(n)
    bits = bytearray(m // 8)
    for h1, h2 in pairs:
        _bloom_insert(bits, m, h1, h2)
    return [m, _BLOOM_K, base64.b64encode(bytes(bits)).decode("ascii")]


def _bloom_build(keys) -> list | None:
    return _bloom_from_pairs(_bloom_hash_pairs(keys))


def _bloom_m_for(n_keys: int) -> int:
    """Bitmap size (bits) for ``n_keys`` keys — the one sizing rule every
    build path shares, so a bloom built in one pass, from merged hash pairs,
    or by OR-ing fixed-``m`` partial bitmaps is byte-identical."""
    return ((n_keys * _BLOOM_BITS_PER_KEY + 63) // 64) * 64


def _bloom_insert(bits: bytearray, m: int, h1: int, h2: int) -> None:
    for i in range(_BLOOM_K):
        pos = (h1 + i * h2) % m
        bits[pos >> 3] |= 1 << (pos & 7)


def _bloom_or(m: int, bitmaps_b64: list[str]) -> list:
    """OR fixed-``m`` partial bitmaps into one bloom entry. Bloom insertion
    commutes, so the OR of per-partition partials equals the single-pass
    build bit for bit (pinned in tests/test_round4.py)."""
    acc = bytearray(m // 8)
    for b64 in bitmaps_b64:
        for i, byte in enumerate(base64.b64decode(b64)):
            acc[i] |= byte
    return [m, _BLOOM_K, base64.b64encode(bytes(acc)).decode("ascii")]


def _bloom_may_contain(bloom: list, probe_hashes: list[tuple[int, int]]) -> bool:
    m, k, b64 = bloom
    bits = base64.b64decode(b64)
    for h1, h2 in probe_hashes:
        hit = True
        for i in range(k):
            pos = (h1 + i * h2) % m
            if not (bits[pos >> 3] >> (pos & 7)) & 1:
                hit = False
                break
        if hit:
            return True
    return False


class KeyProbe:
    """A batch's key-probe handle, built WITHOUT collecting key values to the
    driver (see :func:`build_key_probe`). Accepted wherever ``probe_keys``
    is — ``read_bucket_winners(probe_keys=probe)``.

    Semantics vs the exact-key-list path:

    - file pruning decisions are bit-identical (same ``_bloom_hashes`` /
      bitmap test, evaluated in executor python workers); files the probe
      job never saw (e.g. committed after the probe was built) are
      conservatively KEPT — the handle records proven MISSES, not hits;
    - the row filter is a ``left_semi`` join against the (usually cached)
      keys DataFrame instead of an ``isin`` literal, applied AFTER
      resolution — the probed keys come back exactly resolved, identical to
      the exact path (all their files survive pruning; extras are joined
      away).
    """

    def __init__(self, keys_df: DataFrame, key: str, misses: dict[str, set[str]]):
        self.keys_df = keys_df
        self.key = key
        self._misses = misses  # table path → abs file paths proven key-free
        self.stats: dict[str, dict[str, int]] = {}
        # row_filter=False: skip the post-resolution semi join. ONLY safe for
        # callers that themselves join the result on the probed keys (the
        # CDC driver: every consumer left-joins the batch frame on url, so
        # extra keys — including under-resolved non-probed ones — drop
        # there). The public default keeps the exact-keys contract.
        self.row_filter = True

    def misses_for(self, table_path: str) -> set[str]:
        return self._misses.get(table_path, set())


def build_key_probe(
    spark: SparkSession,
    keys_df: DataFrame,
    key: str,
    tables: list[tuple["LakeTable", list[int]]],
    bucket_counts: dict[int, int] | None = None,
    max_probes_per_bucket: int = 384,
    snapshots: dict[str, dict] | None = None,
) -> KeyProbe:
    """Executor-side file pruning for a batch's keys: ONE ``mapInPandas``
    job over ``keys_df`` tests every key against the candidate file blooms
    of its bucket (candidates = the given tables' touched-bucket files that
    carry a bloom, broadcast as decoded bitmaps) and returns matched file
    ids — O(files) small ints to the driver, never O(keys) strings. This
    replaces the round-4 ``key_skip_max`` driver-side key collect: pruning
    now survives arbitrarily large batches (VERDICT r4 item 1).

    All tables must share the key column, bucket count, and key-hash
    bucketing (the pages/chunks pair does by construction). Workers
    early-out per bucket once every candidate is hit, so huge batches cost
    one cheap pass over the cached keys, not keys × files bloom tests.

    ``bucket_counts`` (per-bucket batch row counts, free from
    ``probe_batch``) gates the job on whether pruning is even possible:
    at ~1% bloom FP per probe, a file probed by p keys survives with
    probability ≥ 1−0.99^p — above ``max_probes_per_bucket`` (default 384:
    survival ≥97.9%) essentially every file hits, so those buckets'
    candidates are skipped (files conservatively kept) and a batch that is
    dense in EVERY bucket runs no job at all. Dense batches thereby keep
    the plain bucket-scope read (zero overhead — the r4 behavior); sparse
    batches — the 10^5-bucket production regime where probes-per-bucket is
    small — keep full file pruning."""
    n_buckets = tables[0][0].n_buckets
    dense = set()
    if bucket_counts is not None:
        dense = {b for b, n in bucket_counts.items() if n > max_probes_per_bucket}
    cand: dict[int, list[tuple[int, int, int, bytes]]] = {}
    owner: list[str] = []  # fid → table path
    paths: list[str] = []  # fid → abs file path
    for t, buckets in tables:
        assert t.bucket_source == "key_hash" and t.key == key, (
            "build_key_probe needs key-hash-bucketed tables sharing the key"
        )
        assert t.n_buckets == n_buckets, "tables must share n_buckets"
        # ``snapshots``: probe a historical snapshot's files instead of the
        # current ones (table path → snapshot dict) — the change feed's
        # pre-window existence probe uses this
        snap = (snapshots or {}).get(t.path) or t.current_snapshot()
        if snap is None:
            continue
        entries = t._entries(snap)
        for b in buckets:
            if b in dense:
                continue  # pruning mathematically dead at this probe count
            for e in entries.get(str(b), []):
                if e.get("bloom") is None:
                    continue  # bloomless/legacy: never prunable, never a miss
                m, k_, b64 = e["bloom"]
                fid = len(paths)
                paths.append(t._abs(e["p"]))
                owner.append(t.path)
                cand.setdefault(int(b), []).append(
                    (fid, int(m), int(k_), base64.b64decode(b64))
                )
    probe = KeyProbe(keys_df, key, {t.path: set() for t, _ in tables})
    probe.stats = {t.path: {"candidates": 0, "pruned": 0} for t, _ in tables}
    for tp in owner:
        probe.stats[tp]["candidates"] += 1
    if not cand:
        return probe
    bc = spark.sparkContext.broadcast(cand)
    src = keys_df.select(
        F.col(key).cast("string").alias("_k"),
        _bucket_col(key, n_buckets).alias("_b"),
    )

    def probe_fn(batches):
        import pandas as _pd

        c = bc.value
        remaining = {b: {f[0] for f in lst} for b, lst in c.items()}
        live = sum(len(r) for r in remaining.values())
        hit: list[int] = []
        for pdf in batches:
            if live == 0:
                break
            for kk, bb in zip(pdf["_k"].tolist(), pdf["_b"].tolist()):
                if live == 0:
                    break
                rem = remaining.get(int(bb))
                if not rem or kk is None:
                    continue
                h1, h2 = _bloom_hashes(kk)
                for fid, m, nk, bits in c[int(bb)]:
                    if fid not in rem:
                        continue
                    ok = True
                    for i in range(nk):
                        pos = (h1 + i * h2) % m
                        if not (bits[pos >> 3] >> (pos & 7)) & 1:
                            ok = False
                            break
                    if ok:
                        hit.append(fid)
                        rem.discard(fid)
                        live -= 1
        yield _pd.DataFrame({"fid": hit}, dtype="int64")

    rows = src.mapInPandas(probe_fn, "fid bigint").collect()
    bc.unpersist()
    hits = {int(r["fid"]) for r in rows}
    for fid in range(len(paths)):
        if fid not in hits:
            probe._misses[owner[fid]].add(paths[fid])
            probe.stats[owner[fid]]["pruned"] += 1
    return probe


class ChangeFeedUnavailableError(RuntimeError):
    """The requested snapshot window cannot be served as a change feed —
    a window snapshot expired (vacuum reclaimed its files), a rewrite
    (replace_keys) or un-flagged truncate lies inside it, or the window
    predates change-feed metadata. The consumer must re-sync from a full
    ``read()`` — silently serving a partial feed would desynchronize any
    downstream mirror. Size ``retention_snapshots`` to the consumer lag."""


class CommitConflictError(RuntimeError):
    """A snapshot publish lost the optimistic-concurrency race: another
    writer committed the same snapshot id first (see LakeTable._publish).
    Append commits retry automatically inside ``_commit``; whole-table
    operations (compact, replace_keys) re-plan against the fresh snapshot
    and retry — their staged data files are unreferenced garbage that
    ``vacuum`` reclaims."""


class StaleEpochError(RuntimeError):
    """An epoch id below the idempotency window's eviction floor arrived —
    a checkpoint-reset/stale-replay ambiguity the engine refuses to resolve
    silently (see LakeTable._check_epoch)."""


class LakeTable:
    """A key-bucketed upsert table with snapshot isolation (merge-on-read).

    Deployment note (ADVICE r4): with the default ``file_stats=True`` every
    merge runs a small distributed stats job (``_file_stats_job``) whose
    python workers import THIS package — executors must carry
    ``changedatacapture_spark`` on their ``PYTHONPATH``/``--py-files``
    (pipelines that ship UDFs already do; a bare library user who cannot
    ship the package should construct the table with ``file_stats=False``
    and lose file-level key skipping, never correctness). The same applies
    to :func:`build_key_probe`."""

    def __init__(
        self,
        path: str,
        key: str = "url",
        n_buckets: int = 16,
        mode: str = "row",
        *,
        file_stats: bool = True,
        bloom_max_keys: int = 200_000,
        bucket_source: str = "key_hash",
        retention_snapshots: int = 0,
    ):
        assert mode in ("row", "set", "replace")
        assert bucket_source in ("key_hash", "column")
        # snapshots record paths relative to the table root, which is
        # absolutized here — a relative root would pin the table to the
        # creating process's CWD
        self.path = os.path.abspath(path)
        self.key = key
        self.n_buckets = n_buckets
        self.mode = mode
        # file_stats: build a per-file key bloom at commit time (one columnar
        # key-column read of each freshly written file). bloom_max_keys caps
        # the bloom size: files with more keys (post-compaction base files of
        # huge buckets) get no bloom and are conservatively always read.
        self.file_stats = file_stats
        self.bloom_max_keys = bloom_max_keys
        # vacuum keeps the files of the newest `retention_snapshots`
        # non-expired snapshots alive in addition to the current one — the
        # time-travel / change-feed retention window (Iceberg's
        # expire-snapshots contract). 0 = reclaim everything superseded
        # immediately (the pre-round-5 behavior).
        self.retention_snapshots = int(retention_snapshots)
        # sliding idempotency-window size (epochs kept verbatim in the
        # snapshot); ids evicted from it raise the monotone epoch_floor —
        # tests shrink this to exercise the floor without 1000 commits
        self.epoch_window = 1000
        # bucket_source="column": rows carry an explicit int ``bucket`` data
        # column (e.g. an LSH bucket of an embedding) instead of hashing the
        # key. A key may then MOVE buckets between versions (its vector
        # moved), so writers add a tombstone in the old bucket and row-mode
        # resolution breaks the resulting same-order tombstone/insert ties
        # in favor of the LIVE row (see _resolve).
        self.bucket_source = bucket_source
        self.meta_dir = os.path.join(self.path, "_meta")
        self.manifest_dir = os.path.join(self.meta_dir, "manifests")
        self.data_dir = os.path.join(self.path, "data")
        os.makedirs(self.manifest_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)
        self._manifest_cache: dict[str, list[dict]] = {}
        # wall-clock of the last commit's write vs stats jobs (telemetry for
        # the bench's phase attribution; no behavior rides on it)
        self.last_commit_timings: dict[str, float] = {}
        self._expired_cache: tuple[int, set[int]] | None = None
        self._adopt_expired_list()
        # the key→bucket mapping is part of the table's physical layout: an
        # existing table's persisted bucket count always wins over the
        # constructor argument (a silent mismatch would split a key across
        # buckets and defeat per-bucket LWW resolution). Rebucket explicitly
        # via compact(n_buckets=...).
        snap = self.current_snapshot()
        if snap is not None and "n_buckets" in snap:
            self.n_buckets = int(snap["n_buckets"])
        # resolution semantics (row/set/replace) are layout too: like
        # n_buckets, an existing table's persisted mode wins over the
        # constructor default, so reopening by path alone (e.g.
        # scripts/run_mirror.py) can never mis-resolve a set table as rows
        # (pre-round-6 snapshots lack the field — the ctor argument stands).
        # A NON-default ctor mode that conflicts is a likely caller mistake
        # (e.g. pointing a set-mode pipeline at a row table path) — adoption
        # still wins, but loudly (ADVICE r6).
        if snap is not None and "mode" in snap:
            if mode != "row" and snap["mode"] != mode:
                import warnings

                warnings.warn(
                    f"LakeTable({self.path}): ctor mode={mode!r} conflicts "
                    f"with the persisted mode {snap['mode']!r} — adopting "
                    "the persisted mode (table layout wins)",
                    stacklevel=2,
                )
            self.mode = snap["mode"]

    # -- snapshot log ---------------------------------------------------------

    def _current_path(self) -> str:
        return os.path.join(self.meta_dir, "_current.json")

    def current_snapshot(self) -> dict | None:
        p = self._current_path()
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def snapshot(self, snapshot_id: int) -> dict | None:
        """A historical snapshot by id (every commit publishes an immutable
        ``snap-NNN.json``) — the Iceberg time-travel metadata twin. Returns
        None for unknown ids AND for ids whose data files were since
        reclaimed by ``vacuum``. Expiry is an O(1) membership test against
        the expired-ids list vacuum records at reclaim time — NOT a
        per-call existence walk of every live data file (that walk was
        O(total files) driver-side stats per time-travel read; at 10^5
        buckets it undercut the O(touched buckets) metadata design)."""
        p = os.path.join(self.meta_dir, f"snap-{snapshot_id:012d}.json")
        if not os.path.exists(p):
            return None
        if snapshot_id in self._expired_ids():
            return None  # expired: vacuumed after a later commit
        with open(p) as f:
            return json.load(f)

    def _expired_path(self) -> str:
        return os.path.join(self.meta_dir, "expired.json")

    def _expired_ids(self) -> set[int]:
        """Expired snapshot ids, cached in memory and invalidated by file
        mtime — repeated snapshot() calls cost one os.stat, not a JSON
        parse (the list itself is bounded: _mark_expired prunes ids whose
        snap-json expire_snapshots already removed)."""
        p = self._expired_path()
        try:
            mtime = os.stat(p).st_mtime_ns
        except FileNotFoundError:
            return set()
        cached = self._expired_cache
        if cached is None or cached[0] != mtime:
            with open(p) as f:
                cached = (mtime, set(json.load(f)))
            self._expired_cache = cached
        return cached[1]

    def _adopt_expired_list(self) -> None:
        """One-time migration for tables whose files were vacuumed BEFORE
        the expired-ids list existed (or touched by an external cleaner):
        if the list is missing on open, existence-sweep the historical
        snapshots once and persist the result, so snapshot() stays a pure
        membership test afterwards and a pre-list vacuumed snapshot still
        reads as None instead of a scan-time FileNotFoundException."""
        if os.path.exists(self._expired_path()):
            return
        expired: set[int] = set()
        cur = self.current_snapshot()
        cur_sid = cur["snapshot_id"] if cur else -1
        for sid in self.snapshot_ids():
            if sid == cur_sid:
                continue
            p = os.path.join(self.meta_dir, f"snap-{sid:012d}.json")
            try:
                with open(p) as f:
                    old = json.load(f)
                gone = any(
                    not os.path.exists(self._abs(e["p"]))
                    for es in self._entries(old).values()
                    for e in es
                )
            except (FileNotFoundError, json.JSONDecodeError):
                gone = True
            if gone:
                expired.add(sid)
        self._mark_expired(expired)  # writes the file even when empty

    def _mark_expired(self, ids: set[int]) -> None:
        # ids whose snap-json is already gone (expire_snapshots) read as
        # None via the missing-file check — dropping them here keeps the
        # list O(retained snapshots), not O(all snapshots ever)
        merged = sorted(
            i
            for i in (self._expired_ids() | ids)
            if os.path.exists(os.path.join(self.meta_dir, f"snap-{i:012d}.json"))
        )
        tmp = self._expired_path() + f".{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump(merged, f)
        os.replace(tmp, self._expired_path())

    def snapshot_ids(self) -> list[int]:
        return sorted(
            int(f[len("snap-"):-len(".json")])
            for f in os.listdir(self.meta_dir)
            if f.startswith("snap-") and f.endswith(".json")
        )

    def committed_epochs(self) -> dict[str, int]:
        snap = self.current_snapshot()
        return dict(snap["epochs"]) if snap else {}

    def epoch_committed(self, epoch_id: int) -> bool:
        """Exactly-once guard: True if this epoch was already applied —
        either present in the sliding idempotency window or OLDER than the
        window's eviction floor (its entry aged out). Callers skip committed
        epochs. Sub-floor ids are additionally REFUSED loudly at merge time
        (see ``_check_epoch``): under Spark's checkpoint contract only
        recent epochs ever re-deliver, so an id below the floor means the
        checkpoint was wiped/re-pointed — silently skipping would drop that
        stream's NEW events until its counter climbed past the floor."""
        snap = self.current_snapshot()
        if snap is None:
            return False
        if str(epoch_id) in snap["epochs"]:
            return True
        return int(epoch_id) <= int(snap.get("epoch_floor", -1))

    def _check_epoch(self, epoch_id: int) -> bool:
        """True = already applied, skip. Raises on an id below the eviction
        floor but absent from the window: indistinguishable from a stream
        whose checkpoint was reset against this lake, where both possible
        silent behaviors are wrong (re-apply = double-merge; skip = data
        loss). The operator resolves it explicitly: resume from the old
        checkpoint, or call ``reset_epoch_log()`` before re-pointing a
        fresh stream."""
        snap = self.current_snapshot()
        if snap is None:
            return False
        if str(epoch_id) in snap["epochs"]:
            return True
        floor = int(snap.get("epoch_floor", -1))
        if int(epoch_id) <= floor:
            raise StaleEpochError(
                f"epoch {epoch_id} is below this table's idempotency floor "
                f"({floor}) but not in its window — either a replay older "
                "than the retained window (impossible under Spark's "
                "checkpoint re-delivery contract) or a NEW stream whose "
                "checkpoint restarted from 0 against an existing lake. "
                "Resume from the original checkpoint, or call "
                "reset_epoch_log() to explicitly adopt the new stream's "
                "epoch numbering."
            )
        return False

    def reset_epoch_log(self) -> None:
        """Explicitly adopt a NEW stream's epoch numbering (after a
        checkpoint wipe/re-point): clears the idempotency window and the
        eviction floor. Exactly-once then restarts from the next commit —
        only safe when the old stream is truly gone. Published as a NEW
        snapshot (data untouched, manifests carried by reference) so
        historical ``snap-*.json`` stay immutable."""
        last_err = None
        for _ in range(5):
            snap = self.current_snapshot()
            if snap is None:
                return
            new_snap = dict(snap)
            new_snap["parent"] = snap["snapshot_id"]
            new_snap["snapshot_id"] = snap["snapshot_id"] + 1
            new_snap["epochs"] = {}
            new_snap.pop("epoch_floor", None)
            new_snap["meta"] = dict(snap.get("meta") or {}, epoch_log_reset=True)
            new_snap["kind"] = "meta"
            new_snap.pop("added", None)
            try:
                self._publish(new_snap)
                return
            except CommitConflictError as e:
                last_err = e  # metadata-only: rebuild on fresh state
        raise last_err

    def _publish(self, snapshot: dict) -> None:
        """Publish a snapshot under OPTIMISTIC CONCURRENCY (round 6 —
        VERDICT r5 item 3, the Iceberg commit model): the table supports
        multiple concurrent writer PROCESSES (e.g. the streaming driver
        racing a maintenance job's compact/vacuum); a commit built against
        a snapshot that is no longer current is REJECTED with
        :class:`CommitConflictError` and the caller retries against fresh
        state — no interleaving can drop another writer's commit.

        Protocol, serialized by an advisory ``flock`` on
        ``_meta/commit.lock`` (kernel-released if the holder dies):

        1. re-read the pointer under the lock; if it reached ``sid`` a
           concurrent writer won this id → conflict.
        2. a ``snap-{sid}.json`` that exists while the pointer is still
           behind is the torn publish of a writer that died between its
           two steps (it provably holds no live lock — a live publisher
           would still hold ours) → removed; its data files are
           unreferenced garbage for ``vacuum``.
        3. write the snapshot json, then atomically swap the pointer.

        Readers never take the lock — the pointer swap stays a plain
        ``os.replace``, so ``current_snapshot()`` is wait-free."""
        import fcntl

        sid = snapshot["snapshot_id"]
        with open(os.path.join(self.meta_dir, "commit.lock"), "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            cur = self.current_snapshot()
            if cur is not None and int(cur["snapshot_id"]) >= sid:
                raise CommitConflictError(
                    f"snapshot {sid} was committed by a concurrent writer "
                    f"(current is {cur['snapshot_id']}) — rebuild against "
                    "the fresh snapshot and retry"
                )
            snap_path = os.path.join(self.meta_dir, f"snap-{sid:012d}.json")
            if os.path.exists(snap_path):
                os.remove(snap_path)  # torn publish of a dead writer
            with open(snap_path, "w") as f:
                json.dump(snapshot, f)
            tmp = os.path.join(self.meta_dir, f"_current.{uuid.uuid4().hex}.tmp")
            with open(tmp, "w") as f:
                json.dump(snapshot, f)
            os.replace(tmp, self._current_path())  # atomic pointer swap

    # -- manifests --------------------------------------------------------------

    def _abs(self, p: str) -> str:
        return p if os.path.isabs(p) else os.path.join(self.path, p)

    def _write_manifest(self, entries: list[dict]) -> str:
        """Persist one bucket's file-entry list as an immutable
        content-addressed manifest; identical content reuses the same file
        (a bucket untouched by a commit keeps its manifest by reference —
        zero metadata rewrite for it)."""
        payload = json.dumps(entries, sort_keys=True)
        name = "m-" + hashlib.sha1(payload.encode()).hexdigest()[:20] + ".json"
        p = os.path.join(self.manifest_dir, name)
        if not os.path.exists(p):
            tmp = p + f".{uuid.uuid4().hex}.tmp"
            with open(tmp, "w") as f:
                f.write(payload)
            os.replace(tmp, p)
        self._manifest_cache[name] = entries
        return name

    def _load_manifest(self, name: str) -> list[dict]:
        if name in self._manifest_cache:
            return self._manifest_cache[name]
        with open(os.path.join(self.manifest_dir, name)) as f:
            entries = json.load(f)
        self._manifest_cache[name] = entries
        return entries

    def _entries(self, snap: dict) -> dict[str, list[dict]]:
        """bucket → file-entry list for a snapshot. Accepts the legacy inline
        layout (bucket → [paths]) for tables written before the manifest
        split."""
        out: dict[str, list[dict]] = {}
        for b, ref in snap["buckets"].items():
            if isinstance(ref, list):  # legacy inline file list
                out[b] = [{"p": p, "rows": None, "bloom": None} for p in ref]
            else:
                out[b] = self._load_manifest(ref)
        return out

    def bucket_files(self, snap: dict | None = None) -> dict[str, list[str]]:
        """bucket → absolute data-file paths (the old inline view — used by
        tests/bench to inspect the physical layout)."""
        snap = snap if snap is not None else self.current_snapshot()
        if snap is None:
            return {}
        return {
            b: [self._abs(e["p"]) for e in es] for b, es in self._entries(snap).items()
        }

    # -- read -----------------------------------------------------------------

    def schema_columns(self) -> list[tuple[str, str]]:
        snap = self.current_snapshot()
        return [tuple(c) for c in snap["schema"]] if snap else []

    def _read_files(
        self,
        spark: SparkSession,
        files: list[str],
        schema_cols: list[tuple[str, str]] | None = None,
    ) -> DataFrame | None:
        """Scan data files with the snapshot's EXPLICIT schema: heterogeneous
        delta files (pre-evolution commits) are null-filled for later columns
        by the parquet reader, and no driver-side footer inference runs
        (at 10^5 files schema inference is itself a scale bug)."""
        if not files:
            return None
        cols = schema_cols if schema_cols is not None else self.schema_columns()
        ddl = ", ".join(f"`{n}` {t}" for n, t in cols)
        return spark.read.schema(ddl).parquet(*files)

    def _resolve(self, df: DataFrame, file_tiebreak: bool = False) -> DataFrame:
        """Merge-on-read resolution: collapse base+delta rows to the current
        winners. Row mode is the same algebraic max_by as the in-batch LWW
        reduction (map-side partial agg — the shuffle carries ≤1 row per key
        per map partition); set mode keeps the key's max-order row-group via
        a window max (one shuffle by key, no join).

        ``file_tiebreak`` (read paths only): break order-key ties between
        files by the commit file name — commit dirs are monotonically named,
        so a set redelivered in a later epoch (cross-epoch duplicate outside
        the epoch log's window) supersedes its first copy instead of
        surviving twice."""
        if self.mode == "replace":
            return df
        if not {"op", "warc_ts", "pos"}.issubset(set(df.columns)):
            # no LWW order columns → the table is maintained by replace_keys
            # only, whose file-scoped rewrite keeps every key's rows in
            # exactly one file per bucket (a file containing a replaced key
            # is always rewritten) — the union of files is already resolved
            return df
        if self.mode == "row":
            non_key = [c for c in df.columns if c != self.key]
            order = _order_key()
            if self.bucket_source == "column" and "is_deleted" in df.columns:
                # a key whose bucket moved carries a tombstone (old bucket)
                # and an insert (new bucket) at the SAME order key — the live
                # row must win that tie deterministically or a cross-bucket
                # fold (full compaction) could drop the live row. Genuine
                # same-key same-order ties otherwise only come from duplicate
                # deliveries of identical rows, where either copy is fine.
                order = F.struct(
                    order.alias("o"),
                    (F.lit(1) - F.coalesce(F.col("is_deleted"), F.lit(0))).alias("z"),
                )
            return (
                df.groupBy(self.key)
                .agg(F.max_by(F.struct(*non_key), order).alias("_w"))
                .select(self.key, "_w.*")
            )
        from pyspark.sql.window import Window

        order = _order_key()
        if file_tiebreak:
            # materialize the file name BEFORE the window shuffle —
            # input_file_name() is only defined while rows are still attached
            # to their scan (it evaluates to "" after an exchange)
            df = df.withColumn("_src", F.input_file_name())
            order = F.struct(order.alias("o"), F.col("_src").alias("f"))
        w = Window.partitionBy(self.key)
        out = (
            df.withColumn("_mx", F.max(order).over(w))
            .where(order == F.col("_mx"))
            .drop("_mx")
        )
        return out.drop("_src") if file_tiebreak else out

    def _prune_entries(
        self, entries: list[dict], probe_hashes: list[tuple[int, int]] | None
    ) -> list[dict]:
        """Bloom file skipping: drop files whose key bloom excludes every
        probe key. Files without a bloom (legacy / over-``bloom_max_keys``)
        are always kept — pruning is conservative, never lossy."""
        if probe_hashes is None:
            return entries
        return [
            e
            for e in entries
            if e.get("bloom") is None or _bloom_may_contain(e["bloom"], probe_hashes)
        ]

    def _read_resolved(
        self,
        spark: SparkSession,
        snap: dict,
        bucket_entries: dict[str, list[dict]],
        columns: list[str] | None = None,
        probe_keys: "list[str] | KeyProbe | None" = None,
    ) -> DataFrame | None:
        """Per-bucket merge-on-read resolution: a bucket holding ≤1 file is
        resolved by construction (every write method emits ≤1 row-set per key
        per file), so only multi-file buckets pay the max_by/window fold —
        one hot bucket's deltas don't force resolution over the whole table.

        ``probe_keys``: the caller wants these keys only. Files are bloom-
        pruned per key, the scan is filtered to the keys (pushed to parquet
        row-group stats), and — because blooms have no false negatives —
        every file containing a probe key is kept, so resolution over the
        survivors is exact for those keys. Rows of other keys are filtered
        out (they may be incompletely resolved after pruning).

        A :class:`KeyProbe` is accepted in place of the key list: pruning
        uses its executor-computed proven-miss file set (bit-identical
        decisions, no key values on the driver) and the row filter becomes
        a post-resolution ``left_semi`` join against its keys DataFrame —
        probed keys are exactly resolved either way (their files always
        survive pruning); KeyProbe results may transiently include other
        keys' rows before the join removes them."""
        schema = [tuple(c) for c in snap["schema"]]
        probe = None
        if isinstance(probe_keys, KeyProbe):
            probe = probe_keys
            miss = probe.misses_for(self.path)
            if miss:
                bucket_entries = {
                    b: [e for e in es if self._abs(e["p"]) not in miss]
                    for b, es in bucket_entries.items()
                }
            probe_keys = None  # the exact-path machinery below stays off
        probe_hashes = None
        if probe_keys is not None:
            probe_hashes = [_bloom_hashes(k) for k in probe_keys]
        pruned = {
            b: self._prune_entries(es, probe_hashes) for b, es in bucket_entries.items()
        }
        single = [self._abs(e["p"]) for es in pruned.values() if len(es) <= 1 for e in es]
        multi = [self._abs(e["p"]) for es in pruned.values() if len(es) > 1 for e in es]
        horizon = snap.get("truncate")

        def _prep(df: DataFrame) -> DataFrame:
            if horizon is not None and {"op", "warc_ts", "pos"}.issubset(df.columns):
                # TRUNCATE op 't' (QUICK_START.md:282-288), merge-on-read
                # style: the commit only records the horizon order key; every
                # row at-or-below it is dead at read time (O(1) truncate, no
                # data rewrite — compaction drops the rows physically).
                # Snapshot reads (op='r') rank below any stream event, so a
                # truncate kills them all — consistent with the engine's
                # stream>snapshot total order (operators/lww.py).
                df = df.where(_order_key() > _truncate_lit(horizon))
            if probe_keys is not None:
                df = df.where(F.col(self.key).isin(list(probe_keys)))
            if columns is None:
                return df
            need = [self.key, "op", "warc_ts", "pos"] + list(columns)
            return df.select(*[c for c in dict.fromkeys(need) if c in df.columns])

        parts = []
        s_df = self._read_files(spark, single, schema)
        if s_df is not None:
            parts.append(_prep(s_df))
        m_df = self._read_files(spark, multi, schema)
        if m_df is not None:
            parts.append(self._resolve(_prep(m_df), file_tiebreak=True))
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        if probe is not None and probe.row_filter:
            # the KeyProbe row filter: semi-join AFTER resolution (an
            # exchange before the set-mode window would break the
            # input_file_name tiebreak — CLAUDE.md invariant), against the
            # caller's cached keys frame; semi joins ignore right-side
            # duplicates, so no distinct is needed
            out = out.join(
                probe.keys_df.select(F.col(probe.key).alias(self.key)),
                self.key,
                "left_semi",
            )
        return out

    def read_raw(
        self, spark: SparkSession, snapshot_id: int | None = None
    ) -> DataFrame | None:
        """Resolved rows including tombstones (the MERGE target view).
        ``snapshot_id`` time-travels to a historical snapshot (valid until
        ``vacuum`` reclaims its superseded files — the Iceberg expire-
        snapshots contract; an expired snapshot reads as None)."""
        snap = self.current_snapshot() if snapshot_id is None else self.snapshot(snapshot_id)
        if snap is None:
            return None
        return self._read_resolved(spark, snap, self._entries(snap))

    def evolved_types(self) -> dict[str, str]:
        """Evolved columns' LOGICAL types (snapshot metadata; physical
        storage is string — see merge_lww). The DESCRIBE surface reports
        these alongside schema_columns()."""
        snap = self.current_snapshot()
        return dict(snap.get("evolved_types") or {}) if snap else {}

    def _typed_view(self, df: DataFrame, snap: dict | None) -> DataFrame:
        """Apply evolved columns' logical types as read-time casts.
        ``try_cast`` by construction never fails: a value only reaches a
        narrow-typed column while every observation parses (widen-only
        votes), and the cast is skipped for columns typed string."""
        et = (snap or {}).get("evolved_types") or {}
        old_fields = (
            {f.name for f in df.schema["_old"].dataType.fields}
            if "_old" in df.columns
            else set()
        )
        for c, t in et.items():
            q = c.replace("`", "``")
            if t != "string" and c in df.columns:
                df = df.withColumn(c, F.expr(f"try_cast(`{q}` as {t})"))
            if t != "string" and c in old_fields:
                # the preimage must serve the same logical types as the row
                df = df.withColumn(
                    "_old",
                    F.col("_old").withField(
                        c, F.expr(f"try_cast(_old.`{q}` as {t})")
                    ),
                )
        return df

    def read(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame | None:
        """Public table view: tombstones filtered out; optionally as of a
        historical ``snapshot_id`` (time travel). Evolved columns come back
        in their logical (typed) form — ``read_raw`` keeps the physical
        string form (compaction must rewrite what it read)."""
        snap = self.current_snapshot() if snapshot_id is None else self.snapshot(snapshot_id)
        df = self.read_raw(spark, snapshot_id=snapshot_id)
        if df is None:
            return None
        if "is_deleted" in df.columns:
            df = df.where((F.col("is_deleted").isNull()) | (F.col("is_deleted") == 0))
        return self._typed_view(df, snap)

    # -- incremental reads (change feed) --------------------------------------

    @staticmethod
    def _prune_entries_since(entries: list[dict], lo: list) -> list[dict]:
        """Order-key file skipping: drop files whose max (k0,k1,k2) is ≤ the
        probe — every row in them is at-or-below ``lo``, so none can be a
        winner above it. Files without bounds (legacy / stats off / null
        order components) are always kept — conservative, never lossy."""
        lo_t = tuple(int(x) for x in lo)
        return [
            e for e in entries if e.get("o") is None or tuple(e["o"][1]) > lo_t
        ]

    def files_for_since(self, lo: list, snapshot_id: int | None = None) -> list[str]:
        """Introspection twin of :meth:`read_since`'s file pruning — the
        files a tail read above ``lo`` actually scans (tests pin that this
        is a strict subset once old epochs' files fall below the probe)."""
        snap = (
            self.current_snapshot() if snapshot_id is None else self.snapshot(snapshot_id)
        )
        if snap is None:
            return []
        return sorted(
            self._abs(e["p"])
            for es in self._entries(snap).values()
            for e in self._prune_entries_since(es, lo)
        )

    def read_since(
        self,
        spark: SparkSession,
        lo: list,
        *,
        include_deletes: bool = False,
        snapshot_id: int | None = None,
    ) -> DataFrame | None:
        """Event-time tail read: the table's current winners whose LWW order
        key is strictly above ``lo`` ([k0, k1, k2] — the same triple as the
        truncate horizon; build it from (op, unix-micros ts, pos) via
        operators.lww.order_key_cols semantics). This is "what changed since
        ts" WITHOUT scanning the table: files whose max order key is ≤ lo
        are pruned from the snapshot's manifest stats, so a tail over a
        10^10-row table reads O(recent commits), not O(table).

        Soundness of pruning + resolve + filter: a pruned file holds only
        rows ≤ lo, so (1) it cannot contain any winner above lo, and (2) it
        cannot out-rank a kept row that is above lo. Resolution over the
        kept files therefore yields the true winner for every key whose
        winner is above lo; keys whose true winner is ≤ lo may surface a
        stale apparent winner, but that row is also ≤ lo and dies on the
        final ``order > lo`` filter.

        ``include_deletes=True`` keeps tombstone winners and adds a
        ``_change_type`` column ('delete'/'upsert') — the downstream-sync
        feed shape (the reference's Pinecone updater consumes exactly
        upserts + deletes, incremental_pinecone_updater.py). Default mirrors
        ``read()`` (live rows only). Returns None for an empty table.

        Null-order semantics (pinned, ADVICE r5 low): a row with a null
        order component (e.g. a null ``warc_ts``) is excluded EXACTLY when
        its order relative to ``lo`` is undecidable — the field-by-field
        struct comparison reaches the null before resolving (a same-class
        probe). When an earlier field already decides (e.g. a stream-class
        row against a snapshot-class ``lo``), the row is orderable enough
        and returned. ``read()`` always returns such rows, and the stats
        job conservatively never order-prunes a file containing one —
        exclusion happens only at the final order filter, never by losing
        the file (tests/test_round6.py pins all three halves)."""
        snap = (
            self.current_snapshot() if snapshot_id is None else self.snapshot(snapshot_id)
        )
        if snap is None:
            return None
        pruned = {
            b: self._prune_entries_since(es, lo)
            for b, es in self._entries(snap).items()
        }
        pruned = {b: es for b, es in pruned.items() if es}
        df = self._read_resolved(spark, snap, pruned)
        if df is None:
            return None
        if not {"op", "warc_ts", "pos"}.issubset(df.columns):
            raise ValueError("read_since needs the LWW order columns")
        df = df.where(_order_key() > _truncate_lit(lo))
        if include_deletes:
            df = df.withColumn(
                "_change_type",
                F.when(
                    F.coalesce(F.col("is_deleted"), F.lit(0)) == 1, F.lit("delete")
                ).otherwise(F.lit("upsert"))
                if "is_deleted" in df.columns
                else F.lit("upsert"),
            )
        elif "is_deleted" in df.columns:
            df = df.where((F.col("is_deleted").isNull()) | (F.col("is_deleted") == 0))
        return self._typed_view(df, snap)

    def read_changes(
        self,
        spark: SparkSession,
        since_snapshot_id: int,
        until_snapshot_id: int | None = None,
        *,
        allow_truncate: bool = False,
        member_key: str | None = None,
        include_old: bool = False,
        columns: list[str] | None = None,
    ) -> DataFrame | None:
        """Net-effect change feed over a snapshot window — the Iceberg/Delta
        changelog-read surface, so a downstream mirror (the reference's
        Pinecone sync, incremental_pinecone_updater.py:97-202) consumes
        commits instead of rescanning the table.

        ``include_old=True`` adds an ``_old`` struct column — the PREIMAGE
        (Delta CDF's ``update_preimage``, Debezium's ``before``): for
        update/delete rows the row's (row mode) or member's (set mode)
        state at ``since``; null for inserts. Row mode packs every non-key
        schema column; set mode packs the member's payload columns (the old
        order columns are not retained by the member diff). A consumer that
        must retract by a DERIVED old identity — e.g. tombstone the OLD
        ``chunk_id``'s vector in its OLD LSH bucket when an update moved it
        (streaming.mirror.VectorFeedMirror) — needs exactly this. Costs one
        wider pre-state read in row mode (full columns instead of
        ``is_deleted``); free in set mode (the member diff already joins
        the old payload).

        - **row mode** (the pages table): one row per key whose TABLE STATE
          differs between ``since`` and ``until``, with ``_change_type`` ∈
          insert/update/delete and ``_commit_sid`` (the snapshot that
          introduced the winning row).
        - **set mode** (the chunks/vectors table; pass ``member_key``, e.g.
          ``"chunk_index"``): one row per (key, member) whose state differs —
          members of the new winning set that are new or changed emit
          insert/update rows (payload = the new member), members of the
          ``since`` set absent from the new one emit delete rows (payload =
          the OLD member, so a mirror can delete by any stored id, e.g.
          ``chunk_id`` — exactly what the reference's vector-store sync
          deletes by, incremental_pinecone_updater.py:263-277). A member
          whose payload is unchanged between the two sets (e.g. a reused
          embedding of an unedited section) is suppressed — the mirror
          never re-upserts an identical vector. Every emitted row carries
          the window-winning event's (op, warc_ts, pos) and ``_commit_sid``.

        Cost is O(window), never O(table): only the window's append
        manifests (``added``) are scanned, the window is reduced to per-key
        winners (one map-side-combined shuffle), and the pre-window
        existence/ordering probe reads only the bloom-matched files of the
        ``since`` snapshot via :func:`build_key_probe`. No-ops are
        suppressed exactly: a window winner that loses LWW to the pre-state
        (late replay), a duplicate delivery (order tie → pre-state wins),
        and a delete of a key not live at ``since`` all vanish from the
        feed, because applied-state ≡ fold(order) makes "no state change"
        decidable from (pre winner, window winner) alone.

        Windows stay consumable until vacuum reclaims them (compaction
        inside the window is transparent — it changes no logical state;
        construct the table with ``retention_snapshots=K`` to keep the last
        K snapshots' files alive through compact+vacuum). Unservable
        windows raise :class:`ChangeFeedUnavailableError` — including a
        window whose ``since`` snapshot was bucketed with a DIFFERENT
        ``n_buckets`` than the live table (a rebucketing
        ``compact(n_buckets=...)`` after ``since``): the pre-state probe
        buckets keys with the live count, so probing the old layout could
        prove files key-free that are not and silently misclassify
        (ADVICE r5 high) — refused instead. A truncate inside the window
        raises unless ``allow_truncate=True`` (the feed then carries the
        surviving row changes; the mass deletion itself lives in snapshot
        metadata, not in rows). Returns None for an empty window.

        Nothing is persisted: the window scan (O(window files)) executes
        once for the eager pre-state probe and again when the returned plan
        is consumed — a deliberate trade so a polling consumer never
        accumulates driver-owned cache entries it cannot release
        (ADVICE r5 low)."""
        # subset co-partitioning (optimization round 7): the feed's member
        # diff joins on (key, member) and its event attach on key; with
        # Spark's default requireAllClusterKeysForCoPartition=true the
        # planner refuses to reuse the winner-window's key-partitioning for
        # either join and re-exchanges the full payload twice more (3 payload
        # exchanges total). Subset co-partitioning is semantically exact for
        # equi-joins (equal key ⇒ co-located ⇒ equal (key, member)
        # co-located) and the key is high-cardinality here, so parallelism
        # is unaffected. Measured: the member feed count drops 5.6s → 3.2s
        # at the bench window. Session-scoped planner conf — set once, on
        # the session that consumes feeds (it can only help other multi-key
        # equi-joins whose children are already subset-partitioned).
        spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
        if self.mode == "set":
            assert member_key is not None, (
                "set-mode read_changes needs member_key= (the within-set "
                "member identity column, e.g. 'chunk_index')"
            )
            # ``columns``: optional payload projection (set mode only) — the
            # feed carries and DIFFS only these payload columns, so the
            # window scan, the pre-state read, and every exchange move a
            # fraction of the member bytes (guide §2.3 "project before the
            # exchange"). Consumer contract: the subset must functionally
            # determine the full member payload (identity-bearing columns —
            # e.g. ``chunk_id``+``embedding``, both content-derived), else
            # unchanged-member suppression weakens to subset equality.
            # The full-payload default is the oracle-gated shape.
            if columns is not None:
                missing = set(columns) - set(c for c, _ in self.schema_columns())
                assert not missing, f"unknown feed columns: {sorted(missing)}"
        else:
            assert self.mode == "row", "read_changes serves row/set-mode tables"
            assert member_key is None, "member_key applies to set-mode tables only"
            assert columns is None, "columns= applies to set-mode feeds only"
        since = int(since_snapshot_id)
        cur = self.current_snapshot()
        if cur is None:
            return None
        until = int(until_snapshot_id) if until_snapshot_id is not None else int(
            cur["snapshot_id"]
        )
        if until < since:
            raise ValueError(f"until ({until}) < since ({since})")
        snap_until = cur if until == int(cur["snapshot_id"]) else self.snapshot(until)
        if snap_until is None:
            raise ChangeFeedUnavailableError(f"snapshot {until} is expired")
        snap_since = None
        if since > 0:
            snap_since = self.snapshot(since)
            if snap_since is None:
                raise ChangeFeedUnavailableError(
                    f"snapshot {since} is expired (vacuumed) — re-sync from read()"
                )
            since_nb = int(snap_since.get("n_buckets", self.n_buckets))
            if since_nb != self.n_buckets:
                # the pre-state probe buckets the window keys with the LIVE
                # n_buckets, but snapshot `since`'s manifests are grouped by
                # its own persisted count — probing across a rebucketing
                # compact would prove files key-free that do hold probed
                # keys and silently misclassify (update→insert, dropped
                # deletes). Refuse-rather-than-desync (ADVICE r5 high).
                raise ChangeFeedUnavailableError(
                    f"snapshot {since} was bucketed with n_buckets="
                    f"{since_nb} but the table now uses {self.n_buckets} "
                    "(a rebucketing compact lies after it) — re-sync from "
                    "read()"
                )
        h0 = (snap_since or {}).get("truncate")
        h1 = snap_until.get("truncate")
        if h1 != h0 and not allow_truncate:
            raise ChangeFeedUnavailableError(
                "a TRUNCATE lies inside the window; its mass deletion is "
                "snapshot metadata, not rows — pass allow_truncate=True to "
                "receive the surviving row changes and apply the horizon "
                f"{h1} downstream"
            )
        win_files: list[str] = []
        sidecars: list[str] = []  # replace commits' replaced-key sidecars
        # per-bucket window ROW counts from the added manifests (free, driver
        # side): the pre-state probe's is-pruning-even-possible gate. Row
        # counts over-estimate distinct keys, so the gate errs toward
        # skipping the probe job — above ~384 probes/bucket essentially
        # every file bloom-hits anyway (build_key_probe's math), so a dense
        # window (the low-lag steady case) pays NO probe job and loses no
        # pruning; sparse windows — the 10^5-bucket production regime —
        # keep full file pruning.
        win_bucket_rows: dict[int, int] = {}
        for sid in range(since + 1, until + 1):
            s = snap_until if sid == until else self.snapshot(sid)
            if s is None:
                raise ChangeFeedUnavailableError(
                    f"snapshot {sid} inside the window is expired (vacuumed) "
                    "— re-sync from read()"
                )
            kind = s.get("kind")
            if kind in ("compact", "meta"):
                continue  # logical state unchanged — transparent to the feed
            if kind == "replace":
                # representable IFF the commit recorded its equality-delete
                # sidecar (round 6) — the window is then served by the
                # state-diff path below (a key can vanish in a replace
                # without leaving any row, so window files alone can't)
                rk = (s.get("meta") or {}).get("replaced_keys")
                if rk is None:
                    raise ChangeFeedUnavailableError(
                        f"snapshot {sid} is a pre-round-6 replace commit "
                        "(no replaced-keys record) — re-sync from read()"
                    )
                if not os.path.isdir(self._abs(rk)):
                    raise ChangeFeedUnavailableError(
                        f"snapshot {sid}'s replaced-keys record was expired "
                        "— re-sync from read()"
                    )
                sidecars.append(self._abs(rk))
                continue
            if kind != "append":
                raise ChangeFeedUnavailableError(
                    f"snapshot {sid} is a {kind or 'pre-change-feed'} commit "
                    "— not representable as a row change feed"
                )
            ref = s.get("added")
            if ref is None:
                continue  # no-op epoch (empty append)
            for e in self._load_manifest(ref):
                win_files.append(self._abs(e["p"]))
                b = int(e.get("b", -1))
                if b >= 0:
                    r = e.get("rows")
                    # unknown row count → treat the bucket as dense (probe
                    # skipped there; pruning lost, never correctness)
                    win_bucket_rows[b] = win_bucket_rows.get(b, 0) + (
                        int(r) if r is not None else 10**9
                    )
        missing = [p for p in win_files if not os.path.exists(p)]
        if missing:
            raise ChangeFeedUnavailableError(
                f"{len(missing)} window data files were vacuumed — raise "
                "retention_snapshots or re-sync from read()"
            )
        if not win_files and not sidecars:
            return None
        schema = [tuple(c) for c in snap_until["schema"]]
        if sidecars:
            # a replace rewrite is NOT LWW-ordered (it can change payloads
            # without touching order keys), so the window-winner algebra
            # doesn't apply — serve the window as a STATE DIFF between the
            # two snapshots instead, probed to exactly the touched keys
            out = self._changes_state_diff(
                spark, win_files, sidecars, snap_since, snap_until, member_key,
                include_old=include_old, columns=columns,
            )
        else:
            df = self._read_files(spark, win_files, schema)
            # commit id from the physical path — materialized BEFORE any
            # exchange (input_file_name is undefined after a shuffle)
            df = df.withColumn(
                "_commit_sid",
                F.regexp_extract(
                    F.input_file_name(), "commit-([0-9]+)", 1
                ).cast("bigint"),
            )
            if self.mode == "set":
                out = self._changes_set(
                    spark, df, snap_since, member_key,
                    include_old=include_old, columns=columns,
                    bucket_counts=win_bucket_rows,
                )
            else:
                out = self._changes_row(
                    spark, df, snap_since, include_old=include_old,
                    bucket_counts=win_bucket_rows,
                )
        if h1 is not None:
            # rows at-or-below the until-horizon are dead at `until` — a row
            # both changed and truncated inside the window never reaches the
            # feed (its deletion is carried by the horizon metadata)
            out = out.where(_order_key() > _truncate_lit(h1))
        return self._typed_view(out, snap_until)

    def _pre_state_probe(
        self,
        spark: SparkSession,
        keys_df: DataFrame,
        snap_since: dict,
        bucket_counts: dict[int, int] | None = None,
    ) -> KeyProbe:
        """The change feed's pre-window existence probe: bloom-prune snapshot
        ``since``'s files down to those that can hold the window's keys.
        ``row_filter=False`` — both feed branches join the pre-state onto
        the window keys themselves, so the probe's post-resolution semi join
        would be redundant work AND it lets the probe's keys frame stay
        unpersisted (nothing else consumes it; ADVICE r5 low — the round-5
        ``win.persist()`` here was never released)."""
        probe = build_key_probe(
            spark,
            keys_df,
            self.key,
            [(self, list(range(self.n_buckets)))],
            bucket_counts=bucket_counts,
            snapshots={self.path: snap_since},
        )
        probe.row_filter = False
        return probe

    def _changes_row(
        self,
        spark: SparkSession,
        df: DataFrame,
        snap_since: dict | None,
        include_old: bool = False,
        bucket_counts: dict[int, int] | None = None,
    ) -> DataFrame:
        """Row-mode feed classification (see :meth:`read_changes`)."""
        # window winner per key: LWW order; the commit id breaks exact order
        # ties (a cross-epoch duplicate redelivery outside the epoch log)
        non_key = [c for c in df.columns if c != self.key]
        # the preimage struct packs every non-key TABLE column (no
        # _commit_sid — that is feed metadata, not state)
        old_cols = [c for c in non_key if c != "_commit_sid"]
        old_type = StructType(
            [f for f in df.schema.fields if f.name in set(old_cols)]
        )
        null_old = F.lit(None).cast(old_type).alias("_old")
        order = F.struct(_order_key().alias("o"), F.col("_commit_sid").alias("c"))
        win = (
            df.groupBy(self.key)
            .agg(F.max_by(F.struct(*non_key), order).alias("_w"))
            .select(self.key, "_w.*")
        )
        wdel = (
            F.coalesce(F.col("is_deleted"), F.lit(0))
            if "is_deleted" in df.columns
            else F.lit(0)
        )

        def inserts_only(w):
            out = w.where(wdel == 0).withColumn("_change_type", F.lit("insert"))
            return out.withColumn("_old", null_old) if include_old else out

        if snap_since is None:
            # empty pre-state: every live winner is an insert; tombstone
            # winners are deletes of never-live keys → no-ops
            return inserts_only(win)
        # probe keys = the raw window's distinct keys (identical key set to
        # the winners'): the probe job then pays a key-only scan + distinct
        # instead of re-executing the full-payload max_by aggregation
        probe = self._pre_state_probe(
            spark, df.select(self.key).distinct(), snap_since, bucket_counts
        )
        pre = self._read_resolved(
            spark,
            snap_since,
            self._entries(snap_since),
            # the preimage needs the full old row; classification alone only
            # its deletion flag + order
            columns=None if include_old else ["is_deleted"],
            probe_keys=probe,
        )
        if pre is None:
            pre2 = None
        else:
            pre_extra = []
            if include_old:
                # a column evolved AFTER `since` is absent from the pre
                # frame — its preimage is null by definition
                pre_extra = [
                    F.struct(
                        *[
                            (
                                F.col(c) if c in pre.columns else F.lit(None)
                            ).cast(old_type[c].dataType).alias(c)
                            for c in old_cols
                        ]
                    ).alias("_pold")
                ]
            pre2 = pre.select(
                F.col(self.key),
                _order_key().alias("_po"),
                F.coalesce(F.col("is_deleted"), F.lit(0)).alias("_pdel")
                if "is_deleted" in pre.columns
                else F.lit(0).alias("_pdel"),
                *pre_extra,
            )
        w2 = win.withColumn("_wo", _order_key())
        if pre2 is None:
            out = inserts_only(w2)
        else:
            j = w2.join(pre2, self.key, "left")
            pre_live = F.col("_po").isNotNull() & (F.col("_pdel") == 0)
            effective = F.col("_po").isNull() | (F.col("_wo") > F.col("_po"))
            ct = F.when(
                wdel == 1, F.when(pre_live, F.lit("delete"))
            ).otherwise(
                F.when(pre_live, F.lit("update")).otherwise(F.lit("insert"))
            )
            out = (
                j.where(effective)
                .withColumn("_change_type", ct)
                .where(F.col("_change_type").isNotNull())
            )
            if include_old:
                out = out.withColumn(
                    "_old", F.when(pre_live, F.col("_pold")).otherwise(null_old)
                )
        return out.drop("_wo", "_po", "_pdel", "_pold")

    def _changes_set(
        self,
        spark: SparkSession,
        df: DataFrame,
        snap_since: dict | None,
        member_key: str,
        include_old: bool = False,
        columns: list[str] | None = None,
        bucket_counts: dict[int, int] | None = None,
    ) -> DataFrame:
        """Set-mode feed classification at MEMBER granularity (see
        :meth:`read_changes`): the window reduces to each key's winning SET
        (max (order, commit) group — one shuffle by key); effective keys
        (pre-state absent or strictly out-ranked) diff their new member set
        against the ``since`` set with one full-outer join on
        (key, member); unchanged members are suppressed by null-safe
        payload equality. The per-key window event columns (op, warc_ts,
        pos, _commit_sid) ride every emitted row — delete rows carry the
        OLD member's payload under the NEW event's order, so a mirror can
        both delete by stored id and order the change correctly."""
        from pyspark.sql.window import Window

        mk = member_key
        assert mk in df.columns, f"member_key {mk!r} is not a table column"
        meta_cols = (self.key, mk, "op", "warc_ts", "pos", "is_deleted", "_commit_sid")
        pcols = [c for c in df.columns if c not in meta_cols]
        if columns is not None:
            keep = set(columns)
            pcols = [c for c in pcols if c in keep]
        wdel = F.coalesce(F.col("is_deleted"), F.lit(0))

        # Plan-shape note (optimization round 7): nothing here is persisted
        # (read_changes contract), so every DataFrame referenced twice in the
        # final plan RE-EXECUTES its subtree. The round-6 shape pre-filtered
        # both member frames with `left_semi` joins against the effective-key
        # frame and derived per-key metadata from the payload-shuffling
        # window function — the effective-key subtree (which embeds the
        # pre-state read) executed 3× and the window scan 4× per action.
        # Those semi joins were semantically REDUNDANT with _member_diff's
        # final inner join on the event frame (non-effective keys drop there
        # either way), so they are gone; per-key window metadata is now a
        # map-side-combined aggregation over the RAW window scan (column-
        # pruned — no payload bytes), and the pre-state order probe is a
        # separate key/order-only read. Result: the window files execute
        # once wide + twice narrow, the pre-state once wide + once narrow,
        # and the exchange count drops ~3× (plans/r07/).

        # winning set per key: all rows matching the key's max (order,
        # commit) — members share one order key per set by the merge_sets
        # write contract; the commit id breaks cross-epoch redelivery ties
        # so exactly ONE commit's copy of the set survives
        okey = F.struct(_order_key().alias("o"), F.col("_commit_sid").alias("c"))
        w = Window.partitionBy(self.key)
        win = (
            df.withColumn("_wk", okey)
            .withColumn("_mx", F.max("_wk").over(w))
            .where(F.col("_wk") == F.col("_mx"))
            .drop("_mx")
        )
        # per-key window event metadata, aggregated over the RAW window rows
        # (one narrow map-side-combined agg — `_wk` leads the struct, so the
        # max row is exactly the winning set's, and every row of a winning
        # set carries identical remaining fields)
        meta_w = (
            df.groupBy(self.key)
            .agg(
                F.max(
                    F.struct(
                        okey.alias("k"),
                        F.col("op").alias("op"),
                        F.col("warc_ts").alias("warc_ts"),
                        F.col("pos").alias("pos"),
                        wdel.alias("_wdel"),
                        F.col("_commit_sid").alias("_commit_sid"),
                    )
                ).alias("m")
            )
            .select(self.key, "m.*")
        )
        om = None
        if snap_since is None:
            eff = meta_w.drop("k")
        else:
            probe = self._pre_state_probe(
                spark, df.select(self.key).distinct(), snap_since, bucket_counts
            )
            entries = self._entries(snap_since)
            pre = self._read_resolved(
                spark,
                snap_since,
                entries,
                columns=[mk] + pcols + ["is_deleted"],
                probe_keys=probe,
            )
            if pre is None:
                eff = meta_w.drop("k")
            else:
                pdel = (
                    F.coalesce(F.col("is_deleted"), F.lit(0))
                    if "is_deleted" in pre.columns
                    else F.lit(0)
                )
                # per-key pre-state order from a key/order-only read (same
                # files, same probe — tombstone rows included, as before);
                # the wide `pre` frame is consumed exactly once (om below)
                pre_meta = (
                    self._read_resolved(
                        spark, snap_since, entries, columns=[], probe_keys=probe
                    )
                    .groupBy(self.key)
                    .agg(F.max(_order_key()).alias("_po"))
                )
                # effective keys: pre-state absent or strictly out-ranked;
                # an exact order tie is a redelivered set → pre wins → no-op
                eff = (
                    meta_w.join(pre_meta, self.key, "left")
                    .where(F.col("_po").isNull() | (F.col("k.o") > F.col("_po")))
                    .drop("k", "_po")
                )
                om = pre.where(pdel == 0).select(
                    self.key,
                    F.col(mk).alias(mk),
                    *[F.col(c).alias(f"_o_{c}") for c in pcols],
                    F.lit(1).alias("_has_o"),
                )
        # new members: the winning sets' live rows (a tombstone winner
        # contributes no member rows — its deletes come from the old side of
        # the outer join). Non-effective and non-window keys in either frame
        # drop at _member_diff's final inner join on the event frame.
        nm = win.where(wdel == 0).select(
            self.key, mk, *pcols, F.lit(1).alias("_has_n")
        )
        ptypes = {f.name: f.dataType for f in df.schema.fields}
        return self._member_diff(
            nm, om, eff.select(self.key, "op", "warc_ts", "pos", "_commit_sid"),
            mk, pcols, ptypes, include_old=include_old,
        )

    def _member_diff(
        self,
        nm: DataFrame | None,
        om: DataFrame | None,
        ev: DataFrame,
        mk: str,
        pcols: list[str],
        ptypes: dict,
        include_old: bool = False,
    ) -> DataFrame:
        """Shared member-granular classification (window-winner and
        state-diff paths): full-outer join new members ``nm`` (key, mk,
        *pcols, _has_n) against old members ``om`` (key, mk, *_o_pcols,
        _has_o); unchanged members are suppressed by null-safe payload
        equality; delete rows carry the OLD member's payload (a mirror
        deletes by its stored id); every emitted row picks up the key's
        event columns from ``ev`` (key, op, warc_ts, pos, _commit_sid).
        ``include_old`` adds the ``_old`` payload-struct preimage (null on
        inserts) — already joined here, so it costs nothing extra."""
        if om is None:
            fo = nm.withColumn("_has_o", F.lit(None).cast("int"))
            for c in pcols:
                fo = fo.withColumn(f"_o_{c}", F.lit(None).cast(ptypes[c]))
        elif nm is None:
            fo = om.withColumn("_has_n", F.lit(None).cast("int"))
            for c in pcols:
                fo = fo.withColumn(c, F.lit(None).cast(ptypes[c]))
        else:
            fo = nm.join(om, [self.key, mk], "full_outer")
        same = F.struct(*[F.col(c) for c in pcols]).eqNullSafe(
            F.struct(*[F.col(f"_o_{c}").alias(c) for c in pcols])
        )
        ct = (
            F.when(F.col("_has_n").isNull(), F.lit("delete"))
            .when(F.col("_has_o").isNull(), F.lit("insert"))
            .when(~same, F.lit("update"))
        )
        changed = fo.withColumn("_change_type", ct).where(ct.isNotNull())
        proj = [
            F.col(self.key),
            F.col(mk),
            *[
                F.when(
                    F.col("_change_type") == "delete", F.col(f"_o_{c}")
                ).otherwise(F.col(c)).alias(c)
                for c in pcols
            ],
            F.col("_change_type"),
        ]
        if include_old:
            proj.append(
                F.when(
                    F.col("_has_o").isNotNull(),
                    F.struct(*[F.col(f"_o_{c}").alias(c) for c in pcols]),
                ).alias("_old")
            )
        return changed.select(*proj).join(ev, self.key, "inner")

    def _changes_state_diff(
        self,
        spark: SparkSession,
        win_files: list[str],
        sidecars: list[str],
        snap_since: dict | None,
        snap_until: dict,
        member_key: str | None,
        include_old: bool = False,
        columns: list[str] | None = None,
    ) -> DataFrame:
        """Feed classification for windows containing replace commits: the
        touched-key set (window files' keys ∪ the replace sidecars) is
        probed against BOTH snapshots and the two states are diffed —
        insert/update/delete per key (row mode) or per member (set mode),
        identical rows/members suppressed by null-safe equality. A replace
        is not LWW-ordered (it can change a payload without touching the
        order key), so the diff compares FULL rows, not orders; emitted
        rows carry ``_commit_sid = until`` (a rewrite has no meaningful
        per-row commit attribution — the window's end is the cursor).
        Cost: O(window files + sidecars) key scan + two bloom-probed reads
        restricted to those keys — never O(table)."""
        schema = [tuple(c) for c in snap_until["schema"]]
        key = self.key
        until = int(snap_until["snapshot_id"])
        parts = []
        if win_files:
            parts.append(self._read_files(spark, win_files, schema).select(key))
        for sc in sidecars:
            parts.append(
                spark.read.parquet(sc).select(
                    F.col(key).cast(dict(schema)[key]).alias(key)
                )
            )
        keys_df = parts[0]
        for p in parts[1:]:
            keys_df = keys_df.unionByName(p)
        keys_df = keys_df.distinct()

        # ``columns`` (set mode): restrict the diffed payload — the probed
        # state reads and every exchange then carry only the projection
        # (same consumer contract as _changes_set)
        read_cols = None
        if columns is not None and self.mode == "set":
            read_cols = [member_key] + list(columns) + ["is_deleted"]

        def probed(snap):
            if snap is None:
                return None
            probe = build_key_probe(
                spark,
                keys_df,
                key,
                [(self, list(range(self.n_buckets)))],
                snapshots={self.path: snap},
            )
            # row_filter stays True: the diff needs EXACTLY the touched
            # keys' resolved rows from both snapshots
            return self._read_resolved(
                spark, snap, self._entries(snap), columns=read_cols,
                probe_keys=probe,
            )

        post = probed(snap_until)
        pre = probed(snap_since)

        def live(df):
            if df is None:
                return None
            if "is_deleted" in df.columns:
                df = df.where(F.coalesce(F.col("is_deleted"), F.lit(0)) == 0)
            return df

        post, pre = live(post), live(pre)
        sid_col = F.lit(until).cast("bigint").alias("_commit_sid")
        if self.mode == "row":
            pcols = [n for n, _ in schema if n != key]
            tmap = {n: t for n, t in schema}

            def pack(df, alias):
                if df is None:
                    return None
                return df.select(
                    key, F.struct(*[F.col(c) for c in pcols]).alias(alias)
                )

            n, o = pack(post, "_n"), pack(pre, "_o")
            null_struct = F.lit(None).cast(
                "struct<" + ", ".join(f"`{c}`: {tmap[c]}" for c in pcols) + ">"
            )
            if n is None and o is None:
                empty = (
                    spark.createDataFrame([], ", ".join(f"`{c}` {t}" for c, t in schema))
                    .withColumn("_change_type", F.lit(None).cast("string"))
                    .withColumn("_commit_sid", F.lit(None).cast("bigint"))
                )
                if include_old:
                    empty = empty.withColumn("_old", null_struct)
                return empty
            if o is None:
                fo = n.withColumn("_o", null_struct)
            elif n is None:
                fo = o.withColumn("_n", null_struct)
            else:
                fo = n.join(o, [key], "full_outer")
            ct = (
                F.when(F.col("_n").isNull(), F.lit("delete"))
                .when(F.col("_o").isNull(), F.lit("insert"))
                .when(~F.col("_n").eqNullSafe(F.col("_o")), F.lit("update"))
            )
            pay = F.when(ct == "delete", F.col("_o")).otherwise(F.col("_n"))
            extra = [F.col("_o").alias("_old")] if include_old else []
            return (
                fo.withColumn("_change_type", ct)
                .where(ct.isNotNull())
                .select(
                    key,
                    *[pay[c].alias(c) for c in pcols],
                    "_change_type",
                    sid_col,
                    *extra,
                )
            )
        # set mode: member diff of the two states
        mk = member_key
        meta_cols = (key, mk, "op", "warc_ts", "pos", "is_deleted")
        pcols = [n for n, _ in schema if n not in meta_cols]
        if columns is not None:
            keep = set(columns)
            pcols = [c for c in pcols if c in keep]
        ptypes = {
            f.name: f.dataType
            for f in StructType.fromDDL(", ".join(f"`{c}` {t}" for c, t in schema))
        }

        def meta_of(df):
            if df is None:
                return None
            return df.groupBy(key).agg(
                F.max(
                    F.struct(
                        _order_key().alias("k"),
                        F.col("op").alias("op"),
                        F.col("warc_ts").alias("warc_ts"),
                        F.col("pos").alias("pos"),
                    )
                ).alias("m")
            ).select(key, "m.op", "m.warc_ts", "m.pos")

        nmeta, ometa = meta_of(post), meta_of(pre)
        if nmeta is None and ometa is None:
            ev = None
        elif ometa is None:
            ev = nmeta
        elif nmeta is None:
            ev = ometa
        else:
            # event columns: the post state's set order where the key is
            # still live, else the pre state's (full-key delete)
            o2 = ometa.select(
                key,
                F.col("op").alias("_oop"),
                F.col("warc_ts").alias("_ots"),
                F.col("pos").alias("_opos"),
            )
            ev = (
                nmeta.join(o2, [key], "full_outer")
                .select(
                    key,
                    F.coalesce(F.col("op"), F.col("_oop")).alias("op"),
                    F.coalesce(F.col("warc_ts"), F.col("_ots")).alias("warc_ts"),
                    F.coalesce(F.col("pos"), F.col("_opos")).alias("pos"),
                )
            )
        if ev is None:
            empty = (
                spark.createDataFrame([], ", ".join(f"`{c}` {t}" for c, t in schema))
                .withColumn("_change_type", F.lit(None).cast("string"))
                .withColumn("_commit_sid", F.lit(None).cast("bigint"))
            )
            if include_old:
                empty = empty.withColumn(
                    "_old",
                    F.lit(None).cast(StructType(
                        [StructField(c, ptypes[c]) for c in pcols]
                    )),
                )
            return empty
        ev = ev.withColumn("_commit_sid", F.lit(until).cast("bigint"))
        nm = (
            None
            if post is None
            else post.select(key, mk, *pcols, F.lit(1).alias("_has_n"))
        )
        om = (
            None
            if pre is None
            else pre.select(
                key,
                mk,
                *[F.col(c).alias(f"_o_{c}") for c in pcols],
                F.lit(1).alias("_has_o"),
            )
        )
        return self._member_diff(
            nm, om, ev, mk, pcols, ptypes, include_old=include_old
        )

    def read_bucket_winners(
        self,
        spark: SparkSession,
        buckets: list[int],
        columns: list[str] | None = None,
        probe_keys: "list[str] | KeyProbe | None" = None,
    ) -> DataFrame | None:
        """Resolved current rows (tombstones included) restricted to the given
        buckets, column-pruned to ``columns`` + the key/order columns, and —
        when ``probe_keys`` is given (an exact key list or a
        :class:`KeyProbe` built by :func:`build_key_probe`) — bloom-pruned
        to the files that can contain those keys and row-filtered to them.
        The driver's pre-MERGE probe: at 100 TB this reads only the touched
        buckets' *matching* files' key/hash columns, never the payload bytes
        of unrelated deltas."""
        snap = self.current_snapshot()
        if snap is None:
            return None
        all_entries = self._entries(snap)
        sub = {str(b): all_entries.get(str(b), []) for b in buckets}
        return self._read_resolved(spark, snap, sub, columns=columns, probe_keys=probe_keys)

    def _bucket_expr(self) -> F.Column:
        if self.bucket_source == "column":
            return F.col("bucket").cast("int")
        return _bucket_col(self.key, self.n_buckets)

    def _buckets_of_keys(self, spark: SparkSession, keys: list[str]) -> dict[int, list[str]]:
        """bucket id → keys, via one tiny Spark job (the bucket hash is
        ``xxhash64``, a JVM function — constant cost, not data-dependent).
        Column-bucketed tables can't derive a key's bucket (it depends on the
        row's vector), so every bucket is in scope — the per-file key blooms
        still prune the actual scan."""
        if self.bucket_source == "column":
            snap = self.current_snapshot()
            bs = [int(b) for b in snap["buckets"]] if snap else []
            return {b: list(keys) for b in bs}
        kdf = spark.createDataFrame([(k,) for k in keys], f"`{self.key}` string")
        rows = kdf.select(
            F.col(self.key), _bucket_col(self.key, self.n_buckets).alias("_b")
        ).collect()
        out: dict[int, list[str]] = {}
        for r in rows:
            out.setdefault(int(r["_b"]), []).append(r[self.key])
        return out

    def files_for_keys(self, spark: SparkSession, keys: list[str]) -> list[str]:
        """The exact data files a ``read_keys`` probe will scan (bucket
        pruning + per-file bloom skipping) — exposed so tests/PLANS.md can
        pin the read-path promise: a 1-key probe reads only the files that
        can contain it, not the bucket's whole delta stack."""
        snap = self.current_snapshot()
        if snap is None:
            return []
        all_entries = self._entries(snap)
        files: list[str] = []
        for b, ks in self._buckets_of_keys(spark, keys).items():
            hashes = [_bloom_hashes(k) for k in ks]
            for e in self._prune_entries(all_entries.get(str(b), []), hashes):
                files.append(self._abs(e["p"]))
        return files

    def read_keys(
        self,
        spark: SparkSession,
        keys: list[str],
        columns: list[str] | None = None,
    ) -> DataFrame | None:
        """Point/multi-point lookup: resolved LIVE rows for exactly ``keys``.
        Scans only the keys' buckets and, within them, only the files whose
        bloom may contain a probed key — the O(matching files) read path
        (bench: `cdc_lake_point_read`; pinned in tests/test_lake_sink.py)."""
        snap = self.current_snapshot()
        if snap is None:
            return None
        all_entries = self._entries(snap)
        by_bucket = self._buckets_of_keys(spark, keys)
        sub = {str(b): all_entries.get(str(b), []) for b in by_bucket}
        df = self._read_resolved(spark, snap, sub, columns=columns, probe_keys=keys)
        if df is None:
            return None
        if "is_deleted" in df.columns:
            df = df.where((F.col("is_deleted").isNull()) | (F.col("is_deleted") == 0))
        return self._typed_view(df, snap)

    # -- write ----------------------------------------------------------------

    def _schema_of(self, df: DataFrame) -> list[tuple[str, str]]:
        return [(f.name, f.dataType.simpleString()) for f in df.schema.fields if f.name != "_bucket"]

    def _merged_schema(self, df: DataFrame) -> list[tuple[str, str]]:
        cols = self.schema_columns()
        names = {n for n, _ in cols}
        for n, t in self._schema_of(df):
            if n not in names:
                cols.append((n, t))
                names.add(n)
        return cols

    def _file_stats_job(self, spark: SparkSession, commit_dir: str) -> dict[str, dict]:
        """Per-file (row count, key bloom) for a freshly written commit,
        computed INSIDE Spark: one column-pruned scan of the commit's key
        column grouped by physical file, bloom bitmaps built in the executor
        tasks, and only O(files) small (rows, bitmap) tuples returned to the
        driver. Replaces the round-3 driver-side pyarrow re-read of every
        written file — the one per-epoch driver cost that grew with batch
        size (at 100× batches the driver never touches data bytes now)."""
        key, cap = self.key, self.bloom_max_keys
        sch = dict(self._current_write_schema)
        key_type = sch.get(key, "string")
        # per-file min/max of the LWW order key (k0,k1,k2) — computed from
        # the same expressions as operators.lww.order_key_cols so the triple
        # is comparable with truncate horizons and read_since() probes. The
        # lake's warc_ts is a Spark TIMESTAMP (an instant): unix_micros over
        # it is session-TZ-independent, so bounds written by one session
        # prune correctly in another (the NTZ hazard lives at ingest only).
        has_order = {"op", "warc_ts", "pos"}.issubset(sch)

        def per_file_stats(batches):
            """SHUFFLE-FREE per-file aggregation: a scan partition holds
            whole files back-to-back (small files are packed), so streaming
            the Arrow batches in order and cutting on file change yields one
            (file, rows, nkeys, bloom) partial per file per partition with
            no exchange. The partial carries ONLY the counts and the bloom
            bitmap — never per-key payload (the round-4 packed hash pairs
            were up to 16 B/key per file through collect, ADVICE r4); a
            file that spans partitions shows up as several partials and the
            driver rebuilds its bloom with one targeted second job."""
            import json as _json

            import pandas as _pd

            cur = None
            n = 0
            nk = 0
            pairs: list | None = []
            omin = omax = None  # lexicographic (k0,k1,k2) bounds
            onull = False  # any null order component → no bounds (conservative)

            def flush():
                bloom = None
                if pairs is not None and 0 < nk:
                    bloom = _bloom_from_pairs(pairs)
                return _pd.DataFrame(
                    {
                        "f": [cur],
                        "rows": [n],
                        "nkeys": [nk],
                        "bloom": [_json.dumps(bloom) if bloom is not None else None],
                        "obounds": [
                            None
                            if onull or omin is None
                            else _json.dumps([list(omin), list(omax)])
                        ],
                    }
                )

            for pdf in batches:
                for f, grp in pdf.groupby("_f", sort=False):
                    if f != cur:
                        if cur is not None:
                            yield flush()
                        cur, n, nk, pairs = f, 0, 0, []
                        omin = omax = None
                        onull = False
                    n += len(grp)
                    keys = [k for k in grp["_k"].tolist() if k is not None]
                    nk += len(keys)
                    if pairs is not None:
                        if nk > cap:
                            pairs = None  # over bloom cap: count only
                        else:
                            pairs.extend(_bloom_hashes(k) for k in keys)
                    if "_k0" in grp.columns and not onull:
                        for t in zip(
                            grp["_k0"].tolist(),
                            grp["_k1"].tolist(),
                            grp["_k2"].tolist(),
                        ):
                            if any(v is None or v != v for v in t):  # None/NaN
                                onull = True
                                break
                            t = (int(t[0]), int(t[1]), int(t[2]))
                            if omin is None or t < omin:
                                omin = t
                            if omax is None or t > omax:
                                omax = t
            if cur is not None:
                yield flush()

        read_schema = f"`{key}` {key_type}"
        cols = [
            F.input_file_name().alias("_f"),
            F.col(key).cast("string").alias("_k"),
        ]
        if has_order:
            read_schema += (
                f", `op` {sch['op']}, `warc_ts` {sch['warc_ts']}, `pos` {sch['pos']}"
            )
            ok = _order_key()
            cols += [
                ok["k0"].cast("bigint").alias("_k0"),
                ok["k1"].cast("bigint").alias("_k1"),
                ok["k2"].cast("bigint").alias("_k2"),
            ]
        src = spark.read.schema(read_schema).parquet(commit_dir).select(*cols)
        collected = src.mapInPandas(
            per_file_stats,
            "f string, rows bigint, nkeys bigint, bloom string, obounds string",
        ).collect()
        partials: dict[str, list] = {}
        for r in collected:
            p = os.path.normpath(unquote(urlparse(r["f"]).path))
            partials.setdefault(p, []).append(r)
        out: dict[str, dict] = {}
        split_targets: dict[str, int] = {}  # abs path → total non-null keys
        for p, parts in partials.items():
            rows = sum(int(r["rows"]) for r in parts)
            nkeys = sum(int(r["nkeys"]) for r in parts)
            bloom = None
            if len(parts) == 1:
                bloom = json.loads(parts[0]["bloom"]) if parts[0]["bloom"] else None
            elif 0 < nkeys <= cap:
                # split file (spanned scan partitions): rebuild its bloom
                # from the data with a second job scoped to just these
                # files — rare (file > maxPartitionBytes), so the common
                # path ships no per-key bytes at all
                split_targets[p] = nkeys
            # order-key bounds merge trivially across split partials (min of
            # mins / max of maxes) — any null partial poisons the file's
            # bounds (conservative: the file is never order-pruned)
            ob = None
            if has_order and all(r["obounds"] for r in parts):
                bs = [json.loads(r["obounds"]) for r in parts]
                ob = [
                    min(tuple(b[0]) for b in bs),
                    max(tuple(b[1]) for b in bs),
                ]
                ob = [list(ob[0]), list(ob[1])]
            out[p] = {"rows": rows, "bloom": bloom, "obounds": ob}
        if split_targets:
            for p, bloom in self._split_file_blooms(spark, split_targets).items():
                out[p]["bloom"] = bloom
        return out

    def _split_file_blooms(
        self, spark: SparkSession, targets: dict[str, int]
    ) -> dict[str, list]:
        """Rebuild full blooms for files that spanned scan partitions: each
        partition emits a FIXED-``m`` partial bitmap for its slice of the
        file (``m`` derives from the file's total key count, known from the
        stats pass) and the driver ORs the bitmaps — bloom insertion
        commutes, so the result is byte-identical to a single-pass build
        (pinned in tests/test_round4.py). Payload per partial is O(bitmap),
        never O(keys)."""
        key = self.key
        key_type = dict(self._current_write_schema).get(key, "string")
        m_by_path = {p: _bloom_m_for(nk) for p, nk in targets.items()}

        def partial_bitmaps(batches):
            import pandas as _pd
            from urllib.parse import unquote as _unq, urlparse as _up

            cur = None
            m = 0
            bits = None

            def flush():
                return _pd.DataFrame(
                    {
                        "f": [cur],
                        "bm": [base64.b64encode(bytes(bits)).decode("ascii")],
                    }
                )

            for pdf in batches:
                for f, grp in pdf.groupby("_f", sort=False):
                    p = os.path.normpath(_unq(_up(f).path))
                    if p != cur:
                        if cur is not None:
                            yield flush()
                        cur = p
                        m = m_by_path[p]
                        bits = bytearray(m // 8)
                    for k in grp["_k"].tolist():
                        if k is not None:
                            h1, h2 = _bloom_hashes(k)
                            _bloom_insert(bits, m, h1, h2)
            if cur is not None:
                yield flush()

        src = spark.read.schema(f"`{key}` {key_type}").parquet(
            *sorted(targets)
        ).select(
            F.input_file_name().alias("_f"),
            F.col(key).cast("string").alias("_k"),
        )
        rows = src.mapInPandas(partial_bitmaps, "f string, bm string").collect()
        by_path: dict[str, list[str]] = {}
        for r in rows:
            by_path.setdefault(r["f"], []).append(r["bm"])
        return {p: _bloom_or(m_by_path[p], bms) for p, bms in by_path.items()}

    def _write_buckets(
        self, df: DataFrame, snapshot_id: int, tag: str = ""
    ) -> dict[str, list[dict]]:
        """Write df (already carrying _bucket) partitioned by bucket into an
        immutable commit dir; return bucket → manifest entries (path, rows,
        key bloom). File stats come from ``_file_stats_job`` — a distributed
        aggregate over the just-written files, never a driver-side read.

        ``tag`` (concurrent-writer safety): a per-attempt suffix keeps two
        racing writers that both target snapshot id N from writing into the
        SAME directory (the loser's CommitConflictError would otherwise
        come too late — its overwrite could already have clobbered the
        winner's data files). The loser's dir is never referenced and is
        reclaimed by vacuum. Dir names stay monotone in sid (zero-padded
        prefix), so the read-path commit tiebreak and the feed's
        ``commit-([0-9]+)`` extraction are unchanged."""
        commit_dir = os.path.join(
            self.data_dir, f"commit-{snapshot_id:012d}" + (f"-{tag}" if tag else "")
        )
        # co-locate each bucket in one task → one file per touched bucket
        # (without this, every reduce task writes a sliver of every bucket:
        # tasks × buckets small files)
        import time as _time

        t0 = _time.monotonic()
        df.repartition(self.n_buckets, "_bucket").write.mode("overwrite").partitionBy(
            "_bucket"
        ).parquet(commit_dir)
        self.last_commit_timings["write"] = round(_time.monotonic() - t0, 3)
        paths: dict[str, list[str]] = {}
        for entry in sorted(os.listdir(commit_dir)):
            if not entry.startswith("_bucket="):
                continue
            b = entry.split("=", 1)[1]
            bdir = os.path.join(commit_dir, entry)
            paths[b] = [
                os.path.join(bdir, f)
                for f in sorted(os.listdir(bdir))
                if f.endswith(".parquet")
            ]
        stats: dict[str, dict] = {}
        if self.file_stats and any(paths.values()):
            t0 = _time.monotonic()
            stats = self._file_stats_job(df.sparkSession, commit_dir)
            self.last_commit_timings["stats"] = round(_time.monotonic() - t0, 3)
        out: dict[str, list[dict]] = {}
        for b, ps in paths.items():
            out[b] = []
            for p in ps:
                st = stats.get(os.path.normpath(p))
                rel = os.path.relpath(p, self.path)
                if st is None:
                    # no stats (file_stats off, or a zero-row straggler the
                    # scan never surfaced) → conservatively always read
                    out[b].append({"p": rel, "rows": None, "bloom": None})
                else:
                    e = {"p": rel, "rows": st["rows"], "bloom": st["bloom"]}
                    if st.get("obounds") is not None:
                        e["o"] = st["obounds"]  # [[k0,k1,k2]min, [..]max]
                    out[b].append(e)
        return out

    def _commit(
        self,
        spark: SparkSession,
        new_rows: DataFrame,
        epoch_id: int | None,
        *,
        append: bool,
        touched_buckets: list[int] | None = None,
        resolved: bool,
        full_replace: bool = False,
        extra_meta: dict | None = None,
        keep_files: dict[str, list[dict]] | None = None,
        truncate: list | None = None,
        evolved_types: dict[str, str] | None = None,
        kind: str = "append",
    ) -> dict:
        """Publish a snapshot. Manifest references of untouched buckets are
        carried over by name (no rewrite); only changed buckets get a new
        manifest — snapshot metadata cost is O(touched buckets) per commit.

        ``kind`` ('append' | 'compact' | 'replace') is recorded in the
        snapshot; append commits additionally record an ``added`` manifest
        of exactly the file entries this commit introduced — the unit the
        snapshot-window change feed (:meth:`read_changes`) consumes.

        ``keep_files``: for file-scoped rewrites (replace_keys) — the
        entries of the touched buckets that survive unchanged alongside the
        newly written files.

        Concurrent writers (VERDICT r5 item 3): the publish is an
        optimistic-concurrency CAS (see ``_publish``). APPEND commits that
        lose the race are rebuilt here against the fresh snapshot and
        retried — an append's data files are new by construction, so the
        only state to recompute is metadata (manifest refs, epoch window,
        horizon folds), and a concurrently-committed identical epoch turns
        the retry into the normal already-applied no-op. NON-append commits
        (compact/replace) stage data derived from the snapshot they read —
        retrying them here with stale inputs could drop a concurrent
        append's rows — so the conflict propagates as
        :class:`CommitConflictError` and the OPERATION re-plans (compact
        and replace_keys re-run their whole body against fresh state)."""
        last_err: CommitConflictError | None = None
        for _attempt in range(5):
            snap = self.current_snapshot()
            parent = snap["snapshot_id"] if snap else 0
            sid = parent + 1
            if (
                epoch_id is not None
                and snap is not None
                and str(epoch_id) in snap["epochs"]
            ):
                return None  # a concurrent writer already applied this epoch
            if append:
                # the append-onto-empty-table resolution shortcut must be
                # re-derived per attempt — a concurrent commit may have
                # populated the table since the caller computed it
                resolved = not (snap is not None and any(snap["buckets"].values()))
                if snap is not None:
                    # a concurrent writer may have evolved columns since the
                    # caller computed its merged schema — union them in, or
                    # this snapshot's schema list would hide them from every
                    # reader (our data files simply null-fill them)
                    have = {n for n, _ in self._current_write_schema}
                    extra = [
                        (n, t) for n, t in snap["schema"] if n not in have
                    ]
                    if extra:
                        self._current_write_schema = (
                            list(self._current_write_schema) + extra
                        )
            tag = uuid.uuid4().hex[:8]
            written = self._write_buckets(new_rows, sid, tag)
            refs: dict[str, str | list] = dict(snap["buckets"]) if snap else {}
            if full_replace:
                # whole-table rewrite (full compaction / rebucketing): only
                # the files just written are live
                refs = {b: self._write_manifest(es) for b, es in written.items() if es}
            elif append:
                for b, es in written.items():
                    if not es:
                        continue
                    prev = (
                        self._entries_of_ref(refs[b]) if b in refs else []
                    )
                    refs[b] = self._write_manifest(prev + es)
                if not any(written.values()) and snap is not None:
                    # an empty append (e.g. a chunks epoch where every key
                    # was skipped) changes no data — keep the resolution
                    # state
                    resolved = snap.get("resolved", True)
            else:
                for b in touched_buckets or []:
                    entries = list((keep_files or {}).get(str(b), [])) + written.get(str(b), [])
                    if entries:
                        refs[str(b)] = self._write_manifest(entries)
                    else:
                        refs.pop(str(b), None)
            epochs = dict(snap["epochs"]) if snap else {}
            epoch_floor = int(snap.get("epoch_floor", -1)) if snap else -1
            if epoch_id is not None:
                epochs[str(epoch_id)] = sid
            # bound the idempotency log: Spark re-delivers only recent epochs
            # after a restart (checkpointed offsets are monotonic), so a
            # sliding window of the newest entries suffices — keeps snapshot
            # JSON O(1) over a 10^10-event run instead of O(epochs). Evicted
            # ids raise the monotone ``epoch_floor``: a replay OLDER than the
            # window is then still recognized as already-applied
            # (epoch_committed) instead of silently re-applied after its
            # window entry is gone.
            if len(epochs) > self.epoch_window:
                keep = sorted(epochs, key=int)[-self.epoch_window:]
                kept = set(keep)
                epoch_floor = max(
                    [epoch_floor] + [int(k) for k in epochs if k not in kept]
                )
                epochs = {k: epochs[k] for k in keep}
            # the truncate horizon is monotone and persists across
            # compaction: a late event older than the horizon must still die
            # at read time
            prev_tr = snap.get("truncate") if snap else None
            horizon = max(
                (list(t) for t in (prev_tr, truncate) if t is not None), default=None
            )
            # evolved-column LOGICAL types: monotone widen-only fold of
            # per-batch votes (operators.evolution.widen_type); the physical
            # column stays string, so a widen is pure metadata — carried
            # forward by every commit (compaction/replace included), like
            # the truncate horizon
            etypes = dict(snap.get("evolved_types") or {}) if snap else {}
            for c, t in (evolved_types or {}).items():
                etypes[c] = widen_type(etypes.get(c), t)
            new_snap = {
                "snapshot_id": sid,
                "parent": parent,
                "schema": [list(c) for c in self._current_write_schema],
                "n_buckets": self.n_buckets,
                "mode": self.mode,
                "buckets": refs,
                "epochs": epochs,
                "resolved": resolved,
                "meta": extra_meta or {},
                "kind": kind,
            }
            if kind == "append":
                added = [dict(e, b=b) for b, es in written.items() for e in es]
                if added:
                    new_snap["added"] = self._write_manifest(added)
            if epoch_floor >= 0:
                new_snap["epoch_floor"] = epoch_floor
            if horizon is not None:
                new_snap["truncate"] = horizon
            if etypes:
                new_snap["evolved_types"] = etypes
            try:
                self._publish(new_snap)
            except CommitConflictError as e:
                # this attempt's staged files are unreferenced — reclaim
                # them now rather than waiting for vacuum
                shutil.rmtree(
                    os.path.join(self.data_dir, f"commit-{sid:012d}-{tag}"),
                    ignore_errors=True,
                )
                if not append:
                    raise  # compact/replace must re-plan on fresh state
                last_err = e
                continue
            # evict superseded manifests from the in-memory cache: over 10^5
            # epochs every commit adds O(touched buckets) entries and the
            # superseded ones would otherwise accumulate into a driver leak
            live_refs = {r for r in refs.values() if isinstance(r, str)}
            self._manifest_cache = {
                k: v for k, v in self._manifest_cache.items() if k in live_refs
            }
            return new_snap
        raise last_err

    def _entries_of_ref(self, ref) -> list[dict]:
        if isinstance(ref, list):  # legacy inline
            return [{"p": p, "rows": None, "bloom": None} for p in ref]
        return list(self._load_manifest(ref))

    def probe_batch(
        self, deltas: DataFrame, has_extra: bool = True
    ) -> tuple[list[int], list[str], dict[int, int]]:
        """One job returning (touched buckets, observed evolved-column keys,
        per-bucket row counts) — fuses the schema-evolution probe and the
        pre-MERGE bucket probe so the driver pays a single scheduler
        round-trip per epoch. The counts feed :func:`build_key_probe`'s
        is-pruning-even-possible gate."""
        aggs = [F.count("*").alias("_n")]
        if has_extra and "extra" in deltas.columns:
            aggs.append(
                F.array_distinct(
                    F.flatten(
                        F.collect_list(F.map_keys(F.coalesce(F.col("extra"), F.expr("map()"))))
                    )
                ).alias("_ks")
            )
        rows = (
            deltas.groupBy(self._bucket_expr().alias("_b"))
            .agg(*aggs)
            .collect()
        )
        touched = sorted(r["_b"] for r in rows)
        keys: set[str] = set()
        for r in rows:
            if "_ks" in r.__fields__:
                keys.update(r["_ks"])
        counts = {int(r["_b"]): int(r["_n"]) for r in rows}
        return touched, sorted(keys), counts

    def _append_commit(
        self,
        spark: SparkSession,
        rows: DataFrame,
        epoch_id: int | None,
        pre_reduced: bool,
        truncate: list | None = None,
        evolved_types: dict[str, str] | None = None,
        extra_meta: dict | None = None,
    ) -> dict | None:
        if epoch_id is not None and self._check_epoch(epoch_id):
            return None  # exactly-once: this micro-batch already applied
        if self.bucket_source == "column":
            # a moved key legitimately writes TWO rows (tombstone in the old
            # bucket + insert in the new) — reducing them here would drop the
            # tombstone and leave the stale row alive; writers of column-
            # bucketed tables construct exactly those rows on purpose
            pre_reduced = True
        if not pre_reduced:
            # enforce the ≤1-row-set-per-key-per-file invariant the single-
            # file resolution fast path rests on (O(batch) map-side-combined
            # aggregation — cheap relative to the write itself)
            rows = self._resolve(rows)
        merged_schema = self._merged_schema(rows)
        self._current_write_schema = merged_schema
        aligned = _align_to(rows, merged_schema).withColumn(
            "_bucket", self._bucket_expr()
        )
        snap = self.current_snapshot()
        had_files = bool(snap) and any(snap["buckets"].values())
        # an append onto an empty table is already resolved (≤1 set per key)
        return self._commit(
            spark,
            aligned,
            epoch_id,
            append=True,
            resolved=not had_files,
            truncate=truncate,
            evolved_types=evolved_types,
            extra_meta=extra_meta,
        )

    def merge_lww(
        self,
        spark: SparkSession,
        deltas: DataFrame,
        epoch_id: int | None = None,
        *,
        pre_reduced: bool = False,
        truncate: list | None = None,
        evolved_types: dict[str, str] | None = None,
        extra_meta: dict | None = None,
    ) -> dict | None:
        """MERGE the batch's rows into the table under LWW.

        ``extra_meta``: caller metadata recorded in the snapshot's ``meta``
        map (e.g. a feed consumer's durable cursor — streaming.mirror).

        ``evolved_types``: per-batch logical-type votes for evolved columns
        (operators.evolution.infer_extra_types) — folded widen-only into
        the snapshot's ``evolved_types`` metadata and applied as read-time
        casts (see :meth:`read`); physical storage stays string.

        ``truncate``: order-key triple [k0, k1, k2] of a TRUNCATE event
        (op='t', QUICK_START.md:282-288) observed in this batch — recorded
        in the snapshot as a horizon; every stored row at-or-below it is
        dead at read time. O(1) per truncate: no data is read or rewritten
        (compaction reclaims the dead rows physically).

        ``deltas`` has columns (key, op, warc_ts, pos, is_deleted,
        payload...). Rows are reduced to ≤1 per key here unless the caller
        already did (``pre_reduced=True`` — operators.apply.upsert_deltas
        output). The equivalent Iceberg statement is::

            MERGE INTO t USING batch ON t.url = batch.url
            WHEN MATCHED AND (batch.warc_ts, batch.pos) >= (t.warc_ts, t.pos)
                 AND batch.op != 'r' THEN UPDATE/DELETE
            WHEN NOT MATCHED THEN INSERT

        implemented **merge-on-read**: append the batch as per-bucket delta
        files (O(batch) bytes written — no existing data is read or
        rewritten); readers resolve the per-key max_by over the LWW order
        key; ``compact`` folds deltas down. Snapshot isolation + the epoch
        log make it idempotent.
        """
        return self._append_commit(
            spark,
            deltas,
            epoch_id,
            pre_reduced=pre_reduced,
            truncate=truncate,
            evolved_types=evolved_types,
            extra_meta=extra_meta,
        )

    def merge_sets(
        self,
        spark: SparkSession,
        rows: DataFrame,
        epoch_id: int | None = None,
        *,
        pre_reduced: bool = False,
        truncate: list | None = None,
    ) -> dict | None:
        """MERGE per-key row-SETS under LWW (mode='set' tables, e.g. chunks).

        Each key's rows in ``rows`` must share one (op, warc_ts, pos) order
        key per set — the whole set replaces the key's previous set if its
        order key is higher (resolved at read); a delete or an empty set is a
        single ``is_deleted=1`` marker row. ``pre_reduced=False`` keeps only
        each key's max-order set before writing. This is the scale-safe twin
        of the reference's delete-by-category-then-reinsert chunk update
        (auto_gen_rag.py:174-191): append-only per epoch, no table reads.
        """
        return self._append_commit(
            spark, rows, epoch_id, pre_reduced=pre_reduced, truncate=truncate
        )

    def replace_keys(
        self,
        spark: SparkSession,
        rows: DataFrame,
        keys: DataFrame,
        epoch_id: int | None = None,
        *,
        truncate: list | None = None,
        extra_meta: dict | None = None,
    ) -> dict | None:
        """Concurrency wrapper around :meth:`_replace_keys_once`: a rewrite
        that loses the snapshot race re-plans against the fresh snapshot
        (its file scope may have grown) — see :meth:`compact`."""
        last_err = None
        for _ in range(5):
            try:
                return self._replace_keys_once(
                    spark, rows, keys, epoch_id, truncate=truncate,
                    extra_meta=extra_meta,
                )
            except CommitConflictError as e:
                last_err = e
        raise last_err

    def _replace_keys_once(
        self,
        spark: SparkSession,
        rows: DataFrame,
        keys: DataFrame,
        epoch_id: int | None = None,
        *,
        truncate: list | None = None,
        extra_meta: dict | None = None,
    ) -> dict | None:
        """Delete-then-insert per key: drop all existing rows whose key is in
        ``keys``, insert ``rows`` (reference SET1: delete-by-category then
        re-insert, auto_gen_rag.py:174-191 — as one atomic FILE-scoped
        rewrite, SURVEY.md §2.7). Only the files whose bloom may contain a
        replaced key are read and rewritten; a touched bucket's unrelated
        delta files survive by manifest reference. Copy-on-write by design —
        use ``merge_sets`` on hot streaming paths."""
        assert self.bucket_source == "key_hash", "replace_keys needs key-derived buckets"
        if epoch_id is not None and self._check_epoch(epoch_id):
            return None

        merged_schema = self._merged_schema(rows)
        self._current_write_schema = merged_schema

        keys_b = keys.select(F.col(self.key)).distinct().withColumn(
            "_bucket", _bucket_col(self.key, self.n_buckets)
        )
        # one O(n_buckets) job for (touched buckets, key count); the key
        # VALUES are only brought to the driver when the set is small enough
        # to bloom-test there — past the cap the rewrite falls back to
        # whole-bucket scope instead of collecting millions of strings
        per_bucket = keys_b.groupBy("_bucket").count().collect()
        touched = sorted(r["_bucket"] for r in per_bucket)
        n_keys = sum(r["count"] for r in per_bucket)
        probe_hashes = None
        if 0 < n_keys <= 100_000:
            key_list = [r[self.key] for r in keys_b.select(self.key).collect()]
            probe_hashes = [_bloom_hashes(k) for k in key_list]

        snap = self.current_snapshot()
        rewrite: dict[str, list[dict]] = {}
        keep: dict[str, list[dict]] = {}
        if snap:
            all_entries = self._entries(snap)
            for b in touched:
                es = all_entries.get(str(b), [])
                hit = self._prune_entries(es, probe_hashes)
                hit_paths = {e["p"] for e in hit}
                rewrite[str(b)] = hit
                keep[str(b)] = [e for e in es if e["p"] not in hit_paths]

        aligned_new = _align_to(rows, merged_schema)
        existing = None
        if any(rewrite.values()):
            existing = self._read_resolved(spark, snap, rewrite)
        if existing is not None:
            existing = _align_to(existing, merged_schema)
            survivors = existing.join(keys_b.select(self.key), on=self.key, how="left_anti")
            out = survivors.unionByName(aligned_new)
        else:
            out = aligned_new
        out = out.withColumn("_bucket", _bucket_col(self.key, self.n_buckets))
        # untouched buckets keep whatever resolution state they had; within
        # touched buckets the kept (non-matching) files may still stack, so
        # the pre-existing resolution state carries over too
        resolved = snap.get("resolved", True) if snap else True
        if any(keep.values()):
            resolved = False
        # equality-delete sidecar (round 6): the keys this rewrite touched —
        # the delete set ∪ the inserted rows' keys (a key in `keys` but not
        # in `rows` VANISHES without leaving any row, so only this record
        # makes the commit representable as a change feed; the Iceberg v2
        # equality-delete-file twin). O(touched keys), written distributed.
        sidecar_rel = os.path.join(
            "_meta", "replaced", f"rk-{uuid.uuid4().hex}"
        )
        keys_b.select(self.key).union(rows.select(self.key)).distinct().write.mode(
            "overwrite"
        ).parquet(os.path.join(self.path, sidecar_rel))
        return self._commit(
            spark,
            out,
            epoch_id,
            append=False,
            touched_buckets=touched,
            resolved=resolved,
            keep_files=keep,
            truncate=truncate,
            extra_meta=dict(extra_meta or {}, replaced_keys=sidecar_rel),
            kind="replace",
        )

    # -- maintenance ----------------------------------------------------------

    def max_files_per_bucket(self) -> int:
        """Deepest delta stack across buckets (drives the auto-compaction
        policy: compact when reads would pay too many files per bucket).
        O(n_buckets) driver-side — entry lists come from cached manifests."""
        snap = self.current_snapshot()
        if snap is None:
            return 0
        return max((len(es) for es in self._entries(snap).values()), default=0)

    def compact(
        self,
        spark: SparkSession,
        *,
        drop_tombstones_before=None,
        min_files: int | None = None,
        n_buckets: int | None = None,
    ) -> dict | None:
        """Concurrency wrapper around :meth:`_compact_once`: a compaction
        that loses the snapshot race to a concurrent append re-PLANS from
        the fresh snapshot (re-reading the now-larger delta stacks) rather
        than blindly re-publishing — a blind retry would drop the rows the
        concurrent commit appended (the Iceberg rewrite-validation model)."""
        last_err = None
        for _ in range(5):
            try:
                return self._compact_once(
                    spark,
                    drop_tombstones_before=drop_tombstones_before,
                    min_files=min_files,
                    n_buckets=n_buckets,
                )
            except CommitConflictError as e:
                last_err = e
        raise last_err

    def _compact_once(
        self,
        spark: SparkSession,
        *,
        drop_tombstones_before=None,
        min_files: int | None = None,
        n_buckets: int | None = None,
    ) -> dict | None:
        """Fold merge-on-read delta files into one resolved file per bucket
        and optionally age out LWW tombstones older than
        ``drop_tombstones_before`` (a warc_ts horizon).

        Long-running CDC accumulates one delta file per touched bucket per
        epoch plus delete tombstones; compaction restores read efficiency
        (this is where the merge work deferred by merge-on-read is paid,
        amortized over ``compact_every`` epochs). Tombstones may only be
        dropped once no event older than the horizon can still arrive (i.e.
        behind the stream's watermark) — dropping a younger tombstone would
        let a late replay resurrect the key.

        ``min_files``: incremental mode — rewrite only buckets holding ≥ that
        many files (under key-localized feeds cold buckets stay untouched, so
        each compaction is O(hot data), not O(table); at 10^5 buckets you run
        this continuously instead of big-bang). Tombstone aging requires the
        full pass (a partially-aged table would be inconsistent), so
        ``drop_tombstones_before`` forces min_files=None.

        ``n_buckets``: rebucket the table during the full pass — the ONLY
        legal way to change the key→bucket mapping (snapshots persist the
        bucket count; the constructor adopts it).
        """
        snap = self.current_snapshot()
        if snap is None:
            return None
        if drop_tombstones_before is not None or n_buckets is not None:
            min_files = None
        if min_files is not None:
            entries = self._entries(snap)
            touched = [int(b) for b, es in entries.items() if len(es) >= min_files]
            if not touched:
                return None
            sub = {str(b): entries[str(b)] for b in touched}
            df = self._read_resolved(spark, snap, sub)
            if df is None:
                return None
            self._current_write_schema = self.schema_columns()
            out = df.withColumn("_bucket", self._bucket_expr())
            new_snap = self._commit(
                spark,
                out,
                epoch_id=None,
                append=False,
                touched_buckets=touched,
                # untouched buckets may still hold unresolved deltas; the
                # table is fully resolved only when every bucket is ≤1 file
                resolved=all(
                    len(es) <= 1
                    for b, es in entries.items()
                    if int(b) not in set(touched)
                ),
                extra_meta={"compaction": True, "partial": True},
                kind="compact",
            )
            self.vacuum()
            return new_snap
        df = self.read_raw(spark)  # resolved
        if df is None:
            return None  # snapshot references zero live files — nothing to fold
        if drop_tombstones_before is not None and "is_deleted" in df.columns:
            df = df.where(
                (F.col("is_deleted").isNull())
                | (F.col("is_deleted") == 0)
                | (F.col("warc_ts") >= F.lit(drop_tombstones_before))
            )
        if n_buckets is not None:
            self.n_buckets = n_buckets
        self._current_write_schema = self.schema_columns()
        out = df.withColumn("_bucket", self._bucket_expr())
        new_snap = self._commit(
            spark,
            out,
            epoch_id=None,
            append=False,
            full_replace=True,
            resolved=True,
            extra_meta={"compaction": True},
            kind="compact",
        )
        self.vacuum()
        return new_snap

    def expire_snapshots(self, keep_last: int = 10) -> int:
        """Iceberg expire-snapshots twin: drop historical ``snap-*.json``
        older than the newest ``keep_last`` plus every manifest no longer
        referenced by a surviving snapshot. Superseded DATA files are
        vacuum's job; this bounds the _meta directory over a 10^6-epoch run
        (one snapshot json per commit, one manifest per touched bucket per
        commit would otherwise accumulate forever). Expired ids time-travel
        as None afterwards. Returns metadata files removed."""
        ids = self.snapshot_ids()
        keep = set(ids[-keep_last:]) if keep_last > 0 else set()
        cur = self.current_snapshot()
        if cur is not None:
            keep.add(cur["snapshot_id"])
        removed = 0
        for sid in ids:
            if sid in keep:
                continue
            os.remove(os.path.join(self.meta_dir, f"snap-{sid:012d}.json"))
            removed += 1
        live_refs: set[str] = set()
        live_rk: set[str] = set()
        for sid in keep:
            p = os.path.join(self.meta_dir, f"snap-{sid:012d}.json")
            if not os.path.exists(p):
                continue
            with open(p) as f:
                snap = json.load(f)
            for ref in snap["buckets"].values():
                if isinstance(ref, str):
                    live_refs.add(ref)
            # a surviving append snapshot's change-feed manifest stays too —
            # read_changes windows inside keep_last must remain servable
            if isinstance(snap.get("added"), str):
                live_refs.add(snap["added"])
            rk = (snap.get("meta") or {}).get("replaced_keys")
            if rk:
                live_rk.add(os.path.basename(rk))
        for fn in list(os.listdir(self.manifest_dir)):
            if fn.endswith(".json") and fn not in live_refs:
                os.remove(os.path.join(self.manifest_dir, fn))
                self._manifest_cache.pop(fn, None)
                removed += 1
        # replaced-key sidecars of expired replace commits (incl. orphans of
        # conflict-aborted attempts) go with their snapshots
        rep_dir = os.path.join(self.meta_dir, "replaced")
        if os.path.isdir(rep_dir):
            for d in list(os.listdir(rep_dir)):
                if d not in live_rk:
                    shutil.rmtree(os.path.join(rep_dir, d), ignore_errors=True)
                    removed += 1
        self._mark_expired(set())  # prune expired-ids of now-deleted snap jsons
        return removed

    def vacuum(self) -> int:
        """Delete data files unreferenced by the current snapshot (crash
        leftovers / superseded buckets) and commit dirs left holding no
        parquet at all (e.g. the _SUCCESS-only dirs of empty no-op-epoch
        appends — they would otherwise accumulate one per skipped epoch
        forever). Historical snapshots whose files are reclaimed here read
        as expired (``snapshot`` returns None). Returns files removed."""
        snap = self.current_snapshot()
        live: set[str] = set()
        if snap:
            for es in self._entries(snap).values():
                live.update(self._abs(e["p"]) for e in es)
            if self.retention_snapshots > 0:
                # retention window: the newest K non-expired historical
                # snapshots stay readable (time travel + read_changes) —
                # their files are live too. O(K) small JSON loads.
                expired = self._expired_ids()
                hist = [
                    s
                    for s in self.snapshot_ids()
                    if s != snap["snapshot_id"] and s not in expired
                ]
                for sid in sorted(hist)[-self.retention_snapshots:]:
                    old = self.snapshot(sid)
                    if old is None:
                        continue
                    for es in self._entries(old).values():
                        live.update(self._abs(e["p"]) for e in es)
        # pass 1: collect doomed files (no deletion yet)
        doomed: set[str] = set()
        empty_dirs: list[str] = []
        for entry in list(os.listdir(self.data_dir)):
            cdir = os.path.join(self.data_dir, entry)
            n_live = 0
            for root, _dirs, files in os.walk(cdir):
                for fn in files:
                    p = os.path.join(root, fn)
                    if not fn.endswith(".parquet"):
                        continue
                    if p in live:
                        n_live += 1
                    else:
                        doomed.add(p)
            if n_live == 0:
                empty_dirs.append(cdir)
        # pass 2: record which historical snapshots the reclaim expires,
        # BEFORE deleting (crash-safe: a snapshot is marked expired first,
        # so a torn vacuum can only over-expire, never serve missing files).
        # This is the one-time cost that lets snapshot() be O(1) per call.
        if doomed:
            cur_sid = snap["snapshot_id"] if snap else -1
            already = self._expired_ids()
            expired: set[int] = set()
            for sid in self.snapshot_ids():
                if sid == cur_sid or sid in already:
                    continue
                p = os.path.join(self.meta_dir, f"snap-{sid:012d}.json")
                try:
                    with open(p) as f:
                        old = json.load(f)
                    refs = any(
                        self._abs(e["p"]) in doomed
                        for es in self._entries(old).values()
                        for e in es
                    )
                except (FileNotFoundError, json.JSONDecodeError):
                    refs = True  # metadata already gone → expired
                if refs:
                    expired.add(sid)
            self._mark_expired(expired)
        removed = 0
        for p in doomed:
            os.remove(p)
            removed += 1
        for cdir in empty_dirs:
            shutil.rmtree(cdir, ignore_errors=True)
        return removed


def _align_to(df: DataFrame, columns: list[tuple[str, str]]) -> DataFrame:
    have = {f.name for f in df.schema.fields}
    return df.select(
        *[
            F.col(n).cast(t).alias(n) if n in have else F.lit(None).cast(t).alias(n)
            for n, t in columns
        ]
    )
