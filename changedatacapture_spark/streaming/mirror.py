"""Feed-driven downstream mirror — the engine's own stand-in for the
reference's vector-store sync loop (incremental_pinecone_updater.py:97-202:
tail the change log, upsert changed vectors, delete stale ids, full re-sync
when the incremental path cannot be trusted).

A :class:`FeedMirror` tails a source :class:`~..sinks.lake.LakeTable`'s
snapshot-window change feed (``read_changes``) into a SEPARATE row-mode
LakeTable and is provably equal to the source's live set after every sync
(``diff_vs_source`` — two distributed ``exceptAll`` counts, no driver-side
state). It exists to close the loop on the feed surface (VERDICT r5 item 2):
if a mirror maintained ONLY from the feed equals the source across epochs,
compaction, vacuum-with-retention, truncate, and an unavailability re-sync,
the feed is complete and exactly classified.

Apply semantics — REPLACE by key (the vector-store upsert-by-id model), not
LWW merge:

- **row-mode source** (pages): feed rows are ≤1 per key; each sync replaces
  the mirror's row for every fed key (deletes = keys replaced with no row).
- **set-mode source** (chunks; pass ``member_key``): feed rows are ≤1 per
  (key, member); the mirror keys them by a synthesized ``_member_id``
  (``key\\x00member``) — one mirror row per set member, one vector per
  chunk_id downstream.
- replace-apply is what makes REPLACE-window feeds (the state-diff path,
  ``LakeTable._changes_state_diff``) applicable at all: a ``replace_keys``
  rewrite can change a payload without advancing its LWW order key, so a
  merge-based apply would tie and drop the update; overwrite-by-id cannot.
- a TRUNCATE inside the window is consumed with ``allow_truncate=True`` and
  its horizon is re-applied to the mirror as snapshot metadata — the mirror
  kills the same rows the source did, without ever seeing them as feed rows.
- :class:`~..sinks.lake.ChangeFeedUnavailableError` (window vacuumed,
  replace_keys/rebucket inside it, retention exceeded) triggers
  :meth:`resync`: wipe the mirror and rebuild from a pinned-snapshot
  ``read()`` — the reference's "full re-sync" escape hatch.

Idempotent + restartable: every apply records the consumed source snapshot id
in the mirror snapshot's ``meta`` (``feed_cursor``) ON THE SAME COMMIT as the
apply, so apply + cursor advance are atomic and a restarted consumer resumes
from its durable cursor — the next poll's ``since == until`` makes a replayed
window a no-op. That cursor atomicity IS the exactly-once mechanism (each
sync mints a fresh epoch id, so the epoch log alone would not dedup a
re-consumed window); re-applying an already-applied window would in any case
be harmless by construction (replace-by-id overwrites with identical rows).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks.lake import ChangeFeedUnavailableError, LakeTable

_MEMBER_SEP = "\x00"


class FeedMirror:
    def __init__(
        self,
        source: LakeTable,
        path: str,
        *,
        member_key: str | None = None,
        n_buckets: int | None = None,
    ):
        if source.mode == "set":
            assert member_key is not None, "set-mode sources need member_key="
        else:
            assert source.mode == "row" and member_key is None
        self.source = source
        self.member_key = member_key
        self.path = os.path.abspath(path)
        self.n_buckets = n_buckets or source.n_buckets
        self._open_table()

    def _open_table(self) -> None:
        key = self.source.key if self.member_key is None else "_member_id"
        self.table = LakeTable(
            self.path, key=key, n_buckets=self.n_buckets, mode="row"
        )

    # -- cursor ----------------------------------------------------------------

    @property
    def cursor(self) -> int:
        """Last consumed source snapshot id (durable: recorded in the mirror
        snapshot's meta by every apply; 0 = never synced)."""
        snap = self.table.current_snapshot()
        return int((snap or {}).get("meta", {}).get("feed_cursor", 0))

    def _next_epoch(self) -> int:
        snap = self.table.current_snapshot()
        if snap is None:
            return 0
        eps = [int(e) for e in snap.get("epochs", {})]
        floor = int(snap.get("epoch_floor", -1))
        return max(eps + [floor]) + 1

    # -- sync ------------------------------------------------------------------

    def sync(self, spark: SparkSession) -> str:
        """One consumer poll: apply the feed window (cursor, current] to the
        mirror. Returns 'noop' | 'applied' | 'resync'."""
        cur = self.source.current_snapshot()
        if cur is None:
            return "noop"
        until = int(cur["snapshot_id"])
        since = self.cursor
        if until <= since:
            return "noop"
        try:
            feed = self.source.read_changes(
                spark,
                since,
                until,
                allow_truncate=True,
                member_key=self.member_key,
            )
        except ChangeFeedUnavailableError:
            self.resync(spark)
            return "resync"
        # `until` was assigned from cur["snapshot_id"] above, so cur IS the
        # until snapshot (the r6 conditional re-deriving it was dead code)
        horizon = cur.get("truncate")
        self._apply(spark, feed, until, horizon)
        return "applied"

    def _feed_rows(self, feed: DataFrame) -> DataFrame:
        rows = feed.withColumn(
            "is_deleted", (F.col("_change_type") == "delete").cast("int")
        ).drop("_change_type", "_commit_sid")
        if self.member_key is not None:
            rows = rows.withColumn(
                "_member_id",
                F.concat_ws(
                    _MEMBER_SEP,
                    F.col(self.source.key),
                    F.col(self.member_key).cast("string"),
                ),
            )
        return rows

    def _apply(
        self,
        spark: SparkSession,
        feed: DataFrame | None,
        until: int,
        horizon: list | None,
    ) -> None:
        meta = {"feed_cursor": until}
        if feed is None:
            # commits in the window but zero net changes (or pure metadata)
            # — advance the durable cursor with an empty append
            empty = spark.createDataFrame(
                [], "op string, warc_ts timestamp, pos long"
            ).withColumn(self.table.key, F.lit(None).cast("string"))
            self.table.merge_lww(
                spark,
                empty,
                epoch_id=self._next_epoch(),
                pre_reduced=True,
                truncate=horizon,
                extra_meta=meta,
            )
            return
        # apply by REPLACE, not LWW merge: a feed row overwrites the mirror's
        # row for that key unconditionally (the vector-store upsert-by-id
        # model). This is what makes replace-window (state-diff) feeds
        # applicable at all — a rewrite can change a payload WITHOUT
        # advancing the LWW order key, so a merge-based apply would tie and
        # lose the update. The feed-cursor meta rides the same commit, so
        # apply + cursor advance are atomic — the next poll's since==until
        # no-ops a replayed window (each sync mints a fresh epoch id, so
        # cursor atomicity, not the epoch log, is the dedup mechanism).
        rows = self._feed_rows(feed)
        key = self.table.key
        upserts = rows.where(F.col("is_deleted") == 0).drop("is_deleted")
        self.table.replace_keys(
            spark,
            upserts,
            rows.select(key),
            epoch_id=self._next_epoch(),
            truncate=horizon,
            extra_meta=meta,
        )

    def resync(self, spark: SparkSession) -> None:
        """Full rebuild: wipe the mirror and copy the source's live set as of
        a PINNED snapshot (so a concurrent source commit cannot tear the
        copy), then set the cursor to that snapshot."""
        cur = self.source.current_snapshot()
        shutil.rmtree(self.path, ignore_errors=True)
        self._open_table()
        if cur is None:
            return
        sid = int(cur["snapshot_id"])
        src = self.source.read(spark, snapshot_id=sid)
        meta = {"feed_cursor": sid}
        if src is None:
            self._apply(spark, None, sid, cur.get("truncate"))
            return
        rows = src.withColumn("is_deleted", F.lit(0))
        if self.member_key is not None:
            rows = rows.withColumn(
                "_member_id",
                F.concat_ws(
                    _MEMBER_SEP,
                    F.col(self.source.key),
                    F.col(self.member_key).cast("string"),
                ),
            )
        self.table.merge_lww(
            spark,
            rows,
            epoch_id=0,
            pre_reduced=True,
            truncate=cur.get("truncate"),
            extra_meta=meta,
        )

    # -- verification ----------------------------------------------------------

    def diff_vs_source(self, spark: SparkSession) -> int:
        """Distributed equality proof: |source.live \\ mirror.live| +
        |mirror.live \\ source.live| over the shared columns (0 ⇔ the mirror
        exactly equals the source's current live set).

        Set-mode sources compare on (key, member, payload) WITHOUT the
        (op, warc_ts, pos) order columns: an unchanged member is suppressed
        from the feed by design (never re-upserted — the reference's skip of
        unchanged chunks, incremental_pinecone_updater.py:245-277), so the
        mirror legitimately keeps the member's ORIGINAL upsert metadata
        while the source row carries its newest set's order. The payload —
        what a vector store actually serves — must still match exactly."""
        src = self.source.read(spark)
        mir = self.table.read(spark)
        if src is None or mir is None:
            # equal only if both empty
            a = 0 if src is None else src.count()
            b = 0 if mir is None else mir.count()
            return a + b
        skip = {"_member_id", "is_deleted"}
        if self.member_key is not None:
            skip |= {"op", "warc_ts", "pos"}
        cols = sorted((set(src.columns) & set(mir.columns)) - skip)
        a = src.select(*cols)
        b = mir.select(*cols)
        return a.exceptAll(b).count() + b.exceptAll(a).count()


class VectorFeedMirror:
    """Feed-driven downstream VECTOR INDEX — the literal analogue of the
    reference's Pinecone updater loop (incremental_pinecone_updater.py:
    97-202 tail changes, :245-277 upsert changed vectors / delete stale
    ids, :300+ full re-sync when the incremental path can't be trusted):
    tail the set-mode chunks table's member-granular change feed into a
    SEPARATE :class:`~..functions.vector_index.IncrementalVectorIndex`.

    Per sync (one poll of ``read_changes(member_key=..., include_old=True)``):

    - insert/update members upsert their NEW vector into its bucket;
    - update/delete members tombstone the OLD ``chunk_id`` in the OLD
      embedding's bucket — derivable ONLY from the feed's ``_old``
      preimage (a content edit changes the chunk_id and can move the
      vector across LSH buckets; without the preimage the stale id would
      survive as a live search hit);
    - unchanged members were suppressed upstream, so an unedited chunk's
      vector is never re-upserted (the reference's skip);
    - a truncate horizon inside the window rides the index commit and
      kills unmentioned urls' vectors at probe time;
    - the durable cursor (``feed_cursor``) rides the SAME index commit
      (``extra_meta``), so apply + cursor advance are atomic and a crashed
      consumer resumes exactly once — the next poll's ``since == until``
      no-ops a replayed window (each sync mints a fresh epoch id, so the
      cursor atomicity, not the epoch log, is the dedup mechanism).

    :class:`~..sinks.lake.ChangeFeedUnavailableError` → :meth:`resync`:
    wipe the index and rebuild from a pinned-snapshot read of the source.

    All distributed: O(feed) work per sync, no driver-side row state.
    """

    def __init__(self, source: LakeTable, path: str, *, member_key: str = "chunk_index",
                 n_planes: int = 8, dim: int | None = None, centroids=None):
        from ..functions.vector_index import IncrementalVectorIndex

        assert source.mode == "set", "VectorFeedMirror consumes a set-mode chunks table"
        self.source = source
        self.member_key = member_key
        self.path = os.path.abspath(path)
        self._index_kw = dict(n_planes=n_planes, dim=dim, centroids=centroids)
        self.index = IncrementalVectorIndex(self.path, **self._index_kw)

    @property
    def cursor(self) -> int:
        snap = self.index.table.current_snapshot()
        return int((snap or {}).get("meta", {}).get("feed_cursor", 0))

    def _next_epoch(self) -> int:
        snap = self.index.table.current_snapshot()
        if snap is None:
            return 0
        eps = [int(e) for e in snap.get("epochs", {})]
        floor = int(snap.get("epoch_floor", -1))
        return max(eps + [floor]) + 1

    def sync(self, spark: SparkSession) -> str:
        """One consumer poll. Returns 'noop' | 'applied' | 'resync'."""
        cur = self.source.current_snapshot()
        if cur is None:
            return "noop"
        until = int(cur["snapshot_id"])
        since = self.cursor
        if until <= since:
            return "noop"
        try:
            # payload projection (round 7): the index consumes only
            # (chunk_id, embedding) of each member — both are derived from
            # the chunk's content (chunk_id = url+index, embedding =
            # f(content)), so they determine the full payload and the
            # pruned feed classifies/suppresses identically while the
            # window scan, pre-state read and every exchange skip the
            # content/section bytes (guide §2.3).
            feed = self.source.read_changes(
                spark,
                since,
                until,
                allow_truncate=True,
                member_key=self.member_key,
                include_old=True,
                columns=["chunk_id", "embedding"],
            )
        except ChangeFeedUnavailableError:
            self.resync(spark)
            return "resync"
        horizon = (self.source.snapshot(until) or {}).get("truncate")
        self._apply(spark, feed, until, horizon)
        return "applied"

    def _apply(self, spark: SparkSession, feed: DataFrame | None, until: int,
               horizon: list | None) -> None:
        meta = {"feed_cursor": until}
        if feed is None:
            # commits but zero net member changes — advance the cursor with
            # an empty index epoch (dim-less virgin index: upsert skips the
            # commit, the cursor stays put, and the next poll re-reads a
            # wider window — harmless, nothing was lost)
            empty = spark.createDataFrame(
                [],
                "chunk_id string, url string, op string, warc_ts timestamp, "
                "pos long, embedding array<float>",
            )
            self.index.upsert(
                spark, empty, None, epoch_id=self._next_epoch(),
                truncate=horizon, extra_meta=meta,
            )
            return
        feed = feed.persist()  # one window scan feeds both branches below
        try:
            key = self.source.key
            new_vecs = (
                feed.where(F.col("_change_type") != "delete")
                .where(F.col("embedding").isNotNull())
                .select("chunk_id", F.col(key).alias("url"),
                        "op", "warc_ts", "pos", "embedding")
            )
            replaced = None
            if self.index.dim is not None:
                # a virgin index holds no stale rows (and its only possible
                # window — cursor 0 — is insert-only, no preimages); with
                # dim known, bucket the OLD embeddings to route tombstones
                old = feed.where(
                    F.col("_old").isNotNull() & F.col("_old.embedding").isNotNull()
                )
                replaced = (
                    old.withColumn("_old_emb", F.col("_old.embedding"))
                    .withColumn("bucket", self.index.bucket_of("_old_emb"))
                    .select(
                        F.col("_old.chunk_id").alias("chunk_id"),
                        F.col(key).alias("url"),
                        "op", "warc_ts", "pos", "bucket",
                    )
                )
            self.index.upsert(
                spark, new_vecs, replaced, epoch_id=self._next_epoch(),
                truncate=horizon, extra_meta=meta,
            )
        finally:
            feed.unpersist()

    def resync(self, spark: SparkSession, snapshot_id: int | None = None) -> None:
        """Full rebuild from a pinned source snapshot (the reference's
        re-sync escape hatch): bulk-upsert every live vector and set the
        cursor to that snapshot — all in one commit. ``snapshot_id`` pins a
        HISTORICAL snapshot (default: current) — a consumer bootstrapping
        at a known point before tailing the feed.

        The replacement index is built in a SIBLING temp directory and
        swapped into place with directory renames (ADVICE r6): a concurrent
        searcher keeps reading the old index's files throughout the build
        (POSIX unlinked-inode semantics), never an empty or half-built one,
        and a crash mid-build leaves the old index fully intact (leftover
        ``.resync-*`` dirs are reclaimed by the next resync). The only
        non-atomic window left is the instant between the two renames."""
        from ..functions.vector_index import IncrementalVectorIndex

        cur = (
            self.source.current_snapshot()
            if snapshot_id is None
            else self.source.snapshot(snapshot_id)
        )
        if cur is None:
            shutil.rmtree(self.path, ignore_errors=True)
            self.index = IncrementalVectorIndex(self.path, **self._index_kw)
            return
        tmp = self.path + ".resync-tmp"
        old = self.path + ".resync-old"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
        new_index = IncrementalVectorIndex(tmp, **self._index_kw)
        sid = int(cur["snapshot_id"])
        src = self.source.read(spark, snapshot_id=sid)
        if src is not None:
            rows = src.where(F.col("embedding").isNotNull()).select(
                "chunk_id", F.col(self.source.key).alias("url"),
                "op", "warc_ts", "pos", "embedding",
            )
            new_index.upsert(
                spark, rows, None, epoch_id=0,
                truncate=cur.get("truncate"),
                extra_meta={"feed_cursor": sid},
            )
        # src None (virgin source): cursor 0 is already correct — swap in
        # the empty build either way
        if os.path.exists(self.path):
            os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old, ignore_errors=True)
        self.index = IncrementalVectorIndex(self.path, **self._index_kw)

    def diff_vs_source(self, spark: SparkSession) -> int:
        """|source live vectors Δ index live vectors| on (chunk_id,
        embedding) — 0 ⇔ every search candidate set is exactly the source's
        current chunk vectors (two distributed exceptAll counts)."""
        src = self.source.read(spark)
        idx = self.index.live_rows(spark)
        a = (
            None
            if src is None
            else src.where(F.col("embedding").isNotNull())
            .select("chunk_id", "embedding")
        )
        b = None if idx is None else idx.select("chunk_id", "embedding")
        if a is None or b is None:
            return (0 if a is None else a.count()) + (0 if b is None else b.count())
        return a.exceptAll(b).count() + b.exceptAll(a).count()
