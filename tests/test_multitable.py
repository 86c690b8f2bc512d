"""Multi-table dispatch (VERDICT r2 'what's missing #2'): a MIXED Debezium
feed interleaving several source tables on one stream routes on
``source.table`` to per-table lakes — the reference's topic-per-table
deployment (auto_gen_rag.py:27,33-70) as one StreamingQuery. Urls overlap
ACROSS tables, so only correct routing can make both folds match."""

from changedatacapture_spark import gen, oracle
from changedatacapture_spark.streaming.driver import MultiTablePipeline


def _fold_table(events, table):
    return oracle.fold_events(
        [e for e in events if e["source"]["table"] == table]
    )


def test_two_table_routing_matches_per_table_oracle(spark, tmp_path, testdata_dir):
    seg_dir = str(tmp_path / "log")
    events = gen.generate_small(
        seg_dir,
        n_urls=40,
        n_events=320,
        seed=31,
        n_segments=6,
        second_table_frac=0.35,
        truncate_frac=0.01,  # truncates must stay table-scoped
        testdata_dir=testdata_dir,
    )
    by_table = {
        t: {e["source"]["pos"] for e in events if e["source"]["table"] == t}
        for t in ("pages", "authors")
    }
    assert by_table["pages"] and by_table["authors"], "mixed feed expected"

    # overlapping url spaces: routing, not luck, must separate the tables
    urls = {
        t: {
            (e.get("after") or {}).get("url")
            for e in events
            if e["source"]["table"] == t and e["op"] in ("c", "u", "r")
        }
        for t in ("pages", "authors")
    }
    assert urls["pages"] & urls["authors"], "url spaces should overlap"

    multi = MultiTablePipeline(str(tmp_path / "lake"), ["pages", "authors"], n_buckets=4)
    multi.run_stream(
        spark, seg_dir, str(tmp_path / "ckpt"), max_files_per_trigger=3, timeout_sec=300
    )

    for t in ("pages", "authors"):
        exp = _fold_table(events, t)
        got = {r["url"]: r["text"] for r in multi[t].pages.read(spark).collect()}
        assert set(got) == set(exp), f"table {t}: key sets diverge"
        for url, p in exp.items():
            assert got[url] == p["text"], f"table {t}: text mismatch {url}"

        exp_chunks = {u: oracle.chunk_by_sections(p["text"]) for u, p in exp.items()}
        got_chunks = {}
        for r in multi[t].chunks.read(spark).collect():
            got_chunks.setdefault(r["url"], []).append(r)
        assert set(got_chunks) == {u for u, c in exp_chunks.items() if c}
        for url, rows in got_chunks.items():
            rows = sorted(rows, key=lambda r: r["chunk_index"])
            assert [g["content"] for g in rows] == [
                e["content"] for e in exp_chunks[url]
            ], f"table {t}: chunk bytes differ for {url}"


def test_unconfigured_table_is_dropped_and_replay_is_noop(spark, tmp_path, testdata_dir):
    """Events of an unconfigured source table are skipped (reference: unknown
    topic → log-and-skip); replaying the same batch is exactly-once per
    table."""
    seg_dir = str(tmp_path / "log")
    events = gen.generate_small(
        seg_dir,
        n_urls=20,
        n_events=120,
        seed=37,
        n_segments=2,
        second_table_frac=0.4,
        testdata_dir=testdata_dir,
    )
    # configure ONLY pages: authors events must not leak in
    multi = MultiTablePipeline(str(tmp_path / "lake"), ["pages"], n_buckets=2)
    multi.run_batch(spark, seg_dir)
    exp = _fold_table(events, "pages")
    got = {r["url"]: r["text"] for r in multi["pages"].pages.read(spark).collect()}
    assert set(got) == set(exp)

    sid = multi["pages"].pages.current_snapshot()["snapshot_id"]
    multi.run_batch(spark, seg_dir)  # same epoch_id=0 → no-op
    assert multi["pages"].pages.current_snapshot()["snapshot_id"] == sid
