"""Deterministic change-event generator — the sandbox stand-in for
MySQL + Debezium + Kafka (reference operators S15/S16 and pipeline steps
EP1.2-4, SURVEY.md §3).

The reference *produces* change events with MySQL DML endpoints
(/root/reference/database.py:217-520) captured by Debezium into Kafka
(create_connector.bat:14-26). Here we synthesize the equivalent envelope
stream directly, seeded and reproducible:

- a **snapshot phase** of ``op='r'`` events (Debezium snapshot.mode=initial,
  create_connector.bat:23) followed by a **stream phase** of c/u/d events;
- **hot-url skew** (one url can receive up to ``hot_frac`` of all events);
- **out-of-order** event times within a watermark plus genuinely **late**
  events beyond it;
- **duplicate deliveries** of the same ``(file, pos)`` (at-least-once);
- **tombstone rows** (Kafka null-value messages, cdc_kafka_consumer.py:134-138);
- a **schema-evolution burst**: after ``evolve_at`` of the stream, payloads
  carry new source columns in the ``extra`` map (mirrors
  incremental_rag_system.py:216-243 added-field detection).

Two backends:

- :func:`generate_small` — driver-side Python, full-fidelity payloads
  (html/text synthesized from /root/testdata documents material), returns the
  event dicts for the pure-Python fold oracle. Used by pytest.
- :func:`generate_bench` — Spark-native ``spark.range``-based generator that
  scales to 10^7+ events by joining a broadcast pool of page bodies; used by
  bench.py. No driver-side loops over events.

All timestamps are derived from a fixed epoch — no wall clock anywhere.
"""

from __future__ import annotations

import datetime as dt
import os
import random
from typing import Any

from . import oracle

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)

_FALLBACK_WORDS = (
    "spark data table query merge join scan filter window batch stream row "
    "column key value sort hash index vector page crawl text lang section"
).split()


def _material_words(testdata_dir: str | None) -> list[str]:
    """Word pool from the driver's documents table (TESTDATA.md), fallback to
    a fixed list; deterministic either way."""
    if testdata_dir:
        path = os.path.join(testdata_dir, "documents.parquet")
        if os.path.exists(path):
            import pyarrow.parquet as pq

            texts = pq.read_table(path, columns=["text"]).column("text").to_pylist()
            words: list[str] = []
            for t in texts[:200]:
                words.extend(t.split())
            if words:
                return words[:5000]
    return list(_FALLBACK_WORDS)


def make_page_html(rng: random.Random, words: list[str], version: int) -> bytes:
    """Synthesize a Common-Crawl-ish page: numbered + markdown headings so the
    section chunker (main.py:105-159) produces multiple chunks."""
    n_sections = rng.randint(2, 6)
    parts = ["<html><body>", f"<p>preamble v{version} {rng.choice(words)}</p>"]
    for s in range(1, n_sections + 1):
        title = " ".join(rng.choice(words) for _ in range(rng.randint(1, 3)))
        if rng.random() < 0.3:
            parts.append(f"<h2>## {title}</h2>")
        else:
            parts.append(f"<h2>{s}. {title}</h2>")
        for _ in range(rng.randint(1, 3)):
            para = " ".join(rng.choice(words) for _ in range(rng.randint(5, 25)))
            parts.append(f"<p>{para}</p>")
        if rng.random() < 0.2:
            parts.append(f"<ul><li>- {rng.choice(words)}</li></ul>")
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


def _url(i: int) -> str:
    return f"https://site-{i % 50}.example.com/page/{i:06d}"


_LANGS = ["en", "vi", "es", "zh", "de"]


def generate_small(
    out_dir: str,
    *,
    n_urls: int = 100,
    n_events: int = 1000,
    n_segments: int = 8,
    seed: int = 42,
    hot_frac: float = 0.0,
    late_frac: float = 0.02,
    dup_frac: float = 0.02,
    tombstone_frac: float = 0.01,
    truncate_frac: float = 0.0,
    evolve_at: float | None = None,
    snapshot_urls: int | None = None,
    second_table_frac: float = 0.0,
    second_table: str = "authors",
    testdata_dir: str | None = None,
) -> list[dict[str, Any]]:
    """Write ordered parquet binlog segments under ``out_dir``; return the
    event dicts (excluding tombstones) for the fold oracle."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(seed)
    words = _material_words(testdata_dir)

    events: list[dict[str, Any]] = []  # for oracle
    rows: list[dict[str, Any]] = []  # for parquet (includes dups/tombstones)
    # per-source-table live state: a mixed Debezium feed interleaves several
    # tables' change events on one stream (topic-per-table fan-in,
    # auto_gen_rag.py:27,33-70); urls may overlap ACROSS tables — routing
    # must keep them apart
    lives: dict[str, dict[str, dict[str, Any]]] = {"pages": {}, second_table: {}}
    pos = 0

    def payload(url: str, ts: dt.datetime, version: int, extra: dict | None) -> dict:
        html = make_page_html(rng, words, version)
        return {
            "url": url,
            "warc_ts": ts,
            "html": html,
            "text": oracle.html_to_text(html),
            "lang": rng.choice(_LANGS),
            "extra": extra,
        }

    def envelope(
        op: str,
        before: dict | None,
        after: dict | None,
        ts: dt.datetime,
        table: str = "pages",
    ) -> dict:
        nonlocal pos
        pos += 1
        return {
            "op": op,
            "before": before,
            "after": after,
            "source": {
                "db": "testdb",
                "table": table,
                "file": f"binlog.{pos // 1000:06d}",
                "pos": pos,
            },
            "ts_ms": int((ts - T0).total_seconds() * 1000) + 1_700_000_000_000,
        }

    # --- snapshot phase: op='r' for an initial subset of urls ---------------
    n_snap = n_urls // 2 if snapshot_urls is None else snapshot_urls
    for i in range(n_snap):
        url = _url(i)
        ts = T0 + dt.timedelta(milliseconds=pos)
        p = payload(url, ts, 0, None)
        ev = envelope("r", None, p, ts)
        lives["pages"][url] = p
        events.append(ev)
        rows.append(ev)

    # --- stream phase --------------------------------------------------------
    stream_start = len(rows)
    for i in range(n_events):
        if rng.random() < tombstone_frac:
            rows.append({"op": None, "before": None, "after": None, "source": None, "ts_ms": None})
            continue

        table = (
            second_table
            if second_table_frac and rng.random() < second_table_frac
            else "pages"
        )
        live = lives[table]

        if truncate_frac and rng.random() < truncate_frac:
            # TRUNCATE TABLE captured by Debezium: op='t', no row image
            # (QUICK_START.md:282-288). Emitted in-order (DDL is not subject
            # to the generator's event-time jitter); the after image carries
            # only the event time the engine orders by.
            ts = T0 + dt.timedelta(seconds=1 + i)
            # snapshot-first contract: like data events, a truncate must sort
            # AFTER every snapshot 'r' row — without this clamp, n_snap >
            # 1000*(1+i) (many urls + an early truncate) puts 'r' rows after
            # the 't' in the oracle fold (re-inserted) while the engine's
            # horizon kills them unconditionally (k0=0 < 1)
            ts = max(ts, T0 + dt.timedelta(milliseconds=n_snap + 1))
            p = {
                "url": None,
                "warc_ts": ts,
                "html": None,
                "text": None,
                "lang": None,
                "extra": None,
            }
            ev = envelope("t", None, p, ts, table)
            live.clear()
            events.append(ev)
            rows.append(ev)
            continue

        if hot_frac > 0 and rng.random() < hot_frac:
            url = _url(0)
        else:
            url = _url(rng.randrange(n_urls))

        ts = T0 + dt.timedelta(seconds=1 + i, milliseconds=rng.randrange(1000))
        if rng.random() < 0.10:  # out-of-order within watermark
            ts -= dt.timedelta(seconds=rng.randrange(1, 30))
        if rng.random() < late_frac:  # beyond-watermark late event
            ts -= dt.timedelta(minutes=rng.randrange(20, 120))
        ts = max(ts, T0 + dt.timedelta(milliseconds=n_snap + 1))

        extra = None
        if evolve_at is not None and i >= int(n_events * evolve_at):
            extra = {"title": f"title-{rng.randrange(1000)}", "fetch_status": "200"}

        before = live.get(url)
        if before is None:
            p = payload(url, ts, i + 1, extra)
            ev = envelope("c", None, p, ts, table)
            live[url] = p
        elif rng.random() < 0.08:
            ev = envelope("d", dict(before, warc_ts=ts), None, ts, table)
            live.pop(url, None)
        else:
            p = payload(url, ts, i + 1, extra)
            ev = envelope("u", before, p, ts, table)
            live[url] = p
        events.append(ev)
        rows.append(ev)
        if rng.random() < dup_frac:  # duplicate delivery of the same (file,pos)
            rows.append(ev)

    # --- write ordered segments ----------------------------------------------
    os.makedirs(out_dir, exist_ok=True)
    seg_size = max(1, (len(rows) + n_segments - 1) // n_segments)
    schema = _arrow_envelope_schema()
    for s in range(0, len(rows), seg_size):
        seg = rows[s : s + seg_size]
        table = pa.Table.from_pylist([_to_arrow_row(r) for r in seg], schema=schema)
        pq.write_table(table, os.path.join(out_dir, f"segment-{s // seg_size:05d}.parquet"))

    del stream_start
    return events


def write_jsonl_segments(
    rows: list[dict[str, Any]],
    out_dir: str,
    *,
    n_segments: int = 4,
    corrupt_frac: float = 0.0,
    seed: int = 42,
) -> None:
    """Serialize envelope rows as JSONL segments — the wire-faithful Debezium
    feed (JSON on the topic, QUICK_START.md:256-288). html is base64 (how
    from_json decodes BinaryType); timestamps are ISO-8601 UTC. Optionally
    interleaves corrupt lines to exercise the P3 corrupt-row filter."""
    import base64
    import json

    rng = random.Random(seed)

    def conv_payload(p):
        if p is None:
            return None
        q = dict(p)
        if isinstance(q.get("warc_ts"), dt.datetime):
            q["warc_ts"] = q["warc_ts"].strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"
        if q.get("html") is not None:
            q["html"] = base64.b64encode(q["html"]).decode("ascii")
        return q

    lines: list[str] = []
    for r in rows:
        if corrupt_frac and rng.random() < corrupt_frac:
            lines.append(rng.choice(["{not json", "", '{"op": 12, "source": "x"}']))
        lines.append(
            json.dumps(
                {
                    "op": r["op"],
                    "before": conv_payload(r.get("before")),
                    "after": conv_payload(r.get("after")),
                    "source": r.get("source"),
                    "ts_ms": r.get("ts_ms"),
                },
                ensure_ascii=False,
            )
        )
    os.makedirs(out_dir, exist_ok=True)
    seg_size = max(1, (len(lines) + n_segments - 1) // n_segments)
    for s in range(0, len(lines), seg_size):
        with open(os.path.join(out_dir, f"segment-{s // seg_size:05d}.jsonl"), "w") as f:
            f.write("\n".join(lines[s : s + seg_size]) + "\n")


def _arrow_envelope_schema():
    import pyarrow as pa

    payload = pa.struct(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("extra", pa.map_(pa.string(), pa.string())),
        ]
    )
    source = pa.struct(
        [("db", pa.string()), ("table", pa.string()), ("file", pa.string()), ("pos", pa.int64())]
    )
    return pa.schema(
        [
            ("op", pa.string()),
            ("before", payload),
            ("after", payload),
            ("source", source),
            ("ts_ms", pa.int64()),
        ]
    )


def _to_arrow_row(r: dict[str, Any]) -> dict[str, Any]:
    def conv_payload(p):
        if p is None:
            return None
        q = dict(p)
        if q.get("extra") is not None:
            q["extra"] = list(q["extra"].items())
        return q

    return {
        "op": r["op"],
        "before": conv_payload(r.get("before")),
        "after": conv_payload(r.get("after")),
        "source": r.get("source"),
        "ts_ms": r.get("ts_ms"),
    }


# ---------------------------------------------------------------------------
# Spark-native bench generator
# ---------------------------------------------------------------------------


def generate_bench(
    spark,
    out_dir: str,
    *,
    n_urls: int = 100_000,
    n_events: int = 1_000_000,
    n_segments: int = 64,
    pool_size: int = 512,
    seed: int = 42,
    hot_frac: float = 0.05,
    noop_frac: float = 0.0,
    testdata_dir: str | None = None,
) -> None:
    """Scalable generator: no driver-side per-event loop. A small broadcast
    pool of page bodies is joined onto a ``spark.range`` of events whose url /
    op / timestamp columns are pure deterministic column expressions, then the
    envelope is written as ordered parquet segments.

    Design note (100 TB thinking): event synthesis is embarrassingly parallel
    — ``spark.range`` partitions linearly, the body pool is broadcast (a few
    MB), and the only shuffle is the final ``repartitionByRange`` that lays
    out segments in pos order for the file-stream replay.

    ``noop_frac``: fraction of urls whose body is FIXED per url — every
    update to such a url carries identical content (the CDC reality of
    metadata-only row updates), exercising the engine's content-hash
    re-chunk/re-embed skip. The other urls change body per event.
    """
    from pyspark.sql import functions as F

    rng = random.Random(seed)
    words = _material_words(testdata_dir)
    pool_rows = []
    for body_id in range(pool_size):
        html = make_page_html(rng, words, body_id)
        pool_rows.append((body_id, bytearray(html), rng.choice(_LANGS)))
    pool = spark.createDataFrame(pool_rows, "body_id int, html binary, lang string")

    hot_permille = int(hot_frac * 1000)
    ev = (
        spark.range(0, n_events, 1, numPartitions=max(n_segments, 32))
        .withColumn("pos", F.col("id") + 1)
        .withColumn("h1", F.xxhash64(F.col("id"), F.lit(seed)))
        .withColumn("h2", F.xxhash64(F.col("id"), F.lit(seed + 1)))
        .withColumn(
            "url_id",
            F.when(F.pmod("h1", F.lit(1000)) < hot_permille, F.lit(0)).otherwise(
                F.pmod("h2", F.lit(n_urls))
            ),
        )
        .withColumn(
            "op",
            F.when(F.pmod("h1", F.lit(100)) < 5, F.lit("d"))
            .when(F.pmod("h1", F.lit(100)) < 25, F.lit("c"))
            .otherwise(F.lit("u")),
        )
        .withColumn(
            "warc_ts",
            F.lit(T0)
            + F.make_interval(secs=F.col("id") + 1)
            - F.make_interval(secs=F.pmod("h2", F.lit(30))),
        )
        .withColumn(
            "body_id",
            F.when(
                F.pmod(F.xxhash64(F.col("url_id"), F.lit(seed + 2)), F.lit(1000))
                < int(noop_frac * 1000),
                F.pmod(F.xxhash64(F.col("url_id"), F.lit(seed + 3)), F.lit(pool_size)),
            )
            .otherwise(F.pmod("h1", F.lit(pool_size)))
            .cast("int"),
        )
    )

    url = F.concat(
        F.lit("https://site-"),
        F.pmod("url_id", F.lit(50)).cast("string"),
        F.lit(".example.com/page/"),
        F.lpad(F.col("url_id").cast("string"), 6, "0"),
    )

    def payload_struct(with_body: bool) -> F.Column:
        return F.struct(
            url.alias("url"),
            F.col("warc_ts").alias("warc_ts"),
            (F.col("html") if with_body else F.lit(None).cast("binary")).alias("html"),
            F.lit(None).cast("string").alias("text"),
            (F.col("lang") if with_body else F.lit(None).cast("string")).alias("lang"),
            F.lit(None).cast("map<string,string>").alias("extra"),
        )

    env = ev.join(F.broadcast(pool), "body_id").select(
        F.col("op"),
        # deletes carry the FULL before image with the delete-time warc_ts
        # (docker-compose.yml:32 binlog_row_image=FULL)
        F.when(F.col("op") == "d", payload_struct(False)).alias("before"),
        F.when(F.col("op") != "d", payload_struct(True)).alias("after"),
        F.struct(
            F.lit("testdb").alias("db"),
            F.lit("pages").alias("table"),
            F.concat(
                F.lit("binlog."),
                F.lpad((F.col("pos") / 1000).cast("long").cast("string"), 6, "0"),
            ).alias("file"),
            F.col("pos"),
        ).alias("source"),
        (F.unix_timestamp("warc_ts") * 1000).alias("ts_ms"),
        F.col("pos").alias("_order"),
    )

    (
        env.repartitionByRange(n_segments, "_order")
        .sortWithinPartitions("_order")
        .drop("_order")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
