"""Envelope projection & hygiene filters (reference operators P1-P4,
SURVEY.md §2.2).

The reference walks the Debezium payload dict per message
(auto_gen_rag.py:33-70) and skips tombstones (cdc_kafka_consumer.py:134-138)
and transport errors (kafka_cdc_to_rag.py:56-58). Here those become one
declarative projection Catalyst can push into the scan: tombstone/corrupt
filters are plain null predicates (pushed to parquet row-group stats), and
the payload coalesce is a column expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import ENVELOPE_SCHEMA


def read_segments(spark: SparkSession, segments_dir: str) -> DataFrame:
    """Batch-read binlog segments (ordered parquet files)."""
    return spark.read.schema(ENVELOPE_SCHEMA).parquet(segments_dir)


def read_segments_stream(spark: SparkSession, segments_dir: str, max_files: int | None = None) -> DataFrame:
    """Streaming file source over binlog segments — the sandbox equivalent of
    ``readStream.format("kafka")`` (reference S1-S4). ``maxFilesPerTrigger``
    is the backpressure knob (README.md:300-303 → maxOffsetsPerTrigger)."""
    reader = spark.readStream.schema(ENVELOPE_SCHEMA)
    if max_files:
        reader = reader.option("maxFilesPerTrigger", max_files)
    return reader.parquet(segments_dir)


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """The production source: the Debezium topic itself (reference consumers
    S1-S4 poll ``{server}.{db}.{table}``, auto_gen_rag.py:27). Tombstones
    (null Kafka values) become all-null envelopes and drop in
    :func:`filter_tombstones`; the Kafka record key (the PK,
    README.md:989-999) rides along as ``_kafka_key`` for partition auditing.

    Not exercisable in this sandbox (no broker) — the file-segment sources
    above are wire-equivalent and share every downstream operator; this
    function is the one-line swap for a real deployment.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    return project_kafka_records(reader.load())


def project_kafka_records(raw: DataFrame) -> DataFrame:
    """Kafka-record-shaped rows (binary key/value) → envelope columns.

    Pure projection shared by the stream builder above and the tests (no
    broker in this sandbox, so the parse path is exercised by feeding
    Debezium-shaped JSON through a batch DataFrame with the Kafka source's
    schema — tests/test_diff_and_sources.py). Null Kafka values (compaction
    tombstones, cdc_kafka_consumer.py:134-138) and corrupt JSON both parse to
    all-null envelopes and drop in :func:`filter_tombstones`.
    """
    return raw.select(
        F.from_json(F.col("value").cast("string"), ENVELOPE_SCHEMA).alias("e"),
        F.col("key").cast("string").alias("_kafka_key"),
    ).select("e.*", "_kafka_key")


def _project_jsonl(raw: DataFrame, keep_corrupt: bool) -> DataFrame:
    parsed = raw.select(
        F.from_json(F.col("value"), ENVELOPE_SCHEMA).alias("e"),
        F.col("value").alias("_raw"),
    )
    if not keep_corrupt:
        return parsed.select("e.*")
    # a line whose parse failed comes back as an ALL-NULL struct (from_json
    # PERMISSIVE — verified, not a null struct); the rows
    # :func:`filter_tombstones` would drop are exactly the corrupt ones, so
    # carry their raw line + segment + scan-relative offset for the
    # dead-letter table instead of silently dropping (VERDICT r4 item 4 —
    # the reference at least surfaces skip counters,
    # cdc_kafka_consumer.py:57-65). NOTE: a literal JSON `null` line lands
    # here too — JSONL transport has no Kafka-style compaction tombstone,
    # so an unusable envelope == corrupt.
    bad = F.col("e.op").isNull() | F.col("e.source").isNull()
    return parsed.select(
        "e.*",
        F.when(bad, F.col("_raw")).alias("_corrupt_raw"),
        F.input_file_name().alias("_corrupt_src"),
        F.monotonically_increasing_id().alias("_corrupt_offset"),
    )


def read_segments_jsonl(
    spark: SparkSession, segments_dir: str, keep_corrupt: bool = False
) -> DataFrame:
    """JSONL binlog segments — the wire-faithful Debezium shape (the envelope
    is JSON on the Kafka topic, QUICK_START.md:256-288). Corrupt lines parse
    to an all-null struct and fall out at :func:`filter_tombstones` — the
    engine's version of the reference's error-skip (kafka_cdc_to_rag.py:56-58).

    ``keep_corrupt=True`` additionally carries each corrupt line verbatim in
    ``_corrupt_raw`` (with ``_corrupt_src`` = segment file and a
    scan-relative ``_corrupt_offset``) so :class:`sinks.lineage.DeadLetterLog`
    can quarantine it — the pipeline picks these columns up automatically.

    Binary html is base64 inside JSON (from_json decodes BinaryType that way).
    """
    raw = spark.read.text(f"{segments_dir}/*.jsonl")
    return _project_jsonl(raw, keep_corrupt)


def read_segments_jsonl_stream(
    spark: SparkSession, segments_dir: str, keep_corrupt: bool = False
) -> DataFrame:
    raw = spark.readStream.text(f"{segments_dir}/*.jsonl")
    return _project_jsonl(raw, keep_corrupt)


def filter_tombstones(df: DataFrame) -> DataFrame:
    """Drop Kafka tombstones / corrupt rows: null op or null source
    (cdc_kafka_consumer.py:134-138, consumer_demo.py:29-31)."""
    return df.where(F.col("op").isNotNull() & F.col("source").isNotNull())


def parse_envelope(df: DataFrame, include_before: bool = False) -> DataFrame:
    """Project the envelope to the engine's flat working shape
    (auto_gen_rag.py:33-70): op, url, event-time ordering keys, payload.

    The url/warc_ts keys coalesce *fields* (``after.url``/``before.url``),
    not whole structs — field-level coalesce lets Catalyst's nested-schema
    pruning reach the parquet scan, so a lineage/count pass reads only the
    key columns, never the html bytes.

    The ``before`` image's body is never used by the LWW fold (a delete's
    payload is a tombstone; c/u/r carry ``after``), so it is dropped from the
    hot path — halving what the aggregation buffers and the shuffle carry.
    Pass ``include_before=True`` for field-diff analyses
    (incremental_pinecone_updater.py:315-327 semantics).
    """
    cols = [
        F.col("op"),
        F.coalesce(F.col("after.url"), F.col("before.url")).alias("url"),
        F.coalesce(F.col("after.warc_ts"), F.col("before.warc_ts")).alias("warc_ts"),
        F.col("source.pos").alias("pos"),
        F.col("source.file").alias("src_file"),
        F.col("after"),
        F.col("ts_ms"),
    ]
    if include_before:
        cols.insert(6, F.col("before"))
    # TRUNCATE events (op='t') carry no row image and therefore no url — they
    # are kept (the driver folds them into the table's truncate horizon);
    # everything else without a key is hygiene-dropped as before
    return (
        filter_tombstones(df)
        .select(*cols)
        .where(F.col("url").isNotNull() | (F.col("op") == "t"))
    )
