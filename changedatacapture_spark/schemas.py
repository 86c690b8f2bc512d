"""StructTypes for the page table, the Debezium-shaped change envelope, and
the chunk table.

Shapes pinned by BASELINE.json's ``input_hint`` (page table) and by the
reference's Debezium envelope (/root/reference/QUICK_START.md:256-288,
consumer_demo.py:33-39): ``{op, before, after, source{db,table,file,pos},
ts_ms}``. ``(source.file, source.pos)`` is the total order / tie-break within
equal ``warc_ts`` (QUICK_START.md:271-273).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- page table (BASELINE.json input_hint) ---------------------------------
PAGE_FIELDS = [
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), True),
    T.StructField("html", T.BinaryType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
]
PAGE_SCHEMA = T.StructType(PAGE_FIELDS)

# payload struct inside before/after. ``extra`` carries schema-evolution
# fields as a string map (new source columns appear here mid-stream; the sink
# promotes them to real columns — mirrors detect_json_changes'
# added/deleted-field classification, incremental_rag_system.py:216-243).
PAYLOAD_SCHEMA = T.StructType(
    PAGE_FIELDS + [T.StructField("extra", T.MapType(T.StringType(), T.StringType()), True)]
)

SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("db", T.StringType(), True),
        T.StructField("table", T.StringType(), True),
        T.StructField("file", T.StringType(), True),
        T.StructField("pos", T.LongType(), True),
    ]
)

# --- the Debezium-shaped change envelope ------------------------------------
ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), True),  # c / u / d / r
        T.StructField("before", PAYLOAD_SCHEMA, True),  # null for c/r
        T.StructField("after", PAYLOAD_SCHEMA, True),  # null for d
        T.StructField("source", SOURCE_SCHEMA, True),
        T.StructField("ts_ms", T.LongType(), True),
    ]
)

# --- chunk table (reference chunk record, main.py:810-820) -------------------
CHUNK_STRUCT = T.StructType(
    [
        T.StructField("section_title", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("chunk_size", T.IntegerType(), True),
        T.StructField("start_index", T.IntegerType(), True),
        T.StructField("end_index", T.IntegerType(), True),
    ]
)
CHUNK_ARRAY = T.ArrayType(CHUNK_STRUCT)

CHUNKS_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("chunk_index", T.IntegerType(), False),
        T.StructField("section_title", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("chunk_size", T.IntegerType(), True),
        T.StructField("start_index", T.IntegerType(), True),
        T.StructField("end_index", T.IntegerType(), True),
    ]
)

# --- lineage table (per micro-batch, per partition) --------------------------
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("epoch_id", T.LongType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("rows_in", T.LongType(), True),
        T.StructField("min_pos", T.LongType(), True),
        T.StructField("max_pos", T.LongType(), True),
        T.StructField("files", T.ArrayType(T.StringType()), True),
        T.StructField("snapshot_id", T.LongType(), True),
        T.StructField("wall_ms", T.LongType(), True),
    ]
)
