"""Field-level change detection (reference J2/F3/F4: ``_detect_changes``
key-union diff, incremental_pinecone_updater.py:315-327; ``_format_content``
:298-304; ``_format_changes`` :306-313).

The reference walks before∪after keys per event in Python; here the diff is
one JVM-side expression per payload field (stack → filter), fully codegen'd —
no UDF. Used for update auditing / the "embed only changed fields" cost
optimization (an optimization the engine doesn't need for final-state
correctness, SURVEY.md §3 EP2, but exposes for parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DIFF_FIELDS = ["url", "warc_ts", "text", "lang"]  # scalar payload fields


def field_diff(parsed: DataFrame, fields: list[str] | None = None) -> DataFrame:
    """Per (url, pos): one row per changed field with old/new values and an
    added/deleted/modified class — requires ``parse_envelope(...,
    include_before=True)`` input (u/d events carry the FULL before image)."""
    fields = fields or DIFF_FIELDS
    entries = F.array(
        *[
            F.struct(
                F.lit(f).alias("field"),
                F.col(f"before.{f}").cast("string").alias("old"),
                F.col(f"after.{f}").cast("string").alias("new"),
            )
            for f in fields
        ]
    )
    exploded = parsed.select(
        "url", "pos", "op", F.explode(entries).alias("e")
    ).select("url", "pos", "op", "e.field", "e.old", "e.new")
    return exploded.where(
        ~(F.col("old").eqNullSafe(F.col("new")))
    ).withColumn(
        "change",
        F.when(F.col("old").isNull(), "added")
        .when(F.col("new").isNull(), "deleted")
        .otherwise("modified"),
    )


def line_diff(
    df: DataFrame,
    old_col: str = "old_text",
    new_col: str = "new_text",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """J3: positional line diff — the reference's ``detect_text_changes``
    (rag/incremental_rag_system.py:167-206): zip lines by index and classify
    ``modified`` (both present, differ), ``added`` (new longer), ``deleted``
    (old longer); equal lines emit nothing.

    Pure DataFrame ops (split → posexplode → full outer join on line number)
    — no UDF; at 10^10 documents the only shuffle is the (id, line) join,
    and both sides explode map-side.
    """
    ids = list(id_cols)
    o = df.select(
        *ids, F.posexplode(F.split(F.col(old_col), "\n")).alias("line", "old_line")
    )
    n = df.select(
        *ids, F.posexplode(F.split(F.col(new_col), "\n")).alias("line", "new_line")
    )
    j = o.join(n, [*ids, "line"], "full_outer")
    return (
        j.withColumn(
            "change_type",
            F.when(F.col("old_line").isNull(), "added")
            .when(F.col("new_line").isNull(), "deleted")
            .when(F.col("old_line") != F.col("new_line"), "modified"),
        )
        .where(F.col("change_type").isNotNull())
        .select(*ids, "change_type", "line", "old_line", "new_line")
    )


def format_content(df: DataFrame, fields: list[str], out_col: str = "content") -> DataFrame:
    """``_format_content``: non-null ``key: value`` lines joined by newlines
    (incremental_pinecone_updater.py:298-304) — concat_ws skips nulls, so a
    null field contributes no line, matching the reference."""
    lines = [
        F.when(
            F.col(f).isNotNull(), F.concat(F.lit(f"{f}: "), F.col(f).cast("string"))
        )
        for f in fields
    ]
    return df.withColumn(out_col, F.concat_ws("\n", *lines))


def format_changes(diff: DataFrame) -> DataFrame:
    """``_format_changes``: '[UPDATED FIELDS]' + per-field Old/New lines per
    (url, pos) (incremental_pinecone_updater.py:306-313)."""
    line = F.concat(
        F.col("field"), F.lit(": Old: "), F.coalesce(F.col("old"), F.lit("None")),
        F.lit(" -> New: "), F.coalesce(F.col("new"), F.lit("None")),
    )
    return (
        diff.groupBy("url", "pos")
        .agg(F.array_sort(F.collect_list(line)).alias("lines"))
        .select(
            "url",
            "pos",
            F.concat(F.lit("[UPDATED FIELDS]\n"), F.array_join(F.col("lines"), "\n")).alias(
                "change_summary"
            ),
        )
    )
