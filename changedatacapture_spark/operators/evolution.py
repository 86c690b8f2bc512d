"""Schema evolution: detect new source columns mid-stream and promote them.

The reference tolerates fields appearing/disappearing between ``before`` and
``after`` and classifies them added/deleted/modified
(incremental_rag_system.py:216-243, incremental_pinecone_updater.py:315-327).
In the engine, evolved source columns arrive in the payload's ``extra``
string map (schemas.PAYLOAD_SCHEMA); per micro-batch we diff the observed
keys against the sink schema and widen the sink before the MERGE — the
fallback-lake twin of Iceberg schema-merge (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def observed_extra_keys(deltas: DataFrame) -> list[str]:
    """Distinct evolved-column names present in this batch (cheap: the
    distinct runs on exploded keys of a usually-null map; partial agg)."""
    rows = (
        deltas.where(F.col("extra").isNotNull())
        .select(F.explode(F.map_keys(F.col("extra"))).alias("k"))
        .distinct()
        .collect()
    )
    return sorted(r["k"] for r in rows)


def promote_extra_columns(deltas: DataFrame, keys: list[str]) -> DataFrame:
    """Lift ``extra['k']`` map entries into real ``x_k`` string columns; the
    map column itself is dropped once promoted."""
    out = deltas
    for k in keys:
        out = out.withColumn(f"x_{k}", F.col("extra").getItem(k))
    return out.drop("extra")


def align_to_schema(df: DataFrame, columns: list[tuple[str, str]]) -> DataFrame:
    """Project ``df`` onto a (name, ddl-type) column list, null-filling
    missing columns — how old bucket files are read after the table widened
    (parquet-level schema merge)."""
    have = {f.name for f in df.schema.fields}
    cols = [
        F.col(name).cast(ddl).alias(name) if name in have else F.lit(None).cast(ddl).alias(name)
        for name, ddl in columns
    ]
    return df.select(*cols)
