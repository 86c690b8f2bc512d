"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``changedatacapture_spark`` (queries.py holds the
Spark side, oracles_sql.py the DuckDB twins); tests/test_queries_vs_duckdb.py
mirrors this gate locally.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from changedatacapture_spark.oracles_sql import ORACLE_SQL  # noqa: E402
from changedatacapture_spark.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: replay the change log and
    return the final table state (LWW fold — the engine's core semantic)."""
    return QUERIES["cdc_final_state"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    training-data-pipeline extensions)."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins — EVERY queries() entry has one (round 3: the embedding
    stub was redefined over md5 arithmetic so even the embedding stage is
    value-hash-verified; no rows-only residuals remain)."""
    return dict(ORACLE_SQL)
