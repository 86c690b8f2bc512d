"""Local mirror of the driver's correctness gate: every queries() entry with
an oracle_sql() twin must match DuckDB on row count, column names, and
order-insensitive values (sf0.001 here for speed; the driver runs sf0.01)."""

import duckdb
import pytest

from changedatacapture_spark.oracles_sql import ORACLE_SQL
from changedatacapture_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _canon_value(v):
    """Type-sensitive canonicalization matching the driver's gate, which
    hashes pandas values: a DuckDB HUGEINT that lands as float64 (or Decimal)
    must NOT compare equal to a Spark BIGINT — `str()` alone masked exactly
    that class of mismatch in round 1 (doc_chunk_stats)."""
    import pandas as pd

    if v is None or (not isinstance(v, (list, tuple, bytes)) and pd.isna(v)):
        return "NULL"
    if hasattr(v, "item"):  # numpy scalar → python scalar, keeping the kind
        v = v.item()
    if isinstance(v, bytes):
        return f"bytes:{v.hex()}"
    return f"{type(v).__name__}:{v!r}"


def _norm_df(pdf):
    return sorted(tuple(_canon_value(v) for v in row) for row in pdf.itertuples(index=False))


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_query_matches_duckdb(spark, duck, name):
    q = QUERIES[name]
    sdf = q(spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = _norm_df(sdf.toPandas())

    res = duck.execute(ORACLE_SQL[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = _norm_df(res.df())

    assert spark_cols == duck_cols, f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    mismatches = [
        (s, d) for s, d in zip(spark_rows, duck_rows) if s != d
    ]
    assert not mismatches, f"{name}: {len(mismatches)} value mismatches; first: {mismatches[:2]}"


def test_all_queries_run_and_nonempty(spark):
    """Every queries() entry (incl. the non-SQL ones) runs and has a stable
    schema; most should return rows at sf0.001."""
    for name, q in QUERIES.items():
        df = q(spark, SF_DIR)
        n = df.count()
        assert df.schema is not None
        if name not in ("cdc_point_read",):  # point read may legitimately be tiny
            assert n >= 0
    # the flagship must be non-trivial (sf0.001 has ~15 distinct users/urls)
    assert QUERIES["cdc_final_state"](spark, SF_DIR).count() > 5
