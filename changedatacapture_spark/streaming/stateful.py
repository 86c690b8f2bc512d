"""Custom stateful streaming operator: per-url version tracking across
micro-batches via ``applyInPandasWithState``.

The reference keeps this state in SQLite side tables
(``file_versions(file_path, file_hash, last_modified, last_processed)`` and
per-chunk version rows, incremental_rag_system.py:34-72). Here it is proper
Spark-managed keyed state: checkpointed, partitioned by url, recovered on
restart. Note the engine's *table* state deliberately does NOT use this (the
LWW MERGE against the target is stateless and cheaper, SURVEY.md §2.9); this
operator serves the monitoring/versioning surface.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "url string, n_changes long, n_deletes long, last_op string, last_warc_us long"
)
STATE_SCHEMA = "n_changes long, n_deletes long, last_op string, last_warc_us long"


def _track(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (url,) = key
    if state.exists:
        n_changes, n_deletes, last_op, last_us = state.get
    else:
        n_changes, n_deletes, last_op, last_us = 0, 0, None, None
    for pdf in pdfs:
        n_changes += len(pdf)
        n_deletes += int((pdf["op"] == "d").sum())
        us = (pdf["warc_ts"].astype("int64") // 1000).max()  # ns → µs
        order = pdf.sort_values(["warc_ts", "pos"]).iloc[-1]
        last_op = str(order["op"])
        last_us = int(us) if last_us is None else max(last_us, int(us))
    state.update((n_changes, n_deletes, last_op, last_us))
    yield pd.DataFrame(
        [
            {
                "url": url,
                "n_changes": n_changes,
                "n_deletes": n_deletes,
                "last_op": last_op,
                "last_warc_us": last_us,
            }
        ]
    )


def url_version_tracker(parsed: DataFrame) -> DataFrame:
    """parsed change stream → running per-url version stats (update mode)."""
    return (
        parsed.select("url", "op", "warc_ts", "pos")
        .groupBy("url")
        .applyInPandasWithState(
            _track,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
