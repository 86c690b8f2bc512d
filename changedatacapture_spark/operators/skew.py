"""Hot-key detection for skewed url distributions (SURVEY.md §4).

Web crawls are Zipf: one hot url can carry 50% of a batch's events
(FIXTURES.md F1). A straight ``groupBy(url)`` would put that url's whole
event stream on one reduce task. Detection here is a cheap sampled frequency
estimate; the decision feeds ``operators.lww.lww_winners_salted``.

AQE (``spark.sql.adaptive.enabled`` + skewJoin) additionally rebalances the
MERGE join at runtime; this module handles the *aggregation* side AQE can't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_hot_keys(
    parsed: DataFrame,
    *,
    key: str = "url",
    sample_fraction: float = 0.05,
    hot_share: float = 0.10,
    seed: int = 42,
) -> list[str]:
    """Sampled heavy-hitter detection: keys holding > ``hot_share`` of a
    deterministic sample. Cost: one pass over ~5% of the batch with a
    partial-agg count — no full shuffle of the batch."""
    sample = parsed.sample(fraction=sample_fraction, seed=seed) if sample_fraction < 1.0 else parsed
    counts = sample.groupBy(key).agg(F.count("*").alias("n")).cache()
    try:
        total = counts.agg(F.sum("n")).first()[0] or 0
        if total == 0:
            return []
        hot = counts.where(F.col("n") > total * hot_share).select(key).collect()
        return [r[0] for r in hot]
    finally:
        counts.unpersist()


def choose_salt_buckets(parsed: DataFrame, default: int = 32, **kw) -> int | None:
    """Returns the salt bucket count if the batch looks skewed, else None."""
    return default if detect_hot_keys(parsed, **kw) else None
