"""Streaming exact deduplication — the ingest-time dedup stage of a
training-data pipeline.

``dropDuplicatesWithinWatermark`` keyed by the content hash keeps ONE
row per distinct text while holding state only for the watermark
horizon: at 10^12 docs/day the state store carries a bounded window of
hashes (partitioned by hash — the same shuffle key as the batch
exact_dedup), not the full corpus history.  Exactly the operator you
put in front of a parquet/Iceberg append sink so re-delivered or
crawler-duplicated documents never land twice within the horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    docs: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Emit the first-arriving document per distinct text (md5 keyed),
    suppressing duplicates that arrive within the watermark horizon of
    the retained row.  Late rows beyond the watermark are dropped by the
    engine — deterministic under replays, which is what makes the
    downstream append sink exactly-once-per-content."""
    d = (
        docs.withColumn("_h", F.md5(F.col(text_col)))
        .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
    )
    return d.dropDuplicatesWithinWatermark(["_h"]).drop("_h")
