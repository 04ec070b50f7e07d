"""Structured-Streaming tile statistics.

Streaming analog of the tile-assignment pipeline: events arrive with
coordinates (derived or native), get curve-encoded with the same pure
Column kernels (the encode path is identical batch/stream — no separate
code), and feed watermarked windowed per-tile aggregations.  At cluster
scale the shuffle key is (window, tile), so state is partitioned exactly
like the batch tile layer; late data beyond the watermark is dropped
deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.columns import tile_id_col, zkey2_col

DOMAIN_BITS = 20


def with_event_geo(events: DataFrame, bits: int = DOMAIN_BITS) -> DataFrame:
    """Deterministic per-event coords from (event_id, user_id) — same
    pure-integer derivation style as the batch sources."""
    n = 1 << bits
    x = (F.col("event_id") * 2654435761 + F.col("user_id") * 97 + 12345) % n
    y = (F.col("event_id") * 1013904223 + F.col("user_id") * 31 + 54321) % n
    out = events.withColumn("x", x.cast("long")).withColumn("y", y.cast("long"))
    return out.withColumn("zkey", zkey2_col("x", "y"))


def streaming_tile_counts(
    events: DataFrame,
    *,
    level: int = 6,
    bits: int = DOMAIN_BITS,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked windowed per-tile event counts (append-mode safe)."""
    # parquet yields TIMESTAMP_NTZ; watermarks require TIMESTAMP (LTZ)
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    geo = with_event_geo(events, bits=bits)
    tiled = geo.withColumn("tile_id", tile_id_col("zkey", level, bits=bits))
    return (
        tiled.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("tile_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 1000).cast("long")).alias("v_milli"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "tile_id",
            "n_events",
            "v_milli",
        )
    )


def run_stream_from_parquet(
    spark,
    src_dir: str,
    checkpoint: str,
    *,
    schema=None,
    level: int = 6,
    query_name: str = "tile_counts",
):
    """Drive the streaming tile aggregation from a parquet directory
    source to a memory sink (availableNow semantics for tests/smoke;
    swap source/sink for Kafka/Iceberg in production)."""
    if schema is None:
        schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(src_dir)
    )
    agg = streaming_tile_counts(stream, level=level)
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    return q
