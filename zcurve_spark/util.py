"""Shared plan utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition when the input has fewer partitions than cores.

    A single small parquet file arrives as ONE partition, serializing all
    map-side work (key encoding, shingling, signatures) onto one core.
    At cluster scale inputs are many-filed and this is a no-op; the
    operators shouldn't depend on input file layout for parallelism.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    # prefer inputFiles(): df.rdd.getNumPartitions() can materialize query
    # stages under AQE; file count is a job-free proxy for scan parallelism
    try:
        n = len(df.inputFiles())
    except Exception:
        n = 0
    if n == 0:
        n = df.rdd.getNumPartitions()
    if n < target:
        return df.repartition(target)
    return df
