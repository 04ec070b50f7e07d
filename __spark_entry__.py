"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship pipeline: interleaved docs -> span explode ->
                deterministic geo -> zkey encode -> tile assignment ->
                per-tile stats (the north-rule workload at sf0.001).
queries()     — one entry per implemented operator (SURVEY.md §2 +
                training-data pipeline ops); each (spark, sf_dir) ->
                DataFrame.
oracle_sql()  — DuckDB-runnable ANSI SQL equivalents; omitted for ops
                whose hashes are engine-specific (xxhash64-based LSH,
                Hilbert) — those are pytest-verified against independent
                models instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zcurve_spark.entry_queries import build_oracles, build_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from zcurve_spark.operators.tiles import assign_tiles
    from zcurve_spark.sources.interleaved import (
        explode_spans,
        interleaved_docs,
        with_span_geo,
    )

    docs = interleaved_docs(spark, "/root/testdata/sf0.001")
    spans = with_span_geo(explode_spans(docs), bits=30)
    tiled = assign_tiles(spans, levels=(4, 8, 12), bits=30)
    return (
        tiled.groupBy("tile_l8")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum((F.col("kind") == "media").cast("long")).alias("n_media"),
        )
        .orderBy("tile_l8")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return build_queries()


def oracle_sql() -> dict[str, str]:
    return build_oracles()
