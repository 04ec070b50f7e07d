"""k-nearest-neighbor lookup via expanding curve-key neighborhoods.

SURVEY.md §2.7: probe growing boxes around each query point; a box of
half-side r decomposes into curve intervals exactly like a range query
(sp_query.c semantics), so each round is one distributed
interval-join + window-top-k.  Termination proof: a square of half-side
r bounds Chebyshev distance by r, hence any point *outside* the box has
Euclidean distance > r; once a query has >= k candidates with k-th
Euclidean distance <= r, no outside point can displace them.

Queries are a small driver-side batch (broadcast); rounds are O(log
domain) in the worst case, typically 1-3 with the density-based initial
radius.  Ties broken by pid for determinism (matches the SQL oracle's
`ORDER BY d2, pid`).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources.points import boxes_df
from .bbox import bbox_join, intervals_df

DOMAIN = 1_000_000


def knn(
    points: DataFrame,
    queries: list[dict],
    *,
    bits: int = 20,
    domain: int = DOMAIN,
    n_points_hint: int | None = None,
    zkey_col: str = "zkey",
    budget: int = 32,
) -> DataFrame:
    """Top-k nearest points per query.

    `queries`: dicts with qid, qx, qy, k.  Returns (qid, rank, pid, x, y,
    d2) with rank 1..k ordered by squared Euclidean distance, pid
    tie-break.
    """
    spark = points.sparkSession
    if n_points_hint is None:
        n_points_hint = points.count()
    kmax = max(q["k"] for q in queries)
    # density heuristic: expected half-side enclosing ~4k points
    r = max(64, int(domain * math.sqrt(4.0 * kmax / max(n_points_hint, 1)) / 2))

    pending = list(queries)
    done_parts: list[DataFrame] = []
    while pending:
        boxes = [
            {
                "qid": q["qid"],
                "mins": (max(q["qx"] - r, 0), max(q["qy"] - r, 0)),
                "maxs": (min(q["qx"] + r, domain - 1), min(q["qy"] + r, domain - 1)),
            }
            for q in pending
        ]
        bdf = boxes_df(spark, boxes)
        ivs = intervals_df(spark, boxes, bits=bits, budget=budget)
        qmeta = spark.createDataFrame(
            [(q["qid"], q["qx"], q["qy"], q["k"]) for q in pending],
            "qid long, qx long, qy long, k int",
        )
        cand = bbox_join(points, bdf, ivs, zkey_col=zkey_col).join(
            F.broadcast(qmeta), "qid"
        )
        d2 = (F.col("x") - F.col("qx")) ** 2 + (F.col("y") - F.col("qy")) ** 2
        # pid is not unique in the synthetic tables -> extend the tiebreak
        # to full coords so ranking is a total order (oracle-comparable)
        w = Window.partitionBy("qid").orderBy(
            F.col("d2").asc(), F.col("pid").asc(), F.col("x").asc(), F.col("y").asc()
        )
        topk = (
            cand.withColumn("d2", d2.cast("long"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= F.col("k"))
            .select("qid", "rank", "pid", "x", "y", "d2", "k")
        )
        topk = topk.cache()
        stats = (
            topk.groupBy("qid", "k")
            .agg(F.count(F.lit(1)).alias("n"), F.max("d2").alias("maxd2"))
            .collect()
        )
        covered = {
            row["qid"]
            for row in stats
            if row["n"] >= row["k"] and row["maxd2"] <= r * r
        }
        # boxes clipped to the full domain can't grow further: accept them
        full_domain = r >= domain
        if full_domain:
            covered = {q["qid"] for q in pending}
        if covered:
            done_parts.append(
                topk.filter(F.col("qid").isin([int(c) for c in covered])).drop("k")
            )
        pending = [q for q in pending if q["qid"] not in covered]
        r *= 4
    out = done_parts[0]
    for p in done_parts[1:]:
        out = out.unionByName(p)
    return out
