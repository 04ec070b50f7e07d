"""Density-based spatial clustering on the curve-key grid (grid-DBSCAN).

Classic DBSCAN is quadratic-ish (range query per point); the scalable
form for a 10^12-point table clusters the GRID, not the points:

  1. one partial-aggregating groupBy assigns every point to a cell
     (x >> cell_shift, y >> cell_shift) and counts it — the only pass
     over the point table;
  2. dense cells (count over an absolute `min_pts`, or over a relative
     all-integer threshold vs the mean cell count) survive — a relation
     bounded by the grid, many orders smaller than the input;
  3. 8-adjacent dense cells are connected by a bounded 9x neighbor
     expansion + equi-join (the distance-join tiling trick — never an
     all-pairs comparison);
  4. clusters are connected components of that cell graph via the
     pointer-doubling min-label propagation in operators/dedup.py —
     O(log diameter) rounds, each one shuffle.

Everything after step 1 operates on cells, so a 100x data scale-up
changes only the first groupBy; the cluster extraction itself is
constant-size for a fixed grid.  This is the tile-statistics analog of
the reference's per-page aggregation (zcurve.c builds per-page key
ranges; here per-cell counts) lifted into an analytics operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import connected_components

# cell id = cx * CELL_ID_BASE + cy; coords are < 2^20 in the synthetic
# domain so cy < CELL_ID_BASE at any cell_shift, and ids stay < 2^40.
CELL_ID_BASE = 1 << 20


def cell_counts(
    points: DataFrame,
    *,
    x_col: str = "x",
    y_col: str = "y",
    cell_shift: int = 16,
) -> DataFrame:
    """(cx, cy, cnt): per-grid-cell point counts — one map-side-combining
    shuffle over the point table (the ONLY pass that touches points)."""
    return (
        points.groupBy(
            F.shiftright(F.col(x_col), cell_shift).alias("cx"),
            F.shiftright(F.col(y_col), cell_shift).alias("cy"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dense_cells(
    cells: DataFrame,
    *,
    min_pts: int | None = None,
    rel_num: int = 23,
    rel_den: int = 20,
) -> DataFrame:
    """Filter cells to the dense ones.

    Absolute mode (`min_pts`): cnt >= min_pts, the DBSCAN parameter.
    Relative mode (default): cnt * n_cells * rel_den > total * rel_num,
    i.e. cnt > (rel_num/rel_den) x mean — ALL-INTEGER so Spark and any
    SQL oracle agree bit-for-bit, with the one-row totals broadcast.
    """
    if min_pts is not None:
        d = cells.filter(F.col("cnt") >= min_pts)
    else:
        tot = cells.agg(
            F.count(F.lit(1)).alias("n_cells"), F.sum("cnt").alias("total")
        )
        d = cells.join(F.broadcast(tot)).filter(
            F.col("cnt") * F.col("n_cells") * rel_den > F.col("total") * rel_num
        )
    return d.select(
        "cx", "cy", "cnt",
        (F.col("cx") * CELL_ID_BASE + F.col("cy")).alias("cell"),
    )


def grid_cluster(
    points: DataFrame,
    *,
    x_col: str = "x",
    y_col: str = "y",
    cell_shift: int = 16,
    min_pts: int | None = None,
    rel_num: int = 23,
    rel_den: int = 20,
    max_iter: int = 20,
) -> DataFrame:
    """Grid-DBSCAN: (cx, cy, cnt, cluster_id) for every dense cell, with
    cluster_id = the minimum cell id (cx*2^20+cy) of its 8-connected
    dense component — deterministic, engine-independent labels.

    See the module docstring for the scale contract.  Point-level
    assignment, when needed, is one more broadcast-ready equi-join of
    the (tiny) labeled-cell relation back onto the point table.
    """
    d = dense_cells(
        points if "cnt" in points.columns else cell_counts(
            points, x_col=x_col, y_col=y_col, cell_shift=cell_shift
        ),
        min_pts=min_pts, rel_num=rel_num, rel_den=rel_den,
    )

    # bounded 9x neighbor expansion -> equi-join on the neighbor cell:
    # every ordered pair of 8-adjacent dense cells, self-pairs dropped.
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        if (dx, dy) != (0, 0)
    ])
    probe = d.select(
        F.col("cell").alias("a_id"),
        F.explode(offs).alias("o"),
        F.col("cx"), F.col("cy"),
    ).select(
        "a_id",
        (F.col("cx") + F.col("o.dx")).alias("ncx"),
        (F.col("cy") + F.col("o.dy")).alias("ncy"),
    )
    edges = probe.join(
        d.select(F.col("cx").alias("ncx"), F.col("cy").alias("ncy"),
                 F.col("cell").alias("b_id")),
        ["ncx", "ncy"],
    ).filter(F.col("a_id") < F.col("b_id")).select("a_id", "b_id")

    comp = connected_components(edges, max_iter=max_iter)
    labeled = d.join(comp, d.cell == comp.id, "left").select(
        "cx", "cy", "cnt",
        F.coalesce("component", "cell").alias("cluster_id"),  # isolated dense cells
    )
    return labeled


def cluster_summary(labeled: DataFrame) -> DataFrame:
    """(cluster_id, n_cells, n_points) per cluster — the heatmap/report
    rollup; one groupBy over the cell relation (not the points)."""
    return labeled.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("cnt").alias("n_points"),
    )
