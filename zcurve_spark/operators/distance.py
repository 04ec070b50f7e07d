"""Large-large spatial joins: distance (within-radius) pair join.

The reference's spatial "join" is the user calling the lookup SRF per
box — one side is always tiny.  At 100 TB BOTH sides of a spatial join
can be huge (neither broadcastable), so this module adds the classic
grid-bucketed distance join (SURVEY.md §2.6 "Joins" target row):

* pick a tile size 2^s >= radius, so any pair within `radius` lands in
  the same tile or an 8-neighbor tile;
* side A keys each point by its own tile (1 row); side B explodes each
  point to its tile + 8 neighbors (9 rows — the bounded duplication
  that turns an O(n*m) theta join into an EQUI-join on tile id);
* shuffle hash/sort-merge equi-join on the tile key (both sides
  shuffle-partitioned by tile — the scalable shape; AQE splits hot
  tiles), then exact integer distance refinement.

Every pair within the radius appears exactly once: the 3x3 neighborhood
of B's true tile covers every tile A's point can be in (Chebyshev
distance <= radius < 2^s), and each pair is produced only at A's tile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distance_join(
    a: DataFrame,
    b: DataFrame,
    radius: int,
    *,
    coord_cols: tuple[str, str] = ("x", "y"),
    id_col: str = "pid",
    dedup_pairs: bool = False,
) -> DataFrame:
    """All pairs (a_id, b_id, d2) with squared Euclidean distance
    d2 <= radius^2 between rows of `a` and rows of `b`.

    Both sides may be arbitrarily large: the only shuffle is the tile
    equi-join (B side is duplicated 9x — constant factor, independent
    of data size).  All-integer arithmetic (explicit long multiply, not
    float pow — exact for the full 32-bit coordinate domain) so results
    are oracle-checkable bit-for-bit.  Coordinates may be negative:
    tiling uses arithmetic right shift == floor division by 2^s, which
    buckets negatives consistently.  For a self-join pass the same
    DataFrame twice and ``dedup_pairs=True`` to keep a_id < b_id only.
    """
    if radius <= 0:
        raise ValueError("radius must be positive")
    s = max(1, int(radius).bit_length())  # 2^s >= radius (tile side)
    xc, yc = coord_cols

    def tile(c):
        # floor(c / 2^s) via arithmetic shift on a long: correct for
        # negative coordinates too (shiftrightunsigned would scatter
        # them to huge tile ids and silently drop cross-sign pairs).
        return F.shiftright(F.col(c).cast("long"), s)

    ta = a.select(
        F.col(id_col).alias("a_id"),
        F.col(xc).alias("ax"),
        F.col(yc).alias("ay"),
        tile(xc).alias("_tx"),
        tile(yc).alias("_ty"),
    )
    # B explodes to its 3x3 tile neighborhood.
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    tb = (
        b.select(
            F.col(id_col).alias("b_id"),
            F.col(xc).alias("bx"),
            F.col(yc).alias("by"),
            F.explode(offs).alias("_o"),
        )
        .select(
            "b_id",
            "bx",
            "by",
            (F.shiftright(F.col("bx").cast("long"), s) + F.col("_o.dx")).alias("_tx"),
            (F.shiftright(F.col("by").cast("long"), s) + F.col("_o.dy")).alias("_ty"),
        )
    )
    j = ta.join(tb, ["_tx", "_ty"])
    dx = F.col("ax").cast("long") - F.col("bx").cast("long")
    dy = F.col("ay").cast("long") - F.col("by").cast("long")
    d2 = dx * dx + dy * dy  # exact integer arithmetic (no float pow)
    out = (
        j.withColumn("d2", d2)
        .filter(F.col("d2") <= int(radius) * int(radius))
        .select("a_id", "b_id", "d2")
    )
    if dedup_pairs:
        out = out.filter(F.col("a_id") < F.col("b_id"))
    return out
