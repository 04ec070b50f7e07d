"""S2 cell IDs — real spherical cells, not prefix arithmetic.

The north rule names an "H3/S2 index"; the engine's `tile_id_col` cells
are Z-prefix cells ("H3/S2-style").  This module implements the actual
S2 cell-ID scheme from the published s2geometry design docs (public:
https://s2geometry.io/devguide/s2cell_hierarchy — cube-face projection,
quadratic ST transform, per-face Hilbert curve with the orientation
tables from s2coords.h) so a user indexing by real S2 cells can keep
their cell IDs.  Everything is vectorized numpy under Arrow pandas UDFs
— no per-row Python, same discipline as the Z/Hilbert kernels
(reference analog: the bitkey.c encode surface, bitkey.c:100-124).

Layout of a 64-bit cell id (uint64, exposed to Spark as the two's-
complement long — the same convention BigQuery's S2 functions use):

    [3 face bits][2*level position bits][1][0... trailing zeros]

* leaf (level 30): face<<61 | pos<<1 | 1
* `level` recovers the level from the lowest set bit;
* `parent` clears low bits and plants the new sentinel bit;
* `range_min/range_max` give the leaf-id interval a cell covers, so
  cell containment is a BETWEEN over sorted ids — the same interval
  machinery every curve-key query path here uses.  A cell's range
  never crosses the face-4 sign boundary, so signed BETWEEN is exact.

Orientation tables (s2coords.cc, public):
  kPosToIJ[orient][pos], kIJtoPos[orient][ij], kPosToOrientation with
  swap_mask=1, invert_mask=2; traversal starts at orientation
  (face & swap_mask).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

MAX_LEVEL = 30
_U = np.uint64

SWAP_MASK = 1
INVERT_MASK = 2

# pos -> ij (2*i_bit + j_bit) per orientation, and its inverse.
POS_TO_IJ = np.array(
    [
        [0, 1, 3, 2],
        [0, 2, 3, 1],
        [3, 2, 0, 1],
        [3, 1, 0, 2],
    ],
    dtype=np.uint64,
)
IJ_TO_POS = np.array(
    [
        [0, 1, 3, 2],
        [0, 3, 1, 2],
        [2, 3, 1, 0],
        [2, 1, 3, 0],
    ],
    dtype=np.uint64,
)
POS_TO_ORIENTATION = np.array([SWAP_MASK, 0, 0, SWAP_MASK | INVERT_MASK], dtype=np.uint64)


# ---------------------------------------------------------------------------
# sphere -> cube face -> (s,t) -> (i,j)
# ---------------------------------------------------------------------------


def _xyz_from_lonlat(lon: np.ndarray, lat: np.ndarray):
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    cp = np.cos(phi)
    return cp * np.cos(lam), cp * np.sin(lam), np.sin(phi)


def _face_uv_from_xyz(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    """Largest-|component| cube face + gnomonic (u,v) on it.

    Face axes follow s2coords.h: face k has normal = axis k's positive
    direction for k<3, negative for k>=3; (u,v) axes per the canonical
    kFaceUVWAxes table.

    Tie-break note (ADVICE r5): this selection uses ``ax >= ay`` /
    ``ax >= az`` (preferring the EARLIER axis on exact ties), while
    s2geometry's LargestAbsComponent uses strict ``>`` (preferring the
    later axis), so points lying exactly on a cube-face boundary —
    a measure-zero set requiring |x| == |y| etc. in IEEE doubles — may
    map to the adjacent face relative to other S2 implementations.
    All cell ids remain internally self-consistent (encode and cover
    use the same rule), so queries are unaffected; only cross-library
    id interchange of exact-boundary points differs.
    """
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    comp = np.choose(face, [x, y, z])
    face = np.where(comp < 0, face + 3, face).astype(np.int64)
    # u,v per face (s2coords.h ValidFaceXYZtoUV):
    #   face 0 (+x): u =  y/x, v =  z/x      face 3 (-x): u =  z/x, v =  y/x
    #   face 1 (+y): u = -x/y, v =  z/y      face 4 (-y): u =  z/y, v = -x/y
    #   face 2 (+z): u = -x/z, v = -y/z      face 5 (-z): u = -y/z, v = -x/z
    # Every branch divides by the SAME selected component `comp`, so the
    # numerators gather via np.choose and the batch pays 2 divisions
    # instead of np.select's 12 full-array ones (r6; bit-identical —
    # identical IEEE operand pairs, pytest + s2sphere cross-checks).
    nx, ny = -x, -y
    nu = np.choose(face, [y, nx, nx, z, z, ny])
    nv = np.choose(face, [z, z, ny, y, nx, nx])
    return face, nu / comp, nv / comp


_FACE_NORMAL_SIGN = np.array([1, 1, 1, -1, -1, -1], dtype=np.float64)


def _xyz_from_face_uv(face: np.ndarray, u: np.ndarray, v: np.ndarray):
    """Inverse of _face_uv_from_xyz (unnormalized direction).

    s2coords.h FaceUVtoXYZ:
      0:( 1,  u,  v)  1:(-u,  1,  v)  2:(-u, -v,  1)
      3:(-1, -v, -u)  4:( v, -1, -u)  5:( v,  u, -1)
    """
    one = np.ones_like(u)
    x = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [one, -u, -u, -one, v, v],
    )
    y = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [u, one, -v, -v, -one, u],
    )
    z = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [v, v, one, -u, -u, -one],
    )
    return x, y, z


def st_to_uv(s: np.ndarray) -> np.ndarray:
    """S2's quadratic cell-area-equalizing transform (s2coords.h)."""
    s = np.asarray(s, dtype=np.float64)
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def uv_to_st(u: np.ndarray) -> np.ndarray:
    u = np.asarray(u, dtype=np.float64)
    # np.where evaluates both branches; clamp so the unused side of the
    # piecewise sqrt never sees a negative argument
    return np.where(
        u >= 0.0,
        0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0)),
        1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0)),
    )


def _st_to_ij(s: np.ndarray) -> np.ndarray:
    i = np.floor(s * (1 << MAX_LEVEL)).astype(np.int64)
    return np.clip(i, 0, (1 << MAX_LEVEL) - 1).astype(np.uint64)


# ---------------------------------------------------------------------------
# (face, i, j) <-> cell id
# ---------------------------------------------------------------------------


def _pos_from_ij_steps(face: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Reference form: one orientation step per level (kept as the
    cross-check twin for the block-LUT walk below)."""
    i = np.asarray(i, dtype=np.uint64)
    j = np.asarray(j, dtype=np.uint64)
    orient = (np.asarray(face, dtype=np.uint64) & _U(SWAP_MASK)).astype(np.uint64)
    pos = np.zeros_like(i, dtype=np.uint64)
    for k in range(MAX_LEVEL - 1, -1, -1):
        ib = (i >> _U(k)) & _U(1)
        jb = (j >> _U(k)) & _U(1)
        ij = _U(2) * ib + jb
        p = IJ_TO_POS[orient, ij]
        pos = (pos << _U(2)) | p
        orient = orient ^ POS_TO_ORIENTATION[p]
    return pos


def _build_block_lut(k: int) -> np.ndarray:
    """(orient << 2k | i_k << k | j_k) -> (pos_2k << 2 | orient') — k
    Hilbert levels folded into one table lookup (the s2geometry
    kLookupPos idea, public s2coords.cc; there k=4 as well).  Built once
    at import by composing the per-level orientation tables, so the
    walk's per-batch cost drops from 30 double-gathers to ceil(30/4)
    single-gathers."""
    lut = np.zeros(4 << (2 * k), dtype=np.uint64)
    for orient0 in range(4):
        for ii in range(1 << k):
            for jj in range(1 << k):
                orient, pos = orient0, 0
                for b in range(k - 1, -1, -1):
                    ij = 2 * ((ii >> b) & 1) + ((jj >> b) & 1)
                    p = int(IJ_TO_POS[orient, ij])
                    pos = (pos << 2) | p
                    orient ^= int(POS_TO_ORIENTATION[p])
                lut[(orient0 << (2 * k)) | (ii << k) | jj] = (pos << 2) | orient
    return lut


_BLOCK_LUTS = {k: _build_block_lut(k) for k in (1, 2, 3, 4)}


def _pos_from_ij(
    face: np.ndarray, i: np.ndarray, j: np.ndarray, level: int = MAX_LEVEL
) -> np.ndarray:
    """Hilbert position prefix of leaf (i,j) on `face`: the top
    ``2*level`` bits of the 60-bit position, via the 4-level block LUT.
    ``level=MAX_LEVEL`` gives the full leaf position, bit-identical to
    :func:`_pos_from_ij_steps` (pytest cross-checked).  Passing the
    TARGET level lets cell assignment at level L walk L levels instead
    of 30 — the prefix only depends on the first L steps."""
    i = np.asarray(i, dtype=np.uint64)
    j = np.asarray(j, dtype=np.uint64)
    orient = (np.asarray(face, dtype=np.uint64) & _U(SWAP_MASK)).astype(np.uint64)
    pos = np.zeros_like(i, dtype=np.uint64)
    consumed = 0
    while consumed < level:
        k = min(4, level - consumed)
        lut = _BLOCK_LUTS[k]
        shift = _U(MAX_LEVEL - consumed - k)
        mask = _U((1 << k) - 1)
        ic = (i >> shift) & mask
        jc = (j >> shift) & mask
        v = lut[(orient << _U(2 * k)) | (ic << _U(k)) | jc]
        pos = (pos << _U(2 * k)) | (v >> _U(2))
        orient = v & _U(3)
        consumed += k
    return pos


def _ij_from_pos(face: np.ndarray, pos: np.ndarray):
    """Inverse of _pos_from_ij."""
    pos = np.asarray(pos, dtype=np.uint64)
    orient = (np.asarray(face, dtype=np.uint64) & _U(SWAP_MASK)).astype(np.uint64)
    i = np.zeros_like(pos, dtype=np.uint64)
    j = np.zeros_like(pos, dtype=np.uint64)
    for k in range(MAX_LEVEL - 1, -1, -1):
        p = (pos >> _U(2 * k)) & _U(3)
        ij = POS_TO_IJ[orient, p]
        i = (i << _U(1)) | (ij >> _U(1))
        j = (j << _U(1)) | (ij & _U(1))
        orient = orient ^ POS_TO_ORIENTATION[p]
    return i, j


def s2_cellid(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """Leaf (level-30) S2 cell ids as uint64."""
    x, y, z = _xyz_from_lonlat(lon, lat)
    face, u, v = _face_uv_from_xyz(x, y, z)
    i = _st_to_ij(uv_to_st(u))
    j = _st_to_ij(uv_to_st(v))
    pos = _pos_from_ij(face, i, j)
    return (np.asarray(face, dtype=np.uint64) << _U(61)) | (pos << _U(1)) | _U(1)


def s2_level(cid: np.ndarray) -> np.ndarray:
    """Level from the lowest set bit: leaf -> 30, face cell -> 0."""
    cid = np.asarray(cid, dtype=np.uint64)
    low = cid & (~cid + _U(1))  # lowest set bit
    lsb = np.zeros_like(cid, dtype=np.int64)
    t = low.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = t >= (_U(1) << _U(shift))
        lsb += np.where(big, shift, 0)
        t = np.where(big, t >> _U(shift), t)
    return MAX_LEVEL - (lsb >> 1)


def s2_parent(cid: np.ndarray, level: int) -> np.ndarray:
    """Ancestor cell at `level` (clears low bits, plants the sentinel)."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}], got {level}")
    cid = np.asarray(cid, dtype=np.uint64)
    new_lsb = _U(1) << _U(2 * (MAX_LEVEL - level))
    return (cid & (~(new_lsb - _U(1)) | new_lsb)) | new_lsb


def s2_range_min(cid: np.ndarray) -> np.ndarray:
    """Smallest leaf id contained in the cell."""
    cid = np.asarray(cid, dtype=np.uint64)
    low = cid & (~cid + _U(1))
    return cid - low + _U(1)


def s2_range_max(cid: np.ndarray) -> np.ndarray:
    """Largest leaf id contained in the cell."""
    cid = np.asarray(cid, dtype=np.uint64)
    low = cid & (~cid + _U(1))
    return cid + low - _U(1)


def s2_cell_center_lonlat(cid: np.ndarray):
    """(lon, lat) of the cell's center point (degrees).

    A level-l cell covers exactly one 2^(30-l) x 2^(30-l) aligned ij
    block (Hilbert blocks are axis-aligned squares), so: decode the
    cell's FIRST leaf (range_min) to (i, j), mask down to the block
    base, and take the block midpoint in st space.
    """
    cid = np.asarray(cid, dtype=np.uint64)
    face = (cid >> _U(61)).astype(np.int64)
    pos_min = (s2_range_min(cid) & ((_U(1) << _U(61)) - _U(1))) >> _U(1)
    i, j = _ij_from_pos(face, pos_min)
    lvl = s2_level(cid).astype(np.uint64)
    size = _U(1) << (_U(MAX_LEVEL) - lvl)  # block side in leaf units
    i = i & ~(size - _U(1))
    j = j & ~(size - _U(1))
    # midpoint: leaf cells -> i+0.5 leaf units; larger -> i + size/2
    si = (i.astype(np.float64) + size.astype(np.float64) / 2.0) / float(1 << MAX_LEVEL)
    sj = (j.astype(np.float64) + size.astype(np.float64) / 2.0) / float(1 << MAX_LEVEL)
    u = st_to_uv(si)
    v = st_to_uv(sj)
    x, y, z = _xyz_from_face_uv(face, u, v)
    n = np.sqrt(x * x + y * y + z * z)
    lat = np.degrees(np.arcsin(z / n))
    lon = np.degrees(np.arctan2(y, x))
    return lon, lat


# ---------------------------------------------------------------------------
# Rectangle covering (the S2 analog of LITMAX/BIGMIN box decomposition:
# turn a lon/lat query box into a set of cells, reference zcurve.c's
# 2D lookup semantics — the cover is the pre-filter, an exact
# coordinate refine keeps the result identical to the plain predicate)
# ---------------------------------------------------------------------------

# Angular diameter bound for a level-l cell, radians.  Each cell edge is
# the spherical image of a uv-segment of length <= max|du/ds| * 2^-l =
# (8/3) * 2^-l (quadratic ST transform), and central projection from the
# z=1 tangent plane to the unit sphere is 1-Lipschitz (|d(p/|p|)| <=
# |dp| / |p| <= |dp| for |p| >= 1), so any two cell points are within
# two edge-bounds of each other along the uv box: diam <= (16/3) * 2^-l.
# Loose at coarse levels (where it exceeds pi and the test keeps
# everything — harmless) and ~3.4x the true diagonal at fine levels,
# which only makes the cover slightly fatter, never incomplete.
_DIAM_RAD = 16.0 / 3.0


def _cells_may_intersect(
    face: np.ndarray,
    i: np.ndarray,
    j: np.ndarray,
    lvl: int,
    lon_lo: float,
    lon_hi: float,
    lat_lo: float,
    lat_hi: float,
) -> np.ndarray:
    """Conservative test: False only if the cell PROVABLY misses the
    rect.  Vertex lat/lon box expanded by the level's diameter bound;
    longitude expansion is latitude-aware and degrades to full-circle
    near the poles or when the (possibly antimeridian-crossing) vertex
    span is ambiguous."""
    size = _U(1) << _U(MAX_LEVEL - lvl)
    diam = np.degrees(_DIAM_RAD * 2.0 ** (-lvl))
    scale = 1.0 / float(1 << MAX_LEVEL)
    vlat = []
    vlon = []
    for di in (0, 1):
        for dj in (0, 1):
            s = (i + di * size).astype(np.float64) * scale
            t = (j + dj * size).astype(np.float64) * scale
            x, y, z = _xyz_from_face_uv(face, st_to_uv(s), st_to_uv(t))
            n = np.sqrt(x * x + y * y + z * z)
            vlat.append(np.degrees(np.arcsin(np.clip(z / n, -1.0, 1.0))))
            vlon.append(np.degrees(np.arctan2(y, x)))
    vlat = np.stack(vlat)
    vlon = np.stack(vlon)
    cell_lat_lo = vlat.min(axis=0) - diam
    cell_lat_hi = vlat.max(axis=0) + diam
    lat_ok = (cell_lat_hi >= lat_lo) & (cell_lat_lo <= lat_hi)

    # longitude: full-circle whenever the expanded cell nears a pole or
    # its vertex span exceeds 180 deg (antimeridian-crossing or pole-
    # enclosing cells — conservative, never wrong)
    near_pole = (cell_lat_hi >= 90.0 - diam) | (cell_lat_lo <= -90.0 + diam)
    lon_min = vlon.min(axis=0)
    lon_max = vlon.max(axis=0)
    wide = (lon_max - lon_min) > 180.0
    # lat closest to a pole inside the expanded box bounds the lon
    # stretch factor 1/cos(lat)
    worst = np.minimum(
        np.maximum(np.abs(cell_lat_lo), np.abs(cell_lat_hi)), 89.999
    )
    ex = diam / np.cos(np.radians(worst))
    plain = (lon_max + ex >= lon_lo) & (lon_min - ex <= lon_hi)
    lon_ok = near_pole | wide | (ex >= 180.0) | plain
    return lat_ok & lon_ok


def s2_cover_rect(
    lon_lo: float,
    lon_hi: float,
    lat_lo: float,
    lat_hi: float,
    level: int,
) -> np.ndarray:
    """Cell ids (uint64) of a conservative level-`level` cover of the
    lon/lat rectangle: a provable SUPERSET of every cell containing a
    point of the rect (-180 <= lon_lo < lon_hi <= 180, no wrap).

    Hierarchical descent from the six face cells, pruning children that
    provably miss the rect (_cells_may_intersect).  Driver-side numpy —
    frontier is at most ~4x the true cover size per level."""
    if not (lon_lo < lon_hi and lat_lo < lat_hi):
        raise ValueError("empty rect")
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}]")
    face = np.arange(6, dtype=np.uint64)
    i = np.zeros(6, dtype=np.uint64)
    j = np.zeros(6, dtype=np.uint64)
    for lvl in range(0, level + 1):
        keep = _cells_may_intersect(face, i, j, lvl, lon_lo, lon_hi, lat_lo, lat_hi)
        face, i, j = face[keep], i[keep], j[keep]
        if lvl == level:
            break
        half = _U(1) << _U(MAX_LEVEL - lvl - 1)
        face = np.repeat(face, 4)
        i = np.repeat(i, 4) + np.tile(np.array([0, 0, 1, 1], dtype=np.uint64), keep.sum()) * half
        j = np.repeat(j, 4) + np.tile(np.array([0, 1, 0, 1], dtype=np.uint64), keep.sum()) * half
    if face.size == 0:
        return np.empty(0, dtype=np.uint64)
    leaf = (face << _U(61)) | (_pos_from_ij(face, i, j) << _U(1)) | _U(1)
    return np.unique(s2_parent(leaf, level))


def s2_cover_intervals(
    lon_lo: float,
    lon_hi: float,
    lat_lo: float,
    lat_hi: float,
    level: int,
) -> np.ndarray:
    """Merged signed-long LEAF-id intervals of the rect's cell cover —
    the S2 analog of the LITMAX/BIGMIN interval list (the reference's
    box -> monotone key ranges, zcurve.c:123-140).  Hilbert locality
    collapses a connected rect's cover into few runs: consecutive
    same-level cells are exactly one leaf-id step (2) apart, so e.g.
    the 75k-cell level-8 cover of a 90x90-degree box merges to ~400
    runs.  Returns an (n, 2) int64 array of [lo, hi] leaf-id ranges,
    sorted, non-overlapping — directly usable against a store manifest's
    per-file key min/max (B-tree-descent analog) and as pushed BETWEEN
    row-group filters."""
    cover = s2_cover_rect(lon_lo, lon_hi, lat_lo, lat_hi, level)
    if cover.size == 0:
        return np.empty((0, 2), dtype=np.int64)
    lo = s2_range_min(cover).view(np.int64)
    hi = s2_range_max(cover).view(np.int64)
    order = np.argsort(lo)
    lo, hi = lo[order], hi[order]
    breaks = np.nonzero(lo[1:] > hi[:-1] + 2)[0] + 1
    starts = np.concatenate([[0], breaks])
    ends = np.concatenate([breaks, [len(lo)]])
    return np.stack([lo[starts], hi[ends - 1]], axis=1)


# ---------------------------------------------------------------------------
# Spark surface (Arrow-batched; ids exposed as two's-complement long)
# ---------------------------------------------------------------------------


def _to_signed(a: np.ndarray) -> pd.Series:
    return pd.Series(a.astype(np.uint64).view(np.int64))


@pandas_udf(T.LongType())
def s2_cellid_udf(lon: pd.Series, lat: pd.Series) -> pd.Series:
    return _to_signed(s2_cellid(lon.to_numpy(), lat.to_numpy()))


@pandas_udf(T.IntegerType())
def s2_level_udf(cid: pd.Series) -> pd.Series:
    return pd.Series(s2_level(cid.to_numpy().view(np.uint64)).astype(np.int32))


def s2_parent_udf(level: int):
    @pandas_udf(T.LongType())
    def _p(cid: pd.Series) -> pd.Series:
        return _to_signed(s2_parent(cid.to_numpy().view(np.uint64), level))

    return _p


def s2_cell_udf(level: int = MAX_LEVEL):
    """One fused Arrow UDF: lon/lat -> cell id at `level` (single
    batch round-trip even for non-leaf levels).

    Non-leaf levels walk only `level` Hilbert levels (the position
    prefix determines the parent id — identical to
    ``s2_parent(s2_cellid(...), level)``, pytest cross-checked) instead
    of computing the full leaf and clearing bits: at the bench's level
    8 that is 2 block-LUT gathers instead of 30 per-level steps."""

    @pandas_udf(T.LongType())
    def _f(lon: pd.Series, lat: pd.Series) -> pd.Series:
        if level < MAX_LEVEL:
            x, y, z = _xyz_from_lonlat(lon.to_numpy(), lat.to_numpy())
            face, u, v = _face_uv_from_xyz(x, y, z)
            i = _st_to_ij(uv_to_st(u))
            j = _st_to_ij(uv_to_st(v))
            posl = _pos_from_ij(face, i, j, level=level)
            shift = _U(2 * (MAX_LEVEL - level))
            cid = (
                (np.asarray(face, dtype=np.uint64) << _U(61))
                | (posl << (shift + _U(1)))
                | (_U(1) << shift)
            )
        else:
            cid = s2_cellid(lon.to_numpy(), lat.to_numpy())
        return _to_signed(cid)

    return _f


def s2_cell_col(lon_col: str, lat_col: str, level: int = MAX_LEVEL) -> Column:
    """S2 cell id Column at `level` from lon/lat degree columns."""
    return s2_cell_udf(level)(F.col(lon_col), F.col(lat_col))
