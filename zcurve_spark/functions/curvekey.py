"""Curve-key numpy kernels: Z-order (Morton) 2D/3D and Hilbert 2D.

Semantics follow the reference zcurve extension's verified bit layouts
(SURVEY.md §2.2):

* 2D Z-key: bit ``2i`` carries ``x_i``, bit ``2i+1`` carries ``y_i``
  (reference: bitkey.c:76-97, nibble-LUT ``stoBits``).
* 3D Z-key: per bit-triple, bit ``3i`` = ``z_i``, ``3i+1`` = ``y_i``,
  ``3i+2`` = ``x_i`` (reference: bitkey.c:386-417).
* Keys are totally ordered as unsigned integers (reference cmp,
  bitkey.c:27-33).  We cap the per-dimension bit budget so 2D keys fit in
  a *non-negative* int64 (sort-safe as Spark ``LongType``); full-width 3D
  keys (96 bits) are exposed as Python ints / ``Decimal(38,0)``.

The kernels are pure numpy (vectorized, no per-row Python) so they can be
wrapped in Arrow-batched pandas UDFs, and they double as the independent
model for the pure-Column JVM implementations in ``columns.py``.

Everything here is public bit-twiddling (Morton codes, Tropf/Herzog 1981,
Hilbert curve via the standard Gray-code rotation algorithm).
"""

from __future__ import annotations

import numpy as np

# Max bits per dimension so that a 2D key stays < 2^62 (non-negative int64).
MAX_BITS_2D = 31
# Max bits per dimension so that a 3D key fits in a non-negative int64.
MAX_BITS_3D_LONG = 20

_U = np.uint64

# ---------------------------------------------------------------------------
# 2D Morton (Z-order)
# ---------------------------------------------------------------------------

_SPREAD2_MASKS = (
    (_U(16), _U(0x0000FFFF0000FFFF)),
    (_U(8), _U(0x00FF00FF00FF00FF)),
    (_U(4), _U(0x0F0F0F0F0F0F0F0F)),
    (_U(2), _U(0x3333333333333333)),
    (_U(1), _U(0x5555555555555555)),
)


def spread2(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each element: bit i -> bit 2i."""
    v = v.astype(np.uint64) & _U(0xFFFFFFFF)
    for shift, mask in _SPREAD2_MASKS:
        v = (v | (v << shift)) & mask
    return v


def compact2(v: np.ndarray) -> np.ndarray:
    """Inverse of :func:`spread2`: gather even bits, bit 2i -> bit i."""
    v = v.astype(np.uint64) & _U(0x5555555555555555)
    v = (v | (v >> _U(1))) & _U(0x3333333333333333)
    v = (v | (v >> _U(2))) & _U(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> _U(4))) & _U(0x00FF00FF00FF00FF)
    v = (v | (v >> _U(8))) & _U(0x0000FFFF0000FFFF)
    v = (v | (v >> _U(16))) & _U(0x00000000FFFFFFFF)
    return v


def zkey2(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """2D Morton key; x on even bits, y on odd bits (bitkey.c:76-97 layout).

    Returns uint64; callers with coords < 2^31 get keys < 2^62, safe to
    view as non-negative int64.
    """
    return spread2(np.asarray(x)) | (spread2(np.asarray(y)) << _U(1))


def unzkey2(k: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Decode 2D Morton key -> (x, y) (bitkey.c:100-124 semantics)."""
    k = np.asarray(k, dtype=np.uint64)
    return compact2(k), compact2(k >> _U(1))


# ---------------------------------------------------------------------------
# 3D Morton (Z-order), int64 fast path (coords < 2^20) and full 96-bit path
# ---------------------------------------------------------------------------


def spread3(v: np.ndarray) -> np.ndarray:
    """Spread low 21 bits of each element: bit i -> bit 3i (fits uint64)."""
    v = v.astype(np.uint64) & _U(0x1FFFFF)
    v = (v | (v << _U(32))) & _U(0x1F00000000FFFF)
    v = (v | (v << _U(16))) & _U(0x1F0000FF0000FF)
    v = (v | (v << _U(8))) & _U(0x100F00F00F00F00F)
    v = (v | (v << _U(4))) & _U(0x10C30C30C30C30C3)
    v = (v | (v << _U(2))) & _U(0x1249249249249249)
    return v


def compact3(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64) & _U(0x1249249249249249)
    v = (v | (v >> _U(2))) & _U(0x10C30C30C30C30C3)
    v = (v | (v >> _U(4))) & _U(0x100F00F00F00F00F)
    v = (v | (v >> _U(8))) & _U(0x1F0000FF0000FF)
    v = (v | (v >> _U(16))) & _U(0x1F00000000FFFF)
    v = (v | (v >> _U(32))) & _U(0x1FFFFF)
    return v


def zkey3(x: np.ndarray, y: np.ndarray, z: np.ndarray) -> np.ndarray:
    """3D Morton key, int64-safe for coords < 2^21 (63-bit key).

    Layout matches bitkey.c:386-417: bit 3i = z_i, 3i+1 = y_i, 3i+2 = x_i.
    """
    return (
        (spread3(np.asarray(x)) << _U(2))
        | (spread3(np.asarray(y)) << _U(1))
        | spread3(np.asarray(z))
    )


def unzkey3(k: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    k = np.asarray(k, dtype=np.uint64)
    return compact3(k >> _U(2)), compact3(k >> _U(1)), compact3(k)


def zkey3_full(x: int, y: int, z: int) -> int:
    """Full-width 3D Morton key for 32-bit coords (96-bit Python int).

    Scalar (driver-side / test-side) analog of the reference's two-word
    96-bit key (bitkey.c:386-417, packed hi*2^64+lo here; the reference
    surfaces it as numeric hi*2^48+lo, bitkey.c:371-382 — same integer).
    """
    k = 0
    for i in range(32):
        k |= ((z >> i) & 1) << (3 * i)
        k |= ((y >> i) & 1) << (3 * i + 1)
        k |= ((x >> i) & 1) << (3 * i + 2)
    return k


def unzkey3_full(k: int) -> tuple[int, int, int]:
    x = y = z = 0
    for i in range(32):
        z |= ((k >> (3 * i)) & 1) << i
        y |= ((k >> (3 * i + 1)) & 1) << i
        x |= ((k >> (3 * i + 2)) & 1) << i
    return x, y, z


# ---------------------------------------------------------------------------
# Hilbert 2D (Gray-code rotation; public algorithm, vectorized)
# ---------------------------------------------------------------------------


def hilbert2(x: np.ndarray, y: np.ndarray, order: int = MAX_BITS_2D) -> np.ndarray:
    """Hilbert curve index of (x, y) at the given order (bits/dim).

    Vectorized form of the classic xy->d algorithm (rotate/flip quadrant
    walk).  Monotone 64-bit-sortable like the Z-key; order <= 31 keeps the
    result < 2^62 (non-negative int64).
    """
    if not 1 <= order <= MAX_BITS_2D:
        raise ValueError(f"order must be in [1, {MAX_BITS_2D}], got {order}")
    x = np.asarray(x, dtype=np.uint64).copy()
    y = np.asarray(y, dtype=np.uint64).copy()
    d = np.zeros_like(x, dtype=np.uint64)
    s = _U(1) << _U(order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.uint64)
        ry = ((y & s) > 0).astype(np.uint64)
        d += s * s * ((_U(3) * rx) ^ ry)
        # rotate quadrant
        flip = (ry == 0) & (rx == 1)
        x_f = np.where(flip, s - _U(1) - x, x)
        y_f = np.where(flip, s - _U(1) - y, y)
        swap = ry == 0
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        s >>= _U(1)
    return d


def unhilbert2(d: np.ndarray, order: int = MAX_BITS_2D) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`hilbert2` (d -> (x, y))."""
    d = np.asarray(d, dtype=np.uint64)
    t = d.copy()
    x = np.zeros_like(d, dtype=np.uint64)
    y = np.zeros_like(d, dtype=np.uint64)
    s = _U(1)
    top = _U(1) << _U(order)
    while s < top:
        rx = _U(1) & (t // _U(2))
        ry = _U(1) & (t ^ rx)
        # rotate back
        flip = (ry == 0) & (rx == 1)
        x_f = np.where(flip, s - _U(1) - x, x)
        y_f = np.where(flip, s - _U(1) - y, y)
        swap = ry == 0
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        x += s * rx
        y += s * ry
        t //= _U(4)
        s <<= _U(1)
    return x, y


# ---------------------------------------------------------------------------
# Hilbert 3D (Skilling's transpose algorithm; public — J. Skilling,
# "Programming the Hilbert curve", AIP Conf. Proc. 707 (2004) 381-387 —
# vectorized over numpy arrays)
# ---------------------------------------------------------------------------


def hilbert3(
    x: np.ndarray, y: np.ndarray, z: np.ndarray, order: int = MAX_BITS_3D_LONG
) -> np.ndarray:
    """3D Hilbert index at `order` bits/dim (key < 2^(3*order) <= 2^60,
    non-negative int64-safe, monotone sortable like zkey3).

    Axes -> transpose (Skilling): per bit level, conditionally invert or
    exchange low bits of axis 0 against each axis, then Gray-encode
    across axes; the final index interleaves the transposed axes with
    axis 0 in the most-significant slot of each bit-triple (the same
    slot layout as :func:`zkey3`, so `spread3` does the packing)."""
    if not 1 <= order <= MAX_BITS_3D_LONG:
        raise ValueError(f"order must be in [1, {MAX_BITS_3D_LONG}], got {order}")
    X = [
        np.asarray(x, dtype=np.uint64).copy(),
        np.asarray(y, dtype=np.uint64).copy(),
        np.asarray(z, dtype=np.uint64).copy(),
    ]
    M = _U(1) << _U(order - 1)
    # inverse-undo pass
    Q = M
    while Q > _U(1):
        P = Q - _U(1)
        for i in range(3):
            mask = (X[i] & Q) != 0
            X[0] = np.where(mask, X[0] ^ P, X[0])  # invert low bits of axis 0
            t = np.where(mask, _U(0), (X[0] ^ X[i]) & P)  # else: exchange
            X[0] ^= t
            X[i] ^= t
        Q >>= _U(1)
    # Gray encode
    for i in range(1, 3):
        X[i] ^= X[i - 1]
    t = np.zeros_like(X[0])
    Q = M
    while Q > _U(1):
        t = np.where((X[2] & Q) != 0, t ^ (Q - _U(1)), t)
        Q >>= _U(1)
    for i in range(3):
        X[i] ^= t
    return (spread3(X[0]) << _U(2)) | (spread3(X[1]) << _U(1)) | spread3(X[2])


def unhilbert3(
    h: np.ndarray, order: int = MAX_BITS_3D_LONG
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of :func:`hilbert3` (index -> (x, y, z))."""
    k = np.asarray(h, dtype=np.uint64)
    X = [compact3(k >> _U(2)), compact3(k >> _U(1)), compact3(k)]
    N = _U(2) << _U(order - 1)
    # Gray decode
    t = X[2] >> _U(1)
    for i in range(2, 0, -1):
        X[i] ^= X[i - 1]
    X[0] ^= t
    # undo excess work
    Q = _U(2)
    while Q != N:
        P = Q - _U(1)
        for i in range(2, -1, -1):
            mask = (X[i] & Q) != 0
            X[0] = np.where(mask, X[0] ^ P, X[0])
            t = np.where(mask, _U(0), (X[0] ^ X[i]) & P)
            X[0] ^= t
            X[i] ^= t
        Q <<= _U(1)
    return X[0], X[1], X[2]


# ---------------------------------------------------------------------------
# lon/lat quantizers
# ---------------------------------------------------------------------------


def quantize_lon(lon: np.ndarray, bits: int = 30) -> np.ndarray:
    """Map lon in [-180, 180) to an integer grid [0, 2^bits)."""
    n = np.uint64(1) << np.uint64(bits)
    q = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * float(n))
    return np.clip(q, 0, float(n) - 1).astype(np.uint64)


def quantize_lat(lat: np.ndarray, bits: int = 30) -> np.ndarray:
    """Map lat in [-90, 90) to an integer grid [0, 2^bits)."""
    n = np.uint64(1) << np.uint64(bits)
    q = np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / 180.0 * float(n))
    return np.clip(q, 0, float(n) - 1).astype(np.uint64)


def dequantize_lon(q: np.ndarray, bits: int = 30) -> np.ndarray:
    n = float(np.uint64(1) << np.uint64(bits))
    return np.asarray(q, dtype=np.float64) / n * 360.0 - 180.0


def dequantize_lat(q: np.ndarray, bits: int = 30) -> np.ndarray:
    n = float(np.uint64(1) << np.uint64(bits))
    return np.asarray(q, dtype=np.float64) / n * 180.0 - 90.0
