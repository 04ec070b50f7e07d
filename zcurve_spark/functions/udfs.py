"""Arrow-batched pandas UDFs wrapping the numpy curve kernels.

Only for operations a Column expression can't reach (Hilbert's rotation
state machine, 96-bit 3D keys).  Everything is vectorized numpy inside
the batch — no per-row Python (the north-star constraint).
"""

from __future__ import annotations

from decimal import Decimal

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import curvekey as ck


def hilbert2_udf(order: int):
    """pandas UDF: (x, y) -> Hilbert index at `order` bits/dim."""

    @F.pandas_udf(T.LongType())
    def _h(x: pd.Series, y: pd.Series) -> pd.Series:
        d = ck.hilbert2(x.to_numpy(np.uint64), y.to_numpy(np.uint64), order=order)
        return pd.Series(d.astype(np.int64))

    return _h


def unhilbert2_udf(order: int):
    @F.pandas_udf(T.StructType([
        T.StructField("x", T.LongType()),
        T.StructField("y", T.LongType()),
    ]))
    def _uh(d: pd.Series) -> pd.DataFrame:
        x, y = ck.unhilbert2(d.to_numpy(np.uint64), order=order)
        return pd.DataFrame({"x": x.astype(np.int64), "y": y.astype(np.int64)})

    return _uh


def hilbert3_udf(order: int):
    """pandas UDF: (x, y, z) -> 3D Hilbert index at `order` bits/dim
    (Skilling transpose algorithm, vectorized numpy)."""

    @F.pandas_udf(T.LongType())
    def _h3(x: pd.Series, y: pd.Series, z: pd.Series) -> pd.Series:
        d = ck.hilbert3(
            x.to_numpy(np.uint64), y.to_numpy(np.uint64), z.to_numpy(np.uint64),
            order=order,
        )
        return pd.Series(d.astype(np.int64))

    return _h3


def unhilbert3_udf(order: int):
    @F.pandas_udf(T.StructType([
        T.StructField("x", T.LongType()),
        T.StructField("y", T.LongType()),
        T.StructField("z", T.LongType()),
    ]))
    def _uh3(d: pd.Series) -> pd.DataFrame:
        x, y, z = ck.unhilbert3(d.to_numpy(np.uint64), order=order)
        return pd.DataFrame({
            "x": x.astype(np.int64),
            "y": y.astype(np.int64),
            "z": z.astype(np.int64),
        })

    return _uh3


@F.pandas_udf(T.DecimalType(38, 0))
def zkey3_full_udf(x: pd.Series, y: pd.Series, z: pd.Series) -> pd.Series:
    """Full-width 96-bit 3D Morton key as Decimal(38,0) — the reference's
    numeric-typed key (bitkey.c:328-382).  Two uint64 words are built
    vectorized; only the final Decimal packing touches Python objects."""
    xs = x.to_numpy(np.uint64)
    ys = y.to_numpy(np.uint64)
    zs = z.to_numpy(np.uint64)
    # low 21 bits of each coord -> low word (63 bits); high 11 bits -> high word
    low = ck.zkey3(xs & np.uint64(0x1FFFFF), ys & np.uint64(0x1FFFFF), zs & np.uint64(0x1FFFFF))
    high = ck.zkey3(xs >> np.uint64(21), ys >> np.uint64(21), zs >> np.uint64(21))
    # exact int math first, then Decimal(int): Decimal *arithmetic* would
    # round to the context's 28 significant digits (96-bit keys have 29)
    return pd.Series([Decimal((int(h) << 63) | int(l)) for h, l in zip(high, low)])


@F.pandas_udf(T.StructType([
    T.StructField("x", T.LongType()),
    T.StructField("y", T.LongType()),
    T.StructField("z", T.LongType()),
]))
def unzkey3_full_udf(k: pd.Series) -> pd.DataFrame:
    """Decode the 96-bit Decimal(38,0) 3D key back to 32-bit coords
    (bitkey.c:419-457).  Arrow delivers decimal128 values as Python
    Decimal objects, so the word split is a per-batch object pass; the
    bit-gather itself is vectorized numpy over the two uint64 words
    (inverse of zkey3_full_udf's packing: hi*2^63 | lo)."""
    ints = [int(v) for v in k]
    lo = np.array([a & ((1 << 63) - 1) for a in ints], dtype=np.uint64)
    hi = np.array([a >> 63 for a in ints], dtype=np.uint64)
    xl, yl, zl = ck.unzkey3(lo)
    xh, yh, zh = ck.unzkey3(hi)
    s = np.uint64(21)
    return pd.DataFrame({
        "x": (xl | (xh << s)).astype(np.int64),
        "y": (yl | (yh << s)).astype(np.int64),
        "z": (zl | (zh << s)).astype(np.int64),
    })
