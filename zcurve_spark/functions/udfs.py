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
