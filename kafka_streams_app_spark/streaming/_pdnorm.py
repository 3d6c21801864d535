"""Pandas dtype normalization shared by the stateful processors.

Two silent-corruption paths every Arrow->pandas crossing must close
(found in r5 for the bucketed ktable, but latent in ANY frame that
mixes nulls into integral columns — e.g. the union-tagged PK/FK join
inputs, where each side's rows carry nulls in the OTHER side's
columns BY CONSTRUCTION):

(a) a null in an int64 column makes pandas deliver float64, so state
    keys/values and output cells round-trip through float64 and values
    above 2^53 are silently corrupted;
(b) groupby().shift(1) on plain int64 upcasts through float64
    (NaN fill) the same way.

`normalize_nullable` pins integral/bool columns to pandas NULLABLE
extension dtypes (Int64/boolean) so neither path ever touches float64;
`pynative` / `pykey` convert cells back to plain-Python scalars (None
for every null flavor) before they reach the TWS state-server protobuf
serializer or an output tuple.
"""

from __future__ import annotations

import decimal

import pandas as pd
from pyspark.sql.types import (
    BooleanType,
    ByteType,
    DataType,
    IntegerType,
    LongType,
    ShortType,
)

INTEGRAL_TYPES = (ByteType, ShortType, IntegerType, LongType)


_EXACT_F64 = float(1 << 53)  # largest power of 2 where all ints are exact


def normalize_nullable(
    pdf: pd.DataFrame, fields: list[tuple[str, DataType]]
) -> pd.DataFrame:
    """Pin integral/bool columns to nullable extension dtypes in place.

    A LongType column that arrives as float64 means pyarrow's to_pandas
    already NaN-upcast it (a null was present in the batch); restoring
    to Int64 is exact only below 2^53 — above that the value was
    corrupted BEFORE this code ran, so raise loudly instead of emitting
    silently-wrong data (callers that can see such values pre-shield
    the column via shield_long / exact_longs=True).
    """
    for name, dtype in fields:
        col = pdf[name]
        if (
            pd.api.types.is_extension_array_dtype(col.dtype)
            or col.dtype == object  # decimal-shielded / already exact
        ):
            continue
        if isinstance(dtype, INTEGRAL_TYPES):
            if isinstance(dtype, LongType) and col.dtype.kind == "f":
                m = col.abs().max()
                if m == m and m >= _EXACT_F64:
                    raise ValueError(
                        f"int64 column {name!r} crossed Arrow as float64 "
                        "(nulls present) and holds values >= 2^53 — the "
                        "values are already corrupted. Re-run with "
                        "exact_longs=True (decimal shield) on this "
                        "operator; see streaming/_pdnorm.py."
                    )
            pdf[name] = col.astype("Int64")
        elif isinstance(dtype, BooleanType):
            pdf[name] = col.astype("boolean")
    return pdf


def pynative(v):
    """One cell -> plain-Python scalar; every null flavor -> None.

    numpy scalars -> python scalars: the state-server protobuf
    serializer expects plain python types in key/value tuples. Null
    cells (pd.NA from nullable extension dtypes, NaN/NaT from legacy
    upcasts) map to None — never a float NaN that would defeat MapState
    lookups or leak into output rows.
    """
    if v is None or v is pd.NA or v is pd.NaT:
        return None
    if isinstance(v, float) and v != v:
        return None
    if isinstance(v, decimal.Decimal):
        # the long-shield (see shield_longs): LongType columns cross
        # Arrow as decimal(20,0) and come back as exact ints here
        return int(v)
    if hasattr(v, "item"):
        return v.item()
    return v


def pykey(row_vals) -> tuple:
    """A sequence of cells -> tuple of plain-Python scalars."""
    return tuple(pynative(v) for v in row_vals)


def shield_long(col, dtype: DataType):
    """Column expression that carries a LongType exactly across the
    Arrow->pandas crossing when the column can hold nulls.

    pyarrow's to_pandas turns int64-with-nulls into float64 (there is
    no nullable-dtype option in pyspark's serializer), silently rounding
    values above 2^53 BEFORE any Python-side normalization can run.
    decimal(20,0) crosses as exact decimal.Decimal objects (object
    dtype); `pynative` converts them back to plain ints. Apply to every
    LongType column that mixes nulls by construction (the union-tagged
    PK/FK join inputs); state/output schemas keep LongType — output
    cells are plain ints in dtype=object frames, which Arrow converts
    exactly.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    c = col if not isinstance(col, str) else F.col(col)
    return c.cast("decimal(20,0)") if isinstance(dtype, LongType) else c


def is_shielded(dtype: DataType) -> bool:
    """True when shield_long rewrites this type (skip Int64 pinning —
    the column arrives as object-of-Decimal, already exact)."""
    from pyspark.sql.types import LongType

    return isinstance(dtype, LongType)
