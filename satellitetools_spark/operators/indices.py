"""Vegetation indices as pure column expressions (whole-stage codegen).

Reference formulas (biophys.py:365-446): NDVI = (B8A-B4)/(B8A+B4),
CI_RED_EDGE = B7/B5 - 1, GCC = B3/(B2+B3+B4). NULL propagates like the
reference's NaN.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ndvi_col() -> Column:
    return (F.col("B8A") - F.col("B4")) / (F.col("B8A") + F.col("B4"))


def ci_red_edge_col() -> Column:
    return F.col("B7") / F.col("B5") - 1


def gcc_col() -> Column:
    return F.col("B3") / (F.col("B2") + F.col("B3") + F.col("B4"))


_DISPATCH = {
    "ndvi": ndvi_col,
    "ci_red_edge": ci_red_edge_col,
    "gcc": gcc_col,
}


def compute_vegetation_index(pixels: DataFrame, vi: str) -> DataFrame:
    """F13: add the named vegetation-index column."""
    vi = vi.lower()
    if vi not in _DISPATCH:
        raise ValueError(f"Vegetation index {vi!r} not found.")
    return pixels.withColumn(vi, _DISPATCH[vi]())


def with_all_indices(pixels: DataFrame) -> DataFrame:
    out = pixels
    for name, fn in _DISPATCH.items():
        out = out.withColumn(name, fn())
    return out
