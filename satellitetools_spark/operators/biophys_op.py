"""SNAP biophysical inference over the long pixel table (M1–M8).

One Arrow-batched scalar pandas UDF per variable: assemble the 11-feature
matrix from the wide band columns + observation geometry (M1,
biophys.py:276-325), then a single batch matmul through the MLP
(nn.run_nn). Weights are tiny (<1 KB) and captured in the closure — every
executor materializes them once per task, no broadcast machinery needed.

NaN results (out-of-domain inputs / extreme outputs) are returned as NULL.
"""

from __future__ import annotations

from typing import Iterable, List, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..biophys.nn import load_nn_params, run_nn
from ..constants import BIOPHYS_COLUMN, SNAP_BIO_BANDS


def _snap_udf(variable: str):
    load_nn_params(variable)  # fail fast on driver; worker reloads from package

    @pandas_udf(T.DoubleType())
    def infer(*cols: pd.Series) -> pd.Series:
        x = np.column_stack([
            c.to_numpy(dtype=np.float64, na_value=np.nan) for c in cols
        ])
        # feature assembly M1: 8 bands + cos(rad(angles))
        bands = x[:, :8]
        vz = np.cos(np.radians(x[:, 8]))
        sz = np.cos(np.radians(x[:, 9]))
        ra = np.cos(np.radians(x[:, 10] - x[:, 11]))
        feats = np.column_stack([bands, vz, sz, ra])
        y = run_nn(feats, variable)
        return pd.Series(y)

    return infer


def run_snap_biophys(pixels: DataFrame, variable: str,
                     out_col: Optional[str] = None) -> DataFrame:
    """M8: add the biophysical variable column (lai, fapar, ...)."""
    out_col = out_col or BIOPHYS_COLUMN[variable]
    udf = _snap_udf(variable)
    inputs = [F.col(b) for b in SNAP_BIO_BANDS] + [
        F.col("view_zenith"), F.col("sun_zenith"),
        F.col("sun_azimuth"), F.col("view_azimuth"),
    ]
    out = pixels.withColumn(out_col, udf(*inputs))
    return out.withColumn(out_col, F.when(~F.isnan(F.col(out_col)), F.col(out_col)))


def run_snap_all(pixels: DataFrame, variables: Iterable[str]) -> DataFrame:
    out = pixels
    for v in variables:
        out = run_snap_biophys(out, v)
    return out
