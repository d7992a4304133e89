"""Engine-wide constants: Sentinel-2 bands, SCL classes, filters, SNAP RMSE.

Semantics derived from the public reference `ollinevalainen/satellitetools`
(see /root/reference/satellitetools/common/sentinel2.py:32-235 and
biophys/biophys.py:80-96). This module defines the *data model*, not code
ported from the reference.
"""

from __future__ import annotations

# Reflectance transport scaling (sentinel2.py:32): stored ints / 10000.
S2_REFL_TRANS = 10000.0
# SCL no-data sentinel (sentinel2.py:33). Spectral no-data is SQL NULL in
# this engine (the reference uses NaN; NULL is the relational equivalent and
# keeps Spark/DuckDB aggregate semantics identical).
SCL_NODATA = 99

# GEE-style band names (sentinel2.py:121-137) — the engine's canonical names.
S2_BANDS = [
    "B1", "B2", "B3", "B4", "B5", "B6", "B7", "B8", "B8A", "B9",
    "B11", "B12", "AOT", "WVP", "SCL",
]
S2_BANDS_10_20 = ["B2", "B3", "B4", "B5", "B6", "B7", "B8", "B8A", "B11", "B12"]

# AWS/COG asset names, index-aligned with S2_BANDS (sentinel2.py:171-198).
S2_BANDS_COG = [
    "coastal", "blue", "green", "red", "rededge1", "rededge2", "rededge3",
    "nir", "nir08", "nir09", "swir16", "swir22", "aot", "wvp", "scl",
]
S2_BANDS_GEE_TO_AWS = dict(zip(S2_BANDS, S2_BANDS_COG))
S2_BANDS_AWS_TO_GEE = dict(zip(S2_BANDS_COG, S2_BANDS))

# Native ground-sample distance per band (meters), real Sentinel-2 values.
S2_BAND_GSD = {
    "B1": 60, "B2": 10, "B3": 10, "B4": 10, "B5": 20, "B6": 20, "B7": 20,
    "B8": 10, "B8A": 20, "B9": 60, "B11": 20, "B12": 20,
    "AOT": 10, "WVP": 10, "SCL": 20,
}

# Scene-classification classes, code order = enum value (sentinel2.py:104-118).
SCL_CLASSES = [
    "NODATA", "SATURATED_DEFECTIVE", "DARK_FEATURE_SHADOW", "CLOUD_SHADOW",
    "VEGETATION", "NOT_VEGETATED", "WATER", "UNCLASSIFIED",
    "CLOUD_MEDIUM_PROBA", "CLOUD_HIGH_PROBA", "THIN_CIRRUS", "SNOW_ICE",
]
SCL_CLASS_VALUE = {name: i for i, name in enumerate(SCL_CLASSES)}

# Default QI filter sets (sentinel2.py:216-235).
S2_FILTER1 = [
    "NODATA", "SATURATED_DEFECTIVE", "CLOUD_SHADOW", "UNCLASSIFIED",
    "CLOUD_MEDIUM_PROBA", "CLOUD_HIGH_PROBA", "THIN_CIRRUS", "SNOW_ICE",
]
S2_FILTER2 = [
    "NODATA", "SATURATED_DEFECTIVE", "CLOUD_SHADOW",
    "CLOUD_MEDIUM_PROBA", "CLOUD_HIGH_PROBA", "THIN_CIRRUS", "SNOW_ICE",
]

# SNAP biophysical processor (biophys.py:80-96).
SNAP_BIO_BANDS = ["B3", "B4", "B5", "B6", "B7", "B8A", "B11", "B12"]
BIOPHYS_VARIABLES = ["LAI", "FAPAR", "FCOVER", "LAI_Cab", "LAI_Cw"]
# value-form names used as output columns (biophys.py:51-56)
BIOPHYS_COLUMN = {
    "LAI": "lai", "FAPAR": "fapar", "FCOVER": "fcover",
    "LAI_Cab": "lai_cab", "LAI_Cw": "lai_cw",
}
SNAP_BIO_RMSE = {
    "FAPAR": 0.05, "FCOVER": 0.04, "LAI": 0.89, "LAI_Cab": 56.0, "LAI_Cw": 0.03,
}

VEGETATION_INDICES = ["ndvi", "ci_red_edge", "gcc"]

# Confidence-interval z-scores and column suffixes (timeseries.py:266-277).
CONFIDENCE_LEVELS = {
    "90": (1.645, "_F005", "_F095"),
    "95": (1.96, "_F0025", "_F0975"),
    "99": (2.576, "_F0005", "_F0995"),
}

# Spatial cell grid: side length in meters of the engine's planar cell index
# (H3/S2-style, over per-tile UTM coordinates). 160 m = 8 px at 20 m GSD.
CELL_SIZE_M = 160.0
