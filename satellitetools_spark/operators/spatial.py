"""Standalone cell-equi spatial join: pixels × AOI polygons (J1 at scale).

The document pipeline joins pixels to their own document's AOI locally
(sources/decode.py). This operator is the general form the north star asks
for: an arbitrary pixel/point DataFrame joined against an AOI polygon
table via the planar cell index —

1. driver-side (AOIs are a dimension table): project each AOI to its tile's
   UTM plane and compute its cell cover (full / partial cells);
2. explode the cover into a (aoi, tileid, cell, is_full) DataFrame and
   broadcast-hash-join it to the pixels on (tileid, cell) — Catalyst plans
   a BroadcastHashJoin, no pixel shuffle at all;
3. pixels landing in 'full' cells are inside by construction; pixels in
   'partial' (boundary) cells go through one vectorized ray-casting pandas
   UDF for exact refinement.

For very large AOI sets, pass ``broadcast_cover=False`` to fall back to a
shuffle hash join on the same key — the plan shape is otherwise identical.
Skewed hot tiles are handled by the cell key itself (cells subdivide
tiles ~1e9:1) plus AQE skew-join splitting.
"""

from __future__ import annotations

import json
from typing import Dict, List, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .. import geometry as G
from ..constants import CELL_SIZE_M


def aoi_cover_table(aois: List[dict], cell_m: float = CELL_SIZE_M) -> Tuple[List[tuple], Dict[str, list]]:
    """Compute cover rows + geometry lookup for a list of AOI dicts with
    keys (aoi, tileid, geometry [GeoJSON], utm_zone)."""
    rows = []
    geoms: Dict[str, list] = {}
    for a in aois:
        rings4326 = G.rings_from_geojson(a["geometry"])
        rings_utm = G.project_rings_to_utm(rings4326, int(a["utm_zone"]))
        geoms[a["aoi"]] = [r.tolist() for r in rings_utm]
        cover = G.polygon_cell_cover(rings_utm, cell_m)
        for c in cover["full"]:
            rows.append((a["aoi"], a["tileid"], int(c), True))
        for c in cover["partial"]:
            rows.append((a["aoi"], a["tileid"], int(c), False))
    return rows, geoms


def cell_join(pixels: DataFrame, aois: List[dict],
              cell_m: float = CELL_SIZE_M,
              broadcast_cover: bool = True) -> DataFrame:
    """Join pixel rows (tileid, x, y, ...) to AOI polygons; returns the
    input columns + ``aoi``, keeping only inside-polygon pixels."""
    spark = pixels.sparkSession
    rows, geoms = aoi_cover_table(aois, cell_m)
    cover = spark.createDataFrame(
        rows, "aoi string, tileid string, cell bigint, is_full boolean")
    if broadcast_cover:
        cover = F.broadcast(cover)

    px = pixels
    if "cell" not in px.columns:
        cell = (F.floor(F.col("y") / cell_m).cast("long") * F.lit(2**32)
                + F.pmod(F.floor(F.col("x") / cell_m).cast("long"), F.lit(2**32)))
        px = px.withColumn("cell", cell)

    joined = px.join(cover, ["tileid", "cell"])

    geom_json = {k: json.dumps(v) for k, v in geoms.items()}

    @pandas_udf(T.BooleanType())
    def pip_refine(aoi: pd.Series, x: pd.Series, y: pd.Series) -> pd.Series:
        out = np.zeros(len(aoi), dtype=bool)
        xs = x.to_numpy(dtype=float)
        ys = y.to_numpy(dtype=float)
        for name in aoi.unique():
            rings = [np.asarray(r, dtype=float) for r in json.loads(geom_json[name])]
            m = (aoi == name).to_numpy()
            out[m] = G.points_in_rings(xs[m], ys[m], rings)
        return pd.Series(out)

    # full-cover cells skip refinement entirely (the common case)
    inside = joined.filter(
        F.col("is_full") | pip_refine(F.col("aoi"), F.col("x"), F.col("y")))
    return inside.drop("is_full")
