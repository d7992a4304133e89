"""Skew handling: salted repartition on hot keys (Axis B).

Hot tiles (one MGRS tile carrying a large share of all documents — the
bench dataset deliberately places >50% of AOIs on one tile) make any
tile-keyed shuffle skewed. Two defenses, both used by the engine:

1. AQE skew-join splitting (enabled in session.py) — runtime splitting of
   oversized shuffle partitions;
2. explicit salted repartition for tile-keyed stages:
   ``repartition(concat(tileid, pmod(hash(doc_id), n_salt)))`` spreads a
   hot tile over ``n_salt`` partitions while keeping doc locality.

Per-document operators (decode, kNN fill) key on doc_id — already uniform —
so salting applies to tile-level aggregations and the standalone cell join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(df: DataFrame, key: str = "tileid",
                       n_salt: int = 8, id_col: str = "doc_id") -> DataFrame:
    """Spread hot ``key`` groups over ``n_salt`` partitions."""
    salt = F.pmod(F.hash(F.col(id_col)), F.lit(n_salt))
    return df.repartition(F.concat_ws("#", F.col(key), salt.cast("string")))


def salted_group_count(df: DataFrame, key: str = "tileid",
                       n_salt: int = 16) -> DataFrame:
    """Two-stage (salted partial + final) count per key — the map-side
    combine pattern made explicit for very hot keys."""
    salt = F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salt))
    partial = df.groupBy(F.col(key), salt.alias("_salt")).count()
    return partial.groupBy(key).agg(F.sum("count").alias("count"))
