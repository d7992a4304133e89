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


def salted_join(big: DataFrame, dim: DataFrame, key: str,
                n_salt: int = 16, how: str = "inner") -> DataFrame:
    """Skew-proof equi-join of a big fact table against a dimension with
    HOT keys: the big side gets a random-but-deterministic salt in
    ``[0, n_salt)``, the dimension is replicated ``n_salt``× with every
    salt value, and the join runs on ``(key, salt)`` — a hot key's rows
    now spread over ``n_salt`` shuffle partitions instead of serializing
    into one straggler task.

    This is the shuffle-join fallback for when the dimension is TOO BIG
    to broadcast (broadcast is always the first choice and needs no
    salting) and AQE's skew-join splitting can't help — e.g. the skewed
    side feeds a subsequent keyed aggregation that must stay co-
    partitioned. Cost: ``n_salt``× replication of the dimension ONLY
    (explode of a literal range — no extra shuffle of the big side
    beyond the join's own), result identical to the plain join for any
    ``how`` ∈ {inner, left} (each big row carries exactly one salt, each
    dim row exists for every salt — match iff the plain join matches).

    The salt hashes the whole row identity (``monotonically_increasing_
    id`` is layout-dependent, fine for load spreading, never used in the
    result), so no column requirements beyond the key.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join: how must be inner or left")
    salt = F.pmod(F.hash(F.monotonically_increasing_id()),
                  F.lit(n_salt)).cast("int")
    b = big.withColumn("_salt", salt)
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)])))
    out = b.join(d, [key, "_salt"], how)
    return out.drop("_salt")
