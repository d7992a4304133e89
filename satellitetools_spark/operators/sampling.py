"""Deterministic hash-based sampling / split assignment.

Training pipelines need train/val/test membership that is (a) a pure
function of the document key — stable across runs, cluster sizes, and
re-partitioning, so a document can never leak between splits when data is
re-ingested — and (b) computable without any global state (no sort, no
sampling pass). A polynomial char fold over the key (the same portable
(131, 1e9+7) hash as the winnowing operator — NOT engine hash functions,
so the DuckDB oracle computes bit-identical buckets) maps each key to a
bucket in [0, n_buckets); contiguous bucket ranges sized by the requested
weights give the split labels. Pure codegen expressions, no shuffle, no
Python.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_B = 131
_M = 1_000_000_007
DEFAULT_SPLITS: Tuple[Tuple[str, int], ...] = (
    ("train", 80), ("val", 10), ("test", 10))


def _bounds(splits: Sequence[Tuple[str, int]]):
    total = sum(w for _, w in splits)
    acc, out = 0, []
    for name, w in splits:
        acc += w
        out.append((name, acc))
    return out, total


def hash_split(df: DataFrame, key_col: str = "doc_id",
               splits: Sequence[Tuple[str, int]] = DEFAULT_SPLITS) -> DataFrame:
    """Append (bucket, split) columns keyed on a portable hash of ``key_col``.

    ``splits`` is an ordered (name, weight) sequence; buckets
    [0, sum(weights)) are assigned to splits in order, so ("train", 80),
    ("val", 10), ("test", 10) puts bucket<80 in train, 80-89 in val,
    90-99 in test.
    """
    bounds, total = _bounds(splits)
    h = F.aggregate(
        F.split(F.col(key_col).cast("string"), ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * _B + F.coalesce(F.ascii(c), F.lit(0))) % _M)
    bucket = (h % total).cast("int")
    # assemble the WHEN chain so the lowest bound is checked first
    label = F.lit(None).cast("string")
    for name, hi in reversed(bounds):
        label = F.when(bucket < hi, F.lit(name)).otherwise(label)
    return df.withColumn("bucket", bucket).withColumn("split", label)


def hash_split_sql(table: str = "documents", key_col: str = "doc_id",
                   splits: Sequence[Tuple[str, int]] = DEFAULT_SPLITS,
                   columns: str = "*") -> str:
    bounds, total = _bounds(splits)
    case = "CASE " + " ".join(
        f"WHEN bucket < {hi} THEN '{name}'" for name, hi in bounds) + " END"
    return f"""
WITH h AS (
  SELECT {columns},
         CAST(list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(generate_series(1, length(CAST({key_col} AS VARCHAR))),
                            j -> CAST(ascii(substr(CAST({key_col} AS VARCHAR), j, 1)) AS BIGINT))),
           (acc, c) -> (acc * {_B} + c) % {_M}) % {total} AS INT) AS bucket
  FROM {table}
)
SELECT *, {case} AS split FROM h
"""
