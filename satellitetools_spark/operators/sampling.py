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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_B = 131
_M = 1_000_000_007
DEFAULT_SPLITS: Tuple[Tuple[str, int], ...] = (
    ("train", 80), ("val", 10), ("test", 10))


def portable_hash(col: Column) -> Column:
    """Polynomial (131, 1e9+7) char fold over a string key — the same
    portable hash the winnowing operator uses, NOT an engine hash, so
    DuckDB oracles compute bit-identical values."""
    return F.aggregate(
        F.split(col.cast("string"), ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * _B + F.coalesce(F.ascii(c), F.lit(0))) % _M)


def portable_hash_sql(expr: str) -> str:
    """DuckDB expression computing the identical char fold."""
    return f"""CAST(list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(generate_series(1, length(CAST({expr} AS VARCHAR))),
                            j -> CAST(ascii(substr(CAST({expr} AS VARCHAR), j, 1)) AS BIGINT))),
           (acc, c) -> (acc * {_B} + c) % {_M}) AS BIGINT)"""


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
    bucket = (portable_hash(F.col(key_col)) % total).cast("int")
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
         CAST({portable_hash_sql(key_col)} % {total} AS INT) AS bucket
  FROM {table}
)
SELECT *, {case} AS split FROM h
"""


def pack_sequences(docs: DataFrame, seq_len: int = 2048, n_shards: int = 64,
                   key_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Concat-and-chunk sequence packing (GPT-style pretraining batches).

    Documents are laid into ``n_shards`` independent token streams — shard
    chosen by the portable hash of the key, order within a shard by the key
    itself — and each stream is cut into ``seq_len``-token packs. A
    document is assigned the pack in which its first token lands
    (``pack_id = shard:floor(start_offset/seq_len)``) plus its offset
    within that pack, so a writer can materialize training sequences with
    a deterministic, partitioning-independent layout: re-running on a
    re-ingested or re-partitioned copy of the corpus yields bit-identical
    pack assignments.

    Scale shape: the only wide operation is one window sum partitioned by
    shard. With n_shards ≫ executors the per-shard sorts run fully
    parallel and each shard holds ~1/n_shards of the corpus — no global
    sort, no driver state. At 100 TB raise n_shards (it only changes the
    layout, not the semantics).
    """
    from pyspark.sql import Window

    toks = F.size(F.regexp_extract_all(F.col(text_col), F.lit("\\S+"), 0))
    base = docs.select(
        F.col(key_col),
        (portable_hash(F.col(key_col)) % n_shards).cast("int").alias("shard"),
        toks.alias("n_tokens"),
    )
    w = (Window.partitionBy("shard").orderBy(key_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    # materialize the window sum ONCE, then derive pack_id/pack_pos from
    # the alias — inlining `start` three times makes the Window operator
    # evaluate three identical frames
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    return base.withColumn("start_offset", start).select(
        key_col, "shard", "n_tokens", "start_offset",
        F.concat_ws(":", F.col("shard"),
                    F.floor(F.col("start_offset") / seq_len)).alias("pack_id"),
        (F.col("start_offset") % seq_len).alias("pack_pos"),
    )


def pack_sequences_sql_parts(table: str = "documents", seq_len: int = 2048,
                             n_shards: int = 64, key_col: str = "doc_id",
                             text_col: str = "text") -> tuple:
    """(CTE definitions, final SELECT) so callers can splice the packing
    stage into a larger WITH chain (the training-data pipeline oracle)."""
    ctes = f"""pack_base AS (
  SELECT {key_col},
         CAST({portable_hash_sql(key_col)} % {n_shards} AS INT) AS shard,
         CAST(len(regexp_extract_all({text_col}, '\\S+')) AS INT) AS n_tokens
  FROM {table}
),
pack_off AS (
  SELECT *,
         CAST(COALESCE(SUM(n_tokens) OVER (
           PARTITION BY shard ORDER BY {key_col}
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_offset
  FROM pack_base
)"""
    final = f"""SELECT {key_col}, shard, n_tokens, start_offset,
       shard || ':' || CAST(CAST(FLOOR(start_offset * 1.0 / {seq_len}) AS BIGINT) AS VARCHAR) AS pack_id,
       CAST(start_offset % {seq_len} AS BIGINT) AS pack_pos
FROM pack_off"""
    return ctes, final


def pack_sequences_sql(table: str = "documents", seq_len: int = 2048,
                       n_shards: int = 64, key_col: str = "doc_id",
                       text_col: str = "text") -> str:
    return f"""
WITH base AS (
  SELECT {key_col},
         CAST({portable_hash_sql(key_col)} % {n_shards} AS INT) AS shard,
         CAST(len(regexp_extract_all({text_col}, '\\S+')) AS INT) AS n_tokens
  FROM {table}
),
off AS (
  SELECT *,
         CAST(COALESCE(SUM(n_tokens) OVER (
           PARTITION BY shard ORDER BY {key_col}
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_offset
  FROM base
)
SELECT {key_col}, shard, n_tokens, start_offset,
       shard || ':' || CAST(CAST(FLOOR(start_offset * 1.0 / {seq_len}) AS BIGINT) AS VARCHAR) AS pack_id,
       CAST(start_offset % {seq_len} AS BIGINT) AS pack_pos
FROM off
"""
