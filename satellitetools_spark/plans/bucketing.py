"""Bucketed co-located joins — pre-shuffled storage for repeated equi-joins.

At 100 TB the dominant cost of the engine's recurring equi-joins (documents
↔ QI survivors on ``doc_id``, documents ↔ DEM/metadata dimensions on the
join key) is shuffling the fact side — every join repays the full
hash-partition exchange. Spark's native bucketing moves that exchange to
WRITE time: ``bucketBy(n, key)`` hash-partitions rows into a fixed number
of buckets per output partition, and an equi-join between two tables
bucketed on the join key with compatible bucket counts (equal, or one a
divisor of the other with ``spark.sql.bucketing.coalesceBucketsInJoin``)
runs as a sort-merge join with ZERO Exchange on either side. ``sortBy``
additionally pre-sorts within buckets so the SMJ skips its per-task sort.

One write, many shuffle-free reads — the right trade for tables joined more
than once, which is exactly the doc-keyed shape of this engine's pipeline.
Scale notes:

- bucket count is a LAYOUT property, independent of cluster size: pick it
  for target bucket-file size (128-512 MB). Combined with date
  partitioning, n_buckets ≈ daily_volume / 256 MB; readers of any
  parallelism get co-located joins, and a 1000-executor cluster schedules
  buckets as tasks.
- bucketing composes with partition pruning (``partitionBy`` date +
  ``bucketBy`` doc_id) — prune to dates, then join shuffle-free.
- this is the parquet-native analog of an Iceberg ``bucket(n, key)``
  partition transform with storage-partitioned joins; semantics carry over
  unchanged when the sink is an Iceberg catalog.
"""

from __future__ import annotations

from typing import Iterable, Optional

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int, path: Optional[str] = None,
                   sort_cols: Optional[Iterable[str]] = None,
                   mode: str = "overwrite") -> str:
    """Write ``df`` as a bucketed (and optionally bucket-sorted) table.

    ``path`` pins the storage location (object-store URI in production);
    the table is registered in the session catalog either way — bucketing
    metadata lives in the catalog, which is why ``saveAsTable`` is required
    (a bare ``parquet(path)`` write cannot record bucket spec).
    """
    w = df.write.mode(mode).format("parquet")
    if path:
        w = w.option("path", path)
    w = w.bucketBy(n_buckets, bucket_col)
    w = w.sortBy(*(sort_cols or [bucket_col]))
    w.saveAsTable(table)
    return table


def is_shuffle_free(df: DataFrame) -> bool:
    """True when the compiled physical plan contains no Exchange operator.

    The assertion surface for bucketed-join tests: a co-located SMJ between
    compatibly bucketed tables must compile with zero Exchange (inspected on
    the initial physical plan — AQE can only remove exchanges, never add)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan
