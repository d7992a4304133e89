"""Graph operators over pair tables (duplicate graphs, link graphs):
PageRank as unrolled relational iterations.

Connected components live in ``operators/dedup`` (min-label
propagation); this module adds importance scoring over the same edge
shape — e.g. ranking the canonical representative inside a duplicate
cluster, or weighting documents by citation/link structure.

PageRank is iterative, but each iteration IS relational algebra:
contribution join + keyed sum. A fixed iteration count therefore stays
oracle-checkable (the DuckDB twin unrolls the same iterations as CTE
layers) — the usual convergence loop just re-applies the same step
until a delta threshold, which `pagerank`'s ``iters`` parameter models
with deterministic cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(pairs: DataFrame, iters: int = 3, damping: float = 0.85,
             src_col: str = "doc_a", dst_col: str = "doc_b") -> DataFrame:
    """PageRank over an UNDIRECTED pair table (each pair becomes two
    directed edges), ``iters`` fixed power iterations from the uniform
    start. Every node reachable from the pair table is ranked; since
    every node has degree ≥ 1 by construction there is no dangling-mass
    term.

    Shape per iteration: one join of the rank vector to the edge table
    (rank-vector side is node-cardinality), one hash aggregation on the
    destination — the canonical distributed PageRank step, 2·iters
    shuffles total plus the degree build. At web scale the edge table
    dwarfs the rank vector, so the join broadcasts the vector or
    co-partitions both sides on the node key; Catalyst picks broadcast
    automatically below the threshold (the dup-graph case).
    """
    edges = (pairs.select(F.col(src_col).alias("src"),
                          F.col(dst_col).alias("dst"))
             .unionByName(pairs.select(F.col(dst_col).alias("src"),
                                       F.col(src_col).alias("dst"))))
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    n_nodes = deg.agg(F.count("*").alias("n"))
    rank = (deg.crossJoin(F.broadcast(n_nodes))
               .select(F.col("src").alias("node"),
                       (F.lit(1.0) / F.col("n")).alias("pr")))
    for _ in range(iters):
        contrib = (edges
                   .join(rank.withColumnRenamed("node", "src"), "src")
                   .join(deg, "src")
                   .groupBy("dst")
                   .agg(F.sum(F.col("pr") / F.col("deg")).alias("m")))
        rank = (contrib.crossJoin(F.broadcast(n_nodes))
                .select(F.col("dst").alias("node"),
                        ((1.0 - damping) / F.col("n")
                         + damping * F.col("m")).alias("pr")))
    return rank.select("node", F.round("pr", 9).alias("pr"))


def pagerank_sql(pairs_sql: str, iters: int = 3, damping: float = 0.85,
                 src_col: str = "doc_a", dst_col: str = "doc_b") -> str:
    """DuckDB oracle: the identical iterations unrolled as CTE layers
    over any pair-producing subquery."""
    layers = []
    prev = "pr0"
    for i in range(1, iters + 1):
        layers.append(f"""
pr{i} AS (
  SELECT e.dst AS node,
         (1.0 - {damping!r}) / (SELECT n FROM nn)
         + {damping!r} * SUM(p.pr / d.deg) AS pr
  FROM edges e
  JOIN {prev} p ON p.node = e.src
  JOIN deg d ON d.src = e.src
  GROUP BY e.dst
)""")
        prev = f"pr{i}"
    layer_sql = ",".join(layers)
    return f"""
WITH prpairs AS ({pairs_sql}),
edges AS (
  SELECT {src_col} AS src, {dst_col} AS dst FROM prpairs
  UNION ALL
  SELECT {dst_col} AS src, {src_col} AS dst FROM prpairs
),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
nn AS (SELECT COUNT(*) AS n FROM deg),
pr0 AS (SELECT src AS node, 1.0 / (SELECT n FROM nn) AS pr FROM deg),
{layer_sql}
SELECT node, ROUND(pr, 9) AS pr FROM {prev}
"""
