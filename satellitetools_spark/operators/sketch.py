"""Distinct-count sketching: K-minimum-values (KMV) estimator.

The HLL-role operator for vocabulary / key-cardinality estimation in a
training-data pipeline (vocab sizing, join-key cardinality for plan
choice, dedup-rate monitoring). KMV keeps the k smallest distinct hash
values of a key stream; if the k-th smallest is h_k over a hash space of
size M, the distinct count is estimated as (k-1) * M / h_k (the order-
statistics estimator of Bar-Yossef et al., relative error ~ 1/sqrt(k)).

Unlike engine-native ``approx_count_distinct`` (whose HLL++ registers
are implementation-defined and cannot be reproduced by an oracle), the
hash here is the repo's portable polynomial (131, 1e9+7) char fold — so
a DuckDB twin computes the bit-identical sketch, estimate and all, and
the correctness gate covers an *approximate* operator exactly.

Distributed shape: explode → hash → hash-aggregate on the hash value.
The map-side partial dedup means the shuffle carries per-partition
DISTINCT hashes only (each partition's stream collapses to its local
sketch-superset), then ``ORDER BY h LIMIT k`` compiles to
TakeOrderedAndProject — per-partition top-k heaps merged on the driver
at k·P rows, never a global sort. The exact distinct count rides along
in the same plan for gate-time error accounting; production callers
drop that column and with it the only vocabulary-cardinality
aggregation state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import _M, portable_hash, portable_hash_sql

_B = 131


def _mix(h):
    """Nonlinear post-mix for order-statistics use: the raw polynomial
    fold maps strings differing only in the last char to CONSECUTIVE
    values (the fold's last step adds the char code), which clumps the
    low order statistics and biases the KMV estimator ~4x. Squaring mod
    p spreads consecutive inputs by ~2h ≈ the full hash space. All
    intermediates stay < 2^63 (h < 1e9+7, h² < 1e18), so Spark long and
    DuckDB BIGINT compute it bit-identically."""
    return ((h * h) % _M * _B + h) % _M


def _mix_sql(expr: str) -> str:
    h = f"CAST({expr} AS BIGINT)"
    return f"(({h} * {h}) % {_M} * {_B} + {h}) % {_M}"


def kmv_distinct(docs: DataFrame, k: int = 256,
                 text_col: str = "text") -> DataFrame:
    """One-row KMV distinct-token estimate over a document corpus:
    ``(k, n_kept, kth_hash, est_distinct, exact_distinct)``.

    ``n_kept < k`` means the stream had fewer than k distinct hashes —
    the sketch then IS the exact distinct set and the estimate degrades
    to the exact count (the standard small-cardinality escape).
    """
    if k < 2:
        raise ValueError("kmv_distinct: k must be >= 2")
    toks = F.regexp_extract_all(F.lower(F.col(text_col)),
                                F.lit("[a-z0-9]+"), 0)
    # exact_distinct counts DISTINCT TOKENS, not distinct hash values:
    # at ~1e6-token vocabularies the 1e9+7 hash space already expects
    # hundreds of collisions (n²/2M), so a distinct-hash count silently
    # undercounts the true cardinality the column claims to report
    ts = docs.select(F.explode(toks).alias("token")).distinct()
    hs = (ts.select(_mix(portable_hash(F.col("token"))).alias("h"))
          .distinct())
    kmin = hs.select("h").orderBy("h").limit(k)
    sketch = kmin.agg(
        F.count("*").alias("n_kept"), F.max("h").alias("kth_hash"))
    exact = ts.agg(F.count("*").alias("exact_distinct"))
    return (sketch.crossJoin(F.broadcast(exact))
            .select(F.lit(k).alias("k"), "n_kept", "kth_hash",
                    F.round(F.when(F.col("n_kept") < k,
                                   F.col("n_kept").cast("double"))
                            .otherwise((F.lit(float(k - 1)) * F.lit(float(_M)))
                                       / F.col("kth_hash")), 6)
                    .alias("est_distinct"),
                    "exact_distinct"))


def kmv_distinct_sql(table: str = "documents", k: int = 256,
                     text_col: str = "text") -> str:
    """DuckDB oracle: the bit-identical sketch and estimator."""
    return f"""
WITH ktoks AS (
  SELECT unnest(regexp_extract_all(lower({text_col}), '[a-z0-9]+')) AS token
  FROM {table}
),
kts AS (SELECT DISTINCT token FROM ktoks),
kraw AS (SELECT {portable_hash_sql('token')} AS h0 FROM kts),
khs AS (SELECT DISTINCT {_mix_sql('h0')} AS h FROM kraw),
kmin AS (SELECT h FROM khs ORDER BY h LIMIT {k}),
sk AS (SELECT COUNT(*) AS n_kept, MAX(h) AS kth_hash FROM kmin)
SELECT {k} AS k, n_kept, kth_hash,
       ROUND(CASE WHEN n_kept < {k} THEN CAST(n_kept AS DOUBLE)
             ELSE {float(k - 1)!r} * {float(_M)!r} / kth_hash END,
             6) AS est_distinct,
       (SELECT COUNT(*) FROM kts) AS exact_distinct
FROM sk
"""


def kmv_distinct_by(docs: DataFrame, group_col: str = "lang",
                    k: int = 64, text_col: str = "text") -> DataFrame:
    """Per-group KMV sketches: one row per group with the k-minimum-value
    estimate and the exact distinct count — vocabulary size per
    language/source in a single pass. Demonstrates the property that
    makes KMV the right scale sketch: per-group state is k values,
    mergeable by union+truncate, so a 10^12-token corpus reduces to
    groups × k longs.

    Shape: explode → hash → DISTINCT (group, hash) with map-side partial
    dedup, then a per-group k-min via ranked window over the distinct
    set (group-vocabulary cardinality, ≪ token stream) and one hash agg
    at group cardinality.
    """
    from pyspark.sql import Window
    if k < 2:
        raise ValueError("kmv_distinct_by: k must be >= 2")
    toks = F.regexp_extract_all(F.lower(F.col(text_col)),
                                F.lit("[a-z0-9]+"), 0)
    # distinct (group, token) first: exact_distinct must count tokens,
    # not hash values (hash collisions undercount the true cardinality)
    ts = (docs.select(F.col(group_col).alias("grp"),
                      F.explode(toks).alias("token"))
          .distinct())
    hs = (ts.select("grp", _mix(portable_hash(F.col("token"))).alias("h"))
          .distinct())
    w = Window.partitionBy("grp").orderBy("h")
    kmin = hs.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k)
    sk = kmin.groupBy("grp").agg(F.count("*").alias("n_kept"),
                                 F.max("h").alias("kth_hash"))
    exact = ts.groupBy("grp").agg(F.count("*").alias("exact_distinct"))
    return (sk.join(exact, "grp")
            .select(F.col("grp").alias(group_col), F.lit(k).alias("k"),
                    "n_kept", "kth_hash",
                    F.round(F.when(F.col("n_kept") < k,
                                   F.col("n_kept").cast("double"))
                            .otherwise((F.lit(float(k - 1)) * F.lit(float(_M)))
                                       / F.col("kth_hash")), 6)
                    .alias("est_distinct"),
                    "exact_distinct"))


def kmv_distinct_by_sql(table: str = "documents", group_col: str = "lang",
                        k: int = 64, text_col: str = "text") -> str:
    """DuckDB oracle: bit-identical per-group sketch and estimator."""
    return f"""
WITH gtoks AS (
  SELECT {group_col} AS grp,
         unnest(regexp_extract_all(lower({text_col}), '[a-z0-9]+')) AS token
  FROM {table}
),
gts AS (SELECT DISTINCT grp, token FROM gtoks),
graw AS (SELECT grp, {portable_hash_sql('token')} AS h0 FROM gts),
ghs AS (SELECT DISTINCT grp, {_mix_sql('h0')} AS h FROM graw),
gkmin AS (
  SELECT grp, h, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rn
  FROM ghs
),
gsk AS (SELECT grp, COUNT(*) AS n_kept, MAX(h) AS kth_hash
        FROM gkmin WHERE rn <= {k} GROUP BY grp),
gex AS (SELECT grp, COUNT(*) AS exact_distinct FROM gts GROUP BY grp)
SELECT grp AS {group_col}, {k} AS k, n_kept, kth_hash,
       ROUND(CASE WHEN n_kept < {k} THEN CAST(n_kept AS DOUBLE)
             ELSE {0.0 + (k - 1)!r} * {1000000007.0!r} / kth_hash END,
             6) AS est_distinct,
       exact_distinct
FROM gsk JOIN gex USING (grp)
"""


def kmv_distinct_keys(df: DataFrame, group_col: str, key_col: str,
                      k: int = 64) -> DataFrame:
    """Per-group KMV over an arbitrary KEY column (distinct users per
    day, distinct sessions per tile, …) — :func:`kmv_distinct_by`
    without the tokenizer: the sketch input is ``key_col`` cast to
    string and hashed with the same mixed portable fold, so any keyed
    stream gets mergeable groups × k distinct-count state.

    Same shape: DISTINCT (group, hash) with map-side partial dedup,
    ranked window at group-key cardinality, one agg at group
    cardinality; exact count alongside for error accounting.
    """
    from pyspark.sql import Window
    if k < 2:
        raise ValueError("kmv_distinct_keys: k must be >= 2")
    ts = (df.select(F.col(group_col).alias("grp"),
                    F.col(key_col).cast("string").alias("key"))
          .distinct())
    hs = (ts.select("grp", _mix(portable_hash(F.col("key"))).alias("h"))
          .distinct())
    w = Window.partitionBy("grp").orderBy("h")
    kmin = hs.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k)
    sk = kmin.groupBy("grp").agg(F.count("*").alias("n_kept"),
                                 F.max("h").alias("kth_hash"))
    exact = ts.groupBy("grp").agg(F.count("*").alias("exact_distinct"))
    return (sk.join(exact, "grp")
            .select(F.col("grp").alias(group_col), F.lit(k).alias("k"),
                    "n_kept", "kth_hash",
                    F.round(F.when(F.col("n_kept") < k,
                                   F.col("n_kept").cast("double"))
                            .otherwise((F.lit(float(k - 1)) * F.lit(float(_M)))
                                       / F.col("kth_hash")), 6)
                    .alias("est_distinct"),
                    "exact_distinct"))


def kmv_distinct_keys_sql(source_sql: str, group_col: str, key_col: str,
                          k: int = 64) -> str:
    """DuckDB oracle: bit-identical generic-key sketch."""
    return f"""
WITH ksrc AS ({source_sql}),
kkts AS (SELECT DISTINCT {group_col} AS grp,
                CAST({key_col} AS VARCHAR) AS key
         FROM ksrc),
kkraw AS (SELECT grp, {portable_hash_sql('key')} AS h0 FROM kkts),
kkhs AS (SELECT DISTINCT grp, {_mix_sql('h0')} AS h FROM kkraw),
kkmin AS (
  SELECT grp, h, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rn
  FROM kkhs
),
kksk AS (SELECT grp, COUNT(*) AS n_kept, MAX(h) AS kth_hash
         FROM kkmin WHERE rn <= {k} GROUP BY grp),
kkex AS (SELECT grp, COUNT(*) AS exact_distinct FROM kkts GROUP BY grp)
SELECT grp AS {group_col}, {k} AS k, n_kept, kth_hash,
       ROUND(CASE WHEN n_kept < {k} THEN CAST(n_kept AS DOUBLE)
             ELSE {0.0 + (k - 1)!r} * {1000000007.0!r} / kth_hash END,
             6) AS est_distinct,
       exact_distinct
FROM kksk JOIN kkex USING (grp)
"""
