"""Distributed prefix sums over a total order — the scale-safe
replacement for ``Window.orderBy(...)`` with no partition spec, which
Spark executes by moving EVERY row to a single partition ("Moving all
data to a single partition" warning; one task owns the whole table).

The rank/midrank/ECDF family (roc_auc, cumulative_gains,
average_precision, Mann-Whitney/Kruskal-Wallis midranks, KS CDFs,
Wilcoxon, Mood's median) reduces the fact stream to a distinct-value
histogram first, so the ordered cumulative pass runs at ALPHABET
cardinality. For binned/quantized scores that table is tiny and a
single-partition window would be harmless — but for a CONTINUOUS score
column at 10^12 rows the alphabet approaches the row count and the
cumsum single-threads. This module removes that cliff: same outputs,
bounded per-task work at any alphabet size.

Shape (two-level scan, the same checkpoint-pinned scheme as
``sampling.global_row_number``):

1. ``repartitionByRange`` + ``sortWithinPartitions`` on the order keys
   (ONE wide op), pinned with a lazy ``localCheckpoint`` so every
   consumer sees identical partitions (no reliance on exchange reuse).
2. Per-range-partition partial sums — #partitions rows, NOT data rows —
   are collected to the driver and turned into literal per-partition
   offsets (driver traffic O(partitions × columns), independent of row
   count).
3. The running sum is then a per-partition window (partitioned by the
   stamped range-partition id — bounded task state) plus the literal
   offset: a map-side projection.

Exactness: all call sites sum COUNT columns (doubles holding integers),
so regrouping the additions is bit-exact up to 2^53 — outputs are
IDENTICAL to the single-partition window, not merely close. Callers
summing arbitrary floats should expect last-ulp differences from the
re-association and round their outputs (every gate operator does).
"""

from __future__ import annotations

import decimal
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def prefix_sums(df: DataFrame, order_by: Sequence[Column],
                sum_cols: Sequence[str],
                num_partitions: int = None,
                prefix: str = "cum_",
                return_totals: bool = False,
                lead_of: str = None,
                with_index: bool = False):
    """Append inclusive running sums ``<prefix><col>`` of each
    ``sum_cols`` entry in the total order ``order_by``.

    ``order_by`` must be a total order over the rows (the histogram
    scaffolds order by the distinct value itself, which is unique by
    construction); with ties, rows within a tie group receive
    frame-order-dependent intermediate sums exactly like the window
    form. Exclusive ("rows below") variants are the inclusive sum minus
    the row's own value — exact for count data.

    With ``return_totals=True`` also returns ``{col: grand_total}``
    (already known driver-side from the partials — no extra scan),
    replacing the whole-frame ``Window.partitionBy()`` total, which
    funnels every row through one partition too.

    ``lead_of="v"`` additionally appends ``lead_v`` — the next row's
    value in the global order (NULL on the last row), the distributed
    form of ``LEAD(v) OVER (ORDER BY v)``. Only supported when the
    order is a single ASCENDING column equal to ``lead_of`` (the
    alphabet-histogram case): per-partition leads come from the
    bounded window and each partition's LAST row takes the next
    non-empty partition's minimum, collected with the same partials.

    ``with_index=True`` appends ``_idx`` — the 1-based global rank in
    the total order (``ROW_NUMBER() OVER (ORDER BY ...)``), from the
    same per-partition counts, and puts the grand row count under
    ``"_count"`` in the totals dict.

    DECIMAL sum columns keep exact ``decimal.Decimal`` offsets (no
    float round-trip), preserving the engine's decimal-exact
    cumulative contracts (ABC/Pareto, Gini).
    """
    spark = df.sparkSession
    n = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = (df.repartitionByRange(n, *order_by)
                .sortWithinPartitions(*order_by)
                .withColumn("_pspid", F.spark_partition_id())
                .localCheckpoint(eager=False))
    aggs = [F.sum(c).alias(c) for c in sum_cols]
    if lead_of is not None:
        aggs.append(F.min(lead_of).alias("_head"))
    if with_index:
        aggs.append(F.count("*").alias("_cnt"))
    partials = ranged.groupBy("_pspid").agg(*aggs).collect()
    pmap = {int(r["_pspid"]): r for r in partials}
    w = (Window.partitionBy("_pspid").orderBy(*order_by)
         .rowsBetween(Window.unboundedPreceding, 0))
    out = ranged
    grand = {}
    for c in sum_cols:
        vals = [pmap[i][c] for i in sorted(pmap)
                if pmap[i][c] is not None]
        is_dec = bool(vals) and isinstance(vals[0], decimal.Decimal)
        acc = decimal.Decimal(0) if is_dec else 0.0
        offs = []
        for i in range(n):
            offs.append(acc)
            r = pmap.get(i)
            if r is not None and r[c] is not None:
                acc += r[c] if is_dec else float(r[c])
        grand[c] = acc
        off = F.element_at(
            F.array(*[F.lit(o) for o in offs]),
            F.col("_pspid").cast("int") + 1)
        out = out.withColumn(prefix + c, F.sum(c).over(w) + off)
    if with_index:
        acc, offs = 0, []
        for i in range(n):
            offs.append(acc)
            r = pmap.get(i)
            if r is not None:
                acc += int(r["_cnt"])
        grand["_count"] = acc
        ioff = F.element_at(
            F.array(*[F.lit(int(o)).cast("long") for o in offs]),
            F.col("_pspid").cast("int") + 1)
        wrn = Window.partitionBy("_pspid").orderBy(*order_by)
        out = out.withColumn(
            "_idx", (F.row_number().over(wrn).cast("long") + ioff))
    if lead_of is not None:
        # next-partition heads as a driver literal: heads[pid] = the
        # min of lead_of over the first NON-EMPTY partition after pid
        heads = [None] * n
        nxt = None
        for i in range(n - 1, -1, -1):
            heads[i] = nxt
            r = pmap.get(i)
            if r is not None and r["_head"] is not None:
                nxt = r["_head"]
        head_arr = F.array(*[F.lit(h).cast("double") for h in heads])
        wl = Window.partitionBy("_pspid").orderBy(*order_by)
        out = out.withColumn(
            "lead_" + lead_of,
            F.coalesce(F.lead(lead_of).over(wl),
                       F.element_at(head_arr,
                                    F.col("_pspid").cast("int") + 1)))
    out = out.drop("_pspid")
    return (out, grand) if return_totals else out


def grouped_prefix_sums(df: DataFrame, group_cols: Sequence[str],
                        order_by: Sequence[Column],
                        sum_cols: Sequence[str],
                        num_partitions: int = None,
                        prefix: str = "cum_",
                        totals_prefix: str = "tot_",
                        with_index: bool = False) -> DataFrame:
    """Per-group running sums in a per-group total order, plus the
    per-group grand totals — the two-level form of
    ``SUM(c) OVER (PARTITION BY g ORDER BY ...)`` +
    ``SUM(c) OVER (PARTITION BY g)`` for the FEW-GROUPS × HUGE-ALPHABET
    regime (per-event-type value histograms), where the plain
    group-partitioned window single-threads each group.

    Shape: range partition on (group, order) so each group's rows are
    contiguous across partitions; the per-(partition, group) partials
    (≤ partitions + groups − 1 rows, since each partition holds a
    contiguous slice) come back to the driver, turn into a broadcast
    offsets/totals table, and rejoin null-safely. With MANY small
    groups the ordinary ``Window.partitionBy(g)`` is already parallel
    and should be used instead — the partials collect is the
    constraint, not the scan.

    Count columns stay bit-exact (integer doubles); see
    :func:`prefix_sums` for the general fp note. ``with_index=True``
    appends ``_idx`` — the 1-based rank WITHIN the group in the given
    order (``ROW_NUMBER() OVER (PARTITION BY g ORDER BY ...)``), from
    the same partials.
    """
    spark = df.sparkSession
    n = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions"))
    gsort = [F.col(c).asc() for c in group_cols]
    ranged = (df.repartitionByRange(n, *(gsort + list(order_by)))
                .sortWithinPartitions(*(gsort + list(order_by)))
                .withColumn("_pspid", F.spark_partition_id())
                .localCheckpoint(eager=False))
    paggs = [F.sum(c).alias(c) for c in sum_cols]
    if with_index:
        paggs.append(F.count("*").alias("_gcnt"))
    partials = (ranged.groupBy("_pspid", *group_cols)
                .agg(*paggs).collect())
    # per-group running offsets in pid order + per-group grand totals
    acc: dict = {}
    iacc: dict = {}
    off_rows = []
    for r in sorted(partials, key=lambda r: int(r["_pspid"])):
        key = tuple(r[c] for c in group_cols)
        cur = acc.setdefault(key, {c: 0.0 for c in sum_cols})
        row = [int(r["_pspid"]), *key, *[cur[c] for c in sum_cols]]
        if with_index:
            row.append(int(iacc.get(key, 0)))
            iacc[key] = iacc.get(key, 0) + int(r["_gcnt"])
        off_rows.append(tuple(row))
        for c in sum_cols:
            if r[c] is not None:
                cur[c] += float(r[c])
    from pyspark.sql import types as T
    gfields = [ranged.schema[c] for c in group_cols]
    off_schema = T.StructType(
        [T.StructField("_pspid", T.IntegerType())] + gfields
        + [T.StructField("_off_" + c, T.DoubleType())
           for c in sum_cols]
        + ([T.StructField("_ioff", T.LongType())] if with_index
           else []))
    off_df = spark.createDataFrame(off_rows, off_schema)
    tot_rows = [(*key, *[v[c] for c in sum_cols])
                for key, v in acc.items()]
    tot_schema = T.StructType(
        gfields + [T.StructField(totals_prefix + c, T.DoubleType())
                   for c in sum_cols])
    tot_df = spark.createDataFrame(tot_rows, tot_schema)

    def _nullsafe(a: DataFrame, b: DataFrame, cols):
        cond = None
        for c in cols:
            eq = a[c].eqNullSafe(b[c])
            cond = eq if cond is None else (cond & eq)
        return cond

    joined = ranged.join(
        F.broadcast(off_df),
        (ranged["_pspid"] == off_df["_pspid"])
        & _nullsafe(ranged, off_df, group_cols), "inner")
    out = joined.select(
        *[ranged[c] for c in df.columns], ranged["_pspid"],
        *[off_df["_off_" + c] for c in sum_cols],
        *([off_df["_ioff"]] if with_index else []))
    w = (Window.partitionBy("_pspid", *group_cols).orderBy(*order_by)
         .rowsBetween(Window.unboundedPreceding, 0))
    for c in sum_cols:
        out = out.withColumn(prefix + c,
                             F.sum(c).over(w) + F.col("_off_" + c))
    if with_index:
        wrn = Window.partitionBy("_pspid", *group_cols).orderBy(
            *order_by)
        out = (out.withColumn(
            "_idx", F.row_number().over(wrn).cast("long")
            + F.col("_ioff")).drop("_ioff"))
    out = out.drop("_pspid", *["_off_" + c for c in sum_cols])
    out = out.join(F.broadcast(tot_df),
                   _nullsafe(out, tot_df, group_cols), "inner").select(
        *[out[c] for c in out.columns if c in df.columns
          or c.startswith(prefix) or c == "_idx"],
        *[tot_df[totals_prefix + c] for c in sum_cols])
    return out
