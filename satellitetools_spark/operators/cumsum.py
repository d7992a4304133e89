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
from pyspark.sql import types as T

# Above this partition count the per-row literal offset array
# (element_at(array(lit...), pid+1) — one N-wide array PER SUM COLUMN)
# bloats codegen; prefix_sums switches to ONE broadcast (pid → offsets)
# table joined map-side instead (r4 advisor). Both paths produce
# identical values (pinned in tests/test_cumsum.py).
LITERAL_OFFSET_MAX = 64


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
    pdf = ranged.groupBy("_pspid").agg(*aggs)
    pschema = pdf.schema
    partials = pdf.collect()
    pmap = {int(r["_pspid"]): r for r in partials}

    # Driver-side running offsets per partition (O(partitions) rows —
    # independent of data row count), one list per sum column.
    grand = {}
    off_lists = {}
    dec_cols = set()
    for c in sum_cols:
        # decimal detection by SCHEMA, not value sniffing: a partial
        # batch that is all-NULL must still accumulate as Decimal
        is_dec = isinstance(pschema[c].dataType, T.DecimalType)
        if is_dec:
            dec_cols.add(c)
        acc = decimal.Decimal(0) if is_dec else 0.0
        offs = []
        for i in range(n):
            offs.append(acc)
            r = pmap.get(i)
            if r is not None and r[c] is not None:
                acc += r[c] if is_dec else float(r[c])
        grand[c] = acc
        off_lists[c] = offs
    ioffs = None
    if with_index:
        acc, ioffs = 0, []
        for i in range(n):
            ioffs.append(acc)
            r = pmap.get(i)
            if r is not None:
                acc += int(r["_cnt"])
        grand["_count"] = acc
    heads = None
    if lead_of is not None:
        # next-partition heads: heads[pid] = the min of lead_of over
        # the first NON-EMPTY partition after pid
        heads = [None] * n
        nxt = None
        for i in range(n - 1, -1, -1):
            heads[i] = nxt
            r = pmap.get(i)
            if r is not None and r["_head"] is not None:
                nxt = r["_head"]

    # Offsets reach the rows one of two ways. SMALL n: per-row literal
    # arrays — zero extra operators, but each is an N-wide codegen
    # expression per column. LARGE n: ONE broadcast (pid → offsets)
    # table joined map-side (no shuffle; O(n) broadcast) — same
    # values, codegen stays flat at production partition counts.
    # Decimal offsets keep exact Decimal typing on BOTH paths (the
    # broadcast table reuses the partial-agg column types).
    use_join = n > LITERAL_OFFSET_MAX
    out = ranged
    if use_join:
        fields = [T.StructField("_pspid", T.IntegerType())]
        # offsets accumulate as Python floats for every non-Decimal
        # dtype (matching the literal path's F.lit(float) semantics —
        # long/int sums become double offsets there too), so the
        # broadcast column must be DoubleType for them; only Decimal
        # keeps its exact partial-agg type
        fields += [T.StructField(
            "_poff_" + c,
            pschema[c].dataType if c in dec_cols else T.DoubleType())
            for c in sum_cols]
        if with_index:
            fields.append(T.StructField("_pioff", T.LongType()))
        if lead_of is not None:
            fields.append(T.StructField("_phead", T.DoubleType()))
        rows = []
        for i in range(n):
            row = [i]
            row += [off_lists[c][i] for c in sum_cols]
            if with_index:
                row.append(int(ioffs[i]))
            if lead_of is not None:
                h = heads[i]
                row.append(None if h is None else float(h))
            rows.append(tuple(row))
        odf = spark.createDataFrame(rows, T.StructType(fields))
        out = out.join(F.broadcast(odf), "_pspid")
        off_cols = {c: F.col("_poff_" + c) for c in sum_cols}
        ioff_col = F.col("_pioff") if with_index else None
        head_col = (F.col("_phead") if lead_of is not None else None)
    else:
        off_cols = {
            c: F.element_at(
                F.array(*[F.lit(o) for o in off_lists[c]]),
                F.col("_pspid").cast("int") + 1)
            for c in sum_cols}
        ioff_col = (F.element_at(
            F.array(*[F.lit(int(o)).cast("long") for o in ioffs]),
            F.col("_pspid").cast("int") + 1) if with_index else None)
        head_col = (F.element_at(
            F.array(*[F.lit(h).cast("double") for h in heads]),
            F.col("_pspid").cast("int") + 1)
            if lead_of is not None else None)

    w = (Window.partitionBy("_pspid").orderBy(*order_by)
         .rowsBetween(Window.unboundedPreceding, 0))
    for c in sum_cols:
        out = out.withColumn(prefix + c, F.sum(c).over(w) + off_cols[c])
    if with_index:
        wrn = Window.partitionBy("_pspid").orderBy(*order_by)
        out = out.withColumn(
            "_idx", (F.row_number().over(wrn).cast("long") + ioff_col))
    if lead_of is not None:
        wl = Window.partitionBy("_pspid").orderBy(*order_by)
        out = out.withColumn(
            "lead_" + lead_of,
            F.coalesce(F.lead(lead_of).over(wl), head_col))
    drop = ["_pspid"]
    if use_join:
        drop += ["_poff_" + c for c in sum_cols]
        if with_index:
            drop.append("_pioff")
        if lead_of is not None:
            drop.append("_phead")
    out = out.drop(*drop)
    return (out, grand) if return_totals else out


def grouped_prefix_sums(df: DataFrame, group_cols: Sequence[str],
                        order_by: Sequence[Column],
                        sum_cols: Sequence[str],
                        num_partitions: int = None,
                        prefix: str = "cum_",
                        totals_prefix: str = "tot_",
                        with_index: bool = False,
                        many_groups_threshold: int = 100_000,
                        max_partials_rows: int = 2_000_000
                        ) -> DataFrame:
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

    SELF-GUARDING (r4 verdict #3): the two-level plan is only right in
    the few-groups × huge-alphabet regime — its partials collect and
    broadcast offsets table are O(partitions + groups). The function
    probes the group cardinality off the pinned range partition (one
    cheap approx agg, the same adaptive-split pattern as
    ``segment.rfm_segments``) and, above ``many_groups_threshold``
    (default 10⁵ — the two-level scan stays preferable as long as its
    O(partitions + groups) partials/broadcast stay cheap, because it
    bounds per-task state even when individual groups carry huge
    alphabets), falls back to the ordinary ``Window.partitionBy(g)``
    form — at that cardinality the window is parallel across groups
    and collect-free, so the fallback is the scale-correct plan.
    ``max_partials_rows`` is the independent override guard: a caller
    who RAISES ``many_groups_threshold`` past it (to force the
    two-level path) fails fast instead of attempting an unbounded
    driver collect — with the defaults it never fires, by design.
    Outputs are identical on both paths (pinned in
    tests/test_cumsum.py).

    Sum columns must NOT be DecimalType: the grouped offsets table is
    Double-typed, which would silently break decimal exactness (the
    ungrouped :func:`prefix_sums` DOES preserve Decimal — use it, or
    cast deliberately).
    """
    spark = df.sparkSession
    for c in sum_cols:
        if isinstance(df.schema[c].dataType, T.DecimalType):
            raise TypeError(
                f"grouped_prefix_sums: sum column {c!r} is "
                f"{df.schema[c].dataType.simpleString()}; grouped "
                "offsets are Double-typed and would lose decimal "
                "exactness. Cast explicitly or use prefix_sums "
                "(which preserves Decimal).")
    n = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions"))
    gsort = [F.col(c).asc() for c in group_cols]
    ranged = (df.repartitionByRange(n, *(gsort + list(order_by)))
                .sortWithinPartitions(*(gsort + list(order_by)))
                .withColumn("_pspid", F.spark_partition_id())
                .localCheckpoint(eager=False))
    n_groups = int(ranged.agg(F.approx_count_distinct(
        F.struct(*[F.col(c) for c in group_cols])).alias("g"))
        .collect()[0]["g"])
    if n_groups > many_groups_threshold:
        # MANY-GROUPS regime: plain per-group window over the pinned
        # checkpoint (df's lineage still computed once). Parallelism
        # comes from the group count itself; no driver collect at all.
        wcum = (Window.partitionBy(*group_cols).orderBy(*order_by)
                .rowsBetween(Window.unboundedPreceding, 0))
        wtot = Window.partitionBy(*group_cols)
        out = ranged.drop("_pspid")
        for c in sum_cols:
            out = out.withColumn(
                prefix + c, F.sum(F.col(c).cast("double")).over(wcum))
        if with_index:
            wrn = Window.partitionBy(*group_cols).orderBy(*order_by)
            out = out.withColumn(
                "_idx", F.row_number().over(wrn).cast("long"))
        for c in sum_cols:
            out = out.withColumn(
                totals_prefix + c,
                F.sum(F.col(c).cast("double")).over(wtot))
        return out
    if n + n_groups > max_partials_rows:
        raise RuntimeError(
            f"grouped_prefix_sums: partials table would hold about "
            f"{n + n_groups} rows (partitions={n}, groups~{n_groups})"
            f" > max_partials_rows={max_partials_rows}; refusing the "
            "driver collect. Lower many_groups_threshold so the "
            "window fallback engages, or raise max_partials_rows "
            "deliberately.")
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
