"""Per-partition lineage + metrics and exact resume (Axis B).

Design: a materializing run appends the pixel output to parquet, then
derives a lineage table *from the committed output* — one row per document
with its row count and the output file that holds it (``input_file_name``,
i.e. the physical partition attribution). Deriving lineage from what
actually landed (rather than from in-flight task counters) makes resume
exact even across task retries and speculative execution: a document is
"done" iff its rows are readable in the output.

Resume = anti-join the input's doc_ids against the union of completed
doc_ids across prior runs — exactly-once at document granularity,
idempotent with append-mode parquet (the Iceberg snapshot/MERGE analog in
this environment). The lineage scan is a metadata-light aggregate over the
freshly written files.
"""

from __future__ import annotations

import os
import time
import uuid
from typing import Callable, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_with_lineage(pixels: DataFrame, out_dir: str, lineage_dir: str,
                       run_id: str | None = None,
                       attempted: DataFrame | None = None) -> str:
    """Append ``pixels`` to parquet and record per-document lineage.

    Lineage columns: run_id, doc_id, n_rows, file (physical attribution),
    finished_at. Returns the run_id.

    ``attempted`` (a ``doc_id`` DataFrame) is the set of documents this run
    covered. Docs that legitimately emit zero rows (e.g. every scene failed
    the QI filter — a deterministic outcome) still get a lineage row with
    ``n_rows = 0``; otherwise resume would re-decode them on every run.
    Lineage is appended only after the output write action commits, so a
    mid-run crash leaves no lineage and the whole run is redone — safe,
    because the parquet job committer publishes files atomically at job
    commit (no partial output is visible to readers).
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    spark = pixels.sparkSession

    before = set()
    if os.path.exists(out_dir):
        before = {f for f in os.listdir(out_dir) if f.endswith(".parquet")}

    pixels.write.mode("append").parquet(out_dir)

    new_files = [
        os.path.join(out_dir, f) for f in os.listdir(out_dir)
        if f.endswith(".parquet") and f not in before
    ]
    if new_files:
        written = spark.read.parquet(*new_files)
        per_doc = (
            written.groupBy("doc_id", F.input_file_name().alias("file"))
            .agg(F.count("*").alias("n_rows"))
        )
    else:
        per_doc = spark.createDataFrame(
            [], "doc_id string, file string, n_rows long")
    if attempted is not None:
        per_doc = (
            attempted.select("doc_id").distinct()
            .join(per_doc, "doc_id", "left_outer")
            .select("doc_id", "file",
                    F.coalesce("n_rows", F.lit(0)).alias("n_rows"))
        )
    lin = per_doc.select(
        F.lit(run_id).alias("run_id"),
        "doc_id", "n_rows", "file",
        F.lit(time.time()).alias("finished_at"),
    )
    lin.write.mode("append").parquet(lineage_dir)
    return run_id


def completed_doc_ids(spark: SparkSession, lineage_dir: str) -> DataFrame:
    if not os.path.exists(lineage_dir):
        return spark.createDataFrame([], "doc_id string")
    return spark.read.parquet(lineage_dir).select("doc_id").distinct()


def resume_filter(docs: DataFrame, lineage_dir: str) -> DataFrame:
    """Exact resume: drop documents already completed in prior runs."""
    done = completed_doc_ids(docs.sparkSession, lineage_dir)
    return docs.join(done, "doc_id", "left_anti")


def run_resumable(docs: DataFrame,
                  build_pixels: Callable[[DataFrame], DataFrame],
                  out_dir: str, lineage_dir: str) -> Tuple[str, int]:
    """Resumable materialization: filter completed docs, build, write with
    lineage. ``build_pixels(docs) -> DataFrame`` is the pipeline body.
    Returns (run_id, n_docs_processed_this_run)."""
    todo = resume_filter(docs, lineage_dir)
    n = todo.count()
    if n == 0:
        return ("noop", 0)
    pixels = build_pixels(todo)
    rid = write_with_lineage(pixels, out_dir, lineage_dir, attempted=todo)
    return (rid, n)
