"""Interleaved-document source: span explode, parse, re-assembly.

The scan target is the driver-mandated table shape
``(doc_id string, spans array<struct<kind,text,media_ref,offset>>)``.
The per-row invariant is *span-sequence equality*: after any engine
round-trip, each document must reassemble to the same (kind, text,
media_ref) sequence in offset order (W4 in SURVEY §2.5).

Everything here is declarative DataFrame API so Catalyst can prune columns
and push ``kind``/``media_ref`` predicates into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SPAN_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("kind", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("offset", T.IntegerType()),
]))

# scene-metadata text span (reference Sentinel2Metadata, sentinel2.py:306-379)
SCENE_META_SCHEMA = T.StructType([
    T.StructField("type", T.StringType()),
    T.StructField("productid", T.StringType()),
    T.StructField("assetid", T.StringType()),
    T.StructField("tileid", T.StringType()),
    T.StructField("acquisition_time", T.StringType()),
    T.StructField("projection", T.StringType()),
    T.StructField("datasource", T.StringType()),
    T.StructField("processing", T.StringType()),
    T.StructField("sun_azimuth", T.DoubleType()),
    T.StructField("sun_zenith", T.DoubleType()),
    T.StructField("view_azimuth", T.DoubleType()),
    T.StructField("view_zenith", T.DoubleType()),
])


def read_documents(spark: SparkSession, path: str) -> DataFrame:
    """Scan the document table (parquet layout stands in for Iceberg; the
    scan + pruning semantics are identical for this engine's purposes)."""
    return spark.read.parquet(path)


def explode_spans(docs: DataFrame) -> DataFrame:
    """Long span table: (doc_id, kind, text, media_ref, offset)."""
    s = docs.select("doc_id", F.explode("spans").alias("s"))
    return s.select(
        "doc_id", "s.kind", "s.text", "s.media_ref", "s.offset",
    )


def reassemble_documents(spans: DataFrame) -> DataFrame:
    """Rebuild (doc_id, spans) from the long table, in offset order.

    ``array_sort`` on structs with ``offset`` first restores span order
    without a window shuffle-sort per document.
    """
    packed = spans.select(
        "doc_id",
        F.struct("offset", "kind", "text", "media_ref").alias("os"),
    )
    return (
        packed.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("os")).alias("ordered"))
        .select(
            "doc_id",
            F.transform(
                "ordered",
                lambda o: F.struct(
                    o["kind"].alias("kind"),
                    o["text"].alias("text"),
                    o["media_ref"].alias("media_ref"),
                    o["offset"].alias("offset"),
                ),
            ).alias("spans"),
        )
    )


def doc_dimension(docs: DataFrame) -> DataFrame:
    """Per-document dimension row parsed from the text spans.

    Columns: scene metadata (typed), AOI name + geometry JSON + grid params.
    One hash-agg over the tiny text spans; media spans are never touched
    (column/row pruning keeps them out of this scan).
    """
    txt = explode_spans(docs).filter(F.col("kind") == "text")
    meta = F.from_json("text", SCENE_META_SCHEMA).alias("m")
    parsed = txt.select(
        "doc_id",
        meta,
        F.get_json_object("text", "$.type").alias("jtype"),
        F.get_json_object("text", "$.name").alias("aoi_name"),
        F.get_json_object("text", "$.geometry").alias("aoi_geometry"),
        F.get_json_object("text", "$.utm_zone").alias("utm_zone"),
        F.get_json_object("text", "$.target_gsd").alias("target_gsd"),
        F.get_json_object("text", "$.qi_evaluation_scale").alias("qi_scale"),
    )
    scene_cols = [f.name for f in SCENE_META_SCHEMA.fields if f.name != "type"]
    agg = [
        F.first(F.when(F.col("jtype") == "scene_meta", F.col(f"m.{c}")),
                ignorenulls=True).alias(c)
        for c in scene_cols
    ] + [
        F.first(F.when(F.col("jtype") == "aoi", F.col(c)), ignorenulls=True).alias(c)
        for c in ["aoi_name", "aoi_geometry", "utm_zone", "target_gsd", "qi_scale"]
    ]
    dim = parsed.groupBy("doc_id").agg(*agg)
    return dim.select(
        "doc_id",
        F.col("aoi_name").alias("aoi"),
        "aoi_geometry",
        F.col("utm_zone").cast("int").alias("utm_zone"),
        F.col("target_gsd").cast("double").alias("target_gsd"),
        F.col("qi_scale").cast("double").alias("qi_scale"),
        "productid", "assetid", "tileid",
        F.to_timestamp("acquisition_time").alias("acquisition_time"),
        "projection", "datasource", "processing",
        "sun_azimuth", "sun_zenith", "view_azimuth", "view_zenith",
    )
