"""Iceberg integration round-trip — auto-skips when the runtime jar is
absent (this sandbox ships none; the module is the production wiring the
north rule names, exercised wherever the jar exists).

When available: write the synthetic document table bucketed on doc_id,
read it back, and assert the per-row span-sequence invariant (kind,
text, media_ref, offset order) survives the round trip; then append a
second snapshot and assert the incremental read returns exactly the
appended rows.
"""

import pytest

from satellitetools_spark.sources import iceberg as I
from satellitetools_spark.sources.docs import read_documents


@pytest.fixture(scope="module")
def iceberg_spark(tmp_path_factory):
    wh = tmp_path_factory.mktemp("iceberg_wh").as_uri()
    from satellitetools_spark.session import get_spark
    probe = get_spark("iceberg-probe", master="local[2]",
                      shuffle_partitions=4)
    if not I.iceberg_available(probe):
        pytest.skip("iceberg-spark-runtime not on classpath")
    # catalog confs are session-fixed: need a fresh session
    probe.stop()
    spark = get_spark("iceberg-test", master="local[2]",
                      shuffle_partitions=4,
                      extra_conf=I.catalog_conf("it", warehouse=wh))
    yield spark
    spark.stop()


def _docs(spark):
    from satellitetools_spark.datagen import ensure_geodata
    import os
    return read_documents(
        spark, os.path.join(ensure_geodata("sf0.001"), "docs.parquet"))


def test_roundtrip_preserves_span_sequences(iceberg_spark):
    spark = iceberg_spark
    docs = _docs(spark)
    I.create_documents_table(docs, "it.db.docs", buckets=4)
    back = I.read_documents_table(spark, "it.db.docs")
    a = {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                       for s in r["spans"]] for r in docs.collect()}
    b = {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                       for s in r["spans"]] for r in back.collect()}
    assert a == b


def test_catalog_conf_pairs():
    conf = I.catalog_conf("prod", warehouse="s3a://bucket/wh",
                          catalog_type="glue")
    assert conf["spark.sql.catalog.prod"] == I.ICEBERG_CATALOG_IMPL
    assert conf["spark.sql.catalog.prod.type"] == "glue"
    assert conf["spark.sql.catalog.prod.warehouse"] == "s3a://bucket/wh"
    assert conf["spark.sql.extensions"] == I.ICEBERG_EXTENSIONS


def test_snapshot_and_incremental_read_options():
    assert I.snapshot_read_options() == {}
    assert I.snapshot_read_options(42) == {"snapshot-id": "42"}
    assert I.incremental_read_options(7) == {"start-snapshot-id": "7"}
    assert I.incremental_read_options(7, 9) == {
        "start-snapshot-id": "7", "end-snapshot-id": "9"}


def test_ddl_and_merge_parse_without_runtime(spark):
    """The generated DDL/MERGE must be syntactically valid Spark SQL —
    Spark's parser validates the bucket() hidden-partition transform and
    the MERGE UPDATE/INSERT * clauses without any Iceberg jar (execution
    would need the catalog; parsing does not)."""
    parser = spark._jsparkSession.sessionState().sqlParser()  # noqa: SLF001
    ddl = I.documents_table_ddl("cat.db.docs", buckets=64)
    assert "bucket(64, doc_id)" in ddl and "USING iceberg" in ddl
    parser.parsePlan(ddl)  # raises ParseException on bad syntax
    merge = I.merge_upsert_sql("cat.db.docs", "updates_view")
    assert "MERGE INTO" in merge and "t.doc_id = s.doc_id" in merge
    parser.parsePlan(merge)


def test_incremental_read_sees_only_appends(iceberg_spark):
    spark = iceberg_spark
    docs = _docs(spark)
    first, second = docs.limit(5), docs.orderBy("doc_id").limit(8).subtract(
        docs.limit(5))
    I.create_documents_table(first, "it.db.incr", buckets=2)
    snap = I.current_snapshot_id(spark, "it.db.incr")
    I.append_documents(second, "it.db.incr")
    delta = I.read_appends_between(spark, "it.db.incr", snap)
    assert (sorted(r["doc_id"] for r in delta.collect())
            == sorted(r["doc_id"] for r in second.collect()))
