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
