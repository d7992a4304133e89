"""Bucketed co-located joins: zero-Exchange plan + result parity, and the
approximate-median scale path of the timeseries aggregation."""

import os

import pytest
from pyspark.sql import functions as F

from satellitetools_spark.plans.bucketing import is_shuffle_free, write_bucketed

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")


@pytest.fixture()
def no_broadcast(spark):
    """Force SMJ so the Exchange check exercises the bucketed path (a
    broadcast join is trivially exchange-free on the big side)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_is_shuffle_free_and_exact(spark, tmp_path, no_broadcast):
    docs = spark.read.parquet(os.path.join(TESTDATA, "documents.parquet"))
    dim = docs.select("doc_id", F.length("lang").cast("double").alias("w"))

    write_bucketed(docs, "b_docs", "doc_id", 4,
                   path=str(tmp_path / "b_docs"))
    write_bucketed(dim, "b_dim", "doc_id", 4,
                   path=str(tmp_path / "b_dim"))
    bj = (spark.table("b_docs").join(spark.table("b_dim"), "doc_id")
          .groupBy("lang").agg(F.count("*").alias("n"),
                               F.sum("w").alias("sw")))
    # bucketed tables: join needs no Exchange; the groupBy aggregation is
    # the plan's only shuffle — assert the join subtree itself compiles
    # exchange-free
    join_only = spark.table("b_docs").join(spark.table("b_dim"), "doc_id")
    assert is_shuffle_free(join_only), \
        join_only._jdf.queryExecution().executedPlan().toString()[:2000]

    want = {(r["lang"], r["n"], round(r["sw"], 6)) for r in
            docs.join(dim, "doc_id")
            .groupBy("lang").agg(F.count("*").alias("n"),
                                 F.sum("w").alias("sw")).collect()}
    got = {(r["lang"], r["n"], round(r["sw"], 6)) for r in bj.collect()}
    assert got == want and len(got) > 0


def test_unbucketed_join_needs_exchange(spark, tmp_path, no_broadcast):
    # control: the same join over plain parquet compiles WITH an Exchange —
    # proves the zero-Exchange assertion above is detecting bucketing, not
    # a vacuous check
    docs = spark.read.parquet(os.path.join(TESTDATA, "documents.parquet"))
    dim = docs.select("doc_id", "lang")
    assert not is_shuffle_free(docs.join(dim, "doc_id"))


def test_timeseries_approx_median_close_to_exact(spark, geodata_small):
    from satellitetools_spark.operators.timeseries import dataset_to_timeseries
    from satellitetools_spark.plans.pipeline import get_s2_qi_and_data
    from satellitetools_spark.sources import read_documents

    docs = read_documents(spark, os.path.join(geodata_small, "docs.parquet"))
    _qi, px = get_s2_qi_and_data(docs, vi_vars=["ndvi"])
    exact = {(r["aoi"], r["time"]): r["ndvi_F050"] for r in
             dataset_to_timeseries(px, ["ndvi"]).collect()}
    approx = {(r["aoi"], r["time"]): r["ndvi_F050"] for r in
              dataset_to_timeseries(px, ["ndvi"],
                                    median_accuracy=10000).collect()}
    assert set(exact) == set(approx) and exact
    for key, v in exact.items():
        # sketch rank error n/accuracy < 1 at this group size: the sketch
        # returns a true element adjacent to the exact (interpolated) median
        assert abs(approx[key] - v) <= 0.02, (key, approx[key], v)
