"""Structured Streaming ingest: the batch QI operator lifted to a file
stream must produce exactly the batch result once all files are processed,
and the watermarked window rollup must aggregate scene counts."""

import glob
import os
import shutil

import pytest

from satellitetools_spark.sources import read_documents
from satellitetools_spark.sources.decode import qi_percentages
from satellitetools_spark.streaming import (
    stream_documents,
    streaming_qi,
    streaming_scene_counts,
)


def test_streaming_qi_matches_batch(spark, geodata_small, tmp_path):
    src = os.path.join(geodata_small, "docs.parquet")
    feed = tmp_path / "feed"
    feed.mkdir()
    files = sorted(glob.glob(os.path.join(src, "*.parquet")))
    assert len(files) >= 2
    for f in files:
        shutil.copy(f, feed / os.path.basename(f))

    stream = stream_documents(spark, str(feed), max_files_per_trigger=1)
    assert stream.isStreaming
    q = (
        streaming_qi(stream).writeStream
        .format("memory").queryName("qi_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.sql("SELECT * FROM qi_stream").toPandas()
    batch = qi_percentages(
        read_documents(spark, src)).toPandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    batch = batch.sort_values("doc_id").reset_index(drop=True)
    assert list(got["doc_id"]) == list(batch["doc_id"])
    for c in ("VEGETATION", "CLOUD_HIGH_PROBA", "NODATA"):
        assert (got[c].fillna(-1).round(9)
                == batch[c].fillna(-1).round(9)).all()


def test_streaming_windowed_rollup(spark, geodata_small, tmp_path):
    src = os.path.join(geodata_small, "docs.parquet")
    stream = stream_documents(spark, src)
    q = (
        streaming_scene_counts(stream, window="10 days", watermark="30 days")
        .writeStream.format("memory").queryName("rollup_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql(
        "SELECT sum(n_scenes) AS n FROM rollup_stream").collect()
    n_docs = read_documents(spark, src).count()
    assert rows[0]["n"] == n_docs


def test_streaming_stateful_first_seen_dedup(spark, geodata_small, tmp_path):
    # feed every document file twice (under two names): the stateful
    # operator must report every fingerprint with n_seen == 2 and a stable
    # first_doc_id equal to the document's own id
    from satellitetools_spark.streaming import streaming_first_seen

    src = os.path.join(geodata_small, "docs.parquet")
    feed = tmp_path / "feed_dup"
    feed.mkdir()
    files = sorted(glob.glob(os.path.join(src, "*.parquet")))
    for f in files:
        shutil.copy(f, feed / os.path.basename(f))
        shutil.copy(f, feed / ("again-" + os.path.basename(f)))

    stream = stream_documents(spark, str(feed), max_files_per_trigger=2)
    q = (
        streaming_first_seen(stream).writeStream
        .format("memory").queryName("dedup_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # memory sink in update mode appends every update — take the final
    # state per fingerprint (max n_seen)
    rows = spark.sql("""
        SELECT fingerprint, max_by(first_doc_id, n_seen) AS first_doc_id,
               max(n_seen) AS n_seen
        FROM dedup_stream GROUP BY fingerprint
    """).collect()
    n_docs = read_documents(spark, src).count()
    assert len(rows) == n_docs
    assert all(r["n_seen"] == 2 for r in rows)
    ids = {r["first_doc_id"] for r in rows}
    want = {r["doc_id"] for r in read_documents(spark, src).collect()}
    assert ids == want


def test_streaming_sessions_match_batch_sessionize(spark, tmp_path):
    """Native session_window streaming sessionization equals the batch
    window-operator rollup: same session starts and event counts per
    user (gap boundary semantics coincide on continuous-time events)."""
    from pyspark.sql import functions as F

    from satellitetools_spark.operators.temporal import sessionize
    from satellitetools_spark.streaming import streaming_sessions

    src = "/root/testdata/sf0.001/events.parquet"
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    feed = tmp_path / "events_feed"
    feed.mkdir()
    shutil.copy(src, feed / "events.parquet")
    ev_schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(ev_schema).parquet(str(feed))
              .select("user_id", "ts"))
    q = (
        streaming_sessions(stream, gap="6 hours", watermark="1 day")
        .writeStream.format("memory").queryName("sessions_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_sessions"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = (spark.sql("SELECT * FROM sessions_stream").toPandas()
           .sort_values(["user_id", "session_start"])
           .reset_index(drop=True))

    batch = (sessionize(spark.read.parquet(src).select("user_id", "ts"),
                        key=["user_id"], gap_seconds=21600.0)
             .groupBy("user_id", "session_seq")
             .agg(F.count("*").alias("n_events"),
                  F.min("ts").alias("session_start"))
             .toPandas()
             .sort_values(["user_id", "session_start"])
             .reset_index(drop=True))

    assert len(got) == len(batch)
    assert got["user_id"].tolist() == batch["user_id"].tolist()
    assert got["session_start"].tolist() == batch["session_start"].tolist()
    assert got["n_events"].tolist() == batch["n_events"].tolist()


def test_streaming_zscore_matches_batch(spark, tmp_path):
    """Stateful streaming z-score over a 3-micro-batch time-ordered
    replay equals the batch rolling_zscore row-for-row (same buffer
    depth, min-support, and flag)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from satellitetools_spark.operators.temporal import rolling_zscore
    from satellitetools_spark.streaming import streaming_zscore

    src = "/root/testdata/sf0.001/events.parquet"
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(src).select("user_id", "ts", "value")
    feed = tmp_path / "ev_feed"
    feed.mkdir()
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    lo, hi = (ev.agg(F.expr(
        "percentile(unix_micros(cast(ts as timestamp)), 0.33)"),
        F.expr("percentile(unix_micros(cast(ts as timestamp)), 0.66)"))
              .collect()[0])
    t = us
    chunks = [ev.filter(t <= lo), ev.filter((t > lo) & (t <= hi)),
              ev.filter(t > hi)]
    import glob
    for i, chunk in enumerate(chunks):
        tmp_dir = str(tmp_path / f"chunk_{i}")
        chunk.coalesce(1).write.parquet(tmp_dir)
        part = glob.glob(os.path.join(tmp_dir, "part-*.parquet"))[0]
        shutil.copy(part, feed / f"part-{i}.parquet")

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1).parquet(str(feed)))
    q = (streaming_zscore(stream, window=24, min_periods=8, z_thresh=2.5)
         .writeStream.format("memory").queryName("zscore_stream")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_z"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(300)
    got = (spark.sql("SELECT * FROM zscore_stream").toPandas()
           .sort_values(["user_id", "ts"]).reset_index(drop=True))

    ref = (rolling_zscore(ev, window=24, min_periods=8, z_thresh=2.5)
           .select("user_id", "ts", "value", "n_prev", "z", "is_anomaly")
           .toPandas().sort_values(["user_id", "ts"])
           .reset_index(drop=True))
    assert len(got) == len(ref)
    assert (got["n_prev"] == ref["n_prev"]).all()
    both_nan = got["z"].isna() & ref["z"].isna()
    import numpy as np
    np.testing.assert_allclose(got.loc[~both_nan, "z"],
                               ref.loc[~both_nan, "z"], atol=1e-9)
    assert (got["is_anomaly"] == ref["is_anomaly"]).all()


def test_streaming_kmv_matches_batch(spark, tmp_path):
    """Sharded streaming KMV over a 3-micro-batch replay merges to the
    BIT-IDENTICAL global sketch and estimate as the batch operator —
    regardless of batch boundaries (state is a set)."""
    import glob

    import numpy as np
    from pyspark.sql import functions as F

    from satellitetools_spark.operators.sketch import kmv_distinct
    from satellitetools_spark.streaming import streaming_kmv

    k = 64
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text"))
    feed = tmp_path / "kmv_feed"
    feed.mkdir()
    chunks = [docs.filter(F.pmod(F.col("doc_id"), F.lit(3)) == i) for i in range(3)]
    for i, chunk in enumerate(chunks):
        tmp_dir = str(tmp_path / f"kmv_chunk_{i}")
        chunk.coalesce(1).write.parquet(tmp_dir)
        part = glob.glob(os.path.join(tmp_dir, "part-*.parquet"))[0]
        shutil.copy(part, feed / f"part-{i}.parquet")

    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(str(feed)))
    q = (streaming_kmv(stream, k=k, n_shards=4)
         .writeStream.format("memory").queryName("kmv_stream")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_kmv"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(300)
    rows = spark.sql(
        "SELECT * FROM kmv_stream").toPandas()
    # latest emission per shard IS the shard's final sketch
    rows["emit_order"] = rows.index
    last = rows.sort_values("emit_order").groupby("shard").tail(1)
    merged = np.unique(np.concatenate(
        [np.asarray(s, dtype=np.int64) for s in last["sketch"]]))[:k]

    ref = kmv_distinct(docs, k=k).collect()[0]
    assert int(merged[-1]) == ref["kth_hash"]
    assert len(merged) == ref["n_kept"]
    est = (k - 1) * 1_000_000_007.0 / merged[-1] if len(merged) == k \
        else float(len(merged))
    assert round(est, 6) == ref["est_distinct"]


def test_streaming_transitions_matches_batch(spark, tmp_path):
    """Stateful streaming transition extraction over a 3-micro-batch
    time-ordered replay yields the same (from, to) pair multiset —
    hence the same transition matrix — as batch transition_counts."""
    import glob

    from pyspark.sql import functions as F

    from satellitetools_spark.operators.temporal import transition_counts
    from satellitetools_spark.streaming.ingest import streaming_transitions

    src = "/root/testdata/sf0.001/events.parquet"
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(src).select("user_id", "event_type", "ts")
    feed = tmp_path / "tr_feed"
    feed.mkdir()
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    lo, hi = (ev.agg(F.expr(
        "percentile(unix_micros(cast(ts as timestamp)), 0.33)"),
        F.expr("percentile(unix_micros(cast(ts as timestamp)), 0.66)"))
              .collect()[0])
    chunks = [ev.filter(t <= lo), ev.filter((t > lo) & (t <= hi)),
              ev.filter(t > hi)]
    for i, chunk in enumerate(chunks):
        tmp_dir = str(tmp_path / f"tr_chunk_{i}")
        chunk.coalesce(1).write.parquet(tmp_dir)
        part = glob.glob(os.path.join(tmp_dir, "part-*.parquet"))[0]
        shutil.copy(part, feed / f"part-{i}.parquet")

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1).parquet(str(feed)))
    q = (streaming_transitions(stream)
         .writeStream.format("memory").queryName("transitions_stream")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_tr"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(300)
    got = (spark.sql("SELECT from_type, to_type, COUNT(*) AS n "
                     "FROM transitions_stream GROUP BY 1, 2").toPandas()
           .sort_values(["from_type", "to_type"]).reset_index(drop=True))
    ref = (transition_counts(ev).select("from_type", "to_type", "n")
           .toPandas().sort_values(["from_type", "to_type"])
           .reset_index(drop=True))
    assert got.equals(ref.astype(got.dtypes.to_dict())), (got, ref)


def test_streaming_cusum_matches_batch_with_calibration(spark, tmp_path):
    """Streaming CUSUM with a fixed calibration reference equals the
    batch operator on a single-key series when the calibration equals
    the key's own moments (which the batch operator computes)."""
    import glob

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from satellitetools_spark.operators.temporal import cusum_alarms
    from satellitetools_spark.streaming.ingest import streaming_cusum

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    rng = np.random.RandomState(21)
    vals = list(rng.normal(0, 1, 40)) + list(rng.normal(2.5, 1, 40))
    base = pd.Timestamp("2024-03-01")
    pdf = pd.DataFrame({
        "user_id": [7] * 80,
        "ts": [base + pd.Timedelta(minutes=i) for i in range(80)],
        "value": vals,
    })
    ev = spark.createDataFrame(pdf)
    a = np.asarray(vals)
    mu0, sd0 = float(a.mean()), float(a.std())

    feed = tmp_path / "cu_feed"
    feed.mkdir()
    chunks = [pdf.iloc[:30], pdf.iloc[30:55], pdf.iloc[55:]]
    for i, chunk in enumerate(chunks):
        tmp_dir = str(tmp_path / f"cu_chunk_{i}")
        spark.createDataFrame(chunk).coalesce(1).write.parquet(tmp_dir)
        part = glob.glob(os.path.join(tmp_dir, "part-*.parquet"))[0]
        shutil.copy(part, feed / f"part-{i}.parquet")

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1).parquet(str(feed)))
    q = (streaming_cusum(stream, mu0=mu0, sigma0=sd0, k=0.5, h=4.0)
         .writeStream.format("memory").queryName("cusum_stream")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_cu"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(300)
    got = spark.sql(
        "SELECT MAX(n_alarms) AS na, COUNT(*) AS n FROM cusum_stream"
    ).collect()[0]
    ref = cusum_alarms(ev, key_cols=("user_id",), k=0.5, h=4.0).collect()[0]
    assert got["n"] == ref["n_obs"] == 80
    assert got["na"] == ref["n_alarms"] >= 1


def test_streaming_chunking_matches_batch(spark, tmp_path):
    """chunk_documents is map-only, so lifting it to a file stream must
    give the batch result exactly — chunk ids are offset-derived, never
    explode/trigger-order-dependent."""
    from satellitetools_spark.operators.text import chunk_documents

    feed = tmp_path / "chunk_feed"
    feed.mkdir()
    rows = [(f"d{i}", " ".join(f"t{i}_{j}" for j in range(25)))
            for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    # two files so the stream takes two triggers
    df.limit(3).write.parquet(str(feed / "a.parquet"))
    df.subtract(df.limit(3)).write.parquet(str(feed / "b.parquet"))

    stream = (spark.readStream.schema("doc_id string, text string")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(feed) + "/*"))
    q = (chunk_documents(stream, window=8, overlap=2).writeStream
         .format("memory").queryName("chunk_stream")
         .option("checkpointLocation", str(tmp_path / "chunk_ckpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(300)

    got = (spark.sql("SELECT * FROM chunk_stream").toPandas()
           .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True))
    batch = (chunk_documents(spark.read.parquet(str(feed) + "/*"),
                             window=8, overlap=2).toPandas()
             .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True))
    assert got.equals(batch)
    assert len(got) == 6 * 5   # 25 tokens, stride 6 -> starts 0,6,12,18,24


def test_streaming_psi_matches_batch_single_window(spark, tmp_path):
    """Streaming PSI against a psi_reference calibration vector equals
    the batch inference.psi total when one event-time window covers the
    whole actual slice (same bins, same smoothing, same fold)."""
    import glob

    import numpy as np
    import pandas as pd

    from satellitetools_spark.operators.inference import psi as batch_psi
    from satellitetools_spark.streaming.ingest import (psi_reference,
                                                       streaming_psi)

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    rng = np.random.RandomState(13)
    base = pd.Timestamp("2024-01-02")
    # calibration: N(50,10); serving: drifted N(80,15)
    cal = pd.DataFrame({
        "ts": [base + pd.Timedelta(minutes=i) for i in range(120)],
        "value": rng.normal(50, 10, 120), "sl": 0})
    act = pd.DataFrame({
        "ts": [base + pd.Timedelta(minutes=i) for i in range(90)],
        "value": rng.normal(80, 15, 90), "sl": 1})
    both = spark.createDataFrame(pd.concat([cal, act]))
    want = (batch_psi(both, "sl", "value", 0.0, 200.0, n_bins=10)
            .select("psi_total").distinct().collect()[0]["psi_total"])

    expected = psi_reference(spark.createDataFrame(cal), "value",
                             0.0, 200.0, n_bins=10)
    feed = tmp_path / "psi_feed"
    feed.mkdir()
    chunks = [act.iloc[:30], act.iloc[30:70], act.iloc[70:]]
    for i, chunk in enumerate(chunks):
        tmp_dir = str(tmp_path / f"psi_chunk_{i}")
        spark.createDataFrame(chunk).coalesce(1).write.parquet(tmp_dir)
        part = glob.glob(os.path.join(tmp_dir, "part-*.parquet"))[0]
        shutil.copy(part, feed / f"part-{i}.parquet")
    stream = (spark.readStream
              .schema(spark.createDataFrame(act).schema)
              .option("maxFilesPerTrigger", 1).parquet(str(feed)))
    q = (streaming_psi(stream, expected, value_col="value", ts_col="ts",
                       lo=0.0, hi=200.0, n_bins=10,
                       window="3650 days", watermark="1 hour")
         .writeStream.format("memory").queryName("psi_stream")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ckpt_psi"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(300)
    got = spark.sql("SELECT * FROM psi_stream").collect()
    assert len(got) == 1
    assert got[0]["n_obs"] == 90
    assert got[0]["psi"] == pytest.approx(want, abs=1e-6)
    assert got[0]["psi"] > 0.25  # the planted drift is a retrain alarm


def test_streaming_psi_validates_reference_length(spark):
    from satellitetools_spark.streaming.ingest import streaming_psi
    df = spark.readStream.format("rate").load() \
        .selectExpr("timestamp AS ts", "CAST(value AS DOUBLE) AS value")
    with pytest.raises(ValueError):
        streaming_psi(df, [0.1, 0.2], n_bins=10)


def test_streaming_heavy_hitters_exact_in_small_alphabet(spark, tmp_path):
    """With each shard's alphabet within its k counters, streaming MG
    never decrements — the merged latest-per-shard summary equals the
    batch exact token counts bit-for-bit across 3 micro-batches."""
    import pandas as pd

    from satellitetools_spark.streaming.ingest import (
        streaming_heavy_hitters)

    docs = pd.DataFrame({
        "doc_id": range(9),
        "text": (["hot warm cold"] * 5 + ["hot warm"] * 3 + ["hot"]),
    })
    feed = tmp_path / "hh_feed"
    feed.mkdir()
    for i, lo in enumerate((0, 3, 6)):
        chunk = docs.iloc[lo:lo + 3]
        tmp_dir = str(tmp_path / f"hh_chunk_{i}")
        spark.createDataFrame(chunk).coalesce(1).write.parquet(tmp_dir)
        part = glob.glob(os.path.join(tmp_dir, "part-*.parquet"))[0]
        shutil.copy(part, feed / f"part-{i}.parquet")
    stream = (spark.readStream
              .schema(spark.createDataFrame(docs).schema)
              .option("maxFilesPerTrigger", 1).parquet(str(feed)))
    q = (streaming_heavy_hitters(stream, k=16, n_shards=4)
         .writeStream.format("memory").queryName("hh_stream")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_hh"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(300)
    # latest emission per (shard, token) is the final summary
    got = spark.sql("""
        SELECT token, lb FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY shard, token
                                       ORDER BY lb DESC) AS rn
          FROM hh_stream) WHERE rn = 1
    """).toPandas().set_index("token")["lb"].to_dict()
    assert got == {"hot": 9, "warm": 8, "cold": 5}


def test_streaming_attribution_matches_batch(spark, tmp_path):
    """Stateful streaming last-touch attribution over a 3-micro-batch
    time-ordered replay emits the same (user, conv_ts,
    last_touch_type, in_window) multiset as the batch operator."""
    import glob

    from pyspark.sql import functions as F

    from satellitetools_spark.operators.temporal import attribution
    from satellitetools_spark.streaming.ingest import streaming_attribution

    src = "/root/testdata/sf0.001/events.parquet"
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(src).select("user_id", "event_type", "ts")
    feed = tmp_path / "at_feed"
    feed.mkdir()
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    lo, hi = (ev.agg(F.expr(
        "percentile(unix_micros(cast(ts as timestamp)), 0.33)"),
        F.expr("percentile(unix_micros(cast(ts as timestamp)), 0.66)"))
              .collect()[0])
    chunks = [ev.filter(t <= lo), ev.filter((t > lo) & (t <= hi)),
              ev.filter(t > hi)]
    for i, chunk in enumerate(chunks):
        tmp_dir = str(tmp_path / f"at_chunk_{i}")
        chunk.coalesce(1).write.parquet(tmp_dir)
        part = glob.glob(os.path.join(tmp_dir, "part-*.parquet"))[0]
        shutil.copy(part, feed / f"part-{i}.parquet")

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1).parquet(str(feed)))
    q = (streaming_attribution(stream)
         .writeStream.format("memory").queryName("attr_stream")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_at"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(300)
    got = set(map(tuple, spark.sql(
        "SELECT user_id, conv_ts, last_touch_type, in_window "
        "FROM attr_stream").toPandas().astype(str).values))
    ref_df = attribution(ev, "event_type = 'purchase'",
                         "event_type IN ('view', 'click')", 86400.0)
    ref = set(map(tuple, ref_df.select(
        F.col("user_id").cast("string"), "conv_ts",
        "last_touch_type", "in_window").toPandas().astype(str).values))
    assert got == ref and len(got) > 0
