"""Operator parity tests for the non-SQL-expressible / approximate paths:
SimHash (local reimplementation), IVF ANN (recall vs brute force),
media-feature plumbing (deterministic stub), kNN gap-fill (local IDW),
the standalone cell join (brute-force ray casting), salted aggregation,
and exact resume via the lineage table."""

import hashlib
import os

import numpy as np
import pandas as pd
import pytest

from satellitetools_spark import geometry as G
from satellitetools_spark.operators import dedup as D
from satellitetools_spark.operators import media as M
from satellitetools_spark.operators import similarity as SIM
from satellitetools_spark.operators.knn_fill import knn_fill
from satellitetools_spark.operators.skew import salted_group_count
from satellitetools_spark.operators.spatial import cell_join
from satellitetools_spark.plans.lineage import run_resumable

TESTDATA = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(os.path.join(TESTDATA, "documents.parquet"))


def _local_simhash(text: str) -> np.int64:
    acc = np.zeros(64)
    for tok in text.lower().split():
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
        for b in range(64):
            acc[b] += 1 if (h >> b) & 1 else -1
    val = 0
    for b in range(64):
        if acc[b] >= 0:
            val |= 1 << b
    return np.uint64(val).astype(np.int64)


def test_simhash_matches_local_reimplementation(spark):
    docs = _docs(spark).limit(50)
    got = {r["doc_id"]: r["simhash"] for r in D.simhash(docs).collect()}
    for r in docs.select("doc_id", "text").collect():
        assert got[r["doc_id"]] == _local_simhash(r["text"]), r["doc_id"]


def test_simhash_near_pairs_hamming_is_exact(spark):
    docs = _docs(spark)
    pairs = D.simhash_near_pairs(docs, max_hamming=3).collect()
    sig = {r["doc_id"]: np.uint64(np.int64(r["simhash"]).astype(np.uint64))
           for r in D.simhash(docs).collect()}
    for p in pairs:
        ham = bin(int(sig[p["doc_a"]]) ^ int(sig[p["doc_b"]])).count("1")
        assert ham == p["hamming"] and ham <= 3


def test_ivf_recall_vs_brute_force(spark):
    emb = spark.read.parquet(os.path.join(TESTDATA, "embeddings.parquet"))
    qids = [0, 1, 2]
    exact = SIM.cosine_topk(emb, qids, k=10).collect()
    approx = SIM.ivf_topk(emb, qids, k=10).collect()
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact}
    ap = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(ex & ap) / len(ex)
    # nprobe=4 of 16 buckets on random vectors: recall is partial by
    # design, but must be far above the 25%-of-corpus chance level
    assert recall >= 0.4, f"IVF recall {recall:.2f}"


def test_media_features_deterministic_stub(spark):
    docs = spark.createDataFrame(
        [("d1", "ref://a"), ("d2", "ref://b")], "doc_id string, media_ref string")
    rows = {r["media_ref"]: r["feature"]
            for r in M.media_features(docs, dim=8).collect()}
    for ref, feat in rows.items():
        np.testing.assert_allclose(feat, M._fake_features(ref, 8), atol=0)
    with pytest.raises(Exception):
        M.media_features(docs, dim=8, fake=False).collect()


def test_knn_fill_matches_local_idw(spark):
    rng = np.random.RandomState(7)
    n = 60
    x = np.round(rng.rand(n) * 100, 3)
    y = np.round(rng.rand(n) * 100, 3)
    v = rng.rand(n)
    missing = rng.rand(n) < 0.25
    pdf = pd.DataFrame({"doc_id": "d0", "x": x, "y": y,
                        "B4": np.where(missing, np.nan, v)})
    df = spark.createDataFrame(pdf)
    out = knn_fill(df, ["B4"], k=4).toPandas().sort_values(["x", "y"])

    # local reference IDW with the same (d2, x, y) neighbor ordering
    good = ~missing
    order = np.lexsort((y[good], x[good]))
    gx, gy, gv = x[good][order], y[good][order], v[good][order]
    for _, r in out[out["B4_filled"]].iterrows():
        d2 = (r["x"] - gx) ** 2 + (r["y"] - gy) ** 2
        idx = np.argsort(d2, kind="stable")[:4]
        w = 1.0 / np.maximum(np.sqrt(d2[idx]), 1e-9)
        want = (gv[idx] * w).sum() / w.sum()
        assert abs(r["B4"] - want) < 1e-12


def test_cell_join_matches_bruteforce_pip(spark):
    ring = np.array([[10.0, 10.0], [90.0, 15.0], [80.0, 85.0], [20.0, 70.0],
                     [10.0, 10.0]])
    import json
    geom = json.dumps({"type": "Polygon", "coordinates": [ring.tolist()]})
    rng = np.random.RandomState(3)
    px = rng.rand(500) * 100
    py = rng.rand(500) * 100
    pts = spark.createDataFrame(
        pd.DataFrame({"tileid": "T1", "x": px, "y": py}))
    # cell_join projects 4326→UTM; the test geometry is already planar, so
    # bypass projection by monkeypatching project_rings_to_utm to identity
    orig = G.project_rings_to_utm
    G.project_rings_to_utm = lambda rings, zone: [np.asarray(r, float) for r in rings]
    try:
        got = cell_join(pts, [{"aoi": "a", "tileid": "T1",
                               "geometry": geom, "utm_zone": 33}])
        got_set = {(round(r["x"], 9), round(r["y"], 9)) for r in got.collect()}
    finally:
        G.project_rings_to_utm = orig
    inside = G.points_in_rings(px, py, [ring])
    want = {(round(a, 9), round(b, 9)) for a, b in zip(px[inside], py[inside])}
    assert got_set == want


def test_salted_group_count_equals_plain(spark):
    df = spark.range(1000).selectExpr("cast(id % 7 as string) tileid")
    got = {r["tileid"]: r["count"]
           for r in salted_group_count(df, "tileid", n_salt=8).collect()}
    want = {r["tileid"]: r["count"] for r in df.groupBy("tileid").count().collect()}
    assert got == want


def test_resume_is_exact_noop(spark, tmp_path, geodata_small):
    from satellitetools_spark.plans import get_s2_qi_and_data
    from satellitetools_spark.sources import read_documents

    docs = read_documents(spark, os.path.join(geodata_small, "docs.parquet"))
    out = str(tmp_path / "px")
    lin = str(tmp_path / "lin")

    def build(d):
        _qi, px = get_s2_qi_and_data(d, bands=["B4"])
        return px

    rid1, n1 = run_resumable(docs, build, out, lin)
    assert n1 == docs.count() and rid1 != "noop"
    rid2, n2 = run_resumable(docs, build, out, lin)
    assert (rid2, n2) == ("noop", 0)
    # lineage covers every attempted doc, including zero-row (QI-filtered)
    lineage = spark.read.parquet(lin)
    assert lineage.select("doc_id").distinct().count() == n1
