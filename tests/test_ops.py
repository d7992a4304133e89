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

from pyspark.sql import functions as F

from satellitetools_spark import geometry as G
from satellitetools_spark.operators import dedup as D
from satellitetools_spark.operators import media as M
from satellitetools_spark.operators import sampling as SAMP
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


def _recall(emb, qids, **ivf_kw):
    ex = {(r["query_id"], r["neighbor_id"])
          for r in SIM.cosine_topk(emb, qids, k=10).collect()}
    ap = {(r["query_id"], r["neighbor_id"])
          for r in SIM.ivf_topk(emb, qids, k=10, **ivf_kw).collect()}
    return len(ex & ap) / len(ex)


def test_ivf_recall_clustered(spark):
    # the representative regime: real embedding tables live on low-dim
    # manifolds / clusters, which is exactly what inverted lists exploit.
    # 16 clusters, defaults (16 centroids, nprobe=4, n_assign=2 ≈ 25-50%
    # scan fraction) must recover nearly all true neighbors.
    rng = np.random.RandomState(7)
    centers = rng.randn(16, 64) * 3
    rows = [(i, [float(x) for x in centers[i % 16] + rng.randn(64) * 0.5])
            for i in range(500)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    recall = _recall(emb, [0, 1, 2])
    assert recall >= 0.9, f"IVF clustered recall {recall:.2f}"


def test_ivf_lloyd_refine_recovers_from_bad_seed(spark):
    # adversarial seed: hash-stratified sampling can land several seeds in
    # one cluster. Lloyd iterations must migrate centroids toward distinct
    # clusters — refined recall must beat the unrefined seed on the same
    # clustered table with a deliberately coarse probe (nprobe=2).
    rng = np.random.RandomState(11)
    centers = rng.randn(8, 32) * 4
    rows = [(i, [float(x) for x in centers[i % 8] + rng.randn(32) * 0.4])
            for i in range(400)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = _recall(emb, [0, 1, 2], n_centroids=8, nprobe=2)
    refined = _recall(emb, [0, 1, 2], n_centroids=8, nprobe=2,
                      refine_iters=2)
    assert refined >= max(base, 0.8), f"refined {refined:.2f} base {base:.2f}"


def test_ivf_recall_floor_on_isotropic_noise(spark):
    # the testdata embeddings are isotropic gaussian — the worst case for
    # any space-partitioning index (true neighbors are near-orthogonal
    # arbitrary directions), so only a floor above the ~25%-of-corpus
    # chance level is asserted at the sublinear default scan fraction
    emb = spark.read.parquet(os.path.join(TESTDATA, "embeddings.parquet"))
    recall = _recall(emb, [0, 1, 2])
    assert recall >= 0.45, f"IVF isotropic recall {recall:.2f}"


def test_media_features_deterministic_stub(spark):
    docs = spark.createDataFrame(
        [("d1", "ref://a"), ("d2", "ref://b")], "doc_id string, media_ref string")
    rows = {r["media_ref"]: r["feature"]
            for r in M.media_features(docs, dim=8).collect()}
    for ref, feat in rows.items():
        np.testing.assert_allclose(feat, M._fake_features(ref, 8), atol=0)
    with pytest.raises(Exception):
        M.media_features(docs, dim=8, fake=False).collect()


def test_media_features_real_decoder_end_to_end(spark):
    # the NON-fake path: a real compression codec (stdlib zlib bitmap)
    # injected through the decoder seam — payload bytes are decoded on
    # the executors and features computed from the actual pixels
    rng = np.random.RandomState(11)
    imgs = {"d1": rng.randint(0, 256, (4, 6), dtype=np.uint8),
            "d2": rng.randint(0, 256, (3, 5), dtype=np.uint8)}
    rows = [(k, f"ref://{k}", bytearray(M.encode_zlib_gray8(v)))
            for k, v in imgs.items()]
    docs = spark.createDataFrame(
        rows, "doc_id string, media_ref string, payload binary")
    out = {r["doc_id"]: r["feature"]
           for r in M.media_features(docs, dim=8,
                                     decoder=M.decode_zlib_gray8).collect()}
    for k, img in imgs.items():
        np.testing.assert_allclose(out[k], M._array_features(img, 8),
                                   atol=0)
    # codec round-trip sanity independent of Spark
    for img in imgs.values():
        np.testing.assert_array_equal(
            M.decode_zlib_gray8(M.encode_zlib_gray8(img)), img)


def test_png_gray8_decode_handbuilt_stream_bit_identical():
    # a real PNG byte stream assembled BY THE TEST, chunk by chunk,
    # independent of encode_png_gray8 (its own CRC framing, its own
    # Up-filtered second scanline) — the decoder must reproduce the
    # pixel array bit-identically (r4 verdict #6).
    import struct
    import zlib

    want = np.array([[10, 20, 30], [13, 24, 35]], dtype=np.uint8)
    scan = bytes([0, 10, 20, 30]) + bytes([2, 3, 4, 5])  # None, Up
    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(scan))
           + chunk(b"IEND", b""))
    np.testing.assert_array_equal(M.decode_png_gray8(png), want)


def test_png_gray8_roundtrip_all_filters():
    rng = np.random.RandomState(7)
    for shape in [(1, 1), (2, 7), (9, 4), (16, 16)]:
        img = rng.randint(0, 256, shape, dtype=np.uint8)
        for filters in [(0,), (1,), (2,), (3,), (4,), (0, 1, 2, 3, 4)]:
            png = M.encode_png_gray8(img, filters=filters)
            np.testing.assert_array_equal(M.decode_png_gray8(png), img)
    # gradient image (filters shine on smooth data) through every
    # filter cycle, and the stream really is smaller than raw
    grad = np.add.outer(np.arange(32), np.arange(32)).astype(np.uint8)
    png = M.encode_png_gray8(grad, filters=(4,))
    assert len(png) < grad.size
    np.testing.assert_array_equal(M.decode_png_gray8(png), grad)


def test_png_gray8_rejects_corruption_and_unsupported():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    png = bytearray(M.encode_png_gray8(img))
    png[20] ^= 0xFF  # flip a byte inside IHDR -> CRC must fail
    with pytest.raises(ValueError, match="CRC"):
        M.decode_png_gray8(bytes(png))
    with pytest.raises(ValueError, match="signature"):
        M.decode_png_gray8(b"NOTAPNG!" + bytes(16))
    # truncated mid-chunk: cut INSIDE the IDAT body (signature 8 +
    # IHDR chunk 25 + IDAT header 8 + 4 data bytes = 45) so the
    # declared length runs past the payload — must be the documented
    # ValueError, not a struct.error
    full = bytes(M.encode_png_gray8(img))
    with pytest.raises(ValueError, match="truncated"):
        M.decode_png_gray8(full[:45])
    # RGB color type (2) is out of contract -> loud error, not garbage
    import struct
    import zlib
    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))
    rgb = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(bytes([0, 1, 2, 3])))
           + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="grayscale"):
        M.decode_png_gray8(rgb)


def test_media_features_png_decoder_end_to_end(spark):
    # the real-codec seam with an actual PNG byte stream: payloads are
    # spec-conformant PNGs (all five filters in the stream), decoded on
    # the executors through the NON-fake mapInPandas path, features
    # computed from the true pixels — bit-identical to local
    rng = np.random.RandomState(23)
    imgs = {"p1": rng.randint(0, 256, (8, 5), dtype=np.uint8),
            "p2": np.add.outer(np.arange(6), np.arange(9))
                    .astype(np.uint8)}
    rows = [(k, f"ref://{k}.png",
             bytearray(M.encode_png_gray8(v, filters=(0, 1, 2, 3, 4))))
            for k, v in imgs.items()]
    docs = spark.createDataFrame(
        rows, "doc_id string, media_ref string, payload binary")
    out = {r["doc_id"]: r["feature"]
           for r in M.media_features(
               docs, dim=8, decoder=M.decode_png_gray8).collect()}
    for k, img in imgs.items():
        np.testing.assert_allclose(out[k], M._array_features(img, 8),
                                   atol=0)


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
    # geographic polygon; expected membership = driver-side brute-force PIP
    # against the same UTM projection the operator applies in executors
    import json
    ring4326 = np.array([[14.001, 60.001], [14.009, 60.0015],
                         [14.008, 60.008], [14.002, 60.007],
                         [14.001, 60.001]])
    geom = json.dumps({"type": "Polygon", "coordinates": [ring4326.tolist()]})
    rings_utm = G.project_rings_to_utm([ring4326], 33)
    bx = G.rings_bounds(rings_utm)
    rng = np.random.RandomState(3)
    px = bx[0] - 50 + rng.rand(500) * (bx[2] - bx[0] + 100)
    py = bx[1] - 50 + rng.rand(500) * (bx[3] - bx[1] + 100)
    pts = spark.createDataFrame(
        pd.DataFrame({"tileid": "T1", "x": px, "y": py}))
    got = cell_join(pts, [{"aoi": "a", "tileid": "T1",
                           "geometry": geom, "utm_zone": 33}])
    # doubles round-trip bit-exactly through Spark — compare unrounded
    # (round(np.float64) and round(float) disagree in the last digit)
    got_set = {(float(r["x"]), float(r["y"])) for r in got.collect()}
    inside = G.points_in_rings(px, py, rings_utm)
    want = {(float(a), float(b)) for a, b in zip(px[inside], py[inside])}
    assert got_set == want


def test_cell_join_df_thousand_cloned_aois(spark):
    # the distributed-cover path: 1,200 cloned AOI polygons flow through
    # cell_join_df as a DataFrame (mapInPandas cover build in executors,
    # broadcast cell-equi join, PIP refine) with zero driver collect of
    # the dimension. Expected membership = driver-side brute-force PIP
    # with the same projection.
    import json as _json
    from satellitetools_spark.operators.spatial import cell_join_df
    n_aoi = 1200
    aoi_rows, rings_utm_by_aoi = [], {}
    for i in range(n_aoi):
        lon0 = 14.0 + (i % 40) * 0.01
        lat0 = 60.0 + (i // 40) * 0.01
        ring = [[lon0, lat0], [lon0 + 0.005, lat0 + 0.0004],
                [lon0 + 0.0045, lat0 + 0.004], [lon0 + 0.0006, lat0 + 0.0038],
                [lon0, lat0]]
        geom = _json.dumps({"type": "Polygon", "coordinates": [ring]})
        name = f"a{i:04d}"
        aoi_rows.append((name, "T1", geom, 33))
        rings_utm_by_aoi[name] = G.project_rings_to_utm(
            [np.asarray(ring, float)], 33)
    # probe points: projected centroids of every 37th polygon (inside) and
    # far-shifted points (outside everything)
    pt_rows = []
    for i in range(0, n_aoi, 37):
        r = rings_utm_by_aoi[f"a{i:04d}"][0]
        cx, cy = float(r[:-1, 0].mean()), float(r[:-1, 1].mean())
        pt_rows.append(("T1", cx, cy))
        pt_rows.append(("T1", cx + 50000.0, cy + 50000.0))
    want = set()
    for name, rings in rings_utm_by_aoi.items():
        xs = np.array([p[1] for p in pt_rows])
        ys = np.array([p[2] for p in pt_rows])
        hit = G.points_in_rings(xs, ys, rings)
        for j in np.nonzero(hit)[0]:
            want.add((name, xs[j], ys[j]))
    aois = spark.createDataFrame(
        aoi_rows, "aoi string, tileid string, geometry string, utm_zone int")
    pts = spark.createDataFrame(pt_rows, "tileid string, x double, y double")
    got = {(r["aoi"], r["x"], r["y"])
           for r in cell_join_df(pts, aois).collect()}
    assert len(want) >= n_aoi // 37  # sanity: the centroids did land inside
    assert got == want


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


def test_rh_lsh_pairs_matches_bruteforce_at_high_tau(spark):
    # the production regime: cloned near-dup vectors at cosine >= 0.9 with
    # the selective 16-band x 4-bit banding — output must equal the exact
    # brute-force pair join (verification keeps precision; banding keeps
    # recall at this tau)
    rng = np.random.RandomState(11)
    base = rng.randn(40, 32)
    rows = []
    vid = 0
    for i in range(40):
        rows.append((vid, [float(x) for x in base[i]])); vid += 1
        if i % 4 == 0:  # a near-clone at small perturbation
            rows.append((vid, [float(x) for x in base[i] + rng.randn(32) * 0.05]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r["vec_id_a"], r["vec_id_b"], r["cosine"]) for r in
           SIM.rh_lsh_pairs(emb, threshold=0.9, bands=16).collect()}
    a = emb.selectExpr("vec_id as vec_id_a", "embedding as va")
    b = emb.selectExpr("vec_id as vec_id_b", "embedding as vb")
    brute = SIM.with_cosine(
        a.join(b, F.col("vec_id_a") < F.col("vec_id_b")), "va", "vb")
    want = {(r["vec_id_a"], r["vec_id_b"], round(r["cosine"], 6)) for r in
            brute.filter(F.col("cosine") >= 0.9).collect()}
    assert len(want) >= 10 and got == want


def test_connected_components_match_union_find(spark):
    # synthetic graph with chains, a cycle, an isolated pair, and nodes
    # whose min-label needs >1 round to propagate (chain 10-11-12-13)
    edges = [(1, 2), (2, 3), (10, 11), (11, 12), (12, 13), (20, 21),
             (21, 22), (22, 20), (30, 31)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {(r["doc_id"], r["component"]) for r in
           D.connected_components(pairs).collect()}

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {(n, find(n)) for n in parent}
    assert got == want


def _local_winnow(text, k=3, w=4, B=131, M=1_000_000_007):
    import re
    toks = re.findall(r"[a-z0-9]+", text.lower())
    th = []
    for tok in toks:
        h = 0
        for c in tok:
            h = (h * B + ord(c)) % M
        th.append(h)
    if len(th) < k:
        return set()
    hs = []
    for i in range(len(th) - k + 1):
        h = th[i]
        for j in range(1, k):
            h = (h * B + th[i + j]) % M
        hs.append(h)
    if len(hs) < w:
        return set()
    return set(min(hs[i:i + w]) for i in range(len(hs) - w + 1))


def test_hash_split_matches_local_fold_and_is_stable(spark):
    from satellitetools_spark.operators.sampling import hash_split

    def local_bucket(key, B=131, M=1_000_000_007, total=100):
        h = 0
        for c in key:
            h = (h * B + ord(c)) % M
        return h % total

    docs = _docs(spark).limit(60).select("doc_id")
    rows = hash_split(docs).collect()
    for r in rows:
        b = local_bucket(str(r["doc_id"]))
        assert r["bucket"] == b, r
        want = "train" if b < 80 else ("val" if b < 90 else "test")
        assert r["split"] == want, r
    # stability under repartitioning: same assignment regardless of layout
    again = {r["doc_id"]: r["split"]
             for r in hash_split(docs.repartition(7)).collect()}
    assert again == {r["doc_id"]: r["split"] for r in rows}


def test_winnow_fingerprints_match_local_reimplementation(spark):
    from satellitetools_spark.operators.text import winnow_fingerprints
    docs = _docs(spark).limit(40)
    got = {}
    for r in winnow_fingerprints(docs).collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    assert texts, "no documents loaded"
    for doc_id, text in texts.items():
        assert got.get(doc_id, set()) == _local_winnow(text), doc_id


def test_repetition_stats_known_values(spark):
    """Hand-computed Gopher repetition stats on a crafted document."""
    from satellitetools_spark.operators.text import repetition_stats

    # lines: [dup, dup, unique] -> n=3, rep=1/3, dupch=6/13
    # tokens: "a b a b a b x" -> 2-grams: a b(x3), b a(x2), b x(x1) => top2=6/7
    #   3-grams: "a b a"(x2), "b a b"(x2), "a b x" => top3 = 2*3/7
    text = "dup\ndup\nunique1"
    text2 = "a b a b a b x"
    df = spark.createDataFrame(
        [("d1", text), ("d2", text2), ("d3", ""), ("d4", "solo")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict()
           for r in repetition_stats(df).collect()}
    assert out["d1"]["n_lines"] == 3
    assert out["d1"]["dup_line_frac"] == round(1 / 3, 6)
    assert out["d1"]["dup_line_char_frac"] == round(6 / 13, 6)
    assert out["d2"]["top2gram_frac"] == round(6 / 7, 6)
    assert out["d2"]["top3gram_frac"] == round(6 / 7, 6)
    # degenerate inputs: all-zero stats, no crash
    assert out["d3"]["n_lines"] == 0
    assert out["d3"]["dup_line_frac"] == 0.0
    assert out["d3"]["top2gram_frac"] == 0.0
    assert out["d4"]["top2gram_frac"] == 0.0  # 1 token < n


def test_pack_sequences_layout(spark):
    """Packing is a deterministic concat-and-chunk: offsets are the
    running token sums within a shard and pack ids chunk at seq_len —
    and the result is invariant under repartitioning."""
    from satellitetools_spark.operators.sampling import pack_sequences

    rows = [(f"doc{i:03d}", " ".join(["w"] * (i + 1))) for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = pack_sequences(df, seq_len=10, n_shards=2).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # verify per-shard cumulative layout locally
    for shard, grp in out.groupby("shard"):
        g = grp.sort_values("doc_id")
        run = 0
        for _, r in g.iterrows():
            assert r["start_offset"] == run
            assert r["pack_id"] == f"{shard}:{run // 10}"
            assert r["pack_pos"] == run % 10
            run += r["n_tokens"]
    # partitioning invariance
    out2 = pack_sequences(df.repartition(7), seq_len=10, n_shards=2) \
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)


def test_redact_pii_crafted(spark):
    """Crafted PII strings: Spark result matches both hand-expected values
    and the DuckDB oracle run on the same rows (regex-dialect parity)."""
    import duckdb

    from satellitetools_spark.operators.text import redact_pii, redact_pii_sql

    rows = [
        ("p1", "contact bob.smith+x@example.co.uk or 10.0.255.3 now"),
        ("p2", "call 12345678901 twice 9876543 ok 123456"),  # last too short
        ("p3", "clean text no pii"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in redact_pii(df).collect()}
    assert got["p1"]["n_email"] == 1 and got["p1"]["n_ipv4"] == 1
    assert got["p1"]["redacted"] == "contact <EMAIL> or <IP> now"
    assert got["p2"]["n_number"] == 2
    assert got["p2"]["redacted"] == "call <NUM> twice <NUM> ok 123456"
    assert got["p3"]["redacted"] == "clean text no pii"

    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    for row in con.execute(redact_pii_sql(table="d")).fetchall():
        doc_id, n_email, n_ipv4, n_number, redacted = row
        g = got[doc_id]
        assert (g["n_email"], g["n_ipv4"], g["n_number"], g["redacted"]) \
            == (n_email, n_ipv4, n_number, redacted)


def test_decontaminate_crafted(spark):
    """A doc sharing a 5-gram with the benchmark is flagged with the right
    counts; non-overlapping docs are not."""
    from satellitetools_spark.operators.dedup import decontaminate

    bench = spark.createDataFrame(
        [("b1", "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"])
    docs = spark.createDataFrame(
        [("c1", "prefix the quick brown fox jumps suffix words here"),
         ("c2", "completely different tokens with no overlap at all")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict()
           for r in decontaminate(docs, bench, n=5).collect()}
    # c1 tokens: 9 -> 5 distinct 5-grams; exactly one ("the quick brown
    # fox jumps") appears in the benchmark
    assert set(out) == {"c1"}
    assert out["c1"]["n_shared_grams"] == 1
    assert out["c1"]["n_grams"] == 5
    assert out["c1"]["shared_frac"] == round(1 / 5, 6)


def test_train_data_pipeline_composition(spark):
    """Crafted corpus: low-quality and repetitive docs filtered, exact
    duplicates keep min doc_id, survivors packed deterministically."""
    from satellitetools_spark.plans.corpus import train_data_pipeline

    good = ("the cat and the dog of a house in the garden is on the hill "
            "and the bird of a tree is in the yard on a fence the end "
            "and then the story of a day is told in the words on a page")
    rows = [
        ("k1", good),
        ("k2", good),                     # exact duplicate -> dropped
        ("k3", "x " * 3),                 # low quality -> dropped
        ("k4", good + " extra tail words here"),  # survives
        ("k5", "the of a in is on " + "spam ham " * 40),  # top2gram -> dropped
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict()
           for r in train_data_pipeline(df, seq_len=16, n_shards=2).collect()}
    assert set(out) == {"k1", "k4"}
    # layout: within each shard offsets are the running sums
    for r in out.values():
        assert r["pack_id"] == f"{r['shard']}:{r['start_offset'] // 16}"
        assert r["pack_pos"] == r["start_offset"] % 16


def test_scene_identity_parse(spark, geodata_small):
    """F6-F8: fields derived from the raw productid string must agree with
    the scene metadata carried alongside it (tile recompose, EPSG, and the
    sensing timestamp embedded in the id)."""
    from satellitetools_spark.sources.docs import (
        parse_scene_identity, read_documents)

    docs = read_documents(spark, os.path.join(geodata_small, "docs.parquet"))
    rows = parse_scene_identity(docs).collect()
    assert rows
    for r in rows:
        assert r["tileid_composed"] == r["tileid"]
        assert r["epsg"] == 32600 + r["utm_zone"]
        assert r["projection"] == f"EPSG:{r['epsg']}"
        assert r["mission"] == "S2A" and r["level"] == "MSIL2A"
        # productid's third segment IS the sensing stamp
        assert r["sensing_time"].strftime("%Y%m%dT%H%M%S") == \
            r["productid"].split("_")[2]


def test_stratified_sample_deterministic_and_independent(spark):
    """Membership is a pure hash of (key, stratum): stable under
    repartitioning, honors per-stratum thresholds exactly, and changing
    one stratum's fraction cannot change another stratum's members."""
    from satellitetools_spark.operators.sampling import stratified_sample

    docs = _docs(spark).select("doc_id", "lang")
    fracs = {"en": 0.5, "de": 0.2, "fr": 1.0, "es": 0.0, "zh": 0.3}
    kept = stratified_sample(docs, "lang", fracs, denom=1000).collect()
    B, M = 131, 1_000_000_007

    def bucket(key, lang):
        h = 0
        for c in f"{key}:{lang}":
            h = (h * B + ord(c)) % M
        return h % 1000

    for r in kept:
        assert r["sample_bucket"] == bucket(r["doc_id"], r["lang"])
        assert r["sample_bucket"] < round(fracs[r["lang"]] * 1000)
    assert not any(r["lang"] == "es" for r in kept)
    # full-fraction stratum keeps everything
    n_fr = docs.filter("lang = 'fr'").count()
    assert sum(r["lang"] == "fr" for r in kept) == n_fr
    # layout invariance
    again = {r["doc_id"] for r in
             stratified_sample(docs.repartition(7), "lang", fracs,
                               denom=1000).collect()}
    assert again == {r["doc_id"] for r in kept}
    # independence: bumping es cannot change en/de/fr/zh membership
    fr2 = dict(fracs, es=1.0)
    other = {r["doc_id"] for r in
             stratified_sample(docs, "lang", fr2, denom=1000).collect()
             if r["lang"] != "es"}
    assert other == {r["doc_id"] for r in kept if r["lang"] != "es"}


def test_global_row_number_matches_local_sort(spark):
    """The distributed two-pass index equals the single-node total order,
    at any partition count, including empty range partitions."""
    from pyspark.sql import functions as SF

    from satellitetools_spark.operators.sampling import global_row_number

    docs = _docs(spark).select(
        "doc_id", SF.length("text").alias("n_chars"))
    want = [r["doc_id"] for r in
            docs.orderBy(SF.col("n_chars").desc(), "doc_id").collect()]
    for n_parts in (3, 8, 64):  # 64 > row groups -> some empty partitions
        out = global_row_number(
            docs, [SF.col("n_chars").desc(), SF.col("doc_id")],
            num_partitions=n_parts).collect()
        assert sorted(r["global_idx"] for r in out) == list(range(len(want)))
        got = [r["doc_id"] for r in sorted(out, key=lambda r: r["global_idx"])]
        assert got == want, f"n_partitions={n_parts}"


def test_quality_quantiles_match_numpy(spark):
    """Exact percentile agg equals numpy's linear-interpolation quantiles
    per stratum; approx path stays within sketch tolerance."""
    from satellitetools_spark.operators.text import (
        quality_quantiles, quality_score)

    docs = _docs(spark)
    scores = {}
    langs = {r["doc_id"]: r["lang"]
             for r in docs.select("doc_id", "lang").collect()}
    for r in quality_score(docs).collect():
        scores.setdefault(langs[r["doc_id"]], []).append(r["quality"])
    out = {r["grp"]: r for r in quality_quantiles(docs).collect()}
    assert set(out) == set(scores)
    for lang, vals in scores.items():
        v = np.asarray(vals)
        r = out[lang]
        assert r["n_docs"] == len(vals)
        assert abs(r["mean_quality"] - round(float(v.mean()), 6)) <= 1e-6
        for p, c in ((0.25, "q25"), (0.5, "q50"), (0.75, "q75")):
            assert abs(r[c] - float(np.quantile(v, p))) <= 1e-6, (lang, c)
    approx = {r["grp"]: r for r in
              quality_quantiles(docs, accuracy=10_000).collect()}
    for lang in scores:
        assert abs(approx[lang]["q50"] - out[lang]["q50"]) <= 0.05


def test_asof_join_matches_pandas_merge_asof(spark):
    """Distributed union+carry-forward as-of equals pandas merge_asof,
    including the exact-timestamp (>=) edge and the tolerance cutoff."""
    import pandas as pd

    from satellitetools_spark.operators.temporal import asof_join

    rng = np.random.RandomState(7)
    lk = rng.randint(0, 5, 40)
    lt = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        rng.randint(0, 10_000, 40), unit="s")
    rk = rng.randint(0, 6, 30)  # key 5 has no left rows, some keys no right
    rt = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        rng.randint(0, 10_000, 30), unit="s")
    lpd = pd.DataFrame({"k": lk, "ts": lt, "lid": np.arange(40)})
    rpd = pd.DataFrame({"k": rk, "ts": rt, "rv": np.arange(30) * 1.5})
    # exact-timestamp edge: right row at exactly a left ts must match
    rpd.loc[0, ["k", "ts"]] = [int(lpd.loc[0, "k"]), lpd.loc[0, "ts"]]
    rpd = rpd.drop_duplicates(["k", "ts"])  # keep the total order unique

    got = asof_join(spark.createDataFrame(lpd), spark.createDataFrame(rpd),
                    on=["k"], right_cols=["rv"]).toPandas() \
        .sort_values("lid").reset_index(drop=True)
    want = pd.merge_asof(lpd.sort_values("ts"), rpd.sort_values("ts"),
                         on="ts", by="k", direction="backward") \
        .sort_values("lid").reset_index(drop=True)
    assert got["ref_rv"].equals(want["rv"]), \
        pd.concat([got[["lid", "ref_rv"]], want[["lid", "rv"]]], axis=1)

    # tolerance: matches older than 100s become NULL
    got_tol = asof_join(
        spark.createDataFrame(lpd), spark.createDataFrame(rpd),
        on=["k"], right_cols=["rv"], tolerance_seconds=100).toPandas() \
        .sort_values("lid").reset_index(drop=True)
    want_tol = pd.merge_asof(
        lpd.sort_values("ts"), rpd.sort_values("ts"), on="ts", by="k",
        direction="backward", tolerance=pd.Timedelta(seconds=100)) \
        .sort_values("lid").reset_index(drop=True)
    assert got_tol["ref_rv"].equals(want_tol["rv"])


def test_range_join_matches_bruteforce(spark):
    """Bin-probe range join returns exactly the brute-force pair set —
    boundary (|dt| == tolerance) pairs included, each pair exactly once."""
    import pandas as pd

    from satellitetools_spark.operators.temporal import range_join

    rng = np.random.RandomState(11)
    lt = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        rng.randint(0, 5000, 60), unit="s")
    rt = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        np.concatenate([rng.randint(0, 5000, 50),
                        [0, 60, 120]]), unit="s")  # exact-boundary cases
    lpd = pd.DataFrame({"lid": np.arange(60), "ts": lt})
    rpd = pd.DataFrame({"rid": np.arange(53), "ts": rt})
    got = range_join(spark.createDataFrame(lpd), spark.createDataFrame(rpd),
                     tolerance_seconds=60.0).toPandas()
    got_pairs = sorted(zip(got["lid"], got["r_rid"]))
    assert len(got_pairs) == len(set(got_pairs)), "pair emitted twice"
    want = sorted(
        (int(l.lid), int(r.rid))
        for _, l in lpd.iterrows() for _, r in rpd.iterrows()
        if abs((l.ts - r.ts).total_seconds()) <= 60.0)
    assert got_pairs == want


def test_zorder_key_matches_local_morton(spark):
    """Engine Morton key equals a bit-by-bit local interleave, and sorting
    by it clusters each cell's pixels contiguously."""
    from satellitetools_spark.operators.spatial import cluster_by_zorder, zorder_key

    rng = np.random.RandomState(3)
    pdfx = rng.uniform(0, 5_000_000, 200)
    pdfy = rng.uniform(0, 9_000_000, 200)
    import pandas as pd
    df = spark.createDataFrame(pd.DataFrame(
        {"i": np.arange(200), "x": pdfx, "y": pdfy}))
    out = df.withColumn("zkey", zorder_key(F.col("x"), F.col("y"))) \
        .toPandas().sort_values("i")

    def local_morton(x, y, cell=160.0, bits=31):
        cx, cy = int(np.floor(x / cell)) % 2**bits, int(np.floor(y / cell)) % 2**bits
        k = 0
        for b in range(bits):
            k |= ((cx >> b) & 1) << (2 * b)
            k |= ((cy >> b) & 1) << (2 * b + 1)
        return k

    for r in out.itertuples(index=False):
        assert r.zkey == local_morton(r.x, r.y), (r.x, r.y)
        assert r.zkey >= 0

    # range partition + partition-local sort => concatenating partitions
    # in range order (what toPandas does) is globally nondecreasing
    clustered = cluster_by_zorder(df, 4).toPandas()
    assert (np.diff(clustered["zkey"].values) >= 0).all()
    assert set(clustered["i"]) == set(range(200))


def test_sessionize_matches_local_scan(spark):
    """Window sessionization equals a per-key linear scan, including the
    strictly-greater boundary (gap == gap_seconds stays in-session)."""
    import pandas as pd

    from satellitetools_spark.operators.temporal import sessionize

    rng = np.random.RandomState(19)
    base = pd.Timestamp("2024-01-01")
    rows = []
    for uid in range(6):
        t = base
        for i in range(rng.randint(5, 25)):
            # include exact-gap steps (600s) to pin the strict inequality
            step = int(rng.choice([1, 30, 600, 601, 5000]))
            t = t + pd.Timedelta(seconds=step)
            rows.append((uid, t, len(rows)))
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "rid"])

    got = sessionize(spark.createDataFrame(pdf), key=["user_id"],
                     gap_seconds=600.0).toPandas() \
        .sort_values("rid").reset_index(drop=True)

    want = []
    for uid, g in pdf.sort_values(["user_id", "ts"]).groupby("user_id"):
        seq, prev = 0, None
        for _, r in g.iterrows():
            if prev is None or (r.ts - prev).total_seconds() > 600.0:
                seq += 1
            prev = r.ts
            want.append((r.rid, seq))
    want = pd.DataFrame(want, columns=["rid", "seq"]) \
        .sort_values("rid").reset_index(drop=True)
    assert got["session_seq"].astype(int).tolist() == want["seq"].tolist()


def test_time_grid_fill_matches_pandas_resample(spark):
    """Grid fill equals a pandas merge_asof against the explicit tick grid:
    ticks span ceil(min/step)*step .. max, every tick carries the latest
    observation at or before it."""
    import pandas as pd

    from satellitetools_spark.operators.temporal import time_grid_fill

    rng = np.random.RandomState(23)
    rows = []
    for uid in range(4):
        t = pd.Timestamp("2024-03-01") + pd.Timedelta(
            seconds=int(rng.randint(0, 3600)))
        for i in range(rng.randint(3, 12)):
            rows.append((uid, t, float(rng.rand())))
            t = t + pd.Timedelta(seconds=int(rng.randint(1, 7200)))
    obs = pd.DataFrame(rows, columns=["user_id", "ts", "v"])

    step = 1800.0
    got = time_grid_fill(spark.createDataFrame(obs), key=["user_id"],
                         step_seconds=step, right_cols=["v"]).toPandas() \
        .sort_values(["user_id", "tick_ts"]).reset_index(drop=True)

    want_rows = []
    for uid, g in obs.groupby("user_id"):
        mn, mx = g.ts.min(), g.ts.max()
        lo_us = -(-mn.value // 1000 // int(step * 1e6)) * int(step * 1e6)
        ticks = []
        t_us = lo_us
        while t_us <= mx.value // 1000:
            ticks.append(pd.Timestamp(t_us * 1000))
            t_us += int(step * 1e6)
        grid = pd.DataFrame({"user_id": uid, "tick_ts": ticks})
        m = pd.merge_asof(grid.sort_values("tick_ts"),
                          g.sort_values("ts").rename(columns={"ts": "ref_ts"}),
                          left_on="tick_ts", right_on="ref_ts",
                          by="user_id", direction="backward")
        want_rows.append(m)
    want = pd.concat(want_rows).sort_values(["user_id", "tick_ts"]) \
        .reset_index(drop=True)
    assert len(got) == len(want)
    assert got["tick_ts"].equals(want["tick_ts"])
    assert np.allclose(got["ref_v"].values, want["v"].values)


def test_pps_sample_matches_local_and_is_layout_stable(spark):
    """PPS membership equals the local integer-arithmetic reimplementation
    and is invariant under repartitioning; include_prob caps at 1."""
    import pandas as pd

    from satellitetools_spark.operators import sampling as SAMP

    docs = _docs(spark).select("doc_id", "n_chars")
    got = SAMP.pps_sample(docs, weight_col="n_chars", ref_weight=400) \
        .toPandas().sort_values("doc_id").reset_index(drop=True)

    B, Mm, denom = 131, 1_000_000_007, 100_000

    def local_hash(s):
        acc = 0
        for ch in s:
            acc = (acc * B + ord(ch)) % Mm
        return acc

    pdf = docs.toPandas()
    keep = []
    for _, r in pdf.iterrows():
        bucket = local_hash(f"{r.doc_id}:pps") % denom
        if bucket * 400 < int(r.n_chars) * denom:
            keep.append((str(r.doc_id), bucket,
                         min(1.0, int(r.n_chars) / 400.0)))
    keep = sorted(keep)
    got_rows = sorted(
        (str(r.doc_id), int(r.sample_bucket), float(r.include_prob))
        for r in got.itertuples(index=False))
    assert [(g[0], g[1]) for g in got_rows] == [(k[0], k[1]) for k in keep]
    assert np.allclose([g[2] for g in got_rows], [k[2] for k in keep])
    assert (got["include_prob"] <= 1.0).all()

    re = SAMP.pps_sample(docs.repartition(13), weight_col="n_chars",
                         ref_weight=400).toPandas()
    assert sorted(re["doc_id"]) == sorted(got["doc_id"])


def test_focal_stats_matches_bruteforce(spark):
    """Focal 3x3 mean equals a brute-force NumPy neighborhood scan over a
    synthetic sparse grid with NULL holes and scene separation."""
    import pandas as pd

    from satellitetools_spark.operators.spatial import focal_stats

    rng = np.random.RandomState(31)
    rows = []
    for doc in ("a", "b"):
        gsd = 20.0 if doc == "a" else 10.0
        for k in range(120):
            i, j = int(rng.randint(0, 12)), int(rng.randint(0, 12))
            v = float(rng.rand())
            if rng.rand() < 0.15:
                v = None  # nodata hole
            rows.append((doc, (i + 0.5) * gsd, (j + 0.5) * gsd, gsd, v))
    pdf = pd.DataFrame(rows, columns=["doc_id", "x", "y", "gsd", "v"]) \
        .drop_duplicates(["doc_id", "x", "y"])

    got = focal_stats(
        spark.createDataFrame(pdf), "v").toPandas() \
        .sort_values(["doc_id", "ix", "iy"]).reset_index(drop=True)

    cells = {(r.doc_id, int(r.x // r.gsd), int(r.y // r.gsd)): r.v
             for r in pdf.itertuples(index=False)}
    for r in got.itertuples(index=False):
        vals = [cells[(r.doc_id, r.ix + dx, r.iy + dy)]
                for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                if (r.doc_id, r.ix + dx, r.iy + dy) in cells]
        vals = [v for v in vals if v is not None and not np.isnan(v)]
        assert r.n_neigh == len(vals), (r.doc_id, r.ix, r.iy)
        if vals:
            assert abs(r.focal_mean - np.mean(vals)) < 1e-9
        else:
            assert np.isnan(r.focal_mean)


def test_interpolate_to_grid_known_values(spark):
    """Hand-checkable stream: obs at 00:30→2.0, 02:30→6.0, 03:00→0.0 on a
    1 h grid → ticks 01:00 (3.0), 02:00 (5.0), 03:00 (0.0, == last obs on
    grid); nothing before the first or after the last observation."""
    from satellitetools_spark.operators.temporal import interpolate_to_grid
    rows = [(1, "2024-01-01 00:30:00", 2.0),
            (1, "2024-01-01 02:30:00", 6.0),
            (1, "2024-01-01 03:00:00", 0.0),
            (2, "2024-01-01 05:00:00", 9.0)]  # single obs, on grid
    df = spark.createDataFrame(rows, "user_id int, ts string, value double")
    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    out = interpolate_to_grid(df, key=["user_id"], step_seconds=3600.0)
    got = {(r.user_id, str(r.tick_ts)): r.interp_value
           for r in out.collect()}
    assert got == {
        (1, "2024-01-01 01:00:00"): 3.0,
        (1, "2024-01-01 02:00:00"): 5.0,
        (1, "2024-01-01 03:00:00"): 0.0,
        (2, "2024-01-01 05:00:00"): 9.0,
    }


def test_cell_pyramid_levels_consistent(spark):
    """Each coarser level must equal a direct groupBy at that cell size
    (floor-division composition identity), and per-level totals must all
    equal the raw non-null count/sum."""
    from satellitetools_spark.operators.spatial import cell_pyramid
    rng = np.random.default_rng(7)
    n = 4000
    pdf = pd.DataFrame({
        "x": rng.uniform(-500.0, 3000.0, n),
        "y": rng.uniform(-500.0, 3000.0, n),
        "v": np.where(rng.random(n) < 0.1, np.nan, rng.normal(0.3, 0.2, n)),
    })
    df = spark.createDataFrame(pdf)
    df = df.withColumn("v", F.when(~F.isnan("v"), F.col("v")))
    out = cell_pyramid(df, "v", levels=3, base_m=20.0).toPandas()
    raw = df.toPandas()
    raw_n = raw["v"].notna().sum()
    raw_sum = raw["v"].sum()
    for lvl in (0, 1, 2):
        size = 20.0 * (2 ** lvl)
        sub = out[out.level == lvl]
        assert sub["n"].sum() == raw_n
        assert abs(sub["sum_v"].sum() - raw_sum) < 1e-9
        direct = (raw.assign(cx=np.floor(raw.x / size).astype(np.int64),
                             cy=np.floor(raw.y / size).astype(np.int64))
                     .groupby(["cx", "cy"])["v"]
                     .agg(n="count", s="sum", mn="min", mx="max"))
        got = sub.set_index(["cx", "cy"]).sort_index()
        assert len(got) == len(direct)
        direct = direct.sort_index()
        assert (got["n"].to_numpy() == direct["n"].to_numpy()).all()
        np.testing.assert_allclose(
            got["mean_v"].to_numpy(),
            (direct["s"] / direct["n"]).to_numpy(), rtol=1e-12)


def test_profile_exact_and_approx(spark):
    """Exact profile equals pandas ground truth; approx mode keeps the
    same schema with distinct counts within HLL tolerance."""
    from satellitetools_spark.operators.text import profile
    docs = _docs(spark).select("doc_id", "lang", "n_chars")
    pdf = docs.toPandas()
    out = {r["column"]: r for r in
           profile(docs, exact=True).collect()}
    assert set(out) == {"doc_id", "lang", "n_chars"}
    for c in out:
        assert out[c]["n_rows"] == len(pdf)
        assert out[c]["n_nonnull"] == pdf[c].notna().sum()
        assert out[c]["n_distinct"] == pdf[c].nunique()
    assert out["lang"]["mean_num"] is None
    assert abs(out["n_chars"]["mean_num"] - pdf["n_chars"].mean()) < 1e-9
    assert out["doc_id"]["min_s"] == str(pdf["doc_id"].min())
    approx = {r["column"]: r for r in
              profile(docs, exact=False).collect()}
    for c in approx:
        exact_nd = out[c]["n_distinct"]
        assert abs(approx[c]["n_distinct"] - exact_nd) <= 0.1 * exact_nd


def test_pca_matches_local_numpy(spark):
    """Distributed moment pass + driver eigensolve against a plain local
    PCA: mean/eigenvalues/components (deterministic sign) and the
    projected coordinates must all agree."""
    emb = spark.read.parquet(os.path.join(TESTDATA, "embeddings.parquet"))
    pdf = emb.select("vec_id", "embedding").toPandas()
    X = np.vstack([np.asarray(v, dtype=np.float64)
                   for v in pdf["embedding"]])
    n = X.shape[0]
    mu_l = X.mean(0)
    cov_l = (X.T @ X) / n - np.outer(mu_l, mu_l)
    vals_l, vecs_l = np.linalg.eigh(cov_l)
    order = np.argsort(vals_l)[::-1][:8]
    w_l = vecs_l[:, order].T
    for j in range(8):
        i = int(np.argmax(np.abs(w_l[j])))
        if w_l[j, i] < 0:
            w_l[j] = -w_l[j]

    mu, vals, w = SIM.pca_components(emb, k=8)
    np.testing.assert_allclose(mu, mu_l, atol=1e-9)
    np.testing.assert_allclose(vals, vals_l[order], atol=1e-9)
    np.testing.assert_allclose(w, w_l, atol=1e-6)
    assert np.allclose(w @ w.T, np.eye(8), atol=1e-9)  # orthonormal

    got = (SIM.pca_project(emb, components=(mu, w))
           .select("vec_id", "pca").toPandas()
           .set_index("vec_id").loc[pdf["vec_id"]])
    P = np.vstack([np.asarray(v) for v in got["pca"]])
    np.testing.assert_allclose(P, (X - mu_l) @ w_l.T, atol=1e-8)


def test_char_ngram_lm_matches_local_counts(spark):
    """Crafted corpus vs a local Python reimplementation of the smoothed
    trigram scorer (incl. a too-short doc → NULL score, n_ngrams 0)."""
    from collections import Counter
    from satellitetools_spark.operators.text import char_ngram_lm_scores
    texts = {1: "abcabcab", 2: "abcd abcd", 3: "zzzz", 4: "ab"}
    df = spark.createDataFrame(list(texts.items()), "doc_id int, text string")
    out = {r.doc_id: r for r in
           char_ngram_lm_scores(df, n=3, k=1.0, vocab=96.0).collect()}

    tri, ctx = Counter(), Counter()
    for t in texts.values():
        for i in range(len(t) - 2):
            tri[t[i:i + 3]] += 1
    for g, c in tri.items():
        ctx[g[:2]] += c
    for d, t in texts.items():
        grams = [t[i:i + 3] for i in range(len(t) - 2)]
        assert out[d].n_ngrams == len(grams)
        if not grams:
            assert out[d].avg_logp is None
            continue
        lp = sum(np.log((tri[g] + 1.0) / (ctx[g[:2]] + 96.0))
                 for g in grams) / len(grams)
        assert abs(out[d].avg_logp - lp) < 1e-9
        assert abs(out[d].ppl - np.exp(-lp)) < 1e-6


def test_focal_conv_sobel_matches_scipy_style_local(spark):
    """Sobel gx/gy on a small synthetic raster vs a local dense stencil
    loop (partial borders, a nodata hole, and center-payload carry)."""
    from satellitetools_spark.operators.spatial import (
        focal_conv, SOBEL_GX, SOBEL_GY)
    rng = np.random.default_rng(3)
    w, h = 12, 9
    vals = rng.normal(0.4, 0.2, (h, w))
    vals[4, 5] = np.nan  # nodata hole
    rows = [("d1", (cx + 0.5) * 10.0, (cy + 0.5) * 10.0, 10.0,
             None if np.isnan(vals[cy, cx]) else float(vals[cy, cx]))
            for cy in range(h) for cx in range(w)]
    df = spark.createDataFrame(
        rows, "doc_id string, x double, y double, gsd double, v double")
    out = focal_conv(df, "v", {"gx": SOBEL_GX, "gy": SOBEL_GY})
    got = {(r.ix, r.iy): r for r in out.collect()}
    assert len(got) == w * h
    for cy in range(h):
        for cx in range(w):
            gx = gy = 0.0
            n = 0
            any_val = False
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    nx, ny = cx + dx, cy + dy
                    if 0 <= nx < w and 0 <= ny < h and \
                            not np.isnan(vals[ny, nx]):
                        n += 1
                        any_val = True
                        gx += dx * (2 - abs(dy)) * vals[ny, nx]
                        gy += dy * (2 - abs(dx)) * vals[ny, nx]
            r = got[(cx, cy)]
            assert r.n_neigh == n
            if any_val:
                assert abs(r.gx - gx) < 1e-9 and abs(r.gy - gy) < 1e-9
            else:
                assert r.gx is None and r.gy is None


def test_incremental_stats_fold_matches_oneshot(spark, tmp_path):
    """Three increments folded in sequence (with a parquet state
    round-trip between merges, as a real pipeline would persist it)
    must equal the one-shot aggregate over the union."""
    from satellitetools_spark.plans import incremental as INC
    ev = (spark.read.parquet(os.path.join(TESTDATA, "events.parquet"))
          .select("user_id", "event_type", "value"))
    parts = [ev.filter(F.pmod(F.col("user_id"), F.lit(3)) == i)
             for i in range(3)]
    keys = ["event_type"]
    state = INC.partial_stats(parts[0], keys, "value")
    for p in parts[1:]:
        path = str(tmp_path / f"state_{id(p)}")
        state.write.mode("overwrite").parquet(path)
        state = INC.merge_stats(spark.read.parquet(path),
                                INC.partial_stats(p, keys, "value"), keys)
    got = (INC.finalize_stats(state, keys).toPandas()
           .set_index("event_type").sort_index())
    ref = (INC.finalize_stats(INC.partial_stats(ev, keys, "value"), keys)
           .toPandas().set_index("event_type").sort_index())
    assert (got["n"] == ref["n"]).all()
    for c in ("mean", "std", "min", "max"):
        np.testing.assert_allclose(got[c], ref[c], rtol=1e-9)


def test_expectations_crafted_suite(spark):
    """Crafted frame with known nulls/dups/range violations — each
    constraint's metric and verdict must match hand-computed values."""
    from satellitetools_spark.operators import checks as CHK
    rows = [(1, "aa", 10.0), (2, "bb", 20.0), (2, None, -5.0),
            (3, "cc", 300.0), (None, "d4", 40.0)]
    df = spark.createDataFrame(rows, "id int, code string, v double")
    suite = [
        CHK.expect_min_rows(5),
        CHK.expect_not_null("id"),                 # 1/5 null -> fail
        CHK.expect_unique("id"),                   # 1 dup of 4 -> fail
        CHK.expect_in_range("v", 0.0, 100.0),      # 2/5 out -> fail
        CHK.expect_matches("code", "^[a-z][a-z]$", 0.5),  # 3/4 -> pass
    ]
    got = {r.check_name: r for r in CHK.expectations(df, suite).collect()}
    assert got["min_rows[5]"].metric == 5.0 and got["min_rows[5]"].passed
    assert abs(got["not_null"].metric - 0.2) < 1e-12
    assert not got["not_null"].passed
    assert abs(got["unique"].metric - 0.25) < 1e-12
    assert not got["unique"].passed
    assert abs(got["in_range[0.0,100.0]"].metric - 0.4) < 1e-12
    assert not got["in_range[0.0,100.0]"].passed
    m = got["matches[^[a-z][a-z]$]"]
    assert abs(m.metric - 0.75) < 1e-12 and m.passed


def test_rolling_zscore_matches_pandas(spark):
    """Trailing-window z-score vs pandas rolling (shifted, population
    ddof=0), incl. min-support NULLs and the anomaly flag."""
    from satellitetools_spark.operators.temporal import rolling_zscore
    ev = (spark.read.parquet(os.path.join(TESTDATA, "events.parquet"))
          .select("user_id", "ts", "value"))
    out = (rolling_zscore(ev, window=24, min_periods=8, z_thresh=2.5)
           .toPandas())
    pdf = ev.toPandas().sort_values(["user_id", "ts"])
    g = pdf.groupby("user_id")["value"]
    m = g.transform(lambda s: s.shift(1).rolling(24, min_periods=1).mean())
    sd = g.transform(lambda s: s.shift(1).rolling(24, min_periods=1)
                     .std(ddof=0))
    n = g.transform(lambda s: s.shift(1).rolling(24, min_periods=1).count())
    z = (pdf["value"] - m) / sd
    z[(n < 8) | ~(sd > 0)] = np.nan
    ref = pdf.assign(z_ref=z, n_ref=n.fillna(0).astype(int))
    j = out.merge(ref, on=["user_id", "ts"], suffixes=("", "_r"))
    assert len(j) == len(out)
    assert (j["n_prev"] == j["n_ref"]).all()
    both_nan = j["z"].isna() & j["z_ref"].isna()
    np.testing.assert_allclose(j.loc[~both_nan, "z"],
                               j.loc[~both_nan, "z_ref"], atol=1e-9)
    assert (j["is_anomaly"] == (j["z"].abs() > 2.5).fillna(False)).all()


def test_pq_rerank_recall_and_code_shape(spark):
    """PQ ADC shortlist + exact rerank must reach recall >= 0.8@10 vs
    brute force on the clustered embeddings; codes must be m sub-ids
    drawn from the ksub seed set."""
    emb = spark.read.parquet(os.path.join(TESTDATA, "embeddings.parquet"))
    qids = [r.vec_id for r in emb.select("vec_id").limit(8).collect()]
    codes, cent = SIM.pq_encode(emb, m=16, ksub=16)
    crows = codes.limit(20).collect()
    cids = {r.centroid_id for r in cent.select("centroid_id").collect()}
    assert len(cids) == 16
    for r in crows:
        assert len(r.codes) == 16 and set(r.codes) <= cids
    bf = SIM.cosine_topk(emb, qids, k=10).collect()
    pq = SIM.pq_topk(emb, qids, k=10, m=16, ksub=16, rerank=100).collect()
    from collections import defaultdict
    b, p = defaultdict(set), defaultdict(set)
    for r in bf:
        b[r.query_id].add(r.neighbor_id)
    for r in pq:
        p[r.query_id].add(r.neighbor_id)
    rec = sum(len(b[q] & p[q]) / 10 for q in qids) / len(qids)
    assert rec >= 0.8, rec


def test_ewma_matches_local_loop(spark):
    """Windowed EWMA vs a local truncated-weight loop (present-lag
    normalization at stream heads)."""
    from satellitetools_spark.operators.temporal import ewma
    ev = (spark.read.parquet(os.path.join(TESTDATA, "events.parquet"))
          .select("user_id", "ts", "value"))
    out = ewma(ev, alpha=0.3, window=12).toPandas()
    pdf = ev.toPandas().sort_values(["user_id", "ts"])
    decay = 0.7

    def ref(s):
        vals = s.to_numpy()
        r = np.empty(len(vals))
        for t in range(len(vals)):
            num = den = 0.0
            for j in range(min(12, t + 1)):
                wj = decay ** j
                num += wj * vals[t - j]
                den += wj
            r[t] = num / den
        return pd.Series(r, index=s.index)

    pdf["ref"] = pdf.groupby("user_id")["value"].transform(ref)
    j = out.merge(pdf, on=["user_id", "ts"], suffixes=("", "_r"))
    assert len(j) == len(out)
    np.testing.assert_allclose(j["ewma"], j["ref"], atol=1e-9)


def test_bm25_matches_local(spark):
    """BM25 vs a local Counter reimplementation on a crafted corpus."""
    import math
    import re
    from collections import Counter
    from satellitetools_spark.operators.text import bm25_topk
    texts = {1: "hash join hash join scan", 2: "hash scan filter",
             3: "vector vector vector hash", 4: "sort merge order",
             5: "join"}
    df = spark.createDataFrame(list(texts.items()),
                               "doc_id int, text string")
    got = {r.doc_id: r for r in
           bm25_topk(df, ["hash", "vector"], k=5).collect()}

    toks = {d: re.findall("[a-z0-9]+", t.lower()) for d, t in texts.items()}
    N = len(texts)
    avgdl = sum(len(v) for v in toks.values()) / N
    k1, b = 1.2, 0.75
    want = {}
    for term in ("hash", "vector"):
        dfreq = sum(1 for v in toks.values() if term in v)
        idf = math.log(1 + (N - dfreq + 0.5) / (dfreq + 0.5))
        for d, v in toks.items():
            tf = Counter(v)[term]
            if tf:
                s = idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(v) / avgdl))
                want[d] = want.get(d, 0.0) + s
    assert set(got) == set(want)
    for d, s in want.items():
        assert abs(got[d].bm25 - round(s, 6)) < 1e-6


def test_wrs_sample_deterministic_and_weight_biased(spark):
    """A-ES sample: exact size, re-run identical, layout-independent,
    and long-document-biased (mean sampled weight > corpus mean)."""
    docs = _docs(spark).select("doc_id", "n_chars")
    s1 = SAMP.wrs_sample(docs, "n_chars", n=100).collect()
    s2 = SAMP.wrs_sample(docs.repartition(13), "n_chars", n=100).collect()
    assert len(s1) == 100
    assert {r.doc_id for r in s1} == {r.doc_id for r in s2}
    mean_corpus = docs.agg(F.avg("n_chars")).collect()[0][0]
    mean_sample = sum(r.n_chars for r in s1) / 100
    assert mean_sample > mean_corpus


def test_pagerank_matches_local_power_iteration(spark):
    """3-iteration PageRank on a crafted graph vs a local dense power
    iteration (undirected symmetrization, no dangling nodes)."""
    from satellitetools_spark.operators.graph import pagerank
    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (10, 11)]
    df = spark.createDataFrame(pairs, "doc_a int, doc_b int")
    got = {r.node: r.pr for r in pagerank(df, iters=3).collect()}

    nodes = sorted({a for a, _ in pairs} | {b for _, b in pairs})
    idx = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for a, b in pairs:
        A[idx[a], idx[b]] = A[idx[b], idx[a]] = 1.0
    deg = A.sum(1)
    p = np.full(len(nodes), 1.0 / len(nodes))
    for _ in range(3):
        p = (1 - 0.85) / len(nodes) + 0.85 * (A.T @ (p / deg))
    for v in nodes:
        assert abs(got[v] - round(p[idx[v]], 9)) < 1e-8


def test_rrf_fuse_known_rankings(spark):
    """RRF on two crafted rankings: overlap candidates outrank
    single-ranker ones; scores match the 1/(60+r) fold."""
    from satellitetools_spark.operators.similarity import rrf_fuse
    r1 = spark.createDataFrame([(1, 1), (2, 2), (3, 3)],
                               "doc_id int, rank int")
    r2 = spark.createDataFrame([(3, 1), (4, 2), (1, 3)],
                               "doc_id int, rank int")
    got = {r.doc_id: r for r in rrf_fuse([r1, r2], k=4).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert abs(got[1].rrf_score - round(1 / 61 + 1 / 63, 9)) < 1e-9
    assert abs(got[3].rrf_score - round(1 / 63 + 1 / 61, 9)) < 1e-9
    assert got[1].n_rankers == 2 and got[2].n_rankers == 1
    order = sorted(got.values(), key=lambda r: -r.rrf_score)
    assert {order[0].doc_id, order[1].doc_id} == {1, 3}


def test_salted_join_equals_plain_join(spark):
    """Salted fact-to-hot-dimension join returns exactly the plain
    join's rows (inner and left, incl. unmatched-left NULLs)."""
    from satellitetools_spark.operators.skew import salted_join
    docs = _docs(spark).select("doc_id", "lang", "n_chars")
    dim = (docs.groupBy("lang")
           .agg(F.avg("n_chars").alias("lang_mean"))
           .filter(F.col("lang") != "en"))  # force unmatched keys
    for how in ("inner", "left"):
        got = (salted_join(docs, dim, "lang", n_salt=8, how=how)
               .toPandas().sort_values("doc_id").reset_index(drop=True))
        ref = (docs.join(dim, "lang", how)
               .toPandas().sort_values("doc_id").reset_index(drop=True))
        assert len(got) == len(ref)
        got = got[sorted(got.columns)]
        ref = ref[sorted(ref.columns)]
        pd.testing.assert_frame_equal(got, ref, check_like=True)


def test_triangle_count_known_graph(spark):
    # K4 on a-d (4 triangles, each node in 3) plus a pendant edge d-e
    # and an isolated edge f-g (zero triangles each)
    edges = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
             ("c", "d"), ("d", "e"), ("f", "g"),
             ("b", "a")]  # duplicate in reverse order must not double-count
    from satellitetools_spark.operators.graph import triangle_count
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {r["node"]: r["n_tri"]
           for r in triangle_count(pairs).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3, "e": 0, "f": 0, "g": 0}


def test_kmv_estimate_within_error_bound(spark):
    # 2000 distinct synthetic tokens; KMV(k=256) must land within the
    # ~3/sqrt(k) relative-error envelope of the exact count
    from satellitetools_spark.operators.sketch import kmv_distinct
    docs = spark.createDataFrame(
        [(f"d{i}", " ".join(f"tok{i}x{j}" for j in range(10)),)
         for i in range(200)], ["doc_id", "text"])
    row = kmv_distinct(docs, k=256).collect()[0]
    assert row["exact_distinct"] == 2000
    assert row["n_kept"] == 256
    rel = abs(row["est_distinct"] - 2000) / 2000
    assert rel < 3.0 / (256 ** 0.5), rel


def test_kmv_small_cardinality_is_exact(spark):
    from satellitetools_spark.operators.sketch import kmv_distinct
    docs = spark.createDataFrame(
        [("d0", "alpha beta gamma alpha beta",)], ["doc_id", "text"])
    row = kmv_distinct(docs, k=256).collect()[0]
    assert row["n_kept"] == 3
    assert row["est_distinct"] == 3.0 == float(row["exact_distinct"])


def test_pmi_bigrams_crafted_collocation(spark):
    # "new york" always adjacent; "the" everywhere — the collocation
    # must outrank any bigram involving the stopword
    from satellitetools_spark.operators.text import pmi_bigrams
    rows = [(f"d{i}", "the new york office near the station",)
            for i in range(10)]
    out = pmi_bigrams(spark.createDataFrame(rows, ["doc_id", "text"]),
                      min_count=5, k=10).collect()
    by_pair = {(r["w1"], r["w2"]): r for r in out}
    assert ("new", "york") in by_pair
    top = out[0]
    assert (top["w1"], top["w2"]) != ("the", "new")
    pmi_ny = by_pair[("new", "york")]["pmi"]
    for (w1, w2), r in by_pair.items():
        if "the" in (w1, w2):
            assert r["pmi"] < pmi_ny


def test_funnel_strict_after_semantics(spark):
    import datetime as dt
    from satellitetools_spark.operators.temporal import funnel
    T = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        # u1 completes the full ordered funnel
        (1, "view", T(0)), (1, "click", T(5)), (1, "purchase", T(9)),
        # u2's click PRECEDES its first view -> stops at view
        (2, "click", T(1)), (2, "view", T(2)), (2, "purchase", T(3)),
        # wait: u2 purchase at T(3) > t0=T(2) but needs click AFTER view;
        # no click after T(2) -> must NOT reach purchase
        # u3 never views -> not even in the funnel base
        (3, "click", T(0)), (3, "purchase", T(1)),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    out = {r["event_type"]: r for r in
           funnel(ev, ["view", "click", "purchase"]).collect()}
    assert out["view"]["n_users"] == 2
    assert out["click"]["n_users"] == 1
    assert out["purchase"]["n_users"] == 1
    assert out["view"]["avg_seconds"] == 0.0
    assert out["click"]["avg_seconds"] == 300.0
    assert out["purchase"]["avg_seconds"] == 540.0
    assert out["click"]["conv_rate"] == 0.5


def test_distance_join_matches_bruteforce(spark):
    import itertools
    from satellitetools_spark.operators.spatial import distance_join
    rng = np.random.RandomState(7)
    pts = [(f"p{i}", float(x), float(y)) for i, (x, y) in
           enumerate(rng.uniform(0, 3000, size=(300, 2)))]
    sts = [(int(j), float(sx), float(sy)) for j, (sx, sy) in
           enumerate(rng.uniform(0, 3000, size=(12, 2)))]
    r = 450.0
    want = {(p[0], s[0]) for p, s in itertools.product(pts, sts)
            if (p[1] - s[1]) ** 2 + (p[2] - s[2]) ** 2 <= r * r}
    px = spark.createDataFrame(pts, ["doc_id", "x", "y"])
    st = spark.createDataFrame(sts, ["station_id", "sx", "sy"])
    got_rows = distance_join(px, st, radius=r).collect()
    got = {(row["doc_id"], row["station_id"]) for row in got_rows}
    assert got == want and len(want) > 0
    for row in got_rows:
        assert row["dist"] <= r


def test_retention_crafted_cohorts(spark):
    import datetime as dt
    from satellitetools_spark.operators.temporal import retention
    W = lambda wk, d=0: dt.datetime(2024, 1, 1 + 7 * wk + d, 12)  # Mondays
    rows = [
        # cohort week0: u1 active w0+w1+w2, u2 active w0 only
        (1, W(0)), (1, W(1)), (1, W(2)), (2, W(0, 3)),
        # cohort week1: u3 active w1 and w3 (skips w2)
        (3, W(1)), (3, W(3)),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {(r["cohort_week"], r["offset"]): (r["n_active"], r["n_cohort"],
                                             r["retention"])
           for r in retention(ev).collect()}
    assert got[("2024-01-01", 0)] == (2, 2, 1.0)
    assert got[("2024-01-01", 1)] == (1, 2, 0.5)
    assert got[("2024-01-01", 2)] == (1, 2, 0.5)
    assert got[("2024-01-08", 0)] == (1, 1, 1.0)
    assert got[("2024-01-08", 2)] == (1, 1, 1.0)
    assert ("2024-01-08", 1) not in got


def test_rollup_counts_levels_consistent(spark):
    import datetime as dt
    from satellitetools_spark.operators.temporal import rollup_counts
    rows = [(dt.datetime(2024, 1, 1, 5), "a", 1.0),
            (dt.datetime(2024, 1, 1, 9), "b", 2.0),
            (dt.datetime(2024, 1, 2, 5), "a", 4.0)]
    ev = spark.createDataFrame(rows, ["ts", "event_type", "value"])
    got = {(r["day"], r["dim"]): (r["n"], r["value_sum"])
           for r in rollup_counts(ev).collect()}
    assert got[("2024-01-01", "a")] == (1, 1.0)
    assert got[("2024-01-01", "ALL")] == (2, 3.0)
    assert got[("2024-01-02", "ALL")] == (1, 4.0)
    assert got[("ALL", "ALL")] == (3, 7.0)
    assert len(got) == 6


def test_line_dedup_crafted_boilerplate(spark):
    from satellitetools_spark.operators.text import line_dedup
    rows = [
        # "HEADER" appears in all 3 docs -> removed everywhere;
        # empty lines and unique lines survive; order preserved
        ("d1", 1, "HEADER"), ("d1", 2, "alpha"), ("d1", 3, ""),
        ("d1", 4, "omega"),
        ("d2", 1, "HEADER"), ("d2", 2, "beta"),
        ("d3", 1, "HEADER"), ("d3", 2, "HEADER"), ("d3", 3, "gamma"),
    ]
    lines = spark.createDataFrame(rows, ["doc_id", "pos", "line"])
    got = {r["doc_id"]: r for r in
           line_dedup(lines, max_occurrences=1).collect()}
    assert got["d1"]["clean_text"] == "alpha  omega"  # empty line kept
    assert (got["d1"]["n_kept"], got["d1"]["n_removed"]) == (3, 1)
    assert got["d2"]["clean_text"] == "beta"
    # within-doc repetition still counts ONE distinct doc, but both
    # occurrences are removed once the cross-doc threshold trips
    assert got["d3"]["clean_text"] == "gamma"
    assert got["d3"]["n_removed"] == 2


def test_line_dedup_within_doc_repeat_not_removed(spark):
    from satellitetools_spark.operators.text import line_dedup
    rows = [("d1", 1, "solo"), ("d1", 2, "solo"), ("d2", 1, "other")]
    lines = spark.createDataFrame(rows, ["doc_id", "pos", "line"])
    got = {r["doc_id"]: r for r in
           line_dedup(lines, max_occurrences=1).collect()}
    # "solo" occurs twice but in ONE distinct doc -> kept
    assert got["d1"]["clean_text"] == "solo solo"
    assert got["d1"]["n_removed"] == 0


def test_kmv_by_group_matches_per_group_exact_when_small(spark):
    from satellitetools_spark.operators.sketch import kmv_distinct_by
    docs = spark.createDataFrame(
        [("d1", "en", "apple banana cherry"),
         ("d2", "en", "apple dog"),
         ("d3", "fr", "un deux trois quatre")],
        ["doc_id", "lang", "text"])
    got = {r["lang"]: r for r in
           kmv_distinct_by(docs, k=64).collect()}
    assert got["en"]["exact_distinct"] == 4
    assert got["en"]["est_distinct"] == 4.0  # < k -> exact escape
    assert got["fr"]["exact_distinct"] == 4


def test_knn_join_matches_bruteforce(spark):
    from satellitetools_spark.operators.spatial import knn_join
    rng = np.random.RandomState(11)
    pts = [(f"p{i}", float(x), float(y)) for i, (x, y) in
           enumerate(rng.uniform(0, 2000, size=(150, 2)))]
    # dense station grid: every 160 m cell center over the point extent,
    # so the radius precondition (>= k candidates within r) holds
    sts = [(ix * 100 + iy, ix * 160.0 + 80.0, iy * 160.0 + 80.0)
           for ix in range(14) for iy in range(14)]
    px = spark.createDataFrame(pts, ["doc_id", "x", "y"])
    st = spark.createDataFrame(sts, ["station_id", "sx", "sy"])
    got = knn_join(px, st, k=3, radius=480.0).collect()
    assert len(got) == 150 * 3 and not any(r["truncated"] for r in got)
    by_pt = {}
    for r in got:
        by_pt.setdefault(r["doc_id"], []).append((r["knn_rank"],
                                                  r["station_id"]))
    import math as m
    for pid, x, y in pts:
        want = sorted(((m.hypot(x - sx, y - sy), sid)
                       for sid, sx, sy in sts))[:3]
        got_ids = [sid for _, sid in sorted(by_pt[pid])]
        assert got_ids == [sid for _, sid in want], pid


def test_dup_keeper_prefers_quality_then_id(spark):
    from satellitetools_spark.operators.dedup import dup_keeper
    comp = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")],
        ["doc_id", "component"])
    scores = spark.createDataFrame(
        [("a", 0.2), ("b", 0.9), ("c", 0.9), ("x", 0.5), ("y", 0.5)],
        ["doc_id", "quality"])
    got = {r["doc_id"]: r["is_keeper"]
           for r in dup_keeper(comp, scores).collect()}
    # b beats c on id at equal quality; both beat a's low score
    assert got == {"a": False, "b": True, "c": False,
                   "x": True, "y": False}


def test_pivot_counts_stable_schema_and_zero_fill(spark):
    from satellitetools_spark.operators.checks import pivot_counts
    df = spark.createDataFrame(
        [("d1", 4), ("d1", 4), ("d1", 8), ("d2", 9)], ["doc_id", "SCL"])
    got = {r["doc_id"]: r for r in
           pivot_counts(df, "SCL", values=[4, 8, 9, 10],
                        prefix="scl_").collect()}
    assert (got["d1"]["scl_4"], got["d1"]["scl_8"],
            got["d1"]["scl_9"], got["d1"]["scl_10"]) == (2, 1, 0, 0)
    assert got["d2"]["scl_9"] == 1 and got["d2"]["scl_10"] == 0


def test_quality_percentiles_rank_semantics(spark):
    from satellitetools_spark.operators.text import quality_percentiles
    # identical texts -> tied quality -> shared percent_rank
    docs = spark.createDataFrame(
        [("a", "en", "x"), ("b", "en", "x"),
         ("c", "en", "the the the the and of a to in is on. " * 20),
         ("d", "fr", "y")],
        ["doc_id", "lang", "text"])
    got = {r["doc_id"]: r["quality_pctile"]
           for r in quality_percentiles(docs).collect()}
    assert got["a"] == got["b"] == 0.0   # tied at the bottom, shared rank
    assert got["c"] == 1.0               # best of the 3 'en' docs
    assert got["d"] == 0.0               # singleton group


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_pairs_complete_vs_bruteforce(spark):
    from satellitetools_spark.operators.text import fuzzy_token_pairs
    words = ["spark", "spork", "sprk", "sparkle", "park", "dark",
             "data", "date", "gate", "gaze", "a", "at", "cat", "table",
             "cable", "enable", "stable", "sable"]
    docs = spark.createDataFrame(
        [(f"d{i}", w) for i, w in enumerate(words)], ["doc_id", "text"])
    for d in (1, 2):
        want = {tuple(sorted((u, v))) + (_lev(u, v),)
                for i, u in enumerate(words)
                for v in words[i + 1:] if _lev(u, v) <= d}
        got = {(r["token_a"], r["token_b"], r["dist"])
               for r in fuzzy_token_pairs(docs, max_dist=d).collect()}
        assert got == want, (d, got ^ want)


def test_concurrency_daily_crafted(spark):
    import datetime as dt
    from satellitetools_spark.operators.temporal import concurrency_daily
    T = lambda h, m=0: dt.datetime(2024, 3, 1, h, m)
    rows = [
        # u1: one session 09:00-09:10; u2: 09:05-09:07 (overlaps u1);
        # u3: single event at 09:10 (point session, coincides with u1
        # end -> closed endpoints count all three? u2 ended 09:07, so
        # peak is u1+u2 = 2 then u1+u3 = 2); u4 next day alone
        (1, T(9, 0)), (1, T(9, 10)),
        (2, T(9, 5)), (2, T(9, 7)),
        (3, T(9, 10)),
        (4, dt.datetime(2024, 3, 2, 12)),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {r["day"]: r for r in concurrency_daily(ev).collect()}
    assert got["2024-03-01"]["max_concurrency"] == 2
    assert got["2024-03-01"]["n_sessions_started"] == 3
    assert got["2024-03-02"]["max_concurrency"] == 1
    assert got["2024-03-02"]["n_sessions_started"] == 1


def test_concurrency_daily_cross_midnight_session(spark):
    import datetime as dt
    from satellitetools_spark.operators.temporal import concurrency_daily
    rows = [
        # session spanning midnight: events 23:50 and 00:05 within gap
        (1, dt.datetime(2024, 3, 1, 23, 50)),
        (1, dt.datetime(2024, 3, 2, 0, 5)),
        (2, dt.datetime(2024, 3, 2, 0, 0)),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {r["day"]: r for r in concurrency_daily(ev).collect()}
    # u1's session is active on BOTH days; it STARTS only on day 1
    assert got["2024-03-01"]["n_sessions_started"] == 1
    assert got["2024-03-02"]["n_sessions_started"] == 1  # u2 only
    assert got["2024-03-02"]["max_concurrency"] == 2  # u1 spillover + u2


def test_char_entropy_known_values(spark):
    import math as m
    from satellitetools_spark.operators.text import char_entropy
    docs = spark.createDataFrame(
        [("d1", "aaaa"), ("d2", "ab"), ("d3", "abcd"), ("d4", "")],
        ["doc_id", "text"])
    got = {r["doc_id"]: r for r in char_entropy(docs).collect()}
    assert got["d1"]["char_entropy"] == 0.0
    assert got["d2"]["char_entropy"] == 1.0
    assert got["d3"]["char_entropy"] == 2.0
    assert got["d4"]["char_entropy"] == 0.0 and got["d4"]["n_chars"] == 0


def test_categorical_mode_grid_tie_order(spark):
    from satellitetools_spark.operators.spatial import categorical_mode_grid
    # cell (0,0): class 5 x2, class 3 x2 -> tie -> smaller class 3 wins
    rows = [(1.0, 1.0, 5), (2.0, 2.0, 5), (3.0, 3.0, 3), (4.0, 4.0, 3),
            (45.0, 1.0, 7)]
    px = spark.createDataFrame(rows, ["x", "y", "SCL"])
    got = {(r["cx"], r["cy"]): r for r in
           categorical_mode_grid(px, size_m=40.0).collect()}
    assert got[(0, 0)]["mode_value"] == 3
    assert got[(0, 0)]["n_votes"] == 2 and got[(0, 0)]["n_total"] == 4
    assert got[(1, 0)]["mode_value"] == 7


def test_skew_report_uniform_vs_hot(spark):
    from satellitetools_spark.operators.checks import skew_report
    uniform = spark.createDataFrame(
        [(i % 10,) for i in range(1000)], ["k"])
    hot = spark.createDataFrame(
        [(0,)] * 910 + [(i,) for i in range(1, 10)] * 10, ["k"])
    u = skew_report(uniform, "k").collect()[0]
    h = skew_report(hot, "k").collect()[0]
    assert u["gini"] == 0.0 and u["max_share"] == 0.1
    assert h["top_key"] == "0" and h["max_share"] == 0.91
    assert h["gini"] > 0.7


def test_binned_quantiles_close_to_exact(spark):
    from satellitetools_spark.operators.checks import binned_quantiles
    import numpy as np
    rng = np.random.RandomState(3)
    vals = rng.uniform(0, 1000, size=5000).tolist()
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    got = {r["p"]: r["q_est"] for r in
           binned_quantiles(df, "v", 0.0, 1000.0, n_bins=200,
                            probs=(0.25, 0.5, 0.9)).collect()}
    width = 1000.0 / 200
    for p in (0.25, 0.5, 0.9):
        exact = float(np.quantile(np.array(vals), p))
        assert abs(got[p] - exact) <= width + 1e-6, (p, got[p], exact)


def test_snapshot_diff_all_statuses(spark):
    from satellitetools_spark.operators.checks import snapshot_diff
    old = spark.createDataFrame(
        [(1, "en", 10), (2, "fr", 20), (3, "de", 30), (4, None, 40)],
        ["doc_id", "lang", "n"])
    new = spark.createDataFrame(
        [(1, "en", 10),        # unchanged
         (2, "en", 25),        # changed: lang AND n
         (4, None, 40),        # unchanged (NULL-safe equality)
         (5, "es", 50)],       # added; 3 removed
        ["doc_id", "lang", "n"])
    got = {r["doc_id"]: (r["status"], list(r["changed_cols"]))
           for r in snapshot_diff(old, new, key="doc_id",
                                  compare_cols=["lang", "n"]).collect()}
    assert got == {1: ("unchanged", []), 2: ("changed", ["lang", "n"]),
                   3: ("removed", []), 4: ("unchanged", []),
                   5: ("added", [])}


def test_bpe_merges_match_local_reference(spark):
    from collections import Counter

    from satellitetools_spark.operators.text import bpe_merges

    corpus = ["the theme thesis", "then the other theory",
              "there mother weather", "the the the"]
    docs = spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(corpus)], ["doc_id", "text"])

    # local reference: classic Sennrich merge loop over freq-weighted
    # token char sequences, greedy left-to-right application
    freq = Counter(w for t in corpus for w in t.split())
    seqs = {w: list(w) for w in freq}
    want = []
    for rank in range(1, 6):
        counts = Counter()
        for w, s in seqs.items():
            for x, y in zip(s, s[1:]):
                counts[(x, y)] += freq[w]
        (a, b), cnt = min(counts.items(),
                          key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        want.append((rank, a, b, a + b, cnt))
        for w, s in seqs.items():
            out = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            seqs[w] = out

    got = [(r["rank"], r["p1"], r["p2"], r["pair"], r["cnt"])
           for r in bpe_merges(docs, n_merges=5)
           .orderBy("rank").collect()]
    assert got == want


def test_bpe_encode_matches_local_apply(spark):
    from collections import Counter

    from satellitetools_spark.operators.text import bpe_encode

    corpus = ["the theme thesis", "then the other theory",
              "there mother weather", "the the the", ""]
    docs = spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(corpus)], ["doc_id", "text"])

    # local Sennrich train + apply
    freq = Counter(w for t in corpus for w in t.split())
    seqs = {w: list(w) for w in freq}
    for _ in range(5):
        counts = Counter()
        for w, s in seqs.items():
            for x, y in zip(s, s[1:]):
                counts[(x, y)] += freq[w]
        (a, b), _c = min(counts.items(),
                         key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        for w, s in seqs.items():
            out = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            seqs[w] = out

    got = {r["doc_id"]: (r["n_tokens"], r["n_symbols"], r["compression"])
           for r in bpe_encode(docs, n_merges=5).collect()}
    for i, t in enumerate(corpus):
        words = t.split()
        n_sym = sum(len(seqs[w]) for w in words)
        n_chr = sum(len(w) for w in words)
        want_c = round(n_chr / n_sym, 6) if n_sym else None
        assert got[f"d{i}"] == (len(words), n_sym, want_c), (i, got[f"d{i}"])


def test_transition_counts_matrix(spark):
    import datetime as dt

    from satellitetools_spark.operators.temporal import transition_counts

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("u1", "view", t0),
        ("u1", "click", t0 + dt.timedelta(minutes=1)),
        ("u1", "view", t0 + dt.timedelta(minutes=2)),
        ("u1", "click", t0 + dt.timedelta(minutes=3)),
        ("u2", "view", t0),
        ("u2", "buy", t0 + dt.timedelta(minutes=5)),
        ("u3", "view", t0),  # single event: no transition
    ]
    ev = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    got = {(r["from_type"], r["to_type"]): (r["n"], r["p"])
           for r in transition_counts(ev).collect()}
    assert got == {("view", "click"): (2, round(2 / 3, 6)),
                   ("view", "buy"): (1, round(1 / 3, 6)),
                   ("click", "view"): (1, 1.0)}


def test_hillshade_matches_numpy_horn(spark):
    import math

    from satellitetools_spark.operators.spatial import hillshade

    # 5x5 synthetic DEM on the packed-cell grid, cell size 10 m
    cell_m = 10.0
    rng = np.random.RandomState(5)
    elev = rng.uniform(100, 500, size=(5, 5)).round(3)
    rows = [(int(iy) * 2 ** 32 + int(ix), float(elev[iy, ix]))
            for iy in range(5) for ix in range(5)]
    dem = spark.createDataFrame(rows, "cell long, elevation double")
    got = {(r["ix"], r["iy"]): (r["slope_deg"], r["hillshade"])
           for r in hillshade(dem, cell_m=cell_m).collect()}
    # interior cells only (full 3x3 support)
    assert set(got) == {(ix, iy) for ix in range(1, 4) for iy in range(1, 4)}
    az = math.radians(360.0 - 315.0 + 90.0)
    alt = math.radians(45.0)
    for (ix, iy), (s_got, h_got) in got.items():
        win = elev[iy - 1:iy + 2, ix - 1:ix + 2]
        gx = (win[0, 2] + 2 * win[1, 2] + win[2, 2]
              - win[0, 0] - 2 * win[1, 0] - win[2, 0])
        gy = (win[2, 0] + 2 * win[2, 1] + win[2, 2]
              - win[0, 0] - 2 * win[0, 1] - win[0, 2])
        dzdx, dzdy = gx / (8 * cell_m), gy / (8 * cell_m)
        slope = math.atan(math.hypot(dzdx, dzdy))
        aspect = math.atan2(dzdy, -dzdx)
        shade = max(0.0, 255.0 * (math.sin(alt) * math.cos(slope)
                                  + math.cos(alt) * math.sin(slope)
                                  * math.cos(az - aspect)))
        assert abs(s_got - math.degrees(slope)) < 1e-5, (ix, iy)
        assert abs(h_got - shade) < 1e-4, (ix, iy)


def test_sg_smooth_matches_local_fir(spark):
    from satellitetools_spark.operators.temporal import (savgol_coeffs,
                                                         sg_smooth)

    # classic check: a polynomial of degree <= order is reproduced
    # exactly at full-support points
    xs = np.arange(10, dtype=float)
    poly = 2.0 + 0.5 * xs - 0.25 * xs ** 2
    rng = np.random.RandomState(9)
    noisy = poly + rng.normal(0, 0.1, size=10)
    rows = [("a", f"2024-01-{d + 1:02d}", float(noisy[d])) for d in range(10)]
    df = spark.createDataFrame(rows, ["aoi", "date_str", "mean_v"])
    got = {r["date_str"]: r["v_smooth"]
           for r in sg_smooth(df, window=5, order=2).collect()}
    c = np.asarray(savgol_coeffs(5, 2))
    for d in range(10):
        key = f"2024-01-{d + 1:02d}"
        if d < 2 or d > 7:
            assert got[key] is None, (d, got[key])
        else:
            want = float(np.dot(c, noisy[d - 2:d + 3]))
            assert abs(got[key] - want) < 1e-6, (d, got[key], want)
    # exact-polynomial reproduction (no noise): smoothed == original
    rows2 = [("b", f"2024-02-{d + 1:02d}", float(poly[d])) for d in range(10)]
    df2 = spark.createDataFrame(rows2, ["aoi", "date_str", "mean_v"])
    got2 = {r["date_str"]: r["v_smooth"]
            for r in sg_smooth(df2, window=5, order=2).collect()}
    for d in range(2, 8):
        key = f"2024-02-{d + 1:02d}"
        assert abs(got2[key] - poly[d]) < 1e-5, (d, got2[key], poly[d])


def test_cusum_alarms_matches_local_scan(spark):
    import datetime as dt

    from satellitetools_spark.operators.temporal import cusum_alarms

    t0 = dt.datetime(2024, 1, 1)
    rng = np.random.RandomState(13)
    # u1: stationary noise then a +2σ drift — CUSUM must alarm; u2 flat
    vals_u1 = list(rng.normal(0, 1, 30)) + list(rng.normal(2, 1, 30))
    vals_u2 = list(rng.normal(5, 1, 40))
    rows = ([(1, t0 + dt.timedelta(minutes=i), float(v))
             for i, v in enumerate(vals_u1)]
            + [(2, t0 + dt.timedelta(minutes=i), float(v))
               for i, v in enumerate(vals_u2)])
    ev = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    got = {r["user_id"]: (r["n_obs"], r["n_alarms"])
           for r in cusum_alarms(ev, key_cols=("user_id",),
                                 k=0.5, h=4.0).collect()}

    def local(vals, k=0.5, h=4.0):
        a = np.asarray(vals)
        mu, sd = a.mean(), a.std()
        zs = (a - mu) / sd if sd > 0 else np.zeros_like(a)
        sp = sn = 0.0
        na = 0
        for z in zs:
            sp = max(0.0, sp + z - k)
            sn = max(0.0, sn - z - k)
            if sp > h or sn > h:
                na += 1
                sp = sn = 0.0
        return len(vals), na

    assert got[1] == local(vals_u1)
    assert got[2] == local(vals_u2)
    assert got[1][1] >= 1          # the drift is detected
    assert got[2][1] == 0          # the flat series is not


def test_polygon_metrics_known_square(spark):
    import json

    from satellitetools_spark.operators.spatial import polygon_metrics

    # unit square with one triangular hole; outer-ring metrics
    geom = {"type": "MultiPolygon", "coordinates": [[
        [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]],
        [[1.0, 1.0], [2.0, 1.0], [1.5, 2.0], [1.0, 1.0]],
    ]]}
    df = spark.createDataFrame(
        [("sq", json.dumps(geom))], ["aoi", "aoi_geometry"])
    r = polygon_metrics(df).collect()[0]
    assert (r["n_polys"], r["n_rings"], r["n_vertices"]) == (1, 2, 4)
    assert r["area"] == 16.0
    assert r["perimeter"] == 16.0
    assert (r["centroid_x"], r["centroid_y"]) == (2.0, 2.0)


def test_span_profile_planted_interleaving(spark):
    from satellitetools_spark.sources.docs import span_profile
    rows = [
        ("d1", [("text", "abc", None, 0), ("media", None, "m1", 1),
                ("text", "de", None, 2), ("media", None, "m2", 3)]),
        ("d2", [("text", "xyzw", None, 0), ("text", "q", None, 1)]),
        ("d3", [("media", None, "m3", 0)]),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id string, spans array<struct<kind:string,"
              "text:string,media_ref:string,offset:int>>")
    out = {r["doc_id"]: r for r in span_profile(docs).collect()}
    d1 = out["d1"]
    assert (d1["n_spans"], d1["n_text"], d1["n_media"]) == (4, 2, 2)
    assert d1["text_chars"] == 5
    assert d1["media_frac"] == 0.5
    assert d1["n_transitions"] == 3          # strict alternation
    assert (d1["first_kind"], d1["last_kind"]) == ("text", "media")
    d2 = out["d2"]
    assert d2["n_transitions"] == 0 and d2["media_frac"] == 0.0
    assert d2["text_chars"] == 5
    d3 = out["d3"]
    assert (d3["n_spans"], d3["n_transitions"]) == (1, 0)
    assert d3["text_chars"] == 0 and d3["media_frac"] == 1.0


def test_span_profile_is_map_only(spark):
    from satellitetools_spark.sources.docs import span_profile
    docs = spark.createDataFrame(
        [("d1", [("text", "a", None, 0)])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>")
    plan = docs.sparkSession._jvm  # noqa: F841 — keep session refs alive
    p = span_profile(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p and "Generate" not in p and "Join" not in p


def test_adamic_adar_path_graph(spark):
    # Path a-b-c: the only non-adjacent pair with a common neighbor is
    # (a, c) through b (deg 2): AA = 1/ln 2, jaccard = 1/1, cn = 1.
    # K3 x-y-z contributes nothing (all candidate pairs adjacent).
    import math
    from satellitetools_spark.operators.graph import adamic_adar
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("y", "z"), ("x", "z")],
        ["doc_a", "doc_b"])
    rows = adamic_adar(pairs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["u"], r["v"]) == ("a", "c")
    assert r["common_neighbors"] == 1
    assert abs(r["adamic_adar"] - round(1.0 / math.log(2.0), 6)) < 1e-9
    assert r["jaccard_coef"] == 1.0


def test_adamic_adar_wedge_degree_cap(spark):
    # Star center s (deg 3) is the only apex; capping below 3 empties
    # the candidate set — the documented hub mitigation.
    from satellitetools_spark.operators.graph import adamic_adar
    pairs = spark.createDataFrame(
        [("s", "a"), ("s", "b"), ("s", "c")], ["doc_a", "doc_b"])
    assert adamic_adar(pairs).count() == 3  # (a,b),(a,c),(b,c)
    assert adamic_adar(pairs, max_wedge_degree=2).count() == 0


def test_k_core_peels_pendant_chain(spark):
    # Triangle a-b-c with a pendant chain c-d-e: the 2-core is exactly
    # the triangle (d survives round 1 via c-d + d-e but falls in
    # round 2 once e is gone) — requires multi-round peeling.
    from satellitetools_spark.operators.graph import k_core
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")],
        ["doc_a", "doc_b"])
    got = {r["node"]: r["core_deg"] for r in k_core(pairs, k=2).collect()}
    assert got == {"a": 2, "b": 2, "c": 2}
    # k=3 empties the graph entirely
    assert k_core(pairs, k=3).count() == 0


def test_naive_bayes_predict_hand_computed(spark):
    # Two labels with disjoint-ish vocab; d5's evidence ("meow meow")
    # contradicts its stated label -> NB flags it as label-noise.
    import math
    from satellitetools_spark.operators.text import naive_bayes_predict
    docs = spark.createDataFrame(
        [("d1", "cat", "meow meow purr"),
         ("d2", "cat", "meow purr purr"),
         ("d3", "dog", "woof woof bark"),
         ("d4", "dog", "bark woof growl"),
         ("d5", "dog", "meow meow")],
        ["doc_id", "lang", "text"])
    got = {r["doc_id"]: r for r in
           naive_bayes_predict(docs, "lang").collect()}
    assert got["d1"]["pred"] == "cat" and got["d3"]["pred"] == "dog"
    assert got["d5"]["pred"] == "cat" and got["d5"]["actual"] == "dog"
    # hand-check d5's winning score: prior ln(2/5) + 2*ln((c_meow_cat+1)/
    # (N_cat + V)) with N_cat=6 tokens, V=5 distinct tokens, c=3
    want = math.log(2 / 5) + 2 * math.log((3 + 1) / (6 + 5))
    assert abs(got["d5"]["log_score"] - round(want, 6)) < 1e-9


def test_naive_bayes_predicts_empty_text_docs(spark):
    # A document with zero [a-z0-9]+ tokens must still be classified
    # (prior-only score), not silently dropped from the output.
    import math
    from satellitetools_spark.operators.text import naive_bayes_predict
    docs = spark.createDataFrame(
        [("d1", "cat", "meow meow purr"),
         ("d2", "cat", "meow purr purr"),
         ("d3", "dog", "woof woof bark"),
         ("d6", "dog", "!!! ??? ---")],      # no tokens at all
        ["doc_id", "lang", "text"])
    got = {r["doc_id"]: r for r in
           naive_bayes_predict(docs, "lang").collect()}
    assert set(got) == {"d1", "d2", "d3", "d6"}
    # prior-only argmax: ln(2/4) for cat vs ln(2/4) for dog — tie
    # broken label-ASC -> cat; score is exactly the prior
    assert got["d6"]["pred"] == "cat"
    assert abs(got["d6"]["log_score"] - round(math.log(2 / 4), 6)) < 1e-9


def test_allpairs_jaccard_matches_bruteforce(spark):
    # Corpus with heavy shared boilerplate (common shingles would
    # dominate a naive equi-join) + true near-dup pairs at several
    # sizes; prefix filtering must reproduce the brute-force pair set
    # EXACTLY (recall 1.0, no spurious pairs)
    from satellitetools_spark.operators.dedup import (
        allpairs_jaccard_pairs, jaccard_pairs)
    boiler = "the quick brown fox jumps over the lazy dog again and"
    rows = []
    for i in range(30):
        body = " ".join(f"w{i}x{j}" for j in range(8))
        rows.append((f"a{i}", f"{boiler} {body}"))
        if i % 3 == 0:  # near-dup with one word changed
            rows.append((f"b{i}", f"{boiler} {body.replace('x3', 'XX')}"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    for t in (0.3, 0.5, 0.7):
        want = {(r["doc_a"], r["doc_b"], r["jaccard"])
                for r in jaccard_pairs(docs, n=3, threshold=t).collect()}
        got = {(r["doc_a"], r["doc_b"], r["jaccard"])
               for r in allpairs_jaccard_pairs(
                   docs, n=3, threshold=t).collect()}
        assert got == want and len(want) > 0


def test_allpairs_jaccard_ieee_ceil_boundary(spark):
    # Adversarial exact-boundary pair at t=0.55: A has 20 shingles,
    # B = A's first 13 words (11 shingles, all shared, B subset of A)
    # -> J = 11/20 = 0.55 exactly. Filler copies of B inflate the
    # shared shingles' df so A's 9 unique shingles rank FIRST
    # (rarest-first) in A's prefix. Correct prefix length
    # 20 - ceil(0.55*20) + 1 = 10 includes exactly one shared shingle;
    # IEEE 0.55*20 = 11.000000000000002 ceils to 12 without the
    # epsilon guard, shortening the prefix to 9 (all-unique, no
    # collision) AND failing the sz_a*t <= sz_b length filter — either
    # bug silently loses this exact-threshold pair.
    from satellitetools_spark.operators.dedup import (
        allpairs_jaccard_pairs, jaccard_pairs)
    words_b = [f"s{j}" for j in range(13)]
    words_a = words_b + [f"u{j}" for j in range(9)]
    rows = [("A", " ".join(words_a)), ("B", " ".join(words_b)),
            ("f1", " ".join(words_b)), ("f2", " ".join(words_b))]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    want = {(r["doc_a"], r["doc_b"], r["jaccard"])
            for r in jaccard_pairs(docs, n=3, threshold=0.55).collect()}
    got = {(r["doc_a"], r["doc_b"], r["jaccard"])
           for r in allpairs_jaccard_pairs(
               docs, n=3, threshold=0.55).collect()}
    assert ("A", "B", 0.55) in want      # the bait pair really is J=0.55
    assert got == want


def test_label_propagation_two_triangles_with_bridge(spark):
    # Two triangles joined by a single bridge edge: 4 synchronous
    # rounds settle into one community per triangle (hand-traced with
    # the count-DESC/label-ASC tie order)
    from satellitetools_spark.operators.graph import label_propagation
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"),
         ("d", "e"), ("e", "f"), ("d", "f"), ("c", "d")],
        ["doc_a", "doc_b"])
    got = {r["node"]: r["community"]
           for r in label_propagation(pairs, rounds=4).collect()}
    assert got["a"] == got["b"] == got["c"]
    assert got["d"] == got["e"] == got["f"]
    assert got["a"] != got["d"]


def test_rake_keywords_hand_scored(spark):
    # "red panda" appears twice as a stopword-delimited phrase; with
    # deg/freq: red {deg 4, freq 2}, panda {deg 4, freq 2} ->
    # phrase score 4.0 beats the singleton-derived phrases
    from satellitetools_spark.operators.text import rake_keywords
    docs = spark.createDataFrame(
        [("d1", "the red panda and the tall tree"),
         ("d2", "a red panda in a tree")],
        ["doc_id", "text"])
    rows = rake_keywords(docs, top_k=5, min_len=2).collect()
    top = rows[0]
    assert top["phrase"] == "red panda"
    assert top["n_occurrences"] == 2
    assert top["score"] == 4.0
    # "tall tree": tall {deg 2, freq 1} -> 2.0; tree {deg 3, freq 2}
    # -> 1.5; total 3.5
    assert any(r["phrase"] == "tall tree" and r["score"] == 3.5
               for r in rows)
    # singletons excluded by min_len
    assert all(" " in r["phrase"] for r in rows)
