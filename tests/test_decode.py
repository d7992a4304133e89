"""End-to-end decode + spatial-join parity vs the NumPy brute-force oracle.

The engine path (span explode → chunk decode → window assembly → resample →
cell-cover-accelerated PIP) must reproduce the oracle table (analytic window
→ brute-force ray cast) exactly: same rows, same coordinates, same values.
"""

import os

import numpy as np
import pandas as pd
import pytest

from satellitetools_spark.sources import (
    decode_documents,
    explode_spans,
    read_documents,
    reassemble_documents,
)


@pytest.fixture(scope="module")
def docs(spark, geodata_small):
    return read_documents(spark, os.path.join(geodata_small, "docs.parquet"))


@pytest.fixture(scope="module")
def oracle(geodata_small):
    return pd.read_parquet(os.path.join(geodata_small, "oracle_pixels.parquet"))


def test_span_roundtrip_invariant(spark, docs):
    """W4: explode → reassemble preserves span-sequence equality per doc."""
    back = reassemble_documents(explode_spans(docs))
    a = docs.select("doc_id", "spans").toPandas().set_index("doc_id").sort_index()
    b = back.select("doc_id", "spans").toPandas().set_index("doc_id").sort_index()
    assert list(a.index) == list(b.index)
    for d in a.index:
        sa = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in a.loc[d, "spans"]]
        sb = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in b.loc[d, "spans"]]
        assert sa == sb, f"span sequence broken for {d}"


def test_decode_matches_oracle_rows_and_values(spark, docs, oracle):
    got = decode_documents(docs).toPandas()
    want = oracle[oracle["inside"]].copy()

    assert len(got) == len(want), (len(got), len(want))

    key = ["doc_id", "x", "y"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)

    # join membership: exactly the same pixels
    pd.testing.assert_frame_equal(
        got[key], want[key], check_exact=True)

    # values: identical (same float ops on both paths)
    for band in ["B2", "B3", "B4", "B8A", "B11", "B12"]:
        g = got[band].to_numpy(dtype=float)
        w = want[band].to_numpy(dtype=float)
        np.testing.assert_allclose(g, w, rtol=0, atol=0, equal_nan=True)
    np.testing.assert_array_equal(
        got["SCL"].to_numpy(), want["SCL"].to_numpy())

    # exact aoi_pixels per doc (A9, exact-count semantics)
    ga = got.groupby("doc_id")["aoi_pixels"].first()
    wa = want.groupby("doc_id")["aoi_pixels"].first()
    pd.testing.assert_series_equal(ga, wa, check_dtype=False)


def test_decode_scl_only_projection(spark, docs, geodata_small):
    """QI pass: band pruning decodes only SCL chunks at the 20 m QI scale."""
    scl = decode_documents(docs, bands=["SCL"], gsd_override=20.0).toPandas()
    want = pd.read_parquet(os.path.join(geodata_small, "oracle_scl20.parquet"))
    want = want[want["inside"]]
    assert len(scl) == len(want)
    g = scl.sort_values(["doc_id", "x", "y"]).reset_index(drop=True)
    w = want.sort_values(["doc_id", "x", "y"]).reset_index(drop=True)
    np.testing.assert_array_equal(g["SCL"].to_numpy(), w["SCL"].to_numpy())
    assert "B4" not in scl.columns
