"""Definition-level cross-checks for the rank/eval family now entering
the driver's correctness window: the DuckDB oracle mirrors each
operator's CONSTRUCTION (histogram midranks, cumulative scans), so a
construction-level error would pass the gate. These tests compare
against the DIRECT mathematical definitions — O(n²) pairwise counts,
brute-force ECDF suprema, per-row rank sums — on seeded random data
with heavy ties (integer-valued), per operator."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from satellitetools_spark.operators import inference as INF
from satellitetools_spark.operators import modeleval as ME


def _rand_groups(seed, n=120, vmax=12):
    rng = np.random.RandomState(seed)
    g = rng.randint(0, 2, n)
    v = rng.randint(0, vmax, n).astype(float)
    return g, v


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_mann_whitney_u_matches_pairwise_definition(spark, seed):
    g, v = _rand_groups(seed)
    df = spark.createDataFrame(
        [(int(a), float(b)) for a, b in zip(g, v)], "g int, v double")
    r = INF.mann_whitney_u(df, "g", "v").collect()[0]
    x1, x0 = v[g == 1], v[g == 0]
    u1 = sum((x1[:, None] > x0[None, :]).sum()
             for _ in [0]) + 0.5 * (x1[:, None] == x0[None, :]).sum()
    assert r["n0"] == len(x0) and r["n1"] == len(x1)
    assert r["u1"] == pytest.approx(float(u1), abs=1e-9)
    assert r["u0"] == pytest.approx(len(x0) * len(x1) - float(u1),
                                    abs=1e-9)


@pytest.mark.parametrize("seed", [2, 11])
def test_ks_matches_bruteforce_ecdf_sup(spark, seed):
    g, v = _rand_groups(seed, vmax=9)
    df = spark.createDataFrame(
        [(int(a), float(b)) for a, b in zip(g, v)], "g int, v double")
    r = INF.ks_test(df, "g", "v").collect()[0]
    x0, x1 = np.sort(v[g == 0]), np.sort(v[g == 1])
    grid = np.unique(v)
    f0 = np.searchsorted(x0, grid, side="right") / len(x0)
    f1 = np.searchsorted(x1, grid, side="right") / len(x1)
    assert r["d"] == pytest.approx(float(np.abs(f0 - f1).max()),
                                   abs=1e-6)


@pytest.mark.parametrize("seed", [3, 13])
def test_roc_auc_matches_pairwise_probability(spark, seed):
    rng = np.random.RandomState(seed)
    y = rng.randint(0, 2, 150)
    s = rng.randint(0, 10, 150).astype(float)
    df = spark.createDataFrame(
        [(int(a), float(b)) for a, b in zip(y, s)], "y int, s double")
    r = ME.roc_auc(df, "y", "s").collect()[0]
    sp, sn = s[y == 1], s[y == 0]
    auc = ((sp[:, None] > sn[None, :]).sum()
           + 0.5 * (sp[:, None] == sn[None, :]).sum()) / (
               len(sp) * len(sn))
    assert r["auc"] == pytest.approx(float(auc), abs=1e-6)
    assert r["gini"] == pytest.approx(2 * float(auc) - 1, abs=1e-5)


@pytest.mark.parametrize("seed", [5, 17])
def test_kendall_matches_bruteforce_pair_counts(spark, seed):
    rng = np.random.RandomState(seed)
    x = rng.randint(0, 7, 100)
    y = rng.randint(0, 5, 100)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(x, y)], "x int, y int")
    r = ME.kendall_tau_b(df, "x", "y").collect()[0]
    conc = disc = 0
    for i in range(len(x)):
        for j in range(i + 1, len(x)):
            p = (x[i] - x[j]) * (y[i] - y[j])
            conc += p > 0
            disc += p < 0
    assert r["concordant"] == conc and r["discordant"] == disc
    n = len(x)
    n0 = n * (n - 1) / 2
    tx = sum(c * (c - 1) / 2 for c in np.bincount(x))
    ty = sum(c * (c - 1) / 2 for c in np.bincount(y))
    tau = (conc - disc) / np.sqrt((n0 - tx) * (n0 - ty))
    assert r["tau_b"] == pytest.approx(float(tau), abs=1e-6)


@pytest.mark.parametrize("seed", [4, 19])
def test_wilcoxon_matches_direct_midranks(spark, seed):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 12, 90).astype(float)
    b = rng.randint(0, 12, 90).astype(float)
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in zip(a, b)],
        "a double, b double")
    r = INF.wilcoxon_signed_rank(df, "a", "b").collect()[0]
    d = a - b
    d = d[d != 0]
    ad = np.abs(d)
    order = np.argsort(ad, kind="mergesort")
    ranks = np.empty(len(ad))
    sorted_ad = ad[order]
    i = 0
    while i < len(ad):
        j = i
        while j < len(ad) and sorted_ad[j] == sorted_ad[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    wplus = ranks[d > 0].sum()
    assert r["n_nonzero"] == len(d)
    assert r["w_plus"] == pytest.approx(float(wplus), abs=1e-6)


@pytest.mark.parametrize("seed", [6, 29])
def test_average_precision_matches_step_definition(spark, seed):
    rng = np.random.RandomState(seed)
    y = rng.randint(0, 2, 120)
    s = rng.randint(0, 8, 120).astype(float)
    df = spark.createDataFrame(
        [(int(a), float(b)) for a, b in zip(y, s)], "y int, s double")
    r = ME.average_precision(df, "y", "s").collect()[0]
    npos = y.sum()
    ap = 0.0
    prev_r = 0.0
    for t in sorted(set(s), reverse=True):
        sel = s >= t
        tp = y[sel].sum()
        rec = tp / npos
        prec = tp / sel.sum()
        ap += (rec - prev_r) * prec
        prev_r = rec
    assert r["ap"] == pytest.approx(float(ap), abs=1e-6)
    assert r["n_pos"] == int(npos)


@pytest.mark.parametrize("seed", [8, 31])
def test_kruskal_matches_direct_rank_definition(spark, seed):
    rng = np.random.RandomState(seed)
    g = rng.randint(0, 3, 120)
    v = rng.randint(0, 10, 120).astype(float)
    df = spark.createDataFrame(
        [(int(a), float(b)) for a, b in zip(g, v)], "g int, v double")
    r = INF.kruskal_wallis(df, "g", "v").collect()[0]
    # direct midranks over the pooled sample
    order = np.argsort(v, kind="mergesort")
    ranks = np.empty(len(v))
    sv = v[order]
    i = 0
    while i < len(v):
        j = i
        while j < len(v) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    n = len(v)
    h = 12.0 / (n * (n + 1)) * sum(
        ranks[g == k].sum() ** 2 / (g == k).sum()
        for k in np.unique(g)) - 3 * (n + 1)
    _, counts = np.unique(v, return_counts=True)
    corr = 1.0 - (counts.astype(float) ** 3 - counts).sum() / (
        n ** 3 - n)
    assert r["h"] == pytest.approx(float(h), abs=1e-5)
    assert r["h_adj"] == pytest.approx(float(h / corr), abs=1e-5)


@pytest.mark.parametrize("seed", [9, 37])
def test_median_test_matches_direct_definition(spark, seed):
    rng = np.random.RandomState(seed)
    g = rng.randint(0, 3, 150)
    v = rng.randint(0, 15, 150).astype(float)
    df = spark.createDataFrame(
        [(int(a), float(b)) for a, b in zip(g, v)], "g int, v double")
    rows = INF.median_test(df, "g", "v").collect()
    # grand LOWER median: smallest v with 2*cum >= n (the documented
    # convention), then the above/below 2xk table excluding == median
    sv = np.sort(v)
    med = sv[int(np.ceil(len(sv) / 2.0)) - 1]
    keep = v != med
    gk, vk = g[keep], v[keep]
    tot_above = (vk > med).sum()
    for r in rows:
        m = gk == r["grp"]
        assert r["n"] == int(m.sum())
        assert r["n_above"] == int((vk[m] > med).sum())
        assert r["expected_above"] == pytest.approx(
            m.sum() * tot_above / len(vk), abs=1e-5)


@pytest.mark.parametrize("seed", [10, 41])
def test_trimmed_stats_matches_direct_sort_based_trim(spark, seed):
    rng = np.random.RandomState(seed)
    g = rng.randint(0, 2, 140)
    v = rng.randint(0, 40, 140).astype(float)
    df = spark.createDataFrame(
        [(int(a), float(b)) for a, b in zip(g, v)], "g int, v double")
    rows = {r["grp"]: r for r in
            INF.trimmed_stats(df, "v", "g", trim=0.1).collect()}
    for grp in np.unique(g):
        x = np.sort(v[g == grp])
        n = len(x)
        k = int(np.floor(0.1 * n))
        body = x[k:n - k]
        wins = np.concatenate([[x[k]] * k, body, [x[n - k - 1]] * k])
        r = rows[int(grp)]
        assert r["n"] == n and r["k"] == k
        assert r["mean"] == pytest.approx(float(x.mean()), abs=1e-5)
        assert r["trimmed_mean"] == pytest.approx(float(body.mean()),
                                                  abs=1e-5)
        assert r["winsor_mean"] == pytest.approx(float(wins.mean()),
                                                 abs=1e-5)
        assert r["v_lo"] == x[k] and r["v_hi"] == x[n - k - 1]
