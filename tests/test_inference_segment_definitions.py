"""Definition-level cross-checks for the INFERENCE / SEGMENT / DEDUP
oracle families in the round-6 driver window: the DuckDB oracles mirror
each operator's construction (same conditional-moment algebra, same
wedge joins), so these tests recompute every number from the DIRECT
mathematical definition — NumPy cell moments, `math.erfc` instead of
the shared erf polynomial, plain-Python pair enumeration — over the
real sf0.001 driver tables or seeded data."""

import math
import os
import re
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _r(x, nd=6):
    return float(Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-nd), rounding=ROUND_HALF_UP))


def _events_rows():
    import duckdb
    return duckdb.sql(
        f"SELECT user_id, event_type, epoch_us(ts), value FROM "
        f"'{os.path.join(SF, 'events.parquet')}'").fetchall()


def test_readability_matches_direct_python_formula(spark):
    # Flesch with the operator's documented proxies, re-derived with
    # Python re (ASCII \s to mirror Java) — identical IEEE expression
    # order, so the rounded values must match exactly.
    from satellitetools_spark.operators.text import readability
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    got = {r["doc_id"]: (r["n_words"], r["n_sentences"],
                         r["n_syllables"], r["flesch"])
           for r in readability(docs).collect()}
    for r in docs.select("doc_id", "text").collect():
        t = r["text"]
        words = len(re.split(r"\s+", t.strip(" "), flags=re.ASCII))
        sents = max(1, len(re.findall(r"[.!?]+", t)))
        syll = max(1, len(re.findall(r"[aeiouy]+", t.lower())))
        flesch = 206.835 - 1.015 * words / sents - 84.6 * syll / words
        assert got[r["doc_id"]] == (words, sents, syll, _r(flesch))


def test_smd_balance_matches_direct_numpy_moments(spark):
    from satellitetools_spark.operators import inference as INF
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(os.path.join(SF, "events.parquet"))
    got = {r["covariate"]: r for r in INF.smd_balance(
        ev, "user_id % 2 = 1",
        ["value", "CAST(hour(ts) AS DOUBLE)", "value * value"]
    ).collect()}
    import duckdb
    rows = duckdb.sql(
        f"SELECT user_id, value, hour(ts) FROM "
        f"'{os.path.join(SF, 'events.parquet')}'").fetchall()
    treat = np.array([u % 2 == 1 for u, _, _ in rows])
    covs = {
        "value": np.array([v for _, v, _ in rows], dtype=float),
        "CAST(hour(ts) AS DOUBLE)":
            np.array([h for _, _, h in rows], dtype=float),
        "value * value":
            np.array([v * v for _, v, _ in rows], dtype=float),
    }
    for name, x in covs.items():
        g = got[name]
        x0, x1 = x[~treat], x[treat]
        assert (g["n0"], g["n1"]) == (len(x0), len(x1))
        m0, m1 = x0.mean(), x1.mean()
        v0, v1 = x0.var(ddof=1), x1.var(ddof=1)
        smd = (m1 - m0) / math.sqrt((v0 + v1) / 2.0)
        assert abs(g["mean0"] - m0) <= 2e-6
        assert abs(g["mean1"] - m1) <= 2e-6
        assert abs(g["smd"] - smd) <= 2e-6
        assert abs(g["var_ratio"] - v1 / v0) <= 2e-6


def test_diff_in_diff_matches_direct_cell_algebra(spark):
    # DiD re-derived cell by cell with numpy, p via the TRUE erfc
    # (the operator ships an A&S polynomial; agreement within its
    # documented 1.5e-7 error bound is the independent check).
    from satellitetools_spark.operators import inference as INF
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(os.path.join(SF, "events.parquet"))
    g = INF.diff_in_diff(ev, "user_id % 2 = 1", "day(ts) > 15",
                         "value").collect()[0]
    import duckdb
    rows = duckdb.sql(
        f"SELECT user_id % 2 = 1, day(ts) > 15, value FROM "
        f"'{os.path.join(SF, 'events.parquet')}'").fetchall()
    cells = {}
    for t, p, v in rows:
        cells.setdefault((int(t), int(p)), []).append(float(v))
    m = {}
    var_term = 0.0
    for (t, p), vs in cells.items():
        a = np.array(vs)
        key = f"{t}{p}"
        assert g[f"n_{key}"] == len(vs)
        m[key] = a.mean()
        assert abs(g[f"m_{key}"] - m[key]) <= 2e-6
        var_term += a.var(ddof=1) / len(a)
    did = (m["11"] - m["10"]) - (m["01"] - m["00"])
    se = math.sqrt(var_term)
    z = did / se
    p2 = math.erfc(abs(z) / math.sqrt(2.0))
    assert abs(g["did"] - did) <= 2e-6
    assert abs(g["se"] - se) <= 2e-6
    assert abs(g["z"] - z) <= 2e-6
    assert abs(g["p_approx"] - p2) <= 1e-5


def test_poisson_rate_matches_direct_counts(spark):
    from satellitetools_spark.operators import inference as INF
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(os.path.join(SF, "events.parquet"))
    g = INF.poisson_rate_test(ev, "user_id % 2 = 1",
                              "event_type = 'error'").collect()[0]
    rows = _events_rows()
    k = {0: 0, 1: 0}
    users = {0: set(), 1: set()}
    for u, et, _, _ in rows:
        arm = int(u % 2 == 1)
        users[arm].add(u)
        if et == "error":
            k[arm] += 1
    e0, e1 = len(users[0]), len(users[1])
    assert (g["k0"], g["k1"], g["exp0"], g["exp1"]) == \
        (k[0], k[1], e0, e1)
    r0, r1 = k[0] / e0, k[1] / e1
    lrr = math.log(r1 / r0)
    se = math.sqrt(1.0 / k[0] + 1.0 / k[1])
    z = lrr / se
    assert abs(g["rate0"] - r0) <= 1e-6
    assert abs(g["rate1"] - r1) <= 1e-6
    assert abs(g["rate_ratio"] - r1 / r0) <= 1e-6
    assert abs(g["log_rr"] - lrr) <= 1e-6
    assert abs(g["z"] - z) <= 1e-6
    assert abs(g["p_approx"] - math.erfc(abs(z) / math.sqrt(2))) <= 1e-5


def test_cohort_revenue_matches_plain_python_fold(spark):
    from satellitetools_spark.operators.segment import cohort_revenue
    orders = spark.read.parquet(os.path.join(SF, "orders.parquet"))
    got = {(r["cohort"], r["month_offset"]):
           (r["n_customers"], r["n_orders"], r["revenue"])
           for r in cohort_revenue(orders).collect()}
    import duckdb
    rows = duckdb.sql(
        f"SELECT o_custkey, year(o_orderdate), month(o_orderdate), "
        f"o_totalprice FROM '{os.path.join(SF, 'orders.parquet')}'"
    ).fetchall()
    ym = [(c, y * 12 + mo - 1, Decimal(repr(p)).quantize(
        Decimal("0.01"), rounding=ROUND_HALF_UP)) for c, y, mo, p in rows]
    first = {}
    for c, m, _ in ym:
        first[c] = min(first.get(c, m), m)
    agg = {}
    for c, m, p in ym:
        cym = first[c]
        cohort = f"{cym // 12}-{cym % 12 + 1:02d}"
        key = (cohort, m - cym)
        cust, cnt, rev = agg.get(key, (set(), 0, Decimal(0)))
        cust.add(c)
        agg[key] = (cust, cnt + 1, rev + p)
    want = {k: (len(cust), cnt, _r(float(rev), 4))
            for k, (cust, cnt, rev) in agg.items()}
    assert got == want


def test_covisitation_matches_direct_pair_enumeration(spark):
    from satellitetools_spark.operators.segment import covisitation
    ev = spark.read.parquet(os.path.join(SF, "events.parquet"))
    got = {(r["item_a"], r["item_b"]):
           (r["n_both"], r["n_a"], r["n_b"], r["cosine"])
           for r in covisitation(ev).collect()}
    rows = _events_rows()
    per_user = {}
    for u, et, _, _ in rows:
        per_user.setdefault(u, set()).add(et)
    marg = {}
    pair = {}
    for items in per_user.values():
        for it in items:
            marg[it] = marg.get(it, 0) + 1
        s = sorted(items)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                pair[(s[i], s[j])] = pair.get((s[i], s[j]), 0) + 1
    want = {k: (n, marg[k[0]], marg[k[1]],
                _r(n / math.sqrt(marg[k[0]] * marg[k[1]])))
            for k, n in pair.items()}
    assert got == want


def test_dice_pairs_match_bruteforce_set_algebra(spark):
    # every (a, b) document pair's shingle sets intersected in plain
    # Python (inverted index — no joins), dice/containment from the
    # set sizes; the threshold cut must select the same pairs.
    from satellitetools_spark.operators import dedup as D
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    n, thr = 3, 0.5
    got = {(r["doc_a"], r["doc_b"]):
           (r["inter"], r["dice"], r["containment"])
           for r in D.dice_pairs(docs, n=n, threshold=thr).collect()}
    sh = {}
    for r in docs.select("doc_id", "text").collect():
        toks = re.split(r"\s+", r["text"].strip(" "), flags=re.ASCII)
        s = {" ".join(toks[i:i + n])
             for i in range(len(toks) - n + 1)} if len(toks) >= n \
            else set()
        if s:
            sh[r["doc_id"]] = s
    inv = {}
    for d, s in sh.items():
        for g in s:
            inv.setdefault(g, []).append(d)
    inter = {}
    for ds in inv.values():
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                k = (ds[i], ds[j])
                inter[k] = inter.get(k, 0) + 1
    want = {}
    for (a, b), i in inter.items():
        dice = _r(2.0 * i / (len(sh[a]) + len(sh[b])))
        if dice >= thr:
            want[(a, b)] = (i, dice, _r(i / min(len(sh[a]),
                                                len(sh[b]))))
    assert got == want
