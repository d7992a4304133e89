"""sf1 scale rehearsal (r4 verdict #4): run the flagship and the most
expensive headline queries at 10x the bench gate scale and record the
evidence the driver's bench attaches to BENCH_r{N}.json.

Inputs (both deterministic, generated once, never committed):

* geo: the ``sf1`` datagen preset (~29k interleaved documents — same
  60-date range as sf0.1, ~10x the AOIs) via ``ensure_geodata``.
* docs: ``.benchdata/sf1/documents.parquet`` — the driver's sf0.1
  documents table replicated 10x. Replica 0 is verbatim; replicas k>0
  deterministically shuffle each text's word order with a seed derived
  from (md5(text), k), so (a) word/char/length/lang distributions are
  EXACTLY preserved, (b) planted exact-duplicate pairs stay duplicates
  within every replica (same text -> same shuffle), and (c) shingle
  overlap ACROSS replicas is destroyed, so near-dup density scales
  linearly instead of quadratically. doc_ids shift by k * 10^7.

What it validates, per the verdict:

* the approx-median scale knob actually engages (plan contains
  ``percentile_approx``) and its runtime vs the parity-exact median;
* AQE + skew-join stay enabled under the documented 100 TB profile
  conf (sandbox-scaled partition sizes);
* per-query scale ratios vs the sf0.1 clean ledger — nothing should
  grow super-linearly in the 10x data (ratio ~<= 10 x a warm-cache
  allowance).

Writes ``BENCH_SF1.json`` at the repo root; ``bench.py`` attaches it
to its JSON line as ``sf1_rehearsal`` so the evidence lands in the
driver-recorded ``BENCH_r{N}.json``.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from bench import cpu_probe, materialize  # noqa: E402
from satellitetools_spark.datagen import ensure_geodata  # noqa: E402
from satellitetools_spark.plans import flagship_timeseries  # noqa: E402
from satellitetools_spark.session import get_spark  # noqa: E402
from satellitetools_spark.sources import read_documents  # noqa: E402

SF1_DIR = os.path.join(ROOT, ".benchdata", "sf1")
SRC_DOCS = "/root/testdata/sf0.1/documents.parquet"
REPLICAS = 10
ID_STRIDE = 10_000_000

# The most expensive headline queries from the r4 ledger plus the rest
# of the headline set whose inputs the sf1 synth provides (documents /
# events / orders / geo) — near-full headline coverage one decade up.
QUERIES = [
    "geo_lai_timeseries",
    "geo_qi_filter",
    "geo_ndvi_timeseries",
    # geo_change is absent: it reads the oracle_pixels table, which
    # NO_ORACLE tags (sf1 included) deliberately do not generate
    "geo_pixels",
    "geo_qi",
    "docs_minhash_pairs",
    "docs_dice_pairs",
    "docs_naive_bayes",
    "docs_exact_dedup",
    "docs_quality",
    "docs_token_stats",
    "docs_train_pipeline",
    "docs_rake",
    "events_hourly",
    "events_scd2",
    "orders_rfm",
]

# Sandbox rendition of the README "100 TB scale profile" conf block:
# AQE + skew-join splitting exactly as documented; the byte thresholds
# are scaled to sandbox data volumes so the same MECHANISMS engage
# (coalescing, skew split) on megabyte shuffles.
SCALE_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8m",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
}


def log(m):
    print(f"[sf1] {m}", file=sys.stderr, flush=True)


def _shuffled_text(text: str, k: int) -> str:
    seed = int.from_bytes(
        hashlib.md5(text.encode("utf-8", "surrogatepass")).digest()[:4],
        "big") ^ (k * 0x9E3779B1 & 0xFFFFFFFF)
    words = text.split()
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    order = rng.permutation(len(words))
    out = " ".join(words[i] for i in order)
    if out == text and k > 0 and len(words) > 1:
        # identity permutation (or permutation-invariant text) would
        # leave the replica byte-identical to the original — dup
        # groups would then span replicas and grow quadratically in
        # REPLICAS. Rotate one word as a guaranteed, deterministic
        # change (same length/vocab distribution).
        out = " ".join(words[1:] + words[:1])
    return out


def ensure_docs_sf1() -> str:
    os.makedirs(SF1_DIR, exist_ok=True)
    out = os.path.join(SF1_DIR, "documents.parquet")
    if not os.path.exists(out):
        base = pd.read_parquet(SRC_DOCS)
        parts = [base]
        for k in range(1, REPLICAS):
            r = base.copy()
            r["doc_id"] = r["doc_id"] + k * ID_STRIDE
            r["text"] = [_shuffled_text(t, k) for t in base["text"]]
            r["n_chars"] = r["text"].str.len()
            parts.append(r)
        all_docs = pd.concat(parts, ignore_index=True)
        all_docs.to_parquet(out, index=False)
        log(f"documents x{REPLICAS}: {len(all_docs)} rows -> {out}")
    # events/orders replicate by shifting the entity keys — each
    # replica is an independent population with identical per-entity
    # behavior, so session/RFM/hourly workloads scale linearly.
    ev_out = os.path.join(SF1_DIR, "events.parquet")
    if not os.path.exists(ev_out):
        ev = pd.read_parquet("/root/testdata/sf0.1/events.parquet")
        max_eid = int(ev["event_id"].max()) + 1 \
            if "event_id" in ev.columns else 0
        parts = [ev]
        for k in range(1, REPLICAS):
            r = ev.copy()
            r["user_id"] = r["user_id"] + k * ID_STRIDE
            if "event_id" in r.columns:
                r["event_id"] = r["event_id"] + k * max_eid
            parts.append(r)
        pd.concat(parts, ignore_index=True).to_parquet(ev_out,
                                                      index=False)
        log(f"events x{REPLICAS} -> {ev_out}")
    ord_out = os.path.join(SF1_DIR, "orders.parquet")
    if not os.path.exists(ord_out):
        od = pd.read_parquet("/root/testdata/sf0.1/orders.parquet")
        parts = [od]
        for k in range(1, REPLICAS):
            r = od.copy()
            r["o_orderkey"] = r["o_orderkey"] + k * ID_STRIDE
            r["o_custkey"] = r["o_custkey"] + k * ID_STRIDE
            parts.append(r)
        pd.concat(parts, ignore_index=True).to_parquet(ord_out,
                                                      index=False)
        log(f"orders x{REPLICAS} -> {ord_out}")
    return SF1_DIR


def timed(fn, attempts=3):
    best, best_probe = None, None
    for _ in range(attempts):
        p0 = cpu_probe()
        t0 = time.perf_counter()
        n = fn()
        dt = time.perf_counter() - t0
        probe = max(p0, cpu_probe())
        if best is None or dt < best:
            best, best_probe = dt, probe
    return round(best, 3), round(best_probe, 4), n


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    attempts = int(os.environ.get("SF1_ATTEMPTS", "3"))
    geodir = ensure_geodata("sf1")
    sf_dir = ensure_docs_sf1()
    log(f"geodata={geodir} docs={sf_dir} cpus={cpus}")

    spark = get_spark("sf1-rehearsal", master=f"local[{cpus}]",
                      shuffle_partitions=2 * cpus,
                      extra_conf=SCALE_CONF)
    result = {"sf": 1.0, "cpus": cpus, "attempts": attempts,
              "conf": SCALE_CONF, "queries": {}, "probes": {},
              "rows": {}}
    try:
        qs = E.queries()
        for name in QUERIES:
            sec, probe, n = timed(
                lambda: materialize(qs[name](spark, sf_dir)),
                attempts)
            result["queries"][name] = sec
            result["probes"][name] = probe
            result["rows"][name] = n
            log(f"{name}: {sec}s rows={n} probe={probe}")

        docs = read_documents(spark,
                              os.path.join(geodir, "docs.parquet"))
        n_docs = docs.count()
        flagship_timeseries(docs.limit(4 * cpus)).count()  # warm-up
        ex_sec, ex_probe, ex_rows = timed(
            lambda: flagship_timeseries(docs).count(), attempts)
        ap = flagship_timeseries(docs, median_accuracy=10000)
        plan = ap._jdf.queryExecution().executedPlan().toString()
        assert "percentile_approx" in plan, \
            "approx-median knob did not engage"
        ap_sec, ap_probe, ap_rows = timed(lambda: ap.count(), attempts)
        result["flagship"] = {
            "docs": n_docs,
            "exact_median_sec": ex_sec, "exact_probe": ex_probe,
            "approx_median_sec": ap_sec, "approx_probe": ap_probe,
            "rows": ex_rows,
            "approx_rows": ap_rows,
            "docs_per_sec_exact": round(n_docs / ex_sec, 1),
            "docs_per_sec_approx": round(n_docs / ap_sec, 1),
            "approx_engaged": True,
        }
        log(f"flagship: exact {ex_sec}s approx {ap_sec}s "
            f"docs={n_docs}")
    finally:
        spark.stop()

    # scale ratios vs the sf0.1 clean ledger (10x data -> ratio ~10
    # is linear; record whatever we see, flag > 20 as super-linear)
    try:
        with open(os.path.join(ROOT, "BENCH_QUERIES_CLEAN.json")) as f:
            clean = json.load(f)
        ratios = {}
        for name, sec in result["queries"].items():
            ent = clean.get(name, {})
            # the key says sf0.1 — only divide by sf0.1 baselines (the
            # ledger is sf-aware and may hold larger-sf entries)
            base = ent.get("sec") if ent.get("sf") == 0.1 else None
            if base:
                ratios[name] = round(sec / base, 2)
        result["scale_ratio_vs_sf0.1_clean"] = ratios
        # [] means "compared and clean"; None means "no sf0.1
        # baselines existed" — missing evidence must not read as a
        # pass
        result["super_linear"] = (sorted(
            n for n, r in ratios.items() if r > 20)
            if ratios else None)
    except (OSError, ValueError):
        pass
    import datetime
    result["captured_utc"] = datetime.datetime.now(
        datetime.timezone.utc).isoformat(timespec="seconds")
    out = os.path.join(ROOT, "BENCH_SF1.json")
    # a prior sf1 SCALING pair (recorded by a separate bench run with
    # BENCH_SCALING_TAG pointing at the sf1 geodata) rides along
    try:
        with open(out) as f:
            prev = json.load(f)
        if "scaling" in prev:
            result["scaling"] = prev["scaling"]
    except (OSError, ValueError):
        pass
    with open(out, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    log(f"wrote {out}")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
