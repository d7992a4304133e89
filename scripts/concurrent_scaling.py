#!/usr/bin/env python
"""Same-moment N-vs-4N scaling evidence, robust to host contention episodes.

The sequential method (bench.py scaling phase) compares a 2-core and an
8-core run taken minutes apart; a host memory-pressure episode landing on
either run contaminates the ratio, and an episode spanning hours starves it
of clean reps entirely. This script runs the two levels AT THE SAME MOMENT
on disjoint CPU sets (lo: cores 0-1, hi: cores 2-9): both process trees see
the identical host state, so the episode's common-mode slowdown cancels in
the ratio  efficiency = (t_lo / t_hi) / (cores_hi / cores_lo).

The hi job repeats its flagship in-session (``BENCH_INNER_REPS``) so it
stays busy for roughly the lo job's full window — the lo job's environment
is constant across its timed region (otherwise the lo tail would run on a
quieter guest than its head). Reported hi time is the minimum in-session
rep.

Known bias and its control: in-guest sharing (memory bandwidth between the
two jobs) inflates t_lo → inflates efficiency. The CONTROL pair runs the
SAME 2-core job concurrently on cores 0-1 vs 2-3; its time ratio would be
1.0 on a perfectly symmetric guest, so its deviation bounds the method's
asymmetry + sharing error. Sequential clean-window reps (bench.py ledger)
remain the primary metric; this is the auxiliary evidence that stays
meaningful while an episode is in progress.

Usage:  python scripts/concurrent_scaling.py [n_pairs] [geodata_dir]
Prints one JSON line; progress on stderr.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import cpu_probe, log  # noqa: E402
from satellitetools_spark.datagen import ensure_geodata  # noqa: E402

LO, HI = 2, 8


def launch(cores, cpu_list, geodir, inner_reps=1, stopfile=None):
    env = dict(os.environ, BENCH_INNER_REPS=str(inner_reps))
    if stopfile:
        env["BENCH_LOOP_STOPFILE"] = stopfile
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scaling_run.py")
    return subprocess.Popen(
        ["taskset", "-c", cpu_list, sys.executable, script,
         str(cores), geodir],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, env=env)


def run_window_race(geodir, window_sec=240.0, lo_cpus="0-1", hi_cpus="2-9"):
    """Fixed-window throughput race: BOTH levels loop flagship reps
    back-to-back on disjoint CPU sets for the same ``window_sec`` wall
    clock, then stop. Throughput per level = completed docs / sum of rep
    times; efficiency = (rate_hi / rate_lo) / (cores_hi / cores_lo).

    Every second of the window exposes both levels to the identical host
    state, so common-mode contention cancels in the ratio (validated by
    the 2v2 control: simultaneous identical jobs measured ratio 1.000
    during an episode). Residual asymmetry: the rep in flight at the stop
    signal completes and counts at both levels, so the lo level can
    overhang the window by up to one (4x longer) lo rep; per-rep probes
    are reported so an episode inside that overhang is visible."""
    stopfile = f"/tmp/conc_scaling_stop_{os.getpid()}"
    if os.path.exists(stopfile):
        os.unlink(stopfile)
    p0 = cpu_probe()
    t0 = time.time()
    lo_p = launch(LO, lo_cpus, geodir, stopfile=stopfile)
    hi_p = launch(HI, hi_cpus, geodir, stopfile=stopfile)
    time.sleep(window_sec)
    with open(stopfile, "w") as f:
        f.write("stop")
    lo = json.loads(lo_p.communicate()[0].strip().splitlines()[-1])
    hi = json.loads(hi_p.communicate()[0].strip().splitlines()[-1])
    os.unlink(stopfile)
    probe = max(p0, cpu_probe())
    rate_lo = lo["docs"] * len(lo["reps"]) / sum(lo["reps"])
    rate_hi = hi["docs"] * len(hi["reps"]) / sum(hi["reps"])
    return {"window_sec": window_sec, "docs": lo["docs"],
            "n_reps_lo": len(lo["reps"]), "n_reps_hi": len(hi["reps"]),
            "reps_lo": lo["reps"], "reps_hi": hi["reps"],
            "probes_lo": lo["probes"], "probes_hi": hi["probes"],
            "rate_lo": round(rate_lo, 2), "rate_hi": round(rate_hi, 2),
            "efficiency": round((rate_hi / rate_lo) / (HI / LO), 3),
            "probe_outer": round(probe, 3),
            "wall": round(time.time() - t0, 1)}


def run_pair(geodir, lo_cpus="0-1", hi_cpus="2-9", hi_cores=HI,
             lo_inner=1, hi_inner=1):
    """SINGLE rep per level, start-aligned. Min-of-reps on either side
    would bias the ratio: a short hi rep can fit inside a contention dip
    that no 2-core rep can fit in, so any rep-minimum asymmetry (measured:
    spurious efficiencies of 1.3-2.8) inflates the result. With single
    aligned reps the residual bias is only contention landing in the lo
    run's tail after hi finishes (inflates efficiency; bounded by the
    per-pair probes reported)."""
    p0 = cpu_probe()
    t0 = time.time()
    lo_p = launch(LO, lo_cpus, geodir, inner_reps=lo_inner)
    hi_p = launch(hi_cores, hi_cpus, geodir, inner_reps=hi_inner)
    lo = json.loads(lo_p.communicate()[0].strip().splitlines()[-1])
    hi = json.loads(hi_p.communicate()[0].strip().splitlines()[-1])
    probe = max(p0, cpu_probe())
    return {"sec_lo": lo["sec"], "sec_hi": hi["sec"], "docs": lo["docs"],
            "probe_lo": lo["probe"], "probe_hi": hi["probe"],
            "probe_outer": round(probe, 3), "wall": round(time.time() - t0, 1)}


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    geodir = sys.argv[2] if len(sys.argv) > 2 else ensure_geodata("sfbench")
    window = float(os.environ.get("CONC_WINDOW_SEC", "0"))
    ratio = HI / LO

    pairs = []
    for i in range(n_pairs):
        if window > 0:
            r = run_window_race(geodir, window_sec=window)
            pairs.append(r)
            log(f"race {i}: rate_lo={r['rate_lo']:.0f} "
                f"rate_hi={r['rate_hi']:.0f} docs/s "
                f"({r['n_reps_lo']}/{r['n_reps_hi']} reps) "
                f"eff={r['efficiency']} probe={r['probe_outer']}s")
            continue
        r = run_pair(geodir)
        r["efficiency"] = round((r["sec_lo"] / r["sec_hi"]) / ratio, 3)
        pairs.append(r)
        log(f"pair {i}: lo={r['sec_lo']:.1f}s hi={r['sec_hi']:.1f}s "
            f"eff={r['efficiency']} probe={r['probe_outer']}s")

    # control: identical 2-core jobs side by side — ratio ≈ 1.0 bounds the
    # guest-asymmetry error of the concurrent method
    c0 = cpu_probe()
    a = launch(LO, "0-1", geodir)
    b = launch(LO, "2-3", geodir)
    ra = json.loads(a.communicate()[0].strip().splitlines()[-1])
    rb = json.loads(b.communicate()[0].strip().splitlines()[-1])
    control = {"sec_a": ra["sec"], "sec_b": rb["sec"],
               "ratio": round(ra["sec"] / rb["sec"], 3),
               "probe": round(max(c0, cpu_probe()), 3)}
    log(f"control 2v2: a={ra['sec']:.1f}s b={rb['sec']:.1f}s "
        f"ratio={control['ratio']}")

    effs = sorted(p["efficiency"] for p in pairs)
    med = effs[len(effs) // 2] if len(effs) % 2 else round(
        (effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2, 3)
    out = {"method": ("concurrent-window-race" if window > 0
                      else "concurrent-disjoint-cpusets"),
           "window_sec": window or None,
           "cores_lo": LO, "cores_hi": HI,
           "pairs": pairs, "median_efficiency": med,
           "control_2v2": control}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
