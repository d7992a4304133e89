#!/usr/bin/env python
"""One CPU-bound flagship run for the scaling benchmark.

Invoked by bench.py as  ``taskset -c 0-{N-1} python scripts/scaling_run.py
<cores> <geodata_dir>``  so that the WHOLE process tree (JVM + Python
workers) is limited to N CPUs — ``local[N]`` alone only bounds JVM task
slots while pandas-UDF workers would still spread over every core, which
would make the small-"cluster" run unrealistically fast and the scaling
ratio meaningless. CPU affinity is the sandbox's faithful proxy for an
N-executor vs 4N-executor cluster (north rule). Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import cpu_probe, run_flagship  # noqa: E402


def loop_until_stopfile(cores: int, geodir: str, stopfile: str) -> None:
    """Fixed-window throughput mode (concurrent_scaling.py): run flagship
    reps back-to-back until ``stopfile`` appears, then report every
    completed rep. The rep in flight when the stop lands is completed and
    counted — the same policy at both levels, so the window-truncation
    treatment is symmetric. Per-rep probe brackets let the auditor see
    which reps overlapped a host-contention episode."""
    from satellitetools_spark.plans import flagship_timeseries
    from satellitetools_spark.session import get_spark
    from satellitetools_spark.sources import read_documents

    spark = get_spark(f"bench-flagship-{cores}", master=f"local[{cores}]",
                      shuffle_partitions=2 * cores)
    try:
        docs = read_documents(spark, os.path.join(geodir, "docs.parquet"))
        n_docs = docs.count()
        flagship_timeseries(docs.limit(4 * cores)).count()  # warm-up
        reps, probes = [], []
        while not os.path.exists(stopfile):
            spark.catalog.clearCache()
            p0 = cpu_probe()
            t0 = time.perf_counter()
            flagship_timeseries(docs).count()
            reps.append(round(time.perf_counter() - t0, 3))
            probes.append(round(max(p0, cpu_probe()), 4))
        print(json.dumps({"cores": cores, "docs": n_docs, "reps": reps,
                          "probes": probes}), flush=True)
    finally:
        spark.stop()


def main() -> None:
    cores = int(sys.argv[1])
    geodir = sys.argv[2]
    stopfile = os.environ.get("BENCH_LOOP_STOPFILE")
    if stopfile:
        loop_until_stopfile(cores, geodir, stopfile)
        return
    # 2 in-session reps per JVM: doubles the clean-rep odds per startup
    inner = int(os.environ.get("BENCH_INNER_REPS", "2"))
    sec, docs, rows, probe = run_flagship(cores, geodir, 2 * cores,
                                          inner_reps=inner)
    print(json.dumps({"cores": cores, "sec": round(sec, 3), "docs": docs,
                      "rows": rows, "probe": round(probe, 4)}), flush=True)


if __name__ == "__main__":
    main()
