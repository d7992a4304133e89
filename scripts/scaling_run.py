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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import run_flagship  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1])
    geodir = sys.argv[2]
    inner = int(os.environ.get("BENCH_INNER_REPS", "1"))
    sec, docs, rows, probe = run_flagship(cores, geodir, 2 * cores,
                                          inner_reps=inner)
    print(json.dumps({"cores": cores, "sec": round(sec, 3), "docs": docs,
                      "rows": rows, "probe": round(probe, 4)}), flush=True)


if __name__ == "__main__":
    main()
