#!/usr/bin/env python
"""Phase-level timing of the flagship at one CPU-bound core count.

Usage: taskset -c 0-{N-1} python scripts/profile_scaling.py <cores> <geodir>
Prints per-phase seconds to stderr and one JSON line to stdout.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from satellitetools_spark.session import get_spark  # noqa: E402
from satellitetools_spark.sources import read_documents  # noqa: E402
from satellitetools_spark.sources.decode import qi_percentages, decode_documents  # noqa: E402
from satellitetools_spark.operators.quality import select_survivors  # noqa: E402
from satellitetools_spark.operators.timeseries import dataset_to_timeseries  # noqa: E402
from satellitetools_spark.plans import flagship_timeseries  # noqa: E402

from pyspark.sql import functions as F


def main() -> None:
    cores = int(sys.argv[1])
    geodir = sys.argv[2]
    spark = get_spark(f"profile-{cores}", master=f"local[{cores}]",
                      shuffle_partitions=2 * cores)
    docs = read_documents(spark, os.path.join(geodir, "docs.parquet"))
    n_docs = docs.count()
    # warm-up
    flagship_timeseries(docs.limit(4 * cores)).count()

    t = {}
    t0 = time.perf_counter()
    qi = qi_percentages(docs).localCheckpoint(eager=True)
    t["qi_checkpoint"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    surv = select_survivors(qi, 0.02, None)
    docs_f = docs.join(F.broadcast(surv.select("doc_id")), "doc_id", "left_semi")
    from satellitetools_spark.constants import SNAP_BIO_BANDS
    need = sorted(set(["B4", "B8A"]) | set(SNAP_BIO_BANDS))
    pixels = decode_documents(docs_f, need, vi_vars=["ndvi"], snap_vars=["LAI"])
    n_pix = pixels.count()
    t["decode_count"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    ts = dataset_to_timeseries(pixels, ["ndvi", "lai"], add_uncertainty=True,
                               add_confidence_intervals=True,
                               confidence_level="95")
    n_rows = ts.orderBy("aoi", "time").count()
    t["timeseries"] = time.perf_counter() - t0

    # full flagship end-to-end for comparison
    t0 = time.perf_counter()
    n2 = flagship_timeseries(docs).count()
    t["flagship_e2e"] = time.perf_counter() - t0

    for k, v in t.items():
        print(f"[profile {cores}c] {k}: {v:.2f}s", file=sys.stderr, flush=True)
    print(json.dumps({"cores": cores, "docs": n_docs, "pixels": n_pix,
                      "rows": n_rows, "rows_e2e": n2,
                      **{k: round(v, 3) for k, v in t.items()}}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
