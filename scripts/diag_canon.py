"""Diagnose driver-hash mismatches: run a query + oracle, canonicalize
the way the driver's hasher plausibly does (sort cols, sort rows,
stringify), and show any bit-level / representation differences."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from satellitetools_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def main():
    names = sys.argv[1:]
    spark = get_spark("diag", master="local[8]", shuffle_partitions=8)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs = E.queries()
    oracles = E.oracle_sql()
    for name in names:
        print(f"===== {name}")
        got = qs[name](spark, SF_DIR).toPandas()
        want = con.execute(oracles[name]).df()
        print("spark dtypes:", dict(got.dtypes.astype(str)))
        print("duck  dtypes:", dict(want.dtypes.astype(str)))
        try:
            a, b = canon(got), canon(want)
        except Exception as ex:  # noqa: BLE001
            print("CANON ERROR:", ex)
            continue
        for c in a.columns:
            sa = a[c].map(repr)
            sb = b[c].map(repr)
            bad = sa != sb
            if bad.any():
                idx = list(bad[bad].index[:5])
                print(f"col {c}: {int(bad.sum())} repr-diffs, e.g.:")
                for i in idx:
                    va, vb = a[c].iloc[i], b[c].iloc[i]
                    extra = ""
                    if isinstance(va, float) and isinstance(vb, float):
                        extra = f" bits {np.float64(va).view() if False else ''}"
                        extra = (f" hex {float(va).hex()} vs {float(vb).hex()}")
                    print(f"  row {i}: {va!r} vs {vb!r}{extra}")
            else:
                print(f"col {c}: identical reprs")
    spark.stop()


if __name__ == "__main__":
    main()
