#!/usr/bin/env python
"""Driver-contract correctness gate, run locally.

Mimics the external driver exactly: a VANILLA SparkSession (no repo
tuning — queries() must not depend on session conf), every
__spark_entry__.queries()[name] vs oracle_sql()[name] through DuckDB,
columns sorted by name, rows sorted by all columns, floats compared to
1e-9. Queries without an oracle are executed rows-only.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    import duckdb
    import numpy as np
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    O, Q = E.oracle_sql(), E.queries()
    bad: list[str] = []
    for name in sorted(Q):
        if only and name not in only:
            continue
        try:
            got = Q[name](spark, sf_dir).toPandas()
            if name not in O:
                print(f"OK   {name:<22} {len(got):>7} rows (rows-only)")
                continue
            exp = con.sql(O[name]).df()
            got = got[sorted(got.columns)]
            exp = exp[sorted(exp.columns)]
            assert list(got.columns) == list(exp.columns), (
                f"columns {list(got.columns)} vs {list(exp.columns)}"
            )
            sc = list(got.columns)
            got = got.sort_values(sc, kind="stable").reset_index(drop=True)
            exp = exp.sort_values(sc, kind="stable").reset_index(drop=True)
            assert len(got) == len(exp), f"rows {len(got)} vs {len(exp)}"
            for c in sc:
                g, x = got[c], exp[c]
                if np.issubdtype(np.asarray(g).dtype, np.floating) or np.issubdtype(
                    np.asarray(x).dtype, np.floating
                ):
                    gg = g.astype(float).to_numpy()
                    xx = x.astype(float).to_numpy()
                    both_nan = np.isnan(gg) & np.isnan(xx)
                    d = np.abs(gg - xx)
                    d[both_nan] = 0.0
                    assert np.nanmax(d, initial=0.0) <= 1e-9, (
                        f"col {c}: max|diff|={np.nanmax(d):g}"
                    )
                else:
                    same = g.astype(str).to_numpy() == x.astype(str).to_numpy()
                    assert same.all(), f"col {c}: {int((~same).sum())} mismatches"
            print(f"OK   {name:<22} {len(got):>7} rows")
        except Exception as exc:
            bad.append(name)
            print(f"FAIL {name:<22} {str(exc)[:160]}")
    print(f"\n{len(bad)} failures" + (f": {bad}" if bad else " — driver gate will pass"))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
