"""Driver-contract regression net: run EVERY __spark_entry__ query and its
DuckDB oracle at sf0.001 and compare row sets (the same comparison the
correctness driver performs at sf0.01).

Columns are compared sorted by name, rows sorted by all columns; floats
with tiny tolerance (operators round their float outputs, so in practice
values are equal).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


ORACLES = E.oracle_sql()
QUERIES = E.queries()


def test_every_query_has_callable():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, ddb, name):
    got = QUERIES[name](spark, SF_DIR).toPandas()
    exp = ddb.sql(ORACLES[name]).df()
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    assert list(got.columns) == list(exp.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(exp.columns)}"
    )
    sort_cols = list(got.columns)
    got = got.sort_values(sort_cols, kind="stable").reset_index(drop=True)
    exp = exp.sort_values(sort_cols, kind="stable").reset_index(drop=True)
    assert len(got) == len(exp), f"{name}: {len(got)} rows vs {len(exp)}"
    for c in got.columns:
        g, x = got[c], exp[c]
        if np.issubdtype(np.asarray(g).dtype, np.floating) or np.issubdtype(
            np.asarray(x).dtype, np.floating
        ):
            np.testing.assert_allclose(
                g.astype(float), x.astype(float), rtol=0, atol=1e-9,
                err_msg=f"{name}.{c}",
            )
        else:
            pd.testing.assert_series_equal(
                g, x, check_dtype=False, check_names=False, obj=f"{name}.{c}"
            )


def test_queries_without_oracle_still_run(spark):
    weak = set(QUERIES) - set(ORACLES)
    for name in sorted(weak):
        df = QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    out = E.entry(spark)
    rows = out.collect()
    assert len(rows) >= 1
    assert {"tile_x", "tile_y", "n_pages"} <= set(out.columns)
