"""Oracle dtype lint: no DuckDB-widened types may survive an oracle.

Three rounds in a row a driver hash-mismatch traced to DuckDB silently
widening an integer expression — windowed ``sum(BIGINT)`` → HUGEINT
(r3 ``pack_sequences``), ``list[...]`` extraction (r2 ``kmv_distinct``),
``//`` on a window sum (r1 ``divider_round_robin``).  The engine emits
LongType; the driver's value hash is dtype-sensitive; identical values
still mismatch.  This lint makes the whole class unrepresentable: every
``oracle_sql()`` statement is type-checked through DuckDB (LIMIT 0 — no
data compare) and any HUGEINT / unsigned / DECIMAL output column fails
with a message naming the query and column.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as E

SF_DIR = os.environ.get("PDAL_SPARK_TEST_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

#: DuckDB type names (prefix match on the rendered type) that Spark has
#: no matching driver-side dtype for.  DECIMAL is included: Spark maps it
#: to object/Decimal in pandas while the engine side is float64/int64.
FORBIDDEN = (
    "HUGEINT", "UHUGEINT", "UTINYINT", "USMALLINT", "UINTEGER",
    "UBIGINT", "DECIMAL",
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield c
    c.close()


def _oracles():
    return sorted(E.oracle_sql().items())


@pytest.mark.parametrize(
    "name,sql", _oracles(), ids=[n for n, _ in _oracles()]
)
def test_oracle_has_no_widened_dtypes(con, name, sql):
    rel = con.sql(f"SELECT * FROM ({sql}) AS _lint LIMIT 0")
    bad = [
        f"{col}: {typ}"
        for col, typ in zip(rel.columns, map(str, rel.types))
        if any(str(typ).upper().startswith(f) for f in FORBIDDEN)
    ]
    assert not bad, (
        f"oracle `{name}` emits DuckDB-widened column types {bad}; "
        "wrap the expression in CAST(... AS BIGINT/DOUBLE) — the driver "
        "hash is dtype-sensitive and Spark has no matching type"
    )
