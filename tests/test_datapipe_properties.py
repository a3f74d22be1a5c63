"""Property tests (hypothesis) for the datapipe arithmetic laws.

Engine == twin is established by the sf0.001/sf0.01 parity tests (and
the per-round driver gate); these pin the LAWS on the DuckDB twin with
randomized inputs — fast (no Spark session per example), and any law
violation the twin exhibits would equally indict the engine since the
two are bit-compared elsewhere.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdal_spark.datapipe import bloom, packing


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=5_000), min_size=1,
             max_size=40),
    st.integers(min_value=1, max_value=512),
)
def test_pack_sequences_law(counts, max_len):
    """Offsets are the exclusive prefix sums; blocks tile the stream."""
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(counts)), "n": counts}),
    )
    rows = con.sql(packing.pack_sequences_sql(max_len, "n")).fetchall()
    rows.sort()
    run = 0
    for (doc_id, n, tok_start, bs, be, nb) in rows:
        assert tok_start == run
        run += n
        if n == 0:
            assert (bs, be, nb) == (None, None, 0)
        else:
            assert bs == tok_start // max_len
            assert be == (tok_start + n - 1) // max_len
            assert nb == be - bs + 1
    con.close()


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.text(alphabet="abcdef ", min_size=0, max_size=24),
             min_size=1, max_size=30),
    st.integers(min_value=1, max_value=64).map(lambda i: i * 64),
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=2, max_value=5),
)
def test_bloom_never_false_negative(texts, m_bits, k, mod):
    """Every document whose predicate held at build time is flagged —
    for ANY filter size, probe count, and reference split."""
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
    )
    got = dict(
        con.sql(
            bloom.bloom_screen_sql(f"doc_id % {mod} = 0", m_bits=m_bits, k=k)
        ).fetchall()
    )
    # duplicate texts across the split can only ADD members, never hide
    for i in range(len(texts)):
        if i % mod == 0:
            assert got[i] is True
    con.close()
