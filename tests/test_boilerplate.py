"""Host-template boilerplate removal — literal semantics + twin."""

from __future__ import annotations

import duckdb
import pandas as pd

from pdal_spark.datapipe import boilerplate as bp


def _pages(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "host", "text"])
    )


def test_strip_literal_semantics(spark):
    """Template lines (on >=60% AND >=2 docs of the host) are stripped
    from EVERY page incl. the first; content lines survive; a line
    shared by only 1 of 3 docs survives; hosts are isolated."""
    nav = "home about contact"
    rows = [
        (0, "a", f"{nav}\nalpha beta gamma\nshared once"),
        (1, "a", f"{nav}\ndelta epsilon zeta"),
        (2, "a", f"{nav}\neta theta iota"),
        # host b: nav appears on only 1 of 2 docs -> NOT boilerplate there
        (3, "b", f"{nav}\nkappa"),
        (4, "b", "lambda mu"),
    ]
    out = {
        r.doc_id: r
        for r in bp.strip_boilerplate(_pages(spark, rows)).collect()
    }
    assert out[0].clean_text == "alpha beta gamma\nshared once"
    assert out[0].n_lines == 3 and out[0].n_boiler == 1
    assert out[1].clean_text == "delta epsilon zeta"
    assert out[2].clean_text == "eta theta iota"
    # host b keeps its single nav occurrence
    assert out[3].clean_text == f"{nav}\nkappa"
    assert out[3].n_boiler == 0
    assert out[4].clean_text == "lambda mu"


def test_content_repeated_hostwide_is_stripped(spark):
    """It's a frequency rule, not a nav whitelist: ANY line verbatim on
    >=60% of the host's pages goes — including 'content'."""
    rows = [
        (0, "h", "breaking news today\nunique zero"),
        (1, "h", "breaking news today\nunique one"),
        (2, "h", "unique two only"),
    ]
    out = {
        r.doc_id: r
        for r in bp.strip_boilerplate(_pages(spark, rows)).collect()
    }
    assert out[0].clean_text == "unique zero"
    assert out[1].clean_text == "unique one"
    assert out[2].clean_text == "unique two only"


def test_min_docs_floor(spark):
    """A single-page host can never lose lines (min_docs=2 floor): 1/1
    = 100% of the host's docs, but n_docs=1 < min_docs."""
    rows = [(0, "solo", "only page\nof this host")]
    out = bp.strip_boilerplate(_pages(spark, rows)).collect()[0]
    assert out.n_boiler == 0
    assert out.clean_text == "only page\nof this host"


def test_duplicate_line_within_one_doc_counts_once(spark):
    """array_distinct: a line twice in ONE doc is one vote, so 2 votes
    from 1-of-3 docs don't cross the 60% bar."""
    rows = [
        (0, "h", "twice\ntwice\nalpha"),
        (1, "h", "beta"),
        (2, "h", "gamma"),
    ]
    out = {
        r.doc_id: r
        for r in bp.strip_boilerplate(_pages(spark, rows)).collect()
    }
    assert out[0].clean_text == "twice\ntwice\nalpha"


def test_detector_counts(spark):
    rows = [
        (0, "h", "nav\nx"),
        (1, "h", "nav\ny"),
        (2, "h", "nav\nz"),
    ]
    got = bp.host_boilerplate_lines(_pages(spark, rows)).collect()
    assert [(r.host, r.line, r.n_docs, r.h_docs) for r in got] == [
        ("h", "nav", 3, 3)
    ]


def test_sql_twin_on_synth_view(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = (
        bp.strip_boilerplate(bp.with_synth_host_pages(docs))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    ref = (
        con.sql(bp.strip_boilerplate_sql(bp.with_synth_host_pages_sql()))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(out) == len(ref)
    for c in ["host", "n_lines", "n_boiler", "clean_text"]:
        assert (out[c].values == ref[c].values).all(), c
    # every synth page sheds exactly its nav + footer
    assert (out.n_boiler == 2).all()


def test_broadcast_join_plan(spark):
    """The strip join must broadcast the per-host template table — the
    pages side (100 TB) never shuffles for the rebuild."""
    rows = [(i, f"h{i % 2}", f"nav\nbody {i}") for i in range(6)]
    plan = bp.strip_boilerplate(_pages(spark, rows))._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
