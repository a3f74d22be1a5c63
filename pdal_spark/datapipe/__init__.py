"""Large-scale training-data pipeline operators (beyond the reference's
own inventory): deduplication, similarity search, text analysis,
multimodal plumbing — the operations a 100 TB web-text corpus pipeline
needs, built as DataFrame->DataFrame functions like the PDAL-parity
operator layer.

Every numeric recipe (hashes, signatures, scores) is chosen to be
expressible in BOTH Spark Column expressions and DuckDB SQL with
bit-identical results, so each operator ships with an ANSI-SQL oracle
twin for the correctness driver.
"""
