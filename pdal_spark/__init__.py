"""pdal_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch re-expression of the query/data-processing capabilities of
the PDAL point-cloud pipeline engine (reference: sunapi386/PDAL) as
idiomatic PySpark: DataFrame/Catalyst plans, vectorized Arrow/pandas UDFs
for the few operators built-ins can't express, explicit partitioning and
skew handling for web-scale (10^12-row) inputs.

The primary input is a Common-Crawl-style pages table
  (url string, warc_ts timestamp, html binary, text string, lang string)
with spatial coordinates (x, y) derived deterministically from
(url, warc_ts); PDAL's spatial operators (crop, splitter, chipper, hexbin,
kNN, rasterization) run over those coordinates while the `text` column is
preserved byte-identically through every stage.

Nothing here is a port: execution strategy, partitioning, and data layout
are Spark-first. Reference file:line citations in docstrings point at the
*semantics* being matched, not code being translated.
"""

from pdal_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
