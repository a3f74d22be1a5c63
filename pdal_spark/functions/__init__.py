"""Predicate compilers: PDAL's two predicate languages -> Spark Columns.

PDAL has no general expression language; its filters take either
DimRange strings (`Dim[lo:hi]`) or Mongo-style JSON predicates. Both
compile to plain Column expressions here — fully inside Catalyst, so
pushdown/pruning come for free.
"""

from pdal_spark.functions.dimrange import DimRange, compile_ranges, parse_range
from pdal_spark.functions.mongo import compile_mongo

__all__ = ["DimRange", "parse_range", "compile_ranges", "compile_mongo"]
