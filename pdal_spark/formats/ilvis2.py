"""ILVIS2 (NASA LVIS Level-2 elevation) text reader.

Re-expresses ``readers.ilvis2`` (``io/Ilvis2Reader.cpp``): '#'-headed
header lines, then 12 whitespace fields per shot — LVIS_LFID,
SHOTNUMBER, TIME, then centroid/low/high (longitude, latitude,
elevation) triples. Semantics:

* longitudes normalized to (-180, 180] — ``Utils::normalizeLongitude``
  (Utils.cpp:599-607: fmod 360 then wrap);
* ``mapping`` picks which triple becomes x/y/z (LOW / HIGH / CENTROID);
  the default ALL emits the LOW point for every shot plus a SECOND,
  HIGH-mapped point when the two elevations differ
  (Ilvis2Reader.cpp processOne);
* the reference throws on a non-12-field data line; a distributed text
  scan drops such lines instead — ``validate=True`` restores the
  fatal behavior with one extra count.

Fully distributed: ``spark.read.text`` line-splits the file across
tasks; everything else is column expressions (no UDF).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FIELDS = [
    ("lvis_lfid", "long"),
    ("shot_number", "long"),
    ("gps_time", "double"),
    ("longitude_centroid", "double"),
    ("latitude_centroid", "double"),
    ("elevation_centroid", "double"),
    ("longitude_low", "double"),
    ("latitude_low", "double"),
    ("elevation_low", "double"),
    ("longitude_high", "double"),
    ("latitude_high", "double"),
    ("elevation_high", "double"),
]
MAPPINGS = ("low", "high", "centroid", "all")


def _norm_lon(c):
    """Utils::normalizeLongitude — fmod(360) then wrap to (-180, 180]."""
    # Spark's % keeps the dividend's sign, exactly like C++ fmod
    m = c % F.lit(360.0)
    return (
        F.when(m <= -180.0, m + 360.0)
        .when(m > 180.0, m - 360.0)
        .otherwise(m)
    )


def read_ilvis2(
    spark: SparkSession,
    paths: Sequence[str] | str,
    mapping: str = "all",
    validate: bool = False,
) -> DataFrame:
    mapping = mapping.lower()
    if mapping not in MAPPINGS:
        raise ValueError(f"unknown ilvis2 mapping {mapping!r}")
    if isinstance(paths, str):
        paths = [paths]
    lines = spark.read.text(list(paths)).filter(
        ~F.col("value").startswith("#") & (F.trim("value") != "")
    )
    f = F.split(F.trim(F.col("value")), r"\s+")
    rows = lines.select(f.alias("f"))
    if validate:
        bad = rows.filter(F.size("f") != 12).count()
        if bad:
            raise ValueError(
                f"Invalid format: {bad} lines do not have 12 fields."
            )
    rows = rows.filter(F.size("f") == 12)
    cols = []
    for i, (name, typ) in enumerate(FIELDS):
        c = F.col("f")[i].cast(typ)
        if name.startswith("longitude"):
            c = _norm_lon(c)
        cols.append(c.alias(name))
    base = rows.select(*cols)

    def _mapped(src: DataFrame, which: str) -> DataFrame:
        return src.select(
            "*",
            F.col(f"longitude_{which}").alias("x"),
            F.col(f"latitude_{which}").alias("y"),
            F.col(f"elevation_{which}").alias("z"),
        )

    if mapping in ("low", "high", "centroid"):
        return _mapped(base, mapping)
    # ALL: every LOW point + a HIGH twin where the elevations differ
    low = _mapped(base, "low")
    high = _mapped(
        base.filter(F.col("elevation_low") != F.col("elevation_high")),
        "high",
    )
    return low.unionByName(high)
