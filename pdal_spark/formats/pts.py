"""PTS (Leica) text point files.

Re-expresses ``readers.pts`` (``io/PtsReader.cpp``): first line is the
point count; the second line's field count selects the schema —
3 = X Y Z, 4 = + Intensity, 7 = + Intensity R G B
(PtsReader.cpp:initialize). Data rows with the wrong field count are
IGNORED and non-numeric fields become 0 (PtsReader.cpp:read error
paths), both replicated as column expressions.

Scale shape: unlike PLY ascii, PTS is line-oriented with no trailing
elements, so the whole file distributes through ``spark.read.text``
(native line splitting across tasks). The count header line has one
field, so the schema-arity filter drops it for free; the declared count
caps the scan via ``limit``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SCHEMAS = {
    3: ("x", "y", "z"),
    4: ("x", "y", "z", "intensity"),
    7: ("x", "y", "z", "intensity", "red", "green", "blue"),
}


def _peek(path: str, separator: str) -> tuple[int, tuple]:
    with open(path, "r") as f:
        first = f.readline().strip()
        try:
            count = int(first)
        except ValueError:
            raise ValueError(
                "Unable to read expected point count at top of the file "
                f"'{path}'."
            )
        second = f.readline().strip()
    n_fields = len([s for s in second.split(separator) if s])
    if n_fields not in _SCHEMAS:
        raise ValueError(
            f"'{path}': unsupported PTS field count {n_fields} "
            "(expected 3, 4 or 7)."
        )
    return count, _SCHEMAS[n_fields]


def read_pts(
    spark: SparkSession,
    paths: Sequence[str] | str,
    separator: str = " ",
) -> DataFrame:
    if isinstance(paths, str):
        paths = [paths]
    counts = [_peek(p, separator) for p in paths]
    dims = counts[0][1]
    if any(d != dims for _, d in counts):
        raise ValueError("mixed PTS schemas in one read")
    total = sum(c for c, _ in counts)

    lines = spark.read.text(list(paths))
    fields = F.split(F.trim(F.col("value")), separator)
    # wrong-arity rows (incl. the count header) are ignored
    rows = lines.select(fields.alias("f")).filter(F.size("f") == len(dims))
    cols = []
    for i, name in enumerate(dims):
        c = F.coalesce(
            F.col("f")[i].try_cast("double"), F.lit(0.0)
        )  # parse failure -> 0 (PtsReader.cpp read loop)
        if name in ("intensity", "red", "green", "blue"):
            c = c.cast("int")
        cols.append(c.alias(name))
    return rows.select(*cols).limit(total)
