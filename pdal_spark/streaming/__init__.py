"""Structured Streaming layer.

The reference's "streaming" is bounded micro-batch pull
(pdal/Streamable.cpp:178-262): batches of `capacity` rows flow through
the stage chain; per-filter accumulators (stats moments, hexbin counts)
are finalized in done(). Spark's Structured Streaming generalizes that:
unbounded sources, watermarks, exactly-once sinks. This package maps the
reference's concepts:

  * streamable filter chain  -> stateless DataFrame ops applied to a
    readStream DataFrame (crop/splitter/assign/range are stateless —
    the same operator functions work unchanged on streaming frames).
  * per-filter accumulators  -> windowed/stateful aggregations
    (stats moments == groupBy(window).agg of the same moment exprs).
  * stream/standard equality -> tested invariant here too: the streaming
    result over a bounded source equals the batch result on the same
    rows (test_streaming.py; mirrors test/unit/StreamingTest.cpp:48-166).
  * resumability             -> checkpointLocation on the writeStream,
    plus the batch-side lineage ledger in pdal_spark.lineage.
"""

from pdal_spark.streaming.jobs import (
    stream_stats_moments,
    stream_tile_counts,
    stream_windowed_counts,
)

__all__ = [
    "stream_stats_moments",
    "stream_tile_counts",
    "stream_windowed_counts",
]
