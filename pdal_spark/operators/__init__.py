"""Operator library: every operator is a pure function DataFrame -> DataFrame.

PDAL's 1:N "PointViewSet" fan-out (splitter/crop/groupby emitting many
views) is represented as a single DataFrame carrying a view-key column
(`tile_x`/`tile_y`, `geom_id`, `view_id`, ...) — the Spark-native shape:
per-view files fall out of `df.write.partitionBy(view_key)`.
"""
