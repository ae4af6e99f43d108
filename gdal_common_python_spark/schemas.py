"""Explicit StructTypes for every engine table (FIXTURES.md).

The reference reads schemas from OGR layer definitions (fields.py:26-51) and
never infers; this engine does the same with explicit StructTypes — never
``inferSchema`` (SURVEY.md §1.1).
"""

from __future__ import annotations

from pyspark.sql import types as T

SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN), False),
    ]
)

RINGS = T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType())))

BBOX = T.StructType(
    [
        T.StructField("xmin", T.DoubleType(), False),
        T.StructField("ymin", T.DoubleType(), False),
        T.StructField("xmax", T.DoubleType(), False),
        T.StructField("ymax", T.DoubleType(), False),
    ]
)

ZONES = T.StructType(
    [
        T.StructField("zone_id", T.LongType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("category", T.StringType(), False),
        T.StructField("srid", T.IntegerType(), False),
        T.StructField("rings", RINGS, False),
        T.StructField("bbox", BBOX, False),
    ]
)

ZONE_EDGES = T.StructType(
    [
        T.StructField("zone_id", T.LongType(), False),
        T.StructField("srid", T.IntegerType(), False),
        T.StructField("ring_idx", T.IntegerType(), False),
        T.StructField("x1", T.DoubleType(), False),
        T.StructField("y1", T.DoubleType(), False),
        T.StructField("x2", T.DoubleType(), False),
        T.StructField("y2", T.DoubleType(), False),
    ]
)

RASTERS = T.StructType(
    [
        T.StructField("raster_id", T.StringType(), False),
        T.StructField("band", T.IntegerType(), False),
        T.StructField("input_rank", T.IntegerType(), False),
        T.StructField("origin_x", T.DoubleType(), False),
        T.StructField("origin_y", T.DoubleType(), False),
        T.StructField("px_x", T.DoubleType(), False),
        T.StructField("px_y", T.DoubleType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("nodata", T.DoubleType(), False),
    ]
)

RASTER_TILES = T.StructType(
    list(RASTERS.fields)
    + [
        T.StructField("tile_x", T.IntegerType(), False),
        T.StructField("tile_y", T.IntegerType(), False),
        T.StructField("tile_w", T.IntegerType(), False),
        T.StructField("tile_h", T.IntegerType(), False),
        T.StructField("pixels", T.ArrayType(T.DoubleType()), False),
    ]
)

NEAR_POINTS = T.StructType(
    [
        T.StructField("point_id", T.LongType(), False),
        T.StructField("srid", T.IntegerType(), False),
        T.StructField("x", T.DoubleType(), False),
        T.StructField("y", T.DoubleType(), False),
        T.StructField("tag", T.StringType(), False),
    ]
)

CHECKPOINT = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("input_rows", T.LongType(), False),
        T.StructField("output_rows", T.LongType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("wall_ms", T.DoubleType(), False),
        T.StructField("written_at", T.TimestampType(), False),
    ]
)
