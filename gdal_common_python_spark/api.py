"""Reference-shaped API facade — one entry per reference function.

A user of ``lindseysim/gdal-common-python`` can find every operation they
call today under the same name here, re-expressed over DataFrames. Each
docstring cites the reference implementation (file:line) it replaces; the
SURVEY.md §2 inventory IDs are noted for the coverage audit.

Layer/feature handles become DataFrames; datasource paths go through
``sources.catalog``; per-row callbacks become vectorized expressions or
Arrow kernels (the reference's callback sites are listed in SURVEY §2.9).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, functions as F, types as T

from .functions import dates as _dates, measures as _measures
from .kernels import geom as _geom, raster as _raster_kernels
from .operators import (
    dissolve as _dissolve,
    resample as _resample,
    equi_join as _equi_join,
    knn as _knn,
    mosaic as _mosaic,
    overlay as _overlay,
    reproject as _reproject,
    spatial_join as _spatial_join,
    zonal as _zonal,
)
from .sources import catalog as _catalog, geojson as _geojson

# ----------------------------------------------------------- features.py


def get_datasource(spark: SparkSession, path_or_name: str) -> DataFrame:
    """S1/S2 — features.get_datasource (features.py:64-76) + driver guessing
    (features.py:27-57): format registry + load."""
    return _catalog.load(spark, path_or_name)


def count(df: DataFrame) -> int:
    """S5/A1 — features.count (features.py:167-179)."""
    return df.count()


def copy_datasource_as_empty(spark: SparkSession, df: DataFrame) -> DataFrame:
    """S4 — features.copy_datasource_as_empty (features.py:97-135): clone
    schema, zero rows."""
    return spark.createDataFrame([], df.schema)


def envelope_exprs(rings_col: str = "rings"):
    """Native (pure-codegen) per-feature envelope over a flat ring list ->
    (xmin, ymin, xmax, ymax) Column expressions. Exact: min/max have no
    accumulation-order sensitivity, so a SQL oracle hash-matches."""
    pts = F.flatten(F.col(rings_col))
    xs = F.transform(pts, lambda p: F.element_at(p, 1))
    ys = F.transform(pts, lambda p: F.element_at(p, 2))
    return F.array_min(xs), F.array_min(ys), F.array_max(xs), F.array_max(ys)


def get_extent(df: DataFrame) -> DataFrame:
    """P11 — features.get_extent (features.py:79-94): per-feature envelope
    (the precomputed bbox column, or derived from rings — natively, JVM-side
    whole-stage codegen instead of the former Arrow round trip)."""
    if "bbox" in df.columns:
        return df.select("zone_id", "bbox")
    xmin, ymin, xmax, ymax = envelope_exprs("rings")
    return df.withColumn(
        "bbox",
        F.struct(
            xmin.alias("xmin"), ymin.alias("ymin"),
            xmax.alias("xmax"), ymax.alias("ymax"),
        ),
    )


def get_layer_extent(df: DataFrame, rings_col: str = "rings") -> DataFrame:
    """A7 — layer-level extent: one row (xmin, ymin, xmax, ymax) over every
    feature's envelope; native min/max aggregate (one map-side-combined
    pass, no driver loop)."""
    xmin, ymin, xmax, ymax = envelope_exprs(rings_col)
    per = df.select(
        xmin.alias("xmin"), ymin.alias("ymin"), xmax.alias("xmax"), ymax.alias("ymax")
    )
    return per.agg(
        F.min("xmin").alias("xmin"), F.min("ymin").alias("ymin"),
        F.max("xmax").alias("xmax"), F.max("ymax").alias("ymax"),
    )


def layer_info(df: DataFrame, rings_col: str = "rings") -> DataFrame:
    """ogrinfo ``-so`` (summary-only) analog: ONE row describing the layer
    — feature count, ring count, vertex count, and the layer extent — from
    a single map-side-combined wide aggregate over native HOF expressions
    (zero Python, zero extra shuffle; the counts are exact integers and
    min/max are order-free, so the DuckDB oracle hash-matches). The
    reference surfaces only per-call fragments of this (feature count
    `features.py`, extent `features.py:79-94`, field list `fields.py`);
    this rolls the layer summary any OGR user reads off `ogrinfo` into one
    scan."""
    n_rings = F.size(F.col(rings_col))
    n_vertices = F.aggregate(
        F.transform(F.col(rings_col), lambda r: F.size(r)),
        F.lit(0),
        lambda a, x: a + x,
    )
    xmin, ymin, xmax, ymax = envelope_exprs(rings_col)
    per = df.select(
        n_rings.alias("r"), n_vertices.alias("v"),
        xmin.alias("x0"), ymin.alias("y0"), xmax.alias("x1"), ymax.alias("y1"),
    )
    return per.agg(
        F.count("*").alias("n_features"),
        F.sum("r").cast("long").alias("n_rings"),
        F.sum("v").cast("long").alias("n_vertices"),
        F.min("x0").alias("xmin"), F.min("y0").alias("ymin"),
        F.max("x1").alias("xmax"), F.max("y1").alias("ymax"),
    )


def make_valid(df: DataFrame, rings_col: str = "rings") -> DataFrame:
    """P10 — features.make_valid (features.py:204-223): normalize rings
    (drop closing vertex, drop degenerate rings) AND repair self-crossing
    rings into simple CCW sub-rings under OGR's nonzero-winding rule
    (kernels.geom.make_valid_rings: bowtie -> two triangles, pentagram ->
    lobes WITH the core filled)."""

    @F.pandas_udf(T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType()))))
    def norm(rings: pd.Series) -> pd.Series:
        return pd.Series(
            [
                [r.tolist() for r in _geom.make_valid_rings(_geom.rings_from_cell(rr))]
                for rr in rings
            ]
        )

    return df.withColumn(rings_col, norm(rings_col))


# ------------------------------------------------------------- fields.py


def values(df: DataFrame, fields: list[str]) -> list[dict]:
    """P2 — fields.values (fields.py:158-201): materialize selected columns
    (driver-side, small results only — the reference always materialized)."""
    return [r.asDict() for r in df.select(*fields).collect()]


def calculate(df: DataFrame, on_field: str, use_fields: list[str], batch_fn) -> DataFrame:
    """P6 — fields.calculate (fields.py:312-343). The reference's per-row
    ``calc_callback(i, feat, values)`` becomes a VECTORIZED batch function
    ``batch_fn(*pandas_series) -> pandas_series`` (SURVEY §2.9): the central
    no-per-row-Python replacement."""
    udf = F.pandas_udf(T.DoubleType())(batch_fn)
    return df.withColumn(on_field, udf(*[F.col(c) for c in use_fields]))


calc_geometry = _measures.calc_geometry  # P7/M1/M2 — fields.calc_geometry (fields.py:346-423)

join = _equi_join.attribute_join  # J1 — fields.join (fields.py:426-497)


# ----------------------------------------------------------- lib/extract.py


def extract_features(df: DataFrame, predicate: Column) -> DataFrame:
    """P8/P9 — extract.features / features_with_callback
    (lib/extract.py:8-76): the validation callback becomes a Column
    predicate (Catalyst pushes it to the scan)."""
    return df.filter(predicate)


# -------------------------------------------------------------- lib/*.py

intersect = _spatial_join.spatial_join_geoms  # J2 — join.intersect (lib/join.py:5-60)
intersect_with_fields = _spatial_join.spatial_join_with_fields  # J2 + join-layer attrs (lib/join.py:31-33,53)
near_table = _knn.near_table  # J3 — analysis.near_table (lib/analysis.py:241-322)
near_table_geoms = _knn.near_table_geoms  # J3 for polygon layers (geom.Distance)
knn = _knn.knn  # J3 scale path — kNN via cell-disk + re-rank

buffer = _overlay.buffer_points  # G1 — analysis.buffer (lib/analysis.py:8-51)
buffer_layer = _overlay.buffer_layer  # G1 full surface: arbitrary polygons, any distance sign
clip = _overlay.clip  # G2 — analysis.clip (lib/analysis.py:54-76)
erase = _overlay.erase  # G3 — analysis.erase (lib/analysis.py:79-102)
identity = _overlay.identity  # G4 — analysis.identity (lib/analysis.py:105-131)
intersection = _overlay.intersection  # G5 — analysis.intersection (lib/analysis.py:134-160)
symmetrical_difference = _overlay.symmetric_difference  # G6 (lib/analysis.py:163-186)
union = _overlay.union_layers  # G7 — analysis.union (lib/analysis.py:189-212)
update = _overlay.update  # G8 — analysis.update (lib/analysis.py:215-238)

dissolve = _dissolve.dissolve  # A2/A3/A4 — dissolve.all/single_part/on_field (lib/dissolve.py)
dissolve_two_level = _dissolve.dissolve_two_level  # A2/A4 scale path (partial+final union)
zonal_statistics = _zonal.zonal_statistics  # A5/A6 — zonal.statistics (lib/zonal.py:11-172)
mosaic_rasters = _mosaic.mosaic  # R8/S10 — mosaic.rasters (lib/mosaic.py:6-40)
mosaic_merge = _mosaic.mosaic_merge  # R8 full gdal_merge surface (mixed grids, -separate/-init/-ul_lr/-tap)
reproject = _reproject.reproject  # V1 — reproject.reproject_features (lib/reproject.py:9-48)
resample_raster = _resample.resample  # R7 — reproject.reproject_raster (lib/reproject.py:51-127; reference impl buggy, semantics ours); nearest/bilinear/average
rectify = _reproject.rectify  # V2 — _rectifyinputs (lib/_rectifyinputs.py:7-56)

to_geojson = _geojson.to_feature_collection  # S9 — conversion.feature.to_geojson

# cache contract: operators that persist a barrier attach its handle to the
# result; long-lived applications free it after the consuming action
from .operators.util import release  # noqa: E402  (operators/util.py docstring)

# ------------------------------------------------------------- rasters.py

calc_pixel_coordinates = _raster_kernels.pixel_coordinate  # R1 (rasters.py:97-116)


def get_transform(rasters: DataFrame, raster_id: str, band: int = 1):
    """rasters.get_transform analog (rasters.py:79-94) — reference shape:
    ([origin_x, origin_y], [px_x, px_y], [width, height]) with the extent in
    PIXELS (RasterXSize/RasterYSize), so reference-ported unpacking
    ``origin, pixel_size, extent = get_transform(...)`` works verbatim."""
    m = rasters.filter(
        (F.col("raster_id") == raster_id) & (F.col("band") == band)
    ).first()
    if m is None:
        raise ValueError(f"no raster {raster_id}/{band}")
    return (
        [float(m.origin_x), float(m.origin_y)],
        [float(m.px_x), float(m.px_y)],
        [int(m.width), int(m.height)],
    )


def get_no_data_value(rasters: DataFrame, raster_id: str, band: int = 1):
    """rasters.get_no_data_value analog (rasters.py:129-140): None when the
    band carries no nodata value, like GetNoDataValue()."""
    m = rasters.filter(
        (F.col("raster_id") == raster_id) & (F.col("band") == band)
    ).first()
    if m is None:
        raise ValueError(f"no raster {raster_id}/{band}")
    return None if m.nodata is None else float(m.nodata)

# ---------------------------------------------------------------- date.py

day_of_year = _dates.day_of_year  # D1 (date.py:8-14)
add_years = _dates.add_years  # D2 (date.py:17-23)
add_days = _dates.add_days  # D3 (date.py:26-32)
add_hours = _dates.add_hours  # D3 (date.py:35-41)
add_minutes = _dates.add_minutes  # D3 (date.py:44-50)
add_seconds = _dates.add_seconds  # D3 (date.py:53-59)
is_leap_year = _dates.is_leap_year_ref  # D4 — reference rule (date.py:62-68)
days_in_month = _dates.days_in_month_ref  # D5 (date.py:71-83)
get_month_name = _dates.month_name  # D6 (date.py:86-94)
get_month_abbreviation = _dates.month_abbreviation  # D6 (date.py:97-105)
