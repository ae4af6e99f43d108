"""GeoJSON sink (S9, lib/conversionfeature.py:7-30).

The reference exports ANY layer: properties come from the layer's field
definitions and the geometry from ``feature.ExportToJson()``
(lib/conversionfeature.py:13-26). Engine analog: properties derive from the
DataFrame SCHEMA (every column except the geometry), so any table exports —
no hardcoded shape. The Feature JSON builds natively (to_json over structs,
JVM-side); ``to_feature_collection`` assembles the FeatureCollection string
driver-side only for small results (the reference's use).

Geometry representation: a ``rings`` column exports as a "Polygon" whose
coordinates are the flat ring list (outer + holes, even-odd — multipart
collections included; documented divergence from OGR's nested MultiPolygon
grouping, which needs per-ring orientation grouping the flat storage does
not carry). Point layers (x/y columns) export as "Point".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def feature_json(
    df: DataFrame,
    geometry_col: str = "rings",
    geometry_type: str = "Polygon",
    exclude: tuple[str, ...] = (),
    id_col: str | None = None,
) -> DataFrame:
    """One GeoJSON Feature string per row; properties = every column except
    the geometry (schema-derived, any table shape).

    ``geometry_type='Point'`` reads ``x``/``y`` columns instead of rings.
    ``id_col`` (default: first property column) is also carried through as a
    plain column for downstream joins."""
    if geometry_type == "Point":
        geom_cols = {"x", "y"}
        geometry = F.struct(
            F.lit("Point").alias("type"),
            F.array(F.col("x"), F.col("y")).alias("coordinates"),
        )
    else:
        geom_cols = {geometry_col}
        geometry = F.struct(
            F.lit(geometry_type).alias("type"),
            F.col(geometry_col).alias("coordinates"),
        )
    prop_cols = [c for c in df.columns if c not in geom_cols and c not in exclude]
    if not prop_cols:
        raise ValueError("feature_json: no property columns left to export")
    props = F.struct(*[F.col(c) for c in prop_cols])
    feature = F.struct(
        F.lit("Feature").alias("type"),
        props.alias("properties"),
        geometry.alias("geometry"),
    )
    key = id_col or prop_cols[0]
    return df.select(F.col(key), F.to_json(feature).alias("feature"))


def to_feature_collection(df: DataFrame, **kwargs) -> str:
    """Small-result driver-side FeatureCollection (lib/conversionfeature.py:14-26)."""
    feats = [r.feature for r in feature_json(df, **kwargs).collect()]
    return '{\n  "type": "FeatureCollection", \n  "features": [\n' + ",\n".join(
        "    " + f for f in feats
    ) + "\n  ]\n}"
