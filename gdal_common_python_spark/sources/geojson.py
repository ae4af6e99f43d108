"""GeoJSON sink (S9, lib/conversionfeature.py:7-30).

The reference exports ANY layer: properties come from the layer's field
definitions and the geometry from ``feature.ExportToJson()``
(lib/conversionfeature.py:13-26). Engine analog: properties derive from the
DataFrame SCHEMA (every column except the geometry), so any table exports —
no hardcoded shape. The Feature JSON builds natively (to_json over structs,
JVM-side); ``to_feature_collection`` assembles the FeatureCollection string
driver-side only for small results (the reference's use).

Geometry representation: a ``rings`` column exports either as a "Polygon"
whose coordinates are the flat ring list (outer + holes, even-odd — the
engine's storage convention, fastest path: pure JVM to_json), or — with
``geometry_type='MultiPolygon'`` — as a spec-shaped nested MultiPolygon:
rings are grouped into per-part [exterior, holes...] nesting via the
orientation/containment grouping ``kernels.geom.split_outers_holes``
already computes, exteriors CCW and holes CW with closing vertices, per
RFC 7946 §3.1.7/3.1.9 (OGR's ExportToJson shape). Point layers (x/y
columns) export as "Point".
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

_MP_COORDS_T = T.ArrayType(T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType()))))


def multipolygon_coords(rings_col):
    """Column expression: flat ring list -> nested MultiPolygon coordinates
    ([[exterior, holes...], ...], rings closed, exterior CCW / holes CW)."""
    from ..kernels import geom as G

    @F.pandas_udf(_MP_COORDS_T)
    def mp(rings: pd.Series) -> pd.Series:
        out = []
        for cell in rings:
            rr = G.rings_from_cell(cell)
            parts = []
            for outer, holes in G.split_outers_holes(rr):
                part = [np.vstack([outer, outer[:1]]).tolist()]  # close; CCW
                for h in holes:
                    hh = h[::-1]  # split_outers_holes re-oriented CCW; spec wants CW
                    part.append(np.vstack([hh, hh[:1]]).tolist())
                parts.append(part)
            out.append(parts)
        return pd.Series(out)

    return mp(rings_col)


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
    elif geometry_type == "MultiPolygon":
        geom_cols = {geometry_col}
        geometry = F.struct(
            F.lit("MultiPolygon").alias("type"),
            multipolygon_coords(F.col(geometry_col)).alias("coordinates"),
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


def write_ndjson(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partitions: int | None = None,
    **kwargs,
) -> None:
    """Distributed newline-delimited GeoJSON sink (GeoJSONSeq, RFC 8142
    minus the RS framing — the line-oriented form every GIS reader and
    ``ogr2ogr -f GeoJSONSeq`` accepts): one Feature per line, written
    executor-side via ``df.write.text``. This is the scale path next to the
    driver-string :func:`to_feature_collection` — nothing ever collects,
    output parallelism = input partitioning (or ``partitions`` when given).
    Accepts the same geometry kwargs as :func:`feature_json`."""
    feats = feature_json(df, **kwargs).select(F.col("feature").alias("value"))
    if partitions:
        feats = feats.repartition(partitions)
    feats.write.mode(mode).text(path)


def read_ndjson(spark, path: str, properties_schema: str | None = None) -> DataFrame:
    """Read a :func:`write_ndjson` layer back: one row per Feature with
    ``properties`` (optionally typed via ``properties_schema``, else a
    map<string,string>) and the raw ``geometry`` JSON string."""
    raw = spark.read.text(path)
    props = F.from_json(
        F.get_json_object("value", "$.properties"),
        properties_schema or "map<string,string>",
    )
    return raw.select(
        props.alias("properties"),
        F.get_json_object("value", "$.geometry").alias("geometry"),
    )


def to_feature_collection(df: DataFrame, **kwargs) -> str:
    """Small-result driver-side FeatureCollection (lib/conversionfeature.py:14-26)."""
    feats = [r.feature for r in feature_json(df, **kwargs).collect()]
    return '{\n  "type": "FeatureCollection", \n  "features": [\n' + ",\n".join(
        "    " + f for f in feats
    ) + "\n  ]\n}"
