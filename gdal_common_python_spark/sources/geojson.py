"""GeoJSON sink (S9, lib/conversionfeature.py:7-30).

The reference string-concatenates feature.ExportToJson() in a driver loop.
Engine: build the Feature JSON natively (to_json over structs — JVM-side),
write as text; ``to_feature_collection`` assembles the full FeatureCollection
string only for driver-side export of small results (the reference's use)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def feature_json(zones: DataFrame) -> DataFrame:
    """One GeoJSON Feature string per zone row (native to_json)."""
    props = F.struct(
        F.col("zone_id"), F.col("name"), F.col("category"), F.col("srid")
    )
    feature = F.struct(
        F.lit("Feature").alias("type"),
        props.alias("properties"),
        F.struct(F.lit("Polygon").alias("type"), F.col("rings").alias("coordinates")).alias(
            "geometry"
        ),
    )
    return zones.select(F.col("zone_id"), F.to_json(feature).alias("feature"))


def to_feature_collection(zones: DataFrame) -> str:
    """Small-result driver-side FeatureCollection (lib/conversionfeature.py:14-26)."""
    feats = [r.feature for r in feature_json(zones).collect()]
    return '{\n  "type": "FeatureCollection", \n  "features": [\n' + ",\n".join(
        "    " + f for f in feats
    ) + "\n  ]\n}"
