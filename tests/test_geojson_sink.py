"""Distributed NDJSON GeoJSON sink — executor-side write, round-trip."""

import glob
import json
import os

import pytest
from pyspark.sql import functions as F


def test_ndjson_round_trip(spark, zones, tmp_path):
    from gdal_common_python_spark.sources import geojson

    src = zones.select("zone_id", "name", "category", "rings4326").repartition(4)
    out = str(tmp_path / "layer")
    geojson.write_ndjson(
        src, out, geometry_col="rings4326", geometry_type="MultiPolygon",
        id_col="zone_id",
    )
    # distributed: one part file per partition, no driver collect
    parts = [p for p in glob.glob(os.path.join(out, "part-*")) if not p.endswith(".crc")]
    assert len(parts) == 4

    # every line is a standalone RFC 7946 Feature
    n = 0
    by_id = {}
    for p in parts:
        with open(p) as fh:
            for line in fh:
                f = json.loads(line)
                assert f["type"] == "Feature"
                assert f["geometry"]["type"] == "MultiPolygon"
                by_id[int(f["properties"]["zone_id"])] = f
                n += 1
    exp = {r.zone_id: r for r in src.collect()}
    assert n == len(exp) and set(by_id) == set(exp)

    # geometry: rings closed, exterior CCW (spec), all source vertices present
    zid, feat = next(iter(by_id.items()))
    for part in feat["geometry"]["coordinates"]:
        for ring in part:
            assert ring[0] == ring[-1] and len(ring) >= 4
    flat = {
        (round(x, 9), round(y, 9))
        for part in feat["geometry"]["coordinates"]
        for ring in part
        for x, y in ring
    }
    src_pts = {
        (round(float(x), 9), round(float(y), 9))
        for ring in exp[zid].rings4326
        for x, y in ring
    }
    assert src_pts <= flat

    # reader side
    back = geojson.read_ndjson(spark, out)
    assert back.count() == len(exp)
    row = back.filter(F.col("properties")["zone_id"] == str(zid)).first()
    assert json.loads(row.geometry)["type"] == "MultiPolygon"


def test_ndjson_points_and_repartition(spark, near_points, tmp_path):
    from gdal_common_python_spark.sources import geojson

    out = str(tmp_path / "pts")
    geojson.write_ndjson(
        near_points.select("point_id", "x", "y"), out,
        geometry_type="Point", partitions=2,
    )
    parts = [p for p in glob.glob(os.path.join(out, "part-*")) if not p.endswith(".crc")]
    assert len(parts) == 2
    lines = []
    for p in parts:
        lines += [json.loads(l) for l in open(p)]
    assert len(lines) == near_points.count()
    f = lines[0]
    assert f["geometry"]["type"] == "Point" and len(f["geometry"]["coordinates"]) == 2
