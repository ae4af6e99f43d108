"""CSV + WKT source: round trip into the engine's rings/point shapes."""

import os

import pytest

from gdal_common_python_spark.sources.csv_wkt import read_csv_wkt


@pytest.fixture(scope="module")
def csv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("csvwkt")
    poly = d / "zones.csv"
    poly.write_text(
        'zone_id,name,wkt\n'
        '1,alpha,"POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))"\n'
        '2,beta,"MULTIPOLYGON(((10 10, 12 10, 12 12, 10 12, 10 10)),'
        '((20 20, 21 20, 21 21, 20 21, 20 20)))"\n'
    )
    pts = d / "pts.csv"
    pts.write_text(
        'pid,wkt\n'
        '7,"POINT(1.5 -2.25)"\n'
        '8,"POINT( 3 4 )"\n'
    )
    return str(d)


def test_polygon_rings_and_bbox(spark, csv_dir):
    out = {r.zone_id: r for r in read_csv_wkt(
        spark, os.path.join(csv_dir, "zones.csv")).collect()}
    assert list(out[1].rings[0][0]) == [0.0, 0.0]
    assert len(out[1].rings) == 1 and len(out[1].rings[0]) == 5
    # multipolygon parts flatten into one ring list (even-odd semantics)
    assert len(out[2].rings) == 2
    assert out[2].bbox.xmin == 10.0 and out[2].bbox.xmax == 21.0
    assert out[1].name == "alpha"  # attributes survive


def test_point_scan_pure_codegen(spark, csv_dir):
    df = read_csv_wkt(spark, os.path.join(csv_dir, "pts.csv"), geometry_type="point")
    rows = {r.pid: (r.x, r.y) for r in df.collect()}
    assert rows == {7: (1.5, -2.25), 8: (3.0, 4.0)}
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # point parse never leaves the JVM


def test_feeds_spatial_operators(spark, csv_dir):
    """The parsed layer drives a real operator (centroid) unmodified."""
    from gdal_common_python_spark.api import get_extent

    zones = read_csv_wkt(spark, os.path.join(csv_dir, "zones.csv")).drop("bbox")
    env = {r.zone_id: r.bbox for r in get_extent(zones).collect()}
    assert env[1].xmin == 0.0 and env[1].xmax == 4.0


def test_bad_wkt_skip_or_raise(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text('id,wkt\n1,"POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))"\n2,"LINESTRING(0 0, 1 1)"\n')
    ok = read_csv_wkt(spark, str(p), on_error="skip").collect()
    assert [r.id for r in ok] == [1]
    with pytest.raises(Exception):
        read_csv_wkt(spark, str(p)).collect()
