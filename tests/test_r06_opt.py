"""Round-6 optimization regression tests.

- nearest_zone_distance: the cell-bucketed (non-broadcast) plan must
  produce byte-identical rows to the broadcast two-pass plan (verdict
  ask #1 — the `weak` component's done-criterion).
- pick_join_resolution: the sampled resolution must not depend on the
  zone table's partition layout (verdict ask #5).
"""

from __future__ import annotations

import pytest

from gdal_common_python_spark import synth
from gdal_common_python_spark.operators import spatial_join as sj
from gdal_common_python_spark.operators.util import release


@pytest.fixture(scope="module")
def sdir():
    return synth.ensure("sf0.01")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_nearest_zone_distance_bucketed_matches_broadcast(spark, sdir):
    docs = spark.read.parquet(f"{sdir}/documents_spans.parquet")
    zones = spark.read.parquet(f"{sdir}/zones.parquet")
    edges = spark.read.parquet(f"{sdir}/zone_edges.parquet")
    bc = sj.nearest_zone_distance(spark, docs, zones, edges, strategy="broadcast")
    bk = sj.nearest_zone_distance(spark, docs, zones, edges, strategy="bucketed")
    rb, rk = _rows(bc), _rows(bk)
    release(bc)
    release(bk)
    assert rb == rk
    assert len(rb) > 0


def test_nearest_zone_distance_auto_is_bucketed_and_equal(spark, sdir):
    docs = spark.read.parquet(f"{sdir}/documents_spans.parquet")
    zones = spark.read.parquet(f"{sdir}/zones.parquet")
    edges = spark.read.parquet(f"{sdir}/zone_edges.parquet")
    # auto picks the bucketed plan (measured faster at every bench scale);
    # its rows must equal the broadcast two-pass reference
    out = sj.nearest_zone_distance(spark, docs, zones, edges, strategy="auto")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "cx" in plan and "cy" in plan  # cell-disk equi-join present
    ref = sj.nearest_zone_distance(spark, docs, zones, edges, strategy="broadcast")
    ro, rr = _rows(out), _rows(ref)
    release(out)
    release(ref)
    assert ro == rr


def test_pick_join_resolution_stable_under_repartition(spark, sdir):
    zones = spark.read.parquet(f"{sdir}/zones.parquet")
    r1 = sj.pick_join_resolution(zones)
    r2 = sj.pick_join_resolution(zones.repartition(7))
    r3 = sj.pick_join_resolution(zones.repartition(3))
    assert r1 == r2 == r3


# ---- batch 2: single-evaluation re-shapes (this round's later commits) ----


def _fmt_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_track_resample_single_scan_single_exchange(spark, sdir):
    """The k-grid explode form: the whole query must read the corpus ONCE
    and shuffle ONCE (the track_id window hash) — the groupBy+join form it
    replaced evaluated the segment pipeline twice and shuffled four times."""
    from gdal_common_python_spark.operators import tracks

    docs = spark.read.parquet(f"{sdir}/documents_spans.parquet")
    pts = sj.geo_points(docs)
    out = tracks.track_resample(pts, n_points=5)
    p = _fmt_plan(out)
    assert p.count("Location: InMemoryFileIndex") == 1, p[:1500]
    shuffles = [ln for ln in p.splitlines() if "+- Exchange" in ln]
    assert len(shuffles) == 1, shuffles


def test_track_resample_midpoint_matches_line_interpolate(spark, sdir):
    """k=2 of n_points=5 targets (total*2) div 4 == (total*1) div 2 — the
    line_interpolate(1,2) target — so the interpolated positions must be
    bit-identical between the two operators."""
    from gdal_common_python_spark.operators import tracks

    docs = spark.read.parquet(f"{sdir}/documents_spans.parquet")
    pts = sj.geo_points(docs)
    mid = {
        r["track_id"]: (r["pos_x"], r["pos_y"])
        for r in tracks.track_resample(pts, n_points=5).filter("k = 2").collect()
    }
    ref = {
        r["track_id"]: (r["pos_x"], r["pos_y"])
        for r in tracks.line_interpolate(pts, 1, 2).collect()
    }
    assert mid == ref and len(ref) > 0


def test_zone_dedup_profile_fingerprint_computed_once(spark, sdir):
    """The duplicate-group size is a count window over ONE fingerprint
    pass; the groupBy+join-back form it replaced evaluated the interpreted
    fingerprint fold on both sides of a self-join."""
    docs = spark.read.parquet(f"{sdir}/documents_spans.parquet")
    zones = spark.read.parquet(f"{sdir}/zones.parquet")
    out = sj.zone_dedup_profile(spark, docs, zones)
    p = _fmt_plan(out)
    # the md5 span fold appears in exactly one plan node
    assert p.count("md5(cast(concat_ws") == 1, p.count("md5(cast(concat_ws")


def test_rewrite_without_posexplode_offsets():
    """posexplode of the filtered span array re-binds dense offsets —
    identical to the transform-lambda rebind it replaced, including
    struck-middle, struck-all and untouched documents."""
    from pyspark.sql import SparkSession

    from gdal_common_python_spark.operators.multimodal import rewrite_without

    spark = SparkSession.getActiveSession()
    span = "kind string, text string, media_ref string, offset int"
    docs = spark.createDataFrame(
        [
            ("d1", [("text", "a", None, 0), ("media", None, "m1", 1), ("text", "b", None, 2)]),
            ("d2", [("text", "only", None, 0)]),
            ("d3", [("text", "gone", None, 0)]),
        ],
        f"doc_id string, spans array<struct<{span}>>",
    )
    strikes = spark.createDataFrame(
        [("d1", 1), ("d3", 0)], "doc_id string, offset int"
    )
    rows = sorted(tuple(r) for r in rewrite_without(docs, strikes).collect())
    assert rows == [
        ("d1", 0, "text", "a", None),
        ("d1", 1, "text", "b", None),
        ("d2", 0, "text", "only", None),
    ]


def test_dwell_points_linear_fold_semantics(spark):
    """The per-track array fold must reproduce the anchor rule exactly:
    first point opens dwell 1; a point beyond radius of the CURRENT
    anchor (not the previous point) opens the next dwell; in-radius
    points extend the current dwell."""
    from gdal_common_python_spark.operators import tracks

    pts = spark.createDataFrame(
        [
            # track A: (0,0) anchor; (3,0) within r=5 of anchor; (7,0) is
            # beyond (0,0) even though only 4 from (3,0) -> new dwell
            ("a", 0, 0.0, 0.0),
            ("a", 1, 3.0, 0.0),
            ("a", 2, 7.0, 0.0),
            ("a", 3, 8.0, 0.0),
            # track B: single point
            ("b", 0, 1.0, 1.0),
        ],
        "doc_id string, offset int, x double, y double",
    )
    rows = sorted(
        tuple(r) for r in tracks.dwell_points(pts, radius=5.0).collect()
    )
    assert rows == [
        ("a", 1, 2, 0.0, 0.0),
        ("a", 2, 2, 7.0, 0.0),
        ("b", 1, 1, 1.0, 1.0),
    ]


def test_dwell_points_single_exchange(spark, sdir):
    from gdal_common_python_spark.operators import tracks

    docs = spark.read.parquet(f"{sdir}/documents_spans.parquet")
    pts = sj.geo_points(docs)
    p = _fmt_plan(tracks.dwell_points(pts, radius=5.0))
    shuffles = [ln for ln in p.splitlines() if "+- Exchange" in ln]
    assert len(shuffles) == 1, shuffles
