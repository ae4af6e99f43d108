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
