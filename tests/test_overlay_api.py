"""Overlay suite G1-G8 (rect/convex fixtures, area-checked) + API facade +
streaming ingest smoke."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gdal_common_python_spark import api
from gdal_common_python_spark.operators.overlay import (
    erase,
    identity,
    symmetric_difference,
    union_layers,
    update,
)


def _mk(spark, rows, id_offset=0):
    return spark.createDataFrame(
        pd.DataFrame(
            [
                dict(
                    zone_id=id_offset + i,
                    rings=[[[x0, y0], [x1, y0], [x1, y1], [x0, y1]]],
                    bbox=dict(xmin=x0, ymin=y0, xmax=x1, ymax=y1),
                )
                for i, (x0, y0, x1, y1) in enumerate(rows)
            ]
        )
    )


class TestOverlays:
    def test_erase(self, spark):
        left = _mk(spark, [(0.0, 0.0, 4.0, 4.0), (10.0, 10.0, 12.0, 12.0)])
        right = _mk(spark, [(1.0, 1.0, 3.0, 3.0)], id_offset=100)
        out = {r.l_id: r.area for r in erase(spark, left, right).collect()}
        assert out[0] == pytest.approx(16.0 - 4.0)
        assert out[1] == pytest.approx(4.0)  # untouched pass-through

    def test_erase_multiple_clips(self, spark):
        left = _mk(spark, [(0.0, 0.0, 4.0, 4.0)])
        right = _mk(spark, [(0.0, 0.0, 1.0, 1.0), (3.0, 3.0, 4.0, 4.0)], id_offset=100)
        out = erase(spark, left, right).collect()
        assert out[0].area == pytest.approx(16.0 - 2.0)

    def test_identity(self, spark):
        left = _mk(spark, [(0.0, 0.0, 4.0, 4.0)])
        right = _mk(spark, [(2.0, 0.0, 6.0, 4.0)], id_offset=100)
        rows = identity(spark, left, right).collect()
        inter = [r for r in rows if r.r_id is not None]
        rest = [r for r in rows if r.r_id is None]
        assert len(inter) == 1 and inter[0].area == pytest.approx(8.0)
        assert len(rest) == 1 and rest[0].area == pytest.approx(8.0)

    def test_symmetric_difference(self, spark):
        left = _mk(spark, [(0.0, 0.0, 4.0, 4.0)])
        right = _mk(spark, [(2.0, 0.0, 6.0, 4.0)], id_offset=100)
        rows = symmetric_difference(spark, left, right).collect()
        total = sum(r.area for r in rows)
        assert total == pytest.approx(8.0 + 8.0)

    def test_union_and_update(self, spark):
        left = _mk(spark, [(0.0, 0.0, 4.0, 4.0)])
        right = _mk(spark, [(2.0, 0.0, 6.0, 4.0)], id_offset=100)
        u = union_layers(left, right)
        assert u.count() == 2  # no splits (lib/analysis.py:192 semantics)
        rows = update(spark, left, right).collect()
        total = sum(r.area for r in rows)
        assert total == pytest.approx(8.0 + 16.0)  # erased base + update layer


class TestApiFacade:
    def test_calculate_vectorized(self, spark):
        df = spark.createDataFrame(pd.DataFrame(dict(a=[1.0, 2.0], b=[10.0, 20.0])))
        out = api.calculate(df, "c", ["a", "b"], lambda a, b: a * b + 1.0)
        assert [r.c for r in out.collect()] == [11.0, 41.0]

    def test_values_and_count(self, spark, zones):
        assert api.count(zones) == 50
        rows = api.values(zones.limit(2), ["zone_id", "category"])
        assert len(rows) == 2 and "category" in rows[0]

    def test_copy_empty_and_extent(self, spark, zones):
        empty = api.copy_datasource_as_empty(spark, zones)
        assert empty.count() == 0 and empty.schema == zones.schema
        ext = api.get_extent(zones).collect()
        assert len(ext) == 50 and ext[0].bbox.xmax >= ext[0].bbox.xmin

    def test_make_valid_normalizes_closed_rings(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame(
                [dict(zone_id=0, rings=[[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]])]
            )
        )
        out = api.make_valid(df).collect()
        assert len(out[0].rings[0]) == 3  # closing vertex dropped

    def test_date_names(self, spark):
        df = spark.createDataFrame(pd.DataFrame(dict(ts=pd.to_datetime(["2024-02-29"]))))
        row = df.select(
            api.day_of_year(F.col("ts")).alias("doy"),
            api.get_month_abbreviation(F.col("ts")).alias("mon"),
            api.is_leap_year(F.year("ts")).alias("leap"),
            api.days_in_month(F.month("ts"), F.year("ts")).alias("dim"),
        ).collect()[0]
        assert (row.doy, row.mon, row.leap, row.dim) == (60, "Feb", True, 29)


class TestStreamingIngest:
    def test_cell_counts_stream(self, spark, sf_dir, tmp_path):
        import os
        import shutil
        import time

        from gdal_common_python_spark.streaming.ingest import run_to_memory

        src = str(tmp_path / "stream_in")
        os.makedirs(src)
        parts = sorted(os.listdir(os.path.join(sf_dir, "documents_spans.parquet")))[:2]
        for p in parts:
            shutil.copy(os.path.join(sf_dir, "documents_spans.parquet", p), src)
        q = run_to_memory(spark, src, query_name="t_cells")
        try:
            deadline = time.time() + 60
            n = 0
            while time.time() < deadline:
                q.processAllAvailable()
                n = spark.sql("SELECT count(*) c FROM t_cells").collect()[0].c
                if n > 0:
                    break
                time.sleep(1)
            assert n > 0
            top = spark.sql("SELECT cell, n_spans FROM t_cells ORDER BY n_spans DESC LIMIT 1").collect()
            assert top[0].n_spans >= 1
        finally:
            q.stop()


def test_buffer_layer_zones(spark, zones):
    from gdal_common_python_spark.kernels import geom
    from gdal_common_python_spark.operators.overlay import buffer_layer

    z = zones.select("zone_id", F.col("rings4326").alias("rings")).limit(8)
    before = {r.zone_id: geom.polygon_area(geom.rings_from_cell(r.rings)) for r in z.collect()}
    out = buffer_layer(z, 0.05, n=16)
    for r in out.collect():
        a = geom.polygon_area(geom.rings_from_cell(r.rings))
        assert a > before[r.zone_id]  # buffer strictly grows every zone
