"""edge_intersections: planted crossings + brute-force completeness."""

import pandas as pd

from gdal_common_python_spark.operators import spatial_join as sj

_COLS = ["zone_id", "ex1", "ey1", "ex2", "ey2"]


def _edges(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=_COLS))


def test_planted_cases(spark):
    rows = [
        # zones 1/2: X crossing at (0.5, 0.5)
        (1, 0.0, 0.0, 1.0, 1.0),
        (2, 0.0, 1.0, 1.0, 0.0),
        # zones 3/4: endpoint touch only -> excluded (strict interior)
        (3, 2.0, 0.0, 3.0, 0.0),
        (4, 3.0, 0.0, 3.0, 1.0),
        # zones 5/6: parallel, never cross
        (5, 5.0, 0.0, 6.0, 0.0),
        (6, 5.0, 1.0, 6.0, 1.0),
        # zone 1 vs zone 1 (self) crossings are not reported
        (1, 0.0, 1.0, 1.0, 0.0),
    ]
    out = sj.edge_intersections(spark, _edges(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.zone_a, r.zone_b) == (1, 2)
    assert abs(r.ix - 0.5) < 1e-12 and abs(r.iy - 0.5) < 1e-12


def test_matches_bruteforce_on_synth(spark, sf_dir):
    import os

    edges = spark.read.parquet(os.path.join(sf_dir, "zone_edges.parquet"))
    got = {
        (r.zone_a, r.zone_b, round(r.ix, 9), round(r.iy, 9))
        for r in sj.edge_intersections(spark, edges, res=8).collect()
    }
    e = edges.select("zone_id", "ex1", "ey1", "ex2", "ey2").toPandas()
    exp = set()
    rows = list(e.itertuples(index=False))
    for a in rows:
        for b in rows:
            if not a.zone_id < b.zone_id:
                continue
            rx, ry = a.ex2 - a.ex1, a.ey2 - a.ey1
            sx, sy = b.ex2 - b.ex1, b.ey2 - b.ey1
            den = rx * sy - ry * sx
            if den == 0:
                continue
            qx, qy = b.ex1 - a.ex1, b.ey1 - a.ey1
            t = (qx * sy - qy * sx) / den
            u = (qx * ry - qy * rx) / den
            if 0 < t < 1 and 0 < u < 1:
                exp.add(
                    (a.zone_id, b.zone_id,
                     round(a.ex1 + t * rx, 9), round(a.ey1 + t * ry, 9))
                )
    assert got == exp and got
