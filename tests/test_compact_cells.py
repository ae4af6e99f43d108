"""compact_cells / cover_bbox_cells / layer_info unit properties.

compact_cells is the H3 `compact` analog on the quadtree scheme
(kernels/cells.py bit layout): complete 4-sibling groups promote to their
parent level-by-level; the covering's area is invariant.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_common_python_spark.kernels import cells as cellk
from gdal_common_python_spark.operators import layout


def _cells_df(spark, ids):
    return spark.createDataFrame([(int(c),) for c in ids], "cell long")


def _children(cell):
    res, ix, iy = cellk.decode(np.int64(cell))
    r, ix, iy = int(res) + 1, int(ix) * 2, int(iy) * 2
    return [int(cellk.pack(r, ix + dx, iy + dy)) for dx in (0, 1) for dy in (0, 1)]


def test_complete_quad_promotes_transitively(spark):
    # all 16 grandchildren of one res-5 cell -> exactly that res-5 cell
    top = int(cellk.pack(5, 3, 7))
    grand = [g for c in _children(top) for g in _children(c)]
    out = layout.compact_cells(_cells_df(spark, grand), from_res=7, to_res=5)
    assert [r.cell for r in out.collect()] == [top]


def test_incomplete_group_kept(spark):
    top = int(cellk.pack(8, 10, 11))
    kids = _children(top)[:3]  # one sibling missing
    out = layout.compact_cells(_cells_df(spark, kids), from_res=9, to_res=8)
    assert sorted(r.cell for r in out.collect()) == sorted(kids)


def test_redundant_parent_absorbed(spark):
    # parent already present alongside its 4 children: children still
    # promote; distinct() absorbs the duplicate (idempotent on redundant
    # coverings)
    top = int(cellk.pack(6, 1, 2))
    out = layout.compact_cells(
        _cells_df(spark, [top] + _children(top)), from_res=7, to_res=6
    )
    assert [r.cell for r in out.collect()] == [top]


def test_area_invariant_on_random_covering(spark):
    # random res-8 covering: compaction preserves the covered leaf set
    rng = np.random.default_rng(7)
    ids = sorted(
        {int(cellk.pack(8, int(x), int(y)))
         for x, y in zip(rng.integers(0, 64, 300), rng.integers(0, 64, 300))}
    )
    out = layout.compact_cells(_cells_df(spark, ids), from_res=8, to_res=4)
    leaves = set()
    for r in out.collect():
        res, ix, iy = cellk.decode(np.int64(r.cell))
        s = 8 - int(res)
        for dx in range(1 << s):
            for dy in range(1 << s):
                leaves.add(int(cellk.pack(8, (int(ix) << s) + dx, (int(iy) << s) + dy)))
    assert leaves == set(ids)
    assert out.count() <= len(ids)


def test_uncompact_round_trip(spark):
    rng = np.random.default_rng(3)
    ids = sorted(
        {int(cellk.pack(7, int(x), int(y)))
         for x, y in zip(rng.integers(0, 32, 200), rng.integers(0, 32, 200))}
    )
    comp = layout.compact_cells(_cells_df(spark, ids), from_res=7, to_res=3)
    back = layout.uncompact_cells(comp, res=7)
    assert sorted(r.cell for r in back.collect()) == ids


def test_uncompact_passthrough_at_res(spark):
    ids = [int(cellk.pack(6, 5, 9)), int(cellk.pack(6, 5, 10))]
    out = layout.uncompact_cells(_cells_df(spark, ids), res=6)
    assert sorted(r.cell for r in out.collect()) == sorted(ids)


def test_cover_bbox_cells_matches_kernel(spark):
    rng = np.random.default_rng(11)
    rows = []
    for _ in range(20):
        x0, y0 = rng.uniform(-179, 178), rng.uniform(-89, 88)
        rows.append((float(x0), float(y0), float(x0 + rng.uniform(0, 2)),
                     float(y0 + rng.uniform(0, 2))))
    df = spark.createDataFrame(rows, "xmin double, ymin double, xmax double, ymax double")
    got = layout.cover_bbox_cells(df, res=9).select("cell").collect()
    want = []
    for x0, y0, x1, y1 in rows:
        want.extend(int(c) for c in cellk.cover_bbox(x0, y0, x1, y1, 9))
    assert sorted(r.cell for r in got) == sorted(want)


def test_layer_info_counts(spark):
    from gdal_common_python_spark import api

    tri = [[0.0, 0.0], [4.0, 0.0], [0.0, 4.0]]
    hole = [[1.0, 1.0], [2.0, 1.0], [1.0, 2.0]]
    sq = [[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]]
    df = spark.createDataFrame(
        [(1, [tri, hole]), (2, [sq])],
        "zone_id long, rings array<array<array<double>>>",
    )
    row = api.layer_info(df).collect()[0]
    assert (row.n_features, row.n_rings, row.n_vertices) == (2, 3, 10)
    assert (row.xmin, row.ymin, row.xmax, row.ymax) == (-1.0, -1.0, 4.0, 4.0)


from hypothesis import given, settings, strategies as st


@settings(max_examples=10, deadline=None)
@given(
    ixs=st.lists(st.integers(0, 31), min_size=1, max_size=60),
    iys=st.lists(st.integers(0, 31), min_size=1, max_size=60),
)
def test_compact_idempotent_and_round_trip(spark, ixs, iys):
    # arbitrary res-7 covering: compact is idempotent and uncompact inverts
    ids = sorted({int(cellk.pack(7, x, y)) for x, y in zip(ixs, iys)})
    comp = layout.compact_cells(_cells_df(spark, ids), from_res=7, to_res=4)
    rows = sorted(r.cell for r in comp.collect())
    again = layout.compact_cells(_cells_df(spark, rows), from_res=7, to_res=4)
    assert sorted(r.cell for r in again.collect()) == rows
    back = layout.uncompact_cells(comp, res=7)
    assert sorted(r.cell for r in back.collect()) == ids
