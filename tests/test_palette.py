"""rgb2pct median-cut palette — hand-computed split tree + plumbing.

Reference semantics: rgb2pct.py drives GDAL's ComputeMedianCutPCT +
DitherRGB2PCT; the engine's level-synchronous balanced median cut is the
documented deterministic variant (operators/palette.py docstring).
"""

import pytest

from gdal_common_python_spark.operators import palette


def _pixels(spark, weighted):
    rows = []
    for (r, g, b), cnt in weighted:
        rows.extend([(r, g, b)] * cnt)
    return spark.createDataFrame(rows, "r long, g long, b long")


WEIGHTED = [
    ((0, 0, 0), 3),
    ((10, 0, 0), 1),
    ((0, 20, 0), 2),
    ((5, 5, 200), 2),
]


def test_median_cut_levels2_hand_computed(spark):
    # level 0: widest channel is b (range 200), tot=8, ceil(8/2)=4;
    #   cum at b=0 is 6 >= 4 -> med=0 -> (5,5,200) alone goes right (box 1)
    # level 1: box0 widest g (range 20), cum at g=0 is 4 >= 3 -> med=0
    #   -> (0,20,0) right; box1 single color stays together
    pal = {
        r["box"]: r.asDict()
        for r in palette.median_cut_palette(
            _pixels(spark, WEIGHTED), levels=2
        ).collect()
    }
    assert set(pal) == {0, 1, 2}
    # box0 = {(0,0,0)x3, (10,0,0)x1}: pr = round_half_up(10/4) = 3
    assert pal[0] == dict(box=0, pr=3, pg=0, pb=0, n_colors=2, n_pixels=4)
    # box1 = {(0,20,0)x2}
    assert pal[1] == dict(box=1, pr=0, pg=20, pb=0, n_colors=1, n_pixels=2)
    # box2 = left child of level-0 right box = {(5,5,200)x2}
    assert pal[2] == dict(box=2, pr=5, pg=5, pb=200, n_colors=1, n_pixels=2)


def test_median_cut_invariants(spark):
    px = _pixels(spark, WEIGHTED)
    hist = palette.median_cut_boxes(px, levels=3)
    rows = hist.collect()
    # every distinct color appears exactly once, box ids within 0..2^3-1
    assert len(rows) == len(WEIGHTED)
    assert all(0 <= r["box"] < 8 for r in rows)
    total = sum(r["cnt"] for r in rows)
    assert total == sum(c for _, c in WEIGHTED)
    pal = palette.median_cut_palette(px, levels=3).collect()
    assert sum(r["n_pixels"] for r in pal) == total
    assert sum(r["n_colors"] for r in pal) == len(WEIGHTED)


def test_rgb_pixels_nodata_any_drop_and_assignment(spark):
    # one 2x2 tile, three bands on the same grid; nodata=255 in exactly one
    # channel of pixel idx=2 -> that pixel is dropped everywhere
    def tile(rid, band, pixels):
        return (rid, band, 255.0, 0, 0, 2, 2, [float(p) for p in pixels])

    tiles = spark.createDataFrame(
        [
            tile("rr", 1, [0, 10, 0, 5]),
            tile("gg", 1, [0, 255, 20, 5]),
            tile("bb", 1, [0, 0, 0, 200]),
        ],
        "raster_id string, band int, nodata double, tile_x int, tile_y int,"
        " tile_w int, tile_h int, pixels array<double>",
    )
    px = palette.rgb_pixels(tiles, ("rr", 1), ("gg", 1), ("bb", 1))
    got = {r["idx"]: (r["r"], r["g"], r["b"]) for r in px.collect()}
    assert got == {1: (0, 0, 0), 3: (0, 20, 0), 4: (5, 5, 200)}

    pal, assigned = palette.rgb_to_pct(
        tiles, ("rr", 1), ("gg", 1), ("bb", 1), levels=2
    )
    arow = {r["idx"]: r["box"] for r in assigned.collect()}
    assert set(arow) == {1, 3, 4}
    # palette boxes and assignment boxes agree
    assert set(arow.values()) <= {r["box"] for r in pal.collect()}
    # distinct colors -> distinct boxes at levels=2 for these 3 colors
    assert len(set(arow.values())) == 3


def test_pct_to_rgb_round_trip(spark):
    # every expanded pixel carries exactly its box's palette channels
    def tile(rid, band, pixels):
        return (rid, band, 255.0, 0, 0, 2, 2, [float(p) for p in pixels])

    tiles = spark.createDataFrame(
        [
            tile("rr", 1, [0, 10, 0, 5]),
            tile("gg", 1, [0, 0, 20, 5]),
            tile("bb", 1, [0, 0, 0, 200]),
        ],
        "raster_id string, band int, nodata double, tile_x int, tile_y int,"
        " tile_w int, tile_h int, pixels array<double>",
    )
    pal, assigned = palette.rgb_to_pct(tiles, ("rr", 1), ("gg", 1), ("bb", 1), levels=2)
    rgb = palette.pct_to_rgb(assigned, pal).collect()
    pal_by_box = {r["box"]: (r["pr"], r["pg"], r["pb"]) for r in pal.collect()}
    assert len(rgb) == 4
    for row in rgb:
        assert (row["pr"], row["pg"], row["pb"]) == pal_by_box[row["box"]]
    hist = palette.pct_tile_histogram(tiles, ("rr", 1), ("gg", 1), ("bb", 1), levels=2)
    assert sum(r["n"] for r in hist.collect()) == 4


def test_median_cut_empty_input(spark):
    px = _pixels(spark, [])
    assert palette.median_cut_palette(px, levels=2).count() == 0
