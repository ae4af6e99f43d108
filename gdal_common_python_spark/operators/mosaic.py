"""Mosaic / overlay-reduce (R8, lib/gdal_merge.py via lib/mosaic.py:6-40).

Reference semantics (lib/gdal_merge.py:54-106): inputs are copied into the
output IN ORDER, each overwriting what is already there EXCEPT where the
incoming pixel equals nodata (Numeric.choose keeps the destination there) —
i.e. per pixel: the value of the LAST input (by rank) whose pixel != nodata,
else nodata.

Engine: a rank-ordered overlay reduce per tile. For same-grid inputs this is
a single groupBy((tile_x, tile_y)) with the fold done vectorized in numpy on
the stacked pixel arrays — order carried by the explicit ``input_rank``
column (SURVEY §2.6 R8: input order matters).

``mosaic_merge`` is the full gdal_merge surface: mixed-grid inputs are
composed through the R7 nearest resample onto one output grid (the
per-file window-intersection copy of lib/gdal_merge.py:196-234 re-expressed
as resample + overlay), with the option set mirrored from the vendored
script — output extent as the bounding union (:392-402) or an explicit
``ul_lr`` crop (:357-362), ``tap`` target-aligned pixels (:419-423),
``init`` prefill (:468-474), and ``separate`` band stacking (:431-437).
"""

from __future__ import annotations

import math
from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

_SCHEMA = T.StructType(
    [
        T.StructField("tile_x", T.IntegerType()),
        T.StructField("tile_y", T.IntegerType()),
        T.StructField("tile_w", T.IntegerType()),
        T.StructField("tile_h", T.IntegerType()),
        T.StructField("pixels", T.ArrayType(T.DoubleType())),
    ]
)


def mosaic(tiles: DataFrame, raster_ids: list[str] | None = None, band: int = 1) -> DataFrame:
    """Overlay-reduce the given rasters (must share one grid) into one
    mosaic tile table: (tile_x, tile_y, tile_w, tile_h, pixels)."""
    t = tiles.filter(F.col("band") == band)
    if raster_ids is not None:
        t = t.filter(F.col("raster_id").isin(raster_ids))

    grids = t.select("origin_x", "origin_y", "px_x", "px_y").distinct().count()
    if grids != 1:
        raise ValueError("mosaic requires inputs on a shared grid (resample first)")

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("input_rank")
        nodata = float(pdf["nodata"].iloc[0])
        out = None
        for row in pdf.itertuples(index=False):
            px = np.asarray(row.pixels, dtype=np.float64)
            if out is None:
                out = np.full_like(px, nodata)
            out = np.where(px != nodata, px, out)
        first = pdf.iloc[0]
        return pd.DataFrame(
            [
                dict(
                    tile_x=int(first.tile_x),
                    tile_y=int(first.tile_y),
                    tile_w=int(first.tile_w),
                    tile_h=int(first.tile_h),
                    pixels=out.tolist(),
                )
            ]
        )

    from .focal import grouped_tile_apply

    return grouped_tile_apply(
        t.select("tile_x", "tile_y", "tile_w", "tile_h", "input_rank", "nodata", "pixels"),
        lambda k, g: fold(g), _SCHEMA, keys=("tile_x", "tile_y"),
    )


_MERGE_SCHEMA = T.StructType(
    [
        T.StructField("tile_x", T.IntegerType()),
        T.StructField("tile_y", T.IntegerType()),
        T.StructField("tile_w", T.IntegerType()),
        T.StructField("tile_h", T.IntegerType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("pixels", T.ArrayType(T.DoubleType())),
    ]
)


def mosaic_merge(
    spark: SparkSession,
    tiles: DataFrame,
    raster_ids: list[str] | None = None,
    band: int = 1,
    pixel_size: tuple[float, float] | None = None,
    ul_lr: tuple[float, float, float, float] | None = None,
    tap: bool = False,
    init: float | None = None,
    separate: bool = False,
    pct: bool = False,
    tile_size: int = 32,
    plan: str = "auto",
    branch_threshold: int = 16,
) -> DataFrame:
    """gdal_merge-equivalent mosaic supporting DIFFERENT input grids.

    Output grid: first input's pixel size unless ``pixel_size`` is given
    (gdal_merge:407-414); extent = bounding union of inputs (:392-402) or
    the explicit ``ul_lr`` (ulx, uly, lrx, lry) crop (:357-362); ``tap``
    snaps the extent outward to pixel-size multiples (:419-423). Every
    input is R7-nearest-resampled onto that grid (identity copy when the
    grids already align), then rank-overlaid per tile with per-input
    nodata (:81-106). ``init`` prefills uncovered pixels (:468-474);
    ``separate`` emits one output band per input in rank order (:431-437)
    instead of overlaying; ``pct`` copies the FIRST input's color table
    onto every output tile (gdal_merge ``-pct``, lib/mosaic.py:35-36 /
    gdal_merge:448-453 — requires a ``color_table`` column on the tile
    table). Returns (tile_x, tile_y, tile_w, tile_h, band, pixels[,
    color_table]) on the output grid.

    Scale shape: per input only source-overlapping target tiles run the
    resample kernel (clip_to_source); uncovered output tiles are backfilled
    natively (array_repeat) with no Python involved; the overlay fold is
    one groupBy on the output tile key. The probe phase is O(1) jobs for
    any input count (one metas collect + one batched chunking check).

    ``plan`` picks the physical strategy:

    - ``'branch'``: one resample/passthrough branch per input, unioned
      (the original shape) — cheapest for gdal_merge-scale input lists
      (a handful of rasters), where the per-branch analysis cost is
      trivial and same-grid inputs skip the Python kernel entirely;
    - ``'join'``: O(1) plan size for ANY input count — input grid
      parameters become a broadcast metas table cross-joined with the
      natively enumerated output-tile grid, per-(tile, raster) source
      windows are computed columnar-side, ONE equi-join against the
      source tile table on (raster_id, tile_x, tile_y) feeds a single
      grouped kernel that resamples AND rank-folds per output tile —
      one shuffle total, no per-input plan branches, no per-input
      unions. This is the thousands-of-inputs scale path;
    - ``'auto'`` (default): ``'join'`` when the input list exceeds
      ``branch_threshold`` rasters, else ``'branch'``.

    Both plans are value-identical (asserted by tests on fixtures and a
    40-input merge).
    """
    from .resample import resample_nearest

    t = tiles.filter(F.col("band") == band)
    if raster_ids is not None:
        t = t.filter(F.col("raster_id").isin(raster_ids))
    metas = (
        t.select(
            "raster_id", "input_rank", "origin_x", "origin_y",
            "px_x", "px_y", "width", "height", "nodata",
        )
        .distinct()
        .orderBy("input_rank")
        .collect()
    )
    if not metas:
        raise ValueError("mosaic_merge: no input tiles matched")
    px_x, px_y = pixel_size if pixel_size else (float(metas[0].px_x), float(metas[0].px_y))
    if ul_lr is not None:
        ulx, uly, lrx, lry = (float(v) for v in ul_lr)
    else:
        ulx = min(float(m.origin_x) for m in metas)
        uly = max(float(m.origin_y) for m in metas)
        lrx = max(float(m.origin_x) + int(m.width) * float(m.px_x) for m in metas)
        lry = min(float(m.origin_y) + int(m.height) * float(m.px_y) for m in metas)
    if tap:
        # snap outward to pixel-size multiples (gdal_merge:419-423)
        ulx = math.floor(ulx / px_x) * px_x
        lrx = math.ceil(lrx / px_x) * px_x
        apy = abs(px_y)
        uly = math.ceil(uly / apy) * apy
        lry = math.floor(lry / apy) * apy
    # gdal_merge:425-429 rounding (int() truncation after +0.5)
    w = int((lrx - ulx) / px_x + 0.5)
    h = int((lry - uly) / px_y + 0.5)
    if w <= 0 or h <= 0:
        raise ValueError(f"mosaic_merge: empty output extent ({w}x{h})")
    grid = dict(origin_x=ulx, origin_y=uly, px_x=px_x, px_y=px_y, width=w, height=h)
    fill = float(init) if init is not None else float(metas[0].nodata)

    color_table = None
    if pct:
        if "color_table" not in tiles.columns:
            raise ValueError("mosaic_merge: pct=True needs a color_table column on the tile table")
        first_ct = (
            t.filter(F.col("raster_id") == metas[0].raster_id).select("color_table").first()
        )
        if first_ct is None or first_ct["color_table"] is None:
            # gdal_merge -pct errors when the first input has no palette —
            # a silent no-op would also make the output schema data-dependent
            raise ValueError(
                "mosaic_merge: pct=True but the first-ranked input "
                f"({metas[0].raster_id}) has no color table"
            )
        color_table = list(first_ct["color_table"])

    if plan not in ("auto", "branch", "join"):
        raise ValueError(f"mosaic_merge: unknown plan {plan!r}")
    if plan == "auto":
        plan = "join" if len(metas) > branch_threshold else "branch"
    if plan == "join":
        folded = _merge_join_folded(
            spark, t, metas, grid, fill, band, separate, tile_size
        )
        bands = list(range(1, len(metas) + 1)) if separate else [band]
        return _merge_backfill(spark, folded, grid, fill, bands, tile_size, color_table)

    # (branch plan only) grid-matching inputs may still be chunked
    # differently from this function's tile_size (their tile keys would
    # never line up with the resampled/backfill grid). ONE batched
    # aggregation finds every violating input — not a limit(1).count()
    # probe job per raster, which serialized O(inputs) driver round-trips
    # for many-input merges
    grid_ids = [
        m.raster_id
        for m in metas
        if float(m.origin_x) == ulx
        and float(m.origin_y) == uly
        and float(m.px_x) == px_x
        and float(m.px_y) == px_y
        and int(m.width) == w
        and int(m.height) == h
    ]
    bad_chunking: set = set()
    if grid_ids:
        ts_ = F.lit(tile_size)
        bad_chunking = {
            r.raster_id
            for r in (
                t.filter(F.col("raster_id").isin(grid_ids))
                .filter(
                    (F.col("tile_w") != F.least(ts_, F.lit(w) - F.col("tile_x") * ts_))
                    | (F.col("tile_h") != F.least(ts_, F.lit(h) - F.col("tile_y") * ts_))
                )
                .select("raster_id")
                .distinct()
                .collect()
            )
        }

    parts = []
    for i, m in enumerate(metas):
        same_grid = m.raster_id in grid_ids and m.raster_id not in bad_chunking
        if same_grid:
            # already on the output grid: the nearest kernel is an identity
            # copy (center maps to its own pixel) — pass tiles through
            rs = t.filter(F.col("raster_id") == m.raster_id).select(
                "tile_x", "tile_y", "tile_w", "tile_h", "pixels"
            )
        else:
            rs = resample_nearest(
                spark, t, m.raster_id, band, grid, tile_size=tile_size, clip_to_source=True
            )
        rs = rs.withColumn("input_rank", F.lit(int(m.input_rank))).withColumn(
            "nodata_in", F.lit(float(m.nodata))
        )
        if separate:
            rs = rs.withColumn("band", F.lit(i + 1))
        parts.append(rs)
    allr = reduce(lambda a, b: a.unionByName(b), parts)

    if separate:
        # nodata-for-fill substitution per band, then backfill missing tiles
        def sub(pdf: pd.DataFrame) -> pd.DataFrame:
            rows = []
            for row in pdf.itertuples(index=False):
                px = np.asarray(row.pixels, dtype=np.float64)
                px = np.where(px != row.nodata_in, px, fill)
                rows.append(
                    dict(
                        tile_x=int(row.tile_x), tile_y=int(row.tile_y),
                        tile_w=int(row.tile_w), tile_h=int(row.tile_h),
                        band=int(row.band), pixels=px.tolist(),
                    )
                )
            return pd.DataFrame(rows, columns=[f.name for f in _MERGE_SCHEMA.fields])

        from .focal import grouped_tile_apply

        folded = grouped_tile_apply(
            allr, lambda k, g: sub(g), _MERGE_SCHEMA, keys=("tile_x", "tile_y", "band")
        )
        bands = list(range(1, len(metas) + 1))
    else:

        def fold(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("input_rank")
            first = pdf.iloc[0]
            out = np.full(int(first.tile_w) * int(first.tile_h), fill)
            for row in pdf.itertuples(index=False):
                px = np.asarray(row.pixels, dtype=np.float64)
                out = np.where(px != row.nodata_in, px, out)
            return pd.DataFrame(
                [
                    dict(
                        tile_x=int(first.tile_x), tile_y=int(first.tile_y),
                        tile_w=int(first.tile_w), tile_h=int(first.tile_h),
                        band=band, pixels=out.tolist(),
                    )
                ]
            )

        from .focal import grouped_tile_apply

        folded = grouped_tile_apply(
            allr, lambda k, g: fold(g), _MERGE_SCHEMA, keys=("tile_x", "tile_y")
        )
        bands = [band]

    return _merge_backfill(spark, folded, grid, fill, bands, tile_size, color_table)


def _merge_backfill(
    spark: SparkSession,
    folded: DataFrame,
    grid: dict,
    fill: float,
    bands: list[int],
    tile_size: int,
    color_table: list | None,
) -> DataFrame:
    """Native backfill of output tiles no input covered (+ -pct palette)."""
    w, h = int(grid["width"]), int(grid["height"])
    ntx = (w + tile_size - 1) // tile_size
    nty = (h + tile_size - 1) // tile_size
    full = (
        spark.range(ntx).select(F.col("id").cast("int").alias("tile_x"))
        .crossJoin(spark.range(nty).select(F.col("id").cast("int").alias("tile_y")))
        .crossJoin(spark.createDataFrame([(b,) for b in bands], "band int"))
        .withColumn("tile_w", F.least(F.lit(tile_size), F.lit(w) - F.col("tile_x") * tile_size).cast("int"))
        .withColumn("tile_h", F.least(F.lit(tile_size), F.lit(h) - F.col("tile_y") * tile_size).cast("int"))
    )
    out = full.join(folded.withColumnRenamed("pixels", "__px"), ["tile_x", "tile_y", "tile_w", "tile_h", "band"], "left").select(
        "tile_x", "tile_y", "tile_w", "tile_h", "band",
        F.coalesce(
            F.col("__px"),
            F.array_repeat(F.lit(fill), (F.col("tile_w") * F.col("tile_h")).cast("int")),
        ).alias("pixels"),
    )
    if color_table is not None:
        # first-input-wins palette copy (-pct): raster-level metadata rides
        # every output tile as a constant column
        out = out.withColumn("color_table", F.lit(color_table))
    return out


def _merge_join_folded(
    spark: SparkSession,
    t: DataFrame,
    metas: list,
    grid: dict,
    fill: float,
    band: int,
    separate: bool,
    tile_size: int,
) -> DataFrame:
    """O(1)-plan-size merge core: resample + rank-fold in ONE grouped kernel.

    The per-input resample branches of the branch plan are replaced by a
    broadcast metas table: output tiles are enumerated natively, cross-
    joined with the (tiny) metas table, each (output tile, raster) pair's
    source-tile window is computed columnar-side from the per-raster grid
    columns, non-overlapping pairs are dropped (the clip_to_source
    equivalent), and a single equi-join on (raster_id, tile_x, tile_y)
    pulls the source pixels. One groupBy on the output tile key then
    resamples each raster's patch (R1 trunc rule — identical math to
    operators.resample) and folds by input_rank with per-raster nodata
    masking — plan size and job count are independent of input count.
    """
    from .resample import source_tile_window

    ulx, uly = float(grid["origin_x"]), float(grid["origin_y"])
    px_x, px_y = float(grid["px_x"]), float(grid["px_y"])
    w, h = int(grid["width"]), int(grid["height"])

    mdf = spark.createDataFrame(
        [
            (
                m.raster_id, int(m.input_rank), bix + 1, float(m.origin_x),
                float(m.origin_y), float(m.px_x), float(m.px_y),
                int(m.width), int(m.height), float(m.nodata),
            )
            for bix, m in enumerate(metas)
        ],
        "raster_id string, input_rank int, band_ix int, s_ox double, s_oy double, "
        "s_px double, s_py double, s_w int, s_h int, nodata_in double",
    )

    ntx = (w + tile_size - 1) // tile_size
    nty = (h + tile_size - 1) // tile_size
    tgrid = (
        spark.range(ntx).select(F.col("id").cast("int").alias("t_tx"))
        .crossJoin(spark.range(nty).select(F.col("id").cast("int").alias("t_ty")))
        .crossJoin(F.broadcast(mdf))
    )
    # per-raster source tile windows from the SHARED arithmetic (meta
    # columns in place of resample's per-call literals); non-overlap pairs
    # drop out (the clip_to_source equivalent)
    tgrid = (
        source_tile_window(
            tgrid, ulx, uly, px_x, px_y, w, h,
            F.col("s_ox"), F.col("s_oy"), F.col("s_px"), F.col("s_py"),
            F.col("s_w"), F.col("s_h"), tile_size,
        )
        .filter((F.col("stx0") <= F.col("stx1")) & (F.col("sty0") <= F.col("sty1")))
        .withColumn("stx", F.explode(F.sequence("stx0", "stx1")))
        .withColumn("sty", F.explode(F.sequence("sty0", "sty1")))
    )
    cand = tgrid.join(
        t.select(
            "raster_id",
            F.col("tile_x").alias("stx"),
            F.col("tile_y").alias("sty"),
            "tile_w",
            "tile_h",
            "pixels",
        ),
        ["raster_id", "stx", "sty"],
        "left",
    ).select(
        "t_tx", "t_ty", "raster_id", "input_rank", "band_ix", "s_ox", "s_oy",
        "s_px", "s_py", "s_w", "s_h", "nodata_in", "stx", "sty", "tile_w",
        "tile_h", "pixels",
    )

    def _sample_one(g: pd.DataFrame, cx: np.ndarray, cy: np.ndarray) -> tuple[np.ndarray, float]:
        """Nearest-resample one raster's joined tiles at the output pixel
        centers (R1 trunc rule) -> (patch, nodata_in)."""
        m = g.iloc[0]
        s_px_, s_py_ = float(m.s_px), float(m.s_py)
        s_w_, s_h_ = int(m.s_w), int(m.s_h)
        nod = float(m.nodata_in)
        sx = np.trunc((cx - float(m.s_ox)) / s_px_).astype(np.int64)
        sy = np.trunc((cy - float(m.s_oy)) / s_py_).astype(np.int64)
        acc = np.full((len(cy), len(cx)), nod)
        for row in g.itertuples(index=False):
            if row.pixels is None:
                continue
            gx0 = int(row.stx) * tile_size
            gy0 = int(row.sty) * tile_size
            patch = np.asarray(row.pixels, dtype=np.float64).reshape(
                int(row.tile_h), int(row.tile_w)
            )
            in_x = (sx >= gx0) & (sx < gx0 + int(row.tile_w))
            in_y = (sy >= gy0) & (sy < gy0 + int(row.tile_h))
            if not in_x.any() or not in_y.any():
                continue
            xi = np.where(in_x)[0]
            yi = np.where(in_y)[0]
            acc[np.ix_(yi, xi)] = patch[np.ix_(sy[yi] - gy0, sx[xi] - gx0)]
        oob_x = (sx < 0) | (sx >= s_w_)
        oob_y = (sy < 0) | (sy >= s_h_)
        acc[:, oob_x] = nod
        acc[oob_y, :] = nod
        return acc, nod

    def fold_kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        t_tx, t_ty = int(key[0]), int(key[1])
        tw = min(tile_size, w - t_tx * tile_size)
        th = min(tile_size, h - t_ty * tile_size)
        cx = ulx + (t_tx * tile_size + np.arange(tw) + 0.5) * px_x
        cy = uly + (t_ty * tile_size + np.arange(th) + 0.5) * px_y
        rows = []
        out = np.full((th, tw), fill)
        for (_, _rid), g in sorted(
            pdf.groupby(["input_rank", "raster_id"], sort=False),
            key=lambda kv: kv[0][0],
        ):
            acc, nod = _sample_one(g, cx, cy)
            if separate:
                rows.append(
                    dict(
                        tile_x=t_tx, tile_y=t_ty, tile_w=tw, tile_h=th,
                        band=int(g.iloc[0].band_ix),
                        pixels=np.where(acc != nod, acc, fill).ravel().tolist(),
                    )
                )
            else:
                out = np.where(acc != nod, acc, out)
        if not separate:
            rows.append(
                dict(tile_x=t_tx, tile_y=t_ty, tile_w=tw, tile_h=th, band=band,
                     pixels=out.ravel().tolist())
            )
        return pd.DataFrame(rows, columns=[f.name for f in _MERGE_SCHEMA.fields])

    from .focal import grouped_tile_apply

    return grouped_tile_apply(cand, fold_kernel, _MERGE_SCHEMA, keys=("t_tx", "t_ty"))
