"""Tile assignment (R2 window snap as a distributed query) — SURVEY §2.6.

``feature_to_raster_window`` (lib/extract.py:134-195) snaps a feature bbox to
a raster grid. Here it is a fully NATIVE Spark plan (whole-stage codegen, no
Python at all): zones x raster grids -> per-pair window
(win_ox, win_oy, res_x, res_y, off_x, off_y), with the reference's exact
arithmetic:

- Python-style float modulo is expressed as ``a - floor(a/b)*b`` (identical
  expression in the DuckDB oracle SQL, so results are bit-equal);
- ``int()`` truncation-toward-zero is ``CAST(double AS LONG)``;
- the negative-pixel-y up-snap quirk (lib/extract.py:162), the psy>0 branch's
  ymin-assignment bug (lib/extract.py:166-168), the strict ``>`` bounds test
  (lib/extract.py:179) and the clamp order are all preserved.

Zones stored in srid 3857 are rectified to the raster's geographic grid with
the closed-form mercator inverse, also native (degrees/atan/exp).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..kernels import proj


def _pymod(a, b):
    return a - F.floor(a / b) * b


def rectified_bbox(zones: DataFrame) -> DataFrame:
    """zone_id + bbox in EPSG:4326.

    The mercator inverse runs in numpy (Arrow batch) rather than native Spark
    expressions: JVM Math.exp/atan differ from C libm by an ulp on some
    inputs, and the snapped window origin is an exact-match output — numpy
    shares libm with the DuckDB oracle, keeping the gate bit-identical."""

    @F.pandas_udf(T.DoubleType())
    def inv_lon(x: pd.Series) -> pd.Series:
        return pd.Series(np.degrees(x.to_numpy() / proj.R_MERC))

    @F.pandas_udf(T.DoubleType())
    def inv_lat(y: pd.Series) -> pd.Series:
        return pd.Series(
            np.degrees(2.0 * np.arctan(np.exp(y.to_numpy() / proj.R_MERC)) - np.pi / 2.0)
        )

    if "bbox4326" in zones.columns:
        return zones.select(
            "zone_id",
            F.col("bbox4326.xmin").alias("xmin"),
            F.col("bbox4326.ymin").alias("ymin"),
            F.col("bbox4326.xmax").alias("xmax"),
            F.col("bbox4326.ymax").alias("ymax"),
        )
    is_merc = F.col("srid") == 3857
    return zones.select(
        "zone_id",
        F.when(is_merc, inv_lon(F.col("bbox.xmin"))).otherwise(F.col("bbox.xmin")).alias("xmin"),
        F.when(is_merc, inv_lat(F.col("bbox.ymin"))).otherwise(F.col("bbox.ymin")).alias("ymin"),
        F.when(is_merc, inv_lon(F.col("bbox.xmax"))).otherwise(F.col("bbox.xmax")).alias("xmax"),
        F.when(is_merc, inv_lat(F.col("bbox.ymax"))).otherwise(F.col("bbox.ymax")).alias("ymax"),
    )


def tile_assign(zones: DataFrame, rasters: DataFrame) -> DataFrame:
    """Window snap for every (zone, raster entry) pair; degenerate windows
    are dropped (the reference returns None for them, lib/extract.py:180,188).

    Output: zone_id, raster_id, band, win_ox, win_oy, res_x, res_y,
    off_x, off_y (+ grid columns for downstream joins).
    """
    z = rectified_bbox(zones)
    pairs = z.crossJoin(F.broadcast(rasters))

    ox, oy = F.col("origin_x"), F.col("origin_y")
    psx, psy = F.col("px_x"), F.col("px_y")
    W, H = F.col("width").cast("long"), F.col("height").cast("long")

    xs = F.when(F.col("xmin") < ox, ox).otherwise(F.col("xmin") - _pymod(F.col("xmin") - ox, psx))
    pairs = pairs.withColumn("xs", xs)
    pairs = pairs.withColumn("off_x", ((F.col("xs") - ox) / psx).cast("long"))

    north = psy < 0
    ym_n = F.when(F.col("ymax") > oy, oy).otherwise(F.col("ymax") - _pymod(oy - F.col("ymax"), psy))
    ym_s = F.when(F.col("ymax") < oy, oy).otherwise(
        F.col("ymin") - _pymod(F.col("ymin") - oy, psy)
    )
    # north: snapped value is the adjusted ymax; south: adjusted ymin
    # (or the origin via the reference's ymin-assignment quirk)
    pairs = pairs.withColumn("ysnap", F.when(north, ym_n).otherwise(ym_s))
    pairs = pairs.withColumn("off_y", ((F.col("ysnap") - oy) / psy).cast("long"))

    res_x = ((F.col("xmax") - F.col("xs")) / psx).cast("long")
    res_y_n = -(((F.col("ysnap") - F.col("ymin")) / psy).cast("long"))
    res_y_s = ((F.col("ymax") - F.col("ysnap")) / psy).cast("long")
    pairs = pairs.withColumn("res_x0", res_x).withColumn(
        "res_y0", F.when(north, res_y_n).otherwise(res_y_s)
    )
    pairs = pairs.withColumn(
        "res_x", F.when(F.col("off_x") + F.col("res_x0") > W, W - F.col("off_x")).otherwise(F.col("res_x0"))
    ).withColumn(
        "res_y", F.when(F.col("off_y") + F.col("res_y0") > H, H - F.col("off_y")).otherwise(F.col("res_y0"))
    )
    valid = (
        (F.col("off_x") <= W)
        & (F.col("off_y") <= H)
        & (F.col("res_x") > 0)
        & (F.col("res_y") > 0)
    )
    return pairs.filter(valid).select(
        "zone_id",
        "raster_id",
        "band",
        "input_rank",
        F.col("xs").alias("win_ox"),
        F.col("ysnap").alias("win_oy"),
        "res_x",
        "res_y",
        "off_x",
        "off_y",
        "origin_x",
        "origin_y",
        "px_x",
        "px_y",
        "width",
        "height",
        "nodata",
    )
