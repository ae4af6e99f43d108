"""Vector reprojection operator (V1/V2, lib/reproject.py:9-48,
lib/_rectifyinputs.py:7-56) — SURVEY §2.7.

V1: transform every ring coordinate between the four supported EPSG systems
(closed-form numpy kernels, Arrow-batched). V2 ("rectify") is an analysis-
time rule: binary spatial ops reproject the smaller side when srids differ —
no temp files, just a lazy column rewrite.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..kernels import geom, proj

_RINGS_T = T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType())))
_BBOX_T = T.StructType(
    [
        T.StructField("xmin", T.DoubleType()),
        T.StructField("ymin", T.DoubleType()),
        T.StructField("xmax", T.DoubleType()),
        T.StructField("ymax", T.DoubleType()),
    ]
)


def reproject(df: DataFrame, to_srid: int) -> DataFrame:
    """Transform `rings` (+ recompute bbox) from each row's `srid` to
    `to_srid`; attrs pass through untouched (lib/reproject.py:38-39)."""

    @F.pandas_udf(_RINGS_T)
    def tx(rings: pd.Series, srid: pd.Series) -> pd.Series:
        out = []
        for rr, s in zip(rings, srid):
            rs = proj.transform_rings(geom.rings_from_cell(rr), int(s), to_srid)
            out.append([r.tolist() for r in rs])
        return pd.Series(out)

    @F.pandas_udf(_BBOX_T)
    def bb(rings: pd.Series) -> pd.DataFrame:
        rows = []
        for rr in rings:
            xmin, ymin, xmax, ymax = geom.rings_bbox(geom.rings_from_cell(rr))
            rows.append(dict(xmin=xmin, ymin=ymin, xmax=xmax, ymax=ymax))
        return pd.DataFrame(rows)

    out = df.withColumn("rings", tx("rings", "srid")).withColumn("srid", F.lit(to_srid))
    if "bbox" in df.columns:
        out = out.withColumn("bbox", bb("rings"))
    return out


def rectify(left: DataFrame, right: DataFrame, left_srid_col: str = "srid"):
    """V2 rule: if srids differ anywhere, reproject the RIGHT (join) side to
    the left's srid — the reference reprojects the method/join datasource
    (lib/_rectifyinputs.py:22-28). Returns (left, right, common_srid)."""
    l_srids = {r[0] for r in left.select(left_srid_col).distinct().collect()}
    r_srids = {r[0] for r in right.select("srid").distinct().collect()}
    if len(l_srids) == 1 and l_srids == r_srids:
        return left, right, next(iter(l_srids))
    target = next(iter(l_srids)) if len(l_srids) == 1 else 4326
    return (
        left if l_srids == {target} else reproject(left, target),
        right if r_srids == {target} else reproject(right, target),
        target,
    )
