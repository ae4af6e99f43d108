"""Layer-vs-layer geometric overlays (G1-G8, lib/analysis.py) — SURVEY §2.5.

Reference: OGR layer-algebra methods (Clip/Erase/Identity/Intersection/
SymDifference/Union/Update) after auto-rectify. Engine: the J2 candidate
machinery (cell equi-join) finds intersecting pairs, then a pairwise clip
kernel computes the geometry. Kernel scope (documented): the clip side must
be CONVEX per ring (Sutherland-Hodgman) — exact for the fixture classes
(rects, convex hulls); concave clips raise. Parity checks operate on
id-pairs, areas and counts, not overlay vertices (SURVEY §2.5 parity note).

Buffer (G1, lib/analysis.py:8-51): points -> regular n-gon; convex rings ->
outward edge offset with round joins (approximate arc with n segments).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..kernels import geom

_RINGS_T = T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType())))


def _pair_candidates(spark: SparkSession, left: DataFrame, right: DataFrame) -> DataFrame:
    """bbox-overlap candidate pairs of two zone-shaped tables (native)."""
    l = left.select(
        F.col("zone_id").alias("l_id"),
        F.col("rings").alias("l_rings"),
        F.col("bbox").alias("l_bbox"),
    )
    r = right.select(
        F.col("zone_id").alias("r_id"),
        F.col("rings").alias("r_rings"),
        F.col("bbox").alias("r_bbox"),
    )
    cond = (
        (F.col("l_bbox.xmin") <= F.col("r_bbox.xmax"))
        & (F.col("r_bbox.xmin") <= F.col("l_bbox.xmax"))
        & (F.col("l_bbox.ymin") <= F.col("r_bbox.ymax"))
        & (F.col("r_bbox.ymin") <= F.col("l_bbox.ymax"))
    )
    return l.join(F.broadcast(r), cond)


def intersect_pairs(spark: SparkSession, left: DataFrame, right: DataFrame) -> DataFrame:
    """(l_id, r_id) pairs that truly intersect — the id-level G5 surface
    (and the input to single-part dissolve at scale)."""
    cand = _pair_candidates(spark, left, right)

    @F.pandas_udf(T.BooleanType())
    def hit(l_rings: pd.Series, r_rings: pd.Series) -> pd.Series:
        out = np.zeros(len(l_rings), dtype=bool)
        for i, (lr, rr) in enumerate(zip(l_rings, r_rings)):
            out[i] = geom.polygon_intersects(geom.rings_from_cell(lr), geom.rings_from_cell(rr))
        return pd.Series(out)

    return cand.withColumn("hit", hit("l_rings", "r_rings")).filter("hit").select("l_id", "r_id")


def _clip_rings(subject: list[np.ndarray], clip: list[np.ndarray]) -> list[np.ndarray]:
    """Intersection geometry: every subject ring clipped by every convex
    outer clip ring. Holes in the clip side are unsupported (raise)."""
    out = []
    for c in clip:
        if geom.signed_area(c) < 0:
            raise NotImplementedError("concave/hole clip rings unsupported")
        for s in subject:
            res = geom.clip_convex(s, c)
            if res is not None and abs(geom.signed_area(res)) > 0:
                out.append(res)
    return out


def clip(spark: SparkSession, left: DataFrame, right: DataFrame) -> DataFrame:
    """G2 (lib/analysis.py:54-76): left geometries clipped to right; left
    attrs kept. Output: l_id, r_id, rings, area."""
    cand = _pair_candidates(spark, left, right)

    schema = T.StructType(
        [
            T.StructField("l_id", T.LongType()),
            T.StructField("r_id", T.LongType()),
            T.StructField("rings", _RINGS_T),
            T.StructField("area", T.DoubleType()),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                subj = geom.rings_from_cell(row.l_rings)
                clp = geom.rings_from_cell(row.r_rings)
                pieces = _clip_rings(subj, clp)
                if pieces:
                    rows.append(
                        dict(
                            l_id=int(row.l_id),
                            r_id=int(row.r_id),
                            rings=[p.tolist() for p in pieces],
                            area=float(sum(geom.signed_area(p) for p in pieces)),
                        )
                    )
            yield pd.DataFrame(rows, columns=["l_id", "r_id", "rings", "area"])

    # mapInPandas: no extra shuffle — the clip kernel runs where the
    # candidate pairs already live
    return cand.mapInPandas(kernel, schema)


def intersection(spark: SparkSession, left: DataFrame, right: DataFrame) -> DataFrame:
    """G5 (lib/analysis.py:134-160): same geometry as clip, both attr ids."""
    return clip(spark, left, right)


def buffer_points(points: DataFrame, dist: float, n: int = 32) -> DataFrame:
    """G1 for point layers: point_id + buffered ring polygon."""

    @F.pandas_udf(_RINGS_T)
    def buf(x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series(
            [[geom.buffer_point(float(xi), float(yi), dist, n).tolist()] for xi, yi in zip(x, y)]
        )

    return points.withColumn("rings", buf("x", "y"))
