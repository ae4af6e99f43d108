"""Distributed convex hull (OGR ConvexHull analog for point layers).

The textbook two-level reduction: hull(S) = hull(union of per-partition
hulls), because every global extreme point is extreme in its own
partition. Stage 1 runs Andrew's monotone chain per partition
(mapInPandas, numpy — output ∝ hull size, typically O(log n) points for
random data); stage 2 coalesces the tiny local-hull union into one task
and chains again. No driver collect; the only movement is the local hulls.

Strictly-convex contract: collinear boundary points are NOT hull vertices
(the chain pops on cross <= 0). The oracle declares a directed edge (a, b)
a hull edge iff every other point is STRICTLY left — identical sign
decisions on identical IEEE cross products, so the vertex sets agree
bit-for-bit whenever no three input points are exactly collinear (true for
continuous random layers; exact-collinear inputs are a documented
divergence class, pinned engine-side in pytest).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

_PT_T = T.StructType(
    [T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType())]
)


def monotone_chain(pts: np.ndarray) -> np.ndarray:
    """Strictly-convex hull (CCW) of an (n, 2) float64 array."""
    if len(pts) <= 2:
        return np.unique(pts, axis=0)
    p = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(seq):
        st: list[np.ndarray] = []
        for q in seq:
            while (
                len(st) >= 2
                and (st[-1][0] - st[-2][0]) * (q[1] - st[-2][1])
                - (st[-1][1] - st[-2][1]) * (q[0] - st[-2][0])
                <= 0.0
            ):
                st.pop()
            st.append(q)
        return st

    lower, upper = half(p), half(p[::-1])
    return np.array(lower[:-1] + upper[:-1])


def convex_hull(points: DataFrame, x: str = "x", y: str = "y") -> DataFrame:
    """Hull VERTEX SET of the whole layer -> (x, y) rows (orientation-free
    set output; ring ordering is a driver-side sort away when a consumer
    wants a polygon)."""
    pts = points.select(F.col(x).cast("double").alias("x"), F.col(y).cast("double").alias("y"))

    def local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            h = monotone_chain(pdf[["x", "y"]].to_numpy(dtype=np.float64))
            yield pd.DataFrame(h, columns=["x", "y"])

    local_hulls = pts.mapInPandas(local, schema=_PT_T)
    # the union of local hulls is tiny (O(partitions * hull size)); one
    # final chain in a single task, still collect-free
    return local_hulls.coalesce(1).mapInPandas(local, schema=_PT_T)


def convex_hull_oracle_sql(points_rel: str, x: str = "x", y: str = "y") -> str:
    """O(n^2)-edges x O(n) strict-side test — fine at oracle scale."""
    return f"""
WITH p AS (SELECT {x} AS x, {y} AS y FROM {points_rel}),
e AS (
  SELECT a.x AS ax, a.y AS ay, b.x AS bx, b.y AS by
  FROM p a JOIN p b ON NOT (a.x = b.x AND a.y = b.y)
  WHERE NOT EXISTS (
    SELECT 1 FROM p c
    WHERE NOT (c.x = a.x AND c.y = a.y) AND NOT (c.x = b.x AND c.y = b.y)
      AND (b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x) <= 0.0
  )
)
SELECT DISTINCT x, y FROM (
  SELECT ax AS x, ay AS y FROM e UNION ALL SELECT bx, by FROM e
)
"""
