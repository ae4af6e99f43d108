"""Distance joins: near table (J3) and kNN — SURVEY §2.3.

Reference ``near_table`` (lib/analysis.py:241-322) is an O(n*m) all-pairs
``geom.Distance`` double loop with an optional pre-filter callback
(lib/analysis.py:284-296) and dict rows {FROM_ID, TO_ID, DISTANCE}.

Engine:
- ``near_table``: declarative pair join. With a ``radius`` it is a
  cell-partitioned band join (explode the query side by the covering cell
  disk sized to the radius, equi-join on cell, exact distance refine) — at
  scale this prunes to O(pairs-in-range) instead of O(n*m). Without a radius
  it degrades to the reference's full cross join (exact parity mode).
- ``knn``: cell-ring expansion with exact re-rank (SURVEY §7 hard-part 5):
  round 1 joins each query point to candidates in its 3x3 cell disk and
  keeps points whose k-th candidate distance is provably final (<= the
  distance to the disk boundary); the remainder — typically a tiny fraction —
  falls back to a cross join. Ties break on (distance, to_id) so results are
  deterministic and match the DuckDB oracle's ORDER BY.

The pre-filter callback becomes a plain ``df.filter`` on either side
(SURVEY §2.9), pushed below the join by Catalyst.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F, types as T

from .spatial_join import cell_expr
from .util import track_persisted


def _dist(x1, y1, x2, y2):
    return F.sqrt((x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2))


def near_table(
    points: DataFrame,
    near: DataFrame | None = None,
    radius: float | None = None,
    res: int = 7,
    allow_cross: bool = False,
) -> DataFrame:
    """(from_id, to_id, distance) pairs; planar distance in native units
    (lib/analysis.py:315 semantics). Self-join when `near` is None; the
    (i, i) self-pair is excluded for self-joins.

    ``radius=None`` is the reference-parity O(n*m) cross join — it requires
    an explicit ``allow_cross=True`` so the nested-loop plan can never be
    reached by accident; at scale always pass a radius."""
    if radius is None and not allow_cross:
        raise ValueError(
            "near_table(radius=None) is the O(n*m) reference-parity cross "
            "join; pass a radius for the pruned cell-band join, or opt in "
            "explicitly with allow_cross=True"
        )
    self_join = near is None
    a = points.select(
        F.col("point_id").alias("from_id"), F.col("x").alias("ax"), F.col("y").alias("ay")
    )
    b = (near if near is not None else points).select(
        F.col("point_id").alias("to_id"), F.col("x").alias("bx"), F.col("y").alias("by")
    )
    if radius is None:
        pairs = a.crossJoin(b)
    else:
        n = 1 << res
        w, h = 360.0 / n, 180.0 / n
        kx, ky = int(radius / w) + 1, int(radius / h) + 1
        dx = F.explode(F.sequence(F.lit(-kx), F.lit(kx))).alias("dx")
        ac = a.withColumn("cx", F.floor((F.col("ax") + 180.0) / w)).withColumn(
            "cy", F.floor((F.col("ay") + 90.0) / h)
        )
        ac = ac.select("*", dx)
        ac = ac.select("*", F.explode(F.sequence(F.lit(-ky), F.lit(ky))).alias("dy"))
        ac = ac.withColumn("jx", F.col("cx") + F.col("dx")).withColumn("jy", F.col("cy") + F.col("dy"))
        bc = b.withColumn("jx", F.floor((F.col("bx") + 180.0) / w)).withColumn(
            "jy", F.floor((F.col("by") + 90.0) / h)
        )
        pairs = ac.join(bc, ["jx", "jy"])
    out = pairs.withColumn("distance", _dist(F.col("ax"), F.col("ay"), F.col("bx"), F.col("by")))
    if radius is not None:
        out = out.filter(F.col("distance") <= F.lit(radius))
    if self_join:
        out = out.filter(F.col("from_id") != F.col("to_id"))
    return out.select("from_id", "to_id", "distance")


def near_table_geoms(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame | None = None,
    radius: float | None = None,
    allow_cross: bool = False,
) -> DataFrame:
    """near_table for POLYGON layers (zone-shaped tables) — the reference's
    geom.Distance semantics (lib/analysis.py:315: 0 when intersecting, else
    min boundary distance), computed by the exact kernel on candidate
    pairs.

    With a ``radius``: the pair source is the shared size-gated candidate
    machinery (``overlay._pair_candidates`` with ``pad=radius``) — a
    broadcast bbox theta join for dimension-sized right sides, a grid-cell
    EQUI-join past the gate, so the candidate count is O(pairs-in-range)
    and the plan never degenerates to a nested loop over two large sides;
    without a radius it degrades to the reference's full cross join
    (parity mode only — gated behind an explicit ``allow_cross=True``)."""
    from ..kernels import geom
    from .overlay import _pair_candidates

    if radius is None and not allow_cross:
        raise ValueError(
            "near_table_geoms(radius=None) is the O(n*m) reference-parity "
            "cross join; pass a radius for the candidate-pruned join, or "
            "opt in explicitly with allow_cross=True"
        )
    self_join = right is None
    r = right if right is not None else left
    if radius is None:
        a = left.select(
            F.col("zone_id").alias("from_id"), F.col("rings").alias("l_rings")
        )
        b = r.select(F.col("zone_id").alias("to_id"), F.col("rings").alias("r_rings"))
        pairs = a.crossJoin(b)
    else:
        pairs = _pair_candidates(spark, left, r, pad=float(radius)).select(
            F.col("l_id").alias("from_id"),
            F.col("r_id").alias("to_id"),
            "l_rings",
            "r_rings",
        )

    @F.pandas_udf(T.DoubleType())
    def pairdist(lr: pd.Series, rr: pd.Series) -> pd.Series:
        out = np.empty(len(lr))
        for i, (lv, rv) in enumerate(zip(lr, rr)):
            out[i] = geom.geom_distance(
                "polygon", geom.rings_from_cell(lv), "polygon", geom.rings_from_cell(rv)
            )
        return pd.Series(out)

    out = pairs.withColumn("distance", pairdist("l_rings", "r_rings"))
    if radius is not None:
        out = out.filter(F.col("distance") <= F.lit(float(radius)))
    if self_join:
        out = out.filter(F.col("from_id") != F.col("to_id"))
    return out.select("from_id", "to_id", "distance")


def knn(
    spark: SparkSession,
    points: DataFrame,
    k: int = 5,
    res: int = 7,
) -> DataFrame:
    """Self k-nearest-neighbours: (from_id, rank, to_id, distance).

    Round 1: 3x3 cell-disk candidates; keep query points whose k-th distance
    is <= their distance to the disk boundary (no farther point can beat it).
    Round 2: cross-join fallback for the rest.
    """
    n = 1 << res
    w, h = 360.0 / n, 180.0 / n
    a = points.select(
        F.col("point_id").alias("from_id"), F.col("x").alias("ax"), F.col("y").alias("ay")
    )
    b = points.select(
        F.col("point_id").alias("to_id"), F.col("x").alias("bx"), F.col("y").alias("by")
    )

    ac = a.withColumn("cx", F.floor((F.col("ax") + 180.0) / w)).withColumn(
        "cy", F.floor((F.col("ay") + 90.0) / h)
    )
    ac = ac.select("*", F.explode(F.sequence(F.lit(-1), F.lit(1))).alias("dx"))
    ac = ac.select("*", F.explode(F.sequence(F.lit(-1), F.lit(1))).alias("dy"))
    ac = ac.withColumn("jx", F.col("cx") + F.col("dx")).withColumn("jy", F.col("cy") + F.col("dy"))
    bc = b.withColumn("jx", F.floor((F.col("bx") + 180.0) / w)).withColumn(
        "jy", F.floor((F.col("by") + 90.0) / h)
    )
    cand = (
        ac.join(bc, ["jx", "jy"])
        .filter(F.col("from_id") != F.col("to_id"))
        .withColumn("distance", _dist(F.col("ax"), F.col("ay"), F.col("bx"), F.col("by")))
        .select("from_id", "ax", "ay", "to_id", "distance")
    )
    win = Window.partitionBy("from_id").orderBy("distance", "to_id")
    # persist: ranked (<= k rows per query point — output-sized, spillable)
    # feeds `done`, the resolution test, AND the rest chain; without it the
    # candidate join recomputes for every ring probe and the fallback.
    # Persisted handles ride the result — util.release(out) frees them.
    handles = []
    ranked = (
        cand.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .persist()
    )
    handles.append(ranked)

    # distance from the query point to its 3x3-disk boundary: the safety bound
    cx = F.floor((F.col("ax") + 180.0) / w)
    cy = F.floor((F.col("ay") + 90.0) / h)
    bound = F.least(
        F.col("ax") - ((cx - 1) * w - 180.0),
        ((cx + 2) * w - 180.0) - F.col("ax"),
        F.col("ay") - ((cy - 1) * h - 90.0),
        ((cy + 2) * h - 90.0) - F.col("ay"),
    )
    per_from = ranked.groupBy("from_id", "ax", "ay").agg(
        F.count("*").alias("n_cand"), F.max("distance").alias("kth")
    )
    ok_ids = per_from.filter((F.col("n_cand") >= k) & (F.col("kth") <= bound)).select("from_id")
    done = ranked.join(F.broadcast(ok_ids), "from_id", "left_semi").select(
        "from_id", "rank", "to_id", "distance"
    )

    # ring expansion: unresolved points retry with a wider cell disk before
    # the exact brute-force tail (SURVEY §7 hard-part 5: expand until the
    # k-th candidate distance clears the disk's minimum exit distance)
    rest = a.join(F.broadcast(ok_ids), "from_id", "left_anti").persist()
    results = [done]
    for ring in (4, 16):
        if rest.isEmpty():
            break
        rc = rest.withColumn("cx", F.floor((F.col("ax") + 180.0) / w)).withColumn(
            "cy", F.floor((F.col("ay") + 90.0) / h)
        )
        rc = rc.select("*", F.explode(F.sequence(F.lit(-ring), F.lit(ring))).alias("dx"))
        rc = rc.select("*", F.explode(F.sequence(F.lit(-ring), F.lit(ring))).alias("dy"))
        rc = rc.withColumn("jx", F.col("cx") + F.col("dx")).withColumn(
            "jy", F.col("cy") + F.col("dy")
        )
        rcand = (
            rc.join(bc, ["jx", "jy"])
            .filter(F.col("from_id") != F.col("to_id"))
            .withColumn("distance", _dist(F.col("ax"), F.col("ay"), F.col("bx"), F.col("by")))
            .select("from_id", "ax", "ay", "to_id", "distance")
        )
        rranked = (
            rcand.withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= k)
            .persist()
        )
        handles.append(rranked)
        rbound = F.least(
            F.col("ax") - ((cx - ring) * w - 180.0),
            ((cx + ring + 1) * w - 180.0) - F.col("ax"),
            F.col("ay") - ((cy - ring) * h - 90.0),
            ((cy + ring + 1) * h - 90.0) - F.col("ay"),
        )
        rper = rranked.groupBy("from_id", "ax", "ay").agg(
            F.count("*").alias("n_cand"), F.max("distance").alias("kth")
        )
        rok = rper.filter((F.col("n_cand") >= k) & (F.col("kth") <= rbound)).select("from_id")
        results.append(
            rranked.join(F.broadcast(rok), "from_id", "left_semi").select(
                "from_id", "rank", "to_id", "distance"
            )
        )
        # unpersist the superseded rest (bounds the CacheManager footprint
        # across rings; Spark recomputes transparently if a later action
        # still needs the evicted lineage)
        prev_rest = rest
        rest = rest.join(F.broadcast(rok), "from_id", "left_anti").persist()
        prev_rest.unpersist()

    # exact brute-force tail for whatever survives all rings (vanishingly
    # few points — empty/edge regions)
    fb = (
        rest.crossJoin(b)
        .filter(F.col("from_id") != F.col("to_id"))
        .withColumn("distance", _dist(F.col("ax"), F.col("ay"), F.col("bx"), F.col("by")))
        .withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("from_id", "rank", "to_id", "distance")
    )
    results.append(fb)
    handles.append(rest)
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return track_persisted(out, *handles)
