"""Layer-vs-layer geometric overlays (G1-G8, lib/analysis.py) — SURVEY §2.5.

Reference: OGR layer-algebra methods (Clip/Erase/Identity/Intersection/
SymDifference/Union/Update) after auto-rectify. Engine: a size-gated
candidate join (broadcast bbox theta join for dimension-sized sides, a
coarse-grid cell equi-join past the gate) finds bbox-overlapping pairs,
then the GENERAL pairwise kernels compute the geometry — concave outers,
holes and multipolygon parts supported on either side via ear-clipping
decomposition (kernels.geom.clip_general/difference_general). Parity is
gated on pixel-grid membership of the OUTPUT geometry plus id-pairs,
areas and counts (SURVEY §2.5 parity note).

Buffer (G1, lib/analysis.py:8-51): points -> regular n-gon
(buffer_points); arbitrary polygon layers -> Minkowski-disk union for
d > 0 and boundary-band erosion (P ⊖ d = P \\ (∂P ⊕ d)) for d < 0
(buffer_layer, any distance sign).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..kernels import geom
from .util import broadcastable, track_persisted

_RINGS_T = T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType())))


def _pair_candidates(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    broadcast_limit: int = 100_000,
    pad: float = 0.0,
) -> DataFrame:
    df, _ = _pair_candidates_info(spark, left, right, broadcast_limit, pad)
    return df


def _pair_candidates_info(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    broadcast_limit: int = 100_000,
    pad: float = 0.0,
) -> tuple[DataFrame, bool]:
    """bbox-overlap candidate pairs of two zone-shaped tables (native).

    Dimension-sized right sides broadcast into a bbox theta join; past
    `broadcast_limit` rows (bounded limit+count probe) the plan dispatches
    to a coarse-grid cell equi-join — both sides explode their bbox onto a
    data-sized grid, join on the cell, keep the exact bbox-overlap residual,
    and report each pair once via a min-shared-cell filter (no dedup shuffle). Fully distributed: shuffles on uniform grid keys
    instead of materializing the right side on the driver (the scale plan
    for G2-G8 overlays and dissolve's component pairing).

    ``pad`` expands the overlap test (and the left side's grid cover) by a
    distance — the radius-join form used by near_table_geoms: bboxes more
    than `pad` apart cannot hold geometries within `pad` of each other."""
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
    pd_ = F.lit(float(pad))
    cond = (
        (F.col("l_bbox.xmin") - pd_ <= F.col("r_bbox.xmax"))
        & (F.col("r_bbox.xmin") - pd_ <= F.col("l_bbox.xmax"))
        & (F.col("l_bbox.ymin") - pd_ <= F.col("r_bbox.ymax"))
        & (F.col("r_bbox.ymin") - pd_ <= F.col("l_bbox.ymax"))
    )
    # gate on the projected side that would actually broadcast: bounded row
    # probe + sampled byte width (ring arrays are wide — a row cap alone
    # could admit an over-sized broadcast)
    if broadcastable(r, broadcast_limit):
        return l.join(F.broadcast(r), cond), True
    # grid cell size from the LARGER of the two sides' average bbox
    # dimensions (one agg job per side): sizing to the small side only
    # would explode a big left geometry into (w/cs)^2 cells
    stl = l.agg(
        F.avg(F.col("l_bbox.xmax") - F.col("l_bbox.xmin")).alias("w"),
        F.avg(F.col("l_bbox.ymax") - F.col("l_bbox.ymin")).alias("h"),
    ).first()
    st = r.agg(
        F.avg(F.col("r_bbox.xmax") - F.col("r_bbox.xmin")).alias("w"),
        F.avg(F.col("r_bbox.ymax") - F.col("r_bbox.ymin")).alias("h"),
    ).first()
    cs = max(
        float(st["w"] or 0.0), float(st["h"] or 0.0),
        float(stl["w"] or 0.0), float(stl["h"] or 0.0), 1e-9,
    )

    def with_cells(df, bbox, grow, x0, y0):
        # carry the cover rectangle's min corner (x0, y0): each pair shares
        # a contiguous cell rectangle, so it can be report-once filtered at
        # the min shared cell below instead of dedup-shuffled
        return (
            df.withColumn(
                x0, F.floor((F.col(f"{bbox}.xmin") - grow) / cs).cast("long")
            )
            .withColumn(
                y0, F.floor((F.col(f"{bbox}.ymin") - grow) / cs).cast("long")
            )
            .withColumn(
                "__cx",
                F.explode(
                    F.sequence(
                        F.col(x0),
                        F.floor((F.col(f"{bbox}.xmax") + grow) / cs).cast("long"),
                    )
                ),
            )
            .withColumn(
                "__cy",
                F.explode(
                    F.sequence(
                        F.col(y0),
                        F.floor((F.col(f"{bbox}.ymax") + grow) / cs).cast("long"),
                    )
                ),
            )
        )

    # pad expands only the left cover (sufficient: any pair within pad has
    # the right bbox inside the left's padded cover)
    lc = with_cells(l, "l_bbox", pd_, "__lx0", "__ly0")
    rc = with_cells(r, "r_bbox", F.lit(0.0), "__rx0", "__ry0")
    # report-once WITHOUT a shuffle: both covers are contiguous cell
    # rectangles, so the pair appears exactly once at the min shared cell —
    # a codegen filter replaces dropDuplicates, which carried both sides'
    # ring arrays and therefore sort-aggregated the whole candidate table
    return (
        lc.join(rc, ["__cx", "__cy"])
        .filter(cond)
        .filter(
            (F.col("__cx") == F.greatest("__lx0", "__rx0"))
            & (F.col("__cy") == F.greatest("__ly0", "__ry0"))
        )
        .drop("__cx", "__cy", "__lx0", "__ly0", "__rx0", "__ry0")
    ), False


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


def clip(
    spark: SparkSession, left: DataFrame, right: DataFrame, cand: DataFrame | None = None
) -> DataFrame:
    """G2 (lib/analysis.py:54-76): left geometries clipped to right; left
    attrs kept. Output: l_id, r_id, rings, area. ``cand`` lets compositions
    reuse one candidate join instead of recomputing it."""
    if cand is None:
        cand = _pair_candidates(spark, left, right)

    schema = T.StructType(
        [
            T.StructField("l_id", T.LongType()),
            T.StructField("r_id", T.LongType()),
            T.StructField("rings", _RINGS_T),
            T.StructField("area", T.DoubleType()),
        ]
    )
    # clip-side decomposition memo: the SAME right geometry appears across
    # many candidate pairs — ear-clip it once per worker, not per pair. The
    # dict is created per clip() call, so distinct right layers never share
    # keys; capped like the spatial-join zone cache.
    dec_cache: dict[int, object] = {}

    def kernel(batches):
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                subj = geom.rings_from_cell(row.l_rings)
                rid = int(row.r_id)
                dec = _dec_cached(dec_cache, rid, row.r_rings)
                pieces = geom.clip_general(subj, None, parts_dec=dec)
                if pieces:
                    rows.append(
                        dict(
                            l_id=int(row.l_id),
                            r_id=rid,
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


_ERASE_SCHEMA = T.StructType(
    [
        T.StructField("l_id", T.LongType()),
        T.StructField("rings", _RINGS_T),
        T.StructField("area", T.DoubleType()),
    ]
)


def _untouched_lefts(left: DataFrame, cand: DataFrame) -> DataFrame:
    """Left rows with NO candidate pair, passed through with their original
    geometry: an anti-join against the column-pruned candidate ids. On the
    broadcast candidate path this branch re-derives the join (id-pruned,
    no ring payload — cheap native work, nothing persisted); on the grid
    path the caller persists cand instead, because the double-explode +
    dropDuplicates shuffle is NOT cheap to run twice per action."""

    @F.pandas_udf(T.DoubleType())
    def area_of(rings: pd.Series) -> pd.Series:
        return pd.Series([geom.polygon_area(geom.rings_from_cell(r)) for r in rings])

    return (
        left.join(cand.select("l_id").distinct(), left["zone_id"] == F.col("l_id"), "left_anti")
        .select(F.col("zone_id").alias("l_id"), "rings")
        .withColumn("area", area_of("rings"))
    )


def _dec_cached(dec_cache: dict, rid: int, rr) -> object:
    """Per-worker memo of a right feature's convex decomposition — the same
    right geometry is clipped from / subtracted from many lefts."""
    dec = dec_cache.get(rid)
    if dec is None:
        if len(dec_cache) >= 50_000:
            dec_cache.clear()
        dec = dec_cache[rid] = geom.decompose_parts(geom.rings_from_cell(rr))
    return dec


def erase(
    spark: SparkSession, left: DataFrame, right: DataFrame, cand: DataFrame | None = None
) -> DataFrame:
    """G3 (lib/analysis.py:79-102): left geometry minus all overlapping right
    geometry; rows with no candidates pass through (anti-join union).
    Right side may be concave, carry holes, or be multi-part — the general
    difference kernel decomposes it (Layer.Erase scope,
    lib/analysis.py:100), with the decomposition memoized per worker.
    Broadcast candidate path persists nothing; the grid path persists the
    pair table for its two consumers (handle rides the result —
    util.release)."""
    handles = []
    if cand is None:
        cand, cheap = _pair_candidates_info(spark, left, right)
        if not cheap:
            cand = cand.persist()
            handles.append(cand)
    dec_cache: dict[int, object] = {}

    def kernel(key, pdf):
        pieces = geom.rings_from_cell(pdf["l_rings"].iloc[0])
        for rid, rr in zip(pdf["r_id"], pdf["r_rings"]):
            dec = _dec_cached(dec_cache, int(rid), rr)
            pieces = geom.difference_general(pieces, None, parts_dec=dec)
        if not pieces:
            return pd.DataFrame(columns=["l_id", "rings", "area"])
        return pd.DataFrame(
            [
                dict(
                    l_id=int(key[0]),
                    rings=[p.tolist() for p in pieces],
                    area=float(sum(geom.signed_area(p) for p in pieces)),
                )
            ]
        )

    erased = cand.groupBy("l_id").applyInPandas(kernel, _ERASE_SCHEMA)
    return track_persisted(erased.unionByName(_untouched_lefts(left, cand)), *handles)


_IDENTITY_SCHEMA = T.StructType(
    [
        T.StructField("l_id", T.LongType()),
        T.StructField("r_id", T.LongType()),
        T.StructField("rings", _RINGS_T),
        T.StructField("area", T.DoubleType()),
    ]
)


def identity(spark: SparkSession, left: DataFrame, right: DataFrame) -> DataFrame:
    """G4 (lib/analysis.py:105-131): intersection pieces carry both ids;
    the un-overlapped remainder keeps left id with null r_id. ONE grouped
    kernel emits both halves per candidate left — each right feature's
    convex decomposition is shared between its clip piece and the running
    difference — and no-candidate lefts ride the cheap anti-join branch.
    Broadcast candidate path persists nothing; the grid path persists the
    pair table for its two consumers (handle rides the result)."""
    handles = []
    cand, cheap = _pair_candidates_info(spark, left, right)
    if not cheap:
        cand = cand.persist()
        handles.append(cand)
    dec_cache: dict[int, object] = {}

    def kernel(key, pdf):
        subj = geom.rings_from_cell(pdf["l_rings"].iloc[0])
        remaining = subj
        rows = []
        for rid, rr in zip(pdf["r_id"], pdf["r_rings"]):
            rid = int(rid)
            dec = _dec_cached(dec_cache, rid, rr)
            pieces = geom.clip_general(subj, None, parts_dec=dec)
            if pieces:
                rows.append(
                    dict(
                        l_id=int(key[0]),
                        r_id=rid,
                        rings=[p.tolist() for p in pieces],
                        area=float(sum(geom.signed_area(p) for p in pieces)),
                    )
                )
            remaining = geom.difference_general(remaining, None, parts_dec=dec)
        if remaining:
            rows.append(
                dict(
                    l_id=int(key[0]),
                    r_id=None,
                    rings=[p.tolist() for p in remaining],
                    area=float(sum(geom.signed_area(p) for p in remaining)),
                )
            )
        return pd.DataFrame(rows, columns=["l_id", "r_id", "rings", "area"])

    both = cand.groupBy("l_id").applyInPandas(kernel, _IDENTITY_SCHEMA)
    rest = _untouched_lefts(left, cand).withColumn("r_id", F.lit(None).cast("long"))
    return track_persisted(
        both.unionByName(rest.select("l_id", "r_id", "rings", "area")), *handles
    )


def symmetric_difference(spark: SparkSession, left: DataFrame, right: DataFrame) -> DataFrame:
    """G6 (lib/analysis.py:163-186): erase both directions, union."""
    a = erase(spark, left, right).withColumn("side", F.lit("left"))
    b = erase(spark, right, left).withColumn("side", F.lit("right"))
    return a.unionByName(b)


def union_layers(left: DataFrame, right: DataFrame) -> DataFrame:
    """G7 (lib/analysis.py:189-212): relational union of the two layers —
    the reference's Union does NOT create intersection splits
    (lib/analysis.py:192 docstring), so this is unionByName."""
    cols = [c for c in left.columns if c in right.columns]
    return left.select(*cols).unionByName(right.select(*cols))


def update(spark: SparkSession, base: DataFrame, upd: DataFrame) -> DataFrame:
    """G8 (lib/analysis.py:215-238): erase(base, upd) + upd features."""

    @F.pandas_udf(T.DoubleType())
    def area_of(rings: pd.Series) -> pd.Series:
        return pd.Series([geom.polygon_area(geom.rings_from_cell(r)) for r in rings])

    kept = erase(spark, base, upd)
    incoming = upd.select(F.col("zone_id").alias("l_id"), "rings").withColumn(
        "area", area_of("rings")
    )
    return kept.unionByName(incoming)


def buffer_points(points: DataFrame, dist: float, n: int = 32) -> DataFrame:
    """G1 for point layers: point_id + buffered ring polygon."""

    @F.pandas_udf(_RINGS_T)
    def buf(x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series(
            [[geom.buffer_point(float(xi), float(yi), dist, n).tolist()] for xi, yi in zip(x, y)]
        )

    return points.withColumn("rings", buf("x", "y"))


def buffer_layer(df: DataFrame, dist: float, n: int = 16, rings_col: str = "rings") -> DataFrame:
    """G1 for polygon layers — the full geom.Buffer analog
    (lib/analysis.py:8-51): arbitrary polygons incl. concave outers, holes
    and multiparts, ANY distance sign (d<0 erodes — inward setback, holes
    grow, collapsed features keep their row with empty geometry); attrs
    pass through, geometry replaced by the buffered piece collection
    (kernels.geom.buffer_rings). Embarrassingly parallel — one Arrow batch
    kernel per partition, no shuffle."""

    @F.pandas_udf(_RINGS_T)
    def buf(rings: pd.Series) -> pd.Series:
        return pd.Series(
            [
                [r.tolist() for r in geom.buffer_rings(geom.rings_from_cell(rr), dist, n)]
                for rr in rings
            ]
        )

    return df.withColumn(rings_col, buf(rings_col))
