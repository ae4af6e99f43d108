"""Trajectory (track) analytics over ordered point sequences.

A document's geo POINT spans, ordered by span offset, form a track —
the natural trajectory structure of the interleaved corpus (doc = entity,
offset = sequence number). Classic track metrics, all native window/agg
expressions:

- per-track length / max hop / point count / bbox (``track_stats``);
- dwell ("stay-point") segmentation: consecutive points within a radius
  of the segment anchor collapse into one dwell (``dwell_points``).

Determinism discipline (hash-gate requirement): segment lengths are
doubles, and a float SUM is order-dependent — so lengths are quantized to
integer micro-units with floor(d * 1e6) BEFORE summing. Integer sums are
order-independent and exact (< 2^53), floor and sqrt are correctly-rounded
IEEE ops, so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def track_stats(
    points: DataFrame,
    id_col: str = "doc_id",
    seq_col: str = "offset",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """(track_id, n_points, len_micro, max_hop_micro, min_x, min_y, max_x,
    max_y): planar track length and max hop in integer micro-degree units,
    plus bbox. One shuffle (window + groupBy share the id hash partition)."""
    w = Window.partitionBy(id_col).orderBy(seq_col)
    px = F.lag(x_col).over(w)
    py = F.lag(y_col).over(w)
    d = F.sqrt(
        (F.col(x_col) - px) * (F.col(x_col) - px)
        + (F.col(y_col) - py) * (F.col(y_col) - py)
    )
    hop = F.when(px.isNull(), F.lit(0)).otherwise(F.floor(d * 1e6)).cast("long")
    seg = points.select(
        F.col(id_col).alias("track_id"),
        F.col(x_col).alias("__x"),
        F.col(y_col).alias("__y"),
        hop.alias("__hop"),
    )
    return seg.groupBy("track_id").agg(
        F.count("*").cast("long").alias("n_points"),
        F.sum("__hop").cast("long").alias("len_micro"),
        F.max("__hop").cast("long").alias("max_hop_micro"),
        F.min("__x").alias("min_x"),
        F.min("__y").alias("min_y"),
        F.max("__x").alias("max_x"),
        F.max("__y").alias("max_y"),
    )


def dwell_points(
    points: DataFrame,
    radius: float,
    id_col: str = "doc_id",
    seq_col: str = "offset",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Stay-point segmentation: walking each track in order, a new dwell
    starts whenever the point leaves the ``radius``-disk AROUND THE DWELL'S
    FIRST POINT (anchor); consecutive in-radius points collapse into that
    dwell. Returns (track_id, dwell_ix, n_points, anchor_x, anchor_y).

    The anchor rule is chosen over a lag-distance rule because it is
    expressible as a running composition: a point opens a new dwell iff its
    distance to the CURRENT anchor exceeds radius — computed with one
    ordered window pass (aggregate over the collected prefix), so the whole
    segmentation is a window + groupBy, no iteration. Tracks are bounded
    (documents have bounded spans), so the prefix collect is bounded."""
    w = Window.partitionBy(id_col).orderBy(seq_col)
    prefix = F.collect_list(F.struct(F.col(x_col).alias("x"), F.col(y_col).alias("y"))).over(w)

    # fold the ordered prefix: state = (anchor, n_breaks); a point further
    # than `radius` from the running anchor becomes the new anchor
    def fold(acc, p):
        far = F.sqrt(
            (p["x"] - acc["ax"]) * (p["x"] - acc["ax"])
            + (p["y"] - acc["ay"]) * (p["y"] - acc["ay"])
        ) > radius
        started = acc["n"] == 0
        new_anchor = started | far
        return F.struct(
            F.when(new_anchor, p["x"]).otherwise(acc["ax"]).alias("ax"),
            F.when(new_anchor, p["y"]).otherwise(acc["ay"]).alias("ay"),
            (acc["n"] + F.when(new_anchor, 1).otherwise(0)).alias("n"),
        )

    init = F.struct(
        F.lit(0.0).alias("ax"), F.lit(0.0).alias("ay"), F.lit(0).alias("n")
    )
    state = F.aggregate(prefix, init, fold)
    pts = points.select(
        F.col(id_col).alias("track_id"),
        state["n"].cast("long").alias("dwell_ix"),
        state["ax"].alias("anchor_x"),
        state["ay"].alias("anchor_y"),
    )
    return pts.groupBy("track_id", "dwell_ix", "anchor_x", "anchor_y").agg(
        F.count("*").cast("long").alias("n_points")
    ).select("track_id", "dwell_ix", "n_points", "anchor_x", "anchor_y")
