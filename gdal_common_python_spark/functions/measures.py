"""Geometry measure columns (P7/M2 — calc_geometry, fields.py:346-423).

Reference: per-feature ``geom.Length()/Area()`` times a unit multiplier;
geographic (unprojected) SRS is rejected (fields.py:358-359). Engine: an
Arrow-vectorized kernel over the ``rings`` column; the multiplier ladder is
copied digit-for-digit (functions.units). Projected srid 3857/3310 are
meter-based; srid 4326/4269 raise like the reference.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..kernels import geom
from . import units as U

_METER_SRIDS = {3857, 3310}
_GEOGRAPHIC_SRIDS = {4326, 4269}


def calc_geometry(df: DataFrame, field_name: str, unit_code: int, srid: int) -> DataFrame:
    """Add `field_name` = area/length of `rings` in the requested unit."""
    if srid in _GEOGRAPHIC_SRIDS:
        raise ValueError("Unprojected spatial reference system. Reproject datasource first.")
    if srid not in _METER_SRIDS:
        raise ValueError(f"Unrecognized srid {srid}")
    is_area, mult = U.UNIT_MULTIPLIER[unit_code]
    srs_factor = U.SRS_UNIT_FACTOR["meter"]

    @F.pandas_udf(T.DoubleType())
    def measure(rings: pd.Series) -> pd.Series:
        out = np.zeros(len(rings))
        for i, rr in enumerate(rings):
            if rr is None or len(rr) == 0:
                continue  # null geometry -> 0 (fields.py:412,414)
            r = geom.rings_from_cell(rr)
            out[i] = geom.polygon_area(r) if is_area else geom.polygon_perimeter(r)
        return pd.Series(out)

    return df.withColumn(field_name, measure("rings") * F.lit(srs_factor * mult))


_CENTROID_T = T.StructType(
    [
        T.StructField("a_q", T.LongType()),
        T.StructField("cx_q", T.LongType()),
        T.StructField("cy_q", T.LongType()),
    ]
)

CENTROID_Q = float(1 << 20)


def centroid(
    df: DataFrame, rings_col: str = "rings4326", prefix: str = "centroid"
) -> DataFrame:
    """OGR Centroid() analog with the engine's integer-quantization
    discipline (the track_stats pattern): per edge (open rings, wrap-around
    closure) the shoelace terms

        cross = x1*y2 - x2*y1
        a_q   = floor(cross * 2^20)
        cx_q  = floor((x1 + x2) * cross * 2^20)
        cy_q  = floor((y1 + y2) * cross * 2^20)

    are floor-quantized to int64 BEFORE summing, so the per-feature sums
    are order-independent and the final `<prefix>_x/_y = C/(3.0*A)` is one
    correctly-rounded division — bit-identical to the SQL oracle that
    spells the same formula. Holes subtract via their opposite winding
    (the stored-ring convention); degenerate features (A == 0) yield null.
    Adds `<prefix>_x`, `<prefix>_y`; no shuffle (per-row Arrow kernel)."""

    @F.pandas_udf(_CENTROID_T)
    def sums(rings: pd.Series) -> pd.DataFrame:
        rows = []
        for rr in rings:
            if rr is None or len(rr) == 0:
                rows.append((0, 0, 0))
                continue
            a = cx = cy = 0
            for ring in geom.rings_from_cell(rr):
                p = np.asarray(ring, dtype=np.float64)
                x1, y1 = p[:, 0], p[:, 1]
                x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
                cross = x1 * y2 - x2 * y1
                a += int(np.floor(cross * CENTROID_Q).astype(np.int64).sum())
                cx += int(np.floor((x1 + x2) * cross * CENTROID_Q).astype(np.int64).sum())
                cy += int(np.floor((y1 + y2) * cross * CENTROID_Q).astype(np.int64).sum())
            rows.append((a, cx, cy))
        return pd.DataFrame(rows, columns=["a_q", "cx_q", "cy_q"])

    s = sums(rings_col)
    return (
        df.withColumn("__c", s)
        .withColumn(
            f"{prefix}_x",
            F.when(F.col("__c.a_q") != 0, F.col("__c.cx_q") / (F.lit(3.0) * F.col("__c.a_q"))),
        )
        .withColumn(
            f"{prefix}_y",
            F.when(F.col("__c.a_q") != 0, F.col("__c.cy_q") / (F.lit(3.0) * F.col("__c.a_q"))),
        )
        .drop("__c")
    )


def centroid_oracle_sql(zones_rel: str, rings_col: str = "rings4326") -> str:
    """DuckDB oracle for :func:`centroid` over a zone table -> (zone_id,
    centroid_x, centroid_y): same quantized shoelace, SQL-spelled."""
    q = repr(CENTROID_Q)
    return f"""
WITH r AS (
  SELECT zone_id, unnest({rings_col}) AS ring FROM {zones_rel}
),
e AS (
  SELECT zone_id,
         ring[idx][1] AS x1, ring[idx][2] AS y1,
         ring[(idx % len(ring)) + 1][1] AS x2,
         ring[(idx % len(ring)) + 1][2] AS y2
  FROM (SELECT zone_id, ring, unnest(generate_series(1, len(ring))) AS idx FROM r)
),
t AS (
  SELECT zone_id,
         CAST(floor((x1 * y2 - x2 * y1) * {q}) AS BIGINT) AS a_q,
         CAST(floor((x1 + x2) * (x1 * y2 - x2 * y1) * {q}) AS BIGINT) AS cx_q,
         CAST(floor((y1 + y2) * (x1 * y2 - x2 * y1) * {q}) AS BIGINT) AS cy_q
  FROM e
),
s AS (
  SELECT zone_id,
         CAST(sum(a_q) AS BIGINT) AS a_q,
         CAST(sum(cx_q) AS BIGINT) AS cx_q,
         CAST(sum(cy_q) AS BIGINT) AS cy_q
  FROM t GROUP BY 1
)
SELECT zone_id,
       CASE WHEN a_q != 0 THEN cx_q / (CAST(3.0 AS DOUBLE) * a_q) END AS centroid_x,
       CASE WHEN a_q != 0 THEN cy_q / (CAST(3.0 AS DOUBLE) * a_q) END AS centroid_y
FROM s
"""


def point_on_surface(zones: DataFrame, edges: DataFrame) -> DataFrame:
    """Guaranteed-interior representative point (ST_PointOnSurface /
    OGR PointOnSurface analog), defined deterministically: cast the
    horizontal scanline through the bbox vertical midpoint
    ``y0 = (ymin + ymax) / 2``, collect its even-odd edge crossings,
    pair them into interior intervals, and return the midpoint of the
    WIDEST interval (ties to the smallest midpoint x) ->
    (zone_id, pos_x, pos_y).

    Fully native (no UDF): the crossing x uses the exact same IEEE
    expression tree as the distributed PIP refinement, the pairing is a
    lead() window over the dimension-sized per-zone crossing set, so the
    DuckDB oracle hash-matches bit-for-bit. Interior by construction for
    valid rings (even-odd intervals are inside by definition) — unlike
    the centroid, which can fall outside a concave polygon.

    100 TB shape: zones are dimension-sized; the windows partition by
    zone_id (no global sort) and shuffle only the crossing rows
    (∝ zones, never a corpus)."""
    from pyspark.sql import Window

    zy = zones.select(
        "zone_id",
        ((F.col("bbox4326.ymin") + F.col("bbox4326.ymax")) / F.lit(2.0)).alias("y0"),
    )
    e = edges.join(zy, "zone_id").filter(
        (F.col("ey1") > F.col("y0")) != (F.col("ey2") > F.col("y0"))
    )
    x = (
        (F.col("ex2") - F.col("ex1"))
        * (F.col("y0") - F.col("ey1"))
        / (F.col("ey2") - F.col("ey1"))
        + F.col("ex1")
    )
    cr = e.select("zone_id", "y0", x.alias("x"))
    w = Window.partitionBy("zone_id").orderBy("x")
    paired = (
        cr.withColumn("rn", F.row_number().over(w))
        .withColumn("x2", F.lead("x").over(w))
        .filter((F.col("rn") % 2 == 1) & F.col("x2").isNotNull())
    )
    pick = Window.partitionBy("zone_id").orderBy(
        F.desc(F.col("x2") - F.col("x")), (F.col("x") + F.col("x2")) / F.lit(2.0)
    )
    return (
        paired.withColumn("pk", F.row_number().over(pick))
        .filter(F.col("pk") == 1)
        .select(
            "zone_id",
            ((F.col("x") + F.col("x2")) / F.lit(2.0)).alias("pos_x"),
            F.col("y0").alias("pos_y"),
        )
    )


def point_on_surface_oracle_sql(zones_rel: str, edges_rel: str) -> str:
    """DuckDB oracle for :func:`point_on_surface`: identical crossing
    expression, identical pairing windows, QUALIFY pick."""
    return f"""
WITH zy AS (
  SELECT zone_id, (bbox4326.ymin + bbox4326.ymax) / 2.0 AS y0 FROM {zones_rel}
),
cr AS (
  SELECT e.zone_id, zy.y0,
         (e.ex2 - e.ex1) * (zy.y0 - e.ey1) / (e.ey2 - e.ey1) + e.ex1 AS x
  FROM {edges_rel} e JOIN zy USING (zone_id)
  WHERE (e.ey1 > zy.y0) != (e.ey2 > zy.y0)
),
paired AS (
  SELECT zone_id, y0, x,
         row_number() OVER (PARTITION BY zone_id ORDER BY x) AS rn,
         lead(x) OVER (PARTITION BY zone_id ORDER BY x) AS x2
  FROM cr
)
SELECT zone_id, (x + x2) / 2.0 AS pos_x, y0 AS pos_y
FROM paired
WHERE rn % 2 = 1 AND x2 IS NOT NULL
QUALIFY row_number() OVER (PARTITION BY zone_id
                           ORDER BY x2 - x DESC, (x + x2) / 2.0) = 1
"""
