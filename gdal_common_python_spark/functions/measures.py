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
