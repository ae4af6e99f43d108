"""ogr2ogr -explodecollections analog: split multipolygons into parts.

The reference exposes multipart geometries as flat ring lists (the same
convention the synth zones use: outer rings CCW/positive shoelace, holes
CW/negative, each hole following its outer). ``-explodecollections``
turns each PART (one outer + its holes) into its own feature row.

Part assignment is pure ring algebra — no geometry containment test
needed under the stored-ring convention: a ring opens a new part iff its
signed area is positive, so  part_idx = running count of positive rings.
The sign comes from the centroid discipline (functions/measures.py):
per-edge shoelace terms floor-quantized to int64 BEFORE summing —
order-free, bit-identical in Spark and DuckDB.

100 TB shape: pure codegen (one aggregate HOF per ring + one window per
zone), zero UDF; rows fan out only by ring count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..functions.measures import CENTROID_Q


def _ring_area_q(ring):
    """Quantized doubled signed area of one ring column (open ring,
    wrap-around closure) — sum of floor-quantized int64 shoelace terms."""
    n = F.size(ring)

    def term(acc, i):
        x1 = F.element_at(F.element_at(ring, i), 1)
        y1 = F.element_at(F.element_at(ring, i), 2)
        x2 = F.element_at(F.element_at(ring, (i % n) + 1), 1)
        y2 = F.element_at(F.element_at(ring, (i % n) + 1), 2)
        return acc + F.floor((x1 * y2 - x2 * y1) * F.lit(CENTROID_Q)).cast("long")

    # guard n == 0: F.sequence(1, n) would descend to [1, 0] and
    # element_at(ring, 0) errors; an empty ring has zero area
    return F.when(
        n > 0, F.aggregate(F.sequence(F.lit(1), n), F.lit(0).cast("long"), term)
    ).otherwise(F.lit(0).cast("long"))


def explode_collections(
    zones: DataFrame,
    rings_col: str = "rings4326",
    id_col: str = "zone_id",
) -> DataFrame:
    """(zone_id, ri, part_idx, is_outer, area_q): one row per ring with
    its 1-based part assignment; ``area_q`` is the quantized doubled
    signed area (positive = outer). Group by (zone_id, part_idx) to
    materialize per-part features."""
    ex = (
        zones.select(
            F.col(id_col).alias("zone_id"),
            F.posexplode(F.col(rings_col)).alias("ri", "__ring"),
        )
        # drop degenerate empty rings: the DuckDB oracle's
        # generate_series(1, 0) is empty and silently loses them, so both
        # engines agree by construction (ri keeps the original position)
        .where(F.size("__ring") > 0)
        .select("zone_id", "ri", _ring_area_q(F.col("__ring")).alias("area_q"))
    )
    w = (
        Window.partitionBy("zone_id")
        .orderBy("ri")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ex.select(
        "zone_id",
        "ri",
        F.sum(F.when(F.col("area_q") > 0, 1).otherwise(0)).over(w).alias("part_idx"),
        (F.col("area_q") > 0).alias("is_outer"),
        "area_q",
    )


def explode_collections_oracle_sql(
    zones_rel: str,
    rings_col: str = "rings4326",
    id_col: str = "zone_id",
) -> str:
    """DuckDB mirror — identical quantized shoelace + running outer count."""
    q = repr(CENTROID_Q)
    return f"""
WITH r AS (
  SELECT {id_col} AS zone_id, CAST(ri - 1 AS INT) AS ri, ring
  FROM (SELECT {id_col}, generate_subscripts({rings_col}, 1) AS ri,
               unnest({rings_col}) AS ring
        FROM {zones_rel})
),
a AS (
  SELECT zone_id, ri,
         CAST(sum(CAST(floor((ring[idx][1] * ring[(idx % len(ring)) + 1][2]
                             - ring[(idx % len(ring)) + 1][1] * ring[idx][2]) * {q})
                       AS BIGINT)) AS BIGINT) AS area_q
  FROM (SELECT zone_id, ri, ring, unnest(generate_series(1, len(ring))) AS idx FROM r)
  GROUP BY zone_id, ri
)
SELECT zone_id, ri,
       CAST(sum(CASE WHEN area_q > 0 THEN 1 ELSE 0 END)
              OVER (PARTITION BY zone_id ORDER BY ri ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS part_idx,
       area_q > 0 AS is_outer,
       area_q
FROM a
"""
