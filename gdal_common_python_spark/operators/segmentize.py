"""OGR Segmentize analog: densify ring edges to a maximum segment length.

The reference's geometry densification path is OGR's ``Segmentize``
(reached through the same SWIG geometry surface as Simplify —
lib/analysis.py); semantics here are the standard one: every edge longer
than ``max_len`` gains evenly-spaced intermediate vertices so that no
output segment exceeds ``max_len``; vertex order and ring orientation are
preserved, existing vertices are never moved.

Exactness: the split count is m = max(1, ceil(sqrt(dx^2+dy^2)/max_len))
(one correctly-rounded sqrt — bit-identical in Spark and DuckDB), and
inserted vertices are x1 + (dx * k) / m on the identical IEEE tree.

100 TB shape: pure whole-stage codegen, ZERO shuffle, zero UDF — one
narrow map of nested HOFs (transform/flatten/posexplode) over the zone
table; rows fan out only by the densification factor itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def segmentize(
    zones: DataFrame,
    max_len: float,
    rings_col: str = "rings4326",
    id_col: str = "zone_id",
) -> DataFrame:
    """Densified vertex rows (zone_id, ri, idx, x, y): open rings (wrap
    closure), ri = ring index, idx = vertex position in the densified
    ring — both 0-based."""
    if max_len <= 0:
        raise ValueError(f"max_len must be > 0, got {max_len}")
    ml = F.lit(float(max_len))

    def densify(ring):
        n = F.size(ring)

        def edge_points(i):
            p1 = F.element_at(ring, i + 1)
            p2 = F.element_at(ring, ((i + 1) % n) + 1)
            x1, y1 = F.element_at(p1, 1), F.element_at(p1, 2)
            dx = F.element_at(p2, 1) - x1
            dy = F.element_at(p2, 2) - y1
            m = F.greatest(F.lit(1).cast("long"), F.ceil(F.sqrt(dx * dx + dy * dy) / ml))
            return F.transform(
                F.sequence(F.lit(0).cast("long"), m - 1),
                lambda k: F.array(x1 + (dx * k) / m, y1 + (dy * k) / m),
            )

        # guard n == 0: F.sequence(0, n-1) would descend to [0, -1] and
        # element_at(ring, 0) errors; an empty ring densifies to nothing
        # (the DuckDB oracle's range(0, len(ring)) is empty and agrees)
        return F.when(
            n > 0, F.flatten(F.transform(F.sequence(F.lit(0), n - 1), edge_points))
        ).otherwise(F.expr("cast(array() as array<array<double>>)"))

    ex = zones.select(
        F.col(id_col).alias("zone_id"),
        F.posexplode(F.col(rings_col)).alias("ri", "__ring"),
    ).select("zone_id", "ri", F.posexplode(densify(F.col("__ring"))).alias("idx", "__p"))
    return ex.select(
        "zone_id", "ri", "idx",
        F.element_at("__p", 1).alias("x"),
        F.element_at("__p", 2).alias("y"),
    )


def segmentize_oracle_sql(
    zones_rel: str,
    max_len: float,
    rings_col: str = "rings4326",
    id_col: str = "zone_id",
) -> str:
    """DuckDB mirror — identical sqrt/ceil/interpolation tree; DuckDB list
    indexing is 1-based like Spark element_at."""
    ml = float(max_len)
    return f"""
WITH r AS (
  SELECT {id_col} AS zone_id, CAST(ri - 1 AS INT) AS ri, ring
  FROM (SELECT {id_col}, generate_subscripts({rings_col}, 1) AS ri,
               unnest({rings_col}) AS ring
        FROM {zones_rel})
),
e AS (
  SELECT zone_id, ri, len(ring) AS n, CAST(i AS BIGINT) AS i,
         ring[CAST(i + 1 AS BIGINT)] AS p1,
         ring[CAST(((i + 1) % len(ring)) + 1 AS BIGINT)] AS p2
  FROM r, LATERAL unnest(range(0, len(ring))) AS u(i)
),
seg AS (
  SELECT zone_id, ri, i,
         p1[1] AS x1, p1[2] AS y1, p2[1] - p1[1] AS dx, p2[2] - p1[2] AS dy,
         greatest(1, CAST(ceil(sqrt((p2[1]-p1[1])*(p2[1]-p1[1]) + (p2[2]-p1[2])*(p2[2]-p1[2])) / {ml!r}) AS BIGINT)) AS m
  FROM e
),
pts AS (
  SELECT zone_id, ri, i, CAST(k AS BIGINT) AS k, m,
         x1 + (dx * k) / m AS x, y1 + (dy * k) / m AS y
  FROM seg, LATERAL unnest(range(0, m)) AS u(k)
)
SELECT zone_id, ri,
       CAST(row_number() OVER (PARTITION BY zone_id, ri ORDER BY i, k) - 1 AS INT) AS idx,
       x, y
FROM pts
"""
