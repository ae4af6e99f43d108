"""Ring simplification (OGR Simplify / Douglas-Peucker analog), with a
BOUNDED-DEPTH contract that makes the recursion oracle-expressible.

Classic DP is sequential per feature; the engine runs it as an Arrow
kernel (vectorized numpy per ring — no shuffle at all), and the semantic
is pinned as "breadth-first DP, at most `max_depth` split levels":

  level 0: keep vertex 1 and the vertex FARTHEST from it (ties -> min
           index) — the standard closed-ring anchor split;
  level t: every open interval (i, j) splits at its max-deviation interior
           vertex when the squared cross product exceeds eps^2 * |chord|^2
           (degenerate chords fall back to plain distance), ties -> min
           index.

Depth K covers every ring whose DP recursion tree is <= K deep (all of the
synth zones at K=8; random rings need ~log2(n) levels); deeper trees get
the truncated (still valid, slightly coarser) simplification — the SAME
truncation on both engines, which is the point: the DuckDB oracle UNROLLS
exactly K levels of the identical argmax/split algebra, so the kept-vertex
set is hash-exact. Every comparison is on identical IEEE expression trees
(squared cross products and squared distances — no sqrt, no division).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..kernels import geom

_KEEP_T = T.ArrayType(
    T.StructType(
        [
            T.StructField("ri", T.IntegerType()),
            T.StructField("idx", T.IntegerType()),
            T.StructField("x", T.DoubleType()),
            T.StructField("y", T.DoubleType()),
        ]
    )
)


def dp_keep_indexes(p: np.ndarray, eps2: float, max_depth: int) -> list[int]:
    """0-based kept-vertex indexes of one open ring (wrap-around closure)."""
    n = len(p)
    if n <= 2:
        return list(range(n))
    a = p[0]
    d2 = (p[:, 0] - a[0]) * (p[:, 0] - a[0]) + (p[:, 1] - a[1]) * (p[:, 1] - a[1])
    k0 = int(np.argmax(d2[1:])) + 1
    kept = {0, k0}
    work = [(0, k0), (k0, n)]  # j == n wraps to vertex 0
    pe = np.vstack([p, p[:1]])
    for _ in range(1, max_depth):
        nxt = []
        for i, j in work:
            if j - i < 2:
                continue
            ax, ay = pe[i]
            bx, by = pe[j]
            seg = p[i + 1 : j]
            dx, dy = bx - ax, by - ay
            len2 = dx * dx + dy * dy
            if len2 == 0.0:
                m = (seg[:, 0] - ax) * (seg[:, 0] - ax) + (seg[:, 1] - ay) * (seg[:, 1] - ay)
                thr = eps2
            else:
                cr = dx * (seg[:, 1] - ay) - dy * (seg[:, 0] - ax)
                m = cr * cr
                thr = eps2 * len2
            km = int(np.argmax(m))
            if m[km] > thr:
                k = i + 1 + km
                kept.add(k)
                nxt += [(i, k), (k, j)]
        work = nxt
        if not work:
            break
    return sorted(kept)


def dp_simplify(
    zones: DataFrame,
    eps: float,
    max_depth: int = 8,
    rings_col: str = "rings4326",
    id_col: str = "zone_id",
) -> DataFrame:
    """Kept vertices per feature ring ->
    (zone_id, ri, idx, x, y) with 1-based ring and vertex ordinals (the
    oracle's generate_subscripts convention). Per-row Arrow kernel — no
    shuffle; reassembling simplified ring arrays is a groupBy away when a
    consumer wants geometry columns back."""
    eps2 = float(eps) * float(eps)

    @F.pandas_udf(_KEEP_T)
    def keep(rings: pd.Series) -> pd.Series:
        out = []
        for rr in rings:
            rows = []
            if rr is not None and len(rr) > 0:
                for ri, ring in enumerate(geom.rings_from_cell(rr), start=1):
                    p = np.asarray(ring, dtype=np.float64)
                    for k in dp_keep_indexes(p, eps2, max_depth):
                        rows.append(
                            dict(ri=ri, idx=k + 1, x=float(p[k, 0]), y=float(p[k, 1]))
                        )
            out.append(rows)
        return pd.Series(out)

    return zones.select(id_col, F.explode(keep(rings_col)).alias("k")).select(
        id_col,
        F.col("k.ri").alias("ri"),
        F.col("k.idx").alias("idx"),
        F.col("k.x").alias("x"),
        F.col("k.y").alias("y"),
    )


def dp_simplify_oracle_sql(
    zones_rel: str,
    eps: float,
    max_depth: int = 8,
    rings_col: str = "rings4326",
    id_col: str = "zone_id",
) -> str:
    """Oracle: K unrolled levels of the identical argmax/split algebra."""
    eps2 = repr(float(eps) * float(eps))
    ctes = [
        f"""pts AS (
  SELECT zid, ri, idx, ring[idx][1] AS x, ring[idx][2] AS y
  FROM (
    SELECT zid, ri, ring, unnest(generate_series(1, len(ring))) AS idx
    FROM (
      SELECT {id_col} AS zid, generate_subscripts({rings_col}, 1) AS ri,
             unnest({rings_col}) AS ring
      FROM {zones_rel}
    )
  )
)""",
        """rn AS (SELECT zid, ri, max(idx) AS n FROM pts GROUP BY 1, 2)""",
        # idx n+1 wraps to vertex 1
        """pe AS (
  SELECT * FROM pts
  UNION ALL
  SELECT p.zid, p.ri, r.n + 1, p.x, p.y
  FROM pts p JOIN rn r ON r.zid = p.zid AND r.ri = p.ri AND p.idx = 1
)""",
        # level 0: farthest from vertex 1 (ties -> min idx)
        """l0 AS (
  SELECT zid, ri, idx AS k0 FROM (
    SELECT p.zid, p.ri, p.idx,
           ROW_NUMBER() OVER (
             PARTITION BY p.zid, p.ri
             ORDER BY (p.x - a.x) * (p.x - a.x) + (p.y - a.y) * (p.y - a.y) DESC,
                      p.idx ASC
           ) AS rn
    FROM pts p
    JOIN pts a ON a.zid = p.zid AND a.ri = p.ri AND a.idx = 1
    WHERE p.idx >= 2
  ) WHERE rn = 1
)""",
        """ints1 AS (
  SELECT l0.zid, l0.ri, 1 AS i, l0.k0 AS j FROM l0
  UNION ALL
  SELECT l0.zid, l0.ri, l0.k0, r.n + 1 FROM l0 JOIN rn r USING (zid, ri)
)""",
    ]
    keeps = []
    for t in range(1, max_depth):
        ctes.append(
            f"""split{t} AS (
  SELECT * FROM (
    SELECT s.zid, s.ri, s.i, s.j, p.idx,
           CASE WHEN (b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y) = 0.0
                THEN ((p.x - a.x) * (p.x - a.x) + (p.y - a.y) * (p.y - a.y)) > {eps2}
                ELSE ((b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x))
                   * ((b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x))
                   > {eps2} * ((b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y))
           END AS ok,
           ROW_NUMBER() OVER (
             PARTITION BY s.zid, s.ri, s.i, s.j
             ORDER BY CASE WHEN (b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y) = 0.0
                           THEN (p.x - a.x) * (p.x - a.x) + (p.y - a.y) * (p.y - a.y)
                           ELSE ((b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x))
                              * ((b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x))
                      END DESC, p.idx ASC
           ) AS rn
    FROM ints{t} s
    JOIN pe a ON a.zid = s.zid AND a.ri = s.ri AND a.idx = s.i
    JOIN pe b ON b.zid = s.zid AND b.ri = s.ri AND b.idx = s.j
    JOIN pts p ON p.zid = s.zid AND p.ri = s.ri AND p.idx > s.i AND p.idx < s.j
  ) WHERE rn = 1 AND ok
)"""
        )
        keeps.append(f"SELECT zid, ri, idx FROM split{t}")
        if t < max_depth - 1:
            ctes.append(
                f"""ints{t + 1} AS (
  SELECT zid, ri, i, idx AS j FROM split{t}
  UNION ALL
  SELECT zid, ri, idx, j FROM split{t}
)"""
            )
    kept_union = "\n  UNION\n  ".join(
        ["SELECT zid, ri, 1 AS idx FROM l0", "SELECT zid, ri, k0 FROM l0"] + keeps
    )
    ctes.append(f"kept AS (\n  {kept_union}\n)")
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT p.zid AS {id_col}, CAST(p.ri AS INT) AS ri, CAST(p.idx AS INT) AS idx, p.x, p.y
FROM kept k JOIN pts p ON p.zid = k.zid AND p.ri = k.ri AND p.idx = k.idx
"""
