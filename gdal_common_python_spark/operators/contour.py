"""gdal_contour analog: marching-squares contour segments, Spark-first.

No reference analog (reference raster ops stop at zonal/mosaic) — fourth
consumer of the shared halo exchange (`focal.py`): every 2x2 pixel cell is
owned by its top-left pixel's tile, and the right/bottom corners arrive in
the 1-pixel halo, so contour extraction is ONE perimeter-proportional
shuffle and then embarrassingly parallel per tile.

Semantics: classic marching squares at iso-level L with the ">= L is
above" convention (so no zero-denominator interpolation is possible:
a crossing edge always has one corner >= L > other corner). Saddle cells
(cases 5/10) are resolved by the cell-center average — the same rule
gdal_contour's grid walker effectively applies. A cell participates only
when all four corners are in-raster and nodata-free. Output is the SEGMENT
SET in pixel-center grid coordinates (x = column + t, y = row + t), each
segment's endpoints ordered by edge id (T<R<B<L) — a deterministic,
orientation-free representation. Stitching segments into polylines is the
same shared-endpoint min-label propagation `operators/polygonize.py`
already ships for regions; gdal_contour's line orientation convention is a
documented divergence.

Hash-exact by construction: corner comparisons are exact, the only float
ops are one interpolation division per crossing plus integer additions —
identical IEEE expression trees in numpy and DuckDB — and the case table
below drives BOTH the kernel and the generated oracle SQL, so the
connection rules cannot drift apart.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .focal import halo_exchange, assemble_padded, grouped_tile_apply

# edge ids: 0=T (top), 1=R (right), 2=B (bottom), 3=L (left)
# case index = tl + 2*tr + 4*br + 8*bl (bit set = corner >= level)
# value: list of (edge_a, edge_b) segments, endpoints ordered by edge id;
# saddles (5, 10) are resolved at runtime by the center-average rule.
CASES: dict[int, list[tuple[int, int]]] = {
    0: [],
    1: [(0, 3)],
    2: [(0, 1)],
    3: [(1, 3)],
    4: [(1, 2)],
    # 5: saddle — center >= L: [(0,1),(2,3)]; else [(0,3),(1,2)]
    6: [(0, 2)],
    7: [(2, 3)],
    8: [(2, 3)],
    9: [(0, 2)],
    # 10: saddle — center >= L: [(0,3),(1,2)]; else [(0,1),(2,3)]
    11: [(1, 2)],
    12: [(1, 3)],
    13: [(0, 1)],
    14: [(0, 3)],
    15: [],
}
SADDLE_HI = {5: [(0, 1), (2, 3)], 10: [(0, 3), (1, 2)]}
SADDLE_LO = {5: [(0, 3), (1, 2)], 10: [(0, 1), (2, 3)]}

_SEG_T = T.StructType(
    [
        T.StructField("raster_id", T.StringType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("level", T.DoubleType()),
        T.StructField("gx", T.LongType()),
        T.StructField("gy", T.LongType()),
        T.StructField("seg", T.IntegerType()),
        T.StructField("x1", T.DoubleType()),
        T.StructField("y1", T.DoubleType()),
        T.StructField("x2", T.DoubleType()),
        T.StructField("y2", T.DoubleType()),
    ]
)


def _edge_points(edge, level, j, i, v00, v01, v10, v11):
    """Grid-space (x, y) of the level crossing on `edge` of cells at
    (row i, col j) — vectorized over numpy arrays."""
    if edge == 0:  # top: between v00 and v01
        return j + (level - v00) / (v01 - v00), i.astype(np.float64)
    if edge == 1:  # right: between v01 and v11
        return (j + 1).astype(np.float64), i + (level - v01) / (v11 - v01)
    if edge == 2:  # bottom: between v10 and v11
        return j + (level - v10) / (v11 - v10), (i + 1).astype(np.float64)
    return j.astype(np.float64), i + (level - v00) / (v10 - v00)  # left


def _march_tile(c, pad, lvls, tile_size: int) -> pd.DataFrame:
    """Marching-squares over one assembled tile -> segment rows plus the
    level INDEX (`lvl_ix`) — shared by the plain segment kernel and the
    local-stitch kernel so the two paths cannot drift."""
    w, h = int(c.bw), int(c.bh)
    nodata = float(c.nodata)
    valid = (~np.isnan(pad)) & (pad != nodata)
    # cell corners for cells whose top-left pixel is a core pixel:
    # padded rows 1..1+h, cols 1..1+w
    v00 = pad[1 : 1 + h, 1 : 1 + w]
    v01 = pad[1 : 1 + h, 2 : 2 + w]
    v10 = pad[2 : 2 + h, 1 : 1 + w]
    v11 = pad[2 : 2 + h, 2 : 2 + w]
    ok = (
        valid[1 : 1 + h, 1 : 1 + w]
        & valid[1 : 1 + h, 2 : 2 + w]
        & valid[2 : 2 + h, 1 : 1 + w]
        & valid[2 : 2 + h, 2 : 2 + w]
    )
    ii, jj = np.mgrid[0:h, 0:w]
    gx0 = int(c.tile_x) * tile_size
    gy0 = int(c.tile_y) * tile_size
    # accumulate numpy columns and build ONE frame per tile at the end:
    # the former one-DataFrame-per-(level, case, seg) append list spent
    # more time constructing pandas objects than marching
    acc: list[tuple] = []
    for lv_ix, lv in enumerate(lvls):
        case = (
            (v00 >= lv).astype(np.int8)
            + 2 * (v01 >= lv).astype(np.int8)
            + 4 * (v11 >= lv).astype(np.int8)
            + 8 * (v10 >= lv).astype(np.int8)
        )
        center_hi = (v00 + v01 + v10 + v11) / 4.0 >= lv
        for cs in range(1, 15):
            if cs in (5, 10):
                variants = [
                    (ok & (case == cs) & center_hi, SADDLE_HI[cs]),
                    (ok & (case == cs) & ~center_hi, SADDLE_LO[cs]),
                ]
            else:
                variants = [(ok & (case == cs), CASES[cs])]
            for mask, segs in variants:
                idx = np.flatnonzero(mask.ravel())
                if len(idx) == 0:
                    continue
                # GLOBAL integer coords BEFORE interpolation: x = gx + t
                # must associate exactly like the oracle's gx + t (a
                # post-hoc tile-offset add would round differently)
                i = (gy0 + ii.ravel()[idx]).astype(np.int64)
                j = (gx0 + jj.ravel()[idx]).astype(np.int64)
                args = (
                    np.float64(lv), j, i,
                    v00.ravel()[idx], v01.ravel()[idx],
                    v10.ravel()[idx], v11.ravel()[idx],
                )
                for k, (ea, eb) in enumerate(segs):
                    x1, y1 = _edge_points(ea, *args)
                    x2, y2 = _edge_points(eb, *args)
                    acc.append((lv, lv_ix, j, i, k, x1, y1, x2, y2))
    cols = ["raster_id", "band", "level", "lvl_ix", "gx", "gy", "seg",
            "x1", "y1", "x2", "y2"]
    if not acc:
        return pd.DataFrame(columns=cols)
    n_per = [len(a[2]) for a in acc]
    return pd.DataFrame(
        {
            "raster_id": c.raster_id,
            "band": int(c.band),
            "level": np.repeat([a[0] for a in acc], n_per),
            "lvl_ix": np.repeat([a[1] for a in acc], n_per).astype(np.int32),
            "gx": np.concatenate([a[2] for a in acc]),
            "gy": np.concatenate([a[3] for a in acc]),
            "seg": np.repeat([a[4] for a in acc], n_per).astype(np.int32),
            "x1": np.concatenate([a[5] for a in acc]),
            "y1": np.concatenate([a[6] for a in acc]),
            "x2": np.concatenate([a[7] for a in acc]),
            "y2": np.concatenate([a[8] for a in acc]),
        }
    )[cols]


def contour_segments(
    tiles: DataFrame, levels: list[float], tile_size: int = 32
) -> DataFrame:
    """Marching-squares segments for each iso-level ->
    (raster_id, band, level, gx, gy, seg, x1, y1, x2, y2) where (gx, gy)
    is the owning 2x2 cell (its top-left pixel) in global pixel coords and
    (x*, y*) are grid-space crossings."""
    lvls = [float(v) for v in levels]
    halos = halo_exchange(tiles, radius=1)
    seg_cols = [f.name for f in _SEG_T.fields]

    def march(key, pdf: pd.DataFrame) -> pd.DataFrame:
        got = assemble_padded(pdf, 1)
        if got is None:
            return pd.DataFrame(columns=seg_cols)
        c, pad = got
        return _march_tile(c, pad, lvls, tile_size)[seg_cols]

    return grouped_tile_apply(halos, march, _SEG_T)


def _segment_node_id(levels: list[float]):
    """Globally-unique, oracle-reproducible node id for a segment: the
    level's INDEX (never its float formatting), zero-padded global cell
    coords (lexicographic == numeric for coords < 10^7) and the slot.
    Both engines build the identical string, so component mins agree."""
    lvl_idx = F.col("level")
    for k, lv in enumerate(levels):
        lvl_idx = F.when(F.col("level") == F.lit(float(lv)), F.lit(k)).otherwise(lvl_idx)
    return F.concat_ws(
        ":",
        F.col("raster_id"),
        F.col("band").cast("string"),
        lvl_idx.cast("int").cast("string"),
        F.lpad(F.col("gy").cast("string"), 7, "0"),
        F.lpad(F.col("gx").cast("string"), 7, "0"),
        F.col("seg").cast("string"),
    )


_LOCAL_T = T.StructType(
    [
        T.StructField("kind", T.StringType()),  # 's' segment / 'p' border point
        T.StructField("raster_id", T.StringType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("level", T.DoubleType()),
        T.StructField("gx", T.LongType()),
        T.StructField("gy", T.LongType()),
        T.StructField("seg", T.IntegerType()),
        T.StructField("x1", T.DoubleType()),
        T.StructField("y1", T.DoubleType()),
        T.StructField("x2", T.DoubleType()),
        T.StructField("y2", T.DoubleType()),
        T.StructField("chain", T.StringType()),  # local chain label (min seg id)
        T.StructField("id", T.StringType()),  # segment id at a border point
        T.StructField("px", T.DoubleType()),  # border-point coords ('p' rows)
        T.StructField("py", T.DoubleType()),
    ]
)


def contour_lines(
    tiles: DataFrame, levels: list[float], tile_size: int = 32
) -> DataFrame:
    """:func:`contour_segments` plus a stitched ``line_id``: segments
    sharing an endpoint get the same id (the min segment id reachable
    through shared endpoints — a polyline/loop, since marching-squares
    endpoint degree is always <= 2).

    Distributed shape (the polygonize discipline, `polygonize.py`): each
    tile stitches its own segments into CHAINS with a local union-find
    (endpoints are EXACT doubles — adjacent cells compute the shared
    crossing from the same two pixels with the same IEEE expression), so
    only chains whose endpoints sit ON a tile-boundary grid line (x or y
    ≡ 0 mod tile_size — a segment endpoint can be shared across tiles only
    there) enter the global stage: one groupBy over exported border points
    -> chain-chain edges -> `graph.min_label_components` over border
    chains only. Labels entering the loop drop from all segments to
    border-crossing chains (perimeter-scale), and interior chains skip the
    iterative stage entirely. Chain labels are min segment ids, so the
    component min equals the min segment id of the whole polyline — the
    oracle's recursive-CTE answer. gdal_contour's line orientation /
    vertex-order convention is a documented divergence: this emits the
    segment set + line ids."""
    from .graph import _ensure_checkpoint_dir, min_label_components

    spark = tiles.sparkSession
    lvls = [float(v) for v in levels]
    halos = halo_exchange(tiles, radius=1)
    local_cols = [f.name for f in _LOCAL_T.fields]

    def stitch(key, pdf: pd.DataFrame) -> pd.DataFrame:
        got = assemble_padded(pdf, 1)
        if got is None:
            return pd.DataFrame(columns=local_cols)
        segs = _march_tile(got[0], got[1], lvls, tile_size)
        n = len(segs)
        if n == 0:
            return pd.DataFrame(columns=local_cols)
        # the oracle-visible node id (must match _segment_node_id exactly)
        ids = (
            segs["raster_id"]
            + ":" + segs["band"].astype(str)
            + ":" + segs["lvl_ix"].astype(str)
            + ":" + segs["gy"].astype(str).str.zfill(7)
            + ":" + segs["gx"].astype(str).str.zfill(7)
            + ":" + segs["seg"].astype(str)
        ).to_numpy()
        # group endpoints by exact point; the adjacency rule is the
        # oracle's: ONE edge per point, (min seg id, max seg id) — NOT
        # all-pairs (a corner-hit crossing can put >2 segments on a point)
        parent = np.arange(n)

        def find(a: int) -> int:
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        lvl_ix = segs["lvl_ix"].to_numpy()
        exs = (segs["x1"].to_numpy(), segs["x2"].to_numpy())
        eys = (segs["y1"].to_numpy(), segs["y2"].to_numpy())
        at_point: dict[tuple, list[int]] = {}
        for xs, ys in zip(exs, eys):
            for s in range(n):
                at_point.setdefault(
                    (int(lvl_ix[s]), float(xs[s]), float(ys[s])), []
                ).append(s)
        border_pts: list[tuple] = []  # (lvl_ix, x, y, seg_index)
        for (li, x, y), members in at_point.items():
            # a point can be shared across tiles only on a tile-boundary
            # grid line (x or y ≡ 0 mod tile_size); those defer to the
            # global stage so the min/max runs over ALL tiles' segments
            if x % tile_size == 0 or y % tile_size == 0:
                for s in members:
                    border_pts.append((li, x, y, s))
                continue
            if len(members) < 2:
                continue
            lo = min(members, key=lambda s: ids[s])
            hi = max(members, key=lambda s: ids[s])
            if ids[lo] != ids[hi]:
                ra, rb = find(lo), find(hi)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        roots = np.array([find(s) for s in range(n)])
        # chain label = min segment id within the local chain
        chain = pd.Series(ids).groupby(roots).transform("min").to_numpy()
        seg_rows = segs.assign(kind="s", chain=chain, id=ids, px=np.nan, py=np.nan)
        frames = [seg_rows]
        if border_pts:
            sidx = np.array([s for (_, _, _, s) in border_pts])
            frames.append(
                pd.DataFrame(
                    {
                        "kind": "p",
                        "raster_id": segs["raster_id"].to_numpy()[sidx],
                        "band": segs["band"].to_numpy()[sidx],
                        "level": segs["level"].to_numpy()[sidx],
                        "chain": chain[sidx],
                        "id": ids[sidx],
                        "px": np.array([x for (_, x, _, _) in border_pts]),
                        "py": np.array([y for (_, _, y, _) in border_pts]),
                    }
                )
            )
        out = pd.concat(frames, ignore_index=True)
        for col in local_cols:
            if col not in out.columns:
                out[col] = None
        return out[local_cols]

    _ensure_checkpoint_dir(spark)
    # eager reliable checkpoint: the table feeds segments, border points,
    # and the final join — without it the marching kernel re-runs per
    # consumer and per propagation round
    local = grouped_tile_apply(halos, stitch, _LOCAL_T).checkpoint(eager=True)
    segs = local.filter(F.col("kind") == "s").select(
        "raster_id", "band", "level", "gx", "gy", "seg",
        "x1", "y1", "x2", "y2", "chain",
    )
    pts = local.filter(F.col("kind") == "p").select(
        "raster_id", "band", "level", "px", "py", "chain", "id"
    )
    # the oracle's adjacency rule at a shared point: one edge between the
    # min- and max-ID SEGMENTS there, mapped onto their chains
    edges = (
        pts.groupBy("raster_id", "band", "level", "px", "py")
        .agg(
            F.min_by("chain", "id").alias("l_id"),
            F.max_by("chain", "id").alias("r_id"),
            F.min("id").alias("__lo"),
            F.max("id").alias("__hi"),
        )
        .where((F.col("__lo") != F.col("__hi")) & (F.col("l_id") != F.col("r_id")))
        .select("l_id", "r_id")
    )
    # propagate ONLY over chains that actually cross a tile border; the
    # interior majority keep their local label and skip the loop
    endpoints = (
        edges.select(F.col("l_id").alias("id"))
        .unionByName(edges.select(F.col("r_id").alias("id")))
        .distinct()
    )
    comps = min_label_components(spark, endpoints, edges, id_col="id")
    return segs.join(comps, segs["chain"] == comps["id"], "left").select(
        "raster_id", "band", "level", "gx", "gy", "seg",
        "x1", "y1", "x2", "y2",
        F.coalesce(F.col("component"), F.col("chain")).alias("line_id"),
    )


def contour_lines_oracle_sql(
    tiles_rel: str, levels: list[float], tile_size: int = 32
) -> str:
    """DuckDB oracle for :func:`contour_lines`: the segment arms wrapped in
    the same node-id construction, endpoint adjacency, and a recursive-CTE
    min-label walk (the same pattern as the polygonize oracle)."""
    ctes, body = _contour_sql_parts(tiles_rel, levels, tile_size=tile_size)
    # level -> index CASE, mirroring _segment_node_id
    idx = "0"
    for k, lv in enumerate(levels):
        idx = f"CASE WHEN level = {float(lv)!r} THEN {k} ELSE {idx} END"
    return f"""
WITH RECURSIVE {ctes},
raw AS (
{body}
),
seg AS (
  SELECT *,
         raster_id || ':' || CAST(band AS VARCHAR) || ':'
           || CAST({idx} AS VARCHAR) || ':'
           || lpad(CAST(gy AS VARCHAR), 7, '0') || ':'
           || lpad(CAST(gx AS VARCHAR), 7, '0') || ':'
           || CAST(seg AS VARCHAR) AS id
  FROM raw
),
pts AS (
  SELECT raster_id, band, level, id, x1 AS x, y1 AS y FROM seg
  UNION ALL
  SELECT raster_id, band, level, id, x2 AS x, y2 AS y FROM seg
),
adj AS (
  SELECT min(id) AS l_id, max(id) AS r_id
  FROM pts GROUP BY raster_id, band, level, x, y
  HAVING min(id) != max(id)
),
sym AS (
  SELECT l_id, r_id FROM adj UNION ALL SELECT r_id, l_id FROM adj
),
cc AS (
  SELECT id, id AS label FROM seg
  UNION
  SELECT s.r_id, cc.label FROM cc JOIN sym s ON s.l_id = cc.id
),
comp AS (SELECT id, min(label) AS line_id FROM cc GROUP BY 1)
SELECT g.raster_id, g.band, g.level, g.gx, g.gy, g.seg,
       g.x1, g.y1, g.x2, g.y2, c.line_id
FROM seg g JOIN comp c ON c.id = g.id
"""


def _sql_edge(edge: int) -> tuple[str, str]:
    """(x_expr, y_expr) for a crossing on `edge` over oracle columns
    gx, gy, v00, v01, v10, v11, and the literal {lv}."""
    if edge == 0:
        return "gx + ({lv} - v00) / (v01 - v00)", "CAST(gy AS DOUBLE)"
    if edge == 1:
        return "CAST(gx + 1 AS DOUBLE)", "gy + ({lv} - v01) / (v11 - v01)"
    if edge == 2:
        return "gx + ({lv} - v10) / (v11 - v10)", "CAST(gy + 1 AS DOUBLE)"
    return "CAST(gx AS DOUBLE)", "gy + ({lv} - v00) / (v10 - v00)"


def _contour_sql_parts(
    tiles_rel: str, levels: list[float], tile_size: int = 32
) -> tuple[str, str]:
    """(ctes, body) for the contour oracle — kept separate so the lines
    oracle can hoist the CTEs to top level (DuckDB's WITH RECURSIVE
    parser mis-scopes a nested WITH whose body contains UNION ALL)."""
    cell = f"""
  SELECT a.raster_id, a.band, a.gx, a.gy,
         a.v AS v00, b.v AS v01, c.v AS v10, d.v AS v11
  FROM px a
  JOIN px b ON b.raster_id = a.raster_id AND b.band = a.band
           AND b.gx = a.gx + 1 AND b.gy = a.gy
  JOIN px c ON c.raster_id = a.raster_id AND c.band = a.band
           AND c.gx = a.gx AND c.gy = a.gy + 1
  JOIN px d ON d.raster_id = a.raster_id AND d.band = a.band
           AND d.gx = a.gx + 1 AND d.gy = a.gy + 1
"""
    arms = []
    for lv_ in levels:
        lv = repr(float(lv_))
        case_expr = (
            f"(CASE WHEN v00 >= {lv} THEN 1 ELSE 0 END"
            f" + CASE WHEN v01 >= {lv} THEN 2 ELSE 0 END"
            f" + CASE WHEN v11 >= {lv} THEN 4 ELSE 0 END"
            f" + CASE WHEN v10 >= {lv} THEN 8 ELSE 0 END)"
        )
        hi = f"(v00 + v01 + v10 + v11) / 4.0 >= {lv}"
        variants: list[tuple[str, dict[int, list[tuple[int, int]]]]] = [
            (f"{hi}", SADDLE_HI),
            (f"NOT ({hi})", SADDLE_LO),
        ]
        for k in range(2):  # segment slot
            base = {cs: segs for cs, segs in CASES.items() if len(segs) > k}
            for cond_extra, table in [("TRUE", base)] + [
                (cond, {cs: segs for cs, segs in tbl.items() if len(segs) > k})
                for cond, tbl in variants
            ]:
                for cs, segs in sorted(table.items()):
                    ea, eb = segs[k]
                    x1, y1 = (e.format(lv=lv) for e in _sql_edge(ea))
                    x2, y2 = (e.format(lv=lv) for e in _sql_edge(eb))
                    arms.append(
                        f"SELECT raster_id, band, CAST({lv} AS DOUBLE) AS level, gx, gy, "
                        f"{k} AS seg, {x1} AS x1, {y1} AS y1, {x2} AS x2, {y2} AS y2 "
                        f"FROM cells WHERE {case_expr} = {cs} AND {cond_extra}"
                    )
    body = "\nUNION ALL\n".join(arms)
    ctes = f"""px AS (
  SELECT raster_id, band,
         CAST(tile_x AS BIGINT) * {tile_size} + (idx - 1) % tile_w AS gx,
         CAST(tile_y AS BIGINT) * {tile_size} + (idx - 1) // tile_w AS gy,
         v
  FROM (
    SELECT raster_id, band, nodata, tile_x, tile_y, tile_w,
           generate_subscripts(pixels, 1) AS idx, unnest(pixels) AS v
    FROM {tiles_rel}
  )
  WHERE v != nodata
),
cells AS ({cell})"""
    return ctes, body


def contour_oracle_sql(tiles_rel: str, levels: list[float], tile_size: int = 32) -> str:
    """DuckDB oracle for :func:`contour_segments`, generated from the SAME
    case table: 2x2 corner self-joins, case classification, per-case
    segment arms UNION ALLed together."""
    ctes, body = _contour_sql_parts(tiles_rel, levels, tile_size=tile_size)
    return f"WITH {ctes}\n{body}\n"
