"""rgb2pct analog — median-cut color quantization over the tile tables.

The GDAL utility family the engine mirrors includes rgb2pct.py: compute an
<=2^L-color pseudo-color table from an RGB raster (GDAL: ComputeMedianCutPCT)
and map every pixel to a palette entry. Engine semantics are the
LEVEL-SYNCHRONOUS balanced median cut — deterministic and integer-exact, so
both engines agree bit-for-bit:

  start: every color in box 0
  per level (L levels -> up to 2^L boxes): EVERY box splits on its widest
  channel (range = max-min; ties r > g > b) at the weighted median of that
  channel — the smallest channel value v with cumulative pixel count >=
  ceil(total/2); colors with value <= v go to the left child
  palette entry per box: round-half-up weighted mean per channel, computed
  as (2*sum(ch*cnt) + tot) div (2*tot) — pure int64, no float anywhere

Divergence from the GDAL utility (documented): GDAL splits boxes one at a
time in pixel-count order and Floyd-Steinberg-dithers the assignment;
error-diffusion dithering is inherently sequential (each pixel's error
feeds its neighbors) and does not distribute, so the engine assigns each
color to its own box's palette entry instead.

Scale shape: every step runs on the DISTINCT-COLOR histogram, which is
bounded by 2^24 regardless of raster size — the only full-data pass is the
initial groupBy(r,g,b).count() (map-side combined; shuffle ∝ distinct
colors, never pixels). Each level is two histogram-sized exchanges (a
per-box aggregate + a per-box cumulative window); L is 4-8 in practice.
The per-pixel assignment joins the bounded color->box map back broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def rgb_pixels(tiles: DataFrame, r, g, b) -> DataFrame:
    """Assemble per-pixel (tile_x, tile_y, idx, r, g, b) from three
    (raster_id, band) selections sharing one grid. Pixels with nodata in
    ANY channel are dropped (rgb2pct has no nodata concept; the engine
    excludes them from both palette and assignment). idx is the 1-based
    row-major in-tile position — the shared gate convention."""

    def chan(sel, name):
        rid, band = sel
        return tiles.filter(
            (F.col("raster_id") == rid) & (F.col("band") == int(band))
        ).select(
            "tile_x",
            "tile_y",
            "nodata",
            F.posexplode("pixels").alias("idx0", name),
        ).select(
            "tile_x",
            "tile_y",
            (F.col("idx0") + 1).alias("idx"),
            F.when(F.col(name) == F.col("nodata"), None)
            .otherwise(F.col(name).cast("long"))
            .alias(name),
        )

    out = (
        chan(r, "r")
        .join(chan(g, "g"), ["tile_x", "tile_y", "idx"])
        .join(chan(b, "b"), ["tile_x", "tile_y", "idx"])
    )
    return out.filter(
        F.col("r").isNotNull() & F.col("g").isNotNull() & F.col("b").isNotNull()
    )


def median_cut_boxes(pixels: DataFrame, levels: int = 4) -> DataFrame:
    """Distinct-color histogram with its final median-cut ``box`` id
    (0 .. 2^levels-1; empty boxes simply don't appear). Input needs
    integer columns r, g, b — one row per PIXEL (weights come from the
    internal count)."""
    hist = (
        pixels.groupBy("r", "g", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("box", F.lit(0).cast("long"))
        # one full-data pass total; every level below is histogram-sized.
        # Eager localCheckpoint per level truncates lineage (same discipline
        # as operators/graph.py) — without it level k re-executes levels
        # 0..k-1 on every reference and the plan depth doubles per level.
        .localCheckpoint(eager=True)
    )
    for _ in range(int(levels)):
        # One exchange on box per level: per-box range/total and the widest
        # channel come from unbounded-frame window aggregates, the
        # weighted-median cumulative from a RANGE frame over the chosen
        # channel (RANGE sums ties together — exactly the weighted-median
        # rule). Fusing stats + median into one window pass halves the
        # per-level shuffle count vs a groupBy-and-join-back formulation.
        wb = Window.partitionBy("box")
        j = hist.select(
            "r",
            "g",
            "b",
            "cnt",
            "box",
            (F.max("r").over(wb) - F.min("r").over(wb)).alias("rr"),
            (F.max("g").over(wb) - F.min("g").over(wb)).alias("rg"),
            (F.max("b").over(wb) - F.min("b").over(wb)).alias("rb"),
            F.sum("cnt").over(wb).alias("tot"),
        ).withColumn(
            "cv",
            F.when(
                (F.col("rr") >= F.col("rg")) & (F.col("rr") >= F.col("rb")),
                F.col("r"),
            )
            .when(F.col("rg") >= F.col("rb"), F.col("g"))
            .otherwise(F.col("b")),
        )
        w = (
            Window.partitionBy("box")
            .orderBy("cv")
            .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        )
        j = j.withColumn("cum", F.sum("cnt").over(w))
        med = j.groupBy("box").agg(
            F.min(
                # ceil(tot/2) as integer — matches the oracle's (tot+1)//2
                F.when(F.col("cum") >= F.ceil(F.col("tot") / 2), F.col("cv"))
            ).alias("med")
        )
        hist = (
            j.join(F.broadcast(med), "box")
            .select(
                "r",
                "g",
                "b",
                "cnt",
                (
                    F.col("box") * 2
                    + F.when(F.col("cv") > F.col("med"), 1).otherwise(0)
                ).alias("box"),
            )
            .localCheckpoint(eager=True)
        )
    return hist


def median_cut_palette(
    pixels: DataFrame, levels: int = 4, hist: DataFrame | None = None
) -> DataFrame:
    """Palette summary per box: (box, pr, pg, pb, n_colors, n_pixels) —
    pr/pg/pb the round-half-up weighted channel means as pure int64
    arithmetic ((2*sum + tot) div (2*tot)). Pass ``hist`` (a
    :func:`median_cut_boxes` result) to reuse an already-built histogram."""
    if hist is None:
        hist = median_cut_boxes(pixels, levels)
    tot = F.sum("cnt")
    return hist.groupBy("box").agg(
        F.expr("CAST((2*sum(r*cnt) + sum(cnt)) DIV (2*sum(cnt)) AS BIGINT)").alias("pr"),
        F.expr("CAST((2*sum(g*cnt) + sum(cnt)) DIV (2*sum(cnt)) AS BIGINT)").alias("pg"),
        F.expr("CAST((2*sum(b*cnt) + sum(cnt)) DIV (2*sum(cnt)) AS BIGINT)").alias("pb"),
        F.count(F.lit(1)).alias("n_colors"),
        tot.alias("n_pixels"),
    )


def rgb_to_pct(
    tiles: DataFrame,
    r,
    g,
    b,
    levels: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """Full rgb2pct: returns (palette, assigned) where ``assigned`` maps
    every valid pixel to its palette entry via a broadcast of the bounded
    color->box table: (tile_x, tile_y, idx, box)."""
    px = rgb_pixels(tiles, r, g, b)
    hist = median_cut_boxes(px, levels)
    palette = median_cut_palette(px, levels, hist=hist)
    cmap = hist.select("r", "g", "b", "box")
    assigned = px.join(F.broadcast(cmap), ["r", "g", "b"]).select(
        "tile_x", "tile_y", "idx", "box"
    )
    return palette, assigned


def pct_to_rgb(assigned: DataFrame, palette: DataFrame) -> DataFrame:
    """pct2pct's inverse utility (pct2rgb.py): expand palette indexes back to
    RGB channels — a broadcast join of the (<=2^L)-row palette onto the
    per-pixel assignment. Returns (tile_x, tile_y, idx, box, pr, pg, pb)."""
    return assigned.join(
        F.broadcast(palette.select("box", "pr", "pg", "pb")), "box"
    ).select("tile_x", "tile_y", "idx", "box", "pr", "pg", "pb")


def pct_tile_histogram(
    tiles: DataFrame, r, g, b, levels: int = 4
) -> DataFrame:
    """Round-trip gate shape: quantize (rgb2pct), expand (pct2rgb), then a
    compact per-(tile, box) rollup — (tile_x, tile_y, box, pr, pg, pb, n).
    Exercises the full palette→assignment→expansion chain while keeping the
    output tiles x boxes sized."""
    pal, assigned = rgb_to_pct(tiles, r, g, b, levels)
    rgb = pct_to_rgb(assigned, pal)
    return rgb.groupBy("tile_x", "tile_y", "box", "pr", "pg", "pb").agg(
        F.count(F.lit(1)).alias("n")
    )


def _mc_level_sql(k: int) -> str:
    """One unrolled median-cut level for the DuckDB oracle: h{k} -> h{k+1}
    with the identical integer rules (widest channel r>g>b ties, RANGE-frame
    cumulative counts, ceil-half median, <=-goes-left split)."""
    return f"""
s{k} AS (
  SELECT box, max(r)-min(r) AS rr, max(g)-min(g) AS rg, max(b)-min(b) AS rb,
         sum(cnt) AS tot
  FROM h{k} GROUP BY box
),
c{k} AS (
  SELECT box, tot,
         CASE WHEN rr >= rg AND rr >= rb THEN 'r'
              WHEN rg >= rb THEN 'g' ELSE 'b' END AS ch
  FROM s{k}
),
j{k} AS (
  SELECT h.r, h.g, h.b, h.cnt, h.box, c.tot,
         CASE c.ch WHEN 'r' THEN h.r WHEN 'g' THEN h.g ELSE h.b END AS cv
  FROM h{k} h JOIN c{k} c USING (box)
),
w{k} AS (
  SELECT *, sum(cnt) OVER (PARTITION BY box ORDER BY cv
                           RANGE UNBOUNDED PRECEDING) AS cum
  FROM j{k}
),
m{k} AS (
  SELECT box, min(CASE WHEN cum >= (tot + 1) // 2 THEN cv END) AS med
  FROM w{k} GROUP BY box
),
h{k + 1} AS (
  SELECT w.r, w.g, w.b, w.cnt,
         w.box * 2 + CASE WHEN w.cv > m.med THEN 1 ELSE 0 END AS box
  FROM w{k} w JOIN m{k} m USING (box)
)"""


def pct_tile_histogram_oracle_sql(
    tiles_rel: str,
    r,
    g,
    b,
    levels: int = 4,
) -> str:
    """DuckDB mirror of :func:`pct_tile_histogram`: the same unrolled
    median-cut chain, then palette means per box and the per-(tile, box)
    rollup through the color->box map."""

    def chan(sel, name):
        rid, band = sel
        return f"""
{name}px AS (
  SELECT tile_x, tile_y, idx,
         CAST(v AS BIGINT) AS {name}
  FROM (
    SELECT tile_x, tile_y, nodata,
           generate_subscripts(pixels, 1) AS idx, unnest(pixels) AS v
    FROM {tiles_rel} WHERE raster_id = '{rid}' AND band = {int(band)}
  ) WHERE v != nodata
)"""

    lvls = ",".join(_mc_level_sql(k) for k in range(int(levels)))
    L = int(levels)
    return f"""
WITH {chan(r, "r")}, {chan(g, "g")}, {chan(b, "b")},
px AS (
  SELECT r.tile_x, r.tile_y, r.idx, r.r, g.g, b.b
  FROM rpx r
  JOIN gpx g ON g.tile_x = r.tile_x AND g.tile_y = r.tile_y AND g.idx = r.idx
  JOIN bpx b ON b.tile_x = r.tile_x AND b.tile_y = r.tile_y AND b.idx = r.idx
),
h0 AS (
  SELECT r, g, b, CAST(count(*) AS BIGINT) AS cnt, CAST(0 AS BIGINT) AS box
  FROM px GROUP BY r, g, b
),{lvls},
pal AS (
  SELECT box,
         CAST((2*sum(r*cnt) + sum(cnt)) // (2*sum(cnt)) AS BIGINT) AS pr,
         CAST((2*sum(g*cnt) + sum(cnt)) // (2*sum(cnt)) AS BIGINT) AS pg,
         CAST((2*sum(b*cnt) + sum(cnt)) // (2*sum(cnt)) AS BIGINT) AS pb
  FROM h{L} GROUP BY box
)
SELECT px.tile_x, px.tile_y, m.box, pal.pr, pal.pg, pal.pb,
       CAST(count(*) AS BIGINT) AS n
FROM px
JOIN h{L} m ON m.r = px.r AND m.g = px.g AND m.b = px.b
JOIN pal ON pal.box = m.box
GROUP BY px.tile_x, px.tile_y, m.box, pal.pr, pal.pg, pal.pb
"""


def rgb_to_pct_oracle_sql(
    tiles_rel: str,
    r,
    g,
    b,
    levels: int = 4,
    tile_size: int = 32,
) -> str:
    """DuckDB mirror of :func:`median_cut_palette` over :func:`rgb_pixels`:
    per-channel pixel explode + 3-way position join, nodata-any drop, then
    ``levels`` unrolled median-cut blocks and the integer palette means."""

    def chan(sel, name):
        rid, band = sel
        return f"""
{name}px AS (
  SELECT tile_x, tile_y, idx,
         CAST(v AS BIGINT) AS {name}
  FROM (
    SELECT tile_x, tile_y, nodata,
           generate_subscripts(pixels, 1) AS idx, unnest(pixels) AS v
    FROM {tiles_rel} WHERE raster_id = '{rid}' AND band = {int(band)}
  ) WHERE v != nodata
)"""

    lvls = ",".join(_mc_level_sql(k) for k in range(int(levels)))
    return f"""
WITH {chan(r, "r")}, {chan(g, "g")}, {chan(b, "b")},
px AS (
  SELECT r.r, g.g, b.b
  FROM rpx r
  JOIN gpx g ON g.tile_x = r.tile_x AND g.tile_y = r.tile_y AND g.idx = r.idx
  JOIN bpx b ON b.tile_x = r.tile_x AND b.tile_y = r.tile_y AND b.idx = r.idx
),
h0 AS (
  SELECT r, g, b, CAST(count(*) AS BIGINT) AS cnt, CAST(0 AS BIGINT) AS box
  FROM px GROUP BY r, g, b
),{lvls}
SELECT box,
       CAST((2*sum(r*cnt) + sum(cnt)) // (2*sum(cnt)) AS BIGINT) AS pr,
       CAST((2*sum(g*cnt) + sum(cnt)) // (2*sum(cnt)) AS BIGINT) AS pg,
       CAST((2*sum(b*cnt) + sum(cnt)) // (2*sum(cnt)) AS BIGINT) AS pb,
       CAST(count(*) AS BIGINT) AS n_colors,
       CAST(sum(cnt) AS BIGINT) AS n_pixels
FROM h{int(levels)}
GROUP BY box
"""
