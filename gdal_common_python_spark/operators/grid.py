"""gdal_grid analog: scattered points -> raster via windowed average.

No reference analog (the reference's raster ops stop at zonal/mosaic).
Implements gdal_grid's ``average:radius`` metric with an order-free exact
semantic: every output pixel whose CENTER is within ``radius`` of >= 1
point gets the exact average of those points' values (values int64-
quantized at 2^20 before summing — integer sums are order-free — and ONE
correctly-rounded double division, the fillnodata discipline). Pixels
with no point in range emit no row (sparse, like rasterize/proximity).

100 TB shape — pure whole-stage codegen, zero Python, zero UDF:
each point natively explodes to the (2R/px)^2-bounded pixel window that
could contain it (a superset range; the exact d2 <= R^2 predicate — the
IDENTICAL IEEE expression both engines — decides membership), then ONE
map-side-combined groupBy(pixel) aggregates. Shuffle ∝ points × window
pixels, never the raster; no point ever compares against another point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_QBITS = 20
_QF = float(1 << _QBITS)


def grid_average(
    points: DataFrame,
    target: dict,
    radius: float,
    value_col: str = "v",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """(gc, gr, n_points, value) sparse grid of windowed point averages on
    `target` (origin_x, origin_y, px_x, px_y, width, height; px_y < 0)."""
    ox, oy = float(target["origin_x"]), float(target["origin_y"])
    px, py = float(target["px_x"]), float(target["px_y"])
    w, h = int(target["width"]), int(target["height"])
    if px <= 0 or py >= 0:
        raise ValueError("grid_average expects a north-up grid (px_x > 0, px_y < 0)")
    r = float(radius)
    if r <= 0:
        raise ValueError(f"radius must be > 0, got {radius}")
    x, y = F.col(x_col), F.col(y_col)
    # superset pixel ranges (loose by 1; the d2 predicate is exact)
    c0 = F.greatest(F.floor((x - r - F.lit(ox)) / F.lit(px)) - 1, F.lit(0)).cast("long")
    c1 = F.least(F.floor((x + r - F.lit(ox)) / F.lit(px)) + 1, F.lit(w - 1)).cast("long")
    r0 = F.greatest(F.floor((y + r - F.lit(oy)) / F.lit(py)) - 1, F.lit(0)).cast("long")
    r1 = F.least(F.floor((y - r - F.lit(oy)) / F.lit(py)) + 1, F.lit(h - 1)).cast("long")
    qv = F.floor(F.col(value_col) * F.lit(_QF) + F.lit(0.5)).cast("long")
    base = points.select(
        x.alias("__x"), y.alias("__y"), qv.alias("__qv"),
        c0.alias("__c0"), c1.alias("__c1"), r0.alias("__r0"), r1.alias("__r1"),
    ).where((F.col("__c0") <= F.col("__c1")) & (F.col("__r0") <= F.col("__r1")))
    fan = base.withColumn("gc", F.explode(F.sequence("__c0", "__c1"))).withColumn(
        "gr", F.explode(F.sequence("__r0", "__r1"))
    )
    cx = F.lit(ox) + (F.col("gc") + F.lit(0.5)) * F.lit(px)
    cy = F.lit(oy) + (F.col("gr") + F.lit(0.5)) * F.lit(py)
    d2 = (cx - F.col("__x")) * (cx - F.col("__x")) + (cy - F.col("__y")) * (cy - F.col("__y"))
    hits = fan.where(d2 <= F.lit(r * r))
    return hits.groupBy("gc", "gr").agg(
        F.count("*").alias("n_points"),
        (F.sum("__qv").cast("double") / (F.count("*").cast("double") * F.lit(_QF))).alias("value"),
    )


def grid_average_oracle_sql(
    points_rel: str,
    target: dict,
    radius: float,
    value_expr: str = "v",
    x_col: str = "x",
    y_col: str = "y",
) -> str:
    """DuckDB mirror: identical superset ranges, identical d2 predicate,
    identical quantized average."""
    ox, oy = float(target["origin_x"]), float(target["origin_y"])
    px, py = float(target["px_x"]), float(target["px_y"])
    w, h = int(target["width"]), int(target["height"])
    r = float(radius)
    return f"""
WITH pts AS (
  SELECT {x_col} AS x, {y_col} AS y,
         CAST(floor(({value_expr}) * {_QF!r} + 0.5) AS BIGINT) AS qv,
         greatest(floor((({x_col}) - {r!r} - {ox!r}) / {px!r}) - 1, 0) AS c0,
         least(floor((({x_col}) + {r!r} - {ox!r}) / {px!r}) + 1, {w - 1}) AS c1,
         greatest(floor((({y_col}) + {r!r} - {oy!r}) / {py!r}) - 1, 0) AS r0,
         least(floor((({y_col}) - {r!r} - {oy!r}) / {py!r}) + 1, {h - 1}) AS r1
  FROM {points_rel}
),
fan AS (
  SELECT p.x, p.y, p.qv, CAST(gc AS BIGINT) AS gc, CAST(gr AS BIGINT) AS gr
  FROM pts p,
       LATERAL unnest(range(CAST(p.c0 AS BIGINT), CAST(p.c1 AS BIGINT) + 1)) AS uc(gc),
       LATERAL unnest(range(CAST(p.r0 AS BIGINT), CAST(p.r1 AS BIGINT) + 1)) AS ur(gr)
  WHERE p.c0 <= p.c1 AND p.r0 <= p.r1
),
hits AS (
  SELECT * FROM fan
  WHERE (({ox!r} + (gc + 0.5) * {px!r}) - x) * (({ox!r} + (gc + 0.5) * {px!r}) - x)
      + (({oy!r} + (gr + 0.5) * {py!r}) - y) * (({oy!r} + (gr + 0.5) * {py!r}) - y)
     <= {r * r!r}
)
SELECT gc, gr, count(*) AS n_points,
       CAST(sum(qv) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * {_QF!r}) AS value
FROM hits GROUP BY gc, gr
"""


_WBITS = 10
_WF = float(1 << _WBITS)


def grid_idw(
    points: DataFrame,
    target: dict,
    radius: float,
    smoothing: float = 0.01,
    value_col: str = "v",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """gdal_grid ``invdist`` analog (power=2, with smoothing): per output
    pixel, the inverse-squared-distance weighted mean of the points within
    ``radius``:  w_i = 1 / (d2_i + smoothing^2).

    Float IDW sums are accumulation-order-dependent, so the engine pins a
    QUANTIZED-WEIGHT semantic (the repo's order-free discipline): both the
    weight and the value are quantized at 2^10 —

        qw = floor(2^10 / (d2 + s^2) + 0.5),  qv = floor(v * 2^10 + 0.5)
        value = (sum qw*qv) / (sum qw) / 2^10

    integer sums are order-free, and the two closing divisions are exact-
    integer-in-double + one power of two. The smoothing term (gdal_grid's
    own ``smoothing`` parameter) bounds the near-field weight, which both
    regularizes the interpolant AND keeps every sum far inside int64.
    Same plan shape as :func:`grid_average` — pure codegen, zero UDF, one
    map-side-combined pixel groupBy.

    Weight-cutoff contract: the quantization floors ``qw`` to 0 once
    ``d2 + s^2 > 2 * 2^_WBITS`` (= 2048 for the default _WBITS=10), i.e.
    points farther than ~sqrt(2048) ≈ 45.25 grid units contribute NOTHING
    even when inside ``radius``. For ``radius`` <= that cutoff the semantic
    matches gdal_grid invdist up to the pinned quantization; beyond it the
    far field is silently truncated, so a larger radius diverges from
    gdal_grid — a warning is raised when ``radius`` exceeds the cutoff.
    """
    ox, oy = float(target["origin_x"]), float(target["origin_y"])
    px, py = float(target["px_x"]), float(target["px_y"])
    w, h = int(target["width"]), int(target["height"])
    if px <= 0 or py >= 0:
        raise ValueError("grid_idw expects a north-up grid (px_x > 0, px_y < 0)")
    r = float(radius)
    if r <= 0:
        raise ValueError(f"radius must be > 0, got {radius}")
    s2 = float(smoothing) * float(smoothing)
    if s2 <= 0:
        raise ValueError("smoothing must be > 0 (it bounds the near-field weight)")
    cutoff = (2.0 * _WF - s2) ** 0.5  # qw floors to 0 past this distance
    if r > cutoff:
        import warnings

        warnings.warn(
            f"grid_idw radius={r} exceeds the quantized-weight cutoff "
            f"(~{cutoff:.2f} units for _WBITS={_WBITS}); points beyond the "
            "cutoff contribute zero weight, diverging from gdal_grid invdist",
            stacklevel=2,
        )
    x, y = F.col(x_col), F.col(y_col)
    c0 = F.greatest(F.floor((x - r - F.lit(ox)) / F.lit(px)) - 1, F.lit(0)).cast("long")
    c1 = F.least(F.floor((x + r - F.lit(ox)) / F.lit(px)) + 1, F.lit(w - 1)).cast("long")
    r0 = F.greatest(F.floor((y + r - F.lit(oy)) / F.lit(py)) - 1, F.lit(0)).cast("long")
    r1 = F.least(F.floor((y - r - F.lit(oy)) / F.lit(py)) + 1, F.lit(h - 1)).cast("long")
    qv = F.floor(F.col(value_col) * F.lit(_WF) + F.lit(0.5)).cast("long")
    base = points.select(
        x.alias("__x"), y.alias("__y"), qv.alias("__qv"),
        c0.alias("__c0"), c1.alias("__c1"), r0.alias("__r0"), r1.alias("__r1"),
    ).where((F.col("__c0") <= F.col("__c1")) & (F.col("__r0") <= F.col("__r1")))
    fan = base.withColumn("gc", F.explode(F.sequence("__c0", "__c1"))).withColumn(
        "gr", F.explode(F.sequence("__r0", "__r1"))
    )
    cx = F.lit(ox) + (F.col("gc") + F.lit(0.5)) * F.lit(px)
    cy = F.lit(oy) + (F.col("gr") + F.lit(0.5)) * F.lit(py)
    d2 = (cx - F.col("__x")) * (cx - F.col("__x")) + (cy - F.col("__y")) * (cy - F.col("__y"))
    qw = F.floor(F.lit(_WF) / (d2 + F.lit(s2)) + F.lit(0.5)).cast("long")
    hits = fan.where(d2 <= F.lit(r * r)).where(qw > 0)
    return hits.groupBy("gc", "gr").agg(
        F.count("*").alias("n_points"),
        (
            F.sum(qw * F.col("__qv")).cast("double")
            / F.sum(qw).cast("double")
            / F.lit(_WF)
        ).alias("value"),
    )


def grid_idw_oracle_sql(
    points_rel: str,
    target: dict,
    radius: float,
    smoothing: float = 0.01,
    value_expr: str = "v",
    x_col: str = "x",
    y_col: str = "y",
) -> str:
    """DuckDB mirror of :func:`grid_idw` — identical quantized trees."""
    ox, oy = float(target["origin_x"]), float(target["origin_y"])
    px, py = float(target["px_x"]), float(target["px_y"])
    w, h = int(target["width"]), int(target["height"])
    r = float(radius)
    s2 = float(smoothing) * float(smoothing)
    return f"""
WITH pts AS (
  SELECT {x_col} AS x, {y_col} AS y,
         CAST(floor(({value_expr}) * {_WF!r} + 0.5) AS BIGINT) AS qv,
         greatest(floor((({x_col}) - {r!r} - {ox!r}) / {px!r}) - 1, 0) AS c0,
         least(floor((({x_col}) + {r!r} - {ox!r}) / {px!r}) + 1, {w - 1}) AS c1,
         greatest(floor((({y_col}) + {r!r} - {oy!r}) / {py!r}) - 1, 0) AS r0,
         least(floor((({y_col}) - {r!r} - {oy!r}) / {py!r}) + 1, {h - 1}) AS r1
  FROM {points_rel}
),
fan AS (
  SELECT p.x, p.y, p.qv, CAST(gc AS BIGINT) AS gc, CAST(gr AS BIGINT) AS gr
  FROM pts p,
       LATERAL unnest(range(CAST(p.c0 AS BIGINT), CAST(p.c1 AS BIGINT) + 1)) AS uc(gc),
       LATERAL unnest(range(CAST(p.r0 AS BIGINT), CAST(p.r1 AS BIGINT) + 1)) AS ur(gr)
  WHERE p.c0 <= p.c1 AND p.r0 <= p.r1
),
hits AS (
  SELECT gc, gr, qv,
         CAST(floor({_WF!r} / (
             (({ox!r} + (gc + 0.5) * {px!r}) - x) * (({ox!r} + (gc + 0.5) * {px!r}) - x)
           + (({oy!r} + (gr + 0.5) * {py!r}) - y) * (({oy!r} + (gr + 0.5) * {py!r}) - y)
           + {s2!r}) + 0.5) AS BIGINT) AS qw
  FROM fan
  WHERE (({ox!r} + (gc + 0.5) * {px!r}) - x) * (({ox!r} + (gc + 0.5) * {px!r}) - x)
      + (({oy!r} + (gr + 0.5) * {py!r}) - y) * (({oy!r} + (gr + 0.5) * {py!r}) - y)
     <= {r * r!r}
)
SELECT gc, gr, count(*) AS n_points,
       CAST(CAST(sum(qw * qv) AS BIGINT) AS DOUBLE)
         / CAST(CAST(sum(qw) AS BIGINT) AS DOUBLE) / {_WF!r} AS value
FROM hits
WHERE qw > 0
GROUP BY gc, gr
"""


def grid_nearest(
    points: DataFrame,
    target: dict,
    radius: float,
    value_col: str = "v",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """gdal_grid ``nearest:radius`` analog: every output pixel whose CENTER
    is within ``radius`` of >= 1 point takes the value of the NEAREST
    point -> (gc, gr, n_points, d2, value); ``d2`` is the winning squared
    distance (exact — no sqrt ever runs), ``n_points`` the in-radius count.

    Ties are deterministic in both engines: the winner is the
    (d2, x, y, value)-lexicographic minimum, so coincident points and
    equidistant pairs resolve identically under any partitioning.

    Same 100 TB shape as :func:`grid_average` — each point natively
    explodes to its bounded candidate-pixel window, then ONE map-side-
    combined groupBy(pixel) arg-min; no point-vs-point comparison, no
    KD-tree, shuffle ∝ points × window pixels, never the raster.
    """
    ox, oy = float(target["origin_x"]), float(target["origin_y"])
    px, py = float(target["px_x"]), float(target["px_y"])
    w, h = int(target["width"]), int(target["height"])
    if px <= 0 or py >= 0:
        raise ValueError("grid_nearest expects a north-up grid (px_x > 0, px_y < 0)")
    r = float(radius)
    if r <= 0:
        raise ValueError(f"radius must be > 0, got {radius}")
    x, y = F.col(x_col), F.col(y_col)
    c0 = F.greatest(F.floor((x - r - F.lit(ox)) / F.lit(px)) - 1, F.lit(0)).cast("long")
    c1 = F.least(F.floor((x + r - F.lit(ox)) / F.lit(px)) + 1, F.lit(w - 1)).cast("long")
    r0 = F.greatest(F.floor((y + r - F.lit(oy)) / F.lit(py)) - 1, F.lit(0)).cast("long")
    r1 = F.least(F.floor((y - r - F.lit(oy)) / F.lit(py)) + 1, F.lit(h - 1)).cast("long")
    base = points.select(
        x.alias("__x"), y.alias("__y"), F.col(value_col).cast("double").alias("__v"),
        c0.alias("__c0"), c1.alias("__c1"), r0.alias("__r0"), r1.alias("__r1"),
    ).where((F.col("__c0") <= F.col("__c1")) & (F.col("__r0") <= F.col("__r1")))
    fan = base.withColumn("gc", F.explode(F.sequence("__c0", "__c1"))).withColumn(
        "gr", F.explode(F.sequence("__r0", "__r1"))
    )
    cx = F.lit(ox) + (F.col("gc") + F.lit(0.5)) * F.lit(px)
    cy = F.lit(oy) + (F.col("gr") + F.lit(0.5)) * F.lit(py)
    d2 = (cx - F.col("__x")) * (cx - F.col("__x")) + (cy - F.col("__y")) * (cy - F.col("__y"))
    hits = fan.withColumn("__d2", d2).where(F.col("__d2") <= F.lit(r * r))
    return hits.groupBy("gc", "gr").agg(
        F.count("*").alias("n_points"),
        F.min(
            F.struct(
                F.col("__d2").alias("d2"), F.col("__x").alias("x"),
                F.col("__y").alias("y"), F.col("__v").alias("v"),
            )
        ).alias("__b"),
    ).select(
        "gc", "gr", "n_points",
        F.col("__b.d2").alias("d2"), F.col("__b.v").alias("value"),
    )


def grid_nearest_oracle_sql(
    points_rel: str,
    target: dict,
    radius: float,
    value_expr: str = "v",
    x_col: str = "x",
    y_col: str = "y",
) -> str:
    """DuckDB mirror: identical superset ranges, identical d2 expression,
    identical (d2, x, y, value)-lexicographic arg-min."""
    ox, oy = float(target["origin_x"]), float(target["origin_y"])
    px, py = float(target["px_x"]), float(target["px_y"])
    w, h = int(target["width"]), int(target["height"])
    r = float(radius)
    return f"""
WITH pts AS (
  SELECT {x_col} AS x, {y_col} AS y, CAST({value_expr} AS DOUBLE) AS v,
         greatest(floor((({x_col}) - {r!r} - {ox!r}) / {px!r}) - 1, 0) AS c0,
         least(floor((({x_col}) + {r!r} - {ox!r}) / {px!r}) + 1, {w - 1}) AS c1,
         greatest(floor((({y_col}) + {r!r} - {oy!r}) / {py!r}) - 1, 0) AS r0,
         least(floor((({y_col}) - {r!r} - {oy!r}) / {py!r}) + 1, {h - 1}) AS r1
  FROM {points_rel}
),
fan AS (
  SELECT p.x, p.y, p.v, CAST(gc AS BIGINT) AS gc, CAST(gr AS BIGINT) AS gr
  FROM pts p,
       LATERAL unnest(range(CAST(p.c0 AS BIGINT), CAST(p.c1 AS BIGINT) + 1)) AS uc(gc),
       LATERAL unnest(range(CAST(p.r0 AS BIGINT), CAST(p.r1 AS BIGINT) + 1)) AS ur(gr)
  WHERE p.c0 <= p.c1 AND p.r0 <= p.r1
),
hits AS (
  SELECT *,
         (({ox!r} + (gc + 0.5) * {px!r}) - x) * (({ox!r} + (gc + 0.5) * {px!r}) - x)
       + (({oy!r} + (gr + 0.5) * {py!r}) - y) * (({oy!r} + (gr + 0.5) * {py!r}) - y) AS d2
  FROM fan
),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY gc, gr ORDER BY d2, x, y, v) AS rn,
         count(*) OVER (PARTITION BY gc, gr) AS n_points
  FROM hits WHERE d2 <= {r * r!r}
)
SELECT gc, gr, n_points, d2, v AS value
FROM rk WHERE rn = 1
"""


def grid_metrics(
    points: DataFrame,
    target: dict,
    radius: float,
    value_col: str = "v",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """gdal_grid "Data metrics" analog (count / minimum / maximum / range
    + average_distance): every output pixel whose CENTER is within
    ``radius`` of >= 1 point emits -> (gc, gr, n_points, vmin, vmax,
    vrange, avg_dist).

    Order-free exact by construction: count is integral; min/max of
    doubles are accumulation-order-free; ``avg_dist`` quantizes each
    point's distance sqrt(d2) (ONE correctly-rounded sqrt of the exact d2
    expression, identical in both engines) to int64 at 2^20 before the
    integer sum, then divides once — the same quantize-sum-divide
    discipline as :func:`grid_average`, so the DuckDB oracle hash-matches
    under any partitioning. ``vrange`` subtracts two exactly-agreed
    doubles.

    Same 100 TB shape as :func:`grid_average` — pure whole-stage codegen:
    each point natively explodes to its bounded candidate-pixel window,
    then ONE map-side-combined groupBy(pixel); shuffle ∝ points × window
    pixels, never the raster, and no point-vs-point comparison.
    """
    ox, oy = float(target["origin_x"]), float(target["origin_y"])
    px, py = float(target["px_x"]), float(target["px_y"])
    w, h = int(target["width"]), int(target["height"])
    if px <= 0 or py >= 0:
        raise ValueError("grid_metrics expects a north-up grid (px_x > 0, px_y < 0)")
    r = float(radius)
    if r <= 0:
        raise ValueError(f"radius must be > 0, got {radius}")
    x, y = F.col(x_col), F.col(y_col)
    c0 = F.greatest(F.floor((x - r - F.lit(ox)) / F.lit(px)) - 1, F.lit(0)).cast("long")
    c1 = F.least(F.floor((x + r - F.lit(ox)) / F.lit(px)) + 1, F.lit(w - 1)).cast("long")
    r0 = F.greatest(F.floor((y + r - F.lit(oy)) / F.lit(py)) - 1, F.lit(0)).cast("long")
    r1 = F.least(F.floor((y - r - F.lit(oy)) / F.lit(py)) + 1, F.lit(h - 1)).cast("long")
    base = points.select(
        x.alias("__x"), y.alias("__y"), F.col(value_col).cast("double").alias("__v"),
        c0.alias("__c0"), c1.alias("__c1"), r0.alias("__r0"), r1.alias("__r1"),
    ).where((F.col("__c0") <= F.col("__c1")) & (F.col("__r0") <= F.col("__r1")))
    fan = base.withColumn("gc", F.explode(F.sequence("__c0", "__c1"))).withColumn(
        "gr", F.explode(F.sequence("__r0", "__r1"))
    )
    cx = F.lit(ox) + (F.col("gc") + F.lit(0.5)) * F.lit(px)
    cy = F.lit(oy) + (F.col("gr") + F.lit(0.5)) * F.lit(py)
    d2 = (cx - F.col("__x")) * (cx - F.col("__x")) + (cy - F.col("__y")) * (cy - F.col("__y"))
    hits = fan.withColumn("__d2", d2).where(F.col("__d2") <= F.lit(r * r))
    qd = F.floor(F.sqrt(F.col("__d2")) * F.lit(_QF) + F.lit(0.5)).cast("long")
    return hits.groupBy("gc", "gr").agg(
        F.count("*").alias("n_points"),
        F.min("__v").alias("vmin"),
        F.max("__v").alias("vmax"),
        (F.max("__v") - F.min("__v")).alias("vrange"),
        (F.sum(qd).cast("double") / (F.count("*").cast("double") * F.lit(_QF))).alias("avg_dist"),
    )


def grid_metrics_oracle_sql(
    points_rel: str,
    target: dict,
    radius: float,
    value_expr: str = "v",
    x_col: str = "x",
    y_col: str = "y",
) -> str:
    """DuckDB mirror of :func:`grid_metrics`: identical superset ranges,
    identical d2 predicate, identical quantized-distance average."""
    ox, oy = float(target["origin_x"]), float(target["origin_y"])
    px, py = float(target["px_x"]), float(target["px_y"])
    w, h = int(target["width"]), int(target["height"])
    r = float(radius)
    return f"""
WITH pts AS (
  SELECT {x_col} AS x, {y_col} AS y, CAST({value_expr} AS DOUBLE) AS v,
         greatest(floor((({x_col}) - {r!r} - {ox!r}) / {px!r}) - 1, 0) AS c0,
         least(floor((({x_col}) + {r!r} - {ox!r}) / {px!r}) + 1, {w - 1}) AS c1,
         greatest(floor((({y_col}) + {r!r} - {oy!r}) / {py!r}) - 1, 0) AS r0,
         least(floor((({y_col}) - {r!r} - {oy!r}) / {py!r}) + 1, {h - 1}) AS r1
  FROM {points_rel}
),
fan AS (
  SELECT p.x, p.y, p.v, CAST(gc AS BIGINT) AS gc, CAST(gr AS BIGINT) AS gr
  FROM pts p,
       LATERAL unnest(range(CAST(p.c0 AS BIGINT), CAST(p.c1 AS BIGINT) + 1)) AS uc(gc),
       LATERAL unnest(range(CAST(p.r0 AS BIGINT), CAST(p.r1 AS BIGINT) + 1)) AS ur(gr)
  WHERE p.c0 <= p.c1 AND p.r0 <= p.r1
),
hits AS (
  SELECT *,
         (({ox!r} + (gc + 0.5) * {px!r}) - x) * (({ox!r} + (gc + 0.5) * {px!r}) - x)
       + (({oy!r} + (gr + 0.5) * {py!r}) - y) * (({oy!r} + (gr + 0.5) * {py!r}) - y) AS d2
  FROM fan
)
SELECT gc, gr, count(*) AS n_points,
       min(v) AS vmin, max(v) AS vmax, max(v) - min(v) AS vrange,
       CAST(sum(CAST(floor(sqrt(d2) * {_QF!r} + 0.5) AS BIGINT)) AS DOUBLE)
         / (CAST(count(*) AS DOUBLE) * {_QF!r}) AS avg_dist
FROM hits
WHERE d2 <= {r * r!r}
GROUP BY gc, gr
"""
