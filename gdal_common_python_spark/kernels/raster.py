"""Raster kernels: pixel coords, window snap, rasterize, masked extract, stats.

Exact-parity notes (reference = /root/reference):

- R1 pixel coordinate (rasters.py:101-116): ``int((c - origin) / ps)`` —
  truncation TOWARD ZERO, not floor. Differs from floor for coordinates
  left/above the origin. Replicated with ``np.trunc``.
- R2 window snap (lib/extract.py:134-195): replicated branch-for-branch,
  including the Python-modulo-with-negative-divisor y-snap
  (``ymax -= (oy - ymax) % psy`` at lib/extract.py:162, which moves ymax UP
  and generally OFF the grid — a reference quirk we keep), the
  ``ymin = origin`` assignment in the psy>0 branch (lib/extract.py:166 checks
  ymax but assigns ymin), the ``>`` (not ``>=``) bounds test
  (lib/extract.py:179), and the degenerate -> None returns.
- R3 rasterize (lib/conversionfeature.py:33-84): ring vertices are first
  quantized to integer pixel coords via R1 (lib/conversionfeature.py:67-76 —
  replicated exactly), then filled. The reference fills with PIL
  ``ImageDraw.polygon`` (outer=1, subsequent rings erase); PIL is not
  installed here, so this engine defines the fill as **pixel-center even-odd**
  over the quantized rings — the standard scanline convention, applied
  identically in the Spark kernel and the DuckDB oracle SQL, so the
  correctness gate is end-to-end consistent. (Documented divergence from PIL
  edge-inclusive outlines; FIXTURES.md golden masks are generated under this
  engine's convention.)
- R4 masked extract (lib/extract.py:98-131): keep pixel where mask>0 and not
  an ignored value — vectorized boolean masking.
- A6 stats (lib/zonal.py:175-239): population variance, and nearest-rank
  order statistics with the reference's exact index conventions:
  ``median = sorted[int(round(0.5 n)) - 1]`` (Python banker's rounding, and a
  NEGATIVE index for n == 1 — wraps to the last element) and
  ``perc90 = sorted[ceil(0.9 n) - 1]`` (lib/zonal.py:235,237). Empty input
  returns all-zeros (lib/zonal.py:201-208). Spark's percentile functions
  interpolate and would NOT match — never used here.
"""

from __future__ import annotations

import math

import numpy as np

from .geom import points_in_rings, rings_to_edges

__all__ = [
    "pixel_coordinate",
    "window_snap",
    "rasterize_mask",
    "masked_values",
    "stats",
    "median_index",
    "perc90_index",
]


def pixel_coordinate(cx, cy, origin_x, origin_y, px_x, px_y):
    """R1: world -> integer pixel coords, truncation toward zero
    (rasters.py:113-116)."""
    ix = np.trunc((np.asarray(cx, dtype=np.float64) - origin_x) / px_x).astype(np.int64)
    iy = np.trunc((np.asarray(cy, dtype=np.float64) - origin_y) / px_y).astype(np.int64)
    return ix, iy


def _pymod(a, b):
    """Python-style modulo (sign of divisor) for floats, vectorizable:
    ``a - floor(a/b) * b`` — the same expression the oracle SQL uses."""
    return a - np.floor(a / b) * b


def window_snap(xmin, ymin, xmax, ymax, origin_x, origin_y, px_x, px_y, width, height):
    """R2: bbox -> snapped raster window (lib/extract.py:134-195), scalar.

    Returns (win_ox, win_oy, res_x, res_y, off_x, off_y) or None.
    """
    # x: crop to origin or snap down to grid (lib/extract.py:151-154)
    if xmin < origin_x:
        xmin = origin_x
    else:
        xmin -= _pymod(xmin - origin_x, px_x)
    xoffset = int((xmin - origin_x) / px_x)
    if px_y < 0:
        # north-up: crop ymax to origin or apply the off-grid up-snap quirk
        # (lib/extract.py:158-163)
        if ymax > origin_y:
            ymax = origin_y
        else:
            ymax -= _pymod(origin_y - ymax, px_y)
        yoffset = int((ymax - origin_y) / px_y)
    else:
        # south-up branch: the reference checks ymax but assigns ymin
        # (lib/extract.py:165-169) — replicated
        if ymax < origin_y:
            ymin = origin_y
        else:
            ymin -= _pymod(ymin - origin_y, px_y)
        yoffset = int((ymin - origin_y) / px_y)
    res_x = int((xmax - xmin) / px_x)
    res_y = int((ymax - ymin) / px_y)
    if px_y < 0:
        res_y = -res_y
    # strictly-greater bounds test (lib/extract.py:179)
    if xoffset > width or yoffset > height:
        return None
    if xoffset + res_x > width:
        res_x = width - xoffset
    if yoffset + res_y > height:
        res_y = height - yoffset
    if res_x <= 0 or res_y <= 0:
        return None
    win_oy = ymax if px_y < 0 else ymin
    return (xmin, win_oy, res_x, res_y, xoffset, yoffset)


def window_snap_batch(bboxes: np.ndarray, origin_x, origin_y, px_x, px_y, width, height) -> np.ndarray:
    """Vectorized R2 over an (N,4) bbox array -> (N,6) float array with NaN
    rows for degenerate windows. Same arithmetic as :func:`window_snap`."""
    xmin = bboxes[:, 0].astype(np.float64).copy()
    ymin = bboxes[:, 1].astype(np.float64).copy()
    xmax = bboxes[:, 2].astype(np.float64)
    ymax = bboxes[:, 3].astype(np.float64).copy()

    below = xmin < origin_x
    xmin = np.where(below, origin_x, xmin - _pymod(xmin - origin_x, px_x))
    xoff = np.trunc((xmin - origin_x) / px_x)
    if px_y < 0:
        above = ymax > origin_y
        ymax = np.where(above, origin_y, ymax - _pymod(origin_y - ymax, px_y))
        yoff = np.trunc((ymax - origin_y) / px_y)
    else:
        low = ymax < origin_y
        ymin = np.where(low, origin_y, ymin - _pymod(ymin - origin_y, px_y))
        yoff = np.trunc((ymin - origin_y) / px_y)
    res_x = np.trunc((xmax - xmin) / px_x)
    res_y = np.trunc((ymax - ymin) / px_y)
    if px_y < 0:
        res_y = -res_y
    res_x = np.where(xoff + res_x > width, width - xoff, res_x)
    res_y = np.where(yoff + res_y > height, height - yoff, res_y)
    ok = (xoff <= width) & (yoff <= height) & (res_x > 0) & (res_y > 0)
    win_oy = ymax if px_y < 0 else ymin
    out = np.column_stack([xmin, win_oy, res_x, res_y, xoff, yoff])
    out[~ok] = np.nan
    return out


def rasterize_mask(rings, win_origin_x, win_origin_y, px_x, px_y, res_x, res_y) -> np.ndarray:
    """R3: rings (world coords) -> (res_y, res_x) uint8 presence mask.

    Vertices quantized via R1 against the WINDOW origin
    (lib/conversionfeature.py:67-76), then pixel-center even-odd fill over the
    flat ring list (outers + holes in one pass — equivalent to the
    reference's fill-then-erase for non-overlapping parts).
    """
    if res_x <= 0 or res_y <= 0:
        return np.zeros((max(res_y, 0), max(res_x, 0)), dtype=np.uint8)
    qrings = []
    for r in rings:
        r = np.asarray(r, dtype=np.float64)
        ix, iy = pixel_coordinate(r[:, 0], r[:, 1], win_origin_x, win_origin_y, px_x, px_y)
        qrings.append(np.column_stack([ix, iy]).astype(np.float64))
    edges = rings_to_edges(qrings)
    cols, rows = np.meshgrid(np.arange(res_x), np.arange(res_y))
    cx = cols.ravel() + 0.5
    cy = rows.ravel() + 0.5
    inside = points_in_rings(cx, cy, edges)
    return inside.reshape(res_y, res_x).astype(np.uint8)


def quantize_rings(rings, win_origin_x, win_origin_y, px_x, px_y) -> list[np.ndarray]:
    """Ring vertices -> integer window-pixel coords via R1
    (lib/conversionfeature.py:67-76), kept as float64 arrays for the PIP
    kernel. Shared by full-window and sub-window rasterization."""
    out = []
    for r in rings:
        r = np.asarray(r, dtype=np.float64)
        ix, iy = pixel_coordinate(r[:, 0], r[:, 1], win_origin_x, win_origin_y, px_x, px_y)
        out.append(np.column_stack([ix, iy]).astype(np.float64))
    return out


def mask_subwindow(qrings_edges: np.ndarray, col0: int, col1: int, row0: int, row1: int) -> np.ndarray:
    """Pixel-center even-odd mask for window-local pixel columns
    [col0, col1) x rows [row0, row1) against pre-quantized ring edges.
    Lets the distributed zonal kernel evaluate only the slice of the window
    that falls on one tile (no full-window materialization per tile)."""
    w, h = col1 - col0, row1 - row0
    if w <= 0 or h <= 0:
        return np.zeros((max(h, 0), max(w, 0)), dtype=bool)
    cols, rows = np.meshgrid(np.arange(col0, col1), np.arange(row0, row1))
    inside = points_in_rings(cols.ravel() + 0.5, rows.ravel() + 0.5, qrings_edges)
    return inside.reshape(h, w)


def masked_values(pixels: np.ndarray, mask: np.ndarray, ignore_values=None) -> np.ndarray:
    """R4: keep pixels where mask>0, excluding ignored values
    (lib/extract.py:120-131). `ignore_values` is a list or a vectorized
    callable returning a boolean keep-out mask."""
    sel = np.asarray(mask) > 0
    vals = np.asarray(pixels)[sel]
    if ignore_values is None:
        return vals
    if callable(ignore_values):
        return vals[~ignore_values(vals)]
    return vals[~np.isin(vals, np.asarray(ignore_values, dtype=vals.dtype))]


def median_index(n: int) -> int:
    """0-based index for the reference median (lib/zonal.py:235):
    ``int(round(0.5*n)) - 1`` with Python banker's rounding; may be -1
    (n == 1) which Python wraps to the last element — normalized here."""
    idx = int(_round_half_even(0.5 * n)) - 1
    return idx % n


def perc90_index(n: int) -> int:
    """0-based index for the reference perc90 (lib/zonal.py:237)."""
    return int(math.ceil(0.9 * n)) - 1


def _round_half_even(x: float) -> float:
    f = math.floor(x)
    diff = x - f
    if diff > 0.5:
        return f + 1
    if diff < 0.5:
        return f
    return f if f % 2 == 0 else f + 1


def stats(values: np.ndarray) -> dict:
    """A6 statistics kernel (lib/zonal.py:175-239), vectorized.

    Empty input -> all zeros (lib/zonal.py:201-208). Mean is the
    sum-of-(v/n) form (lib/zonal.py:213-215); variance is population
    (lib/zonal.py:219-222); median/perc90 are nearest-rank with the exact
    reference index conventions.
    """
    keys = ("min", "max", "mean", "median", "var", "stdev", "perc90")
    v = np.asarray(values, dtype=np.float64)
    n = len(v)
    if n == 0:
        return {k: 0.0 for k in keys}
    mean = float(np.sum(v / n))
    var = float(np.sum((v - mean) ** 2 / n))
    s = np.sort(v)
    return {
        "min": float(s[0]),
        "max": float(s[-1]),
        "mean": mean,
        "median": float(s[median_index(n)]),
        "var": var,
        "stdev": var**0.5,
        "perc90": float(s[perc90_index(n)]),
    }
