"""Vector-geometry kernels (pure numpy, no Spark, no GDAL).

Semantics notes (reference = /root/reference, read-only):

- Geometries are ring lists: ``rings = [ndarray (N,2), ...]``. Ring 0 and any
  ring with positive signed area is an outer ring (CCW); negative-area rings
  are holes (CW). Point-in-polygon uses the **even-odd** rule over the flat
  ring list, which composes outers + holes + disjoint multipolygon parts in
  one pass (parts must not overlap each other — the synth generator
  guarantees that, FIXTURES.md §2).
- The reference tests pairs with OGR ``Intersects`` (lib/join.py:52) and
  measures with ``geom.Area()/Length()`` (fields.py:407-416). We reproduce
  those semantics with the classical formulas below; parity is pinned by
  golden fixtures, not by linking GDAL (the reference has no tests and is not
  installable here — SURVEY.md §5.1).
- The PIP crossing test is kept **formula-identical** to the DuckDB oracle SQL
  used by the driver correctness gate:
      crosses = (y1 > py) != (y2 > py)
                AND px < (x2 - x1) * (py - y1) / (y2 - y1) + x1
  so Spark-side and oracle-side agree bit-for-bit on non-degenerate inputs.
"""

from __future__ import annotations

import re

import numpy as np

__all__ = [
    "parse_wkt",
    "rings_bbox",
    "rings_to_edges",
    "points_in_rings",
    "signed_area",
    "ring_length",
    "polygon_area",
    "polygon_perimeter",
    "segments_intersect",
    "polygon_intersects",
    "geom_distance",
    "buffer_point",
    "buffer_rings",
    "clip_convex",
    "clip_general",
    "difference_general",
    "union_pieces",
    "repair_ring",
    "make_valid_rings",
    "decompose_convex",
    "decompose_parts",
    "triangulate_ring",
    "split_outers_holes",
    "normalize_rings",
]

_WKT_POINT = re.compile(r"^\s*POINT\s*\(\s*([-+0-9.eE]+)\s+([-+0-9.eE]+)\s*\)\s*$", re.I)


def parse_wkt(text: str):
    """Parse the WKT-lite subset used by geo spans (FIXTURES.md §1).

    Returns ``("point", [ndarray (1,2)])`` or ``("polygon", [rings...])``.
    MULTIPOLYGON parts are flattened into one ring list (even-odd semantics).
    """
    m = _WKT_POINT.match(text)
    if m:
        return "point", [np.array([[float(m.group(1)), float(m.group(2))]])]
    up = text.lstrip()
    if up.upper().startswith("MULTIPOLYGON"):
        body = _top_groups(up)[0]  # content of the outermost parens
        rings = []
        for part in _top_groups(body):
            for ring in _top_groups(part):
                rings.append(_parse_ring(ring))
        return "polygon", rings
    if up.upper().startswith("POLYGON"):
        body = _top_groups(up)[0]
        return "polygon", [_parse_ring(r) for r in _top_groups(body)]
    raise ValueError(f"unsupported WKT: {text[:60]!r}")


def _top_groups(s: str):
    """Contents of each top-level '(...)' group found while scanning s."""
    depth, start, out = 0, None, []
    for i, ch in enumerate(s):
        if ch == "(":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                out.append(s[start:i])
    return out


def _parse_ring(s: str) -> np.ndarray:
    pts = []
    for pair in s.split(","):
        x, y = pair.split()
        pts.append((float(x), float(y)))
    return np.asarray(pts, dtype=np.float64)


def rings_from_cell(value) -> list[np.ndarray]:
    """Convert a Spark/Arrow ``rings`` cell (nested lists or object ndarrays
    of per-point arrays, as delivered by toPandas/applyInPandas) into the
    kernel representation: a list of float64 (N,2) arrays."""
    return [np.array([(p[0], p[1]) for p in ring], dtype=np.float64) for ring in value]


def normalize_rings(rings) -> list[np.ndarray]:
    """Drop explicit closing vertex; keep >=3 distinct vertices per ring.

    The analog of the reference's ``make_valid`` (features.py:204-223) scoped
    to what the engine's fixtures need: consistent open-ring storage.
    """
    out = []
    for r in rings:
        r = np.asarray(r, dtype=np.float64)
        if len(r) >= 2 and np.array_equal(r[0], r[-1]):
            r = r[:-1]
        if len(r) >= 3:
            out.append(r)
    return out


def rings_bbox(rings) -> tuple[float, float, float, float]:
    """Envelope over all rings — the analog of get_extent (features.py:79-94)."""
    allpts = np.concatenate([np.asarray(r) for r in rings])
    return (
        float(allpts[:, 0].min()),
        float(allpts[:, 1].min()),
        float(allpts[:, 0].max()),
        float(allpts[:, 1].max()),
    )


def rings_to_edges(rings) -> np.ndarray:
    """Flatten rings to an (E,4) array of segments [x1,y1,x2,y2] (closed)."""
    segs = []
    for r in rings:
        r = np.asarray(r, dtype=np.float64)
        nxt = np.roll(r, -1, axis=0)
        segs.append(np.concatenate([r, nxt], axis=1))
    return np.concatenate(segs, axis=0) if segs else np.empty((0, 4))


def points_in_rings(px: np.ndarray, py: np.ndarray, edges: np.ndarray) -> np.ndarray:
    """Even-odd ray-cast PIP, vectorized: P points x E edges.

    `edges` from :func:`rings_to_edges`. Returns bool (P,). Formula is kept
    identical to the oracle SQL (module docstring).
    """
    if len(edges) == 0:
        return np.zeros(len(px), dtype=bool)
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    x1, y1, x2, y2 = edges[:, 0], edges[:, 1], edges[:, 2], edges[:, 3]
    straddles = (y1 > py) != (y2 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
    crossings = straddles & (px < xint)
    return (crossings.sum(axis=1) % 2).astype(bool)


def signed_area(ring: np.ndarray) -> float:
    """Shoelace signed area of one (open) ring — CCW positive."""
    r = np.asarray(ring, dtype=np.float64)
    x, y = r[:, 0], r[:, 1]
    xn, yn = np.roll(x, -1), np.roll(y, -1)
    return float(np.sum(x * yn - xn * y) / 2.0)


def ring_length(ring: np.ndarray) -> float:
    r = np.asarray(ring, dtype=np.float64)
    d = np.roll(r, -1, axis=0) - r
    return float(np.sqrt((d**2).sum(axis=1)).sum())


def polygon_area(rings) -> float:
    """geom.Area() analog (fields.py:407-411): outers minus holes.

    With CCW outers / CW holes this is just the signed-shoelace sum — the same
    expression the oracle SQL computes over the zone_edges table.
    """
    return sum(signed_area(r) for r in rings)


def polygon_perimeter(rings) -> float:
    """geom.Length() analog (fields.py:413-416): total boundary length."""
    return sum(ring_length(r) for r in rings)


def _orient(ax, ay, bx, by, cx, cy):
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def segments_intersect(a: np.ndarray, b: np.ndarray) -> bool:
    """Any proper crossing between edge sets a (E1,4) and b (E2,4)?

    Vectorized orientation test over the full E1 x E2 grid. Proper crossings
    only (strict sign changes) — collinear touching is measure-zero for the
    seeded float fixtures and excluded on both engine and oracle sides.
    """
    if len(a) == 0 or len(b) == 0:
        return False
    ax1, ay1, ax2, ay2 = (a[:, i][:, None] for i in range(4))
    bx1, by1, bx2, by2 = (b[:, i][None, :] for i in range(4))
    d1 = _orient(ax1, ay1, ax2, ay2, bx1, by1)
    d2 = _orient(ax1, ay1, ax2, ay2, bx2, by2)
    d3 = _orient(bx1, by1, bx2, by2, ax1, ay1)
    d4 = _orient(bx1, by1, bx2, by2, ax2, ay2)
    return bool(np.any((d1 * d2 < 0) & (d3 * d4 < 0)))


def polygon_intersects(rings_a, rings_b) -> bool:
    """OGR Intersects semantics for two polygons (lib/join.py:52 analog).

    True iff a vertex of A is inside B, a vertex of B is inside A, or any
    edge pair properly crosses — complete for simple polygons up to
    measure-zero boundary contact.
    """
    ea, eb = rings_to_edges(rings_a), rings_to_edges(rings_b)
    va = np.concatenate([np.asarray(r) for r in rings_a])
    vb = np.concatenate([np.asarray(r) for r in rings_b])
    if points_in_rings(va[:, 0], va[:, 1], eb).any():
        return True
    if points_in_rings(vb[:, 0], vb[:, 1], ea).any():
        return True
    return segments_intersect(ea, eb)


def _point_seg_dist(px, py, edges):
    """Min distance from points (P,) to segments (E,4) -> (P,) array."""
    if len(edges) == 0:
        return np.full(len(px), np.inf)
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    x1, y1, x2, y2 = edges[:, 0], edges[:, 1], edges[:, 2], edges[:, 3]
    dx, dy = x2 - x1, y2 - y1
    ll = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = ((px - x1) * dx + (py - y1) * dy) / ll
    t = np.clip(np.where(np.isfinite(t), t, 0.0), 0.0, 1.0)
    cx, cy = x1 + t * dx, y1 + t * dy
    return np.sqrt((px - cx) ** 2 + (py - cy) ** 2).min(axis=1)


def geom_distance(kind_a, rings_a, kind_b, rings_b) -> float:
    """geom.Distance() analog (lib/analysis.py:315): planar min distance.

    Point-point is the plain Euclidean distance (the near_table fixture case,
    lib/analysis.py:241-322); polygon pairs return 0 when intersecting.
    """
    va = np.concatenate([np.asarray(r) for r in rings_a])
    vb = np.concatenate([np.asarray(r) for r in rings_b])
    if kind_a == "point" and kind_b == "point":
        d = va[:, None, :] - vb[None, :, :]
        return float(np.sqrt((d**2).sum(axis=2)).min())
    if kind_a != "point" and kind_b != "point" and polygon_intersects(rings_a, rings_b):
        return 0.0
    if kind_a != "point":
        ea = rings_to_edges(rings_a)
        if points_in_rings(vb[:, 0], vb[:, 1], ea).any():
            return 0.0
    if kind_b != "point":
        eb = rings_to_edges(rings_b)
        if points_in_rings(va[:, 0], va[:, 1], eb).any():
            return 0.0
    d1 = _point_seg_dist(va[:, 0], va[:, 1], rings_to_edges(rings_b)).min() if kind_b != "point" else np.inf
    d2 = _point_seg_dist(vb[:, 0], vb[:, 1], rings_to_edges(rings_a)).min() if kind_a != "point" else np.inf
    dv = np.sqrt(((va[:, None, :] - vb[None, :, :]) ** 2).sum(axis=2)).min()
    return float(min(d1, d2, dv))


def buffer_point(x: float, y: float, dist: float, n: int = 32) -> np.ndarray:
    """Buffer of a point = regular n-gon CCW (geom.Buffer analog,
    lib/analysis.py:39; fixtures use point/convex buffers, SURVEY §2.5 G1)."""
    th = np.linspace(0.0, 2.0 * np.pi, n, endpoint=False)
    return np.column_stack([x + dist * np.cos(th), y + dist * np.sin(th)])


def boundary_band(rings, dist: float, n: int = 16) -> list[np.ndarray]:
    """The polygonal boundary band of radius ``dist``: a 2d-wide quad per
    boundary edge plus an n-gon disk per vertex (the Minkowski sum of the
    boundary with a disk, up to the n-gon arc approximation). Shared by
    dilation (union with the polygon) and erosion (subtraction from it)."""
    members: list[np.ndarray] = []
    for r in rings:
        r = np.asarray(r, dtype=np.float64)
        nxt = np.roll(r, -1, axis=0)
        for a, b in zip(r, nxt):
            d = b - a
            ln = float(np.hypot(d[0], d[1]))
            if ln < 1e-300:
                continue
            nx, ny = -d[1] / ln * dist, d[0] / ln * dist
            quad = np.array([
                [a[0] + nx, a[1] + ny],
                [b[0] + nx, b[1] + ny],
                [b[0] - nx, b[1] - ny],
                [a[0] - nx, a[1] - ny],
            ])
            if signed_area(quad) < 0:
                quad = quad[::-1]
            members.append(quad)
        for v in r:
            members.append(buffer_point(float(v[0]), float(v[1]), dist, n))
    return members


def buffer_rings(rings, dist: float, n: int = 16) -> list[np.ndarray]:
    """Buffer of an arbitrary polygon (holes/multiparts included) — the full
    geom.Buffer analog (lib/analysis.py:39) for any sign of d.

    d > 0 (dilation): Minkowski sum with a disk expressed as a union — the
    polygon itself plus the boundary band, merged with :func:`union_pieces`
    into a disjoint piece collection (region-exact up to the n-gon arc
    approximation). Hole boundaries get the same treatment, which shrinks
    holes by d — the correct buffer semantics.

    d < 0 (erosion / inward setback): the morphological identity
    P ⊖ d = P \\ (∂P ⊕ d) — subtract the SAME boundary band from the
    polygon; collapsed lobes vanish through the difference kernels and
    holes GROW by |d|. A fully-collapsed polygon returns []. d == 0
    returns the input unchanged (OGR Buffer(0) semantics for already-valid
    geometry)."""
    if dist == 0:
        return [np.asarray(r, dtype=np.float64) for r in rings]
    if dist > 0:
        members = [[np.asarray(r, dtype=np.float64) for r in rings]]
        members.extend([m] for m in boundary_band(rings, dist, n))
        return union_pieces(members)
    pieces = [np.asarray(r, dtype=np.float64) for r in rings]
    for m in boundary_band(rings, -dist, n):
        if not pieces:
            break
        pieces = difference_general(pieces, [m])
    return pieces


def is_convex(ring: np.ndarray) -> bool:
    """True iff the (open, CCW or CW) ring is convex: all consecutive-edge
    cross products share a sign (zeros allowed for collinear vertices)."""
    r = np.asarray(ring, dtype=np.float64)
    a = np.roll(r, -1, axis=0) - r
    b = np.roll(a, -1, axis=0)
    cr = a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0]
    return bool((cr >= -1e-12).all() or (cr <= 1e-12).all())


def _drop_degenerate_edges(ring: np.ndarray) -> np.ndarray:
    """Remove consecutive near-duplicate vertices from a clip ring: an edge
    whose length is ~0 relative to the ring's coordinate scale defines an
    ill-conditioned half-plane (den/t in the intersection formula is built
    from subnormal differences) and corrupts clip/difference decomposition.
    Dropping it changes the polygon by a zero-area sliver only."""
    if len(ring) == 0:
        return ring
    nxt = np.roll(ring, -1, axis=0)
    scale = max(float(np.max(np.abs(ring))), 1.0)
    d2 = np.sum((ring - nxt) ** 2, axis=1)
    return ring[d2 > (1e-12 * scale) ** 2]


def clip_halfplanes(subject: np.ndarray, lines: np.ndarray) -> np.ndarray | None:
    """Clip a ring by an intersection of half-planes (keep LEFT of each
    directed line (x1,y1)->(x2,y2)). Sutherland-Hodgman core shared by
    clip_convex and the difference decomposition."""
    out = np.asarray(subject, dtype=np.float64)
    for cx1, cy1, cx2, cy2 in np.asarray(lines, dtype=np.float64):
        if len(out) == 0:
            return None
        prev = out
        keep = _orient(cx1, cy1, cx2, cy2, prev[:, 0], prev[:, 1]) >= 0
        res = []
        for j in range(len(prev)):
            k = (j + 1) % len(prev)
            if keep[j]:
                res.append(prev[j])
            if keep[j] != keep[k]:
                x1, y1 = prev[j]
                x2, y2 = prev[k]
                den = (cx2 - cx1) * (y2 - y1) - (cy2 - cy1) * (x2 - x1)
                if den != 0.0:
                    t = -((cx2 - cx1) * (y1 - cy1) - (cy2 - cy1) * (x1 - cx1)) / den
                    res.append(np.array([x1 + t * (x2 - x1), y1 + t * (y2 - y1)]))
        out = np.asarray(res) if res else np.empty((0, 2))
    return out if len(out) >= 3 else None


def difference_convex(subject: np.ndarray, clip_ring: np.ndarray) -> list[np.ndarray]:
    """subject \\ convex CCW clip ring, as a list of disjoint pieces.

    Standard half-plane decomposition: with clip edges e_1..e_k,
    subject \\ C = union over i of (subject RIGHT of e_i AND LEFT of
    e_1..e_{i-1}) — each piece is one half-plane-sequence clip. Exact for
    the fixture classes (convex erase layers); the erase/identity/symdiff
    overlays build on this (lib/analysis.py:100,126,184 analogs)."""
    clip = _drop_degenerate_edges(np.asarray(clip_ring, dtype=np.float64))
    if len(clip) < 3:
        return [np.asarray(subject, dtype=np.float64)]
    subj = np.asarray(subject, dtype=np.float64)
    if len(subj) and _bbox_disjoint(subj, clip):
        return [subj]  # disjoint: subtraction is the identity
    k = len(clip)
    edges = [(clip[i], clip[(i + 1) % k]) for i in range(k)]
    pieces = []
    for i in range(k):
        (a, b) = edges[i]
        lines = [np.array([b[0], b[1], a[0], a[1]])]  # RIGHT of e_i = left of reversed
        for j in range(i):
            (aj, bj) = edges[j]
            lines.append(np.array([aj[0], aj[1], bj[0], bj[1]]))
        piece = clip_halfplanes(subject, np.asarray(lines))
        if piece is not None and abs(signed_area(piece)) > 1e-12:
            pieces.append(piece)
    return pieces


def _point_in_tri(px, py, a, b, c) -> bool:
    """Strict interior test for a CCW triangle (boundary excluded)."""
    return (
        _orient(a[0], a[1], b[0], b[1], px, py) > 0
        and _orient(b[0], b[1], c[0], c[1], px, py) > 0
        and _orient(c[0], c[1], a[0], a[1], px, py) > 0
    )


def triangulate_ring(ring: np.ndarray) -> list[np.ndarray]:
    """Ear-clipping triangulation of a simple (possibly concave) ring.

    Input orientation is normalized to CCW; output is CCW triangles whose
    disjoint-interior union is the ring's interior. This is the concave ->
    convex decomposition behind the general overlay kernels (the reference
    delegates arbitrary-polygon overlays to OGR's layer algebra,
    lib/analysis.py:74,100 — here concavity is reduced to the convex
    Sutherland-Hodgman kernels instead)."""
    r = np.asarray(ring, dtype=np.float64)
    if len(r) >= 2 and np.array_equal(r[0], r[-1]):
        r = r[:-1]
    if signed_area(r) < 0:
        r = r[::-1]
    scale = max(float(np.max(np.abs(r))), 1.0)
    eps = (1e-12 * scale) ** 2
    idx = list(range(len(r)))
    tris: list[np.ndarray] = []
    stuck = 0
    dropped_area = 0.0  # slivers removed by the stalemate path, legit loss
    while len(idx) > 3:
        n = len(idx)
        found = False
        for k in range(n):
            i0, i1, i2 = idx[(k - 1) % n], idx[k], idx[(k + 1) % n]
            a, b, c = r[i0], r[i1], r[i2]
            cr = _orient(a[0], a[1], b[0], b[1], c[0], c[1])
            if cr <= eps:
                continue  # reflex or collinear corner — not an ear
            if any(
                _point_in_tri(r[j][0], r[j][1], a, b, c)
                for j in idx
                if j not in (i0, i1, i2)
            ):
                continue
            tris.append(np.array([a, b, c]))
            idx.pop(k)
            found = True
            break
        if not found:
            # numerical stalemate (collinear runs): drop the flattest corner
            # — a zero-area sliver — and retry; bail to a fan after 2 tries
            stuck += 1
            if stuck > 2:
                break
            flat = min(
                range(n),
                key=lambda k: abs(
                    _orient(*r[idx[(k - 1) % n]], *r[idx[k]], *r[idx[(k + 1) % n]])
                ),
            )
            dropped_area += 0.5 * abs(
                _orient(*r[idx[(flat - 1) % n]], *r[idx[flat]], *r[idx[(flat + 1) % n]])
            )
            idx.pop(flat)
        else:
            stuck = 0
    if len(idx) == 3:
        a, b, c = r[idx[0]], r[idx[1]], r[idx[2]]
        if _orient(a[0], a[1], b[0], b[1], c[0], c[1]) > eps:
            tris.append(np.array([a, b, c]))
    elif len(idx) > 3:  # fan fallback (convex-ish leftover)
        for k in range(1, len(idx) - 1):
            a, b, c = r[idx[0]], r[idx[k]], r[idx[k + 1]]
            if _orient(a[0], a[1], b[0], b[1], c[0], c[1]) > eps:
                tris.append(np.array([a, b, c]))
        # the fan apex may see a still-concave leftover, which would emit
        # triangles OUTSIDE the ring and silently corrupt downstream
        # clip/union geometry — verify the area invariant and fail loudly.
        # The stalemate path legitimately dropped sliver corners, so allow
        # exactly that much loss on top of fp tolerance; a genuine
        # mismatch means self-intersecting input (run make_valid first)
        area = abs(signed_area(r))
        tri_area = sum(signed_area(t) for t in tris)
        if abs(tri_area - area) > dropped_area + max(1e-9, 1e-9 * area):
            raise ValueError(
                "triangulate_ring: fan fallback produced a non-covering "
                f"triangulation (ring area {area}, triangles {tri_area}, "
                f"sliver allowance {dropped_area}); the input ring is "
                "likely self-intersecting — run make_valid_rings first"
            )
    return tris


def decompose_convex(ring: np.ndarray) -> list[np.ndarray]:
    """Ring -> list of CCW convex rings covering its interior (identity for
    already-convex rings, ear-clipping triangles otherwise)."""
    r = np.asarray(ring, dtype=np.float64)
    if signed_area(r) < 0:
        r = r[::-1]
    if is_convex(r):
        return [r]
    return triangulate_ring(r)


def split_outers_holes(rings) -> list[tuple[np.ndarray, list[np.ndarray]]]:
    """Group a flat ring list (CCW outers, CW holes — the engine's storage
    convention) into (outer, [holes]) parts; holes come back re-oriented
    CCW so they can be used directly as clip shapes.

    Attachment: a hole joins the first outer containing ANY of its
    vertices (a single boundary-touching vertex — snapped/clipped data —
    must not orphan it); a hole whose every vertex sits on boundaries
    falls back to bbox containment, then to the first outer, so no hole
    is ever silently dropped."""
    outers = []
    holes = []
    for r in rings:
        r = np.asarray(r, dtype=np.float64)
        if signed_area(r) >= 0:
            outers.append(r)
        else:
            holes.append(r[::-1])
    parts = [(o, []) for o in outers]
    for h in holes:
        attached = False
        for o, hs in parts:
            e = rings_to_edges([o])
            if points_in_rings(h[:, 0], h[:, 1], e).any():
                hs.append(h)
                attached = True
                break
        if not attached and parts:
            hb = rings_bbox([h])
            for o, hs in parts:
                ob = rings_bbox([o])
                if hb[0] >= ob[0] and hb[1] >= ob[1] and hb[2] <= ob[2] and hb[3] <= ob[3]:
                    hs.append(h)
                    attached = True
                    break
            if not attached:
                parts[0][1].append(h)
    return parts


_MIN_PIECE_AREA = 1e-12


def clip_general(subject_rings, clip_rings, parts_dec=None) -> list[np.ndarray]:
    """subject ∩ clip for arbitrary simple polygons (concave outers, holes,
    multipolygon parts on BOTH sides) — the full G2/G5 kernel.

    The clip side decomposes into convex pieces (disjoint interiors), so
    each piece-level clip is exact convex Sutherland-Hodgman; subject rings
    keep their orientation through clipping, so subject holes stay holes
    (negative rings) and even-odd/area semantics compose. Clip holes are
    handled as  A ∩ (O \\ H) = (A ∩ O) with the rings of (A ∩ H) negated —
    exact under even-odd because H ⊆ O. Pass a :func:`decompose_parts`
    result as ``parts_dec`` to amortize the clip side's ear-clipping across
    repeated calls (the overlay kernels clip MANY subjects by one layer
    feature per batch)."""
    if parts_dec is None:
        parts_dec = decompose_parts(clip_rings)
    pieces: list[np.ndarray] = []
    for outer_convs, holes_convs in parts_dec:
        for conv in outer_convs:
            for s in subject_rings:
                res = clip_convex(s, conv)
                if res is not None and abs(signed_area(res)) > _MIN_PIECE_AREA:
                    pieces.append(res)
        for hole_convs in holes_convs:
            for conv in hole_convs:
                for s in subject_rings:
                    res = clip_convex(s, conv)
                    if res is not None and abs(signed_area(res)) > _MIN_PIECE_AREA:
                        pieces.append(res[::-1])  # negate: carve the hole out
    return pieces


def decompose_parts(clip_rings) -> list[tuple[list[np.ndarray], list[list[np.ndarray]]]]:
    """Precompute the convex decomposition of a clip geometry: one
    (outer_convex_pieces, [hole_convex_pieces...]) per part. Callers that
    subtract the SAME geometry repeatedly (union_pieces, erase folds) do
    the ear-clipping once instead of per difference call."""
    return [
        (decompose_convex(outer), [decompose_convex(h) for h in holes])
        for outer, holes in split_outers_holes(clip_rings)
    ]


def _difference_by_parts(subject_rings, pieces, parts_dec) -> list[np.ndarray]:
    """Core of difference_general over a precomputed decomposition."""
    for outer_convs, holes_convs in parts_dec:
        for conv in outer_convs:
            pieces = [q for p in pieces for q in difference_convex(p, conv)]
        for hole_convs in holes_convs:
            for conv in hole_convs:
                for s in subject_rings:
                    res = clip_convex(s, conv)
                    if res is not None and abs(signed_area(res)) > _MIN_PIECE_AREA:
                        pieces.append(res)
    return [p for p in pieces if abs(signed_area(p)) > _MIN_PIECE_AREA]


def difference_general(subject_rings, clip_rings, parts_dec=None) -> list[np.ndarray]:
    """subject \\ clip for arbitrary simple polygons (concave, holes,
    multi-part) — the full G3 kernel.

    Each clip part (O \\ H) is subtracted sequentially:
    X \\ (O \\ H) = (X \\ O) ∪ (X ∩ H); parts are disjoint so the
    hole-intersections can be taken against the ORIGINAL subject. Convex
    decomposition reduces every step to the convex difference/clip kernels;
    subject orientation (holes) is preserved throughout. Pass a
    :func:`decompose_parts` result as ``parts_dec`` to amortize the clip
    side's triangulation across repeated calls."""
    pieces = [np.asarray(s, dtype=np.float64) for s in subject_rings]
    if parts_dec is None:
        parts_dec = decompose_parts(clip_rings)
    return _difference_by_parts(subject_rings, pieces, parts_dec)


def _self_intersections(ring: np.ndarray) -> list[tuple[int, float, int, float]]:
    """Proper crossings between non-adjacent edges of one open ring:
    (edge_i, t_i, edge_j, t_j) with t the parametric position on each edge."""
    r = np.asarray(ring, dtype=np.float64)
    n = len(r)
    out = []
    for i in range(n):
        a1, a2 = r[i], r[(i + 1) % n]
        for j in range(i + 2, n):
            if i == 0 and j == n - 1:
                continue  # adjacent around the wrap
            b1, b2 = r[j], r[(j + 1) % n]
            d1 = _orient(a1[0], a1[1], a2[0], a2[1], b1[0], b1[1])
            d2 = _orient(a1[0], a1[1], a2[0], a2[1], b2[0], b2[1])
            d3 = _orient(b1[0], b1[1], b2[0], b2[1], a1[0], a1[1])
            d4 = _orient(b1[0], b1[1], b2[0], b2[1], a2[0], a2[1])
            if d1 * d2 < 0 and d3 * d4 < 0:
                den = (a2[0] - a1[0]) * (b2[1] - b1[1]) - (a2[1] - a1[1]) * (b2[0] - b1[0])
                ti = ((b1[0] - a1[0]) * (b2[1] - b1[1]) - (b1[1] - a1[1]) * (b2[0] - b1[0])) / den
                tj = ((b1[0] - a1[0]) * (a2[1] - a1[1]) - (b1[1] - a1[1]) * (a2[0] - a1[0])) / den
                out.append((i, float(ti), j, float(tj)))
    return out


def repair_ring(ring: np.ndarray) -> list[np.ndarray]:
    """Split a self-intersecting ring into simple sub-rings — the raw loop
    decomposition behind MakeValid (features.py:204-223; e.g. a bowtie ->
    two triangles). :func:`make_valid_rings` layers the OGR nonzero-winding
    rule on top (pentagram cores stay filled via lobe union).

    Crossing points are inserted into the traversal order; walking the
    augmented sequence, each time a crossing point recurs the loop between
    its two occurrences pops out as one simple ring. Every output ring is
    normalized CCW (even-odd region semantics: a figure-8's lobes are both
    covered). Simple input returns [ring] unchanged."""
    r = np.asarray(ring, dtype=np.float64)
    xs = _self_intersections(r)
    if not xs:
        return [r]
    n = len(r)
    per_edge: dict[int, list[tuple[float, tuple]]] = {}
    for i, ti, j, tj in xs:
        p = tuple(np.round(r[i] + ti * (r[(i + 1) % n] - r[i]), 12))
        per_edge.setdefault(i, []).append((ti, p))
        per_edge.setdefault(j, []).append((tj, p))
    seq: list[tuple] = []
    for i in range(n):
        seq.append(tuple(r[i]))
        for _, p in sorted(per_edge.get(i, [])):
            seq.append(p)
    rings_out: list[np.ndarray] = []

    def emit(loop: list[tuple]) -> None:
        arr = np.asarray(loop, dtype=np.float64)
        if len(arr) >= 3 and abs(signed_area(arr)) > _MIN_PIECE_AREA:
            if signed_area(arr) < 0:
                arr = arr[::-1]
            rings_out.append(arr)

    stack: list[tuple] = []
    pos: dict[tuple, int] = {}
    for p in seq:
        if p in pos:
            k = pos[p]
            emit(stack[k:])  # loop from p's first occurrence back to p
            del stack[k:]
            stack.append(p)
            pos = {q: idx for idx, q in enumerate(stack)}
        else:
            pos[p] = len(stack)
            stack.append(p)
    emit(stack)
    return rings_out if rings_out else [r]


def make_valid_rings(rings, mode: str = "winding") -> list[np.ndarray]:
    """Full make_valid: drop closing vertices / short rings
    (normalize_rings) then repair any self-crossing ring into simple CCW
    sub-rings (repair_ring). Non-crossing holes keep their CW orientation.

    ``mode`` picks the repair semantics for multiply-wound regions —
    observable only on pentagram-class rings (a bowtie/figure-8 decomposes
    to DISJOINT lobes, identical under both):

    - ``"winding"`` (default): OGR MakeValid parity (features.py:204-223
      delegates to OGR's nonzero-winding rule) — the pentagon core of a
      pentagram stays FILLED. Implemented as the true geometric union of
      the decomposed simple lobes (every point wound >= once is covered).
    - ``"even-odd"``: the raw loop decomposition — a region wound twice
      cancels (pentagram core becomes a hole). This is the round-2
      behavior, kept for piece-level workflows that want the lobes
      themselves."""
    if mode not in ("winding", "even-odd"):
        raise ValueError(f"make_valid_rings: unknown mode {mode!r}")
    out: list[np.ndarray] = []
    for r in normalize_rings(rings):
        fixed = repair_ring(r)
        if len(fixed) == 1 and fixed[0] is r:
            out.append(r)
        elif mode == "winding":
            # nonzero-winding region = union of the simple sub-loops; for
            # disjoint lobes union_pieces is the identity, so only
            # multiply-wound overlap regions (pentagram cores) differ
            out.extend(union_pieces([[p] for p in fixed]))
        else:
            out.extend(fixed)
    return out


def union_pieces(ringsets: list[list[np.ndarray]]) -> list[np.ndarray]:
    """True geometric union of member polygons (the UnionCascaded analog,
    lib/dissolve.py:46-49,268-274) as a disjoint piece collection.

    Member i contributes  P_i \\ (P_1 ∪ … ∪ P_{i-1})  via sequential
    general difference against the ORIGINAL earlier members, so every point
    of the union is covered by exactly one piece: even-odd membership equals
    the union region and the signed-area sum equals the union area with
    overlaps removed. Representation note: the result is a piece collection
    (region- and area-exact), not a boundary-walked merged ring — parity
    checks operate on areas, counts and membership (SURVEY §2.5 note)."""
    if not ringsets:
        return []
    out = [np.asarray(r, dtype=np.float64) for r in ringsets[0]]
    # memoize each member's convex decomposition + bbox: member j is the
    # clip side of up to n-j differences, and re-triangulating it each time
    # made union quadratic in ear-clipping passes
    dec_cache: dict[int, object] = {}
    bboxes = [rings_bbox(rs) for rs in ringsets]
    for i in range(1, len(ringsets)):
        pieces = [np.asarray(r, dtype=np.float64) for r in ringsets[i]]
        for j in range(i):
            if not pieces:
                break
            # bbox reject: disjoint members contribute unchanged
            bi = rings_bbox(pieces)
            bj = bboxes[j]
            if bi[2] < bj[0] or bj[2] < bi[0] or bi[3] < bj[1] or bj[3] < bi[1]:
                continue
            if j not in dec_cache:
                dec_cache[j] = decompose_parts(ringsets[j])
            pieces = difference_general(pieces, ringsets[j], parts_dec=dec_cache[j])
        out.extend(pieces)
    return out


def _bbox_disjoint(a: np.ndarray, b: np.ndarray) -> bool:
    """Strictly-disjoint bbox test (touching falls through to the exact
    kernels — a shared boundary yields only sub-_MIN_PIECE_AREA slivers)."""
    return bool(
        a[:, 0].min() > b[:, 0].max()
        or a[:, 0].max() < b[:, 0].min()
        or a[:, 1].min() > b[:, 1].max()
        or a[:, 1].max() < b[:, 1].min()
    )


def clip_convex(subject: np.ndarray, clip_ring: np.ndarray) -> np.ndarray | None:
    """Sutherland–Hodgman clip of an arbitrary ring by a CONVEX CCW ring.

    The pairwise kernel behind clip/intersection/erase-style overlays
    (lib/analysis.py:74,100,155 analogs). Exact for convex clip polygons —
    the overlay fixtures use convex clippers (SURVEY §2.5 parity note).
    Returns the clipped ring or None if empty.
    """
    out = np.asarray(subject, dtype=np.float64)
    if len(out) and _bbox_disjoint(out, np.asarray(clip_ring, dtype=np.float64)):
        return None
    clip = _drop_degenerate_edges(np.asarray(clip_ring, dtype=np.float64))
    for i in range(len(clip)):
        if len(out) == 0:
            return None
        cx1, cy1 = clip[i]
        cx2, cy2 = clip[(i + 1) % len(clip)]
        prev = out
        keep = _orient(cx1, cy1, cx2, cy2, prev[:, 0], prev[:, 1]) >= 0
        res = []
        for j in range(len(prev)):
            k = (j + 1) % len(prev)
            if keep[j]:
                res.append(prev[j])
            if keep[j] != keep[k]:
                # edge crosses the clip line: add intersection point
                x1, y1 = prev[j]
                x2, y2 = prev[k]
                den = (cx2 - cx1) * (y2 - y1) - (cy2 - cy1) * (x2 - x1)
                if den != 0.0:
                    t = -((cx2 - cx1) * (y1 - cy1) - (cy2 - cy1) * (x1 - cx1)) / den
                    res.append(np.array([x1 + t * (x2 - x1), y1 + t * (y2 - y1)]))
        out = np.asarray(res) if res else np.empty((0, 2))
    return out if len(out) >= 3 else None
