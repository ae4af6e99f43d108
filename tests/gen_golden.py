"""Generate golden kernel fixtures (FIXTURES.md §5) under tests/golden/.

The oracle here implements the REFERENCE formulas verbatim as scalar Python
(lib/extract.py:134-195 window snap with Python %, rasters.py:101-116 int()
truncation, lib/zonal.py:175-239 stats incl. Python round()) — independent
of the engine's vectorized numpy kernels. Run once; JSON is committed.
"""

from __future__ import annotations

import json
import math
import os
import random

HERE = os.path.dirname(os.path.abspath(__file__))
GOLD = os.path.join(HERE, "golden")


def ref_snap(xmin, ymin, xmax, ymax, ox, oy, psx, psy, W, H):
    # lib/extract.py:134-195, verbatim semantics
    if xmin < ox:
        xmin = ox
    else:
        xmin -= (xmin - ox) % psx
    xoff = int((xmin - ox) / psx)
    if psy < 0:
        if ymax > oy:
            ymax = oy
        else:
            ymax -= (oy - ymax) % psy
        yoff = int((ymax - oy) / psy)
    else:
        if ymax < oy:
            ymin = oy
        else:
            ymin -= (ymin - oy) % psy
        yoff = int((ymin - oy) / psy)
    rx = int((xmax - xmin) / psx)
    ry = int((ymax - ymin) / psy)
    if psy < 0:
        ry = -ry
    if xoff > W or yoff > H:
        return None
    if xoff + rx > W:
        rx = W - xoff
    if yoff + ry > H:
        ry = H - yoff
    if rx <= 0 or ry <= 0:
        return None
    return [xmin, ymax if psy < 0 else ymin, rx, ry, xoff, yoff]


def ref_stats(vals):
    # lib/zonal.py:175-239, verbatim (population variance, Python round)
    out = {k: 0 for k in ("min", "max", "mean", "median", "var", "stdev", "perc90")}
    if not vals:
        return out
    n = len(vals)
    mean = 0.0
    for v in vals:
        mean += float(v) / float(n)
    var = 0.0
    for v in vals:
        var += (float(v) - mean) ** 2 / float(n)
    s = sorted(vals)
    return {
        "min": s[0],
        "max": s[-1],
        "mean": mean,
        "median": s[int(round(0.5 * n)) - 1],
        "var": var,
        "stdev": var**0.5,
        "perc90": s[int(math.ceil(0.9 * n)) - 1],
    }


def main():
    os.makedirs(GOLD, exist_ok=True)
    rnd = random.Random(7)

    # 1. window-snap: branch-coverage cases + seeded random
    cases = [
        # off-grid minima, north-up
        (2.3, 5.2, 7.9, 7.3, 0.0, 10.0, 1.0, -1.0, 20, 20),
        # bbox below/left of origin (crop)
        (-3.0, -5.0, 2.5, 3.5, 0.0, 10.0, 0.5, -0.5, 30, 25),
        # clamp at far edge
        (2.0, 2.0, 50.0, 50.0, 0.0, 10.0, 1.0, -1.0, 20, 20),
        # fully outside (degenerate)
        (25.0, 2.0, 30.0, 5.0, 0.0, 10.0, 1.0, -1.0, 20, 20),
        # south-up branch incl. the ymin-assignment quirk
        (1.1, 2.2, 3.3, 4.4, 0.0, 0.0, 0.25, 0.25, 40, 40),
        (1.1, -3.0, 3.3, -1.0, 0.0, 0.0, 0.25, 0.25, 40, 40),
    ]
    for _ in range(200):
        ox, oy = rnd.uniform(-5, 5), rnd.uniform(-5, 15)
        psx = rnd.choice([0.25, 0.5, 1.0])
        psy = rnd.choice([-1.0, -0.5, 0.5])
        x0 = rnd.uniform(-10, 20)
        y0 = rnd.uniform(-10, 20)
        cases.append(
            (x0, y0, x0 + rnd.uniform(0.01, 15), y0 + rnd.uniform(0.01, 15),
             ox, oy, psx, psy, rnd.randint(5, 40), rnd.randint(5, 40))
        )
    snap = [{"case": list(c), "expect": ref_snap(*c)} for c in cases]
    json.dump(snap, open(os.path.join(GOLD, "window_snap.json"), "w"), indent=1)

    # 2. pixel-coord truncation-toward-zero (rasters.py:113-116)
    pc = []
    for cx, cy, ox, oy, px, py in [
        (5.7, 3.2, 0.0, 10.0, 1.0, -1.0),
        (-2.7, 12.5, 0.0, 10.0, 1.0, -1.0),   # left/above origin -> negative quotients
        (-0.4, 10.4, 0.0, 10.0, 0.5, -0.5),
        (3.999999, 6.000001, 0.0, 10.0, 2.0, -2.0),
    ]:
        pc.append(
            {
                "case": [cx, cy, ox, oy, px, py],
                "expect": [int((cx - ox) / px), int((cy - oy) / py)],
            }
        )
    json.dump(pc, open(os.path.join(GOLD, "pixel_coord.json"), "w"), indent=1)

    # 3. stats (empty, n=1, ties, n=10/11, fp values)
    stat_cases = [
        [],
        [7],
        [5, 1, 3, 2, 4],
        [2, 2, 2, 2],
        list(range(10)),
        list(range(11)),
        [1.5, 2.25, -3.75, 0.0, 99.5, 1.5],
        [255.0] * 3 + [0.0] * 7,
    ]
    st = [{"case": list(c), "expect": ref_stats(list(c))} for c in stat_cases]
    json.dump(st, open(os.path.join(GOLD, "stats.json"), "w"), indent=1)

    # 4. rasterize masks (engine convention: R1-quantized vertices,
    #    pixel-center even-odd fill) — tiny shapes on known grids, expected
    #    masks computed by an independent scalar PIP implementation
    def scalar_mask(rings, ox, oy, psx, psy, rx, ry):
        # Python int() already truncates toward zero (R1, rasters.py:113-116)
        qrings = [
            [(int((x - ox) / psx), int((y - oy) / psy)) for (x, y) in r]
            for r in rings
        ]
        mask = []
        for row in range(ry):
            line = []
            for col in range(rx):
                px_, py_ = col + 0.5, row + 0.5
                crossings = 0
                for qr in qrings:
                    for i in range(len(qr)):
                        x1, y1 = qr[i]
                        x2, y2 = qr[(i + 1) % len(qr)]
                        if (y1 > py_) != (y2 > py_):
                            xint = (x2 - x1) * (py_ - y1) / (y2 - y1) + x1
                            if px_ < xint:
                                crossings += 1
                line.append(crossings % 2)
            mask.append(line)
        return mask

    shapes = [
        # triangle
        ([[(0.2, 3.8), (3.8, 3.8), (3.8, 0.2)]], 0.0, 4.0, 1.0, -1.0, 4, 4),
        # rect
        ([[(1.0, 1.0), (5.0, 1.0), (5.0, 5.0), (1.0, 5.0)]], 0.0, 6.0, 1.0, -1.0, 6, 6),
        # rect with hole
        (
            [
                [(0.5, 0.5), (7.5, 0.5), (7.5, 7.5), (0.5, 7.5)],
                [(2.5, 2.5), (2.5, 5.5), (5.5, 5.5), (5.5, 2.5)],
            ],
            0.0, 8.0, 1.0, -1.0, 8, 8,
        ),
        # 2-part multipolygon
        (
            [
                [(0.2, 0.2), (2.8, 0.2), (2.8, 2.8), (0.2, 2.8)],
                [(5.2, 5.2), (7.8, 5.2), (7.8, 7.8), (5.2, 7.8)],
            ],
            0.0, 8.0, 1.0, -1.0, 8, 8,
        ),
    ]
    rz = []
    for rings, ox, oy, psx, psy, rx, ry in shapes:
        rz.append(
            {
                "rings": [[list(p) for p in r] for r in rings],
                "grid": [ox, oy, psx, psy, rx, ry],
                "expect": scalar_mask(rings, ox, oy, psx, psy, rx, ry),
            }
        )
    json.dump(rz, open(os.path.join(GOLD, "rasterize.json"), "w"), indent=1)

    # 5. date/scalar: reference leap rule & days_in_month (date.py:62-83)
    dates = []
    for y in [1900, 1996, 2000, 2001, 2023, 2024]:
        dates.append({"year": y, "leap_ref": y % 4 == 0})
    dim = []
    table = [0, 31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]
    for m in range(0, 14):
        for y in [1900, 2000, 2023, 2024]:
            if m <= 0 or m > 12:
                d = 0
            else:
                d = table[m] + (1 if m == 2 and y % 4 == 0 else 0)
            dim.append({"month": m, "year": y, "days": d})
    json.dump({"leap": dates, "days_in_month": dim}, open(os.path.join(GOLD, "dates.json"), "w"), indent=1)
    print("golden fixtures written to", GOLD)


if __name__ == "__main__":
    main()
