"""Bounded-depth Douglas-Peucker: kernel invariants (anchors always kept,
deviation bound honored at convergence, eps monotonicity) and the Spark
operator vs the kernel on multi-ring features."""

import numpy as np
import pandas as pd

from gdal_common_python_spark.operators import simplify


def _ngon(n, r=1.0, cx=0.0, cy=0.0, jitter=0.0, seed=0):
    rng = np.random.default_rng(seed)
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    rr = r + (rng.uniform(-jitter, jitter, n) if jitter else 0.0)
    return np.stack([cx + rr * np.cos(th), cy + rr * np.sin(th)], axis=1)


class TestDpKernel:
    def test_square_with_midpoints_collapses(self):
        # square with collinear edge midpoints: eps removes the midpoints
        p = np.array(
            [[0, 0], [1, 0], [2, 0], [2, 1], [2, 2], [1, 2], [0, 2], [0, 1]],
            dtype=np.float64,
        )
        kept = simplify.dp_keep_indexes(p, eps2=0.01, max_depth=8)
        assert set(kept) == {0, 2, 4, 6}  # the four corners

    def test_eps_monotone(self):
        p = _ngon(48, jitter=0.05, seed=3)
        k_fine = len(simplify.dp_keep_indexes(p, eps2=1e-6, max_depth=12))
        k_coarse = len(simplify.dp_keep_indexes(p, eps2=0.04, max_depth=12))
        assert k_coarse < k_fine <= 48
        assert k_coarse >= 2

    def test_deviation_bound_at_convergence(self):
        # with enough depth, every dropped vertex is within eps of the
        # simplified chord through its interval
        eps = 0.03
        p = _ngon(32, jitter=0.1, seed=4)
        kept = simplify.dp_keep_indexes(p, eps2=eps * eps, max_depth=16)
        ke = kept + [len(p)]
        pe = np.vstack([p, p[:1]])
        for a, b in zip(ke[:-1], ke[1:]):
            for k in range(a + 1, b):
                ax, ay = pe[a]
                bx, by = pe[b]
                dx, dy = bx - ax, by - ay
                cr = dx * (p[k, 1] - ay) - dy * (p[k, 0] - ax)
                assert cr * cr <= eps * eps * (dx * dx + dy * dy) + 1e-12


class TestDpSpark:
    def test_operator_matches_kernel(self, spark):
        rings = [
            [_ngon(24, jitter=0.08, seed=7).tolist(), _ngon(8, r=0.3, seed=8).tolist()],
            [_ngon(40, jitter=0.02, seed=9).tolist()],
        ]
        df = spark.createDataFrame(
            pd.DataFrame([dict(zone_id=i, rings4326=r) for i, r in enumerate(rings)])
        )
        got = {
            (r.zone_id, r.ri, r.idx)
            for r in simplify.dp_simplify(df, eps=0.05, max_depth=8).collect()
        }
        expect = set()
        for zid, rr in enumerate(rings):
            for ri, ring in enumerate(rr, start=1):
                p = np.asarray(ring, dtype=np.float64)
                for k in simplify.dp_keep_indexes(p, 0.05 * 0.05, 8):
                    expect.add((zid, ri, k + 1))
        assert got == expect
