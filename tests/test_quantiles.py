"""Exact count-histogram quantiles: nearest-rank vs numpy reference,
partitioning invariance, NULL exclusion."""

import numpy as np
import pandas as pd

from gdal_common_python_spark.operators import quantiles


def _nearest_rank(vals, q):
    s = np.sort(vals)
    return s[int(np.ceil(q * len(s))) - 1]


class TestQuantiles:
    def test_matches_numpy_nearest_rank(self, spark):
        rng = np.random.default_rng(57)
        rows = [
            dict(g=g, v=int(rng.integers(0, 50)))
            for g in ("a", "b") for _ in range(301)
        ]
        df = spark.createDataFrame(pd.DataFrame(rows))
        got = {
            r.g: (r.n, r.q_0_5, r.q_0_9)
            for r in quantiles.exact_quantiles(df, ["g"], "v", [0.5, 0.9]).collect()
        }
        pdf = pd.DataFrame(rows)
        for g in ("a", "b"):
            vals = pdf[pdf.g == g].v.to_numpy()
            assert got[g] == (
                len(vals), _nearest_rank(vals, 0.5), _nearest_rank(vals, 0.9)
            )

    def test_partitioning_invariance_and_nulls(self, spark):
        rows = [dict(g="x", v=v) for v in [1, 2, 2, 3, None, 100]]
        df = spark.createDataFrame(pd.DataFrame(rows), "g string, v long")
        a = quantiles.exact_quantiles(df, ["g"], "v", [0.5, 0.99]).collect()[0]
        b = quantiles.exact_quantiles(df.repartition(7), ["g"], "v", [0.5, 0.99]).collect()[0]
        assert tuple(a) == tuple(b)
        assert a.n == 5  # null excluded
        assert a.q_0_5 == 2 and a.q_0_99 == 100


class TestQuantizeInt8:
    def test_roundtrip_and_range(self, spark):
        import numpy as np
        import pandas as pd
        from gdal_common_python_spark.operators.similarity import quantize_int8

        rng = np.random.default_rng(58)
        vecs = [rng.normal(size=16).astype(np.float32) for _ in range(20)]
        vecs.append(np.zeros(16, dtype=np.float32))  # all-zero vector
        df = spark.createDataFrame(
            pd.DataFrame(
                [dict(vec_id=i, embedding=v.tolist()) for i, v in enumerate(vecs)]
            )
        )
        rows = quantize_int8(df).collect()
        by_id = {}
        for r in rows:
            by_id.setdefault(r.vec_id, {})[r.dim] = (r.q, r.scale)
        for i, v in enumerate(vecs):
            qs = by_id[i]
            assert len(qs) == 16
            mx = float(np.abs(v).max())
            if mx == 0:
                assert all(q == 0 and s is None for q, s in qs.values())
                continue
            scale = 127.0 / np.float64(mx)
            for d, (q, s) in qs.items():
                assert abs(q) <= 127
                assert q == int(np.floor(np.float64(v[d]) * scale + 0.5))
                # dequantized value within half a quantization step
                assert abs(q / scale - np.float64(v[d])) <= 0.5 / scale + 1e-12
