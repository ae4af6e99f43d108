"""Spatial layout (Z-order clustering, cell rollup pyramid) and the new
text/curation operators. Driver gates pin zorder_layout / cell_rollup /
vocabulary / surprisal / stratified_split hash-exact vs DuckDB; here we pin
the structural contracts: range-partition disjointness (the property that
buys parquet pruning), pyramid conservation, partitioning invariance, and
per-stratum split rates.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gdal_common_python_spark.kernels import cells as cellk
from gdal_common_python_spark.operators import layout


class TestZorder:
    def test_zorder_matches_numpy_interleave(self, spark):
        import numpy as np

        rng = np.random.default_rng(7)
        lon = rng.uniform(-180, 180, 200)
        lat = rng.uniform(-90, 90, 200)
        res = 12
        df = spark.createDataFrame(pd.DataFrame({"lon": lon, "lat": lat}))
        got = [
            r.z
            for r in df.select(layout.zorder_key(F.col("lon"), F.col("lat"), res).alias("z"))
            .collect()
        ]
        # reference: decode the engine's own cell ids, interleave in numpy
        _, ix, iy = cellk.decode(cellk.encode(lon, lat, res))
        want = np.zeros(len(lon), dtype=np.int64)
        for b in range(res):
            want |= ((ix >> b) & 1) << (2 * b + 1)
            want |= ((iy >> b) & 1) << (2 * b)
        assert got == want.tolist()

    def test_zorder_locality_beats_random(self, spark):
        """Consecutive Z-keys are spatially near: the mean cell distance of
        key-adjacent points must be far below a random shuffle's."""
        import numpy as np

        rng = np.random.default_rng(11)
        lon = rng.uniform(-10, 10, 2000)
        lat = rng.uniform(-10, 10, 2000)
        res = 12
        _, ix, iy = cellk.decode(cellk.encode(lon, lat, res))
        z = np.zeros(len(lon), dtype=np.int64)
        for b in range(res):
            z |= ((ix >> b) & 1) << (2 * b + 1)
            z |= ((iy >> b) & 1) << (2 * b)
        order = np.argsort(z, kind="stable")
        d_sorted = np.abs(np.diff(ix[order])) + np.abs(np.diff(iy[order]))
        d_random = np.abs(np.diff(ix)) + np.abs(np.diff(iy))
        assert d_sorted.mean() < d_random.mean() / 10

    def test_layout_partitions_disjoint_key_ranges(self, spark):
        """After layout_by_zorder, per-partition [min,max] zkey ranges must
        not overlap — the invariant that makes file-level min/max stats
        prune bbox scans."""
        import numpy as np

        rng = np.random.default_rng(3)
        pdf = pd.DataFrame(
            {"lon": rng.uniform(-60, 60, 5000), "lat": rng.uniform(-60, 60, 5000)}
        )
        out = layout.layout_by_zorder(
            spark.createDataFrame(pdf), "lon", "lat", res=12, num_partitions=8
        )
        ranges = (
            out.groupBy(F.spark_partition_id().alias("pid"))
            .agg(F.min("zkey").alias("lo"), F.max("zkey").alias("hi"))
            .orderBy("lo")
            .collect()
        )
        assert len(ranges) > 1
        for a, b in zip(ranges, ranges[1:]):
            assert a.hi <= b.lo, f"overlapping partitions {a} {b}"


class TestCellRollup:
    def test_pyramid_conserves_counts(self, spark):
        import numpy as np

        rng = np.random.default_rng(5)
        pdf = pd.DataFrame(
            {"x": rng.uniform(-170, 170, 3000), "y": rng.uniform(-80, 80, 3000)}
        )
        out = layout.cell_rollup(spark.createDataFrame(pdf), "x", "y", 12, 7)
        per_level = {
            r.res: r.total
            for r in out.groupBy("res").agg(F.sum("n_points").alias("total")).collect()
        }
        assert set(per_level) == set(range(7, 13))
        assert all(v == 3000 for v in per_level.values())

    def test_parents_are_ancestors_of_children(self, spark):
        import numpy as np

        rng = np.random.default_rng(9)
        pdf = pd.DataFrame({"x": rng.uniform(-5, 5, 500), "y": rng.uniform(-5, 5, 500)})
        out = layout.cell_rollup(spark.createDataFrame(pdf), "x", "y", 10, 9).collect()
        fine = {r.cell: r.n_points for r in out if r.res == 10}
        coarse = {r.cell: r.n_points for r in out if r.res == 9}
        # summing fine children through the kernel's parent() reproduces coarse
        agg: dict[int, int] = {}
        for c, n in fine.items():
            p = int(cellk.parent(c, 9))
            agg[p] = agg.get(p, 0) + n
        assert agg == coarse


class TestTextScoring:
    def test_surprisal_partitioning_invariant(self, spark):
        from gdal_common_python_spark.operators.text import surprisal_bits

        docs = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": range(40),
                    "text": [
                        " ".join(["the", "rare%d" % (i % 7), "and"] * (i % 5 + 1))
                        for i in range(40)
                    ],
                }
            )
        )
        a = {r.doc_id: r.surprisal_bits for r in surprisal_bits(docs).collect()}
        b = {
            r.doc_id: r.surprisal_bits
            for r in surprisal_bits(docs.repartition(7)).collect()
        }
        assert a == b

    def test_surprisal_rare_scores_higher(self, spark):
        from gdal_common_python_spark.operators.text import surprisal_bits

        rows = [dict(doc_id=i, text="common common common") for i in range(20)]
        rows.append(dict(doc_id=99, text="xylophone quixotic zugzwang"))
        docs = spark.createDataFrame(pd.DataFrame(rows))
        out = {r.doc_id: r for r in surprisal_bits(docs).collect()}
        assert out[99].surprisal_bits > out[0].surprisal_bits

    def test_vocabulary_topk_tie_order(self, spark):
        from gdal_common_python_spark.operators.text import vocabulary

        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1, 2], "text": ["b a c a", "c b d"]})
        )
        rows = vocabulary(docs, top_k=3).collect()
        assert [(r.token, r.n_occurrences) for r in rows] == [
            ("a", 2), ("b", 2), ("c", 2),
        ]


class TestStratifiedSplit:
    def test_rates_and_determinism(self, spark):
        from gdal_common_python_spark.operators.curation import stratified_split

        docs = spark.range(4000).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
        )
        fr = {"train": 0.8, "val": 0.1, "test": 0.1}
        out = stratified_split(docs, fr, group_col="lang")
        counts = {
            (r.lang, r.split): r["count"]
            for r in out.groupBy("lang", "split").count().collect()
        }
        for lang in ("en", "de"):
            n = sum(v for (lg, _), v in counts.items() if lg == lang)
            for name, f in fr.items():
                got = counts.get((lang, name), 0) / n
                assert abs(got - f) < 0.05, (lang, name, got)
        # repartitioning must not move any row between splits
        again = stratified_split(docs.repartition(13), fr, group_col="lang")
        a = {(r.doc_id, r.split) for r in out.select("doc_id", "split").collect()}
        b = {(r.doc_id, r.split) for r in again.select("doc_id", "split").collect()}
        assert a == b

    def test_fraction_validation(self, spark):
        from gdal_common_python_spark.operators.curation import stratified_split

        docs = spark.range(5).select(F.col("id").alias("doc_id"), F.lit("en").alias("lang"))
        with pytest.raises(ValueError):
            stratified_split(docs, {"a": 0.9, "b": 0.2})
        with pytest.raises(ValueError):
            stratified_split(docs, {})


class TestGeohash:
    def test_known_vectors(self, spark):
        from gdal_common_python_spark.operators.layout import geohash

        pdf = pd.DataFrame(
            {
                "lon": [-5.6, -0.1278, 13.361389, 0.0, -179.9999, 179.9999],
                "lat": [42.6, 51.5074, 38.115556, 0.0, -89.9999, 89.9999],
            }
        )
        rows = (
            spark.createDataFrame(pdf)
            .select(geohash(F.col("lon"), F.col("lat"), 5).alias("g"))
            .collect()
        )
        # first three are the classic published vectors; the rest pin the
        # antimeridian/pole clipping behavior
        assert [r.g for r in rows] == ["ezs42", "gcpvj", "sqc8b", "s0000", "00000", "zzzzz"]

    def test_prefix_property(self, spark):
        """geohash(p) must be a prefix of geohash(p+k) — the property
        consumers rely on for prefix-range queries."""
        import numpy as np

        from gdal_common_python_spark.operators.layout import geohash

        rng = np.random.default_rng(13)
        pdf = pd.DataFrame(
            {"lon": rng.uniform(-180, 180, 500), "lat": rng.uniform(-90, 90, 500)}
        )
        rows = (
            spark.createDataFrame(pdf)
            .select(
                geohash(F.col("lon"), F.col("lat"), 4).alias("g4"),
                geohash(F.col("lon"), F.col("lat"), 9).alias("g9"),
            )
            .collect()
        )
        assert all(r.g9.startswith(r.g4) for r in rows)

    def test_precision_validation(self, spark):
        from gdal_common_python_spark.operators.layout import geohash

        with pytest.raises(ValueError):
            geohash(F.col("x"), F.col("y"), 0)
        with pytest.raises(ValueError):
            geohash(F.col("x"), F.col("y"), 13)


class TestBigramSurprisal:
    def test_partitioning_invariant(self, spark):
        from gdal_common_python_spark.operators.text import bigram_surprisal_bits

        docs = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": range(30),
                    "text": [
                        " ".join(["the cat sat on the mat"] * (i % 4 + 1))
                        for i in range(30)
                    ],
                }
            )
        )
        a = {r.doc_id: r.surprisal_bits for r in bigram_surprisal_bits(docs).collect()}
        b = {
            r.doc_id: r.surprisal_bits
            for r in bigram_surprisal_bits(docs.repartition(7)).collect()
        }
        assert a == b

    def test_unusual_pairing_scores_higher(self, spark):
        """Common words in a RARE pairing must out-score the common pairing:
        bigram surprisal sees what unigram surprisal cannot."""
        from gdal_common_python_spark.operators.text import (
            bigram_surprisal_bits,
            surprisal_bits,
        )

        rows = [dict(doc_id=i, text="good morning world") for i in range(32)]
        rows.append(dict(doc_id=99, text="morning good world"))  # same words, odd order
        docs = spark.createDataFrame(pd.DataFrame(rows))
        bi = {r.doc_id: r.surprisal_bits for r in bigram_surprisal_bits(docs).collect()}
        un = {r.doc_id: r.surprisal_bits for r in surprisal_bits(docs).collect()}
        assert bi[99] > bi[0]          # bigram model flags the odd order
        assert un[99] == un[0]          # unigram model cannot

    def test_short_docs_score_zero(self, spark):
        from gdal_common_python_spark.operators.text import bigram_surprisal_bits

        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1, 2, 3], "text": ["single", "", "two words"]})
        )
        out = {r.doc_id: r for r in bigram_surprisal_bits(docs).collect()}
        assert out[1].n_bigrams == 0 and out[2].n_bigrams == 0
        assert out[3].n_bigrams == 1
