"""Cache/persist hygiene: operators either persist nothing, or attach the
persisted handles to their result so ``util.release`` frees them — repeated
invocations in a long-lived application must not accrete executor storage.
Assertions are RELATIVE to the persistent-RDD count at entry, so earlier
session-scoped fixtures cannot mask a leak here."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gdal_common_python_spark.operators.util import release


from conftest import assert_no_new_persistent, persistent_ids


def _mk_zones(spark, rows, id_offset=0):
    return spark.createDataFrame(
        pd.DataFrame(
            [
                dict(
                    zone_id=id_offset + i,
                    rings=[[[x0, y0], [x1, y0], [x1, y1], [x0, y1]]],
                    bbox=dict(xmin=x0, ymin=y0, xmax=x1, ymax=y1),
                )
                for i, (x0, y0, x1, y1) in enumerate(rows)
            ]
        )
    )


class TestCacheHygiene:
    def test_erase_identity_persist_nothing(self, spark):
        from gdal_common_python_spark.operators.overlay import erase, identity

        left = _mk_zones(spark, [(0.0, 0.0, 4.0, 4.0), (10.0, 10.0, 12.0, 12.0)])
        right = _mk_zones(spark, [(1.0, 1.0, 3.0, 3.0)], id_offset=100)
        before = persistent_ids(spark)
        erase(spark, left, right).collect()
        identity(spark, left, right).collect()
        assert_no_new_persistent(spark, before)

    def test_knn_releases(self, spark, near_points):
        from gdal_common_python_spark.operators.knn import knn

        before = persistent_ids(spark)
        out = knn(spark, near_points, k=3)
        out.count()
        release(out)
        assert_no_new_persistent(spark, before)

    def test_lsh_pairs_release(self, spark, sf_dir):
        from gdal_common_python_spark.operators import dedup

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        before = persistent_ids(spark)
        signed = dedup.minhash_docs(docs, k=16, n=3)
        out = dedup.lsh_candidate_pairs(signed, bands=4, rows=4)
        out.count()
        release(out)
        assert_no_new_persistent(spark, before)

    def test_simhash_pairs_release(self, spark, sf_dir):
        from gdal_common_python_spark.operators import dedup

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        before = persistent_ids(spark)
        signed = dedup.simhash_docs(docs, bits=32)
        out = dedup.simhash_candidate_pairs(signed, bits=32, bands=4, max_hamming=3)
        out.count()
        release(out)
        assert_no_new_persistent(spark, before)

    def test_connected_components_bounded_and_releases(self, spark):
        from gdal_common_python_spark.operators.dissolve import connected_components

        # chain of overlapping squares -> needs several label iterations;
        # per-iteration label tables are reliable-checkpointed, not cached
        zones = _mk_zones(spark, [(float(i), 0.0, float(i) + 1.5, 1.0) for i in range(8)])
        before = persistent_ids(spark)
        out = connected_components(spark, zones)
        got = out.collect()
        # one component across the chain
        assert len({r.component for r in got}) == 1
        # while live: only the symmetric pair table stays cached
        assert len(persistent_ids(spark) - before) <= 1
        # path halving converges in O(log diameter), not O(diameter):
        # a diameter-7 chain must finish well under 7 propagation rounds
        assert out._gcp_cc_rounds <= 5
        # the returned plan is checkpoint-truncated — NOT the exponential
        # iteration lineage (regression guard: pre-fix, analysis cost of the
        # full chain plan reached minutes)
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "ExistingRDD" in plan or "LogicalRDD" in plan
        assert len(plan) < 4000
        release(out)
        assert_no_new_persistent(spark, before)

    def test_connected_components_string_ids(self, spark):
        # non-numeric zone ids have no sum image preserving the min order —
        # the convergence probe must fall back to the inequality join
        # (regression: a null decimal cast made round 1 look converged)
        from gdal_common_python_spark.operators.dissolve import connected_components

        zones = _mk_zones(
            spark, [(float(i), 0.0, float(i) + 1.5, 1.0) for i in range(5)]
        ).withColumn("zone_id", F.concat(F.lit("z"), F.col("zone_id")))
        got = connected_components(spark, zones).collect()
        assert len(got) == 5
        assert {r.component for r in got} == {"z0"}

    def test_simhash_invalid_banding_raises(self, spark, sf_dir):
        from gdal_common_python_spark.operators import dedup

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        signed = dedup.simhash_docs(docs.limit(2), bits=32)
        with pytest.raises(ValueError, match="max_hamming"):
            dedup.simhash_candidate_pairs(signed, bits=32, bands=4, max_hamming=4)


def test_nearest_zone_distance_releases(spark, docs, zones):
    from gdal_common_python_spark.operators import spatial_join as sj

    before = persistent_ids(spark)
    out = sj.nearest_zone_distance(spark, docs, zones)
    assert out.count() > 0
    release(out)
    assert_no_new_persistent(spark, before)
