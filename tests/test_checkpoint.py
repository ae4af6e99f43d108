"""Resumability: a partial run + resume yields identical output with no
recomputation of completed partitions (SURVEY §5.2 item 3d)."""

import os

from pyspark.sql import functions as F

from gdal_common_python_spark.streaming.checkpoint import CheckpointStore, run_stage


def _transform(df):
    return df.withColumn("n_spans", F.size("spans")).select("doc_id", "n_spans")


def test_partial_then_resume(spark, docs, tmp_path):
    base = str(tmp_path / "ckpt_run")
    store = CheckpointStore(base)

    # full expected output (stateless reference run)
    expected = {(r.doc_id, r.n_spans) for r in _transform(docs).collect()}

    # partial run: only 5 of 16 buckets
    part = run_stage(
        spark, store, "run1", "spanstats", docs, "doc_id", _transform,
        n_buckets=16, max_buckets=5,
    )
    lineage1 = store.committed("run1", "spanstats")
    assert len(lineage1) == 5
    assert set(lineage1.status) == {"done"}
    n_partial = part.count()
    assert 0 < n_partial < len(expected)

    # resume: completes the remaining buckets only
    full = run_stage(
        spark, store, "run1", "spanstats", docs, "doc_id", _transform, n_buckets=16
    )
    got = {(r.doc_id, r.n_spans) for r in full.collect()}
    assert got == expected

    lineage2 = store.committed("run1", "spanstats")
    assert len(lineage2) == 16
    # the 5 original bucket rows are untouched (no recomputation): identical
    # written_at timestamps survive the resume
    first = lineage1.set_index("partition_id")["written_at"]
    second = lineage2.set_index("partition_id")["written_at"]
    for b in first.index:
        assert second[b] == first[b]
    # lineage counts reconcile with the data
    assert int(lineage2.input_rows.sum()) == docs.count()
    assert int(lineage2.output_rows.sum()) == len(expected)

    # idempotent: a third invocation processes nothing new
    again = run_stage(
        spark, store, "run1", "spanstats", docs, "doc_id", _transform, n_buckets=16
    )
    assert again.count() == len(expected)
    assert len(store.committed("run1", "spanstats")) == 16


def test_crash_cleanup(spark, docs, tmp_path):
    """Uncommitted bucket data from a crashed run is wiped, not duplicated."""
    base = str(tmp_path / "ckpt_crash")
    store = CheckpointStore(base)
    data_dir = os.path.join(base, "st", "data")
    # simulate a crash: bucket dir exists but no manifest commit
    os.makedirs(os.path.join(data_dir, "__bucket=3"), exist_ok=True)
    _transform(docs).limit(1).withColumn("__bucket", F.lit(3)).write.mode(
        "append"
    ).partitionBy("__bucket").parquet(data_dir)
    out = run_stage(spark, store, "r", "st", docs, "doc_id", _transform, n_buckets=4)
    expected = {(r.doc_id, r.n_spans) for r in _transform(docs).collect()}
    assert {(r.doc_id, r.n_spans) for r in out.collect()} == expected


def test_mid_join_resume(spark, docs, zones, tmp_path):
    """The north-rule form: the checkpointed stage IS the flagship spatial
    join (bucket-local per doc_id — the zone side broadcasts), so a run
    killed mid-join resumes without recomputing completed buckets and
    reproduces the stateless join exactly."""
    from gdal_common_python_spark.operators import spatial_join as sj

    base = str(tmp_path / "ckpt_join")
    store = CheckpointStore(base)

    def join_t(df):
        return sj.spatial_join_points(spark, df, zones)

    expected = {
        (r.doc_id, r.offset, r.zone_id) for r in join_t(docs).collect()
    }

    part = run_stage(
        spark, store, "runj", "pipjoin", docs, "doc_id", join_t,
        n_buckets=8, max_buckets=3,
    )
    assert 0 < part.count() < len(expected)
    lineage1 = store.committed("runj", "pipjoin")
    assert len(lineage1) == 3

    full = run_stage(
        spark, store, "runj", "pipjoin", docs, "doc_id", join_t, n_buckets=8
    )
    got = {(r.doc_id, r.offset, r.zone_id) for r in full.collect()}
    assert got == expected
    lineage2 = store.committed("runj", "pipjoin")
    assert len(lineage2) == 8
    first = lineage1.set_index("partition_id")["written_at"]
    second = lineage2.set_index("partition_id")["written_at"]
    for b in first.index:
        assert second[b] == first[b]  # completed buckets never recomputed
    assert int(lineage2.input_rows.sum()) == docs.count()
    assert int(lineage2.output_rows.sum()) == len(expected)
