"""Streaming replay gates: the windowed-count and continuous-flagship
replays must equal their batch semantics, with state genuinely crossing
micro-batch boundaries."""

import pandas as pd
from pyspark.sql import functions as F

from gdal_common_python_spark.schemas import DOCUMENTS
from gdal_common_python_spark.streaming.ingest import (
    deterministic_event_time,
    replay_cell_counts,
    replay_stream_spatial_join,
)
from gdal_common_python_spark.streaming.replay import batch_ix_expr


def _doc(doc_id, x, y):
    return (doc_id, [{"kind": "geo", "text": f"POINT({x} {y})", "media_ref": None, "offset": 0}])


def test_cell_counts_accumulate_across_batches(spark):
    """Two docs at the SAME point whose md5 draws land them in DIFFERENT
    micro-batches AND the same event-time window: the final count must be
    2 — proving the window state survived the batch boundary (a per-batch
    aggregation would report two rows or a count of 1)."""
    # find doc ids in different batches but the same 1-minute window
    probe = spark.createDataFrame(
        pd.DataFrame({"doc_id": [f"d{i:03d}" for i in range(120)]})
    ).select(
        "doc_id",
        batch_ix_expr("doc_id", 3).alias("b"),
        (deterministic_event_time().cast("long") / 60).cast("long").alias("win"),
    )
    rows = probe.collect()
    pick = None
    for a in rows:
        for b in rows:
            if a.b != b.b and a.win == b.win and a.doc_id != b.doc_id:
                pick = (a.doc_id, b.doc_id)
                break
        if pick:
            break
    assert pick, "no cross-batch same-window pair in the probe pool"
    docs = spark.createDataFrame(
        [_doc(pick[0], 1.5, 2.5), _doc(pick[1], 1.5, 2.5)], DOCUMENTS
    )
    out = replay_cell_counts(spark, docs, n_batches=3).collect()
    assert len(out) == 1 and out[0].n_spans == 2


def test_replay_empty_input_yields_empty_with_schema(spark):
    """Zero docs -> zero staged files -> the stream drains immediately and
    the replay returns an EMPTY DataFrame with the right schema instead of
    crashing on a fileless source dir."""
    docs = spark.createDataFrame([], DOCUMENTS)
    out = replay_cell_counts(spark, docs, n_batches=3)
    assert out.count() == 0
    assert out.columns == ["win_start", "cell", "n_spans"]


def test_replay_sparse_buckets_single_doc(spark):
    """One doc -> two of three md5 buckets stage NO file; the replay must
    still process the one real micro-batch."""
    docs = spark.createDataFrame([_doc("only", 1.5, 2.5)], DOCUMENTS)
    out = replay_cell_counts(spark, docs, n_batches=3).collect()
    assert len(out) == 1 and out[0].n_spans == 1


def test_stream_flagship_union_equals_batch(spark, docs, zones):
    """The appended union across micro-batches == the batch flagship on
    the same docs (stateless stream-static join, exactly-once source)."""
    from gdal_common_python_spark.operators import spatial_join as sj

    # deterministic subset (limit() may pick different rows per execution)
    small = docs.where(F.col("doc_id") < "doc00000200")
    got = {
        (r.doc_id, r.offset, r.zone_id)
        for r in replay_stream_spatial_join(spark, small, zones, n_batches=3).collect()
    }
    want = {
        (r.doc_id, r.offset, r.zone_id)
        for r in sj.spatial_join_points(spark, small, zones).collect()
    }
    assert got == want
