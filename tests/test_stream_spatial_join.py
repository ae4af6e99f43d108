"""Streaming flagship: the batch spatial-join operator applied to a
readStream source must produce exactly the batch result on the same files."""

import os
import shutil
import time

import pytest

from gdal_common_python_spark.schemas import DOCUMENTS
from gdal_common_python_spark.operators import spatial_join as sj
from gdal_common_python_spark.streaming.ingest import stream_spatial_join


def test_stream_matches_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "in")
    os.makedirs(src)
    parts = sorted(os.listdir(os.path.join(sf_dir, "documents_spans.parquet")))[:2]
    for p in parts:
        shutil.copy(os.path.join(sf_dir, "documents_spans.parquet", p), src)

    zones = spark.read.parquet(os.path.join(sf_dir, "zones.parquet"))
    batch = {
        (r.doc_id, r.offset, r.zone_id)
        for r in sj.spatial_join_points(
            spark, spark.read.parquet(src), zones, strategy="broadcast"
        ).collect()
    }
    assert batch  # fixture must exercise the join

    stream = (
        spark.readStream.schema(DOCUMENTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_spatial_join(spark, stream, zones)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_stream_join")
        .start()
    )
    try:
        deadline = time.time() + 120
        got = set()
        while time.time() < deadline:
            q.processAllAvailable()
            got = {
                (r.doc_id, r.offset, r.zone_id)
                for r in spark.sql(
                    "SELECT doc_id, offset, zone_id FROM t_stream_join"
                ).collect()
            }
            if len(got) >= len(batch):
                break
            time.sleep(0.5)
        assert got == batch
    finally:
        q.stop()


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
