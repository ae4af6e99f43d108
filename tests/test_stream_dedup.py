"""Stateful streaming dedup: first-seen filter across micro-batches
(applyInPandasWithState), including cross-batch duplicate suppression."""

import os
import time

import pandas as pd
import pytest

from gdal_common_python_spark.schemas import DOCUMENTS
from gdal_common_python_spark.streaming.dedup import (
    doc_fingerprint_expr,
    run_dedup_to_memory,
)


def _write_docs(spark, path, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "spans"])
    spark.createDataFrame(pdf, schema=DOCUMENTS).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def _span(kind, text, ref, off):
    return {"kind": kind, "text": text, "media_ref": ref, "offset": off}


SPANS_A = [_span("text", "hello world", None, 0), _span("geo", "POINT(1 2)", None, 1)]
SPANS_B = [_span("text", "unique doc", None, 0)]
SPANS_C = [_span("media", None, "img://1", 0), _span("text", "tail", None, 1)]


class TestStreamDedup:
    def test_first_seen_across_batches(self, spark, tmp_path):
        src = str(tmp_path / "in")
        os.makedirs(src)
        staging = str(tmp_path / "staging")

        # batch 1: two distinct docs, plus an in-batch duplicate of d1
        _write_docs(
            spark,
            staging,
            [("d1", SPANS_A), ("d2", SPANS_B), ("d9", SPANS_A)],
        )
        files = [f for f in os.listdir(staging) if f.endswith(".parquet")]
        os.rename(os.path.join(staging, files[0]), os.path.join(src, "b1.parquet"))

        q = run_dedup_to_memory(spark, src, query_name="t_dedup")
        try:
            q.processAllAvailable()
            got = {
                (r.fp, r.doc_id)
                for r in spark.sql("SELECT fp, doc_id FROM t_dedup").collect()
            }
            # d1 wins over in-batch dup d9 (min doc_id); d2 is its own group
            assert {d for _, d in got} == {"d1", "d2"}

            # batch 2: a cross-batch duplicate of d1 and one genuinely new doc
            _write_docs(spark, staging, [("d3", SPANS_A), ("d4", SPANS_C)])
            files = [f for f in os.listdir(staging) if f.endswith(".parquet")]
            os.rename(os.path.join(staging, files[0]), os.path.join(src, "b2.parquet"))
            deadline = time.time() + 60
            ids = set()
            while time.time() < deadline:
                q.processAllAvailable()
                ids = {
                    r.doc_id for r in spark.sql("SELECT doc_id FROM t_dedup").collect()
                }
                if "d4" in ids:
                    break
                time.sleep(0.5)
            # d3 suppressed by state from batch 1; d4 emitted
            assert ids == {"d1", "d2", "d4"}
        finally:
            q.stop()

    def test_fingerprint_distinguishes_order_and_media(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame(
                [
                    ("a", SPANS_A),
                    ("b", list(reversed(SPANS_A))),  # same spans, swapped order
                    ("c", SPANS_A),
                ],
                columns=["doc_id", "spans"],
            ),
            schema=DOCUMENTS,
        )
        fps = dict(
            (r.doc_id, r.fp)
            for r in df.select("doc_id", doc_fingerprint_expr().alias("fp")).collect()
        )
        assert fps["a"] == fps["c"]
        assert fps["a"] != fps["b"]


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
