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

    def test_replay_first_seen_beats_global_min(self, spark):
        """The replay harness must keep the EARLIEST-batch winner even when
        a later batch carries a smaller doc_id for the same fingerprint —
        exactly the property separating first-seen streaming semantics from
        a naive global md5-min, and the argmin (batch_ix, doc_id) contract
        the oracle SQL encodes."""
        from pyspark.sql import functions as F

        from gdal_common_python_spark.streaming.dedup import replay_first_seen

        # find doc_ids landing in different md5 buckets (mirrors the
        # operator's own bucket draw) so we can place a smaller id later
        def bucket(doc_id, n=4):
            row = (
                spark.range(1)
                .select(
                    (
                        F.conv(F.substring(F.md5(F.lit(doc_id)), 1, 8), 16, 10)
                        .cast("long")
                        % n
                    ).alias("b")
                )
                .collect()[0]
            )
            return row.b

        # pick an earliest-batch doc with a LARGER id, plus a smaller id in
        # a strictly later batch
        pool = {f"doc{i:03d}": bucket(f"doc{i:03d}") for i in range(64)}
        pick = None
        for hi, hb in pool.items():
            for lo, lb in pool.items():
                if lo < hi and lb > hb:  # smaller id arrives in LATER batch
                    pick = (hi, hb, lo, lb)
                    break
            if pick:
                break
        assert pick, "no bucket-ordered pair found in the pool"
        hi, hb, lo, lb = pick
        docs = spark.createDataFrame(
            pd.DataFrame(
                [(hi, SPANS_A), (lo, SPANS_A), ("other", SPANS_B)],
                columns=["doc_id", "spans"],
            ),
            schema=DOCUMENTS,
        )
        got = {(r.fp, r.doc_id) for r in replay_first_seen(spark, docs).collect()}
        winners = {d for _, d in got}
        # first-seen keeps hi (earlier batch) — global min would keep lo
        assert hi in winners and lo not in winners
        assert len(got) == 2  # two distinct fingerprints survive

    def test_fingerprint_distinguishes_order_and_media(self, spark):
        # content order is the OFFSET order, not the storage order
        # (round-5 advice: the oracles aggregate ORDER BY offset, so the
        # engine canonicalizes by offset before folding): a shuffled
        # ARRAY with unchanged offsets is the same document; swapping the
        # spans' OFFSETS is a different document
        swapped_offsets = [
            _span("text", "hello world", None, 1),
            _span("geo", "POINT(1 2)", None, 0),
        ]
        df = spark.createDataFrame(
            pd.DataFrame(
                [
                    ("a", SPANS_A),
                    ("b", swapped_offsets),  # same spans at swapped offsets
                    ("c", SPANS_A),
                    ("d", list(reversed(SPANS_A))),  # storage order only
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
        assert fps["a"] == fps["d"]  # canonical: offset order wins
        assert fps["a"] != fps["b"]


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
