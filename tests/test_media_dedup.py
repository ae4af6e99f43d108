"""media_dedup: canonical-selection semantics + plan shape."""

from gdal_common_python_spark.operators.multimodal import media_dedup

_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _docs(spark):
    rows = [
        # m1 appears in d1@2, d0@5, d0@1 -> canonical d0@1, dups d0@5 d1@2
        ("d1", [("media", None, "m1", 2)]),
        ("d0", [("media", None, "m1", 1), ("media", None, "m1", 5),
                ("text", "hello world", None, 3)]),
        # m2 appears once -> no dup rows
        ("d2", [("media", None, "m2", 0)]),
        # no media spans at all
        ("d3", [("text", "only text", None, 0)]),
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def test_canonical_is_lexicographic_minimum(spark):
    out = {
        (r.media_ref, r.doc_id, r.offset): (r.canonical_doc_id, r.canonical_offset)
        for r in media_dedup(_docs(spark)).collect()
    }
    assert out == {
        ("m1", "d0", 5): ("d0", 1),
        ("m1", "d1", 2): ("d0", 1),
    }


def test_plan_has_no_window_and_partial_agg(spark):
    out = media_dedup(_docs(spark))
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    # skew-safe shape: a PARTIAL aggregate before the exchange (map-side
    # combine collapses hot refs; struct-min lowers to SortAggregate),
    # and no Window anywhere
    assert "Window" not in plan
    assert plan.count("SortAggregate") + plan.count("HashAggregate") >= 2, plan[:1500]


class TestRewriteDedupMedia:
    @staticmethod
    def _docs(spark):
        import pandas as pd

        def doc(doc_id, spans):
            return dict(
                doc_id=doc_id,
                spans=[
                    dict(kind=k, text=t, media_ref=m, offset=i)
                    for i, (k, t, m) in enumerate(spans)
                ],
            )

        rows = [
            doc("a", [("text", "t0", None), ("media", None, "img://x"),
                      ("text", "t2", None)]),
            # img://x duplicates a's (canonical is ("a",1)); img://y unique
            doc("b", [("media", None, "img://x"), ("text", "u1", None),
                      ("media", None, "img://y")]),
        ]
        return spark.createDataFrame(pd.DataFrame(rows))

    def test_strike_and_reoffset(self, spark):
        from gdal_common_python_spark.operators.multimodal import rewrite_dedup_media

        out = rewrite_dedup_media(self._docs(spark)).collect()
        a = sorted([(r.offset, r.kind, r.text, r.media_ref) for r in out if r.doc_id == "a"])
        b = sorted([(r.offset, r.kind, r.text, r.media_ref) for r in out if r.doc_id == "b"])
        # canonical doc untouched
        assert a == [(0, "text", "t0", None), (1, "media", None, "img://x"),
                     (2, "text", "t2", None)]
        # b loses its img://x copy; survivors re-bind to dense 0..1 in order
        assert b == [(0, "text", "u1", None), (1, "media", None, "img://y")]

    def test_order_invariant_preserved(self, spark):
        from gdal_common_python_spark.operators.multimodal import rewrite_dedup_media

        from pyspark.sql import functions as F

        out = rewrite_dedup_media(self._docs(spark))
        per_doc = out.groupBy("doc_id").agg(
            F.count("*").alias("n"), F.max("offset").alias("mx"),
            F.min("offset").alias("mn"),
        ).collect()
        for r in per_doc:  # offsets dense 0..n-1 per doc
            assert r.mn == 0 and r.mx == r.n - 1
