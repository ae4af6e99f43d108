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
