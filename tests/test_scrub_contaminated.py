"""scrub_contaminated: span-level decontamination on the interleaved shape."""

from pyspark.sql import functions as F

from gdal_common_python_spark.operators.curation import scrub_contaminated


def _docs(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )


def _bench(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def test_contaminated_span_struck_order_preserved(spark):
    docs = _docs(spark, [
        ("d1", [
            ("text", "the quick brown fox", None, 0),
            ("media", None, "m://a", 1),
            ("text", "secret eval question here now", None, 2),
            ("text", "totally clean tail words", None, 3),
        ]),
    ])
    bench = _bench(spark, ["another doc with secret eval question inside"])
    out = scrub_contaminated(docs, bench, n=3).orderBy("offset").collect()
    assert [(r.offset, r.kind, r.text, r.media_ref) for r in out] == [
        (0, "text", "the quick brown fox", None),
        (1, "media", None, "m://a"),
        (2, "text", "totally clean tail words", None),
    ]


def test_clean_doc_untouched_and_fully_dirty_doc_disappears(spark):
    docs = _docs(spark, [
        ("clean", [("text", "nothing shared at all", None, 0)]),
        ("dirty", [("text", "exact benchmark passage text", None, 0)]),
    ])
    bench = _bench(spark, ["exact benchmark passage text"])
    out = scrub_contaminated(docs, bench, n=3)
    assert [r.doc_id for r in out.collect()] == ["clean"]


def test_media_spans_never_qualify(spark):
    docs = _docs(spark, [("d", [("media", None, "m://x", 0)])])
    bench = _bench(spark, ["anything at all here"])
    out = scrub_contaminated(docs, bench, n=3).collect()
    assert [(r.kind, r.media_ref) for r in out] == [("media", "m://x")]
