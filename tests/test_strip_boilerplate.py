"""strip_boilerplate: doc-frequency strike semantics + plan shape."""

from gdal_common_python_spark.operators.curation import strip_boilerplate

_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)

_BP = "all rights reserved"


def _docs(spark):
    rows = [
        # boilerplate appears in d0, d1, d2 (3 distinct docs); "unique a/b"
        # appear once; d0 also repeats the boilerplate TWICE in one doc
        # (in-doc repetition does not inflate doc frequency)
        ("d0", [("text", _BP, None, 0), ("text", "unique a", None, 1),
                ("media", None, "m1", 2), ("text", _BP, None, 3)]),
        ("d1", [("text", "unique b", None, 0), ("text", _BP, None, 1)]),
        ("d2", [("text", _BP, None, 0)]),
        # "twice only" is in 2 docs — below the threshold of 3
        ("d3", [("text", "twice only", None, 0)]),
        ("d4", [("text", "twice only", None, 0),
                ("geo", _BP, None, 1)]),  # geo span text never qualifies
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def test_strike_and_reoffset(spark):
    out = strip_boilerplate(_docs(spark), min_doc_freq=3)
    got = {
        (r.doc_id, r.offset): (r.kind, r.text, r.media_ref)
        for r in out.collect()
    }
    assert got == {
        # d0: boilerplate@0 and @3 struck; survivors re-bound 0..1 in order
        ("d0", 0): ("text", "unique a", None),
        ("d0", 1): ("media", None, "m1"),
        ("d1", 0): ("text", "unique b", None),
        # d2 disappears: its only span was boilerplate
        ("d3", 0): ("text", "twice only", None),
        # d4: df("twice only")=2 < 3 kept; geo span carrying the same text
        # as the boilerplate is NOT a text span and survives
        ("d4", 0): ("text", "twice only", None),
        ("d4", 1): ("geo", _BP, None),
    }


def test_below_threshold_is_identity(spark):
    docs = _docs(spark)
    out = strip_boilerplate(docs, min_doc_freq=99)
    # nothing struck: every span survives with its original offset
    n_spans = sum(len(r.spans) for r in docs.collect())
    rows = out.collect()
    assert len(rows) == n_spans
    orig = {
        (r.doc_id, s.offset): (s.kind, s.text, s.media_ref)
        for r in docs.collect()
        for s in r.spans
    }
    got = {(r.doc_id, r.offset): (r.kind, r.text, r.media_ref) for r in rows}
    assert got == orig


def test_plan_shape_no_window_text_hashed(spark):
    out = strip_boilerplate(_docs(spark), min_doc_freq=3)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    # the strike path is window-free (rewrite_without contract) and the
    # doc-frequency aggregation keys on md5(text), never raw text
    assert "Window" not in plan
    assert "md5" in plan
