"""render_interleaved: serialization semantics on hand-built docs."""

import pytest

from gdal_common_python_spark.operators.multimodal import render_interleaved

_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _docs(spark):
    rows = [
        ("d0", [("text", "alpha", None, 0), ("media", None, "m1", 1),
                ("geo", "POINT(1 2)", None, 2), ("text", "beta", None, 3)]),
        ("d1", [("geo", "POINT(3 4)", None, 0)]),   # renders to ''
        ("d2", [("text", None, None, 0)]),          # null text -> ''
        ("d3", []),                                 # empty spans -> ''
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def test_default_drop_geo(spark):
    out = {r.doc_id: r for r in render_interleaved(_docs(spark)).collect()}
    assert out["d0"].text == "alpha\n<|media|>\nbeta"
    assert (out["d0"].n_text, out["d0"].n_media) == (2, 1)
    assert out["d0"].n_chars == len(out["d0"].text)
    assert out["d1"].text == "" and out["d1"].n_chars == 0
    assert out["d2"].text == "" and out["d2"].n_text == 1
    assert out["d3"].text == "" and (out["d3"].n_text, out["d3"].n_media) == (0, 0)


def test_wkt_mode_and_custom_sentinel(spark):
    out = {
        r.doc_id: r.text
        for r in render_interleaved(
            _docs(spark), media_sentinel="<img>", sep=" ", geo="wkt"
        ).collect()
    }
    assert out["d0"] == "alpha <img> POINT(1 2) beta"
    assert out["d1"] == "POINT(3 4)"


def test_bad_geo_mode_raises(spark):
    with pytest.raises(ValueError):
        render_interleaved(_docs(spark), geo="nope")


def test_span_kind_transitions_planted(spark):
    from gdal_common_python_spark.operators.multimodal import span_kind_transitions

    docs = spark.createDataFrame(
        [
            ("d0", [("text", "a", None, 0), ("media", None, "m", 1),
                    ("text", "b", None, 2)]),
            ("d1", [("text", "c", None, 0)]),
            ("d2", []),
        ],
        _SCHEMA,
    )
    got = {
        (r.from_kind, r.to_kind): r.n
        for r in span_kind_transitions(docs).collect()
    }
    assert got == {
        ("^", "text"): 2,
        ("text", "media"): 1,
        ("media", "text"): 1,
    }
