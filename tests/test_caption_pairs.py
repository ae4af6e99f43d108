"""caption_pairs: nearest-text-span pairing on the interleaved spans shape."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gdal_common_python_spark.operators.multimodal import caption_pairs


def _doc(doc_id, spans):
    return dict(
        doc_id=doc_id,
        spans=[
            dict(kind=k, text=t, media_ref=m, offset=i)
            for i, (k, t, m) in enumerate(spans)
        ],
    )


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # media at 1: text at 0 and 2 are tied -> preceding (offset 0) wins
        _doc("d1", [("text", "before", None), ("media", None, "img://a"),
                    ("text", "after", None)]),
        # media at 0: only following text exists
        _doc("d2", [("media", None, "img://b"), ("geo", "POINT(1 2)", None),
                    ("text", "far caption", None)]),
        # media-only doc -> no pair at all
        _doc("d3", [("media", None, "img://c"), ("media", None, "img://d")]),
        # two media share one text span
        _doc("d4", [("media", None, "img://e"), ("text", "shared", None),
                    ("media", None, "img://f")]),
    ]
    return spark.createDataFrame(pd.DataFrame(rows))


def test_nearest_and_tie_to_preceding(spark, docs):
    out = {(r.doc_id, r.media_ref): r for r in caption_pairs(docs).collect()}
    assert out[("d1", "img://a")].caption == "before"
    assert out[("d1", "img://a")].caption_off == 0


def test_geo_spans_never_caption(spark, docs):
    out = {(r.doc_id, r.media_ref): r for r in caption_pairs(docs).collect()}
    assert out[("d2", "img://b")].caption == "far caption"
    assert out[("d2", "img://b")].caption_off == 2


def test_no_text_no_row_and_sharing(spark, docs):
    rows = caption_pairs(docs).collect()
    assert not [r for r in rows if r.doc_id == "d3"]
    d4 = {r.media_ref: r.caption for r in rows if r.doc_id == "d4"}
    assert d4 == {"img://e": "shared", "img://f": "shared"}


def test_zero_shuffle_pure_codegen(spark, docs):
    plan = caption_pairs(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan
