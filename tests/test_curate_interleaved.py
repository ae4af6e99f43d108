"""curate_interleaved: end-to-end interleaved recipe semantics + plan shape."""

import pandas as pd
import pytest

from gdal_common_python_spark.pipelines import curate_interleaved


def _doc(doc_id, spans):
    return dict(
        doc_id=doc_id,
        spans=[
            dict(kind=k, text=t, media_ref=m, offset=i)
            for i, (k, t, m) in enumerate(spans)
        ],
    )


GOOD = ("text", "Alpha beta gamma delta epsilon zeta eta theta iota kappa.", None)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        _doc("a", [GOOD, ("media", None, "img://1")]),
        _doc("b", [GOOD, ("media", None, "img://1")]),   # exact dup of a
        _doc("c", [GOOD, ("media", None, "img://2")]),   # same text, OTHER media
        _doc("d", [("media", None, "img://1"), GOOD]),   # same content, other ORDER
        _doc("e", [("text", "x", None)]),                # fails min_tokens
    ]
    return spark.createDataFrame(pd.DataFrame(rows))


def test_identity_includes_media_and_order(spark, docs):
    out = curate_interleaved(docs, capacity=64).select("doc_id").distinct()
    kept = {r.doc_id for r in out.collect()}
    # b merges into a; c and d survive (media / order differ); e gated out
    assert kept == {"a", "c", "d"}


def test_two_shuffles_only(spark, docs):
    plan = curate_interleaved(docs, capacity=64)._jdf.queryExecution().executedPlan().toString()
    # dedup window exchange + pack's cost-triple exchange; the spans column
    # must not appear in any exchange projection (text never shuffles)
    assert plan.count("Exchange") <= 3  # 2 logical; AQE may add a reuse node
    assert "Python" not in plan
