"""chunk_interleaved: python-reference parity + Exchange-free plan pin."""

import re

from pyspark.sql import functions as F

from gdal_common_python_spark.operators.curation import chunk_interleaved


def _ref_chunks(spans, max_tokens, media_budget):
    out = []
    cum = 0
    for s in spans:
        cost = media_budget if s["kind"] == "media" else len(s["text"].split())
        out.append((cum // max_tokens, s["kind"], cost))
        cum += cost
    chunks = {}
    for cix, kind, cost in out:
        c = chunks.setdefault(cix, dict(n=0, media=0, cost=0, seq=[]))
        c["n"] += 1
        c["media"] += kind == "media"
        c["cost"] += cost
        c["seq"].append(kind)
    return chunks


import pytest


@pytest.mark.parametrize("impl", ["native", "arrow"])
def test_matches_python_reference(spark, docs, impl):
    sample = docs.limit(200).collect()
    got = {
        (r.doc_id, r.chunk_ix): r
        for r in chunk_interleaved(
            docs.limit(200), max_tokens=64, media_budget=32, impl=impl
        ).collect()
    }
    n_checked = 0
    for d in sample:
        spans = [s.asDict() for s in d.spans]
        for cix, c in _ref_chunks(spans, 64, 32).items():
            r = got.pop((d.doc_id, cix))
            assert r.n_spans == c["n"] and r.n_media_spans == c["media"]
            assert r.chunk_cost == c["cost"]
            assert r.kind_seq == ",".join(c["seq"])
            n_checked += 1
    assert not got and n_checked > 200


def test_span_never_splits_and_order_preserved(spark, docs):
    out = chunk_interleaved(docs, max_tokens=64, media_budget=32)
    # chunk ids per doc are 0..max contiguous? not necessarily contiguous
    # (a 32-cost media span can jump a boundary) — but they are increasing
    # and every span lands in exactly one chunk: total spans conserved
    n_spans_in = docs.select(F.sum(F.size("spans"))).first()[0]
    n_spans_out = out.agg(F.sum("n_spans")).first()[0]
    assert n_spans_in == n_spans_out


def test_plan_is_exchange_free(spark, docs):
    # default (native) impl: the whole operator is JVM-side higher-order
    # array expressions — no shuffle, no Python/Arrow crossing at all
    out = chunk_interleaved(docs, max_tokens=64, media_budget=32)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert not re.search(r"Exchange", plan), plan[:2000]
    assert "MapInPandas" not in plan and "Python" not in plan, plan[:2000]

    # arrow fallback: one Arrow kernel over the narrow (costs, kinds)
    # projection; span text is consumed JVM-side (token_count inside the
    # transform) and must not appear in the kernel's input schema
    out = chunk_interleaved(docs, max_tokens=64, media_budget=32, impl="arrow")
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert not re.search(r"Exchange", plan), plan[:2000]
    assert "MapInPandas" in plan
    m = re.search(r"\(\d+\) MapInPandas\n(?:.+\n)+?", plan)
    detail = plan[m.start() : m.start() + 600]
    assert "__costs" in detail and "text#" not in detail, detail


def test_impl_validation(spark, docs):
    with pytest.raises(ValueError, match="impl must be"):
        chunk_interleaved(docs, impl="bogus")


def test_empty_and_degenerate_docs(spark):
    """Docs with an empty spans array emit no chunks (the oracle's unnest
    of an empty list), and an all-empty batch doesn't crash the kernel."""
    rows = [
        ("d0", []),
        ("d1", [("text", "three tokens here", None, 0), ("media", None, "m1", 1)]),
        ("d2", []),
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    out = chunk_interleaved(docs, max_tokens=64, media_budget=32).collect()
    assert {r.doc_id for r in out} == {"d1"}
    (r,) = out
    assert (r.chunk_ix, r.n_spans, r.n_media_spans, r.chunk_cost, r.kind_seq) == (
        0, 2, 1, 35, "text,media",
    )
    # all-empty input
    empty = spark.createDataFrame(
        [("e0", []), ("e1", [])],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    assert chunk_interleaved(empty, max_tokens=8).count() == 0
