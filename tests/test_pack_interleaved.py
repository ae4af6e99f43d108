"""pack_interleaved: python-reference parity + plan shape."""

import hashlib

from pyspark.sql import functions as F

from gdal_common_python_spark.operators.curation import pack_interleaved

_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _shard(doc_id, n):
    return int(hashlib.md5(doc_id.encode()).hexdigest()[:8], 16) % n


def _cost(span, media_budget):
    if span[0] == "media":
        return media_budget
    t = (span[1] or "").strip()
    return len(t.split()) if t else 0


def test_matches_python_reference(spark):
    rows = [
        ("a", [("text", "one two three", None, 0), ("media", None, "m1", 1)]),
        ("b", [("media", None, "m2", 0)]),
        ("c", [("text", "x " * 50, None, 0)]),
        ("d", []),  # zero-cost doc occupies no space
        ("e", [("geo", "POINT(1 2)", None, 0), ("text", "tail", None, 1)]),
    ]
    cap, mb, ns = 16, 8, 4
    got = {r.doc_id: r for r in pack_interleaved(
        spark.createDataFrame(rows, _SCHEMA), capacity=cap, media_budget=mb,
        n_shards=ns,
    ).collect()}

    shards = {}
    for doc_id, spans in sorted(rows):
        shards.setdefault(_shard(doc_id, ns), []).append((doc_id, spans))
    for sh, docs in shards.items():
        cursor = 0
        for doc_id, spans in docs:
            cost = sum(_cost(s, mb) for s in spans)
            r = got[doc_id]
            assert r.shard == sh and r.n_cost == cost
            assert r.n_spans == len(spans)
            assert r.n_media_spans == sum(1 for s in spans if s[0] == "media")
            assert r.kind_seq == ",".join(s[0] for s in spans)
            assert r.start_seq == cursor // cap
            assert r.start_off == cursor % cap
            assert r.end_seq == (cursor + cost - 1) // cap
            cursor += cost
    assert len(got) == len(rows)


def test_only_narrow_columns_shuffle(spark):
    docs = spark.createDataFrame(
        [("a", [("text", "hello world", None, 0)])], _SCHEMA
    )
    out = pack_interleaved(docs, capacity=64)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    # span text is consumed before the exchange: the shuffled projection
    # must not carry the spans column, and nothing crosses into Python
    for node in ("MapInPandas", "BatchEvalPython", "ArrowEvalPython"):
        assert node not in plan
    # the exchange's input projection must not carry the spans column
    import re

    m = re.search(r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]", plan)
    assert m and not re.search(r"(?<![\w])spans#", m.group(1)), (
        m.group(1) if m else plan[:1500]
    )
