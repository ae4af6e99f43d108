"""source_cap + mixture_sample — determinism, cap and budget semantics."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    for g, n in [("a", 30), ("b", 10), ("c", 20)]:
        for i in range(n):
            rows.append((len(rows), g, " ".join(["w"] * 10)))
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


def test_cap_enforced_and_stable(spark, docs):
    from gdal_common_python_spark.operators import curation

    out = curation.source_cap(docs, 15)
    per = {r.source: r.cnt for r in out.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    assert per == {"a": 15, "b": 10, "c": 15}
    again = curation.source_cap(docs.repartition(9), 15)
    assert sorted(r.doc_id for r in out.collect()) == sorted(r.doc_id for r in again.collect())


def test_cap_rank_range(spark, docs):
    from gdal_common_python_spark.operators import curation

    out = curation.source_cap(docs, 15).collect()
    assert all(1 <= r.grp_rank <= 15 for r in out)


def test_mixture_budget_and_weights(spark, docs):
    from gdal_common_python_spark.operators import curation

    # group token counts: a=300, b=100, c=200
    out = curation.mixture_sample(
        docs, {"a": 0.5, "b": 0.5}, token_budget=200
    ).collect()
    fr = {r.source: r.keep_frac for r in out}
    # a: 200*0.5/300 = 1/3; b: 200*0.5/100 = 1.0 (capped) -> all of b kept
    assert fr["a"] == pytest.approx(1 / 3)
    assert fr["b"] == 1.0
    assert sum(1 for r in out if r.source == "b") == 10
    assert {r.source for r in out} == {"a", "b"}  # c dropped (no weight)


def test_mixture_deterministic(spark, docs):
    from gdal_common_python_spark.operators import curation

    a = curation.mixture_sample(docs, {"a": 0.6, "c": 0.4}, 150).collect()
    b = curation.mixture_sample(docs.repartition(7), {"a": 0.6, "c": 0.4}, 150).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_validation(spark, docs):
    from gdal_common_python_spark.operators import curation

    with pytest.raises(ValueError):
        curation.source_cap(docs, 0)
    with pytest.raises(ValueError):
        curation.mixture_sample(docs, {"a": 1.0}, 0)
