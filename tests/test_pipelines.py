"""End-to-end curation recipe: stage semantics + chain determinism. The
driver gate (curated_chunks) hash-pins the full chain vs a composed SQL
oracle at sf0.01.
"""

import pandas as pd
from pyspark.sql import functions as F

from gdal_common_python_spark import pipelines


def _docs(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "lang", "text"]))


GOOD = " ".join(["the quick brown fox jumps over lazy dogs again and again"] * 3)


class TestCurateCorpus:
    def test_stages_filter_as_specified(self, spark):
        rows = [
            (1, "en", GOOD),            # survives everything (draw-dependent split)
            (2, "en", GOOD),            # exact dup of 1 -> dropped (min id wins)
            (3, "en", "short"),         # < 5 tokens -> dropped
            (4, "en", "!!! ??? ... ;;; ::: !!!"),  # punctuation -> low quality
        ]
        out = pipelines.curate_corpus(
            _docs(spark, rows), split_fracs={"train": 1.0}, keep_split="train"
        )
        ids = {r.doc_id for r in out.collect()}
        assert ids == {1}

    def test_chain_is_partitioning_invariant(self, spark):
        rows = [
            (i, ["en", "de"][i % 2], GOOD + f" variant{i} " + "filler word " * (i % 7))
            for i in range(200)
        ]
        a = pipelines.curate_corpus(_docs(spark, rows))
        b = pipelines.curate_corpus(_docs(spark, rows).repartition(13))
        ka = {(r.doc_id, r.chunk_ix, r.chunk_text) for r in a.collect()}
        kb = {(r.doc_id, r.chunk_ix, r.chunk_text) for r in b.collect()}
        assert ka == kb and len(ka) > 0

    def test_chain_is_one_plan_two_shuffles(self, spark):
        rows = [(1, "en", GOOD)]
        out = pipelines.curate_corpus(_docs(spark, rows))
        p = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        shuffles = [ln for ln in p.splitlines() if "Arguments: hashpartitioning" in ln]
        assert len(shuffles) <= 2, shuffles  # dedup window only (+AQE variance)
        assert "Python" not in p  # fully JVM-side
