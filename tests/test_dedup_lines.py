"""Segment-level corpus dedup (dedup_segments) — semantics + edge cases."""

import pytest


BOILER = "a b c d e f g h"  # exactly one 8-token window


@pytest.fixture(scope="module")
def table(spark):
    rows = [
        # two docs share the BOILER segment at window 0 -> both struck
        (0, BOILER + " unique zero tail"),
        (1, BOILER + " other one tail"),
        # unique doc, nothing struck
        (2, "solo words only here never repeated anywhere at all"),
        # doc that is ENTIRELY a duplicated segment -> clean_text = ''
        (3, BOILER),
        (4, BOILER),
        # empty text -> one '' segment; unique unless another empty doc
        (5, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def run(spark, table):
    from gdal_common_python_spark.operators import dedup

    out = dedup.dedup_segments(table, window=8, max_count=1)
    return {r.doc_id: r for r in out.collect()}


def test_strikes_every_occurrence(spark, table):
    got = run(spark, table)
    assert got[0].clean_text == "unique zero tail"
    assert got[1].clean_text == "other one tail"
    assert got[0].n_removed == 1 and got[0].n_segments == 2


def test_untouched_doc(spark, table):
    got = run(spark, table)
    assert got[2].clean_text == "solo words only here never repeated anywhere at all"
    assert got[2].n_removed == 0


def test_fully_struck_doc_survives_as_empty(spark, table):
    got = run(spark, table)
    assert set(got) == {0, 1, 2, 3, 4, 5}
    assert got[3].clean_text == "" and got[3].n_removed == 1
    assert got[4].clean_text == ""


def test_empty_text(spark, table):
    got = run(spark, table)
    assert got[5].clean_text == "" and got[5].n_segments == 1
    assert got[5].n_removed == 0  # the '' segment is unique in this corpus


def test_oracle_parity(spark, table):
    import duckdb

    from gdal_common_python_spark.operators import dedup

    pdf = table.toPandas()
    con = duckdb.connect()
    con.register("docs_tbl", pdf)
    got = run(spark, table)
    oracle = con.sql(
        dedup.dedup_segments_oracle_sql("docs_tbl", window=8, max_count=1)
        + " ORDER BY doc_id"
    ).fetchall()
    for doc_id, clean, nseg, nrm in oracle:
        r = got[doc_id]
        assert (r.clean_text, r.n_segments, r.n_removed) == (clean, nseg, nrm)


class TestDupPassages:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        shared = "p q r s t u v w x y"  # 10 tokens -> 3 dup 8-gram positions
        rows = [
            (0, "alpha " + shared + " beta gamma"),
            (1, "delta " + shared + " epsilon"),
            (2, "totally unrelated words only here nothing shared at all now"),
            (3, "short doc"),
        ]
        return spark.createDataFrame(rows, ["doc_id", "text"])

    def test_passages_found_and_merged(self, spark, corpus):
        from gdal_common_python_spark.operators import dedup

        out = {r.doc_id: r for r in dedup.duplicate_passages(corpus, k=8).collect()}
        # doc 0: shared block starts at token 1, 3 consecutive dup positions
        # (1..3), passage = [1, 3+8) = [1, 11)
        assert out[0].start_tok == 1 and out[0].end_tok == 11 and out[0].n_grams == 3
        assert out[1].start_tok == 1 and out[1].end_tok == 11
        assert 2 not in out and 3 not in out

    def test_stable_under_repartitioning(self, spark, corpus):
        from gdal_common_python_spark.operators import dedup

        a = dedup.duplicate_passages(corpus, k=8).collect()
        b = dedup.duplicate_passages(corpus.repartition(5), k=8).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_validation(self, spark, corpus):
        from gdal_common_python_spark.operators import dedup

        with pytest.raises(ValueError):
            dedup.duplicate_passages(corpus, k=0)
