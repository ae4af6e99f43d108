"""Sequence packing (concat-then-chop) — layout invariants + oracle parity."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def packed(spark):
    from gdal_common_python_spark.operators import curation

    rows = [(i, " ".join(["tok"] * (7 + (i * 13) % 40))) for i in range(200)]
    rows.append((200, ""))  # zero-token doc
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = curation.pack_sequences(df, capacity=64, n_shards=8)
    return df, out.collect()


def test_no_gaps_no_overlaps(packed):
    """Within each shard, docs tile the token stream exactly: sorted by
    doc_id, each doc starts where the previous ended."""
    _, rows = packed
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.doc_id)
        cursor = 0
        for r in rs:
            assert r.start_seq * 64 + r.start_off == cursor, (shard, r)
            cursor += r.n_tokens
            assert r.end_seq == (cursor - 1) // 64 if r.n_tokens else True


def test_capacity_respected(packed):
    _, rows = packed
    for r in rows:
        assert 0 <= r.start_off < 64
        if r.n_tokens:
            assert r.end_seq >= r.start_seq


def test_zero_token_doc(packed):
    _, rows = packed
    z = next(r for r in rows if r.doc_id == 200)
    assert z.n_tokens == 0


def test_stable_under_repartitioning(spark, packed):
    from gdal_common_python_spark.operators import curation

    df, rows = packed
    again = curation.pack_sequences(df.repartition(13), capacity=64, n_shards=8)
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, rows))


def test_oracle_parity(spark, packed):
    import duckdb

    from gdal_common_python_spark.operators import curation

    df, rows = packed
    con = duckdb.connect()
    con.register("docs_tbl", df.toPandas())
    o = con.sql(
        curation.pack_sequences_oracle_sql("docs_tbl", 64, 8) + " ORDER BY doc_id"
    ).fetchall()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, o))
