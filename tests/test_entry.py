"""Driver-contract smoke: entry() runs, queries()/oracle_sql() consistent."""

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"doc_id", "offset", "zone_id"}


def test_contract_consistency():
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    assert set(osql) <= set(qs), set(osql) - set(qs)
    assert len(qs) >= 20
