"""Driver-contract smoke: entry() returns rows with a stable schema; every
query has an oracle or is explicitly rows-only."""

import __spark_entry__ as E


def test_entry_runs(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert df.columns[0] == "doc_id"


def test_queries_have_oracles(spark):
    qs = E.queries()
    oracles = E.oracle_sql()
    assert len(qs) >= 30
    missing = set(oracles) - set(qs)
    assert not missing  # every oracle belongs to a query


def test_each_query_runs_at_sf0001(spark):
    sf = "/root/testdata/sf0.001"
    for name, fn in E.queries().items():
        df = fn(spark, sf)
        assert df.schema is not None, name
