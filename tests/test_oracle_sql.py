"""Every registered oracle must parse AND execute on DuckDB.

tools/check_oracle.py runs the full Spark-vs-DuckDB comparison (~
minutes); this is the seconds-fast half of that gate — it catches
oracle SQL drift (dialect breakage, renamed columns, bad CTEs) in the
ordinary pytest run without starting Spark. Executes against the tiny
sf0.001 tables so degenerate-input paths (empty shingle lists, short
series) are exercised too.
"""

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def test_every_oracle_executes(con):
    from pliers_spark.queries import ORACLES

    failures = {}
    for name, sql in ORACLES.items():
        try:
            out = con.sql(sql)
            out.fetchmany(5)
            assert out.columns, name
        except Exception as e:  # noqa: BLE001 — collect all, report once
            failures[name] = f"{type(e).__name__}: {e}"
    assert not failures, failures


def test_oracle_column_names_are_lowercase_stable(con):
    """The driver sorts columns by name before hashing — mixed-case or
    engine-generated names (e.g. 'sum(x)') would break the cross-engine
    column alignment. Every oracle must emit plain lowercase aliases."""
    from pliers_spark.queries import ORACLES

    bad = {}
    for name, sql in ORACLES.items():
        cols = con.sql(sql).columns
        ugly = [c for c in cols if c != c.lower() or "(" in c or " " in c]
        if ugly:
            bad[name] = ugly
    assert not bad, bad
