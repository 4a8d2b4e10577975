"""Driver-contract guard: entry()/queries()/oracle_sql() as the driver
exercises them — every query runs, every oracle-eligible one matches
DuckDB. Table-backed oracles check at sf0.001 (fast); corpus-backed
oracles (which bake the sf0.01 corpus path) check at sf0.01."""

import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

# Queries whose oracle reads a baked absolute corpus path (the
# synthetic sf0.01 corpus) instead of the registered testdata views.
# Derived from the SQL itself so newly added corpus-backed queries
# can't silently land in the wrong compare tier (a hand-kept list
# rotted once: corpus oracles checked at sf0.001 against an sf0.01
# path always mismatch).
def _corpus_oracles(orc: dict[str, str]) -> set[str]:
    return {name for name, sql in orc.items() if "read_parquet('/" in sql}


def _to_df(r):
    if isinstance(r, pd.DataFrame):
        return r
    return r.to_pandas()


def _compare(df, odf):
    cols = sorted(df.columns)
    a = df[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        if a[c].dtype != b[c].dtype:
            b[c] = b[c].astype(a[c].dtype)
    return a.equals(b)


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__ as e

    return e


def test_entry_runs(entrymod):
    ds = entrymod.entry()
    n = ds.count() if hasattr(ds, "count") else len(ds)
    assert n > 0
    # stable schema: the assignment table contract
    names = ds.schema().names if hasattr(ds, "schema") else list(ds.columns)
    assert "sig" in names and "cluster_seed" in names


def test_every_query_runs_small(entrymod):
    qs = entrymod.queries()
    orc = entrymod.oracle_sql()
    assert set(orc) <= set(qs), "oracle for a query that doesn't exist"
    for name, fn in qs.items():
        df = _to_df(fn(SF_SMALL))
        assert df is not None, name
        # queries may legitimately return 0 rows (e.g. no near-dup
        # embeddings in the testdata; Ray Data empty aggregates also
        # drop the schema) — non-empty results must carry columns
        assert len(df) == 0 or len(df.columns) > 0, name


def test_table_oracles_match(entrymod):
    qs, orc = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_SMALL}/{t}.parquet')"
        )
    skip = _corpus_oracles(orc)
    for name, sql in orc.items():
        if name in skip:
            continue
        df = _to_df(qs[name](SF_SMALL))
        odf = con.sql(sql).df()
        assert _compare(df, odf), f"{name}: ray != oracle at {SF_SMALL}"


def test_corpus_oracles_match(entrymod):
    qs, orc = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for name in sorted(_corpus_oracles(orc)):
        df = _to_df(qs[name](SF_ORACLE))
        odf = con.sql(orc[name]).df()
        assert _compare(df, odf), f"{name}: ray != oracle at {SF_ORACLE}"
