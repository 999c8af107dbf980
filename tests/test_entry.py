"""Local mirror of the driver's correctness gate: run every queries() entry
and compare against oracle_sql() via DuckDB — row count, column names, and
exact value equality after column-name sort (the driver hashes values, so we
compare exactly, not approximately)."""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


ORACLES = entrymod.oracle_sql()
ALL_QUERIES = entrymod.queries()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert "doc_id" in df.columns and "score" in df.columns


@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
def test_query_vs_oracle(spark, con, name):
    got = ALL_QUERIES[name](spark, SF).toPandas()
    if name not in ORACLES:
        # rows-only check (sketch/approx ops): non-crashing, sane output
        assert got is not None
        return
    exp = con.execute(ORACLES[name]).df()
    assert sorted(got.columns) == sorted(exp.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: {len(got)} rows vs oracle {len(exp)}"
    g, e = _canon(got), _canon(exp)
    for c in g.columns:
        gv, ev = g[c].tolist(), e[c].tolist()
        assert gv == ev, (
            f"{name}: column {c} differs; first diff at "
            f"{next((i, a, b) for i, (a, b) in enumerate(zip(gv, ev)) if a != b)}"
        )
