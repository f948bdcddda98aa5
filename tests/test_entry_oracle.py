"""Local mirror of the driver's correctness gate: run every
__spark_entry__ query on Spark and its oracle on DuckDB at sf0.001 and
compare row multisets exactly (columns sorted by name, rows sorted)."""

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            continue
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
        elif str(df[c].dtype).lower().startswith(("int", "uint")):
            df[c] = df[c].astype("Int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    got = q(spark, SF_DIR).toPandas()
    if sql is None:
        # rows-only contract (driver records a weaker check)
        assert len(got) > 0, f"{name}: rows-only query returned nothing"
        return
    want = ddb.sql(sql).df()
    g, w = _canon(got), _canon(want)
    assert list(g.columns) == list(w.columns), (name, list(g.columns), list(w.columns))
    assert len(g) == len(w), f"{name}: rows {len(g)} vs oracle {len(w)}"
    for c in g.columns:
        gc, wc = g[c], w[c]
        if gc.dtype == "float64":
            same = [
                (a == b) or (pd.isna(a) and pd.isna(b)) or
                (not pd.isna(a) and not pd.isna(b) and math.isclose(a, b, rel_tol=0, abs_tol=0))
                for a, b in zip(gc, wc)
            ]
            assert all(same), f"{name}.{c}: float mismatch"
        else:
            eq = gc.fillna("<NULL>") if gc.dtype == object else gc
            we = wc.fillna("<NULL>") if wc.dtype == object else wc
            assert eq.equals(we), f"{name}.{c}: mismatch\n{g[~ (eq == we)].head()}\n{w[~ (eq == we)].head()}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.columns) > 0
