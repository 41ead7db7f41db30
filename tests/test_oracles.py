"""Local replica of the driver's correctness gate: run every queries()
entry and its oracle_sql() twin over the same sf dir; compare row count,
column names, and order-insensitive values."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("uint", "int", "Int")):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == bool:
            df[c] = df[c].astype(bool)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__
    return __ray_entry__


def test_entry_smoke(entry_mod):
    out = entry_mod.entry()
    n = out.count() if callable(getattr(out, "count", None)) else len(out)
    assert n > 0
    schema = out.schema
    if callable(schema):
        schema = schema()
    assert schema is not None


def _oracle_pairs():
    import __ray_entry__
    q = __ray_entry__.queries()
    sql = __ray_entry__.oracle_sql()
    return sorted(set(q) & set(sql))


@pytest.mark.parametrize("name", _oracle_pairs())
def test_query_matches_oracle(entry_mod, duck, sf_dir, name):
    ray_fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    mine = _canon(_to_pandas(ray_fn(sf_dir)))
    ref = _canon(duck.execute(sql).fetchdf())
    assert list(mine.columns) == list(ref.columns), \
        f"{name}: columns {list(mine.columns)} vs {list(ref.columns)}"
    assert len(mine) == len(ref), f"{name}: rows {len(mine)} vs {len(ref)}"
    pd.testing.assert_frame_equal(mine, ref, check_dtype=False,
                                  check_exact=True, obj=name)


def test_rows_only_queries(entry_mod, sf_dir):
    q = entry_mod.queries()
    sql = entry_mod.oracle_sql()
    for name in sorted(set(q) - set(sql)):
        result = _to_pandas(q[name](sf_dir))
        assert len(result) >= 0, name
