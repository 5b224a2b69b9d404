"""Driver-mimic: every oracled queries() entry vs its DuckDB oracle_sql()
(row count + schema names + order-insensitive values) at sf0.001."""

from __future__ import annotations

import importlib.util
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["__ray_entry__"] = mod
    spec.loader.exec_module(mod)
    return mod


ENTRY = _load_entry()
ORACLES = ENTRY.oracle_sql()
QUERIES = ENTRY.queries()
ORACLED = sorted(set(QUERIES) & set(ORACLES))


def duck_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con.execute(sql).df()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        dt = df[c].dtype
        if str(dt).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif dt == np.uint64:
            df[c] = df[c].astype(np.int64)  # same bit pattern range here
        elif str(dt).startswith(("int", "uint")):
            df[c] = df[c].astype(np.int64)
        elif dt == object:
            df[c] = df[c].astype(str)
        elif dt == bool or str(dt) == "boolean":
            df[c] = df[c].astype(bool)
    return (df.sort_values(list(df.columns), kind="mergesort")
              .reset_index(drop=True))


def to_df(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(name, sf_tiny):
    ray_df = normalize(to_df(QUERIES[name](sf_tiny)))
    duck_df = normalize(duck_run(ORACLES[name], sf_tiny))
    assert list(ray_df.columns) == list(duck_df.columns), (
        f"{name}: columns {list(ray_df.columns)} vs {list(duck_df.columns)}")
    assert len(ray_df) == len(duck_df), (
        f"{name}: rows {len(ray_df)} vs {len(duck_df)}")
    pd.testing.assert_frame_equal(ray_df, duck_df, check_dtype=False,
                                  check_exact=True, obj=name)


def test_rows_only_queries_run(sf_tiny):
    """Non-oracled entries must still execute and return >=0 rows."""
    for name in sorted(set(QUERIES) - set(ORACLES)):
        if name in ("crawl_e2e",):   # covered by test_crawl_e2e (slow)
            continue
        res = QUERIES[name](sf_tiny)
        df = to_df(res)
        assert df is not None, name
