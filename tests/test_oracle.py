"""Every oracle-checked query vs DuckDB at sf0.001 — the same comparison
the driver runs at sf0.01 (row count + schema + order-insensitive values)."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _to_pandas(res):
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(ray_session, con, name):
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    got = _canon(_to_pandas(qs[name](SF_DIR)))
    want = _canon(con.execute(sqls[name]).fetchdf())
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)


def test_customer_order_stats_modes_agree(ray_session):
    """The distributed (pre-agg + partitioned hash join) path and the
    legacy broadcast-dict path must produce identical results."""
    from osmwaterwayextractor_ray.pipelines.relational import customer_order_stats

    d = _canon(_to_pandas(customer_order_stats(SF_DIR)))
    b = _canon(_to_pandas(customer_order_stats(SF_DIR, mode="broadcast")))
    pd.testing.assert_frame_equal(d, b)
