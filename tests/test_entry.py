"""Driver-contract simulation: run every queries() entry at sf0.001 and
compare against its oracle_sql() through DuckDB the way the driver does
(row count + schema + order-insensitive value comparison)."""

from __future__ import annotations

import math
import numpy as np
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__ as m

    return m


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(
            df[c].iloc[0], (list, tuple, pd.Series)
        ) or (df[c].dtype == object and len(df) and hasattr(df[c].iloc[0], "__len__") and not isinstance(df[c].iloc[0], (str, bytes))):
            df[c] = df[c].map(lambda v: tuple(np.asarray(v).tolist()))
        try:
            if hasattr(df[c].values, "dtype") and df[c].values.dtype.kind == "f":
                df[c] = df[c].round(9)
        except TypeError:
            pass
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _compare(name, ours: pd.DataFrame, oracle: pd.DataFrame):
    assert len(ours) == len(oracle), f"{name}: rows {len(ours)} vs {len(oracle)}"
    assert sorted(ours.columns) == sorted(oracle.columns), (
        f"{name}: columns {sorted(ours.columns)} vs {sorted(oracle.columns)}"
    )
    a, b = _canon(ours), _canon(oracle)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            assert (
                (av.isna() == bv.isna()).all()
                and ((av - bv).abs().fillna(0) < 1e-6).all()
            ), f"{name}: float column {c} differs"
        else:
            same = av.astype(str).equals(bv.astype(str))
            assert same, f"{name}: column {c} differs\n{av.head()}\n{bv.head()}"


def _oracle_names():
    import __ray_entry__ as m

    return sorted(m.oracle_sql())


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(name, entry_mod, con):
    q = entry_mod.queries()[name]
    ours = _to_pandas(q(SF_DIR))
    oracle = con.execute(entry_mod.oracle_sql()[name]).df()
    _compare(name, ours, oracle)


def test_rows_only_queries_run(entry_mod):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    for name in set(qs) - set(oracles):
        res = _to_pandas(qs[name](SF_DIR))
        assert res is not None and len(res) >= 0, name


def test_entry_smoke(entry_mod):
    res = entry_mod.entry()
    df = _to_pandas(res)
    assert len(df) > 0
    assert set(df.columns) == {"doc_id", "tokens", "n_tok", "source"}
