"""Driver-contract check: every queries() entry runs; SQL-paired entries
match their DuckDB oracle (row count + sorted-values equality), the same
comparison the driver performs at sf0.01."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location("__ray_entry__", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["__ray_entry__"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _to_df(res) -> pd.DataFrame:
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
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_entry_smoke(entrymod):
    res = entrymod.entry()
    df = _to_df(res)
    assert len(df) > 0
    assert {"subj", "pred", "obj", "confidence"} <= set(df.columns)


def test_all_queries_run(entrymod):
    qs = entrymod.queries()
    assert len(qs) >= 15
    for name, fn in qs.items():
        df = _to_df(fn(SF_DIR))
        assert df is not None and len(df.columns) > 0, name


def test_sql_oracles_match(entrymod, con):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    failures = []
    for name, sql in oracles.items():
        got = _canon(_to_df(qs[name](SF_DIR)))
        want = _canon(con.execute(sql).fetchdf())
        if list(got.columns) != list(want.columns):
            failures.append((name, "columns", list(got.columns), list(want.columns)))
            continue
        if len(got) != len(want):
            failures.append((name, "rows", len(got), len(want)))
            continue
        for c in got.columns:
            a, b = got[c], want[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                import numpy as np

                ok = np.isclose(a.astype(float), b.astype(float),
                                atol=1e-6, equal_nan=True).all()
            else:
                ok = (a.astype(str) == b.astype(str)).all()
            if not ok:
                failures.append((name, f"values:{c}",
                                 a[a.astype(str) != b.astype(str)].head(3).tolist(),
                                 b[a.astype(str) != b.astype(str)].head(3).tolist()))
                break
    assert not failures, failures
