"""Local replica of the driver's correctness gate: run every queries()
entry and its oracle_sql() side-by-side on sf0.001 via DuckDB and compare
row count, schema shape and (order-insensitively) values."""

import math
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

import os

SF_DIR = os.environ.get("GRAFT_ORACLE_SF", "/root/testdata/sf0.001")
# (verified manually at sf0.01 — the driver's scale — as well; set
# GRAFT_ORACLE_SF=/root/testdata/sf0.01 to rerun that)
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def entry_module():
    import __ray_entry__ as m

    return m


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _to_df(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(result, rd.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _compare(name, got: pd.DataFrame, exp: pd.DataFrame):
    assert sorted(got.columns) == sorted(exp.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(exp.columns)}")
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    g, e = _canon(got), _canon(exp)
    for c in g.columns:
        gv, ev = g[c].tolist(), e[c].tolist()
        for i, (a, b) in enumerate(zip(gv, ev)):
            if isinstance(a, float) or isinstance(b, float):
                a_nan = a is None or (isinstance(a, float) and math.isnan(a))
                b_nan = b is None or (isinstance(b, float) and math.isnan(b))
                if a_nan or b_nan:
                    assert a_nan and b_nan, f"{name}.{c}[{i}]: {a} != {b}"
                else:
                    assert a == b, f"{name}.{c}[{i}]: {a!r} != {b!r}"
            else:
                assert a == b, f"{name}.{c}[{i}]: {a!r} != {b!r}"


def test_all_sql_checked_queries(ray_session, entry_module, con):
    qs = entry_module.queries()
    oracles = entry_module.oracle_sql()
    assert set(oracles) <= set(qs), "oracle for unknown query"
    failures = []
    for name, sql in oracles.items():
        got = _canon(_to_df(qs[name](SF_DIR)))
        exp = _canon(con.execute(sql).fetchdf())
        try:
            _compare(name, got, exp)
        except AssertionError as e:
            failures.append(str(e).split("\n")[0])
    assert not failures, "\n".join(failures)


def test_rows_only_queries_run(ray_session, entry_module):
    qs = entry_module.queries()
    oracles = entry_module.oracle_sql()
    for name in set(qs) - set(oracles):
        if name.startswith("x_"):
            continue  # extraction queries covered by the oracle tests
        df = _to_df(qs[name](SF_DIR))
        assert df is not None and len(df.columns) > 0, name


def test_entry_smoke(ray_session, entry_module):
    ds = entry_module.entry()
    df = _to_df(ds)
    assert len(df) > 0
    assert "extracted_text" in df.columns
