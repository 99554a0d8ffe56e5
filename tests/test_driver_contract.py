"""Mimic the driver's correctness gate: run every queries() entry and
compare against oracle_sql() via DuckDB (row count + schema + value
equality, order-insensitive) at sf0.01 — the scale the driver uses."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("int64")
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True)


SQL_QUERIES = sorted(entrymod.oracle_sql())


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_query_matches_oracle(con, name):
    q = entrymod.queries()[name]
    actual = q(SF_DIR)
    if not isinstance(actual, pd.DataFrame):
        actual = actual.to_pandas()
    expected = con.execute(entrymod.oracle_sql()[name]).fetchdf()
    a, e = _normalize(actual), _normalize(expected)
    assert list(a.columns) == list(e.columns), (
        f"{name}: columns {list(a.columns)} vs {list(e.columns)}")
    assert len(a) == len(e), f"{name}: rows {len(a)} vs {len(e)}"
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]):
            ok = np.isclose(a[c], e[c], rtol=0, atol=1e-9, equal_nan=True)
        else:
            ok = (a[c] == e[c]) | (a[c].isna() & e[c].isna())
        assert ok.all(), (
            f"{name}.{c}: {int((~ok).sum())} mismatches, first:\n"
            f"{a.loc[~ok, c].head(3)}\nvs\n{e.loc[~ok, c].head(3)}")


ROWS_ONLY = [n for n in entrymod.queries() if n not in entrymod.oracle_sql()]


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name):
    q = entrymod.queries()[name]
    out = q("/root/testdata/sf0.001")
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    assert len(out) >= 0
    assert len(out.columns) > 0


def test_entry_smoke():
    out = entrymod.entry()
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    assert len(out) > 0
    assert "ns" in out.columns and "count" in out.columns


def test_top50_battery_all_oracled():
    """Battery-curation guard: the driver hash-checks the FIRST 50
    queries() entries, so every one of them must carry an oracle.
    As of round 5 the rows-only set is EMPTY — the last three numeric
    kernels gained oracles (IRLS logreg: Cramer-solved final Newton
    step; BPE: per-step argmax replay over the state fixture; STFT
    spectrogram: full DFT recomputed in SQL from the decoded
    samples) — so every queries() entry everywhere is oracle-backed."""
    names = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    missing = [n for n in names[:50] if n not in oracles]
    assert not missing, missing


def test_every_query_oracled():
    """Round-5 end state: oracle_sql() covers EVERY queries() entry —
    the driver's strongest (hash) check applies to the whole surface;
    the ROWS_ONLY parametrization above is intentionally empty."""
    assert not ROWS_ONLY, ROWS_ONLY
