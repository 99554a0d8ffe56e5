"""Small shared helpers."""

from __future__ import annotations

import numpy as np


def round_half_away(x, ndigits: int = 6):
    """Round half away from zero — matches SQL ``round()`` semantics
    (numpy's ``np.round`` is banker's rounding, which would diverge
    from the DuckDB oracle on exact .5 boundaries)."""
    x = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** ndigits
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale


def round_cols(df, cols, ndigits: int = 6):
    for c in cols:
        df[c] = round_half_away(df[c].to_numpy(dtype=np.float64), ndigits)
    return df


def bucketed_groups(ds, key_cols: list[str], fn, num_buckets: int = 64):
    """groupby a hash BUCKET of ``key_cols`` and run ``fn`` over the
    whole bucket (all rows of every key the bucket owns).

    The scale-safe replacement for ``groupby(key).map_groups`` when the
    key cardinality is high: per-key map_groups builds one Python
    pandas frame per key through the sort shuffle, while a bucketed
    group hands ``fn`` enough co-located rows to reduce them with ONE
    vectorized pandas pass per bucket."""
    import pandas as pd

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            df["_bucket"] = pd.Series(dtype="int64")
            return df
        df["_bucket"] = key_hash_buckets(df, key_cols, num_buckets)
        return df

    def run(g: pd.DataFrame) -> pd.DataFrame:
        return fn(g.drop(columns=["_bucket"]))

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("_bucket").map_groups(run, batch_format="pandas"))


def key_hash_buckets(df, key_cols: list[str], num_buckets: int):
    """Deterministic bucket id per row from a combined hash of
    ``key_cols`` — THE shared bucket hash (bucketed_groups, the
    multifold key-bucket split, and the dedup bucket merges all use
    this one implementation)."""
    import pandas as pd

    h = np.zeros(len(df), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for c in key_cols:
            h = h * np.uint64(31) + pd.util.hash_pandas_object(
                df[c], index=False).to_numpy().astype(np.uint64)
    return (h % num_buckets).astype("int64")
