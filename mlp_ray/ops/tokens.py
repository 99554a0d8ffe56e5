"""Token-stream operators over the ``tokens`` list<int32> column —
the input_hint payload (BASELINE.json) of the tokenized-sequence
table.

``token_histogram`` is the canonical bounded-state wide aggregation
for a token axis: at 10^12 tokens a naive per-token groupby shuffles
one row per token occurrence; here each batch reduces to at most
min(batch_tokens, vocab_size) (token, count) partial rows via one
``np.bincount`` over the flattened Arrow list values (zero-copy), the
partials merge in a token-hash-bucketed vectorized groupby, and only
the final top-k leaves the pipeline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..util import bucketed_groups


def _flat_values(col) -> tuple[np.ndarray, int]:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten()
    vals = flat.to_numpy(zero_copy_only=False)
    return vals.astype(np.int64, copy=False), len(vals)


def token_histogram(ds: rd.Dataset, *, col: str = "tokens",
                    k: int | None = 100,
                    num_buckets: int = 64) -> rd.Dataset:
    """(token, count) frequencies over every token occurrence,
    count-desc (ties: token asc), optionally truncated to the top
    ``k``.  Partial = one bincount per batch; merge = bucketed
    vectorized sum; top-k = sort + limit over ≤ vocab_size rows."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        vals, n = _flat_values(batch[col])
        if n == 0:
            return pd.DataFrame({"token": pd.Series(dtype="int64"),
                                 "count": pd.Series(dtype="int64")})
        counts = np.bincount(vals)
        nz = np.flatnonzero(counts)
        return pd.DataFrame({"token": nz.astype(np.int64),
                             "count": counts[nz].astype(np.int64)})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("token", sort=False)["count"].sum()
               .reset_index())
        out["token"] = out["token"].astype("int64")
        out["count"] = out["count"].astype("int64")
        return out

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    hist = bucketed_groups(partials, ["token"], merge,
                           num_buckets=num_buckets)
    hist = hist.sort(["count", "token"], descending=[True, False])
    return hist.limit(k) if k else hist


def bigram_histogram(ds: rd.Dataset, *, col: str = "tokens",
                     k: int | None = 100,
                     num_buckets: int = 64) -> rd.Dataset:
    """(tok_a, tok_b, count) frequencies of ADJACENT token pairs,
    count-desc (ties: tok_a, tok_b asc), truncated to the top ``k``.

    Same bounded-state shape as ``token_histogram`` one order up: the
    pair (a << 31 | b — tokens are non-negative int32, so the packed
    key fits int64 losslessly) is counted per batch with one
    ``np.unique`` over the flattened values, so the exchange carries
    at most one row per distinct batch bigram — bounded by batch token
    count, never corpus size.  Sequence boundaries never pair: the
    positions crossing a list boundary are masked from the adjacent
    (v[:-1], v[1:]) views."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        empty = pd.DataFrame({"pair": pd.Series(dtype="int64"),
                              "count": pd.Series(dtype="int64")})
        arr = batch[col]
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) \
            else arr
        v = arr.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        if len(v) < 2:
            return empty
        lens = pa.compute.list_value_length(arr) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        bounds = np.cumsum(lens)[:-1]  # interior sequence boundaries
        valid = np.ones(len(v) - 1, dtype=bool)
        inb = bounds[(bounds > 0) & (bounds < len(v))]
        valid[inb - 1] = False
        key = (v[:-1][valid] << np.int64(31)) | v[1:][valid]
        if not len(key):
            return empty
        uniq, cnt = np.unique(key, return_counts=True)
        return pd.DataFrame({"pair": uniq, "count": cnt.astype(np.int64)})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("pair", sort=False)["count"].sum().reset_index()
        return out.astype({"pair": "int64", "count": "int64"})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    hist = bucketed_groups(partials, ["pair"], merge,
                           num_buckets=num_buckets)
    hist = hist.sort(["count", "pair"], descending=[True, False])
    if k:
        hist = hist.limit(k)

    def unpack(df: pd.DataFrame) -> pd.DataFrame:
        p = df["pair"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "tok_a": (p >> np.int64(31)).astype(np.int64),
            "tok_b": (p & np.int64((1 << 31) - 1)).astype(np.int64),
            "count": df["count"].to_numpy(dtype=np.int64)})

    return hist.map_batches(unpack, batch_format="pandas")


def sequence_length_stats(ds: rd.Dataset, *, col: str = "n_tok",
                          bin_width: int = 64) -> pd.DataFrame:
    """Sequence-length histogram (token-budget planning): counts per
    ``bin_width`` bucket plus total tokens — one tiny partial row per
    (batch, bin), summed driver-side."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        n = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(n) == 0:
            return pd.DataFrame({"bin": pd.Series(dtype="int64"),
                                 "count": pd.Series(dtype="int64"),
                                 "tokens": pd.Series(dtype="int64")})
        b = n // bin_width
        counts = np.bincount(b)
        sums = np.bincount(b, weights=n).astype(np.int64)
        nz = np.flatnonzero(counts)
        return pd.DataFrame({"bin": nz.astype(np.int64) * bin_width,
                             "count": counts[nz].astype(np.int64),
                             "tokens": sums[nz]})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    out = (parts.groupby("bin", sort=True)
           .agg(count=("count", "sum"), tokens=("tokens", "sum"))
           .reset_index())
    return out.astype({"bin": "int64", "count": "int64", "tokens": "int64"})
