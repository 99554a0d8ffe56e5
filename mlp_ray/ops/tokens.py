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
