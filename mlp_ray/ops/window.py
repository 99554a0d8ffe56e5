"""Global ordered-window primitives: exact distributed row_number /
NTILE over a Dataset.

Ray Data has no ``row_number() OVER (ORDER BY ...)``: ``ds.sort`` range
partitions internally but exposes no block offsets to ``map_batches``.
This module implements the classic distributed ranking recipe
explicitly (reference semantics: SQL window functions; the reference
engine reads fully-accumulated maps so global order is free there —
here it must be an operator):

1. **Boundary sample** — a tiny deterministic per-block sample of the
   first sort key picks ``num_partitions - 1`` range boundaries.
2. **Count pass** — every row is assigned a range-partition id with one
   vectorized ``searchsorted``; a narrow ``(pid, n)`` aggregate (bytes
   per block) comes back to the driver, which prefix-sums the offsets.
3. **Rank pass** — partition-bucketed ``map_groups``: each bucket owns
   ALL rows of its key range (ties of the first key can never straddle
   a boundary because boundaries are data values and searchsorted is
   side-sensitive), sorts locally by the full key list and emits
   ``offset[pid] + local_index``.

Partitioning assumption: rows of one first-key value colocate in one
range partition, so a hot key bounds a single partition's size — same
skew profile as any range shuffle (Ray's own sort included).  The
input is typically a per-entity AGGREGATE (users, docs), not the raw
event stream, so partition payloads are entity-cardinality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _exact_ntile(rank0: np.ndarray, n_total: int, k: int) -> np.ndarray:
    """SQL NTILE(k) from 0-based global ranks: the first ``n_total % k``
    buckets get ``ceil(n/k)`` rows, the rest ``floor(n/k)`` (ANSI
    semantics, matches DuckDB/Postgres)."""
    if n_total <= 0:
        return np.zeros(0, dtype=np.int64)
    big, rem = divmod(n_total, k)
    cut = rem * (big + 1)
    out = np.where(rank0 < cut,
                   rank0 // max(big + 1, 1),
                   rem + (rank0 - cut) // max(big, 1))
    return (out + 1).astype(np.int64)


def global_rank(ds, keys: list[str], *, descending: bool | list[bool] = False,
                num_partitions: int = 64, rank_col: str = "rank",
                ntile: int | None = None, ntile_col: str = "ntile"):
    """Exact global 1-based row_number over ``keys`` (and optionally an
    exact NTILE bucket), as a Dataset → Dataset operator.

    ``keys`` must make rows unique (callers append a tiebreaker id) so
    the produced order — and therefore every rank — is deterministic
    under any block layout.  Returns the input columns plus
    ``rank_col`` (int64) and, when ``ntile`` is set, ``ntile_col``.
    """
    if isinstance(descending, bool):
        descending = [descending] * len(keys)
    asc = [not d for d in descending]
    k0 = keys[0]

    # Three passes (sample, count, rank) read the input — materialize
    # once so the upstream lineage (often a full-corpus aggregate)
    # doesn't recompute per pass.  The input is entity-cardinality by
    # contract (a per-user/per-doc rollup, not the raw event stream),
    # and blocks spill to the object store if they outgrow memory.
    ds = ds.materialize()

    # -- pass 1: deterministic boundary sample (≤32 values per block) --
    def sample_keys(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({k0: df[k0]})
        step = max(1, len(df) // 32)
        return pd.DataFrame({k0: df[k0].iloc[::step]})

    samp = ds.map_batches(sample_keys, batch_format="pandas").to_pandas()
    vals = np.sort(samp[k0].to_numpy())
    if len(vals) == 0:
        return ds.map_batches(
            lambda df: df.assign(**{rank_col: np.zeros(0, dtype=np.int64)}),
            batch_format="pandas")
    q = np.linspace(0, len(vals) - 1,
                    min(num_partitions, len(vals)) + 1)[1:-1]
    bounds = np.unique(vals[q.astype(np.int64)])
    if descending[0]:
        # rank ascending over the NEGATED first key when it is numeric;
        # for generality just flip by searchsorted side below.
        pass

    def assign_pid(df: pd.DataFrame):
        from ..util import arrow_out

        v = df[k0].to_numpy()
        pid = np.searchsorted(bounds, v, side="right")
        if descending[0]:
            pid = len(bounds) - pid  # mirror: high keys → low pid
        df = df.copy()
        df["_pid"] = pid.astype("int64")
        return arrow_out(df)

    with_pid = ds.map_batches(assign_pid, batch_format="pandas")

    # -- pass 2: per-partition counts → driver prefix offsets.  The
    # counts come back as per-batch (pid, n) partials (≤ num_partitions
    # rows per block) summed on the driver — never a Ray groupby.
    def count_pids(df: pd.DataFrame) -> pd.DataFrame:
        c = df["_pid"].value_counts()
        return pd.DataFrame({"_pid": c.index.to_numpy(dtype=np.int64),
                             "n": c.to_numpy(dtype=np.int64)})

    cnt = (with_pid.map_batches(count_pids, batch_format="pandas")
           .to_pandas().groupby("_pid", sort=True)["n"].sum()
           .reset_index())
    pids = cnt["_pid"].to_numpy()
    ns = cnt["n"].to_numpy(dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(ns)[:-1]])
    offset_of = dict(zip(pids.tolist(), offs.tolist()))
    n_total = int(ns.sum())

    # -- pass 3: per-partition local sort + offset ----------------------
    def rank_partition(g: pd.DataFrame) -> pd.DataFrame:
        pid = int(g["_pid"].iloc[0])
        g = (g.sort_values(keys, ascending=asc, kind="mergesort")
             .drop(columns=["_pid"]).reset_index(drop=True))
        r0 = offset_of[pid] + np.arange(len(g), dtype=np.int64)
        g[rank_col] = r0 + 1
        if ntile is not None:
            g[ntile_col] = _exact_ntile(r0, n_total, ntile)
        return g

    return with_pid.groupby("_pid").map_groups(rank_partition,
                                               batch_format="pandas")
