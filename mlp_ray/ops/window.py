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


def group_topk(ds, keys: list[str], sort_cols: list[str], *,
               descending: bool | list[bool] = False, k: int = 3,
               rank_col: str | None = None):
    """Top-``k`` ROWS per group (SQL ``QUALIFY row_number() OVER
    (PARTITION BY keys ORDER BY sort_cols) <= k``), as a Dataset →
    Dataset operator.

    Two-phase: each input batch keeps only its LOCAL per-group top-k
    (a batch can contribute at most k survivors per group), then one
    key-bucketed exchange finishes the selection — the shuffle carries
    ≤ k × groups-per-batch rows per batch, never the corpus.  Both
    phases are one vectorized sort + ``groupby().head(k)`` per
    frame.  ``sort_cols`` plus ``keys`` must order rows uniquely for a
    deterministic result (callers include a tiebreaker id)."""
    from ..util import arrow_partials, bucketed_groups

    if isinstance(descending, bool):
        descending = [descending] * len(sort_cols)
    asc = [not d for d in descending]

    def local(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(sort_cols, ascending=asc, kind="mergesort")
                .groupby(keys, sort=False).head(k))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = local(g)
        if rank_col is not None:
            out = out.copy()
            out[rank_col] = (out.groupby(keys, sort=False).cumcount()
                             .to_numpy() + 1).astype(np.int64)
        return out

    pruned = ds.map_batches(arrow_partials(local), batch_format="pandas")
    return bucketed_groups(pruned, keys, final)


def global_cumsum(ds, keys: list[str], value_col: str, *,
                  descending: bool | list[bool] = False,
                  num_partitions: int = 64, rank_col: str = "rank",
                  cum_col: str = "cum"):
    """Exact global ordered running sum of ``value_col`` over the
    ``keys`` order (SQL ``SUM(v) OVER (ORDER BY keys ROWS UNBOUNDED
    PRECEDING)``) plus the 1-based row_number — the distributed scan:
    range-partition by sampled boundaries of the first key, a narrow
    count pass returns per-partition ``(rows, sum)`` partials whose
    driver prefix gives each partition its rank AND value offsets,
    then each partition sorts locally and adds its offsets.  Same
    partitioning contract as ``global_rank``; ``keys`` must be unique
    per row."""
    if isinstance(descending, bool):
        descending = [descending] * len(keys)
    asc = [not d for d in descending]
    k0 = keys[0]

    ds = ds.materialize()

    def sample_keys(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({k0: df[k0]})
        step = max(1, len(df) // 32)
        return pd.DataFrame({k0: df[k0].iloc[::step]})

    samp = ds.map_batches(sample_keys, batch_format="pandas").to_pandas()
    vals = np.sort(samp[k0].to_numpy())
    if len(vals) == 0:
        return ds.map_batches(
            lambda df: df.assign(
                **{rank_col: np.zeros(0, dtype=np.int64),
                   cum_col: np.zeros(0, dtype=np.float64)}),
            batch_format="pandas")
    q = np.linspace(0, len(vals) - 1,
                    min(num_partitions, len(vals)) + 1)[1:-1]
    bounds = np.unique(vals[q.astype(np.int64)])

    def assign_pid(df: pd.DataFrame):
        from ..util import arrow_out

        pid = np.searchsorted(bounds, df[k0].to_numpy(), side="right")
        if descending[0]:
            pid = len(bounds) - pid
        df = df.copy()
        df["_pid"] = pid.astype("int64")
        return arrow_out(df)

    with_pid = ds.map_batches(assign_pid, batch_format="pandas")

    def count_pids(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("_pid", sort=True)[value_col].agg(n="size", s="sum")
        return pd.DataFrame({"_pid": g.index.to_numpy(dtype=np.int64),
                             "n": g["n"].to_numpy(dtype=np.int64),
                             "s": g["s"].to_numpy(dtype=np.float64)})

    cnt = (with_pid.map_batches(count_pids, batch_format="pandas")
           .to_pandas().groupby("_pid", sort=True)[["n", "s"]].sum()
           .reset_index())
    pids = cnt["_pid"].to_numpy()
    ns = cnt["n"].to_numpy(dtype=np.int64)
    ss = cnt["s"].to_numpy(dtype=np.float64)
    rank_offs = np.concatenate([[0], np.cumsum(ns)[:-1]])
    sum_offs = np.concatenate([[0.0], np.cumsum(ss)[:-1]])
    rank_of = dict(zip(pids.tolist(), rank_offs.tolist()))
    sum_of = dict(zip(pids.tolist(), sum_offs.tolist()))

    def scan_partition(g: pd.DataFrame) -> pd.DataFrame:
        pid = int(g["_pid"].iloc[0])
        g = (g.sort_values(keys, ascending=asc, kind="mergesort")
             .drop(columns=["_pid"]).reset_index(drop=True))
        g[rank_col] = (rank_of[pid]
                       + np.arange(1, len(g) + 1, dtype=np.int64))
        g[cum_col] = (sum_of[pid]
                      + np.cumsum(g[value_col].to_numpy(dtype=np.float64)))
        return g

    return with_pid.groupby("_pid").map_groups(scan_partition,
                                               batch_format="pandas")


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
