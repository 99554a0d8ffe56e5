"""Distributed selection: EXACT order statistics / quantiles without
ever shipping the value multiset.

The fold's exact quantile path (`aggs/fold.py`) ships per-group value
arrays through the merge — exact but O(rows) exchange; its sketch mode
is bounded but approximate.  This module is the third point in that
trade-space: exact AND bounded, via iterative histogram refinement
(the classic distributed k-selection algorithm):

  round 0   one pass → (n, min, max) per block, driver-merged
  round i   one pass → a fixed-width histogram (``bins`` counts) per
            block over each still-active rank's bracket, summed on the
            driver (exchange O(blocks · bins), never O(rows)); each
            target rank's bracket narrows to the one bin that contains
            it (count-below bookkeeping keeps ranks global)
  final     one pass collects ONLY the values inside the (tiny)
            resolved brackets — ≈ ``leaf`` values per rank by
            construction — and the driver reads the exact order
            statistics out of them

Float discipline: bin membership is decided by ``searchsorted`` against
an edge array recomputed IDENTICALLY (same formula, same dtype) in
every pass, so "counted below edge b" in one round and "v < new_lo"
in the next are the same comparison — no division-rounding drift can
move a value across a bracket boundary between rounds.

Convergence: each round divides the bracket's count by up to ``bins``;
a bracket that stops shrinking (all-identical values, width underflow)
falls through to the collect pass unchanged.  For uniform-ish data two
rounds resolve 10¹² rows at the default 8192 bins / 65536 leaf.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def _edges(lo: float, hi: float, bins: int) -> np.ndarray:
    """The shared bin-edge array for bracket [lo, hi] — one formula,
    recomputed bit-identically wherever binning happens."""
    return lo + (hi - lo) * (np.arange(bins + 1, dtype=np.float64) / bins)


def _clean(t: pa.Table, col: str) -> np.ndarray:
    v = pc.drop_null(t[col])
    arr = v.to_numpy(zero_copy_only=False).astype(np.float64)
    return arr[~np.isnan(arr)]


def _order_stat_targets(n: int, qs: list[float]) -> list[int]:
    """The 0-indexed order statistics quantile_cont-style linear
    interpolation needs for ``qs`` over ``n`` values."""
    ks: dict[int, None] = {}
    for q in qs:
        h = (n - 1) * q
        i0 = int(np.floor(h))
        ks[i0] = None
        ks[min(i0 + 1, n - 1)] = None
    return sorted(ks)


def distributed_quantiles(ds: rd.Dataset, col: str, qs: list[float], *,
                          bins: int = 8192, leaf: int = 65536,
                          max_rounds: int = 16) -> dict[float, float]:
    """Exact ``quantile_cont``-interpolated quantiles of ``ds[col]``
    via histogram-refinement selection.  Returns {q: value}.

    Every round is ONE ``map_batches`` pass over the dataset; the data
    exchanged per round is O(blocks · active_brackets · bins) counts.
    NaN/null values are excluded (DuckDB aggregate semantics)."""
    qs = sorted(set(float(q) for q in qs))
    if not qs:
        return {}

    def mm(t: pa.Table) -> pd.DataFrame:
        arr = _clean(t, col)
        if len(arr) == 0:
            return pd.DataFrame({"n": pd.array([0], dtype="int64"),
                                 "lo": [np.inf], "hi": [-np.inf]})
        return pd.DataFrame({"n": pd.array([len(arr)], dtype="int64"),
                             "lo": [float(arr.min())],
                             "hi": [float(arr.max())]})

    m = ds.map_batches(mm, batch_format="pyarrow",
                       zero_copy_batch=True).to_pandas()
    n = int(m["n"].sum())
    if n == 0:
        return {q: float("nan") for q in qs}
    glo, ghi = float(m["lo"].min()), float(m["hi"].max())

    # brackets[k] = (lo, hi, count_below, count_inside); invariant:
    # exactly count_below values are < lo, and the k-th global order
    # statistic lies in [lo, hi]
    ks = _order_stat_targets(n, qs)
    brackets: dict[int, tuple[float, float, int, int]] = {
        k: (glo, ghi, 0, n) for k in ks}

    for _ in range(max_rounds):
        active = {k: b for k, b in brackets.items()
                  if b[3] > leaf and b[1] > b[0]}
        if not active:
            break
        # identical (lo, hi) brackets share one histogram
        intervals = sorted({(b[0], b[1]) for b in active.values()})

        def hist(t: pa.Table, intervals=intervals) -> pd.DataFrame:
            arr = _clean(t, col)
            out_iv, out_bin, out_n = [], [], []
            for i, (lo, hi) in enumerate(intervals):
                sel = arr[(arr >= lo) & (arr <= hi)]
                if len(sel) == 0:
                    continue
                e = _edges(lo, hi, bins)
                idx = np.clip(np.searchsorted(e, sel, side="right") - 1,
                              0, bins - 1)
                counts = np.bincount(idx, minlength=bins)
                nz = np.nonzero(counts)[0]
                out_iv.append(np.full(len(nz), i, dtype=np.int64))
                out_bin.append(nz.astype(np.int64))
                out_n.append(counts[nz].astype(np.int64))
            if not out_iv:
                return pd.DataFrame({"iv": pd.array([], dtype="int64"),
                                     "bin": pd.array([], dtype="int64"),
                                     "cnt": pd.array([], dtype="int64")})
            return pd.DataFrame({"iv": np.concatenate(out_iv),
                                 "bin": np.concatenate(out_bin),
                                 "cnt": np.concatenate(out_n)})

        h = (ds.map_batches(hist, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas()
             .groupby(["iv", "bin"], sort=True)["cnt"].sum())
        progressed = False
        for k, (lo, hi, below, inside) in active.items():
            i = intervals.index((lo, hi))
            counts = np.zeros(bins, dtype=np.int64)
            if i in h.index.get_level_values(0):
                sub = h.loc[i]
                counts[sub.index.to_numpy()] = sub.to_numpy()
            cum = np.cumsum(counts)
            rel = k - below          # rank inside this bracket
            # first bin whose cumulative count covers the rank; clamp
            # defensively (boundary values can make rel == cum[-1]-1
            # the last populated bin)
            b = int(np.searchsorted(cum, rel + 1, side="left"))
            b = min(b, bins - 1)
            e = _edges(lo, hi, bins)
            # bin b holds values in [e[b], e[b+1]) under the same
            # searchsorted predicate; keep hi as the upper edge of the
            # last bin so clipped boundary values stay inside
            new_lo = float(e[b])
            new_hi = hi if b == bins - 1 else float(e[b + 1])
            new_below = below + (int(cum[b - 1]) if b else 0)
            new_inside = int(counts[b])
            if (new_lo, new_hi, new_below, new_inside) != \
                    (lo, hi, below, inside):
                progressed = True
            brackets[k] = (new_lo, new_hi, new_below, new_inside)
        if not progressed:
            break  # degenerate brackets (identical values): collect

    # final pass: collect only in-bracket values.  A value v == e[b]
    # (the bracket's lower edge) was binned INTO bin b by the
    # side="right" searchsorted, so it is not in count_below, and the
    # (v >= lo) filter keeps it here too — same float comparison, no
    # drift.  Values equal to the bracket's UPPER edge belong to the
    # next bin but pass (v <= hi); they sort after the target rank and
    # only pad the tail of the collected set.
    intervals = sorted({(b[0], b[1]) for b in brackets.values()})

    def collect(t: pa.Table, intervals=intervals) -> pd.DataFrame:
        arr = _clean(t, col)
        out_iv, out_v = [], []
        for i, (lo, hi) in enumerate(intervals):
            sel = arr[(arr >= lo) & (arr <= hi)]
            out_iv.append(np.full(len(sel), i, dtype=np.int64))
            out_v.append(sel)
        return pd.DataFrame({"iv": np.concatenate(out_iv),
                             "v": np.concatenate(out_v)})

    got = ds.map_batches(collect, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    stat: dict[int, float] = {}
    for k, (lo, hi, below, _inside) in brackets.items():
        i = intervals.index((lo, hi))
        vals = np.sort(got.loc[got["iv"] == i, "v"].to_numpy())
        stat[k] = float(vals[k - below])

    out: dict[float, float] = {}
    for q in qs:
        h_ = (n - 1) * q
        i0 = int(np.floor(h_))
        i1 = min(i0 + 1, n - 1)
        frac = h_ - i0
        out[q] = stat[i0] + frac * (stat[i1] - stat[i0])
    return out
