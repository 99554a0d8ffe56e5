"""Sequence-packing operators over the tokenized-sequence table —
the step after dedup/quality in a training-data pipeline: arrange
(doc_id, tokens, n_tok) rows into fixed token-budget training bins.

Two semantics, one exact and oracle-attested, one greedy:

``pack_plan`` — token-budget chunking by EXCLUSIVE cumulative token
count over the total ``doc_id`` order (streaming-concat semantics: the
corpus is one conceptual token stream split every ``cap`` tokens, so a
document may straddle a bin boundary; ``pack_offset`` says where in
its first bin it starts).  Exactly a SQL window function —
``SUM(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING AND 1
PRECEDING)`` — which is the DuckDB oracle.

``pack_greedy`` — first-fit sequential no-split packing: walk docs in
``order_col`` order within each ``group_col`` group, close the bin
when the next doc would exceed ``cap`` (an oversized doc gets its own
bin).  Not window-SQL-expressible (the break positions recurse), so it
is attested by invariants + a pure-Python golden; ``pack_plan`` is its
exact oracle-attested sibling, per the repo convention for
approx/sequential ops.

Scale notes (100 TB): a global prefix sum needs a total order, but
never a global sort-and-scan.  ``pack_plan`` is a classic two-pass
distributed scan: (1) per-RANGE token totals (ranges = order-preserving
fixed-width ``doc_id`` prefixes, ~10^(range_tail) docs each) fold
batch-locally into a tiny table collected on the driver, whose
exclusive prefix sum gives each range's base offset, broadcast once
with ``ray.put``; (2) one hash-bucketed vectorized pass
(``util.bucketed_groups``) cumsums inside each range and adds the
base.  ``range_tail`` tunes the driver-table size (at 10^12 docs,
``range_tail=6`` keeps it at 10^6 rows).  The only shuffle is the
bucket groupby.  ``pack_greedy``'s packing unit is the group — pick a
``group_col`` fine enough (e.g. source+day) that no group is a
stragglers' straggler; parallelism is across groups by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..util import bucketed_groups

# per-worker cache of the broadcast base-offset dict (one ray.get /
# deserialize per worker process, not per bucket)
_BASE_CACHE: dict[str, dict] = {}


def _get_base(ref) -> dict:
    key = ref.hex()
    if key not in _BASE_CACHE:
        _BASE_CACHE.clear()
        _BASE_CACHE[key] = ray.get(ref)
    return _BASE_CACHE[key]


def _range_totals(ds: rd.Dataset, order_col: str, val_col: str,
                  range_tail: int) -> pd.DataFrame:
    """Pass 1: (range, val_sum, min_id, max_id) — one tiny frame."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        ids = batch[order_col].to_pandas().astype(str)
        vals = pd.to_numeric(batch[val_col].to_pandas(),
                             errors="coerce").fillna(0).astype("int64")
        rng = ids.str[:-range_tail]
        g = pd.DataFrame({"range": rng, "val": vals, "id": ids}).groupby(
            "range", sort=False)
        out = g.agg(val_sum=("val", "sum"), min_id=("id", "min"),
                    max_id=("id", "max")).reset_index()
        return out

    t = ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True).to_pandas()
    if t.empty:
        return t
    return (t.groupby("range", sort=True)
            .agg(val_sum=("val_sum", "sum"), min_id=("min_id", "min"),
                 max_id=("max_id", "max")).reset_index())


def pack_plan(ds: rd.Dataset, *, cap: int = 2048,
              order_col: str = "doc_id", val_col: str = "n_tok",
              range_tail: int = 4,
              num_buckets: int = 64) -> rd.Dataset:
    """Per-doc packing plan: ``(order_col, val_col, pack_bin,
    pack_offset)`` where ``pack_bin = cum_before // cap`` and
    ``pack_offset = cum_before % cap``, ``cum_before`` the exclusive
    prefix sum of ``val_col`` in ascending ``order_col`` order.

    Precondition: ``order_col`` values are fixed-width strings (so the
    ``range_tail``-stripped prefix is order-preserving).  Validated on
    the driver from the pass-1 range table: sorted ranges must have
    non-overlapping [min_id, max_id] id intervals — variable-width ids
    fail loudly instead of packing in a silently wrong order."""
    totals = _range_totals(ds, order_col, val_col, range_tail)
    if totals.empty:
        return rd.from_pandas(pd.DataFrame(
            {order_col: pd.Series(dtype="string"),
             val_col: pd.Series(dtype="int64"),
             "pack_bin": pd.Series(dtype="int64"),
             "pack_offset": pd.Series(dtype="int64")}))
    _validate_ranges(totals, order_col, range_tail)
    base = dict(zip(
        totals["range"],
        np.concatenate(([0], np.cumsum(
            totals["val_sum"].to_numpy(dtype=np.int64))[:-1]))))
    base_ref = ray.put(base)
    cap = int(cap)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        b = _get_base(base_ref)
        g = g.sort_values(["_range", order_col], kind="mergesort")
        vals = pd.to_numeric(g[val_col], errors="coerce").fillna(0) \
                 .astype("int64")
        # vectorized per-range exclusive cumsum + broadcast base offset
        cum = (vals.groupby(g["_range"], sort=False).cumsum().to_numpy()
               - vals.to_numpy()
               + g["_range"].map(b).astype("int64").to_numpy())
        pb = cum // cap
        return pd.DataFrame({
            order_col: g[order_col].to_numpy(),
            val_col: vals.to_numpy(),
            "pack_bin": pb.astype("int64"),
            "pack_offset": (cum - pb * cap).astype("int64")})

    def add_range(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[order_col, val_col]].copy()
        df["_range"] = df[order_col].astype(str).str[:-range_tail]
        return df

    with_rng = ds.map_batches(add_range, batch_format="pandas")
    return bucketed_groups(with_rng, ["_range"], per_bucket,
                           num_buckets=num_buckets)


def pack_materialize(ds: rd.Dataset, *, cap: int = 2048,
                     order_col: str = "doc_id", tok_col: str = "tokens",
                     val_col: str = "n_tok", range_tail: int = 4,
                     num_buckets: int = 64) -> rd.Dataset:
    """MATERIALIZE the streaming-concat plan: the corpus's tokens in
    ascending ``order_col`` order, cut every ``cap`` tokens, assembled
    into actual fixed-size training rows ``(pack_bin, tokens
    [int32-LE bytes], n_tok, tok_sum)`` — every bin holds exactly
    ``cap`` tokens except the last.

    Same two-pass scan as ``pack_plan`` (range totals → broadcast base
    offsets), then ONE range-bucketed pass splits each range's
    CONTIGUOUS flat token stream at global cap boundaries with a
    single ``np.split`` per range (documents straddling a boundary
    split; no per-doc Python), and a bin-bucketed merge concatenates
    fragments in offset order.  Tokens ride exactly two exchanges —
    fragment shuffle and bin merge — as int32 byte payloads."""
    totals = _range_totals(ds, order_col, val_col, range_tail)
    _EMPTY = pd.DataFrame({"pack_bin": pd.Series(dtype="int64"),
                           "tokens": pd.Series(dtype=object),
                           "n_tok": pd.Series(dtype="int64"),
                           "tok_sum": pd.Series(dtype="int64")})
    if totals.empty:
        return rd.from_pandas(_EMPTY)
    _validate_ranges(totals, order_col, range_tail)
    base = dict(zip(
        totals["range"],
        np.concatenate(([0], np.cumsum(
            totals["val_sum"].to_numpy(dtype=np.int64))[:-1]))))
    base_ref = ray.put(base)
    cap = int(cap)

    def fragments(g: pd.DataFrame) -> pd.DataFrame:
        b = _get_base(base_ref)
        g = g.sort_values(["_range", order_col], kind="mergesort")
        out_bin, out_start, out_payload = [], [], []
        for rng, sub in g.groupby("_range", sort=False):
            flat = (np.concatenate([np.asarray(t, dtype=np.int32)
                                    for t in sub[tok_col]])
                    if len(sub) else np.empty(0, np.int32))
            g0 = int(b[rng])  # whole range per bucket: flat is the
            #                   range's full contiguous global segment
            L = len(flat)
            if L == 0:
                continue
            first_cut = (g0 // cap + 1) * cap
            cuts = np.arange(first_cut, g0 + L, cap) - g0
            parts = np.split(flat, cuts)
            starts = np.concatenate(([g0], g0 + cuts))
            for s, part in zip(starts, parts):
                if len(part):
                    out_bin.append(s // cap)
                    out_start.append(s)
                    # explicit little-endian: the persisted payload
                    # contract is int32-LE regardless of host order
                    out_payload.append(part.astype("<i4",
                                                   copy=False).tobytes())
        return pd.DataFrame({"pack_bin": np.array(out_bin, np.int64),
                             "start": np.array(out_start, np.int64),
                             "payload": out_payload})

    def add_range(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[order_col, tok_col]].copy()
        df["_range"] = df[order_col].astype(str).str[:-range_tail]
        return df

    # each bucket owns WHOLE ranges, so a range's flat stream is
    # contiguous within its bucket task
    frag = bucketed_groups(ds.map_batches(add_range, batch_format="pandas"),
                           ["_range"], fragments, num_buckets=num_buckets)

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["pack_bin", "start"], kind="mergesort")
        rows = []
        for pb, sub in g.groupby("pack_bin", sort=False):
            flat = np.concatenate([np.frombuffer(p, dtype="<i4")
                                   for p in sub["payload"]])
            rows.append((int(pb), flat.astype("<i4", copy=False).tobytes(),
                         len(flat), int(flat.astype(np.int64).sum())))
        return pd.DataFrame(rows, columns=["pack_bin", "tokens",
                                           "n_tok", "tok_sum"])

    return bucketed_groups(frag, ["pack_bin"], assemble,
                           num_buckets=num_buckets)


def _validate_ranges(totals: pd.DataFrame, order_col: str,
                     range_tail: int) -> None:
    """Sorted ranges must tile the id order (fixed-width id guard)."""
    prev_max = totals["max_id"].to_numpy()[:-1]
    next_min = totals["min_id"].to_numpy()[1:]
    bad = prev_max >= next_min
    if bad.any():
        i = int(np.flatnonzero(bad)[0])
        raise ValueError(
            f"order ranges overlap (ids are not fixed-width sortable): "
            f"range {totals['range'].iloc[i]!r} max id "
            f"{prev_max[i]!r} >= next range min id {next_min[i]!r}; "
            f"use fixed-width {order_col} values or adjust range_tail")


def greedy_bins(vals: np.ndarray, cap: int) -> np.ndarray:
    """First-fit sequential bin ids for ``vals`` in order: bins fill
    until the next value would exceed ``cap``; a value > cap gets a
    bin alone.  Vectorized over bins (searchsorted per bin close,
    O(bins · log n)), never per row."""
    n = len(vals)
    bins = np.empty(n, dtype=np.int64)
    cums = np.cumsum(vals.astype(np.int64))
    i, b = 0, 0
    while i < n:
        before = cums[i - 1] if i else 0
        j = int(np.searchsorted(cums, before + cap, side="right"))
        if j <= i:  # oversized doc: own bin
            j = i + 1
        bins[i:j] = b
        b += 1
        i = j
    return bins


def pack_greedy(ds: rd.Dataset, *, cap: int = 2048,
                group_col: str = "source", order_col: str = "doc_id",
                val_col: str = "n_tok") -> rd.Dataset:
    """Per-doc greedy plan ``(group_col, order_col, val_col,
    pack_bin)``: first-fit sequential no-split packing in ascending
    ``order_col`` order, independently per ``group_col`` group (bin
    ids are local to the group).  The packing unit is the group —
    choose it fine enough for parallelism (see module docstring)."""
    cap = int(cap)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_col, kind="mergesort")
        vals = pd.to_numeric(g[val_col], errors="coerce").fillna(0) \
                 .astype("int64").to_numpy()
        return pd.DataFrame({
            group_col: g[group_col].to_numpy(),
            order_col: g[order_col].to_numpy(),
            val_col: vals,
            "pack_bin": greedy_bins(vals, cap)})

    cols = ds.select_columns([group_col, order_col, val_col])
    return (cols.groupby(group_col)
            .map_groups(per_group, batch_format="pandas"))


def pack_bin_rollup(plan: rd.Dataset, keys: list[str],
                    val_col: str = "n_tok") -> pd.DataFrame:
    """Small per-bin summary of a packing plan: doc count, tokens of
    docs STARTING in the bin, first/last doc — one row per bin
    (≈ total_tokens/cap rows), merged driver-side."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False)
        return g.agg(n_docs=(val_col, "size"),
                     start_tokens=(val_col, "sum"),
                     first_doc=("doc_id", "min"),
                     last_doc=("doc_id", "max")).reset_index()

    parts = plan.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return parts
    out = (parts.groupby(keys, sort=True)
           .agg(n_docs=("n_docs", "sum"),
                start_tokens=("start_tokens", "sum"),
                first_doc=("first_doc", "min"),
                last_doc=("last_doc", "max")).reset_index())
    for c in ("n_docs", "start_tokens"):
        out[c] = out[c].astype("int64")
    return out
