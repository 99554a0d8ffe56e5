"""Temporal join operators the Dataset API lacks: distributed as-of
join, broadcast range (interval) join, and sliding-window aggregation.

These are the training-pipeline join shapes the brief calls out as
custom operators.  Each documents the partitioning assumption it
relies on:

- ``asof_join``: ONE hash exchange on the ``by`` key (bucketed — a
  bucket owns whole key groups); the merge inside a bucket is a single
  sort + groupby-ffill, no per-key Python frames.  Assumes a bucket
  (~1/64 of the key space) fits in a worker's heap — the same
  assumption every keyed groupby makes.
- ``range_join_broadcast``: the interval side is SMALL (config/window
  tables); it ships once via ``ray.put`` and every task probes it with
  ``np.searchsorted`` — no shuffle at all.  Assumes non-overlapping
  intervals (each row matches at most one).
- ``sliding_window_agg``: each row expands to ``window/slide`` window
  assignments *pre-aggregated per batch*, so the shuffle carries
  (window, key) partials, not multiplied rows.

The nearest reference analogue is the ctx-keyed two-pass driver join
(mongo-log-parser LogParserTask.java two-pass accumulators); these
generalize that shape to arbitrary keys/time columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd



def _empty_join_result(*schemas_and_renames) -> rd.Dataset:
    """Typed-as-far-as-known empty join result: an executed-empty
    input Dataset loses its schema (``ds.schema()`` → None after a
    map_batches stage yields zero blocks), so the join can't type its
    output — emit an empty frame carrying whatever column names the
    known sides still provide instead of crashing on ``.names``."""
    cols: list[str] = []
    for schema, rename in schemas_and_renames:
        if schema is not None:
            for n in schema.names:
                c = rename(n)
                if c is not None and c not in cols:
                    cols.append(c)
    return rd.from_pandas(pd.DataFrame(columns=cols))


def _arrow_type(typ) -> pa.DataType:
    """Normalize a ``Dataset.schema()`` entry (Arrow type for
    Arrow-block datasets, numpy/pandas dtype for pandas-block ones) to
    an Arrow type, for exact ``pa.nulls`` fills."""
    if isinstance(typ, pa.DataType):
        return typ
    if pd.api.types.is_integer_dtype(typ):
        return pa.int64()
    if pd.api.types.is_float_dtype(typ):
        return pa.float64()
    if pd.api.types.is_datetime64_any_dtype(typ):
        return pa.timestamp(np.datetime_data(typ)[0])
    if pd.api.types.is_bool_dtype(typ):
        return pa.bool_()
    return pa.string()


def asof_join(left: rd.Dataset, right: rd.Dataset, *, on: str,
              by: list[str], attach: list[str], tiebreak: str,
              direction: str = "backward",
              num_buckets: int = 64) -> rd.Dataset:
    """Inclusive as-of join (DuckDB ``ASOF JOIN`` semantics,
    deterministic tie-break), backward or forward.

    ``direction="backward"``: for every left row, attach the
    right-side row with the greatest ``(on, tiebreak)`` among right
    rows in the same ``by`` group with ``right.on <= left.on``.
    ``direction="forward"``: the smallest ``(on, tiebreak)`` among
    right rows with ``right.on >= left.on``.  Unmatched left rows
    drop (inner).  The attached columns come back as ``r_<name>``
    (``on`` is always attached as ``r_<on>``).  Integer columns (left
    and attached) that the merge's null fill float-promoted are
    restored to int64.

    Deterministic contract (mirrors the oracle): among right rows with
    equal ``on``, the larger ``tiebreak`` wins backward and the
    SMALLER wins forward, and a right row at exactly ``left.on`` is
    eligible either way.
    """
    from ..util import key_hash_buckets

    if direction not in ("backward", "forward"):
        raise ValueError(f"unsupported direction={direction!r}")

    srcs = list(dict.fromkeys([on, *attach]))
    acols = [f"r_{c}" for c in srcs]
    ls, rs = left.schema(), right.schema()
    if ls is None or rs is None:  # executed-empty side: empty result
        return _empty_join_result(
            (ls, lambda n: n),
            (rs, lambda n: f"r_{n}" if n in srcs else None))
    ltypes = {n: _arrow_type(t) for n, t in zip(ls.names, ls.types)}
    rtypes = {n: _arrow_type(t) for n, t in zip(rs.names, rs.types)}
    order = [*ltypes, "_side", "_tb", *acols]
    types = {**ltypes, "_side": pa.int8(), "_tb": pa.int64(),
             **{c: rtypes[s] for c, s in zip(acols, srcs)}}

    # the union stays in Arrow (typed pa.nulls fills) so the bucket
    # exchange sorts zero-copy Arrow blocks; pandas only per bucket
    def tag(t: pa.Table, side: int) -> pa.Table:
        n = t.num_rows
        vals = dict(zip(t.column_names, t.columns))
        cols = {}
        for c in order:
            if c == "_side":
                cols[c] = pa.array(np.full(n, side, np.int8))
            elif c == "_tb":
                tb = vals.get(tiebreak)
                cols[c] = (pc.cast(tb, pa.int64()) if tb is not None
                           else pa.array(np.zeros(n, np.int64)))
            elif side == 1:
                cols[c] = vals.get(c, pa.nulls(n, types[c]))
            else:
                src = (dict(zip(acols, srcs))[c] if c in acols
                       else (c if c in by or c == on else None))
                cols[c] = (vals[src] if src is not None
                           else pa.nulls(n, types[c]))
        out = pa.table(cols)
        b = key_hash_buckets(out.select(by).to_pandas(), by, num_buckets)
        return out.append_column("_bucket", pa.array(b))

    lt = left.map_batches(lambda t: tag(t, 1), batch_format="pyarrow")
    rt = right.map_batches(lambda t: tag(t, 0), batch_format="pyarrow")
    int_like = [c for c, t in types.items()
                if c not in ("_side", "_tb") and pa.types.is_integer(t)]

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if direction == "backward":
            # stable sort: right rows (side 0) precede left rows at
            # equal `on` (inclusive match); among equal-`on` right
            # rows the larger tiebreak sorts last, so ffill picks it
            g = g.sort_values([on, "_side", "_tb"], kind="mergesort")
            g[acols] = g.groupby(by, sort=False)[acols].ffill()
        else:
            # forward mirror: left rows precede right rows at equal
            # `on` (inclusive), and among equal-`on` right rows the
            # smaller tiebreak sorts first, so bfill picks it
            g = g.sort_values([on, "_side", "_tb"],
                              ascending=[True, False, True],
                              kind="mergesort")
            g[acols] = g.groupby(by, sort=False)[acols].bfill()
        out = g[(g["_side"] == 1) & g[f"r_{on}"].notna()]
        out = out.drop(columns=["_side", "_tb"]).reset_index(drop=True)
        # un-promote EVERY int column the union's null fill floated —
        # the right side null-fills the left-only columns too, so left
        # ints (e.g. event_id) float-promote just like the r_* attaches
        for c in int_like:
            if c in out and out[c].dtype != np.int64 \
                    and not out[c].isna().any():
                out[c] = out[c].astype("int64")
        return out

    return (lt.union(rt).groupby("_bucket")
            .map_groups(lambda g: merge(g.drop(columns=["_bucket"])),
                        batch_format="pandas"))


def detect_hot_keys(ds: rd.Dataset, on: list[str], *,
                    share: float = 0.01,
                    sample_per_block: int = 4096) -> pd.DataFrame:
    """Cheap hot-key detection for skew salting: a deterministic
    per-block head sample of the key columns, counted per block and
    merged on the driver (narrow (keys, n) partials).  Returns the
    distinct key tuples whose sampled share exceeds ``share`` — a key
    owning ≥1% of a corpus is exactly the kind that melts one join
    bucket."""
    def partials(t: pa.Table) -> pd.DataFrame:
        head = t.select(on).slice(0, sample_per_block).to_pandas()
        out = head.groupby(on, sort=False, dropna=False).size() \
            .rename("n").reset_index()
        return out

    cnt = (ds.map_batches(partials, batch_format="pyarrow")
           .to_pandas().groupby(on, as_index=False, dropna=False)["n"]
           .sum())
    total = int(cnt["n"].sum())
    if total == 0:
        return cnt.iloc[0:0][on]
    return cnt.loc[cnt["n"] >= max(2, share * total), on] \
        .reset_index(drop=True)


def hash_join(left: rd.Dataset, right: rd.Dataset, *, on: list[str],
              right_on: list[str] | None = None, how: str = "inner",
              num_buckets: int = 64, salt: int = 1,
              hot_keys: pd.DataFrame | None = None) -> rd.Dataset:
    """Distributed equi-join of two LARGE datasets: both sides shuffle
    ONCE by the key-hash bucket; each bucket owns whole key groups and
    joins them with a single vectorized ``pd.merge`` — no per-key
    Python frames.

    This is the both-sides-large path; when one side is small, prefer
    the broadcast-lookup pattern (``ray.put`` + probe inside
    ``map_batches``, see ``queries.orders_by_nation``) which skips the
    shuffle entirely.  Non-key column names must be disjoint.  ``how``
    is ``inner``, ``left``, ``outer`` (full outer), ``semi`` or
    ``anti``; integer columns come back nullable (float-promoted)
    under ``left``/``outer`` where the other side missed (cast at the
    consumer).  Under ``semi``/``anti`` the right side ships ONLY its
    (deduplicated) keys through the shuffle and contributes no output
    columns.

    **Skew salting** (``salt > 1``): rows of HOT keys on the left
    spread across ``salt`` sub-buckets (assignment is load-balancing
    only — any sub works, the result is identical) while the right
    side's hot-key rows REPLICATE to every sub-bucket, so one
    dominant key occupies ``salt`` parallel groups instead of melting
    one.  Hot keys come from ``hot_keys`` (distinct key tuples) or,
    when omitted, from a sampled frequency pass over the LEFT side
    (``detect_hot_keys``).  Cold keys pay nothing; right-side shuffle
    volume grows only by hot-rows × salt.  If the RIGHT side carries
    the skew, swap the sides (inner/semi are symmetric; for
    left-joins, keep the skewed side left).
    """
    right_on = list(on) if right_on is None else list(right_on)
    if how not in ("inner", "left", "outer", "semi", "anti"):
        raise ValueError(f"unsupported how={how!r}")
    if how == "outer" and salt > 1:
        # hot-key replication would emit one null-left row per
        # sub-bucket for an unmatched replicated right row
        raise ValueError("salt > 1 is not supported with how='outer'")
    if salt > 1 and hot_keys is None:
        hot_keys = detect_hot_keys(left, on)
    hot_ref = None
    if salt > 1 and hot_keys is not None and len(hot_keys):
        hot_ref = ray.put(set(map(tuple, hot_keys[on].itertuples(
            index=False, name=None))) if len(on) > 1
            else set(hot_keys[on[0]].tolist()))
    ls, rs = left.schema(), right.schema()
    if ls is None or rs is None:
        # an executed-empty side loses its schema (None).  Resolve the
        # modes whose result is provable without it; the rest need the
        # missing schema to type null-filled columns — fail clearly.
        if ls is None and how in ("inner", "left", "semi", "anti"):
            ren = dict(zip(right_on, on))
            return _empty_join_result(
                (rs if how in ("inner", "left") else None,
                 lambda n: ren.get(n, n)))
        if rs is None and how in ("inner", "semi"):
            return _empty_join_result((ls, lambda n: n))
        if rs is None and how == "anti":
            return left  # nothing to match: every left row survives
        raise ValueError(
            f"hash_join(how={how!r}): the "
            f"{'left' if ls is None else 'right'} side executed to "
            "empty and lost its schema, so the null-filled output "
            "columns cannot be typed; materialize a typed empty "
            "input (e.g. read_parquet of an empty file) instead")
    ltypes = {n: _arrow_type(t) for n, t in zip(ls.names, ls.types)}
    rtypes = {o: _arrow_type(t) for o, t in zip(
        [dict(zip(right_on, on)).get(c, c) for c in rs.names],
        rs.types)}
    if how in ("semi", "anti"):
        rtypes = {c: rtypes[c] for c in on}
    lonly = [c for c in ltypes if c not in on]
    ronly = [c for c in rtypes if c not in on]
    overlap = set(lonly) & set(ronly)
    if overlap:
        raise ValueError(f"non-key columns collide: {sorted(overlap)}")
    order = [*on, *lonly, *ronly, "_side"]
    types = {**ltypes, **rtypes, "_side": pa.int8()}

    # tagging, null-filling and the bucket hash all stay in Arrow so
    # the exchange sorts zero-copy Arrow blocks — shuffling pandas
    # blocks here measured ~5x slower on a 750k-row join
    def tag(t: pa.Table, side: int, rename: dict) -> pa.Table:
        t = t.rename_columns([rename.get(c, c) for c in t.column_names])
        if side == 0 and how in ("semi", "anti"):
            # existence is all that matters: pre-dedup the keys per
            # batch so the shuffle ships distinct keys, not rows
            t = t.select(on).group_by(on).aggregate([])
        n = t.num_rows
        cols = {c: (t[c] if c in t.column_names else pa.nulls(n, types[c]))
                for c in order}
        cols["_side"] = pa.array(np.full(n, side, np.int8))
        out = pa.table(cols)
        from ..util import key_hash_buckets
        kf = out.select(on).to_pandas()
        b = key_hash_buckets(kf, on, num_buckets).astype(np.int64)
        if hot_ref is None:
            return out.append_column("_bucket", pa.array(b))
        hot_set = ray.get(hot_ref)
        if len(on) > 1:
            hot = (pd.MultiIndex.from_frame(kf)
                   .isin(hot_set).astype(bool))
        else:
            hot = kf[on[0]].isin(hot_set).to_numpy(dtype=bool)
        if side == 1:
            # left: spread hot rows across the salt sub-buckets.  The
            # assignment only balances load — any sub yields the same
            # join result, so arange%salt needs no determinism contract
            sub = np.where(hot, np.arange(n, dtype=np.int64) % salt, 0)
            return out.append_column("_bucket", pa.array(b * salt + sub))
        # right: replicate hot rows into every sub-bucket so each
        # left sub sees the full right side of its key
        cold_idx = np.nonzero(~hot)[0]
        hot_idx = np.nonzero(hot)[0]
        idx = np.concatenate([cold_idx, np.tile(hot_idx, salt)])
        sub = np.concatenate([
            np.zeros(len(cold_idx), dtype=np.int64),
            np.repeat(np.arange(salt, dtype=np.int64), len(hot_idx))])
        bucket = b[idx] * salt + sub
        return (out.take(pa.array(idx))
                .append_column("_bucket", pa.array(bucket)))

    lt = left.map_batches(lambda t: tag(t, 1, {}),
                          batch_format="pyarrow")
    rt = right.map_batches(
        lambda t: tag(t, 0, dict(zip(right_on, on))),
        batch_format="pyarrow")

    int_like = [c for c, t in types.items()
                if c != "_side" and pa.types.is_integer(t)]

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g["_side"] == 1, [*on, *lonly]]
        r = g.loc[g["_side"] == 0, [*on, *ronly]]
        if how in ("semi", "anti"):
            hit = (pd.MultiIndex.from_frame(l[on])
                   .isin(pd.MultiIndex.from_frame(r[on].drop_duplicates())))
            out = l[hit if how == "semi" else ~hit].reset_index(drop=True)
        else:
            out = l.merge(r, on=list(on), how=how)
        # the union's cross-side nulls float-promoted int columns in
        # the pandas conversion; restore them where no nulls remain
        for c in int_like:
            if c in out and out[c].dtype != np.int64 \
                    and not out[c].isna().any():
                out[c] = out[c].astype("int64")
        return out

    return (lt.union(rt).groupby("_bucket")
            .map_groups(lambda g: merge(g.drop(columns=["_bucket"])),
                        batch_format="pandas"))


def range_join_broadcast(ds: rd.Dataset, intervals: pd.DataFrame, *,
                         on: str, start_col: str = "start",
                         end_col: str = "end") -> rd.Dataset:
    """Inner interval join against a SMALL interval table: keep rows
    with ``start <= row.on < end`` and attach every non-bound interval
    column as ``w_<name>`` (plus ``w_<start_col>``).

    The interval side broadcasts once (``ray.put``); each task probes
    the sorted starts with ``np.searchsorted`` — zero shuffle.
    Intervals must be non-overlapping (each row matches at most one);
    a ValueError guards that assumption.
    """
    iv = intervals.sort_values(start_col, kind="mergesort").reset_index(
        drop=True)
    starts = iv[start_col].to_numpy()
    ends = iv[end_col].to_numpy()
    if (ends[:-1] > starts[1:]).any():
        raise ValueError("range_join_broadcast requires non-overlapping "
                         "intervals")
    extra = [c for c in iv.columns if c not in (start_col, end_col)]
    ref = ray.put((starts, ends, iv[extra]))

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        s, e, ex = ray.get(ref)
        vals = df[on].to_numpy()
        idx = np.searchsorted(s, vals, side="right") - 1
        ok = (idx >= 0) & (vals < e[np.clip(idx, 0, None)])
        out = df[ok].reset_index(drop=True)
        hit = idx[ok]
        out[f"w_{start_col}"] = s[hit]
        for c in ex.columns:
            out[f"w_{c}"] = ex[c].to_numpy()[hit]
        return out

    return ds.map_batches(probe, batch_format="pandas")


def sliding_window_agg(ds: rd.Dataset, *, on: str, keys: list[str],
                       value_col: str, window_us: int,
                       slide_us: int) -> rd.Dataset:
    """Sliding-window count + sum per ``(window_start, *keys)``: a row
    at time t belongs to every window start in ``(t - window, t]``
    aligned to ``slide``.

    Each batch expands rows into (window, key) assignments and
    PRE-AGGREGATES them before the shuffle, so the exchange carries at
    most ``windows x keys`` partial rows per batch instead of
    ``window/slide`` copies of every row.  The partial merge is a
    window-bucketed exchange (``bucketed_groups``), not Ray's
    sort-shuffle groupby, whose fixed latency dominates partial-sized
    inputs.
    """
    from ..util import arrow_partials, bucketed_groups

    nw = window_us // slide_us

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        ts = df[on].to_numpy().astype("datetime64[us]").astype(np.int64)
        base = (ts // slide_us) * slide_us
        rep = pd.DataFrame({
            "window_start": np.concatenate(
                [base - k * slide_us for k in range(nw)]),
            **{k: np.tile(df[k].to_numpy(), nw) for k in keys},
            "_v": np.tile(df[value_col].to_numpy(), nw),
        })
        out = (rep.groupby(["window_start", *keys], sort=False)
               .agg(n=("_v", "size"), sum_value=("_v", "sum"))
               .reset_index())
        out["window_start"] = out["window_start"].astype("datetime64[us]")
        out["n"] = out["n"].astype("int64")
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["window_start", *keys], sort=False)
               [["n", "sum_value"]].sum().reset_index())
        out["n"] = out["n"].astype("int64")
        return out

    return bucketed_groups(
        ds.map_batches(arrow_partials(partials), batch_format="pandas"),
        ["window_start", *keys], merge)
