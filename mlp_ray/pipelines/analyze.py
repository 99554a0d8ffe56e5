"""Flagship pipeline: read → classify → redact → enrich → route →
per-sink aggregates (SURVEY.md §7.0).

The reference's ``LogParser.main`` (LogParser.java:1670, traced in
SURVEY.md §3.1) reads files line-by-line into 25k-line chunks and folds
shared synchronized accumulators; here the same result tables are
produced by a lazy Ray ``Dataset`` pipeline — streaming blocks,
vectorized classify, actor-pool redaction, two-phase grouped folds.
"""

from __future__ import annotations

import os
from typing import Iterable

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd
from ray.data.aggregate import Count, Max, Min

from ..aggs import sinks as sink_defs
from ..aggs.fold import FoldSpec, run_fold
from ..stages.classify import classify_batch
from ..stages.enrich import NsEnricher
from ..stages.redact import Redactor

# Narrow attribute columns needed by classify + all sinks — the token
# payload is deliberately NOT read for aggregation-only runs (prune at
# the read: tokens dominate bytes but only routing sinks need them).
ATTR_COLUMNS = [
    "doc_id", "source", "ns", "component", "msg", "op_kind", "ts", "ctx",
    "app_name", "duration_ms", "plan_summary", "query_hash", "plan_cache_key",
    "planning_time_us", "keys_examined", "docs_examined", "n_returned",
    "reslen", "bytes_read", "bytes_written", "write_conflicts", "n_shards",
    "n_modified", "n_upserted", "n_deleted", "n_inserted", "replanned",
    "replan_reason", "from_multi_planner", "read_pref_mode", "read_pref_tags",
    "is_change_stream", "is_error", "err_code_name", "err_code",
    "txn_retry_counter", "termination_cause", "commit_type", "commit_us",
    "active_us", "inactive_us", "raw_filter_json", "driver_name",
    "driver_version", "os_type", "platform", "compressors", "username",
    "auth_db", "auth_mechanism", "server_version", "remote",
]


def load_events(paths, *, columns: list[str] | None = ATTR_COLUMNS,
                override_num_blocks: int | None = None) -> rd.Dataset:
    return rd.read_parquet(paths, columns=columns,
                           override_num_blocks=override_num_blocks)


def apply_user_filters(batch: pa.Table, filter_config=None,
                       ns_filter=None) -> pa.Table:
    """Configurable ignore blacklist (F4) + namespace selectors (F5)
    applied to the routing masks of a classified batch."""
    r_ops = batch["r_ops"]
    r_ignored = batch["r_ignored"]
    cat = batch["ignored_category"]
    if filter_config is not None:
        ign = filter_config.should_ignore_mask(batch["msg"])
        # F2/F3 never-drop guards (LogParser.java:902-921): rows that
        # classified as target operations, and the conn/auth/metadata
        # rows driver stats depends on, win over the ignore blacklist
        protected = pc.fill_null(
            pc.or_(pc.is_valid(batch["op"]), batch["r_conn"]), False)
        ign = pc.and_(ign, pc.invert(protected))
        newly = pc.and_(ign, pc.invert(r_ignored))
        r_ops = pc.and_(r_ops, pc.invert(ign))
        r_ignored = pc.or_(r_ignored, ign)
        cat = pc.if_else(newly, batch["msg"], cat)
    if ns_filter is not None:
        r_ops = pc.and_(r_ops, ns_filter.keep_mask(batch["ns"]))
    i = batch.column_names.index
    return (batch.set_column(i("r_ops"), "r_ops", r_ops)
            .set_column(i("r_ignored"), "r_ignored", r_ignored)
            .set_column(i("ignored_category"), "ignored_category", cat))


def apply_stage_chain(batch: pa.Table, redactor, enricher, *,
                      filter_config=None, ns_filter=None) -> pa.Table:
    """THE canonical per-batch stage order: classify → user filters →
    COLLSCAN flag → redact → enrich.  The fused single-task route stage
    (``route.FusedRouteStage``) executes this function directly; the
    operator-per-stage ``classify()`` pipeline below mirrors the same
    order stage by stage (it stays split so redaction can run as an
    actor pool) — change the order HERE first, then keep classify() in
    sync."""
    b = classify_batch(batch)
    if filter_config is not None or ns_filter is not None:
        b = apply_user_filters(b, filter_config, ns_filter)
    b = sink_defs.add_is_collscan(b)
    b = redactor(b)
    return enricher(b)


# Per-worker-process cache for the classify chain's stateful pieces
# (redaction shape memo + broadcast ns dict): Ray reuses worker
# processes across tasks, so a module global gives build-once
# semantics without actor-pool spin-up — the same trade the fused
# route stage makes (route._fused_route_task).
_CHAIN_CACHE: dict = {}


def _chain_task(batch: pa.Table, *, redact: bool,
                filter_config=None, ns_filter=None) -> pa.Table:
    key = ("chain", redact)
    st = _CHAIN_CACHE.get(key)
    if st is None:
        st = _CHAIN_CACHE[key] = (Redactor(enabled=redact), NsEnricher())
    return apply_stage_chain(batch, st[0], st[1],
                             filter_config=filter_config,
                             ns_filter=ns_filter)


def classify(ds: rd.Dataset, *, redact: bool = True,
             ns_meta=None, redact_concurrency: int | tuple = (1, 8),
             filter_config=None, ns_filter=None,
             use_actors: bool = False) -> rd.Dataset:
    """classify → optional user filters (F4/F5) → COLLSCAN flag →
    redaction → ns enrichment, as ONE ``map_batches`` task per batch
    (fusible with the upstream read; stateful pieces built once per
    worker).  ``use_actors=True`` keeps the operator-per-stage actor
    pools for when the stage state outgrows build-per-worker cost
    (real models, large enrichment dicts)."""
    if not use_actors and ns_meta is None:
        import functools
        return ds.map_batches(
            functools.partial(_chain_task, redact=redact,
                              filter_config=filter_config,
                              ns_filter=ns_filter),
            batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(classify_batch, batch_format="pyarrow",
                        zero_copy_batch=True)
    if filter_config is not None or ns_filter is not None:
        ds = ds.map_batches(
            lambda b: apply_user_filters(b, filter_config, ns_filter),
            batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(sink_defs.add_is_collscan, batch_format="pyarrow",
                        zero_copy_batch=True)
    ds = ds.map_batches(Redactor, batch_format="pyarrow",
                        fn_constructor_kwargs={"enabled": redact},
                        concurrency=redact_concurrency)
    ds = ds.map_batches(NsEnricher, batch_format="pyarrow",
                        fn_constructor_kwargs={"meta": ns_meta},
                        concurrency=redact_concurrency)
    return ds


def sink_aggregates(cds: rd.Dataset,
                    which: Iterable[str] | None = None) -> dict[str, rd.Dataset]:
    """Fan-out: one two-phase fold per sink over the classified stream."""
    out = {}
    for name in (which or sink_defs.ALL_SINKS):
        filter_fn, spec = sink_defs.ALL_SINKS[name]()
        filtered = cds.map_batches(filter_fn, batch_format="pyarrow",
                                   zero_copy_batch=True)
        out[name] = run_fold(filtered, spec)
    return out


# --- A8: exact distinct conn ids per appName
# (AppNameConnectionStatsAccumulator.java:17-65) ------------------------
def app_connection_stats(cds: rd.Dataset) -> rd.Dataset:
    def pairs(batch: pa.Table) -> pa.Table:
        t = batch.select(["app_name", "ctx"])
        t = t.set_column(0, "app_name",
                         pc.fill_null(t["app_name"], sink_defs.UNKNOWN_APP))
        return t.group_by(["app_name", "ctx"]).aggregate([])  # per-batch dedup

    distinct_pairs = (
        cds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["app_name", "ctx"]).count()
    )
    return (
        distinct_pairs.groupby("app_name").count()
        .map_batches(lambda t: t.rename_columns(["app_name",
                                                 "distinct_conn_count"]),
                     batch_format="pyarrow")
    )


# --- T4: top-50 slow planning (SlowPlanningAccumulator.java:28-58) -----
def slow_planning_topk(cds: rd.Dataset, k: int = 50) -> rd.Dataset:
    cols = ["planning_time_us", "ns", "op", "plan_summary", "sanitized_query",
            "query_hash", "app_name", "doc_id"]

    def local_topk(batch: pa.Table) -> pa.Table:
        # fed from the ops path only (post namespace-filter), like the
        # reference's SlowPlanningAccumulator
        keep = pc.and_(batch["r_ops"], pc.is_valid(batch["planning_time_us"]))
        t = batch.select(cols).filter(keep)
        if t.num_rows <= k:
            return t
        order = pc.sort_indices(
            t, sort_keys=[("planning_time_us", "descending"),
                          ("doc_id", "descending")])
        return t.take(order[:k])

    # final reduce is driver-side on the pruned ≤ k×blocks rows — a
    # Dataset.sort would pay a full range-partition exchange for it
    pruned = cds.map_batches(local_topk, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
    out = (pruned.sort_values(["planning_time_us", "doc_id"],
                              ascending=[False, False], kind="mergesort")
           .head(k).reset_index(drop=True))
    return rd.from_pandas(out)


# --- A11: global timestamp range (LogParser.java:1183-1192) ------------
def timestamp_range(ds: rd.Dataset) -> dict:
    return ds.aggregate(Min("ts"), Max("ts"))


# --- A10: processing stats (ProcessingStats.java:4-18,
# LogParser.java:985-999) ----------------------------------------------
def processing_stats(cds: rd.Dataset) -> pd.DataFrame:
    def counters(batch: pa.Table) -> pa.Table:
        def s(col):
            return pc.sum(batch[col]).as_py() or 0
        return pa.table({
            "total_lines": [batch.num_rows],
            "found_ops": [s("r_ops")],
            "txn_events": [s("r_txn")],
            "conn_events": [s("r_conn")],
            "error_events": [s("r_error")],
            "ignored": [s("r_ignored")],
            "filtered_by_namespace": [
                pc.sum(pc.equal(pc.fill_null(batch["ignored_category"], ""),
                                "filtered_namespace")).as_py() or 0],
        })

    tbl = (cds.map_batches(counters, batch_format="pyarrow",
                           zero_copy_batch=True)
           .map_batches(lambda df: df.sum().to_frame().T,
                        batch_format="pandas"))
    return tbl.to_pandas().sum().to_frame().T


def ignored_histogram(cds: rd.Dataset) -> rd.Dataset:
    """K6: category histogram of ignored lines (LogParser.java:985-999)."""
    def f(batch: pa.Table) -> pa.Table:
        return batch.filter(batch["r_ignored"]).select(["ignored_category"])
    return (cds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("ignored_category").count())


# --- J1/A12: ctx-keyed driver-stats join
# (TwoPassDriverStatsAccumulator.java; SURVEY.md §2.4) ------------------
INTERNAL_DRIVER_PREFIX = "NetworkInterface"
INTERNAL_DRIVER_NAME = "MongoDB Internal Client"

_DRIVER_KEY = ["driver_name", "driver_version", "os_type", "platform",
               "compressors", "username"]

_CONN_COLS = ["doc_id", "ctx", "msg", "ts", "driver_name", "driver_version",
              "os_type", "platform", "compressors", "remote", "username"]

_META_EMPTY = pd.DataFrame({
    **{k: pd.Series(dtype="string") for k in _DRIVER_KEY},
    "remote": pd.Series(dtype="string"),
    "lifetime_ms": pd.Series(dtype="float64"),
})


def conn_meta_rollup(df: pd.DataFrame) -> pd.DataFrame:
    """Conn-event rows (any set of WHOLE connections) → one row per
    client-metadata event, with the two-pass join attached VECTORIZED:
    username = first non-null by doc_id, lifetime = (max ended − min
    accepted) kept only when positive and the ctx is in the
    deterministic 1-in-10 sample (replaces Math.random()<0.1,
    TwoPassDriverStatsAccumulator.java:29-31,110-142).  A per-conn
    map_groups here was one Python frame per connection — millions of
    frames at scale (VERDICT r1)."""
    if df.empty:
        return _META_EMPTY.copy()
    df = df.sort_values("doc_id", kind="mergesort")
    meta = df[df["driver_name"].notna()]
    if meta.empty:
        return _META_EMPTY.copy()
    acc = (df.loc[df["msg"] == "Connection accepted"]
           .groupby("ctx")["ts"].min().rename("start_ts"))
    end = (df.loc[df["msg"] == "Connection ended"]
           .groupby("ctx")["ts"].max().rename("end_ts"))
    users = (df.loc[df["username"].notna(), ["ctx", "username"]]
             .drop_duplicates("ctx").set_index("ctx")["username"])
    out = meta[["ctx"] + _DRIVER_KEY[:-1] + ["remote"]].copy()
    out["username"] = out["ctx"].map(users).fillna("none")
    start = out["ctx"].map(acc)
    stop = out["ctx"].map(end)
    delta = (stop - start).dt.total_seconds() * 1000.0
    ctx_num = pd.to_numeric(
        out["ctx"].str.extract(r"^conn(\d+)$", expand=False),
        errors="coerce")
    sampled = ctx_num.notna() & (ctx_num % 10 == 0)
    out["lifetime_ms"] = delta.where(sampled & (delta > 0)).astype("float64")
    out = out.drop(columns=["ctx"])
    for k in _DRIVER_KEY + ["remote"]:
        out[k] = out[k].astype("string")
    return out.reset_index(drop=True)


def driver_key_rollup(meta: pd.DataFrame) -> pd.DataFrame:
    """Meta-event rows (whole driver-identity groups) → per-driver
    stats; internal server-to-server drivers dropped
    (TwoPassDriverStatsAccumulator.java:150-154,167-171)."""
    if meta.empty:
        return pd.DataFrame()
    m = meta[~meta["driver_name"].str.startswith(INTERNAL_DRIVER_PREFIX)
             & (meta["driver_name"] != INTERNAL_DRIVER_NAME)]
    if m.empty:
        return pd.DataFrame()
    out = (m.groupby(_DRIVER_KEY, sort=False, dropna=False)
           .agg(conn_count=("remote", "size"),
                distinct_hosts=("remote", "nunique"),
                lifetime_avg_ms=("lifetime_ms", "mean"),
                lifetime_max_ms=("lifetime_ms", "max"))
           .reset_index())
    for k in _DRIVER_KEY:
        out[k] = out[k].astype("string")
    out["conn_count"] = out["conn_count"].astype("int64")
    out["distinct_hosts"] = out["distinct_hosts"].astype("int64")
    out["lifetime_avg_ms"] = out["lifetime_avg_ms"].astype("float64")
    out["lifetime_max_ms"] = out["lifetime_max_ms"].astype("float64")
    return out


def conn_events(batch: pa.Table) -> pa.Table:
    return batch.filter(batch["r_conn"]).select(_CONN_COLS)


def driver_stats(cds: rd.Dataset) -> rd.Dataset:
    """Distributed driver stats: ctx-bucketed vectorized per-conn
    rollup, then driver-key-bucketed vectorized rollup — no per-key
    Python frames through either shuffle."""
    from ..util import bucketed_groups

    conn = cds.map_batches(conn_events, batch_format="pyarrow",
                           zero_copy_batch=True)
    per = bucketed_groups(conn, ["ctx"], conn_meta_rollup)
    return bucketed_groups(per, _DRIVER_KEY, driver_key_rollup)


# --- single-pass multi-sink report ------------------------------------
def _est_input_bytes(paths, ds) -> int | None:
    import os
    try:
        files = ([paths] if isinstance(paths, str) else list(paths)) \
            if paths else (ds.input_files() if ds is not None else None)
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for f in files:
        try:
            if os.path.isdir(f):
                # a directory entry's own size (~4 KB) would defeat the
                # gate — sum the files under it instead
                for root, _dirs, names in os.walk(f):
                    for n in names:
                        total += _one_file_bytes(os.path.join(root, n))
            else:
                total += _one_file_bytes(f)
        except OSError:
            return None
    return total


def _one_file_bytes(f: str) -> int:
    import os
    sz = os.path.getsize(f)
    # compressed text expands ~8× into memory
    return sz * 8 if f.endswith((".gz", ".zip")) else sz


def _add_raw_jobs(jobs: dict, SinkJob, or_empty, _ref_count,
                  p95_mode: str) -> None:
    """Raw-path (reference-exact) replacements for the ttl / errors /
    op_stats sinks plus the ignored-aware timestamp range."""
    from ..aggs.fold import FoldSpec

    ttl_spec = FoldSpec(keys=["ns"],
                        metrics={"duration_ms": ("count", "min", "max",
                                                 "avg"),
                                 "nret": ("sum", "avg")},
                        p95_mode=p95_mode)

    def ttl_prep(batch: pa.Table) -> pd.DataFrame:
        # driver-thread TTL hook rows (LogParser.java:938-970) — they
        # feed the TTL table even when the blacklist ignores the line
        t = batch.filter(pc.is_valid(batch["ttl_ns"]))
        if t.num_rows == 0:
            return pd.DataFrame()
        df = pd.DataFrame({
            "ns": t["ttl_ns"].to_pandas().astype("string"),
            "duration_ms": t["duration_ms"].to_pandas(),
            "nret": t["ttl_n_deleted"].to_pandas(),
            "doc_id": t["doc_id"].to_pandas().astype("string")})
        return ttl_spec.partial_df(df)

    jobs["ttl"] = SinkJob(ttl_prep, ttl_spec.merge_bucket,
                          or_empty(_ref_count), bucket_keys=["ns"])

    def err_prep(batch: pa.Table) -> pd.DataFrame:
        # processErrorCode (LogParserTask.java:1040-1112): up to three
        # accumulations per line — explicit error object, ok:0
        # synthesis, client-disconnect message
        frames = []
        obj = batch.filter(pc.is_valid(batch["err_name_obj"]))
        if obj.num_rows:
            frames.append(pd.DataFrame({
                "err_code_name": obj["err_name_obj"].to_pandas(),
                "err_code": obj["err_code"].to_pandas()}))
        okp = batch.filter(pc.is_valid(batch["err_name_ok"]))
        if okp.num_rows:
            frames.append(pd.DataFrame({
                "err_code_name": okp["err_name_ok"].to_pandas(),
                "err_code": okp["err_code2"].to_pandas()}))
        n_disc = int(pc.sum(pc.fill_null(
            batch["err_disconnect"], False)).as_py() or 0)
        if n_disc:
            frames.append(pd.DataFrame({
                "err_code_name": ["InterruptedByClientDisconnect"] * n_disc,
                "err_code": pd.array([pd.NA] * n_disc, dtype="Int64")}))
        if not frames:
            return pd.DataFrame()
        ev = pd.concat(frames, ignore_index=True)
        ev["err_code_name"] = ev["err_code_name"].astype("string")
        ev["err_code"] = ev["err_code"].astype("Int64")
        g = ev.groupby("err_code_name", dropna=False)
        out = g.size().rename("count").to_frame()
        out["err_code"] = g["err_code"].first()
        return out.reset_index()

    def err_merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("err_code_name", dropna=False)
        out = g["count"].sum().rename("count").to_frame()
        out["err_code"] = g["err_code"].first()
        return out.reset_index()

    jobs["errors"] = SinkJob(err_prep, err_merge, or_empty(err_merge),
                             bucket_keys=["err_code_name"])

    def ops_prep(batch: pa.Table) -> pd.DataFrame:
        # incrementOperationStat labels, incl. the INDEX branch's
        # double increment (category + post-filter "index_operation")
        parts = []
        for col in ("op_stat", "op_stat2"):
            t = batch[col].to_pandas().dropna()
            if len(t):
                parts.append(t.value_counts())
        if not parts:
            return pd.DataFrame()
        s = pd.concat(parts).groupby(level=0).sum()
        return (s.rename("count").rename_axis("op").reset_index()
                .astype({"op": "string", "count": "int64"}))

    def ops_merge(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("op", dropna=False)["count"].sum()
                .reset_index())

    jobs["op_stats"] = SinkJob(ops_prep, ops_merge, or_empty(ops_merge),
                               bucket_keys=["op"])

    def ts_prep(batch: pa.Table) -> pd.DataFrame:
        # updateTimestamps runs inside the task (LogParserTask.java:
        # 99-111) — ignored lines never reach it
        keep = pc.and_(pc.invert(pc.fill_null(batch["pre_ignored"],
                                              False)),
                       pc.equal(batch["parse_status"], "ok"))
        t = batch.filter(keep)
        if t.num_rows == 0:
            return pd.DataFrame()
        mm = pc.min_max(t["ts"])
        return pd.DataFrame({"min_ts": [mm["min"].as_py()],
                             "max_ts": [mm["max"].as_py()]})

    def ts_merge(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"min_ts": [df["min_ts"].min()],
                             "max_ts": [df["max_ts"].max()]})

    jobs["ts_range"] = SinkJob(ts_prep, ts_merge, or_empty(ts_merge))


def _analysis_jobs(top_k: int = 50, by_shard: bool = False,
                   exclude: set[str] | frozenset = frozenset(),
                   p95_mode: str = "exact", raw: bool = False):
    """SinkJob per report table (aggs.multifold contract).
    ``by_shard`` prepends the ``source`` lineage column to every fold
    key (reference ``--shards``, LogParser.java:155-163,557-565);
    ``p95_mode`` is applied to every fold sink's spec.

    ``raw=True`` switches the jobs to the reference-exact raw-log
    contract (golden-corpus parity): per-group ``count`` counts only
    rows with a duration (``LogLineAccumulator.addExecution``
    :62-77 is the only count++ site), p95 uses the commons-math
    LEGACY interpolation, op-type stats count the
    ``incrementOperationStat`` labels (``op_stat``/``op_stat2`` incl.
    the INDEX double increment), error codes get up to three
    accumulations per line (processErrorCode :1040-1112), the TTL
    table is fed by the driver-thread hook (LogParser.java:938-970),
    and the timestamp range skips ignored lines (only task-parsed
    lines reach updateTimestamps, :95-111)."""
    from ..aggs.multifold import SinkJob

    def or_empty(fn):
        return lambda df: fn(df) if df is not None and len(df) else \
            pd.DataFrame()

    jobs: dict = {}
    # ONE pandas conversion per batch shared by every fold sink: the
    # 8 sinks' needed columns overlap heavily, so converting each
    # sink's selection separately converted the hot columns 8x
    fold_specs = {
        name: sink_defs.ALL_SINKS[name](by_shard=by_shard)[1]
        for name in sink_defs.ALL_SINKS if name not in exclude}
    for s in fold_specs.values():
        s.p95_mode = p95_mode
    if raw:
        fold_specs.pop("ttl", None)      # hook-fed job added below
        fold_specs.pop("errors", None)   # 3-way accumulation below
        fold_specs.pop("op_stats", None)  # op_stat/op_stat2 job below
        for s in fold_specs.values():
            s.quantile_method = "weibull"
            if "duration_ms" in s.metrics \
                    and "count" not in s.metrics["duration_ms"]:
                s.metrics["duration_ms"] = (("count",)
                                            + s.metrics["duration_ms"])
        # reference-report extras: mainOperations carries
        # max(Bytes{Read,Written}) (JsonReportGenerator.java:131-137)
        # and queryHashAnalysis the avgShards / avgBytes* /
        # avgDocsReturned integer-division averages
        # (QueryHashAccumulatorEntry.java:243-273)
        def _with(stats: tuple, *extra: str) -> tuple:
            # order-preserving append (a set literal here would make
            # the emitted column order hash-seed-dependent run to run)
            return stats + tuple(e for e in extra if e not in stats)

        if "main_ops" in fold_specs:
            m = fold_specs["main_ops"].metrics
            m["bytes_read"] = _with(m.get("bytes_read", ()), "sum", "max")
            m["bytes_written"] = _with(m.get("bytes_written", ()),
                                       "sum", "max")
        if "query_hash" in fold_specs:
            q = fold_specs["query_hash"].metrics
            for c in ("nret", "n_shards", "bytes_read", "bytes_written"):
                q[c] = _with(q.get(c, ()), "sum")
            # the report's integer-division avg/total readouts need the
            # raw sums (float means can't reproduce Java long division)
            q["duration_ms"] = _with(q.get("duration_ms", ()), "sum")
            q["planning_time_us"] = _with(q.get("planning_time_us", ()),
                                          "sum")

    def _ref_count(df: pd.DataFrame) -> pd.DataFrame:
        if "count_duration_ms" in df.columns:
            df = (df.drop(columns=["count"])
                  .rename(columns={"count_duration_ms": "count"}))
            df["count"] = df["count"].fillna(0).astype("int64")
        return df
    union_cols: list[str] = list(dict.fromkeys(
        c for s in fold_specs.values() for c in s.needed_columns()))
    for c in sink_defs.MASK_COLS:
        if c not in union_cols:
            union_cols.append(c)
    shared: dict = {"batch": None, "df": None}

    def shared_df(batch: pa.Table) -> pd.DataFrame:
        if shared["batch"] is not batch:
            shared["batch"] = batch
            shared["df"] = batch.select(union_cols).to_pandas()
        return shared["df"]

    for name, spec in fold_specs.items():
        jobs[name] = SinkJob(
            prep=(lambda b, n=name, s=spec:
                  s.partial_df(shared_df(b)[
                      sink_defs.MASKS_PD[n](shared_df(b))])),
            bucket_merge=spec.merge_bucket,
            finalize=or_empty(_ref_count if raw else (lambda df: df)),
            bucket_keys=list(spec.keys))

    if raw:
        _add_raw_jobs(jobs, SinkJob, or_empty, _ref_count, p95_mode)

    def stats_prep(batch: pa.Table) -> pd.DataFrame:
        def s(col):
            return int(pc.sum(batch[col]).as_py() or 0)
        return pd.DataFrame([{
            "total_lines": batch.num_rows,
            "found_ops": s("r_ops"), "txn_events": s("r_txn"),
            "conn_events": s("r_conn"), "error_events": s("r_error"),
            "ignored": s("r_ignored"),
            "filtered_by_namespace": int(pc.sum(pc.equal(
                pc.fill_null(batch["ignored_category"], ""),
                "filtered_namespace")).as_py() or 0)}])

    def stats_merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.sum().astype("int64").to_frame().T

    jobs["processing_stats"] = SinkJob(stats_prep, stats_merge,
                                       or_empty(stats_merge))

    def ignored_prep(batch: pa.Table) -> pd.DataFrame:
        t = batch.filter(batch["r_ignored"]).select(["ignored_category"])
        g = t.to_pandas().groupby("ignored_category", dropna=False)
        return g.size().rename("count()").reset_index()

    def ignored_merge(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("ignored_category", dropna=False)["count()"]
                .sum().reset_index())

    jobs["ignored"] = SinkJob(ignored_prep, ignored_merge,
                              or_empty(_ident_df),
                              bucket_keys=["ignored_category"])

    def conns_prep(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(["app_name", "ctx"]).to_pandas()
        df["app_name"] = df["app_name"].fillna(sink_defs.UNKNOWN_APP)
        return df.drop_duplicates()

    def conns_merge(df: pd.DataFrame) -> pd.DataFrame:
        return (df.drop_duplicates().groupby("app_name", sort=False)
                .size().rename("distinct_conn_count").reset_index())

    jobs["app_conns"] = SinkJob(conns_prep, conns_merge,
                                or_empty(_ident_df),
                                bucket_keys=["app_name"])

    slow_cols = ["planning_time_us", "ns", "op", "plan_summary",
                 "sanitized_query", "query_hash", "app_name", "doc_id"]

    def slow_prep(batch: pa.Table) -> pd.DataFrame:
        keep = pc.and_(batch["r_ops"],
                       pc.is_valid(batch["planning_time_us"]))
        t = batch.select(slow_cols).filter(keep)
        df = t.to_pandas()
        return df.sort_values(["planning_time_us", "doc_id"],
                              ascending=False,
                              kind="mergesort").head(top_k)

    def slow_merge(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["planning_time_us", "doc_id"],
                               ascending=False, kind="mergesort")
                .head(top_k).reset_index(drop=True))

    jobs["slow_planning"] = SinkJob(slow_prep, slow_merge,
                                    or_empty(slow_merge))

    jobs["driver_stats"] = SinkJob(
        prep=lambda b: conn_events(b).to_pandas(),
        bucket_merge=conn_meta_rollup,
        finalize=or_empty(driver_key_rollup),
        bucket_keys=["ctx"])
    for name in exclude:
        jobs.pop(name, None)
    return jobs


def _ident_df(df: pd.DataFrame) -> pd.DataFrame:
    return df


def run_full_analysis(paths, *, redact: bool = True,
                      filter_config=None, ns_filter=None,
                      ds: rd.Dataset | None = None,
                      mode: str = "auto", shards: bool = False,
                      exclude: set[str] | frozenset = frozenset(),
                      driver_merge_max_bytes: int = 256 << 20,
                      p95_mode: str = "auto", raw: bool = False,
                      payload_driver_max_bytes: int | None = None
                      ) -> dict[str, pd.DataFrame]:
    """Everything the reference's JSON report contains (K3), as small
    pandas tables.

    ONE streaming pass (``aggs.multifold``) computes every sink's
    partials — no ``materialize()`` of the classified corpus, no
    per-sink re-scans.  ``mode="auto"`` merges driver-side below
    ``driver_merge_max_bytes`` of estimated input (partials are
    groups × blocks — skips the shuffle latency floor) and switches to
    the distributed (sink, key-bucket) merge above it, where exact-p95
    partials carrying raw value arrays would otherwise converge on
    driver memory (ADVICE r1).

    ``p95_mode="auto"`` couples the percentile estimator to that gate:
    the golden small-input path keeps exact p95 (reference-parity
    readout from the full value array), and the SAME size gate that
    selects the distributed merge also flips to the bounded log-binned
    histogram sketch — so the 10^12-row configuration needs no knobs
    (per-group state stays a fixed 4096-bin histogram instead of raw
    value arrays riding the merge shuffle).  Pass
    ``p95_mode="exact"``/``"sketch"`` to pin it.  Pass
    ``ds`` to analyze an already-loaded Dataset (e.g. parsed raw logs)
    instead of parquet paths."""
    from ..aggs.multifold import run_multi_fold

    if mode == "auto":
        est = _est_input_bytes(paths, ds)
        mode = ("driver" if est is not None
                and est <= driver_merge_max_bytes else "distributed")
    if p95_mode == "auto":
        p95_mode = "sketch" if mode == "distributed" else "exact"
    if ds is None:
        ds = load_events(paths)
    cds = classify(ds, redact=redact, filter_config=filter_config,
                   ns_filter=ns_filter)
    kw = ({} if payload_driver_max_bytes is None
          else {"payload_driver_max_bytes": payload_driver_max_bytes})
    return run_multi_fold(
        cds, _analysis_jobs(by_shard=shards, exclude=exclude,
                            p95_mode=p95_mode, raw=raw), mode=mode, **kw)


def analysis_partition_id(path: str) -> str:
    """Stable partition id for ``run_full_analysis_resumable``: the
    readable basename stem PLUS a hash of the FULL input path, so two
    inputs with the same basename (e.g. shard dirs each holding an
    ``events.log.gz``) never collide in the manifest/partials
    namespace (ADVICE r4)."""
    import hashlib

    pid = os.path.splitext(os.path.basename(path))[0]
    if pid.endswith(".log"):  # .log.gz → strip both suffixes
        pid = os.path.splitext(pid)[0]
    digest = hashlib.md5(os.path.abspath(path).encode()).hexdigest()[:10]
    return f"{pid}-{digest}"


def completed_analysis_partitions(work_dir: str) -> dict[str, dict]:
    """Manifest of finished partitions for
    ``run_full_analysis_resumable`` (pid → {"rows": n})."""
    import json

    path = os.path.join(work_dir, "manifest.json")
    if not os.path.exists(path):
        return {}
    with open(path) as fh:
        return json.load(fh)


def invalidate_analysis_partitions(work_dir: str, pids) -> None:
    """Drop partitions from the manifest (and their persisted
    partials) so the next resumable run recomputes them.

    Manifest first, partials second: a crash between the two leaves a
    partition that is UNcommitted but still has its partial on disk —
    the resume recomputes and overwrites it, which is safe.  The
    opposite order (delete partial, then rewrite manifest — the r4
    code) left a committed pid with no data, silently dropping that
    partition from the final merge (ADVICE r4)."""
    import json

    man = completed_analysis_partitions(work_dir)
    pids = set(pids)
    for pid in pids:
        man.pop(pid, None)
    tmp = os.path.join(work_dir, f"manifest.json.tmp-{os.getpid()}")
    with open(tmp, "w") as fh:
        json.dump(man, fh)
    os.replace(tmp, os.path.join(work_dir, "manifest.json"))
    for pid in pids:
        p = os.path.join(work_dir, "partials", f"{pid}.parquet")
        if os.path.exists(p):
            os.remove(p)


def run_full_analysis_resumable(paths, work_dir: str, *,
                                redact: bool = True, shards: bool = False,
                                exclude: set[str] | frozenset = frozenset(),
                                p95_mode: str = "exact", raw: bool = False,
                                merge: str = "driver",
                                filter_config=None, ns_filter=None
                                ) -> dict[str, pd.DataFrame]:
    """CHECKPOINTED ``run_full_analysis``: one emit pass PER INPUT
    PARTITION (file), its (sink, bucket, payload) partial rows
    persisted under ``work_dir/partials/<pid>.parquet`` behind an
    atomically-rewritten manifest — a killed run resumes by skipping
    every manifest-committed partition and recomputing only the tail,
    then the final merge reads the persisted partials alone.

    Correct because the multifold contract requires
    ``finalize(bucket_merge(partials))`` to distribute over any
    partition of the inputs — the per-partition emit produces exactly
    the same tagged partial rows the single-pass job would, just
    persisted between passes.  Partial volume is groups × blocks per
    partition (never row-scale), so the checkpoint cost is the
    manifest write + a small parquet.  ``merge="distributed"`` routes
    the final reduce through the (sink, bucket) groupby exchange for
    partial sets too large for one driver concat (exact-p95 value
    arrays over many partitions); emit always bucket-tags so either
    merge reads the same files."""
    import json

    from ..aggs.multifold import make_emit, merge_payload_ds, \
        merge_payload_rows

    jobs = _analysis_jobs(by_shard=shards, exclude=exclude,
                          p95_mode=p95_mode, raw=raw)
    emit = make_emit(jobs, "distributed")  # bucket-tag for either merge
    part_dir = os.path.join(work_dir, "partials")
    os.makedirs(part_dir, exist_ok=True)
    manifest = completed_analysis_partitions(work_dir)

    pids = {p: analysis_partition_id(p) for p in paths}
    if len(set(pids.values())) != len(paths):
        raise ValueError("duplicate input paths in resumable analysis")
    for p in paths:
        pid = pids[p]
        part_file = os.path.join(part_dir, f"{pid}.parquet")
        # committed-but-missing partial (e.g. a crash inside an older
        # invalidate) is treated as uncommitted: recompute (ADVICE r4)
        if pid in manifest and os.path.exists(part_file):
            continue
        cds = classify(load_events([p]), redact=redact,
                       filter_config=filter_config, ns_filter=ns_filter)
        rows = cds.map_batches(emit, batch_format="pyarrow",
                               batch_size=32768,
                               zero_copy_batch=True).to_pandas()
        tbl = pa.table({
            "sink": pa.array(rows["sink"].astype(str), pa.string()),
            "bucket": pa.array(rows["bucket"].to_numpy(), pa.int64()),
            "payload": pa.array(list(rows["payload"]), pa.binary()),
        })
        tmp = os.path.join(part_dir, f"{pid}.parquet.tmp-{os.getpid()}")
        pq.write_table(tbl, tmp)
        os.replace(tmp, os.path.join(part_dir, f"{pid}.parquet"))
        manifest[pid] = {"rows": int(tbl.num_rows)}
        mtmp = os.path.join(work_dir, f"manifest.json.tmp-{os.getpid()}")
        with open(mtmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(mtmp, os.path.join(work_dir, "manifest.json"))

    # Merge ONLY the current run's partitions: a reused work_dir may
    # hold manifest entries / partials from inputs no longer in
    # `paths` — merging every *.parquet on disk would silently inflate
    # every sink with stale data (ADVICE r4).
    files = sorted(os.path.join(part_dir, f"{pid}.parquet")
                   for pid in pids.values())
    missing = [f for f in files if not os.path.exists(f)]
    if missing:
        raise RuntimeError(
            f"resumable analysis: {len(missing)} committed partition(s) "
            f"missing partials, e.g. {missing[0]}")
    if merge == "distributed":
        return merge_payload_ds(
            rd.read_parquet(files).map_batches(
                lambda t: t.to_pandas(), batch_format="pyarrow"), jobs)
    frames = [pq.read_table(f).to_pandas() for f in files]
    rows = (pd.concat(frames, ignore_index=True) if frames
            else pd.DataFrame({"sink": pd.Series(dtype="string"),
                               "bucket": pd.Series(dtype="int64"),
                               "payload": pd.Series(dtype=object)}))
    return merge_payload_rows(rows, jobs)
