"""Flagship pipeline: read → classify → redact → enrich → route →
per-sink aggregates (SURVEY.md §7.0).

The reference's ``LogParser.main`` (LogParser.java:1670, traced in
SURVEY.md §3.1) reads files line-by-line into 25k-line chunks and folds
shared synchronized accumulators; here the same result tables are
produced by a lazy Ray ``Dataset`` pipeline — streaming blocks,
vectorized classify, actor-pool redaction, two-phase grouped folds.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

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
    "remote",
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


def classify(ds: rd.Dataset, *, redact: bool = True,
             ns_meta=None, redact_concurrency: int | tuple = (1, 8),
             filter_config=None, ns_filter=None) -> rd.Dataset:
    """classify + COLLSCAN flag (stateless, zero-copy) → optional
    user filters (configurable ignore blacklist F4 / namespace
    selectors F5) → redaction (stateful actor pool) → ns enrichment
    (broadcast dict)."""
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

    return (
        cds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["planning_time_us", "doc_id"], descending=[True, True])
        .limit(k)
    )


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


def _per_conn(g: pd.DataFrame) -> pd.DataFrame:
    """All events of one connection → one row per client-metadata event.

    Deterministic re-expression of the two-pass join: auth rows provide
    the username (first by doc_id), lifecycle rows the lifetime
    (min accepted ts → max ended ts, kept only if positive —
    TwoPassDriverStatsAccumulator.java:110-142)."""
    g = g.sort_values("doc_id", kind="mergesort")
    meta = g[g["driver_name"].notna()]
    if meta.empty:
        return _CONN_EMPTY.copy()
    users = g["username"].dropna()
    username = users.iloc[0] if len(users) else "none"
    starts = g.loc[g["msg"] == "Connection accepted", "ts"]
    ends = g.loc[g["msg"] == "Connection ended", "ts"]
    lifetime = None
    if len(starts) and len(ends):
        delta = (ends.max() - starts.min()).total_seconds() * 1000.0
        if delta > 0:
            lifetime = delta
    ctx = g["ctx"].iloc[0]
    # deterministic 1-in-10 sampling (replaces Math.random()<0.1,
    # TwoPassDriverStatsAccumulator.java:29-31)
    sampled = int(ctx[4:]) % 10 == 0 if ctx.startswith("conn") else False
    out = meta[["driver_name", "driver_version", "os_type", "platform",
                "compressors", "remote"]].copy()
    out["username"] = username
    out["lifetime_ms"] = float(lifetime) if (lifetime is not None and sampled) else None
    out["lifetime_ms"] = out["lifetime_ms"].astype("float64")
    return out


_CONN_EMPTY = pd.DataFrame({
    "driver_name": pd.Series(dtype="string"),
    "driver_version": pd.Series(dtype="string"),
    "os_type": pd.Series(dtype="string"),
    "platform": pd.Series(dtype="string"),
    "compressors": pd.Series(dtype="string"),
    "remote": pd.Series(dtype="string"),
    "username": pd.Series(dtype="string"),
    "lifetime_ms": pd.Series(dtype="float64"),
})

_DRIVER_KEY = ["driver_name", "driver_version", "os_type", "platform",
               "compressors", "username"]


def _driver_rollup(g: pd.DataFrame) -> pd.DataFrame:
    lt = g["lifetime_ms"].dropna()
    row = {k: g[k].iloc[0] for k in _DRIVER_KEY}
    row.update({
        "conn_count": len(g),
        "distinct_hosts": g["remote"].nunique(),
        "lifetime_avg_ms": float(lt.mean()) if len(lt) else None,
        "lifetime_max_ms": float(lt.max()) if len(lt) else None,
    })
    out = pd.DataFrame([row])
    for k in _DRIVER_KEY:
        out[k] = out[k].astype("string")
    out["conn_count"] = out["conn_count"].astype("int64")
    out["distinct_hosts"] = out["distinct_hosts"].astype("int64")
    out["lifetime_avg_ms"] = out["lifetime_avg_ms"].astype("float64")
    out["lifetime_max_ms"] = out["lifetime_max_ms"].astype("float64")
    return out


def driver_stats(cds: rd.Dataset) -> rd.Dataset:
    conn_cols = ["doc_id", "ctx", "msg", "ts", "driver_name", "driver_version",
                 "os_type", "platform", "compressors", "remote", "username"]

    def conn_events(batch: pa.Table) -> pa.Table:
        return batch.filter(batch["r_conn"]).select(conn_cols)

    per_conn = (
        cds.map_batches(conn_events, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ctx").map_groups(_per_conn, batch_format="pandas")
    )
    # drop internal drivers (TwoPassDriverStatsAccumulator.java:150-154)
    def drop_internal(df: pd.DataFrame) -> pd.DataFrame:
        m = (~df["driver_name"].str.startswith(INTERNAL_DRIVER_PREFIX)
             & (df["driver_name"] != INTERNAL_DRIVER_NAME))
        return df[m]

    return (per_conn.map_batches(drop_internal, batch_format="pandas")
            .groupby(_DRIVER_KEY).map_groups(_driver_rollup,
                                             batch_format="pandas"))


def run_full_analysis(paths, *, redact: bool = True,
                      filter_config=None, ns_filter=None,
                      ds: rd.Dataset | None = None,
                      max_parallel: int = 6) -> dict[str, pd.DataFrame]:
    """Everything the reference's JSON report contains (K3), as small
    pandas tables — the driver-side collect of final aggregates.
    Pass ``ds`` to analyze an already-loaded Dataset (e.g. parsed raw
    logs) instead of parquet paths."""
    from concurrent.futures import ThreadPoolExecutor
    from ..aggs.fold import run_fold

    if ds is None:
        ds = load_events(paths)
    # Materialized once so the ~12 sink consumers don't re-run the
    # classify/redact chain. At production scale the routing stage
    # (pipelines.route) persists routed parquet per sink instead and
    # each aggregate reads only its sink's narrow columns.
    cds = classify(ds, redact=redact, filter_config=filter_config,
                   ns_filter=ns_filter).materialize()

    def sink_job(name):
        filter_fn, spec = sink_defs.ALL_SINKS[name]()
        filtered = cds.map_batches(filter_fn, batch_format="pyarrow",
                                   zero_copy_batch=True)
        # report-scale outputs: driver merge skips the sort shuffle
        return run_fold(filtered, spec, merge="driver").to_pandas()

    jobs: dict[str, object] = {
        name: (lambda n=name: sink_job(n)) for name in sink_defs.ALL_SINKS}
    jobs["app_conns"] = app_connection_stats(cds).to_pandas
    jobs["slow_planning"] = slow_planning_topk(cds).to_pandas
    jobs["driver_stats"] = driver_stats(cds).to_pandas
    jobs["ignored"] = ignored_histogram(cds).to_pandas
    # the ~12 result pipelines are tiny but each pays a fixed executor
    # spin-up; run them from concurrent driver threads so the floors
    # overlap instead of summing
    with ThreadPoolExecutor(max_workers=max_parallel) as ex:
        futs = {n: ex.submit(fn) for n, fn in jobs.items()}
        results = {n: f.result() for n, f in futs.items()}
    results["processing_stats"] = processing_stats(cds)
    return results
