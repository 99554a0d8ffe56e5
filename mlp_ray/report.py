"""K3/K5 report layer: the reference's structured JSON report and
console tables, built from the small final aggregate frames.

Mirrors ``JsonReportGenerator.java:29-89`` — a metadata header plus one
section per accumulator, every table sorted count-desc
(``:110-113``), the query-hash section capped at the top 100
(``:249-251``), operation-type stats carrying percentages
(``:186-206``). R10 formatting helpers (bytes/duration → human,
``LogRedactionUtil.java:470-620``) live here because they are
report-layer only."""

from __future__ import annotations

import json
from typing import Any

import pandas as pd

TOP_QUERY_HASHES = 100  # JsonReportGenerator.java:251


# --- R10 formatting helpers -------------------------------------------------
def human_bytes(n: float | int | None) -> str | None:
    if n is None or pd.isna(n):
        return None
    n = float(n)
    for unit in ("B", "KB", "MB", "GB", "TB", "PB"):
        if abs(n) < 1024.0 or unit == "PB":
            return f"{n:.1f} {unit}" if unit != "B" else f"{int(n)} B"
        n /= 1024.0


def human_duration(ms: float | int | None) -> str | None:
    if ms is None or pd.isna(ms):
        return None
    ms = float(ms)
    if ms < 1000:
        return f"{ms:.0f}ms"
    s = ms / 1000.0
    if s < 60:
        return f"{s:.1f}s"
    m, s = divmod(s, 60.0)
    if m < 60:
        return f"{int(m)}m {s:.0f}s"
    h, m = divmod(m, 60.0)
    return f"{int(h)}h {int(m)}m"


def _records(df: pd.DataFrame, *, sort_by: str | None = "count",
             limit: int | None = None) -> list[dict[str, Any]]:
    if df is None or df.empty:
        return []
    if sort_by and sort_by in df.columns:
        df = df.sort_values(sort_by, ascending=False, kind="mergesort")
    if limit:
        df = df.head(limit)
    out = df.to_dict("records")
    for rec in out:  # strict-JSON-safe scalars: every NA flavor → null
        for k, v in rec.items():
            if v is None:
                continue
            if isinstance(v, pd.Timestamp):
                rec[k] = None if pd.isna(v) else v.isoformat()
                continue
            try:
                if pd.isna(v):  # covers float NaN, pd.NA, NaT
                    rec[k] = None
                    continue
            except (TypeError, ValueError):
                pass  # arrays/lists: leave as-is
            if hasattr(v, "item"):
                rec[k] = v.item()
    return out


def build_report(results: dict[str, pd.DataFrame], *,
                 generated_at: str | None = None,
                 source_files: list[str] | None = None) -> dict[str, Any]:
    """Final aggregates → the reference-shaped JSON report document."""
    main = results.get("main_ops", pd.DataFrame())
    qh = results.get("query_hash", pd.DataFrame())
    idx = results.get("index_stats", pd.DataFrame())
    ops = results.get("op_stats", pd.DataFrame())

    report: dict[str, Any] = {
        "metadata": {
            "generatedAt": generated_at,
            "sourceFiles": source_files or [],
            "engine": "mlp_ray",
        },
    }
    if "processing_stats" in results and len(results["processing_stats"]):
        report["processingStats"] = _records(
            results["processing_stats"], sort_by=None)[0]

    report["mainOperations"] = {
        "summary": {
            "totalOperations": int(main["count"].sum()) if len(main) else 0,
            "uniqueOperationPatterns": len(main),
            "totalDurationMs": (float(main["sum_duration_ms"].sum())
                                if "sum_duration_ms" in main else None),
        },
        "operations": _records(main),
    }
    report["ttlOperations"] = _records(results.get("ttl"))

    # operationTypeStats with percentages (JsonReportGenerator.java:186-206)
    if ops is not None and len(ops):
        total = int(ops["count"].sum())
        rows = []
        for rec in _records(ops):
            rec["percentage"] = round(rec["count"] * 100.0 / total, 2)
            rows.append(rec)
        report["operationTypeStats"] = {"total": total, "types": rows}
    else:
        report["operationTypeStats"] = {"total": 0, "types": []}

    if len(qh) and "avg_planning_time_us" in qh.columns:
        # reference reports planning time in ms (µs→ms at read,
        # QueryHashAccumulatorEntry.java planning accessors)
        qh = qh.assign(avg_planning_time_ms=qh["avg_planning_time_us"]
                       / 1000.0)
    report["queryHashAnalysis"] = {
        "summary": {
            "totalQueries": int(qh["count"].sum()) if len(qh) else 0,
            "uniqueQueryHashes": (int(qh["query_hash"].nunique())
                                  if "query_hash" in qh else 0),
        },
        # top-100 cap (JsonReportGenerator.java:249-251)
        "queries": _records(qh, limit=TOP_QUERY_HASHES),
    }
    report["planCacheAnalysis"] = _records(results.get("plan_cache"))

    if len(idx) and {"sum_keys_examined", "sum_nret"} <= set(idx.columns):
        # examined:returned ratio (IndexStatsEntry.java:31-113)
        idx = idx.assign(examined_returned_ratio=(
            idx["sum_keys_examined"]
            / idx["sum_nret"].where(idx["sum_nret"] > 0)).round(3))
    coll_cnt = (int(idx["collscan_count"].sum())
                if "collscan_count" in idx else 0)
    idx_total = int(idx["count"].sum()) if len(idx) else 0
    report["indexStats"] = {
        "summary": {
            "totalOperations": idx_total,
            "collscanCount": coll_cnt,
            "collscanPercent": (round(coll_cnt * 100.0 / idx_total, 2)
                                if idx_total else 0.0),
        },
        "indexes": _records(idx),
    }
    report["errorCodes"] = _records(results.get("errors"))
    report["transactions"] = _records(results.get("txn"))
    if "app_conns" in results:
        report["appNameConnections"] = _records(
            results["app_conns"], sort_by="distinct_conn_count")
    if "driver_stats" in results:
        report["driverStats"] = _records(results["driver_stats"],
                                         sort_by="conn_count")
    if "slow_planning" in results:
        report["slowPlanning"] = _records(results["slow_planning"],
                                          sort_by="planning_time_us")
    if "ignored" in results:
        ign = results["ignored"].rename(columns={"count()": "count"})
        total_ign = int(ign["count"].sum()) if len(ign) else 0
        rows = []
        for rec in _records(ign):
            # per-category share (reportIgnoredAnalysis
            # LogParser.java:1114-1125)
            rec["percentage"] = round(
                rec["count"] * 100.0 / max(total_ign, 1), 1)
            rows.append(rec)
        report["ignoredLines"] = {"total": total_ign, "categories": rows}
    return report


def write_json_report(results: dict[str, pd.DataFrame], path: str,
                      **kw) -> dict[str, Any]:
    rep = build_report(results, **kw)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(rep, fh, indent=2, default=str)
    import os
    os.replace(tmp, path)
    return rep


def write_html_report(results: dict[str, pd.DataFrame], path: str,
                      *, top: int = 100, **kw) -> None:
    """K4 (minimal): static HTML tables per section — same data as the
    JSON report (HtmlReportGenerator.java:131-186 section order spirit;
    the reference's 2.8 kLoC interactive report is out of scope per
    SURVEY.md §2.1 K4, JSON/CSV parity is authoritative)."""
    import html as _html

    rep = build_report(results, **kw)
    parts = ["<!doctype html><meta charset='utf-8'>",
             "<title>mlp_ray report</title>",
             "<style>body{font-family:monospace}table{border-collapse:"
             "collapse}td,th{border:1px solid #999;padding:2px 6px;"
             "text-align:right}th{background:#eee}</style>",
             "<h1>mlp_ray analysis report</h1>"]

    def table(rows: list[dict]) -> str:
        if not rows:
            return "<p>(empty)</p>"
        cols = list(rows[0])
        h = "".join(f"<th>{_html.escape(str(c))}</th>" for c in cols)
        body = "".join(
            "<tr>" + "".join(
                f"<td>{_html.escape(str(r.get(c, '')))}</td>" for c in cols)
            + "</tr>" for r in rows[:top])
        return f"<table><tr>{h}</tr>{body}</table>"

    for section, payload in rep.items():
        if section == "metadata":
            continue
        parts.append(f"<h2>{_html.escape(section)}</h2>")
        if isinstance(payload, dict):
            summary = {k: v for k, v in payload.items()
                       if not isinstance(v, list)}
            if summary:
                parts.append(table([{k: json.dumps(v) if isinstance(v, dict)
                                     else v for k, v in summary.items()}]))
            for v in payload.values():
                if isinstance(v, list):
                    parts.append(table(v))
        elif isinstance(payload, list):
            parts.append(table(payload))
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write("\n".join(parts))
    import os
    os.replace(tmp, path)


def console_report(results: dict[str, pd.DataFrame], *, top: int = 10) -> str:
    """K5: fixed-width console tables per accumulator
    (Accumulator.report, Accumulator.java:160-167), plus the error
    summary with its top-5 most-frequent list
    (ErrorCodeAccumulator.java:95-117)."""
    lines = []
    err = results.get("errors")
    if err is not None and isinstance(err, pd.DataFrame) and len(err):
        total = int(err["count"].sum())
        lines += ["=== Error Code Summary ===",
                  f"Total error occurrences: {total:,}",
                  f"Unique error codes: {len(err):,}",
                  "=== Top 5 Most Frequent Errors ==="]
        top5 = err.sort_values("count", ascending=False,
                               kind="mergesort").head(5)
        for _, r in top5.iterrows():
            pct = r["count"] * 100.0 / total
            lines.append(f"  {r['err_code_name']}: {int(r['count']):,} "
                         f"({pct:.1f}%)")
        lines.append("")
    for name, df in results.items():
        if df is None or not isinstance(df, pd.DataFrame) or df.empty:
            continue
        lines.append(f"== {name} ({len(df)} groups) ==")
        srt = (df.sort_values("count", ascending=False, kind="mergesort")
               if "count" in df.columns else df)
        lines.append(srt.head(top).to_string())
        lines.append("")
    return "\n".join(lines)
