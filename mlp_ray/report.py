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


# Self-contained interactivity (no external libs): type-aware column
# sorting with ↕/↑/↓ indicators, a per-table substring filter box, and
# collapsible sections — the reference's interactive surface
# (HtmlReportGenerator.java:202-275 styles, sortTable/filterTable JS)
# re-expressed, not transliterated.  Long cells (sample messages,
# count-map JSON) render as <details> accordions with pretty-printed
# JSON, mirroring the reference's pretty-print accordion rows
# (HtmlReportGenerator.java:507-566).
_HTML_CSS = """
body{font-family:-apple-system,'Segoe UI',sans-serif;margin:20px;
     background:#f7f9f8;color:#1c2d2a}
h1{font-size:22px} h2{font-size:17px;margin:0}
.sec{background:#fff;border:1px solid #d9e2e0;border-radius:6px;
     padding:12px 16px;margin-bottom:18px}
.sec-head{display:flex;align-items:center;gap:10px;cursor:pointer}
.sec-head .arrow::before{content:'\\25BC';font-size:11px;opacity:.6}
.sec.closed .arrow::before{content:'\\25B6'}
.sec.closed .sec-body{display:none}
.filter{padding:6px 8px;border:1px solid #b8c4c2;border-radius:4px;
        width:240px;margin:8px 8px 4px 0}
.count{font-size:12px;opacity:.65}
table{border-collapse:collapse;margin-top:8px;font-size:13px;width:100%}
td,th{border:1px solid #d0d7d5;padding:3px 8px;text-align:right;
      font-family:ui-monospace,monospace}
td.s,th.s{text-align:left}
th{background:#eef3f2;cursor:pointer;user-select:none;position:sticky;top:0}
th::after{content:' \\2195';font-size:11px;opacity:.45}
th.asc::after{content:' \\2191';opacity:1}
th.desc::after{content:' \\2193';opacity:1}
tr:nth-child(even) td{background:#fbfdfc}
details{max-width:480px} details>summary{cursor:pointer;list-style:none;
  white-space:nowrap;overflow:hidden;text-overflow:ellipsis;opacity:.85}
details[open]>summary{white-space:normal;opacity:.5}
details pre{text-align:left;white-space:pre-wrap;margin:4px 0;
            max-height:300px;overflow:auto;background:#f2f5f4;padding:6px}
"""

_HTML_JS = """
function cellVal(tr,i){var td=tr.cells[i];if(!td)return'';
  var d=td.querySelector('details pre');return d?d.textContent:td.textContent;}
function sortTable(th){
  var table=th.closest('table'),i=th.cellIndex,
      rows=Array.from(table.tBodies[0].rows),
      dir=th.classList.contains('asc')?-1:1;
  table.tHead.querySelectorAll('th').forEach(
      function(h){h.classList.remove('asc','desc');});
  th.classList.add(dir===1?'asc':'desc');
  var numeric=rows.every(function(r){var v=cellVal(r,i).trim();
      return v===''||v==='None'||!isNaN(parseFloat(v));});
  rows.sort(function(a,b){
    var x=cellVal(a,i).trim(),y=cellVal(b,i).trim();
    if(numeric){
      var fx=parseFloat(x),fy=parseFloat(y);
      if(isNaN(fx))return isNaN(fy)?0:1;
      if(isNaN(fy))return -1;
      return dir*(fx-fy);
    }
    return dir*x.localeCompare(y);
  });
  rows.forEach(function(r){table.tBodies[0].appendChild(r);});
}
function filterTable(inp){
  var box=inp.closest('.tbl'),q=inp.value.toLowerCase(),shown=0,
      rows=box.querySelector('table').tBodies[0].rows;
  Array.from(rows).forEach(function(r){
    var hit=q===''||r.textContent.toLowerCase().indexOf(q)>=0;
    r.style.display=hit?'':'none';if(hit)shown++;});
  box.querySelector('.count').textContent=
      shown+' / '+rows.length+' rows';
}
function toggleSec(h){h.closest('.sec').classList.toggle('closed');}
document.addEventListener('click',function(e){
  var th=e.target.closest('th');if(th)sortTable(th);});
"""

# cells longer than this render as a pretty-print accordion
_LONG_CELL = 80


def _html_cell(v: Any) -> tuple[str, bool]:
    """Render one cell → (inner html, is_string_like)."""
    import html as _html

    if isinstance(v, (dict, list)):
        s = json.dumps(v, sort_keys=True)
    else:
        s = "" if v is None else str(v)
    string_like = not isinstance(v, (int, float)) or isinstance(v, bool)
    if len(s) > _LONG_CELL:
        try:
            pretty = json.dumps(json.loads(s), indent=2, sort_keys=True)
        except (ValueError, TypeError):
            pretty = s
        return ("<details><summary>" + _html.escape(s[:_LONG_CELL]) +
                "…</summary><pre>" + _html.escape(pretty) +
                "</pre></details>"), True
    return _html.escape(s), string_like


def write_html_report(results: dict[str, pd.DataFrame], path: str,
                      *, top: int = 100, shards: bool = False,
                      **kw) -> None:
    """K4: interactive single-file HTML report — sortable columns
    (type-aware, with sort-direction indicators), per-table filter
    inputs with live row counts, collapsible sections, and
    pretty-print accordions for long cells; same data/section order as
    the JSON report (HtmlReportGenerator.java:131-186 sections,
    :202-275 interactive styles, :467-566 filter/accordion controls —
    re-expressed as self-contained vanilla JS, no CDN/libs).

    ``shards=True`` (the ``--shards`` run mode) appends one collapsible
    section per shard — every source-keyed sink sliced to that shard,
    source column dropped — mirroring the reference's dedicated
    per-shard report tables (HtmlReportGenerator.java:398-925)."""
    import html as _html

    rep = build_report(results, **kw)
    parts = ["<!doctype html><meta charset='utf-8'>",
             "<title>mlp_ray report</title>",
             f"<style>{_HTML_CSS}</style>",
             "<h1>mlp_ray analysis report</h1>"]
    meta = rep.get("metadata")
    if isinstance(meta, dict):
        parts.append("<p class='count'>" + " · ".join(
            f"{_html.escape(str(k))}: {_html.escape(str(v))}"
            for k, v in meta.items()) + "</p>")

    def table(rows: list[dict]) -> str:
        if not rows:
            return "<p class='count'>(empty)</p>"
        cols = list(rows[0])
        rows = rows[:top]
        rendered = [[_html_cell(r.get(c)) for c in cols] for r in rows]
        # a column is left-aligned iff any of its cells is string-like
        is_s = [any(row[j][1] for row in rendered)
                for j in range(len(cols))]
        h = "".join(
            f"<th{' class=s' if is_s[j] else ''}>{_html.escape(str(c))}</th>"
            for j, c in enumerate(cols))
        body = "".join(
            "<tr>" + "".join(
                f"<td{' class=s' if is_s[j] else ''}>{cell}</td>"
                for j, (cell, _) in enumerate(row)) + "</tr>"
            for row in rendered)
        return ("<div class='tbl'>"
                "<input class='filter' placeholder='Filter rows…' "
                "oninput='filterTable(this)'>"
                f"<span class='count'>{len(rows)} rows</span>"
                f"<table><thead><tr>{h}</tr></thead>"
                f"<tbody>{body}</tbody></table></div>")

    for section, payload in rep.items():
        if section == "metadata":
            continue
        inner = []
        if isinstance(payload, dict):
            summary = {k: v for k, v in payload.items()
                       if not isinstance(v, list)}
            if summary:
                inner.append(table([summary]))
            for v in payload.values():
                if isinstance(v, list):
                    inner.append(table(v))
        elif isinstance(payload, list):
            inner.append(table(payload))
        parts.append(
            "<div class='sec'>"
            "<div class='sec-head' onclick='toggleSec(this)'>"
            f"<span class='arrow'></span><h2>{_html.escape(section)}</h2>"
            "</div><div class='sec-body'>" + "".join(inner) +
            "</div></div>")
    if shards:
        shard_frames = {
            name: df for name, df in results.items()
            if isinstance(df, pd.DataFrame) and "source" in df.columns}
        sources: list = sorted({s for df in shard_frames.values()
                                for s in df["source"].dropna().unique()})
        for src in sources:
            inner = []
            for name, df in shard_frames.items():
                sub = df[df["source"] == src].drop(columns=["source"])
                if sub.empty:
                    continue
                inner.append(f"<h3>{_html.escape(str(name))}</h3>"
                             + table(_records(sub)))
            parts.append(
                "<div class='sec shard closed'>"
                "<div class='sec-head' onclick='toggleSec(this)'>"
                "<span class='arrow'></span>"
                f"<h2>shard: {_html.escape(str(src))}</h2>"
                "</div><div class='sec-body'>" + "".join(inner) +
                "</div></div>")
    parts.append(f"<script>{_HTML_JS}</script>")
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
