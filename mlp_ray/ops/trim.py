"""Row-preserving JSON trim — the LogFilter tool analogue (SURVEY.md
§2.1 K7 / §2.3 R7; reference ``LogFilter.java:64-103,315-396``).

Drops verbose keys, truncates long strings and long arrays (keeping
the first element plus a ``<truncated N elements>`` marker), removes
empty objects.  Runs as the minimal read → map_batches → write slice
(SURVEY.md §3.3: "the template for the minimal Ray Data slice")."""

from __future__ import annotations

import json

import pyarrow as pa

# verbose keys dropped entirely (LogFilter.java:64-75 spirit)
IGNORE_KEYS = frozenset({
    "lsid", "$clusterTime", "flowControl", "shardVersion", "locks",
    "readConcern", "$configTime", "$topologyTime", "needsMerge",
    "let", "mayBypassWriteBlocking",
})
# keys whose arrays are never truncated (LogFilter.java:77-78)
PRESERVE_ARRAY_KEYS = frozenset({"pipeline", "$and", "$or"})
# strings under these keys are never truncated
PRESERVE_STRING_KEYS = frozenset({"ns", "planSummary"})

MAX_STR = 35
MAX_ARR = 3


def trim_node(node, parent_key: str | None = None):
    if isinstance(node, dict):
        out = {}
        for k, v in node.items():
            if k in IGNORE_KEYS:
                continue
            t = trim_node(v, k)
            if t == {} and isinstance(v, dict) and v != {}:
                continue  # drop objects that trimmed to empty
            out[k] = t
        return out
    if isinstance(node, list):
        if parent_key in PRESERVE_ARRAY_KEYS or len(node) <= MAX_ARR:
            return [trim_node(x, parent_key) for x in node]
        return [trim_node(node[0], parent_key),
                f"<truncated {len(node) - 1} elements>"]
    if isinstance(node, str):
        if parent_key in PRESERVE_STRING_KEYS or len(node) <= MAX_STR:
            return node
        return node[:MAX_STR] + "..."
    return node


def trim_json_str(s: str | None, redactor=None) -> str | None:
    if s is None:
        return None
    try:
        doc = json.loads(s)
    except (ValueError, TypeError):
        # non-JSON rows pass through row-preserved — but never
        # unredacted when redaction is requested
        return s if redactor is None else '"xxx"'
    doc = trim_node(doc)
    if redactor is not None:
        # --redact: whole-message preserve-path walk over the trimmed
        # fragment (reference LogFilter + LogRedactionUtil combination)
        doc = redactor.redact_fragment(doc)
    return json.dumps(doc, sort_keys=True, separators=(",", ":"))


def trim_batch(batch: pa.Table, col: str = "props",
               out_col: str = "trimmed", redactor=None) -> pa.Table:
    vals = [trim_json_str(v, redactor) for v in batch[col].to_pylist()]
    return batch.append_column(out_col, pa.array(vals, pa.string()))
