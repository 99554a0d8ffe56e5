"""Row-preserving JSON trim — the LogFilter tool analogue (SURVEY.md
§2.1 K7 / §2.3 R7; reference ``LogFilter.java:64-103,315-396``).

Drops verbose keys, truncates long strings and long arrays (keeping
the first element plus a ``<truncated N elements>`` marker), removes
empty objects.  Runs as the minimal read → map_batches → write slice
(SURVEY.md §3.3: "the template for the minimal Ray Data slice")."""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc

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


# --- streaming JSONL mode (LogFilter.java:128-254) ----------------------
MONGO_JSON_PREFIX = '{"t":{"$date"'


def extract_json_from_line(line: str) -> str:
    """Strip a grep-style ``filename:`` prefix when the remainder is a
    mongod JSON line (``LogFilter.java:210-218``)."""
    colon = line.find(":")
    if 0 < colon < len(line) - 1:
        after = line[colon + 1:]
        if after.startswith(MONGO_JSON_PREFIX):
            return after
    return line


def trim_line(line: str | None, *, redactor=None,
              ignore_regex=None) -> str | None:
    """One raw log line → trimmed compact JSON, or ``None`` when the
    line is filtered (blacklisted, not a mongod JSON line, unparsable,
    or trimmed to empty — ``LogFilter.java:171-179,200-208``).

    Pattern-gate note: the reference's ``containsMongoJsonPattern``
    accepts only grep-prefixed lines (its direct-JSON fallback at
    LogFilter.java:281-282 is unreachable — the pattern itself contains
    a ':', so ``colonIndex > 0`` always wins); this implements the
    documented intent: direct JSON lines OR grep-prefixed lines pass."""
    if line is None:
        return None
    if ignore_regex is not None and ignore_regex.search(line):
        return None
    s = extract_json_from_line(line)
    if not s.startswith(MONGO_JSON_PREFIX):
        return None
    try:
        doc = json.loads(s)
    except (ValueError, TypeError):
        return None
    doc = trim_node(doc)
    if redactor is not None:
        doc = redactor.redact_fragment(doc)
    if not doc:
        return None
    return json.dumps(doc, sort_keys=True, separators=(",", ":"))


def trim_lines_batch(batch: pa.Table, *, redactor=None,
                     filter_config=None,
                     text_col: str = "text") -> pa.Table:
    """Raw-line batch → (trimmed) JSONL rows, non-qualifying lines
    DROPPED (row-filtering, unlike ``trim_batch``'s row-preserving
    parquet mode).  The blacklist gate runs vectorized over the whole
    batch before any Python-level JSON parse."""
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    if filter_config is not None:
        keep = pc.invert(filter_config.should_ignore_mask(text))
        text = text.filter(pc.fill_null(keep, False))
    out = [t for v in text.to_pylist()
           if (t := trim_line(v, redactor=redactor)) is not None]
    return pa.table({"trimmed": pa.array(out, pa.string())})


def trim_stream(in_fh, out_fh, *, redactor=None,
                filter_config=None) -> dict:
    """stdin→stdout streaming trim (``LogFilter.java:228-254``): one
    pass, constant memory, stats returned for the caller to print to
    stderr.  This is the driver-side tool path — a shell pipe has one
    reader by construction, so no Ray session is involved."""
    ignore_re = None
    if filter_config is not None and filter_config._regex:
        import re

        ignore_re = re.compile(filter_config._regex)
    total = emitted = 0
    for line in in_fh:
        total += 1
        t = trim_line(line.rstrip("\n"), redactor=redactor,
                      ignore_regex=ignore_re)
        if t is not None:
            emitted += 1
            out_fh.write(t + "\n")
    return {"lines": total, "emitted": emitted}
