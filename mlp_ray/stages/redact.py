"""Query-shape redaction / hashing — the stateful actor-pool stage.

Re-implements the semantics of the reference's redaction subsystem
(``LogRedactionUtil.java``: string redaction :963-973, digit→9 number
redaction with ±1 sort-direction preservation :975-1014, smart regex
redaction :367-382, ``sanitizeFilter`` :721-736) from scratch.  The
walk is inherently per-record (arbitrary nested JSON), so it runs as a
callable-class ``map_batches`` stage: regexes compiled and preserve
sets built once per actor in ``__init__``, batches processed in
``__call__`` (``concurrency=N`` actor pool).

Adds columns:
  sanitized_query — redacted canonical filter JSON (or raw when
                    redaction is disabled), null where no filter
  shape_hash      — 8-hex hash of the sanitized shape
"""

from __future__ import annotations

import hashlib
import json
import re

import pyarrow as pa


# R5: Atlas hostname redaction (redactAtlasHostname
# LogRedactionUtil.java:325-341) — cluster id + region → xxx, the
# structural parts (shard numbers, domain, port) survive.
_ATLAS_RE = re.compile(
    r"atlas-([a-z0-9]+)-shard-(\d+)-(\d+)\.([a-z0-9-]+)\.mongodb\.net"
    r"(:\d+)?", re.IGNORECASE)


def redact_atlas_hostname(s: str) -> str:
    def sub(m: re.Match) -> str:
        port = m.group(5) or ""
        return f"atlas-xxx-shard-{m.group(2)}-{m.group(3)}.xxx.mongodb.net" \
               f"{port}"
    return _ATLAS_RE.sub(sub, s)


# R8: truncation detector (isLogMessageTruncated
# LogRedactionUtil.java:405-417,686-716) — nested ``truncated`` probe.
def is_truncated(node) -> bool:
    if isinstance(node, dict):
        if "truncated" in node:
            return True
        return any(is_truncated(v) for v in node.values())
    if isinstance(node, list):
        return any(is_truncated(x) for x in node)
    return False


# R9: mongos/mongod source detector (detectQuerySource
# LogRedactionUtil.java:625-681) — recursive probe for mongos markers.
def detect_query_source(node) -> str:
    def probe(x) -> bool:
        if isinstance(x, dict):
            if "mongos" in x or "fromMongos" in x:
                return True
            return any(probe(v) for v in x.values())
        if isinstance(x, list):
            return any(probe(v) for v in x)
        return False
    return "mongos" if probe(node) else "mongod"


def annotate_json_col(batch: pa.Table, col: str = "props") -> pa.Table:
    """Derived columns over a JSON-string column: ``is_truncated`` (R8)
    and ``query_source`` (R9). Malformed/null rows → null flags."""
    trunc: list[bool | None] = []
    src: list[str | None] = []
    for s in batch[col].to_pylist():
        if s is None:
            trunc.append(None)
            src.append(None)
            continue
        try:
            doc = json.loads(s)
        except (ValueError, TypeError):
            trunc.append(None)
            src.append(None)
            continue
        trunc.append(is_truncated(doc))
        src.append(detect_query_source(doc))
    return (batch.append_column("is_truncated", pa.array(trunc, pa.bool_()))
            .append_column("query_source", pa.array(src, pa.string())))


class Redactor:
    """Actor-pool stage: raw_filter_json → sanitized_query + shape_hash."""

    # Keys whose values are preserved verbatim (reference PRESERVE_FIELDS
    # spirit, LogRedactionUtil.java:29-63): envelope/temporal markers.
    PRESERVE_VALUE_KEYS = frozenset({"$date", "$timestamp", "$oid"})
    # host-valued keys: kept structurally but Atlas-redacted
    # (redactPreservedHostname LogRedactionUtil.java:346-362)
    HOST_KEYS = frozenset({"host", "remote", "syncSource"})
    REGEX_META = set("^$.*+?()[]{}|\\")

    def __init__(self, enabled: bool = True, source_col: str = "raw_filter_json",
                 out_col: str = "sanitized_query", cache_cap: int = 1 << 16):
        self.enabled = enabled
        self.source_col = source_col
        self.out_col = out_col
        self._alnum_run = re.compile(r"[A-Za-z0-9_]+")
        self._digits = re.compile(r"\d")
        # actor-lifetime memo: query shapes repeat massively, so the
        # expensive JSON parse+walk runs once per DISTINCT raw filter
        # (bounded so a pathological all-unique stream can't OOM)
        self._cache: dict[str, tuple[str, str]] = {}
        self._cache_cap = cache_cap

    # -- scalar rules ---------------------------------------------------
    def redact_string(self, s: str) -> str:
        # redactString (LogRedactionUtil.java:963-973): "xxx", short
        # strings keep their length
        return "xxx" if len(s) > 3 else "xxx"[: len(s)]

    def redact_number(self, v):
        # redactNumber (:975-1014): every digit → 9, type and sign kept;
        # sort directions ±1 preserved
        if isinstance(v, bool):
            return v
        if v in (1, -1):
            return v
        s = self._digits.sub("9", repr(v))
        try:
            return int(s) if isinstance(v, int) else float(s)
        except ValueError:
            return 9

    def redact_regex_pattern(self, pat: str) -> str:
        # redactRegexPatternSmart (:367-382): keep metacharacters,
        # redact alphanumeric runs; long/space-containing patterns are
        # fully redacted
        if len(pat) > 60 or " " in pat:
            return "xxx"
        return self._alnum_run.sub("xxx", pat)

    # -- recursive walk (redactLogMessage :180-232) ---------------------
    def _walk(self, node, parent_key: str | None = None):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k in self.PRESERVE_VALUE_KEYS:
                    out[k] = v
                elif k in self.HOST_KEYS and isinstance(v, str):
                    out[k] = redact_atlas_hostname(v)
                elif k == "$regularExpression" and isinstance(v, dict):
                    out[k] = {
                        "pattern": self.redact_regex_pattern(
                            str(v.get("pattern", ""))),
                        "options": v.get("options", ""),
                    }
                else:
                    out[k] = self._walk(v, k)
            return out
        if isinstance(node, list):
            return [self._walk(x, parent_key) for x in node]
        if isinstance(node, str):
            return self.redact_string(node)
        if isinstance(node, bool) or node is None:
            return node
        if isinstance(node, (int, float)):
            return self.redact_number(node)
        return node

    def sanitize(self, raw: str | None) -> str | None:
        # sanitizeFilter (:721-736): disabled → raw; failure → sentinel
        if raw is None:
            return None
        if not self.enabled:
            return raw
        try:
            doc = json.loads(raw)
        except (ValueError, TypeError):
            return '{"sanitization_error": "xxx"}'
        return json.dumps(self._walk(doc), sort_keys=True, separators=(",", ":"))

    def _sanitize_cached(self, raw: str) -> tuple[str, str]:
        hit = self._cache.get(raw)
        if hit is None:
            s = self.sanitize(raw)
            h = hashlib.blake2b(s.encode(), digest_size=4).hexdigest()
            hit = (s, h)
            if len(self._cache) < self._cache_cap:
                self._cache[raw] = hit
        return hit

    # -- batch entry ----------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return (batch.append_column(self.out_col, pa.nulls(0, pa.string()))
                    .append_column("shape_hash", pa.nulls(0, pa.string())))
        col = batch[self.source_col]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        # dictionary-encode so the recursive walk runs once per distinct
        # raw filter per batch (plus the actor-lifetime memo above);
        # null indices propagate nulls through take
        enc = arr.dictionary_encode()
        pairs = [self._sanitize_cached(v)
                 for v in enc.dictionary.to_pylist()]
        san = pa.array([p[0] for p in pairs], pa.string()).take(enc.indices)
        hsh = pa.array([p[1] for p in pairs], pa.string()).take(enc.indices)
        return (batch.append_column(self.out_col, san)
                .append_column("shape_hash", hsh))
