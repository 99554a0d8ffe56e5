"""Configurable filters — the reference's user-extension surface
(SURVEY.md §2.9).

FilterConfig re-expresses ``FilterConfig.java:20-138``: a default noise
blacklist, extensible via properties (``filter.ignore.patterns`` replace
/ ``filter.ignore.add`` / ``filter.ignore.remove``), compiled once into
a single alternation regex and applied vectorized per batch.

NamespaceFilter re-expresses ``LogParser.java:435-483``: exact match,
``db.*`` / db-only wildcard, glob ``*`` — with ``config`` always
excluded regardless of the user filter.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

# default noise patterns (FilterConfig.java:20-71 spirit — matched
# against the msg/category text of a row)
DEFAULT_IGNORE_PATTERNS: tuple[str, ...] = (
    "Checkpointer thread",
    "Flow control refresh",
    "Periodic task runner",
    "TTLMonitor pass",
    "WiredTiger message",
    "Heartbeat scheduled",
    "hello", "isMaster", "ping",
    "replSetHeartbeat",
)

# The reference's EXACT default blacklist, matched against the whole
# raw log line (FilterConfig.java:20-71, `shouldIgnore` :130-138).
# Used by the raw-log ingestion path (sources.rawlog), where the raw
# byte column is still in hand.
RAW_LINE_IGNORE_PATTERNS: tuple[str, ...] = (
    '"c":"NETWORK"',
    '"c":"ACCESS"',
    '"c":"CONNPOOL"',
    '"hello":1',
    '"isMaster":1',
    '"ping":1',
    '"serverStatus":1',
    '"buildInfo"',
    '"getParameter":',
    '"getCmdLineOpts":1',
    '"getDefaultRWConcern":1',
    '"listDatabases":1',
    '"endSessions":',
    '"startSession"',
    '"saslContinue":1',
    '"replSetHeartbeat":"',
    "replSetUpdatePosition",
    '"replSetGetStatus":1',
    '"$db":"local"',
    '"$db":"config"',
    '"ns":"local.oplog.rs"',
    '"ns":"local.clustermanager"',
    '"ns":"config.system.sessions"',
    '"ns":"config.mongos"',
    '"c":"STORAGE"',
    '"c":"CONTROL"',
    '"c":"SHARDING"',
    '"dbstats":1',
    '"collStats":"',
    '"listIndexes":"',
    '"ctx":"TTLMonitor"',
    '"logRotate":"',
)


class FilterConfig:
    """Substring-blacklist filter, vectorized as one combined regex."""

    def __init__(self, patterns=None, add=(), remove=()):
        pats = list(patterns if patterns is not None
                    else DEFAULT_IGNORE_PATTERNS)
        pats += [p for p in add if p not in pats]
        pats = [p for p in pats if p not in set(remove)]
        self.patterns = tuple(pats)
        self._regex = "|".join(re.escape(p) for p in pats) if pats else None

    @classmethod
    def from_properties(cls, props: dict[str, str]) -> "FilterConfig":
        """Properties keys as in the reference: ``filter.ignore.patterns``
        (comma-separated, replaces defaults), ``filter.ignore.add``,
        ``filter.ignore.remove`` (FilterConfig.java:80-116)."""
        def split(key):
            v = props.get(key, "")
            return [s.strip() for s in v.split(",") if s.strip()]
        base = split("filter.ignore.patterns") or None
        return cls(patterns=base, add=split("filter.ignore.add"),
                   remove=split("filter.ignore.remove"))

    @classmethod
    def from_properties_file(cls, path: str) -> "FilterConfig":
        props = {}
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if not line or line.startswith(("#", "!")):
                    continue
                if "=" in line:
                    k, _, v = line.partition("=")
                    props[k.strip()] = v.strip()
        return cls.from_properties(props)

    def should_ignore_mask(self, text: pa.ChunkedArray | pa.Array):
        """Vectorized: True where any blacklist pattern matches."""
        if self._regex is None:
            return pc.if_else(pc.is_valid(text), False, False)
        return pc.fill_null(
            pc.match_substring_regex(text, self._regex), False)


class NamespaceFilter:
    """exact / ``db.*`` / db-only / glob-``*`` namespace matching;
    ``config`` databases are always excluded."""

    def __init__(self, selectors: list[str] | None = None):
        self.exact: set[str] = set()
        self.dbs: set[str] = set()
        regexes = []
        for sel in selectors or []:
            if sel.endswith(".*"):
                self.dbs.add(sel[:-2])
            elif "*" in sel:
                regexes.append(re.escape(sel).replace(r"\*", ".*"))
            elif "." in sel:
                self.exact.add(sel)
            else:
                self.dbs.add(sel)
        self._regex = "|".join(f"^(?:{r})$" for r in regexes) or None
        self.match_all = not (self.exact or self.dbs or self._regex)

    def keep_mask(self, ns: pa.ChunkedArray | pa.Array):
        not_config = pc.invert(pc.fill_null(
            pc.starts_with(ns, "config."), True))
        if self.match_all:
            return not_config
        keep = None
        if self.exact:
            keep = pc.is_in(ns, value_set=pa.array(sorted(self.exact)))
        if self.dbs:
            db = pc.replace_substring_regex(ns, r"\..*$", "")
            m = pc.is_in(db, value_set=pa.array(sorted(self.dbs)))
            keep = m if keep is None else pc.or_(keep, m)
        if self._regex:
            m = pc.fill_null(pc.match_substring_regex(ns, self._regex), False)
            keep = m if keep is None else pc.or_(keep, m)
        return pc.and_(pc.fill_null(keep, False), not_config)
