"""Schemas and column constants for the tokenized log-event table.

The primary input (BASELINE.json input_hint) is a Parquet table of
pre-tokenized training sequences:

    (doc_id: string, tokens: list<int32>, n_tok: int32, source: string)

extended with deterministic log-attribute columns (FIXTURES.md §1) so
the reference's parse/route/aggregate semantics
(mongo-log-parser ``SlowQuery.java:3-29``, ``LogParserTask.java``) are
exercised over it.
"""

from __future__ import annotations

import pyarrow as pa

VOCAB_SIZE = 50257

# Namespace pool (FIXTURES.md §1 `ns`): ~20 namespaces, one hot,
# config.* always excluded by the namespace filter
# (reference LogParser.java:443-446).
NAMESPACES = [
    "app.users",          # hot: ~50% of op rows
    "app.orders",
    "app.sessions",
    "app.events",
    "inventory.items",
    "inventory.warehouses",
    "billing.invoices",
    "billing.payments",
    "analytics.rollups",
    "analytics.raw",
    "auth.tokens",
    "auth.accounts",
    "logs.audit",
    "logs.access",
    "cache.hot",
    "cache.cold",
    "config.system.sessions",   # must be excluded everywhere
    "config.settings",          # must be excluded everywhere
    "metrics.daily",
    "metrics.hourly",
]
HOT_NS = "app.users"

SOURCES = [
    "shard-00-00", "shard-00-01", "shard-00-02", "shard-00-03",
    "web", "batch", "cdc", "ttl-monitor",
]
HOT_SOURCE = "shard-00-00"  # ~60% of rows — exercises salting

COMPONENTS = ["COMMAND", "WRITE", "INDEX", "TXN", "NETWORK", "ACCESS", "CONTROL"]

COMMAND_OPS = [
    "find", "aggregate", "update", "insert", "delete", "findAndModify",
    "getMore", "count", "distinct", "createIndexes", "_shardsvrMoveChunk",
    "collMod",
]
WRITE_OPS = ["update", "delete", "insert"]

# The reference's closed first-match command dispatch, in ITS order
# (processCommandOperation LogParserTask.java:802-919): a command whose
# first matching key is none of these falls through to the admin /
# shard checks, and if those miss too the line is skipped entirely.
REF_COMMAND_OPS = [
    "find", "aggregate", "findAndModify", "update", "insert", "delete",
    "getMore", "count", "distinct",
]

# Admin command list mirrored from the reference's administrative set
# (isAdministrativeOperation LogParserTask.java:945-953) — op kinds
# classified as plain "command" (OpType.CMD).
ADMIN_OPS = {
    "drop", "dropDatabase", "dropIndexes", "createIndexes", "collMod",
    "renameCollection", "validate", "compact", "reIndex", "explain",
    "currentOp", "killOp", "fsync", "eval", "listCollections",
    "planCacheClear", "configureFailPoint", "killCursors",
    "abortTransaction", "commitTransaction", "startTransaction",
}

PLAN_SUMMARIES = [
    "COLLSCAN",
    "IXSCAN { a: 1 }",
    "IXSCAN { b: 1, c: -1 }",
    "IXSCAN { _id: 1 }",
    "MULTI_ITERATOR",
]

APP_NAMES = ["webapp", "batch-etl", "mongosync", "analytics-svc", "admin-cli", "cron"]

ERR_CODES = [
    ("Unauthorized", 13),
    ("CursorNotFound", 43),
    ("InterruptedByClientDisconnect", 279),
    ("WriteConflict", 112),
    ("ExceededTimeLimit", 262),
    ("DuplicateKey", 11000),
]

REPLAN_REASONS = [
    "cached plan was less efficient than expected",
    "cached plan returned: QueryPlanKilled",
    "works value exceeded",
]

READ_PREF_MODES = ["primary", "secondary", "nearest"]
READ_PREF_TAGS = ["nodeType: ANALYTICS", "region: US_EAST", "workloadType: OPERATIONAL"]

TERMINATION_CAUSES = ["committed", "aborted"]
COMMIT_TYPES = ["noShards", "singleShard", "twoPhaseCommit"]

DRIVERS = [
    ("mongo-java-driver", "4.11.1", "Linux", "Java/17"),
    ("PyMongo", "4.6.0", "Linux", "CPython/3.11"),
    ("nodejs-mongodb", "6.3.0", "Linux", "Node.js v20"),
    ("mongo-go-driver", "1.13.1", "Linux", "go1.21"),
    # These two must be dropped by driver-stats
    # (TwoPassDriverStatsAccumulator.java:150-154, 167-171):
    ("NetworkInterface-TL", "0.0.0", "Linux", "internal"),
    ("MongoDB Internal Client", "7.0.5", "Linux", "internal"),
]
INTERNAL_DRIVER_PREFIXES = ("NetworkInterface",)
INTERNAL_DRIVER_NAMES = {"MongoDB Internal Client"}

COMPRESSORS = ["snappy", "zstd", "zlib"]

USERNAMES = ["svc_web", "svc_etl", "admin", "readonly", "svc_sync"]

# Raw filter-JSON templates (redaction test surface — FIXTURES.md §1
# `raw_filter_json`; semantics from LogRedactionUtil.java).
FILTER_TEMPLATES = [
    '{"status": "%s", "qty": %d}',
    '{"name": {"$regularExpression": {"pattern": "^user_%d", "options": "i"}}}',
    '{"ts": {"$gte": {"$date": "2024-01-%02dT00:00:00Z"}}, "level": %d}',
    '{"$and": [{"a": %d}, {"b": "%s"}]}',
    '{"tags": ["%s", "x%d"], "sort": {"score": -1, "ts": 1}}',
    '{"nested": {"deep": {"value": %d, "label": "%s"}}}',
]

# INDEX-component messages → op subcategories (processIndexOperation
# LogParserTask.java:755-767: "Index build" → index_build, "Index
# drop" → index_drop, other msg → index_other, no msg →
# index_maintenance)
INDEX_MSGS = ["Index build: done", "Index build: starting",
              "Index drop: completed", "Index validation complete"]

AUTH_DBS = ["admin", "$external", "app"]
AUTH_MECHANISMS = ["SCRAM-SHA-256", "SCRAM-SHA-1", "MONGODB-X509"]

NOISE_MSGS = [
    "Checkpointer thread", "Flow control refresh", "Periodic task runner",
    "TTLMonitor pass", "WiredTiger message", "Heartbeat scheduled",
]


def events_tok_schema() -> pa.Schema:
    """Arrow schema of the tokenized log-event fixture table."""
    s = pa.string()
    i64 = pa.int64()
    b = pa.bool_()
    return pa.schema(
        [
            ("doc_id", s),
            ("tokens", pa.list_(pa.int32())),
            ("n_tok", pa.int32()),
            ("source", s),
            ("ns", s),
            ("component", s),
            ("msg", s),
            ("op_kind", s),
            ("ts", pa.timestamp("ms")),
            ("ctx", s),
            ("app_name", s),
            ("duration_ms", i64),
            ("plan_summary", s),
            ("query_hash", s),
            ("plan_cache_key", s),
            ("planning_time_us", i64),
            ("keys_examined", i64),
            ("docs_examined", i64),
            ("n_returned", i64),
            ("reslen", i64),
            ("bytes_read", i64),
            ("bytes_written", i64),
            ("write_conflicts", i64),
            ("n_shards", i64),
            ("n_modified", i64),
            ("n_upserted", i64),
            ("n_deleted", i64),
            ("n_inserted", i64),
            ("replanned", b),
            ("replan_reason", s),
            ("from_multi_planner", b),
            ("read_pref_mode", s),
            ("read_pref_tags", s),
            ("is_change_stream", b),
            ("is_error", b),
            ("err_code_name", s),
            ("err_code", pa.int32()),
            ("txn_retry_counter", pa.int32()),
            ("termination_cause", s),
            ("commit_type", s),
            ("commit_us", i64),
            ("active_us", i64),
            ("inactive_us", i64),
            ("raw_filter_json", s),
            ("driver_name", s),
            ("driver_version", s),
            ("os_type", s),
            ("platform", s),
            ("compressors", s),
            ("username", s),
            ("auth_db", s),          # attr.db (processAccessMessage
            ("auth_mechanism", s),   #   LogParserTask.java:1181-1222)
            ("server_version", s),   # doc.mongos.version (:1289-1296)
            ("remote", s),
        ]
    )
