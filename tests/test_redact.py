"""Redaction unit tests — mirrors the reference's redaction suite
structure (LogRedactionUtilTest.java, 24 cases; SURVEY.md §5)."""

import json

import pytest

from mlp_ray.stages.redact import Redactor


@pytest.fixture(scope="module")
def red():
    return Redactor(enabled=True)


def S(red, doc):
    return json.loads(red.sanitize(json.dumps(doc)))


def test_string_values_redacted(red):
    assert S(red, {"name": "alice-smith"}) == {"name": "xxx"}


def test_short_strings_keep_length(red):
    assert S(red, {"a": "ab"}) == {"a": "xx"}
    assert S(red, {"a": "abc"}) == {"a": "xxx"}


def test_numbers_digits_to_nine_type_preserved(red):
    out = S(red, {"n": 12345, "f": 40.25, "neg": -73})
    assert out["n"] == 99999 and isinstance(out["n"], int)
    assert out["f"] == 99.99
    assert out["neg"] == -99


def test_sort_directions_preserved(red):
    # ±1 kept (LogRedactionUtil.java:975-1014 sort-direction rule)
    assert S(red, {"sort": {"score": -1, "ts": 1}}) == {
        "sort": {"score": -1, "ts": 1}}


def test_booleans_and_null_preserved(red):
    assert S(red, {"b": True, "c": False, "d": None}) == {
        "b": True, "c": False, "d": None}


def test_date_preserved(red):
    doc = {"ts": {"$gte": {"$date": "2024-01-15T00:00:00Z"}}}
    assert S(red, doc) == doc


def test_regex_metachars_preserved(red):
    out = S(red, {"name": {"$regularExpression":
                           {"pattern": "^user_123.*$", "options": "i"}}})
    pat = out["name"]["$regularExpression"]["pattern"]
    assert pat == "^xxx.*$"
    assert out["name"]["$regularExpression"]["options"] == "i"


def test_long_regex_fully_redacted(red):
    out = S(red, {"x": {"$regularExpression":
                        {"pattern": "a b", "options": ""}}})
    assert out["x"]["$regularExpression"]["pattern"] == "xxx"


def test_nested_arrays_and_objects(red):
    out = S(red, {"$and": [{"a": 5}, {"b": ["x-ray", 77]}]})
    assert out == {"$and": [{"a": 9}, {"b": ["xxx", 99]}]}


def test_disabled_passthrough():
    r = Redactor(enabled=False)
    raw = '{"secret": "value", "n": 42}'
    assert r.sanitize(raw) == raw


def test_invalid_json_sentinel(red):
    assert red.sanitize("not json {") == '{"sanitization_error": "xxx"}'


def test_null_passthrough(red):
    assert red.sanitize(None) is None


def test_deterministic_shape_hash(red):
    a = '{"status": "active", "qty": 7}'
    b = '{"qty": 9, "status": "pending"}'   # same shape, different values
    assert red.sanitize(a) == red.sanitize(b)  # canonical sorted keys


def test_customer_data_never_survives(red):
    # regression in the spirit of the reference's customer-data-leak test
    doc = {"email": "someone@example.com",
           "filter": {"ssn": "123-45-6789",
                      "notes": ["private info here", {"k": "secret"}]}}
    out = json.dumps(S(red, doc))
    for leak in ("example.com", "123-45", "private", "secret"):
        assert leak not in out


# --- R1 proper: whole-log-message redaction ---------------------------
# Behavior list mirrors the reference's LogRedactionUtilTest.java
# surface (LogRedactionUtil.java:67-232): preserve-path whitelist over
# the ENTIRE line, everything else redacted.
class TestWholeLogMessageRedaction:
    def setup_method(self):
        self.r = Redactor(enabled=True)

    def roundtrip(self, doc):
        return self.r.redact_log_message(doc)

    def test_envelope_preserved(self):
        doc = {"t": {"$date": "2024-01-01T00:00:00.000+00:00"}, "s": "I",
               "c": "COMMAND", "id": 51803, "ctx": "conn42",
               "msg": "Slow query"}
        assert self.roundtrip(doc) == doc

    def test_ns_and_metrics_preserved(self):
        doc = {"attr": {"ns": "app.users", "durationMillis": 153,
                        "keysExamined": 10, "docsExamined": 5,
                        "nreturned": 2, "reslen": 1024,
                        "planningTimeMicros": 777}}
        assert self.roundtrip(doc) == doc

    def test_filter_values_redacted_keys_kept(self):
        doc = {"attr": {"command": {"find": "users",
                                    "filter": {"email": "bob@x.com",
                                               "age": 41}}}}
        out = self.roundtrip(doc)
        f = out["attr"]["command"]["filter"]
        assert set(f) == {"email", "age"}          # key names survive
        assert f["email"] == "xxx"                 # string redacted
        assert f["age"] == 99                      # digits -> 9s
        assert out["attr"]["command"]["find"] == "users"  # collection kept

    def test_sort_directions_survive(self):
        doc = {"attr": {"command": {"sort": {"score": -1, "ts": 1}}}}
        out = self.roundtrip(doc)
        assert out["attr"]["command"]["sort"] == {"score": -1, "ts": 1}

    def test_number_type_and_sign_kept(self):
        doc = {"attr": {"command": {"filter": {"a": -25, "b": 3.5}}}}
        f = self.roundtrip(doc)["attr"]["command"]["filter"]
        assert f["a"] == -99 and isinstance(f["a"], int)
        assert f["b"] == 9.9 and isinstance(f["b"], float)

    def test_regex_pattern_smart_redacted_options_kept(self):
        doc = {"attr": {"command": {"filter": {"name": {
            "$regularExpression": {"pattern": "^user_42", "options": "i"}}}}}}
        out = self.roundtrip(doc)
        rx = out["attr"]["command"]["filter"]["name"]["$regularExpression"]
        assert rx["options"] == "i"
        assert rx["pattern"] == "^xxx"             # meta kept, runs redacted

    def test_date_oid_timestamp_markers_preserved(self):
        doc = {"attr": {"command": {"filter": {
            "ts": {"$gte": {"$date": "2024-01-05T00:00:00Z"}},
            "_id": {"$oid": "64f0c0ffee0000000000abcd"},
            "cp": {"$timestamp": {"t": 1700000000, "i": 3}}}}}}
        f = self.roundtrip(doc)["attr"]["command"]["filter"]
        assert f["ts"]["$gte"] == {"$date": "2024-01-05T00:00:00Z"}
        assert f["_id"] == {"$oid": "64f0c0ffee0000000000abcd"}
        assert f["cp"] == {"$timestamp": {"t": 1700000000, "i": 3}}

    def test_host_keys_atlas_redacted(self):
        doc = {"attr": {"remote":
               "atlas-abc123-shard-00-01.xyz9.mongodb.net:27017"}}
        out = self.roundtrip(doc)
        assert out["attr"]["remote"] == \
            "atlas-xxx-shard-00-01.xxx.mongodb.net:27017"

    def test_plan_and_hash_fields_preserved(self):
        doc = {"attr": {"planSummary": "IXSCAN { a: 1 }",
                        "queryHash": "7DA22653", "planCacheKey": "B7C6A423"}}
        assert self.roundtrip(doc) == doc

    def test_error_code_kept_errmsg_redacted(self):
        doc = {"attr": {"ok": 0,
                        "error": {"code": 11000, "codeName": "DuplicateKey",
                                  "errmsg": "E11000 dup key: { email: "
                                            "\"bob@x.com\" }"}}}
        out = self.roundtrip(doc)
        assert out["attr"]["ok"] == 0
        assert out["attr"]["error"]["code"] == 11000
        assert out["attr"]["error"]["codeName"] == "DuplicateKey"
        assert out["attr"]["error"]["errmsg"] == "xxx"

    def test_nested_and_or_structure_survives(self):
        doc = {"attr": {"command": {"filter": {"$and": [
            {"a": 5}, {"$or": [{"b": "secret"}, {"c": True}]}]}}}}
        f = self.roundtrip(doc)["attr"]["command"]["filter"]
        assert f["$and"][0]["a"] == 9
        assert f["$and"][1]["$or"][0]["b"] == "xxx"
        assert f["$and"][1]["$or"][1]["c"] is True  # bools untouched

    def test_client_metadata_doc_preserved(self):
        doc = {"attr": {"doc": {
            "driver": {"name": "PyMongo", "version": "4.6.0"},
            "os": {"type": "Linux", "name": "Ubuntu",
                   "architecture": "x86_64", "version": "22.04"},
            "platform": "CPython/3.11",
            "application": {"name": "webapp"}},
            "negotiatedCompressors": ["snappy", "zstd"]}}
        assert self.roundtrip(doc) == doc

    def test_mongos_version_preserved(self):
        doc = {"attr": {"doc": {"mongos": {"version": "7.0.5",
                                           "host": "router01:27017"}}}}
        assert self.roundtrip(doc) == doc

    def test_auth_fields_preserved(self):
        doc = {"attr": {"user": "svc_web", "db": "admin",
                        "mechanism": "SCRAM-SHA-256"}}
        assert self.roundtrip(doc) == doc

    def test_txn_parameters_preserved(self):
        doc = {"attr": {"parameters": {"txnRetryCounter": 2,
                                       "autocommit": False,
                                       "readConcern": {"level": "snapshot"}},
                        "terminationCause": "committed",
                        "commitType": "twoPhaseCommit",
                        "commitDurationMicros": 1234}}
        assert self.roundtrip(doc) == doc

    def test_command_knobs_preserved_payload_redacted(self):
        doc = {"attr": {"command": {
            "insert": "orders", "ordered": True, "$db": "app",
            "documents": [{"sku": "X-99", "price": 12.5}]}}}
        out = self.roundtrip(doc)["attr"]["command"]
        assert out["insert"] == "orders" and out["ordered"] is True
        assert out["$db"] == "app"
        assert out["documents"][0] == {"sku": "xxx", "price": 99.9}

    def test_array_elements_redacted_elementwise(self):
        doc = {"attr": {"command": {"filter": {
            "tags": ["alpha", "beta-7", 12]}}}}
        f = self.roundtrip(doc)["attr"]["command"]["filter"]
        assert f["tags"] == ["xxx", "xxx", 99]

    def test_originating_command_same_rules(self):
        doc = {"attr": {"originatingCommand": {
            "getMore": "cursorcoll", "batchSize": 100,
            "filter": {"u": "leak@me"}}}}
        out = self.roundtrip(doc)["attr"]["originatingCommand"]
        assert out["getMore"] == "cursorcoll"
        assert out["batchSize"] == 100  # control knob is whitelisted
        assert out["filter"]["u"] == "xxx"

    def test_lsid_uuid_preserved_as_marker(self):
        doc = {"attr": {"command": {
            "lsid": {"id": {"$uuid": "deadbeef-0000-0000-0000-000000000000"}}}}}
        out = self.roundtrip(doc)["attr"]["command"]
        # lsid.id subtree is whitelisted (session ids are opaque)
        assert out["lsid"]["id"] == \
            {"$uuid": "deadbeef-0000-0000-0000-000000000000"}

    def test_nulls_and_bools_pass_through(self):
        doc = {"attr": {"command": {"filter": {"a": None, "b": False}}}}
        f = self.roundtrip(doc)["attr"]["command"]["filter"]
        assert f == {"a": None, "b": False}

    def test_unknown_attr_strings_redacted(self):
        doc = {"attr": {"surpriseField": "customer PII here"}}
        assert self.roundtrip(doc)["attr"]["surpriseField"] == "xxx"

    def test_line_api_non_json_never_leaks(self):
        r = self.r
        assert "customer" not in r.redact_log_line("customer text 123")
        assert "leak" not in r.redact_log_line('["leak"]')

    def test_line_api_roundtrip(self):
        import json as _json
        line = _json.dumps({
            "t": {"$date": "2024-01-01T00:00:00Z"}, "s": "I",
            "c": "COMMAND", "id": 1, "ctx": "conn7", "msg": "Slow query",
            "attr": {"ns": "app.users", "durationMillis": 12,
                     "command": {"find": "users",
                                 "filter": {"ssn": "123-45-6789"}}}})
        out = _json.loads(self.r.redact_log_line(line))
        assert out["attr"]["command"]["filter"]["ssn"] == "xxx"
        assert out["attr"]["ns"] == "app.users"
        assert "123-45-6789" not in self.r.redact_log_line(line)

    def test_trim_with_redaction(self):
        from mlp_ray.ops import trim
        s = ('{"command": {"find": "users", "filter": {"who": "bob"}},'
             ' "durationMillis": 5}')
        out = trim.trim_json_str(s, redactor=self.r)
        assert '"who":"xxx"' in out
        assert '"durationMillis":5' in out
        assert trim.trim_json_str("plain secret", redactor=self.r) == '"xxx"'


def test_command_comment_is_redacted():
    """`comment` is user-supplied free text, never a control knob —
    the whole-message walk must redact it (review finding r2)."""
    r = Redactor(enabled=True)
    doc = {"attr": {"command": {"find": "users",
                                "comment": "lookup for jane@corp.com"}}}
    out = r.redact_log_message(doc)
    assert out["attr"]["command"]["comment"] == "xxx"
    assert out["attr"]["command"]["find"] == "users"
