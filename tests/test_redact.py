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
