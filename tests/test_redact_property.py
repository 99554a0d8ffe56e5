"""Property-based hardening for redaction / trim / raw-log parsing —
the surfaces that face arbitrary user data.  Mirrors the reference's
emphasis (LogRedactionUtilTest.java is its largest test file)."""

import json
import re
import string

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from mlp_ray.ops import trim
from mlp_ray.sources import rawlog
from mlp_ray.stages.redact import Redactor

# arbitrary JSON documents (bounded depth/size)
json_scalars = st.one_of(
    st.none(), st.booleans(),
    st.integers(min_value=-10**12, max_value=10**12),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=40))
json_docs = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=5),
        st.dictionaries(st.text(max_size=12), children, max_size=5)),
    max_leaves=20)

_SECRET_RUN = re.compile(r"[A-Za-z0-9]{4,}")


@settings(max_examples=120, deadline=None)
@given(json_docs)
def test_redaction_output_valid_and_idempotent(doc):
    r = Redactor()
    raw = json.dumps(doc)
    out = r.sanitize(raw)
    parsed = json.loads(out)  # always valid JSON
    # idempotent: redacting a redacted shape changes nothing structural
    again = json.loads(r.sanitize(out))
    assert _shape(parsed) == _shape(again)


def _shape(node):
    if isinstance(node, dict):
        return {k: _shape(v) for k, v in node.items()}
    if isinstance(node, list):
        return [_shape(x) for x in node]
    return type(node).__name__


@settings(max_examples=120, deadline=None)
@given(st.dictionaries(
    st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8),
    st.one_of(st.text(alphabet=string.ascii_letters + string.digits,
                      min_size=4, max_size=30),
              st.integers(min_value=2, max_value=10**9)),
    min_size=1, max_size=6))
def test_redaction_leaks_no_value_literals(doc):
    """String/number VALUES must not survive redaction (keys may)."""
    r = Redactor()
    out = json.loads(r.sanitize(json.dumps(doc)))
    for k, v in doc.items():
        red = out[k]
        if isinstance(v, str):
            assert red == "xxx"
        else:
            assert set(str(abs(red))) <= {"9"}, (v, red)


@settings(max_examples=100, deadline=None)
@given(json_docs)
def test_trim_valid_and_bounded(doc):
    out = trim.trim_json_str(json.dumps(doc))
    parsed = json.loads(out)

    def check(node, parent_key=None):
        if isinstance(node, dict):
            for k, v in node.items():
                assert k not in trim.IGNORE_KEYS
                check(v, k)
        elif isinstance(node, list):
            if parent_key not in trim.PRESERVE_ARRAY_KEYS:
                assert len(node) <= trim.MAX_ARR + 1  # first + marker
        elif isinstance(node, str):
            if parent_key not in trim.PRESERVE_STRING_KEYS \
                    and not node.startswith("<truncated"):
                assert len(node) <= trim.MAX_STR + 3
    check(parsed)


@settings(max_examples=80, deadline=None)
@given(st.lists(st.one_of(
    st.text(max_size=120),
    st.text(max_size=60).map(lambda s: "{" + s),
    json_docs.map(lambda d: json.dumps(d)),
), min_size=1, max_size=20))
def test_rawlog_parse_never_crashes(lines):
    """parse_batch must classify arbitrary garbage, partial JSON, and
    valid-but-foreign JSON without raising."""
    lines = [ln.replace("\n", " ").replace("\r", " ") for ln in lines]
    batch = pa.table({"text": pa.array(lines, pa.string()),
                      "path": pa.array(["f.log"] * len(lines))})
    out = rawlog.parse_batch(batch)
    assert out.num_rows == len(lines)
    assert set(out["parse_status"].to_pylist()) <= {
        "ok", "non_json", "too_long", "bad_json"}
