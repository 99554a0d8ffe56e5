"""Oracle-fixture persistence contract (util.ensure_fixture):
idempotent reuse on a matching source key, atomic rebuild on key or
file staleness — the mechanism every scalar-path replay oracle rides
(SURVEY §10)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from mlp_ray.util import ensure_fixture, fixture_path


def _build_counter(counter, value):
    def build():
        counter["n"] += 1
        return pa.table({"x": pa.array([value], pa.int64())})
    return build


def test_ensure_fixture_idempotent(tmp_path):
    path = str(tmp_path / "fx.parquet")
    c = {"n": 0}
    p1 = ensure_fixture(path, "k1", _build_counter(c, 1))
    p2 = ensure_fixture(path, "k1", _build_counter(c, 2))
    assert p1 == p2 == path
    assert c["n"] == 1  # second call reused the persisted table
    assert pq.read_table(path)["x"].to_pylist() == [1]


def test_ensure_fixture_rebuilds_on_key_change(tmp_path):
    from mlp_ray.util import FIXTURE_KEY_META

    path = str(tmp_path / "fx.parquet")
    c = {"n": 0}
    ensure_fixture(path, "k1", _build_counter(c, 1))
    ensure_fixture(path, "k2", _build_counter(c, 2))
    assert c["n"] == 2
    assert pq.read_table(path)["x"].to_pylist() == [2]
    # key+data are ONE file: the key rides the parquet metadata
    meta = pq.ParquetFile(path).schema_arrow.metadata
    assert meta[FIXTURE_KEY_META] == b"k2"


def test_ensure_fixture_key_and_data_atomic(tmp_path):
    """A data file from key B can never be trusted under key A: the
    key is embedded in the file itself, so the r4 torn-interleave
    (marker A guarding data B via two separate os.replace steps)
    is structurally impossible (ADVICE r4)."""
    from mlp_ray.util import write_fixture_atomic

    path = str(tmp_path / "fx.parquet")
    c = {"n": 0}
    # simulate the tail of a concurrent key-B build landing last
    write_fixture_atomic(path, pa.table({"x": pa.array([9], pa.int64())}),
                         "kB")
    ensure_fixture(path, "kA", _build_counter(c, 1))
    assert c["n"] == 1  # key mismatch detected → rebuilt under kA
    assert pq.read_table(path)["x"].to_pylist() == [1]


def test_ensure_fixture_rebuilds_on_corrupt_file(tmp_path):
    path = str(tmp_path / "fx.parquet")
    c = {"n": 0}
    ensure_fixture(path, "k1", _build_counter(c, 1))
    with open(path, "wb") as fh:
        fh.write(b"not parquet")
    ensure_fixture(path, "k1", _build_counter(c, 3))
    assert c["n"] == 2
    assert pq.read_table(path)["x"].to_pylist() == [3]


def test_fixture_path_is_input_keyed():
    a = fixture_path("demo", "/root/testdata/sf0.01")
    b = fixture_path("demo", "/root/testdata/sf0.001")
    assert a != b and a.startswith("/tmp/mlp_demo_") \
        and a.endswith(".parquet")
    assert os.path.dirname(a) == "/tmp"
