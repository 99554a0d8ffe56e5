"""Generator determinism + schema sanity (FIXTURES.md §1/§4)."""

import pyarrow.parquet as pq

from mlp_ray import synth
from mlp_ray.schema import events_tok_schema


def test_chunking_invariance():
    full = synth.generate_events_tok(3000, seed=7)
    again = synth.generate_events_tok(3000, seed=7)
    assert full.equals(again)


def test_seed_changes_content():
    a = synth.generate_events_tok(1000, seed=1)
    b = synth.generate_events_tok(1000, seed=2)
    assert not a.equals(b)


def test_schema_and_ranges():
    t = synth.generate_events_tok(5000, seed=42)
    assert t.schema.equals(events_tok_schema())
    df = t.to_pandas()
    assert df["doc_id"].is_unique
    assert (df["n_tok"] >= 8).all() and (df["n_tok"] <= 2048).all()
    assert df["tokens"].map(len).equals(df["n_tok"].astype(object).map(int))
    # skew: hot source and hot namespace dominate
    assert df["source"].value_counts().iloc[0] / len(df) > 0.5
    assert (df["ns"].str.startswith("config.")).sum() > 0
    # component coverage
    assert set(df["component"].unique()) == {
        "COMMAND", "WRITE", "INDEX", "TXN", "NETWORK", "ACCESS", "CONTROL"}


def test_write_idempotent(tmp_path):
    d = str(tmp_path / "out")
    p1 = synth.write_events_tok(d, 140_000, seed=42, chunks_per_file=1)
    p2 = synth.write_events_tok(d, 140_000, seed=42, chunks_per_file=1)
    assert p1 == p2
    total = sum(pq.ParquetFile(p).metadata.num_rows for p in p1)
    assert total == 140_000
