"""End-to-end training-data preparation (pipelines/prepare.py):
splits are disjoint+exhaustive, packed buffers reproduce each split's
token stream, survivors carry no duplicate texts, and the whole run
is deterministic."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from mlp_ray.ops import scrub
from mlp_ray.pipelines import prepare

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def prepared(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("prep"))
    docs = rd.read_parquet(f"{SF}/documents.parquet")
    bench = scrub.benchmark_gram_set(
        docs.map_batches(
            lambda t: t.filter(
                (t["doc_id"].to_pandas() % 53 == 0).to_numpy()),
            batch_format="pyarrow"), k=5)
    summary = prepare.prepare_training_data(
        docs, out, bench_grams=bench, cap=512)
    return out, summary


def test_prepare_split_accounting(prepared):
    out, summary = prepared
    tok = pq.read_table(f"{out}/tokenized").to_pandas()
    # disjoint + exhaustive: every tokenized doc is in exactly one split
    assert set(tok["split"]) <= {"train", "val", "test"}
    per_split = tok.groupby("split")["n_tok"].sum()
    for _, r in summary.iterrows():
        assert r["n_tokens"] == per_split.get(r["split"], 0)
    assert summary["n_tokens"].sum() == tok["n_tok"].sum()


def test_prepare_packed_stream_identity(prepared):
    out, _ = prepared
    tok = pq.read_table(f"{out}/tokenized").to_pandas()
    for split in ("train", "val", "test"):
        sub = tok[tok["split"] == split].sort_values("doc_id")
        stream = (np.concatenate([np.asarray(t, np.int32)
                                  for t in sub["tokens"]])
                  if len(sub) else np.empty(0, np.int32))
        packed = (pq.read_table(f"{out}/packed/{split}").to_pandas()
                  .sort_values("pack_bin"))
        rebuilt = (np.concatenate([np.frombuffer(p, "<i4")
                                   for p in packed["tokens"]])
                   if len(packed) else np.empty(0, np.int32))
        assert (rebuilt == stream).all()
        if len(packed) > 1:
            assert packed["n_tok"].iloc[:-1].eq(512).all()


def test_prepare_survivor_hygiene(prepared):
    out, _ = prepared
    surv = pq.read_table(f"{out}/survivors").to_pandas()
    assert surv["text"].duplicated().sum() == 0  # dedup held
    # quality gate held (recompute locally)
    import pyarrow as pa
    from mlp_ray.ops import text as text_ops
    q = text_ops.quality_batch(pa.table(
        {"doc_id": surv["doc_id"], "text": surv["text"]}))
    assert (q["quality_score"].to_numpy(zero_copy_only=False)
            >= 0.5).all()


def test_prepare_deterministic(prepared, tmp_path):
    out, summary = prepared
    docs = rd.read_parquet(f"{SF}/documents.parquet")
    bench = scrub.benchmark_gram_set(
        docs.map_batches(
            lambda t: t.filter(
                (t["doc_id"].to_pandas() % 53 == 0).to_numpy()),
            batch_format="pyarrow"), k=5)
    again = prepare.prepare_training_data(
        docs.repartition(5), str(tmp_path), bench_grams=bench, cap=512)
    pd.testing.assert_frame_equal(
        summary.sort_values("split").reset_index(drop=True),
        again.sort_values("split").reset_index(drop=True))


def test_prepare_kill_resume_stage_markers(tmp_path, monkeypatch):
    """Stage-level resume (north rule): a run killed mid-pack resumes
    without re-running the gate/dedup or the tokenizer (stage markers
    + call counting), and the resumed outputs equal a clean run's."""
    docs = rd.read_parquet(f"{SF}/documents.parquet")
    clean_dir = str(tmp_path / "clean")
    clean = prepare.prepare_training_data(docs, clean_dir, cap=512,
                                          resume_key="sf0.001|v1")

    kill_dir = str(tmp_path / "killed")
    real_pack = prepare.pack_materialize
    calls = {"n": 0}

    def dying_pack(ds, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # die packing the SECOND split
            raise RuntimeError("simulated mid-run kill")
        return real_pack(ds, **kw)

    monkeypatch.setattr(prepare, "pack_materialize", dying_pack)
    with pytest.raises(RuntimeError):
        prepare.prepare_training_data(docs, kill_dir, cap=512,
                                      resume_key="sf0.001|v1")
    monkeypatch.setattr(prepare, "pack_materialize", real_pack)

    # resume: the expensive upstream stages must NOT re-run
    from mlp_ray.ops import text as text_mod
    real_vocab = text_mod.build_vocab
    vocab_calls = {"n": 0}

    def counting_vocab(*a, **kw):
        vocab_calls["n"] += 1
        return real_vocab(*a, **kw)

    pack_calls = {"n": 0}

    def counting_pack(ds, **kw):
        pack_calls["n"] += 1
        return real_pack(ds, **kw)

    monkeypatch.setattr(prepare.text, "build_vocab", counting_vocab)
    monkeypatch.setattr(prepare, "pack_materialize", counting_pack)
    resumed = prepare.prepare_training_data(docs, kill_dir, cap=512,
                                            resume_key="sf0.001|v1")
    assert vocab_calls["n"] == 0          # tokenized stage skipped
    assert pack_calls["n"] == 2           # only the 2 lost splits pack

    pd.testing.assert_frame_equal(
        resumed.sort_values("split").reset_index(drop=True),
        clean.sort_values("split").reset_index(drop=True))
    for split in ("train", "val", "test"):
        a = (pq.read_table(f"{clean_dir}/packed/{split}").to_pandas()
             .sort_values("pack_bin").reset_index(drop=True))
        b = (pq.read_table(f"{kill_dir}/packed/{split}").to_pandas()
             .sort_values("pack_bin").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)

    # param change invalidates exactly the stages it shapes: a new cap
    # re-packs but still never re-runs the tokenizer
    vocab_calls["n"] = pack_calls["n"] = 0
    prepare.prepare_training_data(docs, kill_dir, cap=256,
                                  resume_key="sf0.001|v1")
    assert vocab_calls["n"] == 0
    assert pack_calls["n"] == 3
