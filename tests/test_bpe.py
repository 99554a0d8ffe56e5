"""Distributed BPE training (ops/bpe.py): reference equality and
partitioning invariance."""

import pandas as pd
import pytest

import ray.data as rd

from mlp_ray.ops import bpe

CORPUS = [
    "low low low low low lower lower newest newest newest",
    "newest newest newest widest widest widest new new",
    "low lower lowest newest wide wider widest",
    "the new low bid is lower than the widest spread",
]


@pytest.fixture(scope="module")
def docs_ds():
    return rd.from_pandas(pd.DataFrame(
        {"doc_id": range(len(CORPUS)), "text": CORPUS}))


def test_bpe_matches_reference(docs_ds):
    got = bpe.train_bpe(docs_ds, num_merges=12)
    exp = bpe.train_bpe_reference(CORPUS, num_merges=12)
    pd.testing.assert_frame_equal(got, exp)
    # classic sanity: 'lo'/'es'/'est'-style merges emerge from this
    # corpus and every merged pair was genuinely frequent
    assert (got["pair_count"] >= 2).all()
    assert list(got["rank"]) == list(range(1, len(got) + 1))


def test_bpe_partition_invariant(docs_ds):
    a = bpe.train_bpe(docs_ds, num_merges=8)
    b = bpe.train_bpe(
        rd.from_pandas(pd.DataFrame(
            {"doc_id": range(len(CORPUS)), "text": CORPUS})).repartition(4),
        num_merges=8)
    pd.testing.assert_frame_equal(a, b)


def test_bpe_stops_when_dry():
    tiny = rd.from_pandas(pd.DataFrame(
        {"doc_id": [0], "text": ["ab"]}))
    out = bpe.train_bpe(tiny, num_merges=50)
    # 'a b </w>' merges at most twice before every count drops to 1
    assert len(out) <= 2
