"""Sequence-packing operators (ops/pack.py): pack_plan vs a pandas
prefix-sum reference, fixed-width-id validation, pack_greedy golden +
invariants, block-count invariance."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from mlp_ray.ops import pack


def _mk_df(n=2000, seed=7, width=6):
    rng = np.random.default_rng(seed)
    ids = [f"d{i:0{width}d}" for i in range(n)]
    rng.shuffle(ids)
    return pd.DataFrame({
        "doc_id": ids,
        "n_tok": rng.integers(1, 400, size=n).astype("int64"),
        "source": rng.choice(["s0", "s1", "s2"], size=n)})


def _plan_reference(df: pd.DataFrame, cap: int) -> pd.DataFrame:
    d = df.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
    cumb = d["n_tok"].cumsum().shift(fill_value=0).astype("int64")
    return pd.DataFrame({
        "doc_id": d["doc_id"], "n_tok": d["n_tok"].astype("int64"),
        "pack_bin": (cumb // cap).astype("int64"),
        "pack_offset": (cumb % cap).astype("int64")})


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values("doc_id", kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("blocks", [1, 7])
def test_pack_plan_matches_prefix_sum(ray_session, blocks):
    df = _mk_df()
    ds = rd.from_pandas(df).repartition(blocks)
    out = pack.pack_plan(ds, cap=512, range_tail=3).to_pandas()
    ref = _plan_reference(df, cap=512)
    pd.testing.assert_frame_equal(
        _sorted(out)[ref.columns], ref, check_dtype=False)


def test_pack_plan_range_tail_insensitive(ray_session):
    df = _mk_df(n=500)
    ds = rd.from_pandas(df)
    a = _sorted(pack.pack_plan(ds, cap=256, range_tail=2).to_pandas())
    b = _sorted(pack.pack_plan(ds, cap=256, range_tail=5).to_pandas())
    pd.testing.assert_frame_equal(a, b)


def test_pack_plan_rejects_variable_width_ids(ray_session):
    df = pd.DataFrame({
        # "d99" sorts after "d100"-prefix ranges overlap once stripped
        "doc_id": [f"d{i}" for i in range(5, 150)],
        "n_tok": np.ones(145, dtype="int64")})
    ds = rd.from_pandas(df)
    with pytest.raises(ValueError, match="fixed-width"):
        pack.pack_plan(ds, cap=64, range_tail=1).to_pandas()


def test_greedy_bins_reference():
    vals = np.array([100, 200, 300, 250, 50, 700, 10], dtype=np.int64)
    # cap=500: [100,200]=0 (300 would overflow), [300,50... wait greedy
    # fills in order: 100+200=300, +300=600>500 -> close; 300+250=550>500
    # after 300? 300 alone then 250+50=300, then 700 alone, then 10
    out = pack.greedy_bins(vals, 500)
    # pure-python reference
    bins, b, acc = [], 0, 0
    for v in vals:
        if acc and acc + v > 500:
            b, acc = b + 1, 0
        bins.append(b)
        acc += v
    assert out.tolist() == bins
    # oversized value occupies its own bin
    big = pack.greedy_bins(np.array([600], dtype=np.int64), 500)
    assert big.tolist() == [0]


def test_pack_greedy_invariants(ray_session):
    df = _mk_df(n=1500, seed=11)
    cap = 600
    out = (pack.pack_greedy(rd.from_pandas(df).repartition(5), cap=cap)
           .to_pandas())
    assert len(out) == len(df)
    for src, g in out.groupby("source"):
        g = g.sort_values("doc_id", kind="mergesort")
        # bins are consecutive from 0 and non-decreasing in doc order
        bins = g["pack_bin"].to_numpy()
        assert bins[0] == 0
        steps = np.diff(bins)
        assert ((steps == 0) | (steps == 1)).all()
        # no bin exceeds cap unless it is a single oversized doc
        sums = g.groupby("pack_bin")["n_tok"].agg(["sum", "size"])
        over = sums[sums["sum"] > cap]
        assert (over["size"] == 1).all()
        # greedy: a closed bin could not have absorbed the next doc
        firsts = g.groupby("pack_bin")["n_tok"].first().to_numpy()
        assert (sums["sum"].to_numpy()[:-1] + firsts[1:] > cap).all()


def test_pack_bin_rollup(ray_session):
    df = _mk_df(n=800, seed=3)
    plan = pack.pack_plan(rd.from_pandas(df), cap=512, range_tail=3)
    roll = pack.pack_bin_rollup(plan, ["pack_bin"])
    ref = _plan_reference(df, cap=512)
    rr = (ref.groupby("pack_bin")
          .agg(n_docs=("n_tok", "size"), start_tokens=("n_tok", "sum"),
               first_doc=("doc_id", "min"), last_doc=("doc_id", "max"))
          .reset_index())
    pd.testing.assert_frame_equal(
        roll.sort_values("pack_bin").reset_index(drop=True),
        rr.sort_values("pack_bin").reset_index(drop=True),
        check_dtype=False)


def test_pack_materialize_stream_identity(ray_session):
    """Materialized bins concatenated in order reproduce the exact
    doc_id-ordered token stream; every bin is exactly cap tokens
    except the last."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from mlp_ray.ops.pack import pack_materialize

    rng = np.random.default_rng(11)
    n = 300
    toks = [rng.integers(0, 1000, rng.integers(1, 40)).astype(np.int32)
            for _ in range(n)]
    df = pd.DataFrame({
        "doc_id": [f"doc{i:08d}" for i in range(n)],
        "tokens": toks,
        "n_tok": [len(t) for t in toks]})
    out = (pack_materialize(rd.from_pandas(df).repartition(7), cap=128,
                            range_tail=2)
           .to_pandas().sort_values("pack_bin").reset_index(drop=True))
    stream = np.concatenate(toks)
    assert out["n_tok"].iloc[:-1].eq(128).all()
    assert out["n_tok"].sum() == len(stream)
    rebuilt = np.concatenate([np.frombuffer(p, dtype="<i4")
                              for p in out["tokens"]])
    assert (rebuilt == stream).all()
    assert (out["pack_bin"].to_numpy()
            == np.arange(len(out))).all()
