"""ops/window: exact distributed row_number / NTILE semantics."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from mlp_ray.ops.window import _exact_ntile, global_rank


def test_exact_ntile_matches_sql_semantics():
    # ANSI NTILE: first (n % k) buckets get ceil(n/k) rows
    import duckdb
    for n, k in [(10, 4), (7, 3), (4, 4), (3, 5), (1, 2), (100, 7)]:
        got = _exact_ntile(np.arange(n), n, k)
        exp = duckdb.sql(
            f"SELECT ntile({k}) OVER (ORDER BY x) AS t "
            f"FROM (SELECT unnest(generate_series(1, {n})) AS x)"
        ).df()["t"].to_numpy()
        assert (got == exp).all(), (n, k)


def test_exact_ntile_empty():
    assert len(_exact_ntile(np.arange(0), 0, 4)) == 0


@pytest.mark.parametrize("num_partitions", [1, 3, 64])
def test_global_rank_matches_pandas(ray_session, num_partitions):
    rng = np.random.RandomState(7)
    df = pd.DataFrame({
        "k": rng.randint(0, 40, 500).astype(np.float64),  # heavy ties
        "id": np.arange(500, dtype=np.int64),
    })
    ds = rd.from_pandas(df).repartition(9)
    out = global_rank(ds, ["k", "id"], num_partitions=num_partitions,
                      rank_col="rnk", ntile=4,
                      ntile_col="quartile").to_pandas()
    out = out.sort_values("id").reset_index(drop=True)
    exp_rank = (df.sort_values(["k", "id"], kind="mergesort")
                .assign(rnk=np.arange(1, 501, dtype=np.int64))
                .sort_values("id")["rnk"].to_numpy())
    assert (out.sort_values("id")["rnk"].to_numpy() == exp_rank).all()
    exp_ntile = _exact_ntile(exp_rank - 1, 500, 4)
    assert (out.sort_values("id")["quartile"].to_numpy()
            == exp_ntile).all()


def test_global_rank_descending(ray_session):
    df = pd.DataFrame({"k": [3.0, 1.0, 2.0, 2.0, 5.0],
                       "id": [1, 2, 3, 4, 5]})
    out = (global_rank(rd.from_pandas(df), ["k", "id"],
                       descending=[True, False], num_partitions=3,
                       rank_col="rnk").to_pandas()
           .sort_values("rnk").reset_index(drop=True))
    assert out["k"].tolist() == [5.0, 3.0, 2.0, 2.0, 1.0]
    assert out["id"].tolist() == [5, 1, 3, 4, 2]
    assert out["rnk"].tolist() == [1, 2, 3, 4, 5]


@pytest.mark.parametrize("k", [1, 3])
def test_group_topk_matches_pandas(ray_session, k):
    from mlp_ray.ops.window import group_topk

    rng = np.random.RandomState(11)
    df = pd.DataFrame({
        "g": rng.randint(0, 20, 400),
        "v": rng.rand(400).round(3),
        "id": np.arange(400, dtype=np.int64),
    })
    out = (group_topk(rd.from_pandas(df).repartition(7), ["g"],
                      ["v", "id"], descending=[True, False], k=k,
                      rank_col="rn").to_pandas()
           .sort_values(["g", "rn"]).reset_index(drop=True))
    exp = (df.sort_values(["v", "id"], ascending=[False, True],
                          kind="mergesort")
           .groupby("g", sort=False).head(k))
    exp = exp.assign(rn=exp.groupby("g", sort=False).cumcount() + 1) \
        .sort_values(["g", "rn"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["g", "v", "id", "rn"]].astype({"rn": "int64"}),
        exp[["g", "v", "id", "rn"]].astype({"rn": "int64"}))


def test_group_topk_shard_invariant(ray_session):
    from mlp_ray.ops.window import group_topk

    rng = np.random.RandomState(5)
    df = pd.DataFrame({"g": rng.randint(0, 5, 300),
                       "v": rng.rand(300).round(2),
                       "id": np.arange(300, dtype=np.int64)})
    outs = []
    for parts in (1, 4, 13):
        o = (group_topk(rd.from_pandas(df).repartition(parts), ["g"],
                        ["v", "id"], descending=True, k=2).to_pandas()
             .sort_values(["g", "id"]).reset_index(drop=True))
        outs.append(o)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])


@pytest.mark.parametrize("num_partitions", [1, 4, 32])
def test_global_cumsum_matches_pandas(ray_session, num_partitions):
    from mlp_ray.ops.window import global_cumsum

    rng = np.random.RandomState(3)
    df = pd.DataFrame({
        "k": rng.randint(0, 30, 250).astype(np.float64),  # ties
        "id": np.arange(250, dtype=np.int64),
        "v": rng.rand(250).round(4),
    })
    out = (global_cumsum(rd.from_pandas(df).repartition(6), ["k", "id"],
                         "v", num_partitions=num_partitions,
                         rank_col="rnk", cum_col="cum").to_pandas()
           .sort_values("rnk").reset_index(drop=True))
    exp = df.sort_values(["k", "id"], kind="mergesort").reset_index(drop=True)
    exp["rnk"] = np.arange(1, len(exp) + 1, dtype=np.int64)
    exp["cum"] = np.cumsum(exp["v"].to_numpy())
    assert (out["rnk"].to_numpy() == exp["rnk"].to_numpy()).all()
    assert (out["id"].to_numpy() == exp["id"].to_numpy()).all()
    np.testing.assert_allclose(out["cum"].to_numpy(),
                               exp["cum"].to_numpy(), rtol=1e-12)


def test_token_entropy_blank_and_uniform(ray_session):
    import pyarrow as pa
    from mlp_ray.ops.text import token_entropy_batch

    t = pa.table({"doc_id": [1, 2, 3, 4],
                  "text": ["a a a a", "a b c d", "   ", None]})
    out = token_entropy_batch(t).sort_values("doc_id").reset_index(drop=True)
    # blank + null docs are skipped entirely
    assert out["doc_id"].tolist() == [1, 2]
    assert out["entropy"].tolist() == [0.0, 2.0]  # uniform over 4 = log2(4)
    assert out["n_tokens"].tolist() == [4, 4]
