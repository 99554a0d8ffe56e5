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
