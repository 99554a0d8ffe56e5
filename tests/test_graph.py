"""Connected components (ops/graph.py): known-topology unit tests plus
a brute-force oracle on a random graph, and the group-sample /
rollup-style helpers' invariants."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from mlp_ray.ops import graph, scrub


def _cc(pairs_df: pd.DataFrame, **kw) -> pd.DataFrame:
    kw.setdefault("num_buckets", 8)  # tiny graphs: cut shuffle overhead
    out = graph.connected_components(
        rd.from_pandas(pairs_df), **kw).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def test_cc_chain_triangle_isolated_pair():
    # chain 1-2-3-4-5, triangle 10-11-12 (+ redundant edge), pair 20-21
    pairs = pd.DataFrame({
        "doc_id": [2, 3, 4, 5, 11, 12, 12, 21],
        "dup_of": [1, 2, 3, 4, 10, 11, 10, 20],
    })
    out = _cc(pairs)
    lbl = dict(zip(out["node"], out["cluster_id"]))
    assert all(lbl[n] == 1 for n in (1, 2, 3, 4, 5))
    assert all(lbl[n] == 10 for n in (10, 11, 12))
    assert all(lbl[n] == 20 for n in (20, 21))
    assert len(out) == 10


def test_cc_empty():
    pairs = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                          "dup_of": pd.Series(dtype="int64")})
    out = graph.connected_components(rd.from_pandas(pairs))
    assert out.count() == 0
    # Ray's to_pandas drops columns on an empty dataset; the Dataset
    # schema itself must stay typed
    assert out.schema().names == ["node", "cluster_id"]


def _brute_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in parent}


def test_cc_random_vs_union_find():
    rng = np.random.default_rng(7)
    u = rng.integers(0, 400, 300)
    v = rng.integers(0, 400, 300)
    keep = u != v
    edges = list(zip(u[keep].tolist(), v[keep].tolist()))
    out = _cc(pd.DataFrame({"doc_id": [a for a, _ in edges],
                            "dup_of": [b for _, b in edges]}))
    exp = _brute_components(edges)
    got = dict(zip(out["node"], out["cluster_id"]))
    assert got == exp


def test_cc_long_chain_needs_rounds():
    # a 40-node path exercises multi-round propagation + the
    # sum-convergence certificate (diameter ≈ rounds)
    n = 40
    pairs = pd.DataFrame({"doc_id": np.arange(1, n, dtype=np.int64),
                          "dup_of": np.arange(0, n - 1, dtype=np.int64)})
    out = _cc(pairs)
    assert (out["cluster_id"] == 0).all()
    assert len(out) == n


def test_cluster_sizes():
    pairs = pd.DataFrame({"doc_id": [2, 3, 21], "dup_of": [1, 2, 20]})
    comp = graph.connected_components(rd.from_pandas(pairs))
    sizes = graph.cluster_sizes(comp).to_pandas()
    got = dict(zip(sizes["cluster_id"], sizes["size"]))
    assert got == {1: 3, 20: 2}


def test_group_sample_deterministic_and_bounded():
    df = pd.DataFrame({
        "event_id": np.arange(1000, dtype=np.int64),
        "event_type": np.repeat(["a", "b", "c", "d"], 250),
    })
    a = scrub.group_sample(rd.from_pandas(df), group_col="event_type",
                           id_col="event_id", k=3).to_pandas()
    # repartition: identical output at another parallelism
    b = scrub.group_sample(rd.from_pandas(df).repartition(7),
                           group_col="event_type", id_col="event_id",
                           k=3).to_pandas()
    key = ["event_type", "rn"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert (a.groupby("event_type").size() == 3).all()
    assert set(a["rn"]) == {1, 2, 3}
    # matches the md5-order oracle locally
    import hashlib
    h = df["event_id"].map(
        lambda i: hashlib.md5(str(i).encode()).hexdigest())
    exp = (df.assign(_h=h).sort_values(["_h", "event_id"])
           .groupby("event_type").head(3))
    exp_ids = set(exp["event_id"])
    assert set(a["event_id"]) == exp_ids
