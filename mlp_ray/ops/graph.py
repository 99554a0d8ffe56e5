"""Distributed graph operators over candidate-pair edge lists.

The dedup family (ops/dedup.py) emits *pairs*; production corpus
dedup needs the transitive closure of those pairs — duplicate
CLUSTERS — so one canonical document can be kept per connected
component (the reference engine has no graph step; this extends its
dedup surface the way a training-data pipeline needs at 100 TB).

``connected_components`` is hash-min label propagation expressed as
Ray Data passes: labels and edges are narrow (two int64 columns), and
each round is two hash-bucketed exchanges with ONE vectorized pandas
reduction per bucket — no per-node Python, no driver-side graph.  The
labels table is materialized per round (bounded: one row per node) so
the lazy plan does not re-execute prior rounds.

Convergence is O(log diameter) rounds: besides the static edges,
every node exchanges labels with its current cluster representative
(pointer-shortcut / "hash-to-min" edges, in the spirit of Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14), so
chains halve each round instead of shrinking by one hop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd
from ray.data.aggregate import Sum

from ..util import bucketed_groups

def connected_components(pairs: rd.Dataset, *, left: str = "doc_id",
                         right: str = "dup_of", max_rounds: int = 50,
                         num_buckets: int = 64) -> rd.Dataset:
    """(node, cluster_id) for every endpoint of ``pairs``, where
    cluster_id = the minimum node id of the node's connected
    component.

    Convergence is certified by the sum of labels: min-propagation
    only ever lowers a label, so an unchanged global sum means a
    fixed point.  ``max_rounds`` guards pathological chains (see
    module docstring for the O(log n) alternative)."""

    def both_dirs(df: pd.DataFrame) -> pd.DataFrame:
        a = pd.DataFrame({"key": df[left].to_numpy(dtype=np.int64),
                          "other": df[right].to_numpy(dtype=np.int64)})
        b = pd.DataFrame({"key": a["other"].to_numpy(),
                          "other": a["key"].to_numpy()})
        return pd.concat([a, b], ignore_index=True)

    # edges are re-read every round — materialize the narrow table once
    edges = (pairs.map_batches(both_dirs, batch_format="pandas")
             .materialize())
    if edges.count() == 0:
        import pyarrow as pa
        return rd.from_arrow(pa.table(
            {"node": pa.nulls(0, pa.int64()),
             "cluster_id": pa.nulls(0, pa.int64())}))

    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        n = pd.unique(df["key"])
        return pd.DataFrame({"key": n, "lbl": n})

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates("key").reset_index(drop=True)

    labels = bucketed_groups(
        edges.map_batches(init_labels, batch_format="pandas"),
        ["key"], dedup_bucket, num_buckets=num_buckets).materialize()
    prev_sum = labels.aggregate(Sum("lbl"))["sum(lbl)"]

    def lbl_rows(df: pd.DataFrame) -> pd.DataFrame:
        # ONE map emits both row kinds the round needs from a labels
        # block: the label row itself (other = -1) and, for every node
        # not yet its own representative, the two pointer-shortcut
        # edges key↔lbl ("hash-to-min": chains halve per round).  A
        # second lazy map over `labels` here (separate union branch)
        # made each round's plan re-execute combinatorially — keep the
        # round body ONE map over labels plus the materialized edges.
        k = df["key"].to_numpy(dtype=np.int64)
        l = df["lbl"].to_numpy(dtype=np.int64)
        m = l != k
        n_sc = int(m.sum())
        return pd.DataFrame({
            "key": np.concatenate([k, k[m], l[m]]),
            "other": np.concatenate([np.full(len(k), -1, np.int64),
                                     l[m], k[m]]),
            "lbl": np.concatenate([l, np.full(2 * n_sc, -1, np.int64)])})

    def tag_edges(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"key": df["key"].to_numpy(dtype=np.int64),
                             "other": df["other"].to_numpy(dtype=np.int64),
                             "lbl": np.int64(-1)})

    def propagate(g: pd.DataFrame) -> pd.DataFrame:
        # one bucket holds WHOLE nodes: each node's label row plus all
        # edges leaving it — one pandas merge emits every (neighbor,
        # my_label) message, label rows pass through
        lbl = g[g["other"] == -1][["key", "lbl"]]
        e = g[g["other"] != -1][["key", "other"]]
        msg = (e.merge(lbl, on="key")[["other", "lbl"]]
               .rename(columns={"other": "key"}))
        return pd.concat([lbl, msg], ignore_index=True)

    def take_min(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("key", sort=False)["lbl"].min().reset_index()
        out["lbl"] = out["lbl"].astype("int64")
        return out

    # materialized: unioned into every round's plan — a lazy branch
    # would re-run the tag map each round AND (observed) blow round
    # wall time up combinatorially when combined with a second lazy
    # branch over labels
    tagged_edges = (edges.map_batches(tag_edges, batch_format="pandas")
                    .materialize())
    converged = False
    for _ in range(max_rounds):
        mixed = labels.map_batches(
            lbl_rows, batch_format="pandas").union(tagged_edges)
        labels = bucketed_groups(
            bucketed_groups(mixed, ["key"], propagate,
                            num_buckets=num_buckets),
            ["key"], take_min, num_buckets=num_buckets).materialize()
        s = labels.aggregate(Sum("lbl"))["sum(lbl)"]
        if s == prev_sum:
            converged = True
            break
        prev_sum = s
    if not converged:
        # unconverged labels are NOT clusters — a pathological chain
        # longer than the pointer-shortcut rounds must fail loudly
        # rather than hand callers wrong cluster ids
        raise RuntimeError(
            f"connected_components did not reach its label fixed point "
            f"within max_rounds={max_rounds}; raise max_rounds (rounds "
            f"needed grow ~log(diameter) with the pointer shortcut)")

    return labels.map_batches(
        lambda df: df.rename(columns={"key": "node", "lbl": "cluster_id"}),
        batch_format="pandas")


def cluster_sizes(components: rd.Dataset) -> rd.Dataset:
    """(cluster_id, size) rollup of a components table — the view that
    picks how much a dedup pass would remove (keep one per cluster)."""
    from ray.data.aggregate import Count

    return components.groupby("cluster_id").aggregate(
        Count(alias_name="size"))
