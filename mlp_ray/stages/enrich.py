"""Dictionary lookup-join enrichment (the north rule's "namespace →
collection metadata" broadcast join).

The small side is broadcast once — either captured directly (tiny
static dims) or shipped via ``ray.put`` and fetched once per actor in
``__init__`` — and applied per batch as a vectorized dictionary take.
Never a shuffle join: at 10^12 rows the big side must not move for a
20-row dimension table (SURVEY.md §2.4 J1-graft).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..schema import NAMESPACES


def default_ns_meta() -> dict[str, dict[str, str]]:
    """Deterministic ns→metadata dimension (FIXTURES.md §2)."""
    tiers = ["hot", "warm", "cold"]
    types = ["normal", "timeseries", "view"]
    owners = ["team-core", "team-data", "team-infra", "team-billing"]
    meta = {}
    for i, ns in enumerate(NAMESPACES):
        meta[ns] = {
            "collection_type": types[i % len(types)],
            "tier": tiers[i % len(tiers)],
            "owner": owners[i % len(owners)],
        }
    return meta


class NsEnricher:
    """Actor-pool stage: left-join ``ns`` against the broadcast dict.

    Accepts a plain dict or a ``ray.ObjectRef`` (fetched once per
    actor — the broadcast read side of ``ray.put``).
    """

    def __init__(self, meta=None):
        if meta is None:
            meta = default_ns_meta()
        if isinstance(meta, ray.ObjectRef):
            meta = ray.get(meta)
        self.fields = ["collection_type", "tier", "owner"]
        # dictionary-encode: ns → index, field arrays indexed by ns idx
        self.ns_index = {ns: i for i, ns in enumerate(meta)}
        self.cols = {
            f: np.array([v[f] for v in meta.values()] + [None], dtype=object)
            for f in self.fields
        }
        self.miss = len(self.ns_index)  # sentinel row of nulls

    def __call__(self, batch: pa.Table) -> pa.Table:
        ns = batch["ns"].to_pylist()
        idx = np.fromiter((self.ns_index.get(x, self.miss) for x in ns),
                          dtype=np.int64, count=len(ns))
        for f in self.fields:
            batch = batch.append_column(f, pa.array(self.cols[f][idx], pa.string()))
        return batch
