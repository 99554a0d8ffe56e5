"""Distributed cardinality sketch: HyperLogLog approximate distinct
count per group.

The exact distinct (queries.events_distinct_users) ships every
distinct pair through a bucketed exchange; at 10^10 distinct keys that
is the dominant shuffle.  This sketch bounds per-group state to
``2^b`` one-byte registers regardless of cardinality: per-batch
partials are (group, registers) rows, the merge is an elementwise max,
and only ``groups x 2^b`` bytes ever cross the wire.  Standard error
is ~1.04/sqrt(2^b) (b=11 -> ~2.3%).

Flajolet et al. 2007 (HyperLogLog) with the small-range linear-counting
correction; the raw-estimate bias constant alpha_m per the paper.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit finalizer (SplitMix64) — turns sequential ids
    into uniform hashes without per-row Python."""
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z += np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
    return z


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (float conversion is unsafe
    above 2^53): split into high/low 32-bit halves."""
    hi = (x >> np.uint64(32)).astype(np.uint32)
    lo = x.astype(np.uint32)
    bl_hi = np.frexp(hi.astype(np.float64))[1]
    bl_lo = np.frexp(lo.astype(np.float64))[1]
    return np.where(hi > 0, bl_hi + 32, bl_lo).astype(np.uint64)


def _estimate(regs: np.ndarray) -> float:
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting, small range
    return float(est)


def hll_distinct(ds: rd.Dataset, *, key: str, value: str,
                 b: int = 11) -> pd.DataFrame:
    """Approximate distinct ``value`` per ``key``: per-batch register
    partials (ONE vectorized hash/rho pass over the whole batch, then a
    flat ``np.maximum.at`` scatter into per-group register rows), a
    key-bucketed max-merge — the partials never collect on the driver,
    so an arbitrarily large key space shuffles only
    ``keys x blocks x 2^b`` bytes — and a per-key readout.

    Besides the rounded estimate, the readout emits two integer
    register checksums (``nonzero_regs``, ``reg_sum``) computed from
    the merged register array: they are exact functions of the
    deterministic splitmix64 register state, so an independent oracle
    can re-derive and match them bit-for-bit even though the estimate
    itself is 'approximate'."""
    from ..util import bucketed_groups

    m = 1 << b

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        codes, uniq = pd.factorize(df[key], sort=False)
        vals = df[value].to_numpy()
        if not np.issubdtype(vals.dtype, np.integer):
            vals = pd.util.hash_pandas_object(
                pd.Series(vals), index=False).to_numpy()
        h = _splitmix64(vals.astype(np.uint64))
        idx = (h >> np.uint64(64 - b)).astype(np.int64)
        rest = (h << np.uint64(b)) | np.uint64(m - 1)
        rho = (np.uint64(64) - _bit_length_u64(rest)
               + np.uint64(1)).astype(np.uint8)
        regs = np.zeros((len(uniq), m), dtype=np.uint8)
        np.maximum.at(regs.reshape(-1), codes * m + idx, rho)
        return pd.DataFrame({key: uniq,
                             "regs": [r.tobytes() for r in regs]})

    part = ds.map_batches(partials, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, gg in g.groupby(key, sort=False):
            regs = np.stack([np.frombuffer(r, dtype=np.uint8)
                             for r in gg["regs"]]).max(axis=0)
            rows.append((k, int(round(_estimate(regs))),
                         int((regs > 0).sum()),
                         int(regs.astype(np.int64).sum())))
        return pd.DataFrame(rows, columns=[key, "approx_distinct",
                                           "nonzero_regs", "reg_sum"])

    out = bucketed_groups(part, [key], merge).to_pandas()
    return out.sort_values(key).reset_index(drop=True)


# --- Count-Min sketch: bounded-memory heavy hitters ---------------------
class CountMinSketch:
    """Count-Min sketch (Cormode & Muthukrishnan 2005): ``depth``
    rows × ``width`` counters; add/query hash each key with ``depth``
    independent SplitMix64 streams.  Estimates are one-sided
    (est ≥ true) with err ≤ e·N/width at confidence 1−(1/e)^depth;
    merge is an elementwise sum, so per-block partials compose exactly
    like the fold's — the bounded-memory stand-in for the exact
    gram-bucketed heavy-hitter exchange when the distinct-gram space
    outgrows it."""

    def __init__(self, width: int = 16384, depth: int = 4):
        self.width = int(width)
        self.depth = int(depth)
        self.table = np.zeros((self.depth, self.width), dtype=np.int64)

    def _cols(self, keys: np.ndarray) -> np.ndarray:
        """(depth × n) counter columns for uint64 ``keys``."""
        out = np.empty((self.depth, len(keys)), dtype=np.int64)
        k = keys.astype(np.uint64)
        for d in range(self.depth):
            with np.errstate(over="ignore"):
                h = _splitmix64(k + np.uint64(0xD6E8FEB86659FD93) *
                                np.uint64(d + 1))
            out[d] = (h % np.uint64(self.width)).astype(np.int64)
        return out

    def add(self, keys: np.ndarray, counts: np.ndarray | None = None):
        counts = (np.ones(len(keys), dtype=np.int64) if counts is None
                  else counts.astype(np.int64))
        cols = self._cols(keys)
        for d in range(self.depth):
            np.add.at(self.table[d], cols[d], counts)

    def query(self, keys: np.ndarray) -> np.ndarray:
        cols = self._cols(keys)
        est = self.table[0][cols[0]]
        for d in range(1, self.depth):
            est = np.minimum(est, self.table[d][cols[d]])
        return est

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert (self.width, self.depth) == (other.width, other.depth)
        self.table += other.table
        return self


def cms_heavy_hitters(ds: rd.Dataset, key_fn, *, k: int = 30,
                      width: int = 16384, depth: int = 4,
                      cand_per_block: int = 200) -> pd.DataFrame:
    """Approximate top-k heavy hitters under BOUNDED memory: each block
    reduces to (a) one Count-Min table (depth×width ints — constant,
    independent of the block's distinct-key count) and (b) its local
    top-``cand_per_block`` candidate keys.  The driver sums the tables
    (CMS merge is exact) and ranks the candidate union by CMS estimate.

    ``key_fn(batch) -> (labels, hashes, counts)`` maps a pyarrow batch
    to string labels + uint64 key hashes + int64 counts.  A true
    global heavy hitter is necessarily a local heavy hitter in some
    block, so the candidate union covers the real top-k for skewed
    distributions; counts are CMS estimates (≥ true).  The exact
    sibling is ``text.ngram_heavy_hitters``."""
    import pandas as pd

    def partial(batch: pa.Table) -> pd.DataFrame:
        labels, hashes, counts = key_fn(batch)
        cms = CountMinSketch(width, depth)
        cms.add(hashes, counts)
        df = pd.DataFrame({"label": labels, "h": hashes, "n": counts})
        top = (df.groupby(["label", "h"], sort=False)["n"].sum()
               .nlargest(cand_per_block).reset_index())
        return pd.DataFrame({
            "kind": ["cms"] + ["cand"] * len(top),
            "label": [""] + top["label"].tolist(),
            "h": np.concatenate([[np.uint64(0)],
                                 top["h"].to_numpy(np.uint64)]),
            "payload": [cms.table.tobytes()] + [b""] * len(top)})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    total = CountMinSketch(width, depth)
    for buf in parts.loc[parts["kind"] == "cms", "payload"]:
        other = CountMinSketch(width, depth)
        other.table = np.frombuffer(buf, dtype=np.int64) \
            .reshape(depth, width).copy()
        total.merge(other)
    cand = (parts.loc[parts["kind"] == "cand", ["label", "h"]]
            .drop_duplicates())
    est = total.query(cand["h"].to_numpy(np.uint64))
    out = pd.DataFrame({"gram": cand["label"].to_numpy(),
                        "est_count": est.astype("int64")})
    out = (out.sort_values(["est_count", "gram"],
                           ascending=[False, True], kind="mergesort")
           .head(k).reset_index(drop=True))
    out["rnk"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out


def ensure_cms_fixture(sf_dir: str) -> str:
    """Idempotently persist ``(word, b0..b3)`` — every distinct
    whitespace token of ``sf_dir``'s documents with its four Count-Min
    counter columns (``CountMinSketch._cols``, width 16384 / depth 4),
    computed scalar-path with the same pyarrow tokenizer and the same
    ``pd.util.hash_pandas_object`` key hash ``doc_word_topk_cms``
    uses.  The SQL oracle re-derives word counts from the documents
    table, sums them per (depth, counter) through this mapping, takes
    the per-word min across depths — the CMS estimate exactly — and
    replays the (est DESC, gram ASC) top-k.  Validation-scale only."""
    import os

    import pandas as pd
    import pyarrow.compute as pc
    import pyarrow.parquet as _pq

    from ..util import ensure_fixture, fixture_path

    path = fixture_path("cms", sf_dir)

    def build() -> pa.Table:
        tbl = _pq.read_table(f"{sf_dir}/documents.parquet",
                             columns=["text"])
        toks = pc.utf8_split_whitespace(
            pc.utf8_trim_whitespace(pc.fill_null(tbl["text"], "")))
        flat = pc.list_flatten(toks).to_pandas()
        flat = flat[flat != ""]
        words = pd.Series(flat.unique(), dtype="object")
        hashes = pd.util.hash_pandas_object(words, index=False) \
            .to_numpy(dtype=np.uint64)
        cols = CountMinSketch()._cols(hashes)
        return pa.table({"word": pa.array(words, pa.string()),
                         "b0": pa.array(cols[0]),
                         "b1": pa.array(cols[1]),
                         "b2": pa.array(cols[2]),
                         "b3": pa.array(cols[3])})

    return ensure_fixture(path, f"{os.path.abspath(sf_dir)}|v1", build)
