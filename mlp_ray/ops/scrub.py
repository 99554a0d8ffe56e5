"""Training-data hygiene operators: PII scrubbing, benchmark
decontamination and deterministic stratified sampling.

These extend the reference's redaction surface (the log engine redacts
query shapes — ``LogRedactionUtil.java:67-232``) to the document/LLM
side of the pipeline.  All three are streaming ``map_batches`` stages:

- PII scrub: Arrow RE2 kernels (``replace_substring_regex`` /
  ``count_substring_regex``) — DuckDB's regexp functions run the same
  RE2 engine, so the oracle shares the pattern strings verbatim.
- Decontamination: the benchmark side is SMALL by contract (an eval
  set, not a corpus), so its distinct word-k-gram hashes are collected
  once, broadcast via ``ray.put`` and probed per batch with
  ``np.isin`` — no shuffle touches the corpus.
- Stratified sample: a pure per-row hash gate (md5 bucket vs per-
  stratum rate) — embarrassingly parallel, deterministic across runs
  and cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from .dedup import _batch_token_hashes, _gram_hashes_from_tokens, \
    _cached_stage

# RE2 patterns shared VERBATIM with the DuckDB oracle (__ray_entry__):
# pyarrow's re2 and DuckDB's regexp_* agree on these constructs
# (\b word boundary, bounded repeats, character classes).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}(\.\d{1,3}){3}\b"
PII_PHONE = r"\b\d{3}-\d{4}\b"
_PII_RULES = (("email", PII_EMAIL, "<EMAIL>"),
              ("ip", PII_IPV4, "<IP>"),
              ("phone", PII_PHONE, "<PHONE>"))


def inject_pii_batch(batch: pa.Table, text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """Deterministically append synthetic PII (one email, one IPv4, one
    phone fragment derived from the row id) to every text.  The test
    corpora are PII-free by construction; this derivation step gives
    the scrub stage real work whose output an oracle can attest.
    Vectorized via pandas string concat (C loop over object dtype)."""
    ids = pd.Series(batch[id_col].to_numpy(zero_copy_only=False)
                    .astype(np.int64))
    i = ids.astype(str)
    suffix = (" contact u" + i + "@ex.com from 10."
              + (ids % 200).astype(str) + ".3." + (ids % 250).astype(str)
              + " call 555-" + (1000 + ids % 9000).astype(str))
    joined = pc.binary_join_element_wise(
        batch[text_col], pa.array(suffix, pa.string()), "")
    return batch.set_column(batch.schema.get_field_index(text_col),
                            text_col, joined)


def pii_scrub_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Scrub emails → <EMAIL>, IPv4s → <IP>, phone fragments →
    <PHONE>; per-row match counts (on the pre-scrub text) come along
    as ``n_email`` / ``n_ip`` / ``n_phone``.  All-Arrow RE2, zero
    Python per row."""
    txt = batch[text_col]
    out = batch
    for name, pat, repl in _PII_RULES:
        out = out.append_column(
            f"n_{name}", pc.cast(pc.count_substring_regex(txt, pat),
                                 pa.int64()))
    scrubbed = txt
    for name, pat, repl in _PII_RULES:
        scrubbed = pc.replace_substring_regex(scrubbed, pat, repl)
    return out.append_column("scrubbed", scrubbed)


def _distinct_grams_per_doc(texts: list[str], k: int):
    """(flat distinct (doc, gram-hash) pairs) for a batch: one token-
    hash pass + masked gram chain (see dedup), then a single lexsort
    dedupes (doc, gram) pairs across the whole batch — no per-doc
    Python.  Returns (doc_idx, gram_hash) arrays of the distinct
    pairs plus n docs."""
    th, lens = _batch_token_hashes(texts)
    grams, offsets = _gram_hashes_from_tokens(th, lens, k)
    n = len(texts)
    counts = np.diff(offsets)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    order = np.lexsort((grams, doc_idx))
    d, g = doc_idx[order], grams[order]
    new = np.ones(len(d), dtype=bool)
    if len(d) > 1:
        new[1:] = (d[1:] != d[:-1]) | (g[1:] != g[:-1])
    return d[new], g[new], n


def bench_slice(ds, *, mod: int = 53, id_col: str = "doc_id"):
    """THE deterministic held-out 'benchmark' slice convention
    (``doc_id %% mod == 0``) — one implementation shared by the
    decontamination queries, the curation pipeline and the cluster
    jobs, so the eval-set definition cannot drift between them."""
    def keep(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(ids % mod == 0))

    return ds.map_batches(keep, batch_format="pyarrow")


def benchmark_gram_set(bench_ds: rd.Dataset, *, k: int = 5,
                       text_col: str = "text") -> np.ndarray:
    """Sorted distinct gram hashes of the (small) benchmark dataset.
    Per-batch distinct sets stream back as variable-length rows; the
    driver-side union is bounded by the benchmark's vocabulary, not
    the corpus."""
    def grams(batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch[text_col].to_pylist()]
        _, g, _ = _distinct_grams_per_doc(texts, k)
        return pa.table({"gram": pa.array(np.unique(g), pa.uint64())})

    parts = bench_ds.map_batches(grams, batch_format="pyarrow").to_pandas()
    return np.unique(parts["gram"].to_numpy().astype(np.uint64))


def decontaminate(docs_ds: rd.Dataset, bench_grams: np.ndarray, *,
                  k: int = 5, threshold: int = 1,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> rd.Dataset:
    """Per-doc benchmark-overlap stats: ``n_grams`` distinct word-k-
    grams, ``overlap_grams`` of them present in the benchmark set,
    ``contaminated`` = overlap ≥ threshold.  The benchmark set is
    broadcast once (``ray.put``) and probed with ``np.isin`` inside
    each batch — the corpus never shuffles."""
    ref = ray.put(np.asarray(bench_grams, dtype=np.uint64))

    def probe(batch: pa.Table, _ref=ref, _k=k, _thr=threshold):
        bg = _cached_stage(("decon", _ref), lambda: ray.get(_ref))
        texts = [t or "" for t in batch[text_col].to_pylist()]
        d, g, n = _distinct_grams_per_doc(texts, _k)
        n_grams = np.bincount(d, minlength=n).astype(np.int64)
        hit = np.isin(g, bg)
        overlap = np.bincount(d[hit], minlength=n).astype(np.int64)
        return pa.table({
            id_col: batch[id_col],
            "n_grams": pa.array(n_grams),
            "overlap_grams": pa.array(overlap),
            "contaminated": pa.array((overlap >= _thr).astype(np.int64)),
        })

    return docs_ds.map_batches(probe, batch_format="pyarrow")


def hash_split(ds: rd.Dataset, *, id_col: str = "doc_id",
               val_pct: int = 10, test_pct: int = 10) -> rd.Dataset:
    """Deterministic train/val/test assignment: ``md5(id) mod 100``
    lands in [0, val) → val, [val, val+test) → test, else train.
    Pure per-row gate — disjoint and exhaustive by construction,
    stable under any partitioning/resume, and every doc's split is
    reproducible from its id alone (the property that matters when a
    100 TB corpus is re-sharded: no doc ever migrates across the
    eval boundary)."""
    import hashlib

    def gate(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        buckets = np.fromiter(
            (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
             for i in ids), dtype=np.int64, count=len(ids))
        split = np.where(buckets < val_pct, "val",
                         np.where(buckets < val_pct + test_pct,
                                  "test", "train"))
        return batch.append_column("split", pa.array(split, pa.string()))

    return ds.map_batches(gate, batch_format="pyarrow")


def group_sample(ds: rd.Dataset, *, group_col: str, id_col: str,
                 k: int = 3) -> rd.Dataset:
    """Deterministic k-row sample PER GROUP: the k rows whose
    ``md5(id)`` hex digests sort first (tie-break id ASC) — a
    shuffle-light, order-independent stand-in for per-group reservoir
    sampling (same contract as ``stratified_sample``: identical output
    at any parallelism, after any resume).

    State is bounded by construction: every batch prunes itself to k
    rows per group before the exchange, so the group-bucketed merge
    sees at most k·blocks rows per group, never the group.  Returns
    (group, id, rn) with rn = 1..k in hash order.  The md5 hex key is
    the DuckDB-oracle-pinned ordering (md5 == hashlib.md5)."""
    import hashlib

    def keyed_prune(batch: pa.Table) -> pd.DataFrame:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({
            group_col: batch[group_col].to_pylist(),
            id_col: ids,
            "_h": [hashlib.md5(str(i).encode()).hexdigest() for i in ids],
        })
        return (df.sort_values(["_h", id_col], kind="mergesort")
                .groupby(group_col, sort=False).head(k))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values(["_h", id_col], kind="mergesort")
             .groupby(group_col, sort=False).head(k)
             .sort_values([group_col, "_h", id_col], kind="mergesort"))
        g["rn"] = (g.groupby(group_col, sort=False).cumcount() + 1) \
            .astype("int64")
        return g.drop(columns=["_h"]).reset_index(drop=True)

    from ..util import bucketed_groups

    partials = ds.map_batches(keyed_prune, batch_format="pyarrow")
    return bucketed_groups(partials, [group_col], merge)


def stratified_sample(ds: rd.Dataset, rates: dict[str, int], *,
                      default_rate: int, stratum_col: str = "lang",
                      id_col: str = "doc_id") -> rd.Dataset:
    """Deterministic per-stratum downsampling: keep a row iff
    ``md5(id) mod 100 < rate[stratum]`` (rates are percents).  The
    gate depends only on row content — identical samples regardless of
    partitioning, cluster size or execution order, and a resumed run
    re-selects the same rows.  md5 matches DuckDB's ``md5()`` so the
    oracle applies the same gate."""
    import hashlib

    def gate(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        buckets = np.fromiter(
            (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
             for i in ids), dtype=np.int64, count=len(ids))
        strata = batch[stratum_col].to_pylist()
        thr = np.fromiter((rates.get(s, default_rate) for s in strata),
                          dtype=np.int64, count=len(strata))
        return batch.filter(pa.array(buckets < thr))

    return ds.map_batches(gate, batch_format="pyarrow")


# --- Bloom-gated decontamination (the > broadcast-budget path) ----------
class BloomFilter:
    """Vectorized Bloom filter over uint64 keys: ``m`` bits,
    ``n_hashes`` derived probes per key via splitmix64-style mixing
    (fp ≈ (1 - e^{-kn/m})^k: 16 bits/key at 8 hashes ≈ 5.6e-4).
    Numpy-only — build and probe are whole-array ops, the bit array
    ships once via ``ray.put`` (m/8 bytes regardless of key count).
    False positives mark a clean doc contaminated (conservative for
    training-data hygiene); false negatives are impossible."""

    __slots__ = ("bits", "m", "n_hashes")

    def __init__(self, m_bits: int, n_hashes: int = 8):
        self.m = int(m_bits)
        self.n_hashes = int(n_hashes)
        self.bits = np.zeros((self.m + 7) // 8, dtype=np.uint8)

    @staticmethod
    def _mix(x: np.ndarray, salt: np.uint64) -> np.ndarray:
        # splitmix64 finalizer, salted per probe
        x = (x + salt) & np.uint64(0xFFFFFFFFFFFFFFFF)
        x ^= x >> np.uint64(30)
        x = (x * np.uint64(0xBF58476D1CE4E5B9)) & \
            np.uint64(0xFFFFFFFFFFFFFFFF)
        x ^= x >> np.uint64(27)
        x = (x * np.uint64(0x94D049BB133111EB)) & \
            np.uint64(0xFFFFFFFFFFFFFFFF)
        return x ^ (x >> np.uint64(31))

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        cols = [self._mix(keys, np.uint64((0x9E3779B97F4A7C15 * (i + 1))
                                          & 0xFFFFFFFFFFFFFFFF))
                % np.uint64(self.m) for i in range(self.n_hashes)]
        return np.stack(cols, axis=1)  # (n, n_hashes)

    def add(self, keys: np.ndarray) -> None:
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(self.bits, pos >> 3,
                         (1 << (pos & 7)).astype(np.uint8))

    def contains(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)
        got = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return got.all(axis=1)


def decontaminate_bloom(docs_ds: rd.Dataset, bench_grams: np.ndarray, *,
                        k: int = 5, threshold: int = 1,
                        bits_per_key: int = 16, n_hashes: int = 8,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> rd.Dataset:
    """``decontaminate`` for benchmark sets too large to broadcast
    exactly: the gram set compresses into a Bloom filter
    (``bits_per_key`` bits/key: 16 → fp ≈ 5.6e-4 per gram at 8
    hashes, 2 bytes/key vs the exact set's 8), shipping once and
    probing vectorized.  Overlap counts are an UPPER bound
    (fp-inflated ≈ n_grams × fp extra per doc, so at threshold=1 a
    long clean doc can over-flag); ``contaminated`` can only
    over-flag, never leak a contaminated doc through."""
    bench = np.asarray(bench_grams, dtype=np.uint64)
    bf = BloomFilter(max(64, bits_per_key * max(1, len(bench))), n_hashes)
    bf.add(bench)
    ref = ray.put(bf)

    def probe(batch: pa.Table, _ref=ref, _k=k, _thr=threshold):
        f = _cached_stage(("decon_bloom", _ref), lambda: ray.get(_ref))
        texts = [t or "" for t in batch[text_col].to_pylist()]
        d, g, n = _distinct_grams_per_doc(texts, _k)
        n_grams = np.bincount(d, minlength=n).astype(np.int64)
        hit = f.contains(g)
        overlap = np.bincount(d[hit], minlength=n).astype(np.int64)
        return pa.table({
            id_col: batch[id_col],
            "n_grams": pa.array(n_grams),
            "overlap_grams": pa.array(overlap),
            "contaminated": pa.array((overlap >= _thr).astype(np.int64)),
        })

    return docs_ds.map_batches(probe, batch_format="pyarrow")


def ensure_bloom_fixture(sf_dir: str) -> str:
    """Idempotently persist ``(doc_id, overlap_grams)`` — each doc's
    Bloom-gated benchmark-gram overlap count, computed scalar-path
    with the same ``_distinct_grams_per_doc`` / ``BloomFilter``
    kernels and ``doc_decontaminate_bloom``'s defaults (k 5, 16
    bits/key, 8 hashes, doc_id %% 53 bench slice).  The SQL oracle
    re-derives ``n_grams`` from the documents table (the exact
    sibling's gram CTE), joins the Bloom overlap from this fixture —
    the membership probe is the only non-SQL-expressible step — and
    replays the ``contaminated`` threshold.  Validation-scale only."""
    import os

    import pyarrow.parquet as _pq

    from ..util import ensure_fixture, fixture_path

    path = fixture_path("bloom", sf_dir)

    def build() -> pa.Table:
        tbl = _pq.read_table(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"])
        ids = tbl["doc_id"].to_numpy().astype(np.int64)
        texts = [t or "" for t in tbl["text"].to_pylist()]
        bench_texts = [t for i, t in zip(ids, texts) if i % 53 == 0]
        _, bg, _ = _distinct_grams_per_doc(bench_texts, 5)
        bench = np.unique(bg)
        bf = BloomFilter(max(64, 16 * max(1, len(bench))), 8)
        bf.add(bench)
        d, g, n = _distinct_grams_per_doc(texts, 5)
        hit = bf.contains(g)
        overlap = np.bincount(d[hit], minlength=n).astype(np.int64)
        return pa.table({"doc_id": pa.array(ids),
                         "overlap_grams": pa.array(overlap)})

    return ensure_fixture(path, f"{os.path.abspath(sf_dir)}|v1", build)
