"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard verification, embedding-cosine near-dup.

Shapes (all Ray-Data-first, no driver-side row loops):
  exact     — per-batch partial dedup → hash-partitioned groupby merge
  minhash   — stateful actor signatures → band flat_map → bucket
              groupby → candidate pairs with signature-estimated Jaccard
  simhash   — 64-bit simhash → 4×16-bit banded buckets → Hamming ≤ t
  embedding — random-hyperplane LSH buckets → within-bucket cosine
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from .text import md5_hash_batch

_MERSENNE = (1 << 61) - 1


# --- exact dedup -------------------------------------------------------
def exact_dedup(ds: rd.Dataset, col: str = "text",
                id_col: str = "doc_id") -> rd.Dataset:
    """(text_hash, canonical_doc_id, dup_count): min id per distinct
    content; partial per batch, merged in a hash-partitioned groupby."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        t = md5_hash_batch(batch, col)
        df = t.select(["text_hash", id_col]).to_pandas()
        g = df.groupby("text_hash", sort=False)[id_col]
        out = g.agg(canonical_doc_id="min", dup_count="size").reset_index()
        out["canonical_doc_id"] = out["canonical_doc_id"].astype("int64")
        out["dup_count"] = out["dup_count"].astype("int64")
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame([{
            "text_hash": g["text_hash"].iloc[0],
            "canonical_doc_id": int(g["canonical_doc_id"].min()),
            "dup_count": int(g["dup_count"].sum()),
        }])

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("text_hash").map_groups(merge, batch_format="pandas"))


# --- MinHash + LSH -----------------------------------------------------
def _shingle_hashes(text: str, k: int) -> np.ndarray:
    toks = text.split()
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else [""]
    else:
        grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    return np.unique(np.fromiter(
        (int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(),
                        "big") % _MERSENNE for g in grams),
        dtype=np.uint64, count=len(grams)))


class MinHasher:
    """Actor-pool stage: text → 64-component MinHash signature."""

    def __init__(self, num_hashes: int = 64, shingle_k: int = 3,
                 seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 2**63, num_hashes, dtype=np.uint64) | 1
        self.b = rng.integers(0, 2**63, num_hashes, dtype=np.uint64)
        self.k = shingle_k
        self.num_hashes = num_hashes

    def signature(self, text: str) -> np.ndarray:
        # multiply-shift family over uint64 (a odd, wraparound mod 2^64)
        # — vectorized H×S min in C instead of a per-component Python
        # big-int loop, exact and deterministic
        s = _shingle_hashes(text, self.k)
        with np.errstate(over="ignore"):
            prods = self.a[:, None] * s[None, :] + self.b[:, None]
        return prods.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t or "") for t in batch["text"].to_pylist()]
        arr = pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64()))
        return pa.table({"doc_id": batch["doc_id"], "sig": arr})


def _band_rows(batch: pa.Table, bands: int, rows: int) -> pa.Table:
    doc_ids, band_ids, band_hashes, sigs = [], [], [], []
    sig_col = batch["sig"].to_pylist()
    ids = batch["doc_id"].to_pylist()
    for did, sig in zip(ids, sig_col):
        for b in range(bands):
            chunk = sig[b * rows:(b + 1) * rows]
            h = hashlib.blake2b(
                np.asarray(chunk, dtype=np.uint64).tobytes(),
                digest_size=8).hexdigest()
            doc_ids.append(did)
            band_ids.append(b)
            band_hashes.append(h)
            sigs.append(sig)
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "band": pa.array(band_ids, pa.int32()),
        "band_hash": pa.array(band_hashes, pa.string()),
        "sig": pa.array(sigs, pa.list_(pa.uint64())),
    })


def minhash_lsh_candidates(ds: rd.Dataset, *, num_hashes: int = 64,
                           bands: int = 16, shingle_k: int = 3,
                           seed: int = 42,
                           est_threshold: float = 0.5) -> rd.Dataset:
    """Candidate near-dup pairs: (doc_id, dup_of, est_jaccard), doc_id >
    dup_of, est_jaccard = fraction of equal signature components ≥
    threshold.  Dedup across bands via a final groupby on the pair."""
    if num_hashes % bands:
        raise ValueError(
            f"bands={bands} must divide num_hashes={num_hashes} "
            "(trailing signature components would be silently unused)")
    rows = num_hashes // bands

    sigs = ds.map_batches(MinHasher, batch_format="pyarrow",
                          concurrency=(1, 8),
                          fn_constructor_kwargs={"num_hashes": num_hashes,
                                                 "shingle_k": shingle_k,
                                                 "seed": seed})
    banded = sigs.map_batches(lambda b: _band_rows(b, bands, rows),
                              batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # each doc pairs with the EARLIEST earlier doc in the bucket
        # whose signature-estimated Jaccard clears the threshold;
        # bucket sizes are bounded by the band hash (cap defends
        # against degenerate hot buckets)
        if len(g) < 2:
            return _PAIRS_EMPTY.copy()
        g = g.sort_values("doc_id", kind="mergesort").head(4096)
        sig_m = np.stack([np.asarray(s, dtype=np.uint64) for s in g["sig"]])
        ids = g["doc_id"].to_numpy()
        out = []
        for i in range(1, len(ids)):
            ests = (sig_m[:i] == sig_m[i]).mean(axis=1)
            hits = np.nonzero(ests >= est_threshold)[0]
            if len(hits):
                j = hits[0]
                out.append({"doc_id": int(ids[i]), "dup_of": int(ids[j]),
                            "est_jaccard": round(float(ests[j]), 6)})
        return pd.DataFrame(out) if out else _PAIRS_EMPTY.copy()

    pairs = banded.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas")

    def dedup_pair(g: pd.DataFrame) -> pd.DataFrame:
        # keep the single BEST pair so dup_of and est_jaccard describe
        # the same counterpart (mixing min-dup_of with max-jaccard
        # attributed one pair's similarity to another)
        r = g.sort_values(["est_jaccard", "dup_of"],
                          ascending=[False, True],
                          kind="mergesort").iloc[0]
        return pd.DataFrame([{
            "doc_id": int(r["doc_id"]),
            "dup_of": int(r["dup_of"]),
            "est_jaccard": float(r["est_jaccard"]),
        }])

    return pairs.groupby("doc_id").map_groups(dedup_pair,
                                              batch_format="pandas")


_PAIRS_EMPTY = pd.DataFrame({
    "doc_id": pd.Series(dtype="int64"),
    "dup_of": pd.Series(dtype="int64"),
    "est_jaccard": pd.Series(dtype="float64"),
})


def ngram_jaccard_verify(docs_ds: rd.Dataset, candidates: pd.DataFrame,
                         shingle_k: int = 3,
                         threshold: float = 0.5) -> pd.DataFrame:
    """Exact n-gram Jaccard for candidate pairs.  The candidate set is
    small (LSH output) → broadcast the needed shingle sets."""
    if candidates.empty:
        return candidates.assign(jaccard=pd.Series(dtype="float64"))
    needed = set(candidates["doc_id"]) | set(candidates["dup_of"])

    def shingles(batch: pa.Table) -> pa.Table:
        keep_ids, blobs = [], []
        for did, text in zip(batch["doc_id"].to_pylist(),
                             batch["text"].to_pylist()):
            if did in needed:
                keep_ids.append(did)
                blobs.append(_shingle_hashes(text or "", shingle_k).tobytes())
        return pa.table({"doc_id": pa.array(keep_ids, pa.int64()),
                         "shingles": pa.array(blobs, pa.binary())})

    sh = {r["doc_id"]: np.frombuffer(r["shingles"], dtype=np.uint64)
          for r in docs_ds.map_batches(shingles,
                                       batch_format="pyarrow").take_all()}
    jac = []
    for _, row in candidates.iterrows():
        a, b = sh.get(row["doc_id"]), sh.get(row["dup_of"])
        if a is None or b is None or (len(a) == 0 and len(b) == 0):
            jac.append(0.0)
            continue
        inter = np.intersect1d(a, b, assume_unique=True).size
        union = a.size + b.size - inter
        jac.append(round(inter / union, 6) if union else 0.0)
    out = candidates.copy()
    out["jaccard"] = jac
    return out[out["jaccard"] >= threshold].reset_index(drop=True)


# --- SimHash -----------------------------------------------------------
class SimHasher:
    """Actor-pool stage: text → 64-bit simhash over whitespace tokens."""

    def __init__(self):
        pass

    def simhash(self, text: str) -> int:
        toks = text.split()
        if not toks:
            return 0
        hs = np.fromiter(
            (int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8)
                            .digest(), "big") for t in toks),
            dtype=np.uint64, count=len(toks))
        bits = np.unpackbits(hs.view(np.uint8)).reshape(len(toks), 64)
        votes = bits.sum(axis=0) * 2 - len(toks)
        out = np.packbits((votes > 0).astype(np.uint8))
        return int.from_bytes(out.tobytes(), "big")

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = [self.simhash(t or "") for t in batch["text"].to_pylist()]
        return pa.table({"doc_id": batch["doc_id"],
                         "simhash": pa.array(vals, pa.uint64())})


def simhash_candidates(ds: rd.Dataset, *, max_hamming: int = 3) -> rd.Dataset:
    """Near-dup pairs by simhash Hamming distance ≤ t, banded into 4
    16-bit tables (a pair within distance 3 must agree on ≥1 band)."""
    if max_hamming > 3:
        raise ValueError(
            "4-band/16-bit simhash LSH only guarantees recall for "
            f"max_hamming <= 3 (got {max_hamming}); raise the band "
            "count for larger radii")
    sigs = ds.map_batches(SimHasher, batch_format="pyarrow",
                          concurrency=(1, 8))

    def band(batch: pa.Table) -> pa.Table:
        ids, bands, keys, sims = [], [], [], []
        for did, sh in zip(batch["doc_id"].to_pylist(),
                           batch["simhash"].to_pylist()):
            for b in range(4):
                ids.append(did)
                bands.append(b)
                keys.append((sh >> (16 * b)) & 0xFFFF)
                sims.append(sh)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "band": pa.array(bands, pa.int32()),
                         "key": pa.array(keys, pa.int32()),
                         "simhash": pa.array(sims, pa.uint64())})

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return _SIM_EMPTY.copy()
        g = g.sort_values("doc_id", kind="mergesort").head(4096)
        ids = g["doc_id"].to_numpy()
        sh = g["simhash"].to_numpy(dtype=np.uint64)
        # vectorized pairwise Hamming via popcount on XOR
        bits = np.unpackbits(sh[:, None].view(np.uint8), axis=1)
        out = []
        for i in range(1, len(ids)):
            d = np.bitwise_xor(bits[:i], bits[i]).sum(axis=1)
            hits = np.nonzero(d <= max_hamming)[0]
            if len(hits):
                j = hits[0]
                out.append({"doc_id": int(ids[i]), "dup_of": int(ids[j]),
                            "hamming": int(d[j])})
        return pd.DataFrame(out) if out else _SIM_EMPTY.copy()

    pairs = (sigs.map_batches(band, batch_format="pyarrow")
             .groupby(["band", "key"]).map_groups(bucket_pairs,
                                                  batch_format="pandas"))

    def dedup_pair(g: pd.DataFrame) -> pd.DataFrame:
        # single best pair: closest counterpart, ties to smallest id
        r = g.sort_values(["hamming", "dup_of"], ascending=[True, True],
                          kind="mergesort").iloc[0]
        return pd.DataFrame([{
            "doc_id": int(r["doc_id"]),
            "dup_of": int(r["dup_of"]),
            "hamming": int(r["hamming"]),
        }])

    return pairs.groupby("doc_id").map_groups(dedup_pair,
                                              batch_format="pandas")


_SIM_EMPTY = pd.DataFrame({
    "doc_id": pd.Series(dtype="int64"),
    "dup_of": pd.Series(dtype="int64"),
    "hamming": pd.Series(dtype="int64"),
})


# --- embedding-cosine near-dup ----------------------------------------
class HyperplaneLSH:
    """Actor-pool stage: embedding → LSH bucket (random hyperplanes)."""

    def __init__(self, dim: int, nbits: int = 12, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.h = rng.standard_normal((nbits, dim)).astype(np.float32)
        self.pows = (1 << np.arange(nbits)).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"vec_id": pa.nulls(0, pa.int64()),
                             "bucket": pa.nulls(0, pa.int64()),
                             "embedding": batch["embedding"]})
        x = np.stack([np.asarray(e, dtype=np.float32)
                      for e in batch["embedding"].to_pylist()])
        norms = np.linalg.norm(x, axis=1, keepdims=True)
        x = x / np.maximum(norms, 1e-12)
        bits = (x @ self.h.T) > 0
        bucket = (bits * self.pows).sum(axis=1)
        return pa.table({
            "vec_id": batch["vec_id"],
            "bucket": pa.array(bucket, pa.int64()),
            "embedding": batch["embedding"],
        })


def embedding_near_dup(ds: rd.Dataset, *, dim: int, nbits: int = 12,
                       seed: int = 42,
                       cos_threshold: float = 0.95) -> rd.Dataset:
    """(vec_id, dup_of, cosine) pairs with cosine ≥ threshold found
    within LSH buckets (approximate at scale; buckets bound the
    quadratic comparison)."""
    bucketed = ds.map_batches(
        HyperplaneLSH, batch_format="pyarrow", concurrency=(1, 8),
        fn_constructor_kwargs={"dim": dim, "nbits": nbits, "seed": seed})

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # full pairwise within the bucket (like the minhash/simhash
        # buckets): anchor-only comparison missed near-dup pairs that
        # didn't involve the bucket's smallest id
        if len(g) < 2:
            return _EMB_EMPTY.copy()
        g = g.sort_values("vec_id", kind="mergesort").head(4096)
        x = np.stack([np.asarray(e, dtype=np.float64) for e in g["embedding"]])
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        sims_m = x @ x.T
        ids = g["vec_id"].to_numpy()
        out = []
        for i in range(1, len(ids)):
            s = sims_m[i, :i]
            hits = np.nonzero(s >= cos_threshold)[0]
            if len(hits):
                j = hits[0]  # earliest qualifying earlier vec
                out.append({"vec_id": int(ids[i]), "dup_of": int(ids[j]),
                            "cosine": round(float(s[j]), 6)})
        return pd.DataFrame(out) if out else _EMB_EMPTY.copy()

    pairs = bucketed.groupby("bucket").map_groups(bucket_pairs,
                                                  batch_format="pandas")

    def dedup_pair(g: pd.DataFrame) -> pd.DataFrame:
        # single best pair: highest cosine, ties to smallest id
        r = g.sort_values(["cosine", "dup_of"], ascending=[False, True],
                          kind="mergesort").iloc[0]
        return pd.DataFrame([{
            "vec_id": int(r["vec_id"]),
            "dup_of": int(r["dup_of"]),
            "cosine": float(r["cosine"]),
        }])

    return pairs.groupby("vec_id").map_groups(dedup_pair,
                                              batch_format="pandas")


_EMB_EMPTY = pd.DataFrame({
    "vec_id": pd.Series(dtype="int64"),
    "dup_of": pd.Series(dtype="int64"),
    "cosine": pd.Series(dtype="float64"),
})
