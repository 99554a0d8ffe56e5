"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard verification, embedding-cosine near-dup.

Shapes (all Ray-Data-first — no driver-side row loops, no per-group
Python frames, no wide columns multiplied through shuffles):
  exact     — per-batch partial dedup → hash-BUCKETED vectorized merge
  minhash   — actor signatures → NARROW band rows (doc_id, band,
              band_hash only; numeric band hash, no 16× signature
              copies) → bucket groupby → candidate pairs →
              distributed signature join → vectorized est-Jaccard
  simhash   — 64-bit simhash → 4×16-bit banded buckets → Hamming ≤ t
  embedding — random-hyperplane LSH buckets → within-bucket cosine
  tails     — best-pair-per-doc selection via bucketed sort +
              drop_duplicates (one vectorized pandas pass per hash
              bucket, never one Python frame per pair)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from .text import md5_hash_batch
from ..util import round_half_away

# Budget for the driver-resident broadcast pair-value join
# (_attach_pair_values_broadcast holds 3 int64 arrays of this length):
# above it the verify stage falls back to the dataset-shaped two-stage
# join instead of growing driver memory with the candidate list.
MAX_BROADCAST_PAIRS = 2_000_000

_NUM_BUCKETS = 64

# Per-worker-process cache for the cheap-state hash stages: Ray reuses
# worker processes across map_batches tasks, so a module global gives
# the same build-once semantics as an actor pool without paying a
# fresh actor process + imports per pool member on short jobs (the
# hash state is two small numpy arrays, not a model).
_STAGE_CACHE: dict = {}


def _cached_stage(key, factory):
    st = _STAGE_CACHE.get(key)
    if st is None:
        if len(_STAGE_CACHE) >= 16:  # bound worker-lifetime growth
            _STAGE_CACHE.pop(next(iter(_STAGE_CACHE)))
        st = _STAGE_CACHE[key] = factory()
    return st


def _bucketed(ds: rd.Dataset, key_cols: list[str], merge,
              num_buckets: int = _NUM_BUCKETS) -> rd.Dataset:
    """Alias for the shared bucketed-vectorized-merge helper
    (util.bucketed_groups) with this module's bucket-count default."""
    from ..util import bucketed_groups
    return bucketed_groups(ds, key_cols, merge, num_buckets=num_buckets)


def _best_pair_per_doc(pairs: rd.Dataset, id_col: str, sort_cols: list[str],
                       ascending: list[bool]) -> rd.Dataset:
    """Keep the single best pair per ``id_col`` (deterministic sort
    order) — bucketed drop_duplicates, vectorized per bucket."""
    def pick(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(sort_cols, ascending=ascending,
                              kind="mergesort")
                .drop_duplicates(id_col).reset_index(drop=True))

    return _bucketed(pairs, [id_col], pick)


# --- exact dedup -------------------------------------------------------
def exact_dedup(ds: rd.Dataset, col: str = "text",
                id_col: str = "doc_id") -> rd.Dataset:
    """(text_hash, canonical_doc_id, dup_count): min id per distinct
    content; partial per batch, merged in a hash-bucketed groupby whose
    per-bucket reduction is ONE vectorized pandas groupby (a per-hash
    map_groups would build one Python frame per distinct hash)."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        t = md5_hash_batch(batch, col)
        df = t.select(["text_hash", id_col]).to_pandas()
        g = df.groupby("text_hash", sort=False)[id_col]
        out = g.agg(canonical_doc_id="min", dup_count="size").reset_index()
        out["canonical_doc_id"] = out["canonical_doc_id"].astype("int64")
        out["dup_count"] = out["dup_count"].astype("int64")
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("text_hash", sort=False)
               .agg(canonical_doc_id=("canonical_doc_id", "min"),
                    dup_count=("dup_count", "sum")).reset_index())
        out["canonical_doc_id"] = out["canonical_doc_id"].astype("int64")
        out["dup_count"] = out["dup_count"].astype("int64")
        return out

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return _bucketed(partials, ["text_hash"], merge)


# --- MinHash + LSH -----------------------------------------------------
_GRAM_SEED = np.uint64(0x9E3779B97F4A7C15)
_GRAM_PRIME = np.uint64(0x100000001B3)


def _batch_token_hashes(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace-split every text and hash ALL tokens of the batch in
    one C-level pass (``pd.util.hash_array``, fixed key → deterministic
    across processes).  Returns (flat uint64 token hashes, int64 token
    counts per text).  This replaces a per-gram ``hashlib.blake2b``
    Python loop — the dominant per-row compute of the minhash/simhash
    stages at scale."""
    toks = [t.split() for t in texts]
    lens = np.fromiter((len(t) for t in toks), dtype=np.int64,
                       count=len(toks))
    flat = np.array([w for t in toks for w in t], dtype=object)
    th = (pd.util.hash_array(flat) if len(flat)
          else np.empty(0, np.uint64))
    return th, lens


def _gram_hashes_from_tokens(th: np.ndarray, lens: np.ndarray,
                             k: int) -> tuple[np.ndarray, np.ndarray]:
    """Word-k-gram hashes for every doc, vectorized: a masked
    multiply-XOR chain over k shifted views of the flat token-hash
    array.  One gram per window; docs shorter than k contribute ONE
    gram chaining their available tokens (matching the classic
    'join all tokens' fallback); empty docs contribute the seed
    sentinel.  Returns (flat gram hashes, int64 gram offsets per doc,
    len = n_docs + 1).  Duplicates are NOT removed — minhash doesn't
    need that; set consumers unique per slice."""
    grams_per_doc = np.maximum(lens - k + 1, 1)
    offsets = np.concatenate(([0], np.cumsum(grams_per_doc)))
    total = int(offsets[-1])
    doc_tok_starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    g_pos = (np.arange(total)
             - np.repeat(offsets[:-1], grams_per_doc))
    tok0 = np.repeat(doc_tok_starts, grams_per_doc) + g_pos
    L_rep = np.repeat(lens, grams_per_doc)
    h = np.full(total, _GRAM_SEED, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            valid = (g_pos + j) < L_rep
            idx = np.where(valid, tok0 + j, 0)
            x = (th[np.minimum(idx, max(len(th) - 1, 0))]
                 if len(th) else np.zeros(total, np.uint64))
            h = np.where(valid, (h ^ x) * _GRAM_PRIME, h)
    return h, offsets


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct (sorted) word-k-gram hashes of one text — the gram-set
    representation shared by the minhash estimate, the exact verify
    and the all-pairs validation ops."""
    th, lens = _batch_token_hashes([text])
    h, _ = _gram_hashes_from_tokens(th, lens, k)
    return np.unique(h)


def _shingle_blobs(texts: list[str], k: int) -> list[bytes]:
    """Per-doc distinct-gram sets as uint64 byte blobs, with the gram
    hashing batched across the whole list (only the small per-slice
    ``np.unique`` remains per doc)."""
    th, lens = _batch_token_hashes(texts)
    grams, offsets = _gram_hashes_from_tokens(th, lens, k)
    return [np.unique(grams[offsets[i]:offsets[i + 1]]).tobytes()
            for i in range(len(texts))]


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
        """Whole-batch signatures with NO per-row Python: one token-hash
        pass, one masked gram chain, then per hash component one
        vectorized multiply-shift + ``np.minimum.reduceat`` segment min
        over doc slices (duplicate grams can't change a min)."""
        if batch.num_rows == 0:
            return pa.table({"doc_id": batch["doc_id"],
                             "sig": pa.array([], pa.list_(pa.uint64()))})
        texts = [t or "" for t in batch["text"].to_pylist()]
        th, lens = _batch_token_hashes(texts)
        grams, offsets = _gram_hashes_from_tokens(th, lens, self.k)
        n = len(texts)
        starts = offsets[:-1]
        sig = np.empty((n, self.num_hashes), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for hcol in range(self.num_hashes):
                vals = self.a[hcol] * grams + self.b[hcol]
                sig[:, hcol] = np.minimum.reduceat(vals, starts)
        arr = pa.ListArray.from_arrays(
            pa.array(np.arange(n + 1, dtype=np.int32) * self.num_hashes),
            pa.array(sig.reshape(-1)))
        return pa.table({"doc_id": batch["doc_id"], "sig": arr})


def _sig_matrix(col) -> np.ndarray:
    """list<uint64> column → (n, num_hashes) uint64 matrix."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
    return flat.reshape(len(arr), -1)


def _band_rows(batch: pa.Table, bands: int, rows: int) -> pa.Table:
    """(doc_id, band, band_hash) — NARROW: the signature itself never
    enters the band shuffle (it used to ride in all 16 band rows →
    16× the stage's widest column).  The per-band hash is a vectorized
    multiply-XOR mix of the band's components; a hash collision merely
    creates one extra candidate pair for the verify stage to reject."""
    if batch.num_rows == 0:
        return pa.table({"doc_id": pa.nulls(0, pa.int64()),
                         "band": pa.nulls(0, pa.int32()),
                         "band_hash": pa.nulls(0, pa.uint64())})
    sig = _sig_matrix(batch["sig"])
    n = sig.shape[0]
    doc = batch["doc_id"].to_numpy(zero_copy_only=False)
    out_doc = np.repeat(doc, bands)
    out_band = np.tile(np.arange(bands, dtype=np.int32), n)
    mix = np.full((n, bands), 0x9E3779B97F4A7C15, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for r in range(rows):
            comp = sig[:, np.arange(bands) * rows + r]
            mix = (mix ^ comp) * np.uint64(0x100000001B3)
    return pa.table({"doc_id": pa.array(out_doc, pa.int64()),
                     "band": pa.array(out_band, pa.int32()),
                     "band_hash": pa.array(mix.reshape(-1), pa.uint64())})


def _attach_pair_values(values: rd.Dataset, pairs: rd.Dataset,
                        pair_fn) -> rd.Dataset:
    """Distributed pair-value join: bring each candidate pair's two
    per-doc values together WITHOUT a driver collect or a per-pair
    groupby.

    ``values``: (doc_id, value); ``pairs``: (doc_id, dup_of).  Two
    bucketed co-group stages, both vectorized per bucket: (1) doc-keyed
    bucket join matches pair endpoints to their values with one pandas
    merge per bucket; (2) pair-keyed bucket align hands ``pair_fn`` the
    bucket's aligned (value_a, value_b) Series to score vectorized."""
    def requests(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["doc_id", "dup_of"])  # batch-local dedup
        a = df.rename(columns={"doc_id": "key"})[["key", "dup_of"]]
        a = a.assign(other=a["dup_of"], side=np.int8(0))
        b = df.rename(columns={"dup_of": "key"})[["key"]]
        b = b.assign(other=df["doc_id"].to_numpy(), side=np.int8(1))
        out = pd.concat([a[["key", "other", "side"]],
                         b[["key", "other", "side"]]], ignore_index=True)
        out["value"] = b""  # schema placeholder; dropped at the join
        return out

    def value_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"key": df["doc_id"].astype("int64"),
                             "other": np.int64(-1),
                             "side": np.int8(-1), "value": df["value"]})

    req = pairs.map_batches(requests, batch_format="pandas")
    vals = values.map_batches(value_rows, batch_format="pandas")
    both = vals.union(req)

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        have = g[g["side"] == -1][["key", "value"]]
        want = g[g["side"] >= 0][["key", "other", "side"]]
        return want.merge(have, on="key", how="inner")

    matched = _bucketed(both, ["key"], join_bucket)

    def pair_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # (key, other, side, value): side 0 rows are (doc_id→value),
        # side 1 rows are (dup_of→value); align on the canonical
        # (doc_id, dup_of) pair key.  drop_duplicates completes the
        # cross-band pair dedup (all copies of a pair share a bucket),
        # replacing a dedicated dedup shuffle stage.
        a = g[g["side"] == 0].rename(columns={"key": "doc_id",
                                              "other": "dup_of"})
        b = g[g["side"] == 1].rename(columns={"other": "doc_id",
                                              "key": "dup_of"})
        a = a.drop_duplicates(["doc_id", "dup_of"])
        b = b.drop_duplicates(["doc_id", "dup_of"])
        m = a.merge(b, on=["doc_id", "dup_of"], suffixes=("_a", "_b"))
        if m.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "dup_of": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        return pd.DataFrame({
            "doc_id": m["doc_id"].astype("int64"),
            "dup_of": m["dup_of"].astype("int64"),
            "score": pair_fn(m["value_a"], m["value_b"]),
        })

    def pair_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_pk"] = (df["key"].where(df["side"] != 1, df["other"]) * 31
                     + df["other"].where(df["side"] != 1, df["key"]))
        return df

    keyed = matched.map_batches(pair_key, batch_format="pandas")
    return _bucketed(keyed, ["_pk"], lambda g: pair_bucket(
        g.drop(columns=["_pk"])))


def _attach_pair_values_broadcast(values: rd.Dataset, pairs: pd.DataFrame,
                                  pair_fn) -> pd.DataFrame:
    """Pair-value join for a DRIVER-RESIDENT candidate list (the verify
    contract: candidates ≪ corpus).  The pair list broadcasts once as
    three sorted int arrays; each values batch replicates its rows to
    the pairs they participate in MAP-SIDE (searchsorted run expansion,
    no Python loop), so ONE pair-bucketed exchange aligns the two sides
    — versus ``_attach_pair_values``'s two exchanges + union for
    dataset-shaped pair inputs.  Returns (doc_id, dup_of, score)."""
    n = len(pairs)
    a = pairs["doc_id"].to_numpy(dtype=np.int64)
    b = pairs["dup_of"].to_numpy(dtype=np.int64)
    endpoint = np.concatenate([a, b])
    pidx = np.concatenate([np.arange(n, dtype=np.int64),
                           np.arange(n, dtype=np.int64)])
    side = np.concatenate([np.zeros(n, np.int8), np.ones(n, np.int8)])
    order = np.argsort(endpoint, kind="stable")
    ref = ray.put((endpoint[order], pidx[order], side[order]))

    _E = pd.DataFrame({"pair": pd.Series(dtype="int64"),
                       "side": pd.Series(dtype="int8"),
                       "value": pd.Series(dtype=object)})

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _E.copy()
        d, p, s = ray.get(ref)
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        lo = np.searchsorted(d, ids, "left")
        cnt = np.searchsorted(d, ids, "right") - lo
        total = int(cnt.sum())
        if total == 0:
            return _E.copy()
        rows = np.repeat(np.arange(len(df)), cnt)
        within = (np.arange(total)
                  - np.repeat(np.concatenate(([0], np.cumsum(cnt)))[:-1],
                              cnt))
        pos = np.repeat(lo, cnt) + within
        return pd.DataFrame({"pair": p[pos], "side": s[pos],
                             "value": df["value"].to_numpy()[rows]})

    emitted = values.map_batches(emit, batch_format="pandas")

    def score_bucket(g: pd.DataFrame) -> pd.DataFrame:
        va = g[g["side"] == 0][["pair", "value"]]
        vb = g[g["side"] == 1][["pair", "value"]]
        m = va.merge(vb, on="pair", suffixes=("_a", "_b"))
        if m.empty:
            return pd.DataFrame({"pair": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        return pd.DataFrame({"pair": m["pair"].astype("int64"),
                             "score": pair_fn(m["value_a"],
                                              m["value_b"])})

    scored = _bucketed(emitted, ["pair"], score_bucket).to_pandas()
    if scored.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "dup_of": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64")})
    pr = scored["pair"].to_numpy(dtype=np.int64)
    return pd.DataFrame({"doc_id": a[pr], "dup_of": b[pr],
                         "score": scored["score"].to_numpy()})


def _est_jaccard(va: pd.Series, vb: pd.Series) -> np.ndarray:
    A = np.stack([np.frombuffer(v, dtype=np.uint64) for v in va])
    B = np.stack([np.frombuffer(v, dtype=np.uint64) for v in vb])
    return (A == B).mean(axis=1)


def minhash_lsh_candidates(ds: rd.Dataset, *, num_hashes: int = 64,
                           bands: int = 16, shingle_k: int = 3,
                           seed: int = 42, est_threshold: float = 0.5,
                           max_earlier: int = 8,
                           best_pair_only: bool = True) -> rd.Dataset:
    """Candidate near-dup pairs: (doc_id, dup_of, est_jaccard), doc_id >
    dup_of, est_jaccard = fraction of equal signature components ≥
    threshold.

    Scale shape: band rows are narrow (no signature copies); each
    bucket pairs a doc with its ``max_earlier`` EARLIEST co-bucketed
    predecessors (bounded fan-out per doc per band); the signature
    estimate is computed by a distributed pair join (two narrow
    bucketed shuffles), then thresholded, then (by default) one best
    pair per doc is kept; ``best_pair_only=False`` keeps every
    thresholded pair (the exact-verify/clustering consumers need the
    whole candidate graph, not a per-doc argmax).  A true near-dup
    that shares a band bucket with > max_earlier unrelated
    predecessors can be missed — the recall/cost knob."""
    if num_hashes % bands:
        raise ValueError(
            f"bands={bands} must divide num_hashes={num_hashes} "
            "(trailing signature components would be silently unused)")
    rows = num_hashes // bands

    import functools

    def minhash_task(batch, *, num_hashes, shingle_k, seed):
        return _cached_stage(("minhash", num_hashes, shingle_k, seed),
                             lambda: MinHasher(num_hashes, shingle_k,
                                               seed))(batch)

    # materialized: both the band stage and the signature-value join
    # consume sigs — without this the shingle+64-hash stage (the
    # pipeline's most expensive map) and the upstream read would
    # execute twice, once per lazy branch.  The table is narrow
    # (doc_id + 64×uint64), bounded object-store cost.
    sigs = ds.map_batches(
        functools.partial(minhash_task, num_hashes=num_hashes,
                          shingle_k=shingle_k, seed=seed),
        batch_format="pyarrow").materialize()
    banded = sigs.map_batches(lambda b: _band_rows(b, bands, rows),
                              batch_format="pyarrow")

    import functools as _ft

    # cross-band duplicates survive into the pair join, which dedups
    # them inside its pair-keyed buckets — no dedicated dedup shuffle
    pairs = _bucketed(banded, ["band", "band_hash"],
                      _ft.partial(_bucket_pairs_bulk,
                                  max_earlier=max_earlier))

    sig_vals = sigs.map_batches(
        lambda df: pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "value": [np.asarray(s, dtype=np.uint64).tobytes()
                      for s in df["sig"]]}),
        batch_format="pandas")
    scored = _attach_pair_values(sig_vals, pairs, _est_jaccard)

    def threshold(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["score"] >= est_threshold].copy()
        df["est_jaccard"] = np.round(df.pop("score").to_numpy(), 6)
        return df

    kept = scored.map_batches(threshold, batch_format="pandas")
    if not best_pair_only:
        return kept
    return _best_pair_per_doc(kept, "doc_id", ["est_jaccard", "dup_of"],
                              [False, True])


def minhash_sig_fixture_path(sf_dir: str) -> str:
    """Per-``sf_dir`` signature-fixture path (same convention as
    ``sources.tokenized.flagship_oracle_path``: a pure function of the
    input directory so the driver's sf0.001 entry() run can't clobber
    the sf0.01 oracle battery's instance)."""
    import os
    import re

    slug = re.sub(r"[^A-Za-z0-9._-]+", "_",
                  os.path.abspath(sf_dir)).strip("_")
    return f"/tmp/mlp_minhash_sigs_{slug}.parquet"


def ensure_minhash_sig_fixture(sf_dir: str, *, num_hashes: int = 64,
                               shingle_k: int = 3, seed: int = 42) -> str:
    """Idempotently persist the exploded per-doc MinHash signatures
    ``(doc_id, comp, val)`` for ``sf_dir``'s documents, computed via the
    SCALAR reference path (``MinHasher.signature`` — per-text
    ``np.unique`` + H×S matrix min), NOT the batched ``reduceat``
    pipeline path.  The SQL oracle for ``doc_minhash_candidates``
    replays banding (FNV fold in HUGEINT modular arithmetic), bucket
    pairing, the signature-equality estimate, thresholding and the
    best-pair argmax from this table — so a divergence in EITHER the
    batched signature kernel or any distributed stage breaks the
    equality.  Validation-scale only (one driver pass over the corpus);
    the production pipeline never reads it."""
    import os

    import pyarrow.parquet as _pq

    from ..util import fixture_key_matches, write_fixture_atomic

    path = minhash_sig_fixture_path(sf_dir)
    key = (f"{os.path.abspath(sf_dir)}|h={num_hashes}|k={shingle_k}"
           f"|seed={seed}|v1")
    if fixture_key_matches(path, key):
        return path
    tbl = _pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    hasher = MinHasher(num_hashes, shingle_k, seed)
    ids = tbl["doc_id"].to_pylist()
    sigs = np.stack([hasher.signature(t or "")
                     for t in tbl["text"].to_pylist()])
    n = len(ids)
    out = pa.table({
        "doc_id": pa.array(np.repeat(np.asarray(ids, np.int64),
                                     num_hashes)),
        "comp": pa.array(np.tile(np.arange(num_hashes, dtype=np.int32),
                                 n)),
        "val": pa.array(sigs.reshape(-1), pa.uint64()),
    })
    return write_fixture_atomic(path, out, key)


def simhash_fixture_path(sf_dir: str) -> str:
    """Per-``sf_dir`` simhash-fixture path (the shared
    ``util.fixture_path`` convention)."""
    from ..util import fixture_path

    return fixture_path("simhash", sf_dir)


def ensure_simhash_fixture(sf_dir: str) -> str:
    """Idempotently persist ``(doc_id, simhash)`` for ``sf_dir``'s
    documents, computed one text at a time via the scalar
    ``SimHasher.simhash`` reference path on the driver.  The SQL oracle
    for ``doc_simhash_dedup`` replays the 4×16-bit banding, the
    first-earlier-match-per-band pairing, the Hamming ≤ 3 verify and
    the best-pair argmax from this table — pinning every distributed
    stage of ``simhash_candidates``.  Validation-scale only."""
    import os

    import pyarrow.parquet as _pq

    from ..util import ensure_fixture

    def build() -> pa.Table:
        tbl = _pq.read_table(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"])
        h = SimHasher()
        sigs = [h.simhash(t or "") for t in tbl["text"].to_pylist()]
        return pa.table({"doc_id": tbl["doc_id"],
                         "simhash": pa.array(sigs, pa.uint64())})

    return ensure_fixture(simhash_fixture_path(sf_dir),
                          f"{os.path.abspath(sf_dir)}|v1", build)


def ensure_hplsh_fixture(sf_dir: str) -> str:
    """Idempotently persist ``(vec_id, bucket)`` rows for ``sf_dir``'s
    embeddings, computed scalar-path with the SAME ``HyperplaneLSH``
    stage (``embedding_near_dup`` defaults: nbits 12, seed 42, 4
    tables).  The SQL oracle for ``emb_near_dup`` replays the bucket
    pairing (first earlier qualifying vec per bucket, position cap
    4096), the cosine ≥ 0.95 verify via ``list_cosine_similarity`` and
    the best-pair argmax from this table — pinning every distributed
    stage.  Validation-scale only."""
    import os

    import pyarrow.parquet as _pq

    from ..util import ensure_fixture, fixture_path

    path = fixture_path("hplsh", sf_dir)

    def build() -> pa.Table:
        tbl = _pq.read_table(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        dim = len(tbl["embedding"][0])
        h = HyperplaneLSH(dim)
        out = h(tbl)
        return out.select(["vec_id", "bucket"])

    return ensure_fixture(path, f"{os.path.abspath(sf_dir)}|v1", build)


def ensure_semantic_fixture(sf_dir: str) -> str:
    """Idempotently persist ``(vec_id, cluster, nv)`` for ``sf_dir``'s
    embeddings — the k-means cluster assignment and the float32
    normalized vector exactly as ``semantic_dedup``'s assign stage
    ships them — computed scalar-path (``ann.scalar_train_centroids``
    mirrors the distributed Lloyd rounds; sum-order float drift only
    matters for vectors within ~1e-14 of an argmax boundary).  The SQL
    oracle replays the within-cluster pairing, the unrounded ≥ 0.95
    dot-product threshold and the earliest-dup_of pick from this
    table.  Validation-scale only."""
    import os

    import pyarrow.parquet as _pq

    from .ann import _normalize, scalar_train_centroids
    from ..util import ensure_fixture, fixture_path

    path = fixture_path("semantic", sf_dir)

    def build() -> pa.Table:
        tbl = _pq.read_table(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        emb = np.stack([np.asarray(e, dtype=np.float64)
                        for e in tbl["embedding"].to_pylist()])
        cent = scalar_train_centroids(emb, 16)
        x = _normalize(emb)
        a = (x @ cent.T).argmax(axis=1)
        return pa.table({
            "vec_id": tbl["vec_id"],
            "cluster": pa.array(a.astype(np.int64)),
            "nv": pa.array(list(x.astype(np.float32)),
                           pa.list_(pa.float32()))})

    return ensure_fixture(path, f"{os.path.abspath(sf_dir)}|v1", build)


def minhash_verified_pairs(docs_ds: rd.Dataset, *, shingle_k: int = 3,
                           threshold: float = 0.5, num_hashes: int = 64,
                           bands: int = 16, seed: int = 42,
                           max_earlier: int = 8) -> pd.DataFrame:
    """Near-dup pairs the production way — banded-LSH candidate graph
    (no all-pairs scan) — with every candidate VERIFIED by exact
    word-``k``-gram Jaccard ≥ ``threshold``: (doc_id, dup_of, jaccard),
    doc_id > dup_of.

    The output is a pure function of the corpus once LSH recall is
    complete at ``threshold`` (deterministic seed, no estimate
    thresholding, no best-pair argmax), which makes it checkable
    against the exact all-pairs SQL oracle at validation scale while
    keeping the candidate stage's at-scale shape.

    The signature-estimate pair join is SKIPPED here — every candidate
    goes straight to the exact verify, whose own pair join dedups the
    cross-band copies; routing through minhash_lsh_candidates' est
    scoring added two bucketed exchanges just to discard the scores."""
    import functools

    def minhash_task(batch, *, num_hashes, shingle_k, seed):
        return _cached_stage(("minhash", num_hashes, shingle_k, seed),
                             lambda: MinHasher(num_hashes, shingle_k,
                                               seed))(batch)

    rows = num_hashes // bands
    sigs = docs_ds.map_batches(
        functools.partial(minhash_task, num_hashes=num_hashes,
                          shingle_k=shingle_k, seed=seed),
        batch_format="pyarrow")
    banded = sigs.map_batches(lambda b: _band_rows(b, bands, rows),
                              batch_format="pyarrow")
    cand = _bucketed(banded, ["band", "band_hash"],
                     functools.partial(_bucket_pairs_bulk,
                                       max_earlier=max_earlier)).to_pandas()
    cand = cand.drop_duplicates(["doc_id", "dup_of"])
    return ngram_jaccard_verify(docs_ds, cand,
                                shingle_k=shingle_k, threshold=threshold)


_PAIRS_NOEST_EMPTY = pd.DataFrame({
    "doc_id": pd.Series(dtype="int64"),
    "dup_of": pd.Series(dtype="int64"),
})


def _bucket_pairs_bulk(g: pd.DataFrame, *,
                       max_earlier: int) -> pd.DataFrame:
    """ALL (band, band_hash) groups of one hash bucket → candidate
    pairs, fully vectorized with segment arithmetic.  A per-group
    ``map_groups`` here built one Python frame per band bucket —
    bands × docs of them (~80k at 5k docs) through the sort
    shuffle; this pass is one numpy pipeline per bucket."""
    if len(g) < 2:
        return _PAIRS_NOEST_EMPTY.copy()
    key = (g["band_hash"].to_numpy(dtype=np.uint64)
           ^ (g["band"].to_numpy().astype(np.uint64) << np.uint64(56)))
    ids = g["doc_id"].to_numpy(dtype=np.int64)
    order = np.lexsort((ids, key))
    key, ids = key[order], ids[order]
    seg_starts = np.flatnonzero(
        np.concatenate(([True], key[1:] != key[:-1])))
    counts = np.diff(np.append(seg_starts, len(key)))
    offsets_rep = np.repeat(seg_starts, counts)
    pos_in_seg = np.arange(len(key)) - offsets_rep
    out_doc, out_dup = [], []
    for j in range(max_earlier):
        # pair every member past position j (capped) with the
        # j-th earliest member of its band bucket
        m = (pos_in_seg > j) & (pos_in_seg < 4096)
        if not m.any():
            break
        out_doc.append(ids[m])
        out_dup.append(ids[offsets_rep[m] + j])
    if not out_doc:
        return _PAIRS_NOEST_EMPTY.copy()
    return pd.DataFrame({"doc_id": np.concatenate(out_doc),
                         "dup_of": np.concatenate(out_dup)})

def ngram_jaccard_verify(docs_ds: rd.Dataset, candidates: pd.DataFrame,
                         shingle_k: int = 3,
                         threshold: float = 0.5) -> pd.DataFrame:
    """Exact n-gram Jaccard for candidate pairs — DISTRIBUTED: shingle
    sets are computed inside map_batches for pair endpoints only (the
    candidate id set is broadcast via ray.put; ids are narrow even when
    blobs are not), replicated to their pairs map-side from the
    broadcast pair index, and scored after ONE pair-bucketed exchange
    (``_attach_pair_values_broadcast``).  Only the verified output
    (small) reaches the driver — no take_all of shingle blobs."""
    if candidates.empty:
        return candidates.assign(jaccard=pd.Series(dtype="float64"))
    needed = np.unique(np.concatenate([
        candidates["doc_id"].to_numpy(dtype=np.int64),
        candidates["dup_of"].to_numpy(dtype=np.int64)]))
    needed_ref = ray.put(needed)

    def shingles(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        mask = np.isin(ids, ray.get(needed_ref))
        keep = np.nonzero(mask)[0]
        texts = batch["text"].take(pa.array(keep)).to_pylist()
        return pd.DataFrame({
            "doc_id": ids[keep].astype("int64"),
            "value": _shingle_blobs([t or "" for t in texts], shingle_k),
        })

    def exact_jaccard(va: pd.Series, vb: pd.Series) -> np.ndarray:
        out = np.empty(len(va), dtype=np.float64)
        for i, (ba, bb) in enumerate(zip(va.to_numpy(), vb.to_numpy())):
            a = np.frombuffer(ba, dtype=np.uint64)
            b = np.frombuffer(bb, dtype=np.uint64)
            if len(a) == 0 and len(b) == 0:
                out[i] = 0.0
                continue
            inter = np.intersect1d(a, b, assume_unique=True).size
            union = a.size + b.size - inter
            # half-away rounding (DuckDB round()), not Python banker's:
            # a ratio exact at the 7th decimal (e.g. 1/128) would
            # otherwise round differently from the SQL oracle
            out[i] = (float(round_half_away(inter / union, 6))
                      if union else 0.0)
        return out

    sh = docs_ds.map_batches(shingles, batch_format="pyarrow")
    pairs = (candidates[["doc_id", "dup_of"]]
             .drop_duplicates().reset_index(drop=True))
    if len(pairs) > MAX_BROADCAST_PAIRS:
        # the broadcast join holds the pair list driver-resident —
        # past this budget fall back to the dataset-shaped two-stage
        # join so a pathological candidate blow-up cannot OOM the
        # driver (the verify contract is candidates ≪ corpus, but the
        # guard makes the 100 TB path fail soft, not fatal)
        scored = _attach_pair_values(
            sh, rd.from_pandas(pairs), exact_jaccard).to_pandas()
    else:
        scored = _attach_pair_values_broadcast(sh, pairs, exact_jaccard)
    if scored.empty:
        return (candidates.assign(jaccard=0.0)
                .iloc[0:0].reset_index(drop=True))
    scored = scored.rename(columns={"score": "jaccard"})
    out = candidates.merge(scored, on=["doc_id", "dup_of"], how="left")
    out["jaccard"] = out["jaccard"].fillna(0.0)
    return out[out["jaccard"] >= threshold].reset_index(drop=True)


# --- SimHash -----------------------------------------------------------
class SimHasher:
    """Actor-pool stage: text → 64-bit simhash over whitespace tokens."""

    def __init__(self):
        pass

    def simhash(self, text: str) -> int:
        return int(self._batch([text])[0])

    @staticmethod
    def _batch(texts: list[str]) -> np.ndarray:
        """Whole-batch 64-bit simhash, no per-row Python: ONE token-hash
        pass over the batch, per-doc bit votes via
        ``np.add.reduceat`` over doc slices.  Bit b is set when more
        than half the doc's tokens have bit b set (strict majority —
        votes = 2·ones − n > 0).  Empty docs hash to 0."""
        th, lens = _batch_token_hashes(texts)
        out = np.zeros(len(texts), dtype=np.uint64)
        nz = lens > 0
        if not nz.any():
            return out
        # int32: reduceat keeps its input dtype, and uint8 bit sums
        # would wrap past 255 tokens per doc
        bits = (np.unpackbits(th.view(np.uint8))
                .reshape(len(th), 64).astype(np.int32))
        starts = (np.concatenate(([0], np.cumsum(lens)))[:-1])[nz]
        ones = np.add.reduceat(bits, starts, axis=0)
        mask = (ones * 2 > lens[nz, None]).astype(np.uint8)
        packed = np.packbits(mask, axis=1)
        out[nz] = packed.view(">u8").reshape(-1)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch["text"].to_pylist()]
        return pa.table({"doc_id": batch["doc_id"],
                         "simhash": pa.array(self._batch(texts),
                                             pa.uint64())})


def simhash_candidates(ds: rd.Dataset, *, max_hamming: int = 3) -> rd.Dataset:
    """Near-dup pairs by simhash Hamming distance ≤ t, banded into 4
    16-bit tables (a pair within distance 3 must agree on ≥1 band).
    The simhash itself (one uint64) rides into the buckets — narrow by
    construction; the best-pair tail is a bucketed vectorized pass."""
    if max_hamming > 3:
        raise ValueError(
            "4-band/16-bit simhash LSH only guarantees recall for "
            f"max_hamming <= 3 (got {max_hamming}); raise the band "
            "count for larger radii")
    sigs = ds.map_batches(
        lambda b: _cached_stage(("simhash",), SimHasher)(b),
        batch_format="pyarrow")

    def band(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"doc_id": pa.nulls(0, pa.int64()),
                             "band": pa.nulls(0, pa.int32()),
                             "key": pa.nulls(0, pa.int32()),
                             "simhash": pa.nulls(0, pa.uint64())})
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        sh = (batch["simhash"].combine_chunks()
              if isinstance(batch["simhash"], pa.ChunkedArray)
              else batch["simhash"]).to_numpy(zero_copy_only=False)
        sh = sh.astype(np.uint64)
        n = len(ids)
        bands_ix = np.arange(4, dtype=np.uint64)
        keys = ((sh[:, None] >> (16 * bands_ix)[None, :])
                & np.uint64(0xFFFF)).astype(np.int32)
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, 4), pa.int64()),
            "band": pa.array(np.tile(np.arange(4, dtype=np.int32), n)),
            "key": pa.array(keys.reshape(-1), pa.int32()),
            "simhash": pa.array(np.repeat(sh, 4), pa.uint64()),
        })

    def one_bucket(ids: np.ndarray, sh: np.ndarray, out: list) -> None:
        # vectorized pairwise Hamming via popcount on XOR
        bits = np.unpackbits(sh[:, None].view(np.uint8), axis=1)
        for i in range(1, len(ids)):
            d = np.bitwise_xor(bits[:i], bits[i]).sum(axis=1)
            hits = np.nonzero(d <= max_hamming)[0]
            if len(hits):
                j = hits[0]
                out.append((int(ids[i]), int(ids[j]), int(d[j])))

    def bucket_pairs_bulk(g: pd.DataFrame) -> pd.DataFrame:
        """All (band, key) groups of one hash bucket in one call — the
        per-group Ray map_groups built one Python frame per 16-bit
        band bucket (4×docs of them) through the sort shuffle."""
        if len(g) < 2:
            return _SIM_EMPTY.copy()
        g = g.sort_values(["band", "key", "doc_id"], kind="mergesort")
        codes = (g["band"].to_numpy().astype(np.int64) << 17) \
            | g["key"].to_numpy().astype(np.int64)
        ids = g["doc_id"].to_numpy(dtype=np.int64)
        sh = g["simhash"].to_numpy(dtype=np.uint64)
        seg = np.flatnonzero(np.concatenate(([True],
                                             codes[1:] != codes[:-1])))
        bounds = np.append(seg, len(codes))
        out: list = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s >= 2:
                one_bucket(ids[s:e][:4096], sh[s:e][:4096], out)
        if not out:
            return _SIM_EMPTY.copy()
        return pd.DataFrame(out, columns=["doc_id", "dup_of", "hamming"])

    pairs = _bucketed(sigs.map_batches(band, batch_format="pyarrow"),
                      ["band", "key"], bucket_pairs_bulk)
    return _best_pair_per_doc(pairs, "doc_id", ["hamming", "dup_of"],
                              [True, True])


_SIM_EMPTY = pd.DataFrame({
    "doc_id": pd.Series(dtype="int64"),
    "dup_of": pd.Series(dtype="int64"),
    "hamming": pd.Series(dtype="int64"),
})


# --- embedding-cosine near-dup ----------------------------------------
class HyperplaneLSH:
    """Actor-pool stage: embedding → LSH buckets over ``n_tables``
    INDEPENDENT hyperplane tables.  Single-table sign-LSH recall decays
    as (1 - θ/π)^nbits (~0.7 at cos 0.99, nbits 8); a near-dup pair is
    a candidate if it collides in ANY table, so recall is
    1 - (1 - p)^L.  Cost: the embedding rides into L buckets — the
    explicit recall/shuffle-volume knob."""

    def __init__(self, dim: int, nbits: int = 12, seed: int = 42,
                 n_tables: int = 4):
        rng = np.random.default_rng(seed)
        self.h = rng.standard_normal((n_tables, nbits, dim)).astype(np.float32)
        self.pows = (1 << np.arange(nbits)).astype(np.int64)
        self.nbits = nbits
        self.n_tables = n_tables

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"vec_id": pa.nulls(0, pa.int64()),
                             "bucket": pa.nulls(0, pa.int64()),
                             "embedding": batch["embedding"]})
        from .ann import _stack
        x = _stack(batch["embedding"]).astype(np.float32)
        norms = np.linalg.norm(x, axis=1, keepdims=True)
        x = x / np.maximum(norms, 1e-12)
        n = x.shape[0]
        buckets = np.empty((n, self.n_tables), dtype=np.int64)
        for t in range(self.n_tables):
            bits = (x @ self.h[t].T) > 0
            buckets[:, t] = ((bits * self.pows).sum(axis=1)
                             | (np.int64(t) << self.nbits))
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        emb = (batch["embedding"].combine_chunks()
               if isinstance(batch["embedding"], pa.ChunkedArray)
               else batch["embedding"])
        rep = pa.array(np.repeat(np.arange(n), self.n_tables))
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, self.n_tables), pa.int64()),
            "bucket": pa.array(buckets.reshape(-1), pa.int64()),
            "embedding": emb.take(rep),
        })


def embedding_near_dup(ds: rd.Dataset, *, dim: int, nbits: int = 12,
                       seed: int = 42, n_tables: int = 4,
                       cos_threshold: float = 0.95) -> rd.Dataset:
    """(vec_id, dup_of, cosine) pairs with cosine ≥ threshold found
    within multi-table LSH buckets (approximate at scale; buckets bound
    the quadratic comparison; duplicate hits across tables collapse in
    the best-pair tail)."""
    import functools

    def lsh_task(batch, *, dim, nbits, seed, n_tables):
        return _cached_stage(("hplsh", dim, nbits, seed, n_tables),
                             lambda: HyperplaneLSH(dim, nbits, seed,
                                                   n_tables))(batch)

    bucketed = ds.map_batches(
        functools.partial(lsh_task, dim=dim, nbits=nbits, seed=seed,
                          n_tables=n_tables),
        batch_format="pyarrow")

    def one_bucket(ids: np.ndarray, emb: list, out: list) -> None:
        # full pairwise within the LSH bucket (anchor-only comparison
        # missed near-dup pairs not involving the smallest id)
        x = np.stack([np.asarray(e, dtype=np.float64) for e in emb])
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        sims_m = x @ x.T
        for i in range(1, len(ids)):
            s = sims_m[i, :i]
            hits = np.nonzero(s >= cos_threshold)[0]
            if len(hits):
                j = hits[0]  # earliest qualifying earlier vec
                # half-away rounding (DuckDB round()) so the SQL
                # bucket-replay oracle orders best pairs identically
                out.append((int(ids[i]), int(ids[j]),
                            float(round_half_away(s[j], 6))))

    def bucket_pairs_bulk(g: pd.DataFrame) -> pd.DataFrame:
        """All LSH buckets of one hash bucket in one call (the
        per-bucket map_groups built up to tables×2^nbits Python
        frames through the sort shuffle)."""
        if len(g) < 2:
            return _EMB_EMPTY.copy()
        g = g.sort_values(["bucket", "vec_id"], kind="mergesort")
        codes = g["bucket"].to_numpy(dtype=np.int64)
        ids = g["vec_id"].to_numpy(dtype=np.int64)
        emb = g["embedding"].to_numpy()
        seg = np.flatnonzero(np.concatenate(([True],
                                             codes[1:] != codes[:-1])))
        bounds = np.append(seg, len(codes))
        out: list = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s >= 2:
                one_bucket(ids[s:e][:4096], emb[s:e][:4096], out)
        if not out:
            return _EMB_EMPTY.copy()
        return pd.DataFrame(out, columns=["vec_id", "dup_of", "cosine"])

    pairs = _bucketed(bucketed, ["bucket"], bucket_pairs_bulk)
    return _best_pair_per_doc(pairs, "vec_id", ["cosine", "dup_of"],
                              [False, True])


_EMB_EMPTY = pd.DataFrame({
    "vec_id": pd.Series(dtype="int64"),
    "dup_of": pd.Series(dtype="int64"),
    "cosine": pd.Series(dtype="float64"),
})


# --- exact all-pairs variants (oracle-grade validation ops) ------------
# The LSH family above is the scale path; these compute the EXACT
# quadratic answer for validation-scale corpora (and the driver's
# DuckDB oracle computes the same thing from list_intersect /
# list_cosine_similarity).  Broadcast-once + per-batch comparison, the
# ann.brute_force_topk pattern.
def exact_jaccard_pairs(docs_ds: rd.Dataset, *, shingle_k: int = 3,
                        threshold: float = 0.1,
                        max_side: int = 200_000) -> rd.Dataset:
    """All doc pairs with word-``k``-gram Jaccard ≥ threshold —
    EXACT and quadratic by definition (every pair is examined once).
    The distinct-gram sets (same ``_shingle_hashes`` scheme the LSH
    scale path uses) are computed ONCE, broadcast via ray.put, and the
    compare pass maps over doc ids only — no recomputation, no second
    full read of the text column."""
    side = docs_ds.map_batches(
        lambda b: pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "blob": _shingle_blobs([t or "" for t in b["text"].to_pylist()],
                                   shingle_k)}),
        batch_format="pyarrow").to_pandas()
    if len(side) > max_side:
        raise ValueError(
            f"exact_jaccard_pairs examines every pair (O(n^2)) and "
            f"broadcasts all gram sets — {len(side)} docs exceeds "
            f"max_side={max_side}. Use minhash_lsh_candidates + "
            "ngram_jaccard_verify at corpus scale; this op is the "
            "oracle-grade validation variant.")
    ids = side["doc_id"].to_numpy()
    order = np.argsort(ids)
    ref = ray.put((ids[order],
                   [np.frombuffer(b, dtype=np.uint64)
                    for b in side["blob"].to_numpy()[order]]))

    _EMPTY = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                           "dup_of": pd.Series(dtype="int64"),
                           "jaccard": pd.Series(dtype="float64")})
    if side.empty:
        return rd.from_pandas(_EMPTY)

    def compare(batch: pa.Table) -> pd.DataFrame:
        if batch.num_rows == 0:
            return _EMPTY.copy()
        all_ids, all_sets = ray.get(ref)
        out = []
        for did in batch["doc_id"].to_pylist():
            hi = int(np.searchsorted(all_ids, did))
            if hi >= len(all_ids) or all_ids[hi] != did:
                continue  # id absent from the side pass: skip, never
                #           compare with another doc's gram set
            mine = all_sets[hi]  # own set from the broadcast side
            for j in range(hi):
                other = all_sets[j]
                inter = np.intersect1d(mine, other,
                                       assume_unique=True).size
                union = mine.size + other.size - inter
                jac = (float(round_half_away(inter / union, 6))
                       if union else 0.0)
                if jac >= threshold:
                    out.append((int(did), int(all_ids[j]), jac))
        if not out:
            return _EMPTY.copy()
        return pd.DataFrame(out, columns=["doc_id", "dup_of", "jaccard"])

    # narrow second pass: select_columns is visible to the planner, so
    # the projection pushes into the read (a lambda map would re-read
    # the text column just to drop it)
    return (docs_ds.select_columns(["doc_id"])
            .map_batches(compare, batch_format="pyarrow"))


def exact_cosine_pairs(ds: rd.Dataset, *, threshold: float = 0.4,
                       max_side: int = 200_000) -> rd.Dataset:
    """All embedding pairs with cosine ≥ threshold — exact quadratic
    validation op (normalized matrix broadcast once; the compare pass
    maps over vec ids only and reads each row's vector from the
    broadcast)."""
    side = ds.map_batches(
        lambda b: pd.DataFrame({
            "vec_id": b["vec_id"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "emb": [np.asarray(e, dtype=np.float64)
                    for e in b["embedding"].to_pylist()]}),
        batch_format="pyarrow").to_pandas()
    _EMPTY = pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                           "dup_of": pd.Series(dtype="int64"),
                           "cosine": pd.Series(dtype="float64")})
    if side.empty:
        return rd.from_pandas(_EMPTY)
    if len(side) > max_side:
        raise ValueError(
            f"exact_cosine_pairs examines every pair (O(n^2)) and "
            f"broadcasts the full matrix — {len(side)} vectors exceeds "
            f"max_side={max_side}. Use embedding_near_dup (multi-table "
            "LSH) at corpus scale; this op is the oracle-grade "
            "validation variant.")
    ids = side["vec_id"].to_numpy()
    order = np.argsort(ids)
    mat = np.stack(side["emb"].to_numpy()[order])
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True),
                           1e-12)
    ref = ray.put((ids[order], mat))

    def compare(batch: pa.Table) -> pd.DataFrame:
        if batch.num_rows == 0:
            return _EMPTY.copy()
        all_ids, all_mat = ray.get(ref)
        bids = batch["vec_id"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(all_ids, bids)
        # ids absent from the side pass must not alias another row
        valid = (pos < len(all_ids)) & (all_ids[np.minimum(
            pos, len(all_ids) - 1)] == bids)
        bids, pos = bids[valid], pos[valid]
        if not len(bids):
            return _EMPTY.copy()
        sims = all_mat[pos] @ all_mat.T
        out = []
        for r, did in enumerate(bids):
            hi = int(pos[r])
            s = round_half_away(sims[r, :hi], 6)
            hits = np.flatnonzero(s >= threshold)
            out += [(int(did), int(all_ids[j]), float(s[j]))
                    for j in hits]
        if not out:
            return _EMPTY.copy()
        return pd.DataFrame(out, columns=["vec_id", "dup_of", "cosine"])

    return (ds.select_columns(["vec_id"])
            .map_batches(compare, batch_format="pyarrow"))


def semantic_dedup(emb_ds, *, n_clusters: int = 16,
                   cos_threshold: float = 0.95,
                   id_col: str = "vec_id") -> pd.DataFrame:
    """SemDeDup (Abbas et al. 2023)-style cluster-partitioned semantic
    dedup: k-means partitions the embedding space (the existing
    deterministic ``ann.train_centroids``), every vector routes to its
    nearest centroid, and duplicate candidates are resolved by exact
    pairwise cosine WITHIN each cluster — one cluster-bucketed
    exchange whose per-bucket work is |cluster|², never |corpus|².
    Returns (vec_id, dup_of, cos) with dup_of = the earliest in-cluster
    vector above threshold.  Near-pairs straddling a cluster boundary
    are the method's documented recall loss (the LSH sibling
    ``embedding_near_dup`` covers them)."""
    import ray

    from ..ops.ann import _normalize, _stack, train_centroids
    from ..util import bucketed_groups

    cent = train_centroids(emb_ds, n_clusters)
    c_ref = ray.put(cent)

    def assign(t: pa.Table) -> pd.DataFrame:
        c = ray.get(c_ref)
        x = _normalize(_stack(t.combine_chunks()["embedding"]))
        a = (x @ c.T).argmax(axis=1)
        return pd.DataFrame({
            "cluster": a.astype(np.int64),
            id_col: t[id_col].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "v": [row.astype(np.float32).tobytes() for row in x]})

    def in_cluster_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, grp in g.groupby("cluster", sort=False):
            if len(grp) < 2:
                continue
            grp = grp.sort_values(id_col, kind="mergesort")
            ids = grp[id_col].to_numpy()
            X = np.stack([np.frombuffer(b, dtype=np.float32)
                          for b in grp["v"]]).astype(np.float64)
            sims = X @ X.T
            ii, jj = np.nonzero(np.triu(sims >= cos_threshold, k=1))
            if len(ii) == 0:
                continue
            # threshold on the UNROUNDED similarity, emit half-away
            # 6-decimal values so the cluster-replay SQL oracle hashes
            # identically (DuckDB round() is half-away)
            d = pd.DataFrame({id_col: ids[jj], "dup_of": ids[ii],
                              "cos": round_half_away(sims[ii, jj], 6)})
            # earliest dup_of per id inside the cluster
            d = (d.sort_values([id_col, "dup_of"], kind="mergesort")
                 .drop_duplicates([id_col], keep="first"))
            out.append(d)
        if not out:
            return pd.DataFrame({id_col: pd.array([], dtype="int64"),
                                 "dup_of": pd.array([], dtype="int64"),
                                 "cos": pd.array([], dtype="float64")})
        return pd.concat(out, ignore_index=True)

    cand = bucketed_groups(
        emb_ds.map_batches(assign, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["cluster"], in_cluster_pairs).to_pandas()
    if cand.empty:
        return pd.DataFrame({id_col: pd.array([], dtype="int64"),
                             "dup_of": pd.array([], dtype="int64"),
                             "cos": pd.array([], dtype="float64")})
    return cand.sort_values(id_col).reset_index(drop=True)
