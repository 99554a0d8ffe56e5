"""Text analysis operators for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting.

All hot paths are vectorized (pyarrow.compute kernels + numpy
segment-reductions over Arrow list offsets); the only per-row Python is
inside stateful actor-pool stages where the work is inherently
per-document (fingerprint winnowing).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import round_half_away

STOPWORDS = ("the", "a")

# tiny per-language stopword profiles for the n-gram/stopword heuristic
LANG_PROFILES = {
    "en": {"the", "a", "and", "of", "to"},
    "es": {"el", "la", "de", "que", "y"},
    "fr": {"le", "la", "de", "et", "un"},
    "de": {"der", "die", "und", "das", "ein"},
    "zh": set(),
}


def _ws_tokens(text: pa.ChunkedArray | pa.Array):
    return pc.utf8_split_whitespace(pc.utf8_trim_whitespace(text))


def _segment_sum(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Sum `values` per list row given Arrow list offsets."""
    if len(values) == 0:
        return np.zeros(len(offsets) - 1, dtype=np.int64)
    cs = np.concatenate([[0], np.cumsum(values)])
    return cs[offsets[1:]] - cs[offsets[:-1]]


def token_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """n_ws_tokens, avg_tok_len, stopword_ratio — all vectorized.

    Definitions match the DuckDB oracle exactly:
      n_ws_tokens   = len(regexp_split_to_array(trim(text), '\\s+'))
      avg_tok_len   = len(regexp_replace(text,'\\s','','g')) / n_ws_tokens
      stopword_ratio= |tokens in STOPWORDS| / n_ws_tokens
    """
    raw = batch[text_col]
    null_mask = pc.is_null(raw).to_numpy(zero_copy_only=False)
    text = pc.fill_null(raw, "")  # null text → null outputs (masked)
    toks = _ws_tokens(text)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    n = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    compact = pc.utf8_length(
        pc.replace_substring_regex(text, r"\s", "")).to_numpy(
        zero_copy_only=False).astype(np.float64)
    flat = toks.flatten()
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    is_stop = pc.is_in(flat, value_set=pa.array(STOPWORDS)).to_numpy(
        zero_copy_only=False).astype(np.int64)
    stop_counts = _segment_sum(is_stop, offsets)
    safe_n = np.maximum(n, 1)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_ws_tokens": pa.array(n, pa.int64(), mask=null_mask),
        "avg_tok_len": pa.array(round_half_away(compact / safe_n, 6),
                                pa.float64(), mask=null_mask),
        "stopword_ratio": pa.array(round_half_away(stop_counts / safe_n, 6),
                                   pa.float64(), mask=null_mask),
    })


def token_entropy_batch(batch: pa.Table,
                        text_col: str = "text") -> pd.DataFrame:
    """Per-doc Shannon entropy (bits) of the whitespace-token
    distribution, next to the token count — a diversity/quality score
    (boilerplate and repeated-token spam scores low).  One vectorized
    pass: flatten all docs' tokens, lexsort (doc, token-code), and the
    run-length boundaries give every (doc, token) count; entropy terms
    reduce per doc with one ``bincount``.  Blank/whitespace-only docs
    are skipped (oracle contract ``WHERE length(trim(text)) > 0``)."""
    import pandas as pd

    trimmed = pc.utf8_trim_whitespace(pc.fill_null(batch[text_col], ""))
    keep = pc.greater(pc.utf8_length(trimmed), 0)
    ids = (batch["doc_id"].filter(keep)
           .to_numpy(zero_copy_only=False).astype(np.int64))
    empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                          "n_tokens": pd.Series(dtype="int64"),
                          "entropy": pd.Series(dtype="float64")})
    if len(ids) == 0:
        return empty
    toks = pc.utf8_split_whitespace(trimmed.filter(keep))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    words = toks.flatten().to_numpy(zero_copy_only=False)
    lens = (pc.list_value_length(toks)
            .to_numpy(zero_copy_only=False).astype(np.int64))
    doc_idx = np.repeat(np.arange(len(ids)), lens)
    _, wcodes = np.unique(words, return_inverse=True)
    order = np.lexsort((wcodes, doc_idx))
    di, wc = doc_idx[order], wcodes[order]
    new = np.concatenate(([True], (di[1:] != di[:-1]) | (wc[1:] != wc[:-1])))
    starts = np.nonzero(new)[0]
    cnts = np.diff(np.concatenate((starts, [len(di)]))).astype(np.float64)
    pair_doc = di[starts]
    p = cnts / lens[pair_doc].astype(np.float64)
    ent = -np.bincount(pair_doc, weights=p * np.log2(p),
                       minlength=len(ids))
    return pd.DataFrame({"doc_id": ids, "n_tokens": lens,
                         "entropy": round_half_away(ent, 6)})


# BPE-ish subword tokenizer count: a GPT-2-style pretokenizer pattern
# (contraction pieces, space-prefixed letter/digit/punct runs) without
# the lookahead so it runs on RE2 — identical semantics in
# pyarrow.compute (RE2) and the DuckDB oracle (also RE2).
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count_batch(batch: pa.Table,
                          text_col: str = "text") -> pa.Table:
    """n_bpe_tokens (regex pretokenizer) next to n_ws_tokens — both
    fully vectorized; tokens_per_word = subword inflation signal."""
    raw = batch[text_col]
    null_mask = pc.is_null(raw).to_numpy(zero_copy_only=False)
    text = pc.fill_null(raw, "")
    bpe = pc.count_substring_regex(text, BPE_PATTERN).to_numpy(
        zero_copy_only=False).astype(np.int64)
    toks = _ws_tokens(text)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    ws = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    ratio = bpe / np.maximum(ws, 1)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_bpe_tokens": pa.array(bpe, pa.int64(), mask=null_mask),
        "n_ws_tokens": pa.array(ws, pa.int64(), mask=null_mask),
        "tokens_per_word": pa.array(round_half_away(ratio, 6),
                                    pa.float64(), mask=null_mask),
    })


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality signals: alpha ratio, digit ratio, token stats + a
    composite quality score in [0,1]."""
    raw = batch[text_col]
    null_mask = pc.is_null(raw).to_numpy(zero_copy_only=False)
    text = pc.fill_null(raw, "")
    total = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.float64)
    alpha = pc.utf8_length(pc.replace_substring_regex(
        text, r"[^A-Za-z]", "")).to_numpy(zero_copy_only=False).astype(np.float64)
    digit = pc.utf8_length(pc.replace_substring_regex(
        text, r"[^0-9]", "")).to_numpy(zero_copy_only=False).astype(np.float64)
    ts = token_stats_batch(batch, text_col)
    n_tok = np.nan_to_num(
        ts["n_ws_tokens"].to_numpy(zero_copy_only=False).astype(np.float64))
    safe_total = np.maximum(total, 1.0)
    alpha_ratio = alpha / safe_total
    digit_ratio = digit / safe_total
    # composite: long enough, mostly alphabetic, not digit-noise
    score = (np.clip(n_tok / 50.0, 0, 1) * 0.4 + alpha_ratio * 0.5
             + (1.0 - digit_ratio) * 0.1)
    return pa.table({
        "doc_id": batch["doc_id"],
        "alpha_ratio": pa.array(round_half_away(alpha_ratio, 6),
                                pa.float64(), mask=null_mask),
        "digit_ratio": pa.array(round_half_away(digit_ratio, 6),
                                pa.float64(), mask=null_mask),
        "n_ws_tokens": ts["n_ws_tokens"],
        "quality_score": pa.array(round_half_away(score, 6),
                                  pa.float64(), mask=null_mask),
    })


def lang_id_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Stopword-profile language ID heuristic (deterministic)."""
    text = batch[text_col]
    toks = _ws_tokens(text)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    langs = [l for l in LANG_PROFILES if LANG_PROFILES[l]]
    scores = np.zeros((len(offsets) - 1, len(langs)), dtype=np.float64)
    for j, lang in enumerate(langs):
        hit = pc.is_in(flat, value_set=pa.array(
            sorted(LANG_PROFILES[lang]))).to_numpy(
            zero_copy_only=False).astype(np.int64)
        scores[:, j] = _segment_sum(hit, offsets)
    n = np.maximum(_segment_sum(np.ones(len(flat), dtype=np.int64), offsets), 1)
    ratios = scores / n[:, None]
    best = ratios.argmax(axis=1)
    conf = ratios[np.arange(len(best)), best]
    pred = np.array(langs, dtype=object)[best]
    pred[conf == 0.0] = "unknown"
    return pa.table({
        "doc_id": batch["doc_id"],
        "lang_pred": pa.array(pred, pa.string()),
        "lang_conf": pa.array(round_half_away(conf, 6), pa.float64()),
    })


class Fingerprinter:
    """Actor-pool stage: winnowing document fingerprint.

    Rolling-hash character k-grams, minimum hash per window w
    (standard winnowing); emits the fingerprint set's xor-fold as a
    64-bit doc fingerprint plus the number of distinct selected hashes.
    """

    def __init__(self, k: int = 8, w: int = 16):
        self.k = k
        self.w = w

    def _grams(self, s: str) -> np.ndarray:
        k = self.k
        if len(s) < k:
            s = s.ljust(k, "\0")
        b = np.frombuffer(s.encode("utf-8", "replace"), dtype=np.uint8)
        if len(b) < k:
            b = np.pad(b, (0, k - len(b)))
        # polynomial rolling hash, vectorized over all k-gram windows
        n = len(b) - k + 1
        h = np.zeros(n, dtype=np.uint64)
        mult = np.uint64(1099511628211)
        for i in range(k):
            h = h * mult + b[i:i + n].astype(np.uint64)
        return h

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_fp, out_n = [], []
        for s in batch["text"].to_pylist():
            h = self._grams(s or "")
            w = min(self.w, len(h))
            if w <= 1:
                sel = h
            else:
                idx = np.arange(len(h) - w + 1)[:, None] + np.arange(w)[None, :]
                sel = h[idx].min(axis=1)
            uniq = np.unique(sel)
            fp = np.uint64(0)
            for v in uniq:
                fp ^= v
            out_fp.append(int(fp))
            out_n.append(len(uniq))
        return pa.table({
            "doc_id": batch["doc_id"],
            "fingerprint": pa.array(out_fp, pa.uint64()),
            "n_hashes": pa.array(out_n, pa.int64()),
        })


def md5_hash_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """md5 content hash (matches DuckDB md5())."""
    hashes = [hashlib.md5((s or "").encode()).hexdigest()
              for s in batch[col].to_pylist()]
    return batch.append_column("text_hash", pa.array(hashes, pa.string()))


def repetition_batch(batch: pa.Table, text_col: str = "text") -> "pd.DataFrame":
    """Gopher-style word-repetition metrics per document: total /
    distinct word counts, duplicate-word fraction and the hottest
    word's share (Rae et al. 2021 'Scaling Language Models' repetition
    filters, word granularity).

    Row-local and vectorized: one split kernel, one pandas groupby over
    the exploded (doc, word) pairs — no per-document Python.  Splits on
    single spaces (DuckDB ``string_split(text, ' ')`` contract, empty
    segments counted) so the oracle matches exactly.
    """
    import pandas as pd

    la = pc.split_pattern(batch[text_col], pattern=" ")
    if isinstance(la, pa.ChunkedArray):
        la = la.combine_chunks()
    parent = la.value_parent_indices().to_numpy()
    pairs = pd.DataFrame({
        "i": parent,
        "w": la.flatten().to_numpy(zero_copy_only=False),
    })
    freq = pairs.groupby(["i", "w"], sort=False).size()
    g = freq.groupby(level=0, sort=False)
    n_words = g.sum()
    distinct = g.size()
    top = g.max()
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    idx = n_words.index.to_numpy()
    nw = n_words.to_numpy(dtype=np.int64)
    dw = distinct.to_numpy(dtype=np.int64)
    return pd.DataFrame({
        "doc_id": doc_ids[idx],
        "n_words": nw,
        "distinct_words": dw,
        "dup_word_frac": round_half_away(1.0 - dw / nw),
        "top_word_share": round_half_away(top.to_numpy(np.float64) / nw),
    })


def chunk_batch(batch: pa.Table, text_col: str = "text",
                size: int = 200, stride: int = 180) -> pa.Table:
    """Overlapping fixed-size character chunking for training-data
    prep: doc -> ceil(max(len-1,0)/stride)+1 chunks of up to ``size``
    code points starting every ``stride`` (so consecutive chunks
    overlap by ``size - stride``).

    Vectorized as one ``utf8_slice_codeunits`` kernel per chunk
    ordinal: iteration k slices EVERY doc that still has a k-th chunk,
    so the Python loop runs max-chunks times, not once per row.
    Indices are code points (matches DuckDB ``substr`` character
    semantics; identical for ASCII corpora).
    """
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lens = pc.fill_null(pc.utf8_length(text), -1).to_numpy(
        zero_copy_only=False)
    counts = np.where(lens < 0, 0,
                      np.maximum(lens - 1, 0) // stride + 1)
    parts = []
    ids = batch["doc_id"]
    for k in range(int(counts.max()) if len(counts) else 0):
        m = pa.array(counts > k)
        sub_ids = ids.filter(m)
        chunk = pc.utf8_slice_codeunits(
            text.filter(m), k * stride, k * stride + size)
        parts.append(pa.table({
            "doc_id": sub_ids,
            "chunk_id": pa.array(
                np.full(len(sub_ids), k, np.int64)),
            "chunk_text": chunk}))
    if not parts:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "chunk_id": pa.array([], pa.int64()),
                         "chunk_text": pa.array([], pa.string())})
    return pa.concat_tables(parts)


def unigram_logprob(docs_ds, k: int = 20, text_col: str = "text"):
    """Unigram language-model quality score (perplexity-filter style):
    two passes over the corpus.

    Pass 1 builds corpus unigram counts — per-batch (word, count)
    partials, ONE vocabulary-keyed groupby, then top-k selection with
    per-batch pruning (events_topk pattern), so the driver only ever
    holds k rows + the scalar total.  Pass 2 broadcasts the k-word
    log-prob table via ``ray.put`` and scores every document with a
    vectorized lookup + segment mean; out-of-vocabulary tokens take
    the 1/N floor.

    Deterministic top-k tie-break: (count DESC, word ASC) — mirrored
    by the DuckDB oracle.  The only corpus-wide exchange is the
    (word, count) partial shuffle, bounded by vocabulary size.
    """
    import pandas as pd
    import ray
    import ray.data as rd  # noqa: F401  (kept for symmetry with callers)
    from ray.data.aggregate import Sum

    def word_partials(t: pa.Table) -> pd.DataFrame:
        la = pc.split_pattern(t[text_col], pattern=" ")
        if isinstance(la, pa.ChunkedArray):
            la = la.combine_chunks()
        words = la.flatten().to_numpy(zero_copy_only=False)
        out = (pd.Series(words).value_counts().rename_axis("word")
               .rename("c").reset_index())
        out["c"] = out["c"].astype("int64")
        return out

    counts = (docs_ds.map_batches(word_partials, batch_format="pyarrow")
              .groupby("word").aggregate(Sum("c", alias_name="c"))
              .materialize())  # bounded by vocabulary size, not corpus
    total = float(counts.aggregate(Sum("c", alias_name="n"))["n"])

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["c", "word"],
                              ascending=[False, True]).head(k)

    top = (counts.map_batches(local_topk, batch_format="pandas")
           .to_pandas().sort_values(["c", "word"],
                                    ascending=[False, True]).head(k))
    logp = ray.put(dict(zip(top["word"],
                            np.log(top["c"].to_numpy() / total))))
    floor = float(np.log(1.0 / total))

    def score(t: pa.Table) -> pd.DataFrame:
        lp = _cached_obj(("unigram-logp", logp), logp)
        la = pc.split_pattern(t[text_col], pattern=" ")
        if isinstance(la, pa.ChunkedArray):
            la = la.combine_chunks()
        parent = la.value_parent_indices().to_numpy()
        words = pd.Series(la.flatten().to_numpy(zero_copy_only=False))
        vals = words.map(lp).fillna(floor).to_numpy()
        n_tok = np.bincount(parent, minlength=t.num_rows)
        sums = np.bincount(parent, weights=vals, minlength=t.num_rows)
        mask = n_tok > 0
        ids = t["doc_id"].to_numpy(zero_copy_only=False)[mask]
        return pd.DataFrame({
            "doc_id": ids,
            "n_tokens": n_tok[mask].astype(np.int64),
            "avg_logprob": round_half_away(sums[mask] / n_tok[mask]),
        })

    return docs_ds.map_batches(score, batch_format="pyarrow")


def tfidf_topk(docs_ds, k: int = 3, text_col: str = "text",
               id_col: str = "doc_id"):
    """Top-``k`` TF-IDF terms per document: (doc_id, term, tf, df,
    tfidf, rnk) with tfidf = tf · ln(N/df).

    The distributed shape matters more than the math: document rows
    are batch-atomic, so per-batch (doc, word, tf) rows are globally
    unique — the document-frequency "join" is then ONE word-bucketed
    exchange where df is just the bucket-local group size (no separate
    df table, no broadcast of a corpus-sized vocabulary, unlike
    ``unigram_logprob`` whose broadcast is valid only because it keeps
    k words).  A second doc-bucketed exchange ranks terms per doc.
    Ranking compares the 6-decimal-rounded score (tie-break term ASC),
    mirrored by the DuckDB oracle, so float association can't flip
    adjacent ranks.  Splits on single spaces (``string_split`` oracle
    contract, as repetition_batch)."""
    import pandas as pd

    def tf_rows(t: pa.Table) -> pd.DataFrame:
        la = pc.split_pattern(t[text_col], pattern=" ")
        if isinstance(la, pa.ChunkedArray):
            la = la.combine_chunks()
        parent = la.value_parent_indices().to_numpy()
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pairs = pd.DataFrame({
            "doc_id": ids[parent],
            "term": la.flatten().to_numpy(zero_copy_only=False)})
        out = (pairs.groupby(["doc_id", "term"], sort=False)
               .size().rename("tf").reset_index())
        out["tf"] = out["tf"].astype("int64")
        return out

    tf = docs_ds.map_batches(tf_rows, batch_format="pyarrow")
    n_docs = float(docs_ds.count())

    def attach_df(g: pd.DataFrame) -> pd.DataFrame:
        # whole words co-locate in a bucket and (doc, term) rows are
        # unique → df(term) = its row count here
        g = g.copy()
        g["df"] = (g.groupby("term", sort=False)["term"]
                   .transform("size").astype("int64"))
        return g

    def rank_doc_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["tfidf"] = round_half_away(
            g["tf"].to_numpy(dtype=np.float64)
            * np.log(n_docs / g["df"].to_numpy(dtype=np.float64)))
        g = g.sort_values(["doc_id", "tfidf", "term"],
                          ascending=[True, False, True], kind="mergesort")
        g["rnk"] = (g.groupby("doc_id", sort=False).cumcount() + 1) \
            .astype("int64")
        return g[g["rnk"] <= k].reset_index(drop=True)

    from ..util import bucketed_groups

    with_df = bucketed_groups(tf, ["term"], attach_df)
    return bucketed_groups(with_df, ["doc_id"], rank_doc_bucket)


def _gram_strings(t: pa.Table, n: int, text_col: str) -> np.ndarray:
    """All word-``n``-gram strings of a batch (whitespace tokens, one
    window per position; docs shorter than n contribute ONE clipped
    gram; empty/whitespace-only docs contribute nothing) — flat object
    array built with one split kernel + n shifted views, no per-doc
    Python."""
    # blank docs must be masked BEFORE splitting: utf8_split_whitespace
    # on '' yields [''], which would emit a bogus '' gram per blank doc
    # (the doc_ngram_topk oracle excludes docs with empty trimmed text)
    trimmed = pc.utf8_trim_whitespace(pc.fill_null(t[text_col], ""))
    toks = pc.utf8_split_whitespace(
        trimmed.filter(pc.greater(pc.utf8_length(trimmed), 0)))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    words = toks.flatten().to_numpy(zero_copy_only=False)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    if not len(words):
        return np.empty(0, dtype=object)
    grams_per_doc = np.maximum(lens - n + 1, 1)
    tok_starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    g_pos = (np.arange(int(grams_per_doc.sum()))
             - np.repeat(np.concatenate(([0],
                         np.cumsum(grams_per_doc)))[:-1], grams_per_doc))
    tok0 = np.repeat(tok_starts, grams_per_doc) + g_pos
    L_rep = np.repeat(lens, grams_per_doc)
    out = words[tok0].astype(object)
    for j in range(1, n):
        valid = (g_pos + j) < L_rep
        wj = words[np.minimum(tok0 + j, len(words) - 1)]
        out = np.where(valid, out + " " + wj, out)
    return out


def ngram_heavy_hitters(docs_ds, *, n: int = 2, k: int = 50,
                        num_buckets: int = 64,
                        text_col: str = "text"):
    """Top-``k`` word-``n``-grams by EXACT count — the unbounded-key
    frequency problem ``token_histogram`` can't take to 100 TB (its
    vocabulary-bounded bincount doesn't apply: the n-gram key space is
    ~corpus-sized).

    Exact and LAYOUT-INDEPENDENT by construction: each block emits its
    full distinct (gram, count) partial (pre-aggregated — one row per
    distinct gram per block, never one per occurrence), ONE
    gram-bucketed exchange sums exact global counts (a bucket owns
    whole grams, so per-bucket sums are final), each bucket keeps only
    its local top-``k``, and the driver merges ≤ num_buckets × k rows.
    A candidate-pool two-pass variant (local top-C per block, then an
    exact recount) was measurably layout-DEPENDENT: on near-uniform
    gram distributions a globally-tied gram can fall outside every
    block's local top, so finer block layouts (more CPUs) silently
    dropped boundary grams.  Returns (gram, count, rnk), count desc /
    gram asc.
    """
    import pandas as pd

    from ..util import bucketed_groups

    def local_counts(t: pa.Table) -> pd.DataFrame:
        grams = _gram_strings(t, n, text_col)
        if not len(grams):
            return pd.DataFrame({"gram": pd.Series(dtype=object),
                                 "count": pd.Series(dtype="int64")})
        vc = pd.Series(grams).value_counts()
        return pd.DataFrame({"gram": vc.index.to_numpy(dtype=object),
                             "count": vc.to_numpy().astype(np.int64)})

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        s = (g.groupby("gram")["count"].sum()
             .sort_index().sort_values(ascending=False, kind="mergesort")
             .head(k).reset_index())
        s["count"] = s["count"].astype("int64")
        return s

    parts = docs_ds.map_batches(local_counts, batch_format="pyarrow")
    pooled = bucketed_groups(parts, ["gram"], bucket_topk,
                             num_buckets=num_buckets).to_pandas()
    if pooled.empty:
        return pd.DataFrame({"gram": pd.Series(dtype=object),
                             "count": pd.Series(dtype="int64"),
                             "rnk": pd.Series(dtype="int64")})
    out = (pooled.sort_values(["count", "gram"],
                              ascending=[False, True], kind="mergesort")
           .head(k).reset_index(drop=True))
    out["rnk"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out


def winnow_md5_batch(batch: pa.Table, *, k: int = 2, w: int = 4,
                     text_col: str = "text") -> "pd.DataFrame":
    """Winnowing fingerprints (Schleimer et al., SIGMOD'03) with
    md5-derived gram hashes — the ORACLE-ATTESTED variant of
    ``Fingerprinter``: every step (word-k-gram strings, md5[:8] as the
    hash, min per w-window, distinct) is reproducible by DuckDB list
    comprehensions, so the driver can hash-match the exploded
    (doc_id, fp) rows.  md5 per gram is per-row Python — fine for the
    validation tier; ``Fingerprinter`` (vectorized multiply-shift
    hashes) is the production path with the same selection logic.

    Returns exploded (doc_id, fp) rows, fps distinct per doc."""
    import hashlib
    import pandas as pd

    la = _ws_tokens(pc.fill_null(batch[text_col], ""))
    if isinstance(la, pa.ChunkedArray):
        la = la.combine_chunks()
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    out_ids, out_fps = [], []
    for i in range(batch.num_rows):
        toks = la[i].as_py()
        # a blank/whitespace-only doc splits to [''] (truthy) — skip it
        # like the oracle's WHERE length(trim(text)) > 0
        if not toks or toks == [""]:
            continue
        n_g = max(len(toks) - k + 1, 1)
        hs = np.fromiter(
            (int(hashlib.md5(" ".join(toks[j:j + k]).encode())
                 .hexdigest()[:8], 16) for j in range(n_g)),
            dtype=np.int64, count=n_g)
        if len(hs) >= w:
            mins = np.min(np.lib.stride_tricks.sliding_window_view(hs, w),
                          axis=1)
        else:
            mins = np.array([hs.min()], dtype=np.int64)
        fps = np.unique(mins)
        out_ids.append(np.full(len(fps), ids[i]))
        out_fps.append(fps)
    if not out_ids:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "fp": pd.Series(dtype="int64")})
    return pd.DataFrame({
        "doc_id": np.concatenate(out_ids).astype(np.int64),
        "fp": np.concatenate(out_fps).astype(np.int64)})


def winnow_fingerprint_batch(batch: pa.Table, *, k: int = 2, w: int = 4,
                             text_col: str = "text") -> "pd.DataFrame":
    """DOC-LEVEL winnowing fingerprint: xor-fold + count of the doc's
    distinct window-min md5 gram hashes — the oracle-reproducible
    rollup of ``winnow_md5_batch`` (DuckDB re-derives it with the same
    gram CTE + ``bit_xor``/``count`` aggregates).  ``Fingerprinter``
    (vectorized multiply-shift rolling hashes) remains the production
    fingerprint with the same selection logic; this md5 variant is the
    validation tier.  Blank docs are skipped like the oracle's
    ``length(trim(text)) > 0``."""
    import pandas as pd

    rows = winnow_md5_batch(batch, k=k, w=w, text_col=text_col)
    if rows.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "fingerprint": pd.Series(dtype="int64"),
                             "n_hashes": pd.Series(dtype="int64")})
    # per-doc rows are contiguous (winnow_md5_batch emits doc by doc):
    # one reduceat per segment, no per-doc Python
    ids = rows["doc_id"].to_numpy()
    fps = rows["fp"].to_numpy()  # md5[:8] values < 2^32: xor-safe int64
    starts = np.flatnonzero(np.concatenate(([True], ids[1:] != ids[:-1])))
    return pd.DataFrame({
        "doc_id": ids[starts],
        "fingerprint": np.bitwise_xor.reduceat(fps, starts),
        "n_hashes": np.diff(np.append(starts, len(ids))).astype("int64"),
    })


def build_vocab(docs_ds, *, vocab_size: int = 256,
                text_col: str = "text") -> dict[str, int]:
    """Rank-id vocabulary from corpus word counts: id = 1-based rank
    by (count DESC, word ASC), id 0 reserved for OOV.  One
    vocabulary-bounded (word, count) exchange with per-batch partial
    counts + per-block top pruning — the unigram_logprob shape."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def word_partials(t: pa.Table) -> pd.DataFrame:
        la = pc.split_pattern(t[text_col], pattern=" ")
        if isinstance(la, pa.ChunkedArray):
            la = la.combine_chunks()
        words = la.flatten().to_numpy(zero_copy_only=False)
        out = (pd.Series(words).value_counts().rename_axis("word")
               .rename("c").reset_index())
        out["c"] = out["c"].astype("int64")
        return out

    counts = (docs_ds.map_batches(word_partials, batch_format="pyarrow")
              .groupby("word").aggregate(Sum("c", alias_name="c")))

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["c", "word"],
                              ascending=[False, True]).head(vocab_size)

    top = (counts.map_batches(local_top, batch_format="pandas")
           .to_pandas().sort_values(["c", "word"],
                                    ascending=[False, True])
           .head(vocab_size))
    return {w: i + 1 for i, w in enumerate(top["word"])}


class VocabTokenizer:
    """Actor-pool stage: text → int32 id sequence under a broadcast
    rank-id vocabulary (OOV → 0).  The vocab dict ships once via
    ``ray.put`` (map-side broadcast, no shuffle); the per-batch map is
    one pandas ``.map`` over the flattened word array + an offsets
    re-split.  Emits (doc_id, tokens list<int32>, n_tok, n_oov,
    id_sum) — the checksums let a SQL oracle attest the REAL id
    arrays."""

    def __init__(self, vocab_ref, text_col: str = "text"):
        import ray
        self.vocab = (ray.get(vocab_ref)
                      if not isinstance(vocab_ref, dict) else vocab_ref)
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        la = pc.split_pattern(pc.fill_null(batch[self.text_col], ""),
                              pattern=" ")
        if isinstance(la, pa.ChunkedArray):
            la = la.combine_chunks()
        words = pd.Series(la.flatten().to_numpy(zero_copy_only=False))
        ids = words.map(self.vocab).fillna(0).to_numpy(dtype=np.int64)
        offsets = la.offsets.to_numpy(zero_copy_only=False).astype(np.int32)
        offsets = offsets - offsets[0]
        n_tok = np.diff(offsets).astype(np.int64)
        cs = np.concatenate(([0], np.cumsum(ids)))
        id_sum = cs[offsets[1:]] - cs[offsets[:-1]]
        oov = (ids == 0).astype(np.int64)
        co = np.concatenate(([0], np.cumsum(oov)))
        n_oov = co[offsets[1:]] - co[offsets[:-1]]
        toks = pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(ids.astype(np.int32)))
        return pa.table({
            "doc_id": batch["doc_id"],
            "tokens": toks,
            "n_tok": pa.array(n_tok),
            "n_oov": pa.array(n_oov),
            "id_sum": pa.array(id_sum)})


def tokenize(docs_ds, *, vocab_size: int = 256, text_col: str = "text"):
    """Two-pass corpus tokenization: build_vocab → broadcast →
    VocabTokenizer actor pool."""
    import ray

    vocab_ref = ray.put(build_vocab(docs_ds, vocab_size=vocab_size,
                                    text_col=text_col))
    return docs_ds.map_batches(
        VocabTokenizer, batch_format="pyarrow",
        fn_constructor_kwargs={"vocab_ref": vocab_ref,
                               "text_col": text_col},
        concurrency=(1, 8))


_OBJ_CACHE: dict = {}


def _cached_obj(key, ref):
    """Per-worker plasma-deref cache: ray.get once per worker process,
    not once per batch."""
    import ray
    if key not in _OBJ_CACHE:
        _OBJ_CACHE[key] = ray.get(ref)
    return _OBJ_CACHE[key]


def ensure_zlib_fixture(sf_dir: str) -> str:
    """Idempotently persist ``(doc_id, n_bytes, n_compressed)`` — the
    scalar-path zlib level-6 deflate sizes of each doc's UTF-8 bytes.
    The SQL oracle for ``doc_compression_ratio`` reads the sizes from
    this fixture (DEFLATE is the only non-SQL-expressible step) and
    re-derives the ratio arithmetic including the empty-doc → 1.0
    contract.  Validation-scale only."""
    import os
    import zlib

    import pyarrow.parquet as _pq

    from ..util import ensure_fixture, fixture_path

    path = fixture_path("zlib", sf_dir)

    def build() -> pa.Table:
        tbl = _pq.read_table(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"])
        n_bytes, n_comp = [], []
        for s in tbl["text"].to_pylist():
            b = (s or "").encode("utf-8")
            n_bytes.append(len(b))
            n_comp.append(len(zlib.compress(b, 6)))
        return pa.table({
            "doc_id": tbl["doc_id"],
            "n_bytes": pa.array(np.asarray(n_bytes, dtype=np.int64)),
            "n_compressed": pa.array(np.asarray(n_comp,
                                                dtype=np.int64))})

    return ensure_fixture(path, f"{os.path.abspath(sf_dir)}|v1", build)
