"""Distributed BPE tokenizer TRAINING (Sennrich et al., ACL 2016) —
the step that produces the merge table a tokenizer like
``text.bpe_token_count_batch``'s pretokenizer feeds.

Shape, not math, is what matters at 100 TB: classic BPE never
iterates over the corpus — it iterates over the WORD HISTOGRAM
(word → count), which is vocabulary-bounded.  So:

  pass 1  corpus → (word, count) via per-batch partial counts and one
          vocabulary-bounded exchange (the unigram_logprob pattern);
          each word becomes its character-symbol sequence (+ ``</w>``)
  rounds  each merge round is ONE map over the distributed word table
          (pair-count partials, weighted by word count) + a tiny
          groupby; only the per-bucket top pairs reach the driver,
          which picks the argmax (count DESC, pair ASC — deterministic
          ties) and broadcasts the merge rule for the next map.  The
          word table is materialized per round (narrow; the
          connected_components precedent) so the lazy plan never
          re-runs prior rounds.

Per-word Python in the round map is bounded by the VOCABULARY, never
the corpus — the 10^12-token corpus is touched exactly once.
Attested three ways: a pure-Python reference-equality golden, a
partitioning-invariance test, and (round 5) a per-step SQL replay
oracle — the DuckDB side recomputes the word histogram, every step's
weighted pair counts and every argmax from the state fixture
(``ensure_bpe_state_fixture``); only the merge application between
steps rides the fixture.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray  # noqa: F401  (session owned by the caller)
import ray.data as rd
from ray.data.aggregate import Sum

END = "</w>"


def word_symbol_table(docs_ds: rd.Dataset, *,
                      text_col: str = "text") -> rd.Dataset:
    """(symbols: list<string>, count) — the word histogram with each
    distinct word exploded into character symbols + the end marker."""
    def partials(t: pa.Table) -> pd.DataFrame:
        la = pc.split_pattern(pc.fill_null(t[text_col], ""), pattern=" ")
        if isinstance(la, pa.ChunkedArray):
            la = la.combine_chunks()
        words = la.flatten().to_numpy(zero_copy_only=False)
        vc = pd.Series(words).value_counts()
        vc = vc[vc.index != ""]
        return pd.DataFrame({"word": vc.index.to_numpy(dtype=object),
                             "count": vc.to_numpy().astype(np.int64)})

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("word", sort=False)["count"].sum().reset_index()
        out["symbols"] = [list(w) + [END] for w in out["word"]]
        out["count"] = out["count"].astype("int64")
        return out[["symbols", "count"]]

    from ..util import bucketed_groups

    parts = docs_ds.map_batches(partials, batch_format="pyarrow")
    return bucketed_groups(parts, ["word"], merge_bucket)


def _pair_partials(df: pd.DataFrame, top: int | None) -> pd.DataFrame:
    """Weighted adjacent-pair counts of one word-table block —
    partials for the per-round exchange (the groupby re-sums exact
    counts).  ``top`` optionally prunes to the block-local top pairs
    (a heavy-hitters-style recall/volume knob for extreme symbol
    vocabularies; None = exact, the default)."""
    acc: dict[tuple, int] = {}
    for syms, cnt in zip(df["symbols"], df["count"]):
        for a, b in zip(syms[:-1], syms[1:]):
            k = (a, b)
            acc[k] = acc.get(k, 0) + int(cnt)
    if not acc:
        return pd.DataFrame({"left": pd.Series(dtype=object),
                             "right": pd.Series(dtype=object),
                             "count": pd.Series(dtype="int64")})
    out = pd.DataFrame([(a, b, c) for (a, b), c in acc.items()],
                       columns=["left", "right", "count"])
    out["count"] = out["count"].astype("int64")
    if top is None:
        return out
    return out.sort_values(["count", "left", "right"],
                           ascending=[False, True, True],
                           kind="mergesort").head(top)


def _apply_merge(df: pd.DataFrame, left: str, right: str) -> pd.DataFrame:
    merged = left + right
    out = []
    for syms in df["symbols"]:
        if left not in syms:
            out.append(syms)
            continue
        new, i, n = [], 0, len(syms)
        while i < n:
            if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                new.append(merged)
                i += 2
            else:
                new.append(syms[i])
                i += 1
        out.append(new)
    return pd.DataFrame({"symbols": out,
                         "count": df["count"].astype("int64")})


def train_bpe(docs_ds: rd.Dataset, *, num_merges: int = 32,
              text_col: str = "text",
              candidate_top: int | None = None) -> pd.DataFrame:
    """Learn ``num_merges`` BPE merges; returns the merge table
    (rank, left, right, pair_count) — rank is 1-based learn order,
    ties broken (count DESC, pair ASC), exactly the reference
    trainer's contract.

    ``candidate_top`` (None = exact) prunes each block's pair partials
    before the per-round exchange — only needed for extreme symbol
    vocabularies, where it trades exactness for exchange volume the
    way the heavy-hitters op does."""
    words = word_symbol_table(docs_ds, text_col=text_col).materialize()
    merges = []
    for rank in range(1, num_merges + 1):
        pairs = (words.map_batches(
                    lambda df: _pair_partials(df, candidate_top),
                    batch_format="pandas")
                 .groupby(["left", "right"])
                 .aggregate(Sum("count", alias_name="count")))

        def local_top(df: pd.DataFrame) -> pd.DataFrame:
            return df.sort_values(["count", "left", "right"],
                                  ascending=[False, True, True],
                                  kind="mergesort").head(1)

        top = (pairs.map_batches(local_top, batch_format="pandas")
               .to_pandas())
        if top.empty:
            break
        top = top.sort_values(["count", "left", "right"],
                              ascending=[False, True, True],
                              kind="mergesort").iloc[0]
        left, right, cnt = str(top["left"]), str(top["right"]), \
            int(top["count"])
        if cnt < 2:
            break  # nothing left worth merging
        merges.append((rank, left, right, cnt))
        words = words.map_batches(
            lambda df, l=left, r=right: _apply_merge(df, l, r),
            batch_format="pandas").materialize()
    out = pd.DataFrame(merges,
                       columns=["rank", "left", "right", "pair_count"])
    for c in ("rank", "pair_count"):
        out[c] = out[c].astype("int64")
    return out


def ensure_bpe_state_fixture(sf_dir: str, num_merges: int = 16) -> str:
    """Idempotently persist the scalar-path BPE word-state trajectory
    over the documents table as ``(step, word, pos, sym)`` rows — the
    symbol sequence of every distinct word BEFORE merge step ``step``
    (step 1 = the initial character split).  The SQL oracle recomputes
    EVERYTHING else independently: the word histogram from the
    documents table (so a missing/extra word breaks the join), every
    step's weighted adjacent-pair counts (lead() over pos), and every
    step's argmax with the (count DESC, pair ASC) tie-break — so only
    the merge APPLICATION (deterministic string surgery between
    steps) rides the fixture.  Validation-scale only."""
    import os

    import pyarrow.parquet as _pq

    from ..util import ensure_fixture, fixture_path

    path = fixture_path("bpestate", sf_dir)

    def build() -> pa.Table:
        from collections import Counter

        tbl = _pq.read_table(f"{sf_dir}/documents.parquet",
                             columns=["text"])
        texts = [t if t is not None else ""
                 for t in tbl["text"].to_pylist()]
        wc = Counter(w for t in texts for w in t.split(" ") if w)
        words = {w: list(w) + [END] for w in wc}
        steps, wds, poss, syms = [], [], [], []

        def snapshot(step: int) -> None:
            for w, sy in words.items():
                for i, s in enumerate(sy):
                    steps.append(step)
                    wds.append(w)
                    poss.append(i)
                    syms.append(s)

        for rank in range(1, num_merges + 1):
            pc_: Counter = Counter()
            for w, sy in words.items():
                for a, b in zip(sy[:-1], sy[1:]):
                    pc_[(a, b)] += wc[w]
            if not pc_:
                break
            (left, right), cnt = min(
                pc_.items(), key=lambda kv: (-kv[1], kv[0]))
            if cnt < 2:
                break
            snapshot(rank)  # the state merge `rank` was chosen FROM
            for w, sy in words.items():
                if left not in sy:
                    continue
                new, i = [], 0
                while i < len(sy):
                    if (i + 1 < len(sy) and sy[i] == left
                            and sy[i + 1] == right):
                        new.append(left + right)
                        i += 2
                    else:
                        new.append(sy[i])
                        i += 1
                words[w] = new
        return pa.table({
            "step": pa.array(steps, pa.int64()),
            "word": pa.array(wds, pa.string()),
            "pos": pa.array(poss, pa.int64()),
            "sym": pa.array(syms, pa.string())})

    return ensure_fixture(
        path, f"{os.path.abspath(sf_dir)}|m={num_merges}|v1", build)


def train_bpe_reference(texts: list[str], num_merges: int = 32
                        ) -> pd.DataFrame:
    """Single-process reference trainer (golden for the distributed
    one): identical semantics, plain dicts."""
    from collections import Counter

    wc = Counter(w for t in texts for w in t.split(" ") if w)
    words = {w: list(w) + [END] for w in wc}
    merges = []
    for rank in range(1, num_merges + 1):
        pc_: Counter = Counter()
        for w, syms in words.items():
            for a, b in zip(syms[:-1], syms[1:]):
                pc_[(a, b)] += wc[w]
        if not pc_:
            break
        (left, right), cnt = min(
            pc_.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((rank, left, right, cnt))
        for w, syms in words.items():
            if left not in syms:
                continue
            new, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == left
                        and syms[i + 1] == right):
                    new.append(left + right)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            words[w] = new
    out = pd.DataFrame(merges,
                       columns=["rank", "left", "right", "pair_count"])
    for c in ("rank", "pair_count"):
        out[c] = out[c].astype("int64")
    return out
