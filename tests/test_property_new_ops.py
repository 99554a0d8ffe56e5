"""Property-based tests (Ray-backed, few examples) for the round-3e
operators whose correctness is a global coordination property:

- distributed_quantiles must equal numpy linear interpolation for ANY
  value multiset (ties, constants, extremes) under ANY block split —
  brackets, count-below bookkeeping and the final collect have to
  compose exactly across blocks.
- doc_segment_dedup must equal a straightforward single-process
  reference (keep-first k-token segments in (doc_id, seg_idx) order)
  for ANY corpus with ANY duplication structure.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings, strategies as st

import ray.data as rd


@st.composite
def value_sets(draw):
    rng = np.random.default_rng(draw(st.integers(0, 2**32 - 1)))
    n = draw(st.integers(min_value=1, max_value=400))
    kind = draw(st.sampled_from(["normal", "ties", "constant", "mixed"]))
    if kind == "normal":
        vals = rng.normal(0, 100, n)
    elif kind == "ties":
        vals = rng.choice([1.0, 2.0, 2.0, 3.5], n)
    elif kind == "constant":
        vals = np.full(n, 42.5)
    else:
        vals = np.concatenate([rng.normal(0, 1, n),
                               rng.choice([-1e6, 0.0, 1e6], n)])
    rng.shuffle(vals)
    parts = draw(st.integers(min_value=1, max_value=7))
    qs = draw(st.lists(st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.9, 1.0]),
                       min_size=1, max_size=4, unique=True))
    return vals, parts, qs


@settings(max_examples=8, deadline=None)
@given(value_sets())
def test_distributed_quantiles_property(ray_session, case):
    from mlp_ray.ops.selection import distributed_quantiles

    vals, parts, qs = case
    ds = rd.from_pandas(pd.DataFrame({"value": vals})).repartition(parts)
    got = distributed_quantiles(ds, "value", qs, bins=8, leaf=16)
    for q in qs:
        exp = float(np.quantile(vals, q, method="linear"))
        assert got[q] == pytest.approx(exp, abs=1e-9), (q, len(vals))


def _ref_segment_dedup(texts: dict[int, str], k: int = 16):
    segs = []
    for did in sorted(texts):
        toks = " ".join(texts[did].split()).split(" ")
        if toks == [""]:
            continue
        for i in range(0, len(toks), k):
            segs.append((did, i // k, " ".join(toks[i:i + k])))
    seen, rows = set(), {}
    for did, idx, seg in sorted(segs):
        n_segs, kept = rows.get(did, (0, []))
        if seg not in seen:
            seen.add(seg)
            kept = kept + [seg]
        rows[did] = (n_segs + 1, kept)
    return {d: (n, len(kept), " ".join(kept))
            for d, (n, kept) in rows.items()}


@st.composite
def corpora(draw):
    rng = np.random.default_rng(draw(st.integers(0, 2**32 - 1)))
    n_docs = draw(st.integers(min_value=1, max_value=30))
    vocab = ["alpha", "beta", "gamma", "delta"]
    texts = {}
    for d in range(n_docs):
        mode = rng.integers(0, 4)
        if mode == 0 and d > 0:        # full duplicate of an earlier doc
            texts[d] = texts[rng.integers(0, d)]
        elif mode == 1:
            texts[d] = ""              # blank doc
        else:
            n_tok = int(rng.integers(1, 50))
            texts[d] = " ".join(rng.choice(vocab, n_tok))
    return texts


@settings(max_examples=8, deadline=None)
@given(corpora())
def test_segment_dedup_property(ray_session, tmp_path_factory, case):
    from mlp_ray.pipelines.queries import doc_segment_dedup

    tmp = tmp_path_factory.mktemp("segprop")
    df = pd.DataFrame({"doc_id": sorted(case),
                       "text": [case[d] for d in sorted(case)]})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp / "documents.parquet")
    got = doc_segment_dedup(str(tmp)).set_index("doc_id")
    exp = _ref_segment_dedup(case)
    assert set(got.index) == set(exp)
    for d, (n_segs, n_kept, text) in exp.items():
        assert int(got.loc[d, "n_segs"]) == n_segs, d
        assert int(got.loc[d, "n_kept"]) == n_kept, d
        assert got.loc[d, "text_dedup"] == text, d


def _write_docs(tmp, texts: dict[int, str]):
    df = pd.DataFrame({"doc_id": sorted(texts),
                       "text": [texts[d] for d in sorted(texts)],
                       "source": [f"s{d % 3}" for d in sorted(texts)]})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp / "documents.parquet")


def _ref_quality(text: str):
    import re

    # the engine's documented token convention (ops/text.py:48):
    # len(regexp_split_to_array(trim(text), '\\s+')) — a blank doc
    # splits to [''] and counts as ONE token
    n_tok = len(text.split()) or 1
    total = max(len(text), 1)
    alpha = len(re.sub(r"[^A-Za-z]", "", text))
    digit = len(re.sub(r"[^0-9]", "", text))
    score = (min(n_tok / 50.0, 1.0) * 0.4 + (alpha / total) * 0.5
             + (1.0 - digit / total) * 0.1)
    return n_tok, score


@settings(max_examples=8, deadline=None)
@given(corpora())
def test_curriculum_property(ray_session, tmp_path_factory, case):
    """doc_curriculum == a pure-Python reference: quality-desc order
    (rounded score, doc_id tie-break), integer-division token shards."""
    from mlp_ray.util import round_half_away
    from mlp_ray.pipelines.queries import doc_curriculum

    tmp = tmp_path_factory.mktemp("currprop")
    _write_docs(tmp, case)
    got = doc_curriculum(str(tmp)).reset_index(drop=True)

    rows = []
    for d in sorted(case):
        n_tok, score = _ref_quality(case[d])
        rows.append((d, float(round_half_away(score, 6)), n_tok))
    rows.sort(key=lambda r: (-r[1], r[0]))
    total = sum(r[2] for r in rows) or 1
    cum = 0
    exp = []
    for rnk, (d, score, n_tok) in enumerate(rows, 1):
        exp.append((d, score, n_tok, rnk, min(8 * cum // total, 7)))
        cum += n_tok
    assert len(got) == len(exp)
    for row, (d, score, n_tok, rnk, shard) in zip(
            got.itertuples(index=False), exp):
        assert (row.doc_id, row.n_ws_tokens, row.rnk,
                row.shard) == (d, n_tok, rnk, shard), (d, row)
        assert row.quality_score == score, d


@settings(max_examples=8, deadline=None)
@given(corpora())
def test_mix_temperature_property(ray_session, tmp_path_factory, case):
    """doc_mix_temperature == a pure-Python per-source token rollup
    with the tau=0.7 pow/normalize readout."""
    from mlp_ray.util import round_half_away
    from mlp_ray.pipelines.queries import doc_mix_temperature

    tmp = tmp_path_factory.mktemp("mixprop")
    _write_docs(tmp, case)
    got = doc_mix_temperature(str(tmp)).set_index("source")

    counts: dict[str, int] = {}
    for d in sorted(case):
        counts.setdefault(f"s{d % 3}", 0)
        counts[f"s{d % 3}"] += len(case[d].split()) or 1
    total = sum(counts.values())
    pw_total = sum(n ** 0.7 for n in counts.values())
    assert set(got.index) == set(counts)
    for s, n in counts.items():
        assert int(got.loc[s, "n_tokens"]) == n, s
        assert got.loc[s, "nat_share"] == float(
            round_half_away(n / total, 6)), s
        assert got.loc[s, "weight"] == float(
            round_half_away(n ** 0.7 / pw_total, 6)), s
