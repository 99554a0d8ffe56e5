"""End-to-end corpus curation: the composition a training-data user
runs over the whole corpus — quality gate → benchmark decontamination
→ exact dedup → stratified sampling — as ONE streaming Ray Data
pipeline.

Shuffle budget: a single hash-bucketed exchange (the exact-dedup
merge) over rows that already survived the two row-local gates; the
quality score, the decontamination probe (benchmark gram set broadcast
via ``ray.put``) and the sampling gate are all fused into per-batch
map stages.  At 100 TB the only all-to-all traffic is the narrow
``(text_hash, doc_id, lang, quality_score)`` survivor stream.

Stage order is part of the contract (and of the DuckDB oracle):
dedup canonical ids are chosen AMONG quality-passing, uncontaminated
docs; sampling runs last so the sample rate applies to the deduped
population.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..ops import scrub, text
from ..ops.dedup import _bucketed, _cached_stage
from ..ops.scrub import _distinct_grams_per_doc
from ..ops.text import md5_hash_batch


def curate(docs_ds: rd.Dataset, bench_grams: np.ndarray, *,
           quality_min: float = 0.8, k: int = 5,
           contamination_threshold: int = 1,
           rates: dict[str, int] | None = None,
           default_rate: int = 25,
           id_col: str = "doc_id") -> rd.Dataset:
    """Returns the curated survivors as
    ``(doc_id, lang, quality_score, dup_count)``."""
    rates = {"en": 60, "de": 40} if rates is None else rates
    ref = ray.put(np.asarray(bench_grams, dtype=np.uint64))

    def gate_and_hash(batch: pa.Table, _ref=ref, _qmin=quality_min,
                      _k=k, _thr=contamination_threshold) -> pd.DataFrame:
        """Row-local stages fused into one task: quality gate →
        decontamination probe (broadcast set, ``np.isin``) → content
        hash; emits the within-batch dedup partial (min doc per hash
        + dup count) so the exchange ships pre-combined rows."""
        qt = text.quality_batch(batch)
        score = qt["quality_score"].to_numpy(zero_copy_only=False)
        keep = np.nan_to_num(score, nan=-1.0) >= _qmin
        sub, score = batch.filter(pa.array(keep)), score[keep]
        if sub.num_rows:
            bg = _cached_stage(("curate-bg", _ref), lambda: ray.get(_ref))
            texts = [t or "" for t in sub["text"].to_pylist()]
            d, g, n = _distinct_grams_per_doc(texts, _k)
            hit = np.isin(g, bg)
            clean = np.bincount(d[hit], minlength=n) < _thr
            sub, score = sub.filter(pa.array(clean)), score[clean]
        if not sub.num_rows:
            return pd.DataFrame({"text_hash": pd.Series([], dtype="string"),
                                 id_col: pd.Series([], dtype="int64"),
                                 "lang": pd.Series([], dtype="string"),
                                 "quality_score": pd.Series([], dtype="float64"),
                                 "dup_count": pd.Series([], dtype="int64")})
        df = pd.DataFrame({
            "text_hash": md5_hash_batch(sub)["text_hash"].to_pandas()
            .astype("string"),
            id_col: sub[id_col].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "lang": sub["lang"].to_pandas().astype("string"),
            "quality_score": score,
        })
        df = df.sort_values(["text_hash", id_col], kind="mergesort")
        sizes = df.groupby("text_hash", sort=False)[id_col].transform("size")
        df["dup_count"] = sizes.astype("int64")
        return df.drop_duplicates("text_hash").reset_index(drop=True)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        """Per-bucket vectorized merge of dedup partials: global min
        doc per hash, dup counts summed."""
        g = g.sort_values(["text_hash", id_col], kind="mergesort")
        total = g.groupby("text_hash", sort=False)["dup_count"] \
            .transform("sum")
        g = g.assign(dup_count=total.astype("int64"))
        return g.drop_duplicates("text_hash").reset_index(drop=True)

    survivors = _bucketed(
        docs_ds.map_batches(gate_and_hash, batch_format="pyarrow",
                            zero_copy_batch=True),
        ["text_hash"], merge)

    sampled = scrub.stratified_sample(survivors, rates,
                                      default_rate=default_rate,
                                      id_col=id_col)
    return sampled.drop_columns(["text_hash"])
