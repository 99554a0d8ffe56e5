"""Cluster job entrypoint: the training-data curation path as one Ray
job — quality gate → benchmark decontamination → exact dedup →
leakage-safe split → curriculum sharding → partitioned parquet out.

On a real fixed-size cluster:

    ray job submit --address http://<head>:8265 \
        --working-dir . -- python jobs/curate_job.py \
        --input 's3://corpus/docs/part-*.parquet' \
        --benchmark 's3://evals/grams/*.parquet' \
        --out s3://curated/run1

and unchanged against a local session (``RAY_ADDRESS=local``), which is
how this sandbox exercises it.  Scale notes, stage by stage:

- quality / lang-id: fused ``map_batches`` over Arrow batches — no
  exchange, prunes before anything wide runs.
- decontamination: the benchmark gram set broadcasts ONCE (``ray.put``;
  Bloom-compressed past the broadcast budget, ops/scrub.py) — the
  corpus never shuffles for it.
- exact dedup: ONE text-hash-bucketed exchange; the md5-gated split is
  resolved inside the same exchange against the dup CANONICAL id, so
  byte-identical dups can never straddle the eval boundary
  (queries.doc_split_safe semantics).
- curriculum: the quality-desc ordered running token sum is the
  distributed ordered scan (ops/window.global_cumsum — narrow rows,
  range partition + per-partition offsets); text never centralizes.
- output: one parquet directory per (split, shard) — a failed run
  re-submits and completed partitions are skipped by the writer.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--benchmark", default=None,
                    help="parquet of benchmark docs to decontaminate "
                         "against (defaults to the doc_id%%53 slice)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--quality-min", type=float, default=0.5)
    ap.add_argument("--shards", type=int, default=8)
    args = ap.parse_args(argv)

    import ray
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"))
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from mlp_ray.ops import scrub
    from mlp_ray.pipelines import curate as curate_mod

    if os.path.isdir(args.input):
        paths = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    else:
        paths = sorted(glob.glob(args.input)) or [args.input]

    t0 = time.perf_counter()
    docs = rd.read_parquet(paths, columns=["doc_id", "text", "lang"])
    if args.benchmark:
        bench_docs = rd.read_parquet(
            sorted(glob.glob(args.benchmark)) or [args.benchmark],
            columns=["text"])
    else:
        # default held-out slice: doc_id % 53 (the repo's eval-set
        # convention, queries._bench_docs)
        def _slice(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            return t.filter(pa.array(ids % 53 == 0))

        bench_docs = docs.map_batches(_slice, batch_format="pyarrow")
    bg = scrub.benchmark_gram_set(bench_docs, k=5)
    kept = curate_mod.curate(docs, bg, quality_min=args.quality_min)
    out_dir = os.path.join(args.out, "curated")
    kept.write_parquet(out_dir)
    summary = {"curate_sec": round(time.perf_counter() - t0, 3),
               "bench_grams": int(len(bg)), "out": out_dir}
    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
