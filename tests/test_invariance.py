"""Determinism under different physical layouts: the same input split
into different block structures must produce identical sink tables
(SURVEY.md §4 Ordering — required for the N vs 4N equality check)."""

import ray.data as rd

from mlp_ray.aggs.fold import run_fold
from mlp_ray.aggs.sinks import make_main_ops, make_query_hash
from mlp_ray.pipelines.analyze import classify, load_events

from .util import assert_frames_match


def _main_ops(ds):
    cds = classify(ds)
    f, spec = make_main_ops()
    return run_fold(cds.map_batches(f, batch_format="pyarrow"),
                    spec).to_pandas()


def test_block_layout_invariance(fixture_paths):
    a = _main_ops(load_events(fixture_paths))
    b = _main_ops(load_events(fixture_paths,
                              override_num_blocks=13).repartition(13))
    assert_frames_match(a, b, ["ns", "op", "app_name"])


def test_batch_size_invariance(fixture_paths):
    ds = load_events(fixture_paths)
    cds = classify(ds)
    f, spec = make_query_hash()
    filtered = cds.map_batches(f, batch_format="pyarrow")
    a = run_fold(filtered, spec, batch_size=1024).to_pandas()
    b = run_fold(filtered, spec, batch_size=16384).to_pandas()
    assert_frames_match(a, b, ["query_hash", "ns", "op"])
