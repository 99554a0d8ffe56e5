"""Configurable ignore blacklist (F4) + namespace filter (F5)."""

import pyarrow as pa

from mlp_ray.aggs.fold import FoldSpec, run_fold
from mlp_ray.pipelines.analyze import classify, load_events
from mlp_ray.stages.filters import (DEFAULT_IGNORE_PATTERNS, FilterConfig,
                                    NamespaceFilter)


def test_filter_config_properties_roundtrip(tmp_path):
    p = tmp_path / "f.properties"
    p.write_text("# comment\nfilter.ignore.add=Custom noise, Another\n"
                 "filter.ignore.remove=ping\n")
    fc = FilterConfig.from_properties_file(str(p))
    assert "Custom noise" in fc.patterns
    assert "Another" in fc.patterns
    assert "ping" not in fc.patterns
    assert "hello" in fc.patterns  # defaults kept


def test_filter_config_replace():
    fc = FilterConfig.from_properties(
        {"filter.ignore.patterns": "OnlyThis"})
    assert fc.patterns == ("OnlyThis",)


def test_ignore_mask_vectorized():
    fc = FilterConfig()
    arr = pa.array(["TTLMonitor pass 5", "Slow query", None, "ping pong"])
    assert fc.should_ignore_mask(arr).to_pylist() == [True, False, False, True]


def test_namespace_filter_modes():
    nf = NamespaceFilter(["app.users", "billing.*", "analytics",
                          "cache.*old"])
    ns = pa.array(["app.users", "app.orders", "billing.invoices",
                   "analytics.raw", "cache.cold", "cache.hot",
                   "config.system.sessions"])
    assert nf.keep_mask(ns).to_pylist() == [
        True, False, True, True, True, False, False]


def test_namespace_filter_always_excludes_config():
    nf = NamespaceFilter(["config.*"])
    ns = pa.array(["config.settings", "app.users"])
    assert nf.keep_mask(ns).to_pylist() == [False, False]


def test_classify_with_filters(fixture_paths):
    nf = NamespaceFilter(["app.users"])
    cds = classify(load_events(fixture_paths), ns_filter=nf,
                   filter_config=FilterConfig())
    spec = FoldSpec(keys=["ns"])
    out = run_fold(
        cds.map_batches(lambda t: t.filter(t["r_ops"]),
                        batch_format="pyarrow"), spec).to_pandas()
    assert set(out["ns"]) == {"app.users"}


def test_never_drop_guards(fixture_paths):
    """F2/F3 (LogParser.java:902-921): a blacklist pattern that would
    match operation or connection rows cannot drop them — target ops
    and the conn/auth/metadata rows feeding driver stats always win."""
    hostile = FilterConfig(patterns=["Slow query", "client metadata",
                                     "Successfully authenticated",
                                     "Connection accepted",
                                     "TTLMonitor pass"])
    base = classify(load_events(fixture_paths))
    cds = classify(load_events(fixture_paths), filter_config=hostile)
    import pyarrow as pa
    import pyarrow.compute as pc
    b0 = pa.concat_tables(base.iter_batches(batch_format="pyarrow",
                                            batch_size=None))
    b1 = pa.concat_tables(cds.iter_batches(batch_format="pyarrow",
                                           batch_size=None))
    # ops and conn rows survive unchanged
    assert pc.sum(b0["r_ops"]).as_py() == pc.sum(b1["r_ops"]).as_py()
    assert pc.sum(b0["r_conn"]).as_py() == pc.sum(b1["r_conn"]).as_py()
    # the noise pattern still works on CONTROL rows
    cats = set(pc.unique(b1.filter(b1["r_ignored"])
                         ["ignored_category"]).to_pylist())
    assert "TTLMonitor pass" in cats
