"""Edge semantics of the temporal join operators: as-of inclusivity and
tie-breaks, range-join bounds and the non-overlap guard, sliding-window
membership."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from mlp_ray.ops import joins

TS = pd.Timestamp("2024-01-01")


def _ds(rows, columns):
    df = pd.DataFrame(rows, columns=columns)
    if "ts" in df:
        df["ts"] = df["ts"].astype("datetime64[us]")
    return rd.from_pandas(df)


def _asof(left_rows, right_rows):
    left = _ds(left_rows, ["event_id", "ts", "user_id"])
    right = _ds(right_rows, ["event_id", "ts", "user_id"])
    out = joins.asof_join(left, right, on="ts", by=["user_id"],
                          attach=["event_id"], tiebreak="event_id",
                          num_buckets=4).to_pandas()
    out["r_event_id"] = out["r_event_id"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def test_asof_backward_inclusive_and_ties():
    h = pd.Timedelta(hours=1)
    out = _asof(
        # left: one exactly-at-match, one after, one before any right
        [[10, TS + 2 * h, 1], [11, TS + 3 * h, 1], [12, TS - 5 * h, 1]],
        # right: two rows at the same ts (tie -> max event_id wins),
        # one later row that must not match backward
        [[1, TS + 2 * h, 1], [2, TS + 2 * h, 1], [3, TS + 10 * h, 1]])
    # unmatched left row 12 dropped (inner)
    assert list(out["event_id"]) == [10, 11]
    # inclusive at-ts match; tie broken to the larger right event_id
    assert list(out["r_event_id"]) == [2, 2]


def test_asof_respects_by_groups():
    h = pd.Timedelta(hours=1)
    out = _asof(
        [[10, TS + 2 * h, 1], [20, TS + 2 * h, 2]],
        [[1, TS + 1 * h, 1], [2, TS + 1 * h, 2], [3, TS, 2]])
    assert dict(zip(out["event_id"], out["r_event_id"])) == {10: 1, 20: 2}


def test_asof_users_spread_across_buckets():
    """Many users through a small bucket count: every user still joins
    only against its own rows."""
    h = pd.Timedelta(hours=1)
    lefts = [[100 + u, TS + 2 * h, u] for u in range(40)]
    rights = [[u, TS + 1 * h, u] for u in range(40)]
    out = _asof(lefts, rights)
    assert len(out) == 40
    assert (out["r_event_id"] == out["user_id"]).all()


def test_range_join_bounds_and_attach():
    iv = pd.DataFrame({
        "start": pd.to_datetime(["2024-01-01 02:00", "2024-01-02 02:00"]),
        "end": pd.to_datetime(["2024-01-01 04:00", "2024-01-02 04:00"]),
        "tag": ["w1", "w2"]})
    rows = pd.DataFrame({
        "ts": pd.to_datetime([
            "2024-01-01 01:59:59",  # before -> drop
            "2024-01-01 02:00:00",  # start inclusive -> w1
            "2024-01-01 03:59:59",  # inside -> w1
            "2024-01-01 04:00:00",  # end exclusive -> drop
            "2024-01-02 02:30:00",  # -> w2
        ]).astype("datetime64[us]"), "v": range(5)})
    out = (joins.range_join_broadcast(rd.from_pandas(rows), iv, on="ts")
           .to_pandas().sort_values("v"))
    assert list(out["v"]) == [1, 2, 4]
    assert list(out["w_tag"]) == ["w1", "w1", "w2"]


def test_range_join_rejects_overlap():
    iv = pd.DataFrame({"start": [0, 5], "end": [6, 10]})
    with pytest.raises(ValueError, match="non-overlapping"):
        joins.range_join_broadcast(
            rd.from_pandas(pd.DataFrame({"x": [1]})), iv, on="x")


def test_sliding_window_membership():
    """A single event belongs to exactly window/slide windows, the
    newest being its own slide bucket."""
    df = pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-01 05:30:00"]).astype("datetime64[us]"),
        "k": ["a"], "v": [2.0]})
    out = (joins.sliding_window_agg(
        rd.from_pandas(df), on="ts", keys=["k"], value_col="v",
        window_us=6 * 3_600_000_000, slide_us=3_600_000_000)
        .to_pandas().sort_values("window_start").reset_index(drop=True))
    assert len(out) == 6
    starts = pd.to_datetime(out["window_start"])
    assert starts.iloc[-1] == pd.Timestamp("2024-01-01 05:00:00")
    assert starts.iloc[0] == pd.Timestamp("2024-01-01 00:00:00")
    assert (out["n"] == 1).all() and (out["sum_value"] == 2.0).all()


def test_sliding_window_partial_preaggregation():
    """Two same-key rows in one slide bucket pre-aggregate before the
    shuffle and sum correctly after it."""
    df = pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-01 05:10:00", "2024-01-01 05:50:00",
                              "2024-01-01 06:10:00"]).astype("datetime64[us]"),
        "k": ["a", "a", "a"], "v": [1.0, 2.0, 4.0]})
    out = (joins.sliding_window_agg(
        rd.from_pandas(df), on="ts", keys=["k"], value_col="v",
        window_us=2 * 3_600_000_000, slide_us=3_600_000_000)
        .to_pandas().set_index("window_start").sort_index())
    # membership = window starts in (t - window, t] aligned to slide:
    # 05:10 -> {05:00, 04:00}; 05:50 -> {05:00, 04:00};
    # 06:10 -> {06:00, 05:00}
    w4, w5, w6 = (pd.Timestamp("2024-01-01 04:00:00"),
                  pd.Timestamp("2024-01-01 05:00:00"),
                  pd.Timestamp("2024-01-01 06:00:00"))
    assert out.loc[w4, "n"] == 2 and out.loc[w4, "sum_value"] == 3.0
    assert out.loc[w5, "n"] == 3 and out.loc[w5, "sum_value"] == 7.0
    assert out.loc[w6, "n"] == 1 and out.loc[w6, "sum_value"] == 4.0


def test_hash_join_inner_and_left():
    l = rd.from_pandas(pd.DataFrame(
        {"k": [1, 2, 3], "lv": ["a", "b", "c"]}))
    r = rd.from_pandas(pd.DataFrame(
        {"rk": [1, 1, 2, 9], "rv": [10, 11, 20, 90]}))
    inner = (joins.hash_join(l, r, on=["k"], right_on=["rk"],
                             num_buckets=4)
             .to_pandas().sort_values(["k", "rv"]).reset_index(drop=True))
    assert list(inner["k"]) == [1, 1, 2]
    assert list(inner["rv"].astype("int64")) == [10, 11, 20]
    left = (joins.hash_join(l, r, on=["k"], right_on=["rk"], how="left",
                            num_buckets=4)
            .to_pandas().sort_values(["k", "rv"]).reset_index(drop=True))
    assert list(left["k"]) == [1, 1, 2, 3]
    assert left["rv"].isna().tolist() == [False, False, False, True]


def test_hash_join_rejects_column_collision():
    l = rd.from_pandas(pd.DataFrame({"k": [1], "v": [1]}))
    r = rd.from_pandas(pd.DataFrame({"k": [1], "v": [2]}))
    with pytest.raises(ValueError, match="collide"):
        joins.hash_join(l, r, on=["k"])


def test_hash_join_keys_spread_across_buckets():
    n = 50
    l = rd.from_pandas(pd.DataFrame({"k": np.arange(n), "lv": np.arange(n)}))
    r = rd.from_pandas(pd.DataFrame({"k": np.arange(n), "rv": np.arange(n) * 2}))
    out = joins.hash_join(l, r, on=["k"], num_buckets=8).to_pandas()
    assert len(out) == n
    assert (out["rv"].astype("int64") == out["k"] * 2).all()


def test_hash_join_semi_anti():
    l = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3], "lv": [10, 20, 30]}))
    r = rd.from_pandas(pd.DataFrame({"k": [1, 1, 3, 3]}))
    semi = (joins.hash_join(l, r, on=["k"], how="semi", num_buckets=4)
            .to_pandas().sort_values("k"))
    # semi: matched left rows once each (right dupes don't multiply)
    assert list(semi["k"]) == [1, 3]
    assert list(semi["lv"].astype("int64")) == [10, 30]
    anti = (joins.hash_join(l, r, on=["k"], how="anti", num_buckets=4)
            .to_pandas())
    assert list(anti["k"]) == [2]
    assert list(anti["lv"].astype("int64")) == [20]


class TestSkewSalting:
    def _skewed(self):
        rng = np.random.RandomState(19)
        # 90% of left rows share one key; right has multiple rows/key
        lk = np.where(rng.rand(4000) < 0.9, 7,
                      rng.randint(0, 50, 4000)).astype(np.int64)
        left = pd.DataFrame({"k": lk,
                             "lv": np.arange(4000, dtype=np.int64)})
        right = pd.DataFrame({
            "k": np.repeat(np.arange(0, 50, dtype=np.int64), 3),
            "rv": np.arange(150, dtype=np.int64)})
        return left, right

    @pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
    def test_salted_equals_unsalted(self, ray_session, how):
        from mlp_ray.ops.joins import hash_join

        left, right = self._skewed()
        lds = rd.from_pandas(left).repartition(5)
        rds = rd.from_pandas(right).repartition(3)
        base = hash_join(lds, rds, on=["k"], how=how).to_pandas()
        salted = hash_join(lds, rds, on=["k"], how=how, salt=8,
                           num_buckets=16).to_pandas()
        cols = sorted(base.columns)
        a = base[cols].sort_values(cols, kind="mergesort") \
            .reset_index(drop=True)
        b = salted[cols].sort_values(cols, kind="mergesort") \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        exp = left.merge(right, on="k", how=how if how in
                         ("inner", "left") else "inner")
        if how == "inner":
            assert len(a) == len(exp)

    def test_detect_hot_keys_finds_planted(self, ray_session):
        from mlp_ray.ops.joins import detect_hot_keys

        left, _ = self._skewed()
        hot = detect_hot_keys(rd.from_pandas(left).repartition(4), ["k"])
        assert 7 in hot["k"].tolist()
        # the uniform tail keys (~0.2% each) must NOT be flagged
        assert len(hot) <= 3

    def test_explicit_hot_keys(self, ray_session):
        from mlp_ray.ops.joins import hash_join

        left, right = self._skewed()
        hot = pd.DataFrame({"k": [7]})
        out = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                        on=["k"], salt=4, hot_keys=hot).to_pandas()
        exp = left.merge(right, on="k")
        assert len(out) == len(exp)
        assert int(out["lv"].sum()) == int(exp["lv"].sum())


def test_hash_join_full_outer():
    l = rd.from_pandas(pd.DataFrame(
        {"k": [1, 2, 3], "lv": ["a", "b", "c"]}))
    r = rd.from_pandas(pd.DataFrame(
        {"k": [1, 1, 9], "rv": [10, 11, 90]}))
    out = (joins.hash_join(l, r, on=["k"], how="outer", num_buckets=4)
           .to_pandas().sort_values(["k", "rv"]).reset_index(drop=True))
    # matched (1 twice), left-only (2, 3), right-only (9)
    assert list(out["k"].astype("int64")) == [1, 1, 2, 3, 9]
    assert out["lv"].tolist() == ["a", "a", "b", "c", None] or \
        out["lv"].isna().tolist() == [False, False, False, False, True]
    assert out["rv"].isna().tolist() == [False, False, True, True, False]
    assert list(out["rv"].dropna().astype("int64")) == [10, 11, 90]


def test_hash_join_outer_rejects_salt():
    l = rd.from_pandas(pd.DataFrame({"k": [1], "lv": [1]}))
    r = rd.from_pandas(pd.DataFrame({"k": [1], "rv": [2]}))
    with pytest.raises(ValueError, match="outer"):
        joins.hash_join(l, r, on=["k"], how="outer", salt=4)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("how", ["inner", "left", "outer", "semi", "anti"])
def test_hash_join_matches_pandas_merge(ray_session, seed, how):
    """Randomized equivalence vs pandas merge for every join mode,
    with dup keys, misses on both sides and multiple partitions."""
    rng = np.random.RandomState(seed)
    left = pd.DataFrame({
        "k": rng.randint(0, 25, 300).astype(np.int64),
        "k2": rng.randint(0, 3, 300).astype(np.int64),
        "lv": rng.randint(0, 1000, 300).astype(np.int64)})
    right = pd.DataFrame({
        "k": rng.randint(10, 40, 200).astype(np.int64),
        "k2": rng.randint(0, 3, 200).astype(np.int64),
        "rv": rng.randint(0, 1000, 200).astype(np.int64)})
    got = joins.hash_join(
        rd.from_pandas(left).repartition(4),
        rd.from_pandas(right).repartition(3),
        on=["k", "k2"], how=how, num_buckets=8).to_pandas()
    if how in ("inner", "left", "outer"):
        exp = left.merge(right, on=["k", "k2"], how=how)
    elif how == "semi":
        exp = left.merge(right[["k", "k2"]].drop_duplicates(),
                         on=["k", "k2"])
    else:
        marked = left.merge(right[["k", "k2"]].drop_duplicates(),
                            on=["k", "k2"], how="left", indicator=True)
        exp = (marked[marked["_merge"] == "left_only"]
               .drop(columns=["_merge"]))
    cols = sorted(exp.columns)
    a = (got[cols].astype("float64")
         .sort_values(cols, kind="mergesort").reset_index(drop=True))
    e = (exp[cols].astype("float64")
         .sort_values(cols, kind="mergesort").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, e)


def test_asof_forward_inclusive_and_ties():
    left = pd.DataFrame({
        "u": [1, 1, 1, 2],
        "ts": pd.to_datetime(["2024-01-01 10:00", "2024-01-01 11:00",
                              "2024-01-01 12:30", "2024-01-01 10:00"]),
        "lid": [100, 101, 102, 103]})
    right = pd.DataFrame({
        "u": [1, 1, 1, 1],
        "ts": pd.to_datetime(["2024-01-01 11:00", "2024-01-01 11:00",
                              "2024-01-01 12:00", "2024-01-01 09:00"]),
        "rid": [7, 5, 9, 1]})
    out = (joins.asof_join(
        rd.from_pandas(left), rd.from_pandas(right), on="ts", by=["u"],
        attach=["rid"], tiebreak="rid", direction="forward",
        num_buckets=4)
        .to_pandas().sort_values("lid").reset_index(drop=True))
    # 10:00 -> next right at 11:00, tie (7,5) -> SMALLER rid wins (5)
    # 11:00 -> inclusive equal-ts match, same tie -> 5
    # 12:30 -> no following right row: dropped; u=2: no rights: dropped
    assert list(out["lid"]) == [100, 101]
    assert list(out["r_rid"].astype("int64")) == [5, 5]
    assert out["r_rid"].dtype == np.int64 or not out["r_rid"].isna().any()


def test_asof_rejects_bad_direction():
    l = rd.from_pandas(pd.DataFrame(
        {"u": [1], "ts": pd.to_datetime(["2024-01-01"]), "lid": [1]}))
    with pytest.raises(ValueError, match="direction"):
        joins.asof_join(l, l, on="ts", by=["u"], attach=["lid"],
                        tiebreak="lid", direction="nearest")
