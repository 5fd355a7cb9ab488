"""Property-based (hypothesis) checks for the temporal join operators:
asof_join must agree with pandas.merge_asof, banded_interval_join with a
brute-force range scan, for arbitrary generated event sets — not just the
crafted fixtures."""

import datetime as dt

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_http_full_cache_connector_spark.operators.asof import asof_join
from flink_http_full_cache_connector_spark.operators.rangejoin import (
    banded_interval_join,
)

EPOCH = dt.datetime(2024, 1, 1)


def _ts(s):
    return EPOCH + dt.timedelta(seconds=s)


# unique (key, ts) pairs per side keep the expected result unambiguous
sides = st.tuples(
    st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 60)), min_size=1, max_size=12,
        unique=True,
    ),
    st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 60)), min_size=1, max_size=12,
        unique=True,
    ),
)


@settings(max_examples=12, deadline=None)
@given(sides)
def test_asof_matches_pandas_merge_asof(spark, lr):
    lrows, rrows = lr
    left = spark.createDataFrame(
        [(k, _ts(s), f"L{k}_{s}") for k, s in lrows], "k int, ts timestamp, lv string"
    )
    right = spark.createDataFrame(
        [(k, _ts(s), float(k * 100 + s)) for k, s in rrows],
        "k int, ts timestamp, rv double",
    )
    got = {
        (r.k, r.ts): r.rv
        for r in asof_join(left, right, on="k", ts_col="ts").collect()
    }

    lpd = pd.DataFrame([(k, _ts(s)) for k, s in lrows], columns=["k", "ts"]).sort_values("ts")
    rpd = pd.DataFrame(
        [(k, _ts(s), float(k * 100 + s)) for k, s in rrows], columns=["k", "ts", "rv"]
    ).sort_values("ts")
    exp = pd.merge_asof(lpd, rpd, on="ts", by="k", direction="backward")
    for row in exp.itertuples():
        want = None if pd.isna(row.rv) else row.rv
        assert got[(row.k, row.ts.to_pydatetime())] == want


@settings(max_examples=12, deadline=None)
@given(sides, st.integers(2, 20))
def test_banded_join_matches_bruteforce(spark, lr, lookback):
    lrows, rrows = lr
    left = spark.createDataFrame(
        [(k, _ts(s)) for k, s in lrows], "k int, ts timestamp"
    )
    right = spark.createDataFrame(
        [(k, _ts(s)) for k, s in rrows], "k int, rts timestamp"
    )
    out = banded_interval_join(
        left, right, on="k", left_ts="ts", right_ts="rts",
        lookback_seconds=lookback,
    )
    got = {(r.k, r.ts, r.rts) for r in out.collect()}
    want = {
        (k, _ts(ls), _ts(rs))
        for k, ls in lrows
        for k2, rs in rrows
        if k2 == k and ls - lookback <= rs < ls
    }
    assert got == want


@settings(max_examples=12, deadline=None)
@given(sides)
def test_forward_asof_matches_pandas(spark, lr):
    lrows, rrows = lr
    left = spark.createDataFrame(
        [(k, _ts(s), f"L{k}_{s}") for k, s in lrows], "k int, ts timestamp, lv string"
    )
    right = spark.createDataFrame(
        [(k, _ts(s), float(k * 100 + s)) for k, s in rrows],
        "k int, ts timestamp, rv double",
    )
    got = {
        (r.k, r.ts): r.rv
        for r in asof_join(
            left, right, on="k", ts_col="ts", direction="forward"
        ).collect()
    }
    lpd = pd.DataFrame([(k, _ts(s)) for k, s in lrows], columns=["k", "ts"]).sort_values("ts")
    rpd = pd.DataFrame(
        [(k, _ts(s), float(k * 100 + s)) for k, s in rrows], columns=["k", "ts", "rv"]
    ).sort_values("ts")
    exp = pd.merge_asof(lpd, rpd, on="ts", by="k", direction="forward")
    for row in exp.itertuples():
        want = None if pd.isna(row.rv) else row.rv
        assert got[(row.k, row.ts.to_pydatetime())] == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)), min_size=1, max_size=20
    )
)
def test_connected_components_matches_union_find(spark, edge_list):
    from flink_http_full_cache_connector_spark.operators.dedup import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edge_list], "src long, dst long"
    )
    got = {(r.id, r.label) for r in connected_components(edges).collect()}
    # distributed label-propagation path must agree with the local path
    dist = {
        (r.id, r.label)
        for r in connected_components(edges, local_threshold=0).collect()
    }
    assert dist == got

    # reference union-find with min-id labels
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edge_list:
        union(a, b)
    want = {(v, find(v)) for v in parent}
    assert got == want


# gap-fill LOCF: arbitrary (key, second, value) events with possible
# same-timestamp ties — expected model computed by brute force
gap_events = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 120), st.integers(0, 99)),
    min_size=1,
    max_size=20,
)
GAP_STEP_US = 30 * 1_000_000  # 30-second buckets


@settings(max_examples=12, deadline=None)
@given(gap_events)
def test_gapfill_locf_matches_brute_force(spark, rows):
    from flink_http_full_cache_connector_spark.operators.gapfill import gapfill_locf

    # tie-break id = list position; value derived from it so ties at one
    # (key, ts) have distinct values and the canonicalization is observable
    data = [
        (k, s * 1_000_000, float(v * 10 + i), i) for i, (k, s, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "k int, us long, value double, eid int")
    got = {
        (r.k, r.bucket): r.value_locf
        for r in gapfill_locf(
            df, key_col="k", us_col="us", val_col="value", tie_col="eid",
            step_us=GAP_STEP_US,
        ).collect()
    }

    by_key: dict[int, list] = {}
    for k, us, v, eid in data:
        by_key.setdefault(k, []).append((us, eid, v))
    expected = {}
    for k, evs in by_key.items():
        lo = min(us for us, _, _ in evs) // GAP_STEP_US
        hi = max(us for us, _, _ in evs) // GAP_STEP_US
        for b in range(lo, hi + 1):
            cutoff = (b + 1) * GAP_STEP_US - 1
            prior = [(us, eid, v) for us, eid, v in evs if us <= cutoff]
            # last observation = max (us, eid); first bucket always has one
            expected[(k, b)] = max(prior)[2]
    assert got == expected
