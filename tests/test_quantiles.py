"""Exact-quantile narrowing vs a sorted-list reference."""

import random

from e_commerce_data_pipeline_spark.operators.quantiles import (
    _auto_buckets,
    exact_quantiles,
)


def _ref(vals, p):
    s = sorted(vals)
    k = max(1, -(-p * len(s) // 100))
    return s[k - 1]


def test_matches_sorted_reference_with_ties_and_negatives(spark):
    rng = random.Random(7)
    vals = [rng.randint(-50_000, 50_000) for _ in range(3000)]
    vals += [vals[0]] * 40 + [-50_000] * 5 + [50_000] * 5  # heavy ties + ends
    df = spark.createDataFrame([(v,) for v in vals], "cents long")
    got = {
        r.percent: (r.n, r.k, r.value)
        for r in exact_quantiles(df, "cents", [1, 25, 50, 75, 99]).collect()
    }
    n = len(vals)
    for p in [1, 25, 50, 75, 99]:
        k = max(1, -(-p * n // 100))
        assert got[p] == (n, k, _ref(vals, p)), p


def test_tiny_buckets_still_converge(spark):
    # buckets=2 forces ~log2(range) rounds; exercises max_rounds headroom
    vals = list(range(1000, 0, -1))
    df = spark.createDataFrame([(v,) for v in vals], "cents long")
    got = {r.percent: r.value for r in exact_quantiles(df, "cents", [50], buckets=2).collect()}
    assert got[50] == _ref(vals, 50)


def test_full_domain_range_first_round_overflow(spark):
    """Round-9 hypothesis find: an interval spanning more than half
    the int64 domain made the first round's (v - lo) overflow under
    ANSI (and the first decimal-division fix rounded 255.999... UP
    to bucket 256 — Spark reduces decimal / scale to 6 and HALF_UPs,
    so the bucket index must use integral div). Pin the found
    example plus both int64 extremes."""
    cases = [
        [-(2**62), 2**62],
        [-9223372036854775808, 9223372036854775807],
        [-(2**62), -(2**62), 2**62, 5],
        list(range(-5, 6)) + [2**62, -(2**62)],
    ]
    for vals in cases:
        df = spark.createDataFrame([(v,) for v in vals], "cents long")
        got = {
            r.percent: r.value
            for r in exact_quantiles(df, "cents", [1, 50, 100]).collect()
        }
        for p in (1, 50, 100):
            assert got[p] == _ref(vals, p), (vals, p)


def test_auto_buckets_rule():
    """Round-17 auto width: smallest power of two whose ceil-narrowing
    scan count equals the measured-optimal 4096 cap's. Pins the two
    hand-measured identity points (q157's ~1e7-cent span and q162's
    2.22e10 slope span both resolve to 4096) and the invariants the
    rule promises: never more scans than the cap, never wider than
    the cap, narrower spans get narrower histograms."""

    def rounds(span, b):
        r = 0
        while span > 1:
            span = -(-span // b)
            r += 1
        return r

    assert _auto_buckets(10_400_000) == 4096  # q157 cents span
    assert _auto_buckets(22_200_000_000) == 4096  # q162 slope span
    assert _auto_buckets(2) == 2
    assert _auto_buckets(1_000_000) == 1024  # sqrt-shaped: 2 scans
    for span in [2, 5, 100, 4096, 4097, 10**6, 10**10, 2**62, 2**63]:
        b = _auto_buckets(span)
        assert b <= 4096 and (b & (b - 1)) == 0
        assert rounds(span, b) == rounds(span, 4096), span


def test_auto_matches_pinned_buckets_output(spark):
    """Auto width must be output-invisible: exactness makes bucket
    count performance-only, so auto and any pinned width agree."""
    rng = random.Random(17)
    vals = [rng.randint(-(10**10), 10**10) for _ in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    auto = sorted(
        tuple(r) for r in exact_quantiles(df, "v", [10, 50, 95]).collect()
    )
    pinned = sorted(
        tuple(r)
        for r in exact_quantiles(df, "v", [10, 50, 95], buckets=4096).collect()
    )
    assert auto == pinned


def test_single_row_and_nulls(spark):
    df = spark.createDataFrame([(42,), (None,), (None,)], "cents long")
    rows = exact_quantiles(df, "cents", [50, 99]).collect()
    assert {(r.percent, r.n, r.k, r.value) for r in rows} == {
        (50, 1, 1, 42),
        (99, 1, 1, 42),
    }


def test_property_any_values_any_percents(spark):
    """Hypothesis: for ANY int64 multiset (huge range, ties,
    negatives, singletons) and ANY percent set, narrowing returns
    exactly the rank-based reference — the invariant q157/q162/q103
    lean on."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=10,
        deadline=None,
        derandomize=True,
        suppress_health_check=[
            HealthCheck.too_slow,
            HealthCheck.function_scoped_fixture,
        ],
    )
    @given(
        st.lists(
            st.integers(min_value=-(2**62), max_value=2**62),
            min_size=1,
            max_size=60,
        ),
        st.sets(
            st.integers(min_value=1, max_value=100), min_size=1, max_size=4
        ),
    )
    def inner(vals, percents):
        ps = sorted(percents)
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        got = {
            r.percent: (r.n, r.k, r.value)
            for r in exact_quantiles(df, "v", ps, buckets=7).collect()
        }
        n = len(vals)
        for p in ps:
            k = max(1, -(-p * n // 100))
            assert got[p] == (n, k, _ref(vals, p)), (p, vals)

    inner()
