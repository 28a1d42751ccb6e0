"""Property-based check for the binned point-in-interval join: on
random points and intervals (including empty-range intervals, points
on bin boundaries, and intervals spanning many bins) the binned
rewrite must produce exactly the naive theta join's pairs — no
duplicates from multi-bin intervals, no misses at bin edges."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from serverless_datalake_spark.operators.rangejoin import point_in_interval_join


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    points=st.lists(st.integers(min_value=-200, max_value=200), min_size=1, max_size=15),
    ivs=st.lists(
        st.tuples(
            st.integers(min_value=-200, max_value=200),
            st.integers(min_value=0, max_value=80),  # length (0 = point interval)
        ),
        min_size=1,
        max_size=10,
    ),
    bin_width=st.sampled_from([1, 7, 30, 100]),
)
def test_binned_equals_naive_theta(spark, points, ivs, bin_width):
    pdf = spark.createDataFrame([(i, p) for i, p in enumerate(points)], "pid long, p long")
    idf = spark.createDataFrame(
        [(j, s, s + ln) for j, (s, ln) in enumerate(ivs)], "iid long, s long, e long"
    )
    got = {
        (r["pid"], r["iid"])
        for r in point_in_interval_join(
            pdf, idf, point_col="p", start_col="s", end_col="e", bin_width=bin_width
        ).collect()
    }
    want = {
        (i, j)
        for i, p in enumerate(points)
        for j, (s, ln) in enumerate(ivs)
        if s <= p <= s + ln
    }
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    lv=st.lists(
        st.tuples(st.integers(min_value=-150, max_value=150),
                  st.integers(min_value=0, max_value=60)),
        min_size=1, max_size=10,
    ),
    rv=st.lists(
        st.tuples(st.integers(min_value=-150, max_value=150),
                  st.integers(min_value=0, max_value=60)),
        min_size=1, max_size=10,
    ),
    bin_width=st.sampled_from([1, 9, 40, 200]),
)
def test_interval_overlap_equals_naive(spark, lv, rv, bin_width):
    from serverless_datalake_spark.operators.rangejoin import interval_overlap_join

    ldf = spark.createDataFrame(
        [(i, s, s + ln) for i, (s, ln) in enumerate(lv)], "lid long, ls long, le long"
    )
    rdf = spark.createDataFrame(
        [(j, s, s + ln) for j, (s, ln) in enumerate(rv)], "rid long, rs long, re long"
    )
    got = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            ldf, rdf, "ls", "le", "rs", "re", bin_width=bin_width
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, (s1, n1) in enumerate(lv)
        for j, (s2, n2) in enumerate(rv)
        if s1 <= s2 + n2 and s2 <= s1 + n1
    )
    assert got == want  # exact pair multiset: no dup from shared bins, no miss
