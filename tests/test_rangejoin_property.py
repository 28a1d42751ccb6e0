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


def test_inverted_intervals_are_dropped_not_exploded(spark):
    """An end < start interval can match nothing (BETWEEN fails), but
    Spark's sequence(a, b) runs DESCENDING when b < a — unguarded, one
    malformed row exploded |span|/width garbage bins before the
    residual filter discarded the pairs (round-8 review finding). The
    guard must drop the row without changing any valid match."""
    from serverless_datalake_spark.operators import rangejoin

    pts = spark.createDataFrame([(1, 5.0), (2, 15.0)], "pid int, p double")
    ivs = spark.createDataFrame(
        [(10, 0.0, 10.0), (11, 1000000.0, -1000000.0)],  # second is inverted
        "iid int, s double, e double",
    )
    out = rangejoin.point_in_interval_join(pts, ivs, "p", "s", "e", bin_width=10)
    rows = {(r["pid"], r["iid"]) for r in out.collect()}
    assert rows == {(1, 10)}
    lo = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 50.0, 40.0)], "lid int, ls double, le double"
    )
    ro = spark.createDataFrame(
        # rid=8 is inverted AND nested inside lid=1's span: the raw
        # two-inequality predicate holds (0<=3 and 5<=10) but an
        # end-before-start interval is EMPTY, so it must match nothing
        # (documented semantics choice; the pre-guard code emitted it)
        [(7, 5.0, 6.0), (8, 5.0, 3.0), (9, 45.0, -45.0)],
        "rid int, rs double, re double",
    )
    out2 = rangejoin.interval_overlap_join(lo, ro, "ls", "le", "rs", "re", 10)
    assert {(r["lid"], r["rid"]) for r in out2.collect()} == {(1, 7)}
