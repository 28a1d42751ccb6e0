"""Property tests for the txlog temporal stat comparators: whatever
mix of date / naive-datetime / tz-aware-datetime / plain-string values
lands in a zone map or membership stat, ordered and equality prunes
must NEVER claim disjoint/mismatch when real datetime semantics say
the file could hold matching rows (a false prune silently drops
committed data; "ambiguous → keep" is always legal)."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from serverless_datalake_spark.sources.txlog import (
    _ord_pair,
    _stat_matches,
    _stat_repr,
    _temporal_key,
)

# timestamps within a few years, second resolution (what fixtures use)
_dts = st.datetimes(
    min_value=dt.datetime(2020, 1, 1),
    max_value=dt.datetime(2030, 1, 1),
).map(lambda d: d.replace(microsecond=0))
_dates = st.dates(min_value=dt.date(2020, 1, 1), max_value=dt.date(2030, 1, 1))
_temporal = st.one_of(_dts, _dates)


def _as_dt(v) -> dt.datetime:
    """Real-semantics view: a date means its midnight instant."""
    if isinstance(v, dt.datetime):
        return v
    return dt.datetime(v.year, v.month, v.day)


@given(stat=_temporal, probe=_temporal)
@settings(max_examples=300, deadline=None)
def test_ord_pair_orders_like_real_datetimes(stat, probe):
    """For any date/datetime mix, _ord_pair on the stored reprs either
    abstains (None → file kept) or orders EXACTLY like the underlying
    instants — never a wrong direction, which is what turns into a
    false prune."""
    pair = _ord_pair(_stat_repr(stat), probe)
    if pair is None:
        return  # abstention is always safe
    a, b = pair
    ra, rb = _as_dt(stat), _as_dt(probe)
    assert (a < b) == (ra < rb)
    assert (a > b) == (ra > rb)


@given(stat=_temporal, probe=_temporal)
@settings(max_examples=300, deadline=None)
def test_stat_matches_never_false_misses(stat, probe):
    """Membership prune: if the stored value and the probe denote the
    SAME instant (date == its midnight datetime), _stat_matches must
    say True — a False here prunes a file that holds matching rows."""
    if _as_dt(stat) == _as_dt(probe):
        assert _stat_matches(_stat_repr(stat), probe)


@given(v=_dts)
@settings(max_examples=200, deadline=None)
def test_aware_stat_normalizes_to_utc_wall_time(v):
    """pyarrow returns TIMESTAMP(isAdjustedToUTC) stats tz-aware; the
    canonical repr must be the naive UTC wall time, identical to the
    naive repr of the same instant (the session pins UTC)."""
    aware = v.replace(tzinfo=dt.timezone.utc)
    assert _stat_repr(aware) == _stat_repr(v)
    # and non-UTC offsets convert, not truncate
    plus2 = v.replace(tzinfo=dt.timezone(dt.timedelta(hours=2)))
    assert _stat_repr(plus2) == _stat_repr(v - dt.timedelta(hours=2))


@given(s=st.text(max_size=30), t=_temporal)
@settings(max_examples=300, deadline=None)
def test_temporal_vs_arbitrary_string_abstains_or_plain(s, t):
    """A temporal stat probed with an arbitrary string (or vice versa)
    must never produce an ordered comparison unless the string itself
    is temporal-shaped — mixed shapes abstain (ordered) or match
    (membership), both of which keep the file."""
    tr = _stat_repr(t)
    if _temporal_key(s) is None:
        assert _ord_pair(tr, s) is None
        assert _stat_matches(tr, s) is True or s == tr
