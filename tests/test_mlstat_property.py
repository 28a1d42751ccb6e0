"""Property tests for the windowed-SQL formulations behind
model_decision_stump_fit and stats_fdr_bh: the prefix-sum Gini sweep
and the BH step-up window must equal brute-force Python on arbitrary
inputs. Spark == oracle is already pinned by test_oracle_parity, so
validating the SQL shape against brute force closes the chain
python-brute ↔ oracle-SQL ↔ Spark without paying a Spark session per
hypothesis example."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

CON = duckdb.connect()

# mirrors the scored/cum CTE chain of model_decision_stump_fit, over a
# (v, y) relation injected as VALUES
_STUMP_SQL = """
WITH vals AS (
  SELECT v, CAST(SUM(y) AS BIGINT) AS c1,
         CAST(COUNT(*) - SUM(y) AS BIGINT) AS c0
  FROM src GROUP BY 1
), cum AS (
  SELECT v,
         CAST(SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS l1,
         CAST(SUM(c0) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS l0,
         CAST(SUM(c1) OVER () AS BIGINT) AS t1,
         CAST(SUM(c0) OVER () AS BIGINT) AS t0
  FROM vals
), scored AS (
  SELECT v, l1, l0, t1 - l1 AS r1, t0 - l0 AS r0,
         (CAST(l1 + l0 AS DOUBLE)
            * (1.0 - (CAST(l1 AS DOUBLE) / CAST(l1 + l0 AS DOUBLE))
                       * (CAST(l1 AS DOUBLE) / CAST(l1 + l0 AS DOUBLE))
                    - (CAST(l0 AS DOUBLE) / CAST(l1 + l0 AS DOUBLE))
                       * (CAST(l0 AS DOUBLE) / CAST(l1 + l0 AS DOUBLE)))
          + CAST(t1 - l1 + t0 - l0 AS DOUBLE)
            * (1.0 - (CAST(t1 - l1 AS DOUBLE) / CAST(t1 - l1 + t0 - l0 AS DOUBLE))
                       * (CAST(t1 - l1 AS DOUBLE) / CAST(t1 - l1 + t0 - l0 AS DOUBLE))
                    - (CAST(t0 - l0 AS DOUBLE) / CAST(t1 - l1 + t0 - l0 AS DOUBLE))
                       * (CAST(t0 - l0 AS DOUBLE) / CAST(t1 - l1 + t0 - l0 AS DOUBLE))))
         / CAST(t1 + t0 AS DOUBLE) AS wgini
  FROM cum
  WHERE l1 + l0 > 0 AND t1 - l1 + t0 - l0 > 0
)
SELECT v, wgini FROM scored ORDER BY wgini, v LIMIT 1
"""


def _brute_stump(rows: list[tuple[int, int]]) -> tuple[int, float] | None:
    """Brute force: weighted Gini of every split threshold v (left =
    x <= v), argmin with (gini, v) tie-break."""
    n = len(rows)
    best = None
    for v in sorted({r[0] for r in rows}):
        left = [y for x, y in rows if x <= v]
        right = [y for x, y in rows if x > v]
        if not left or not right:
            continue

        def gini(g):
            p1 = sum(g) / len(g)
            p0 = 1.0 - p1
            # match the SQL's exact expression shape (p from int counts)
            p1 = sum(g) / len(g)
            p0 = (len(g) - sum(g)) / len(g)
            return 1.0 - p1 * p1 - p0 * p0

        w = (len(left) * gini(left) + len(right) * gini(right)) / n
        if best is None or (w, v) < best:
            best = (w, v)
    if best is None:
        return None
    return best[1], best[0]


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=8), st.integers(0, 1)),
        min_size=2,
        max_size=40,
    )
)
def test_stump_prefix_sum_equals_brute_force(rows):
    values = ", ".join(f"({v}, {y})" for v, y in rows)
    got = CON.sql(
        f"WITH src(v, y) AS (VALUES {values}), "
        + _STUMP_SQL.strip().removeprefix("WITH ")
    ).fetchall()
    expect = _brute_stump(rows)
    if expect is None:
        assert got == []
        return
    assert got, f"SQL returned empty, expected {expect}"
    v, w = got[0]
    assert v == expect[0]
    assert abs(w - expect[1]) < 1e-12


_BH_SQL = """
WITH ranked AS (
  SELECT grp, p,
         CAST(ROW_NUMBER() OVER (ORDER BY p, grp) AS BIGINT) AS rk,
         CAST(COUNT(*) OVER () AS BIGINT) AS m
  FROM src
), kstar AS (
  SELECT grp, p, rk,
         COALESCE(MAX(CASE WHEN p * CAST(m AS DOUBLE)
                                <= CAST(rk AS DOUBLE) * 0.10
                           THEN rk END) OVER (), 0) AS k_star
  FROM ranked
)
SELECT grp, CASE WHEN rk <= k_star THEN 1 ELSE 0 END AS is_discovery
FROM kstar ORDER BY grp
"""


def _brute_bh(ps: list[float], alpha: float = 0.10) -> list[int]:
    """Textbook step-up: sort ascending, k* = max k with
    p_(k) <= k/m*alpha; reject all p-values with rank <= k*."""
    m = len(ps)
    order = sorted(range(m), key=lambda i: (ps[i], i))
    k_star = 0
    for pos, i in enumerate(order, start=1):
        if ps[i] * m <= pos * alpha:
            k_star = pos
    out = [0] * m
    for pos, i in enumerate(order, start=1):
        if pos <= k_star:
            out[i] = 1
    return out


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=1000),  # p in thousandths: exact doubles
        min_size=1,
        max_size=30,
    )
)
def test_bh_stepup_window_equals_brute_force(pm):
    ps = [v / 1000.0 for v in pm]
    values = ", ".join(f"({i}, {v} / 1000.0)" for i, v in enumerate(pm))
    got = CON.sql(
        f"WITH src(grp, p) AS (VALUES {values}), "
        + _BH_SQL.strip().removeprefix("WITH ")
    ).fetchall()
    expect = _brute_bh(ps)
    assert [d for _, d in got] == expect
    # step-up sanity: the discovery set is a prefix of the p-ranking
    flagged = {g for g, d in got if d}
    if flagged:
        max_p = max(ps[g] for g in flagged)
        assert all(g in flagged for g in range(len(ps)) if ps[g] < max_p)
