"""Property test: the oracle ROUND rewriter must reproduce Spark's
rounding for arbitrary doubles.

Spark's round(double, n) = BigDecimal.valueOf(x).setScale(n, HALF_UP)
= HALF_UP on the shortest decimal string repr. Python's repr() is the
same shortest-roundtrip string, so Decimal(repr(x)) models it exactly
— no Spark session needed, making this cheap enough for wide
hypothesis sweeps against DuckDB."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from serverless_datalake_spark.queries import rewrite_spark_round

CON = duckdb.connect()


def spark_round_model(x: float, n: int) -> float:
    return float(Decimal(repr(x)).quantize(Decimal(1).scaleb(-n), rounding=ROUND_HALF_UP))


def duckdb_rewritten_round(x: float, n: int) -> float:
    # Inject x EXACTLY via its integer ratio (m / 2^k — both IEEE-exact
    # in SQL): DuckDB's decimal-literal→double parse is not correctly
    # rounded (e.g. '90071993.49999999' parses to the wrong neighbor),
    # which would make the harness test a different double than Python.
    m, den = x.as_integer_ratio()
    lit = f"(CAST({m} AS DOUBLE) / CAST({den} AS DOUBLE))"
    sql = rewrite_spark_round(f"SELECT ROUND({lit}, {n}) AS v")
    got = CON.sql(sql).fetchall()[0][0]
    # guard: the injection must reproduce x bit-for-bit
    assert CON.sql(f"SELECT {lit} = CAST({m} AS DOUBLE) / CAST({den} AS DOUBLE)").fetchall()[0][0]
    return got


# The repr-free midpoint mimic is exact for all finite |x| < 1e15
# (beyond, doubles carry no disputable sub-unit precision and plain
# ROUND applies). Two sweeps: uniform doubles, and adversarial values
# constructed to sit within ulps of rounding midpoints/grid points —
# where the old repr-based mimic broke (DuckDB prints only 15
# significant digits).
@settings(max_examples=500, deadline=None)
@given(
    x=st.floats(min_value=-8e14, max_value=8e14, allow_nan=False, allow_infinity=False),
    n=st.integers(min_value=0, max_value=6),
)
def test_rewritten_round_matches_spark_semantics(x: float, n: int):
    # exact domain: |x| < 9e14 / 10^n (all query outputs are ≤ ~1e12·10^-n)
    if abs(x) >= 9.0e14 / 10**n:
        return
    assert duckdb_rewritten_round(x, n) == spark_round_model(x, n)


@settings(max_examples=400, deadline=None)
@given(
    k=st.integers(min_value=-10**9, max_value=10**9),
    n=st.integers(min_value=0, max_value=6),
    half=st.booleans(),
    nudge=st.integers(min_value=-3, max_value=3),
)
def test_rewritten_round_near_boundaries(k: int, n: int, half: bool, nudge: int):
    """Values at grid points / midpoints ± a few ulps — the regime
    where shortest-repr and binary disagree."""
    base = (k + (0.5 if half else 0.0)) / 10**n
    x = base
    for _ in range(abs(nudge)):
        x = math.nextafter(x, math.inf if nudge > 0 else -math.inf)
    if abs(x) >= 9.0e14 / 10**n:
        return
    assert duckdb_rewritten_round(x, n) == spark_round_model(x, n)


def test_regression_sixteen_digit_repr():
    # doc 707 at sf0.1: identical doubles on both engines, but the old
    # repr-based mimic saw "0.70625" (15-digit print) and rounded up
    assert duckdb_rewritten_round(0.7062499999999999, 4) == 0.7062
    assert spark_round_model(0.7062499999999999, 4) == 0.7062


@pytest.mark.parametrize(
    "x,n,expected",
    [
        (8285.425, 2, 8285.43),  # the case binary rounding gets "wrong"
        (-8285.425, 2, -8285.43),  # HALF_UP is away-from-zero
        (2.675, 2, 2.68),  # classic repr-vs-binary example
        (0.5, 0, 1.0),
        (-0.5, 0, -1.0),
    ],
)
def test_known_boundary_cases(x, n, expected):
    assert duckdb_rewritten_round(x, n) == expected
    assert spark_round_model(x, n) == expected
