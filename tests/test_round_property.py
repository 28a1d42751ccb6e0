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
    sql = rewrite_spark_round(f"SELECT ROUND(CAST({x!r} AS DOUBLE), {n}) AS v")
    return CON.sql(sql).fetchall()[0][0]


# Valid domain: |x|·10^n ≲ 1e14 — the rounding-decision digit must sit
# within the first 15 significant digits, because DuckDB's
# double→VARCHAR prints only 15 (not shortest-roundtrip: e.g.
# 900719925474099.5 prints as …099.6), so the mimic can diverge at
# digit 16. Queries obey the domain (audited: max |value|·10^n ≈ 1e12
# at the driver's sf0.01); any aggregate whose magnitude × precision
# would exceed it is summed as exact scaled integers instead (see
# agg_pricing_summary's *_e4/*_e6 columns).
@settings(max_examples=500, deadline=None)
@given(
    x=st.floats(min_value=-1e7, max_value=1e7, allow_nan=False, allow_infinity=False),
    n=st.integers(min_value=0, max_value=6),
)
def test_rewritten_round_matches_spark_semantics(x: float, n: int):
    assert duckdb_rewritten_round(x, n) == spark_round_model(x, n)


@settings(max_examples=300, deadline=None)
@given(
    x=st.floats(min_value=-1e11, max_value=1e11, allow_nan=False, allow_infinity=False),
    n=st.integers(min_value=0, max_value=2),
)
def test_rewritten_round_matches_large_magnitude_low_precision(x: float, n: int):
    assert duckdb_rewritten_round(x, n) == spark_round_model(x, n)


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
