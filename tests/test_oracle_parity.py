"""Every oracle-bearing query must match DuckDB exactly (the driver's
correctness gate, run locally at sf0.001 for speed). Rows-only
queries are exercised for execution + non-degenerate output."""

from __future__ import annotations

import pytest

from serverless_datalake_spark.queries import load_registry
from tests.oracle_harness import compare, duckdb_conn

REGISTRY = load_registry()
WITH_ORACLE = sorted(n for n, q in REGISTRY.items() if q.oracle)
ROWS_ONLY = sorted(n for n, q in REGISTRY.items() if not q.oracle)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, con, name):
    q = REGISTRY[name]
    problems = compare(q.fn(spark, sf_dir), con, q.oracle)
    assert not problems, f"{name}: " + " | ".join(problems)


# As of round 2 every registry query carries an oracle, so this
# parametrization is empty (pytest reports one skip). It stays for the
# day a genuinely non-oracle-able query lands (e.g. a real media codec
# replacing the deterministic decode stub).
@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert len(df.columns) > 0


def test_registry_is_fully_oracled():
    """Round-2 invariant: zero rows-only queries. If you add one, make
    sure it is genuinely not SQL-expressible (see README Correctness)."""
    assert ROWS_ONLY == []


def test_parity_survives_hostile_session_timezone(spark, sf_dir, con):
    """The driver hands us ITS session. tables.ensure_session_conf
    must repair a non-UTC timezone before any timestamp semantics run
    (to_date/date_trunc would otherwise shift days vs the oracle)."""
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        q = REGISTRY["replay_range"]
        problems = compare(q.fn(spark, sf_dir), con, q.oracle)
        assert not problems, problems
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_md5_family_survives_hostile_session(spark, sf_dir, con):
    """The md5-derived hash family (dedup/ANN oracles) must be immune
    to session-level settings: hostile timezone and odd shuffle
    parallelism change neither signatures nor band buckets."""
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    spark.conf.set("spark.sql.shuffle.partitions", "13")
    try:
        q = REGISTRY["dedup_minhash_lsh"]
        problems = compare(q.fn(spark, sf_dir), con, q.oracle)
        assert not problems, problems
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.shuffle.partitions", "16")
