"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real registry lives in ``serverless_datalake_spark.queries``
(one module per operator family, SURVEY.md §2); this file just
re-exports it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from serverless_datalake_spark.queries import load_registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's
    replay shape (source EQ + ts BETWEEN, replayer:19–39) + rollup."""
    reg = load_registry()
    return reg["replay_range"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in load_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query;
    omitted keys (approx sketches, LSH/IVF ANN, stubbed decode) get
    the driver's rows-only check."""
    return {name: q.oracle for name, q in load_registry().items() if q.oracle is not None}
