"""Oracle-verified query registry (the driver contract's substance).

Every operator claimed in SURVEY.md §2 registers here as a named query:
a callable ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible)
an equivalent ANSI-SQL string for the DuckDB oracle. ``__spark_entry__``
re-exports this registry.

Rules enforced by convention here (driver compares by sorted column
name + order-insensitive value hash):
* alias every computed column identically in Spark and SQL;
* round floating aggregates on BOTH sides (double summation order
  differs between engines);
* cast timestamps used as output values to DATE / epoch seconds (the
  fixtures store ns timestamps; engines disagree on sub-second repr);
* make top-k / limit queries deterministic via total tie-break order.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, Query] = {}


def rewrite_spark_round(sql: str) -> str:
    """Rewrite every ROUND(expr, n) in oracle SQL to reproduce Spark's
    rounding bit-for-bit.

    Spark's round(double, n) goes through BigDecimal.valueOf(x) — i.e.
    HALF_UP on the *shortest decimal string repr* — while DuckDB rounds
    the binary value (8285.425 → Spark 8285.43, DuckDB 8285.42). Both
    engines print the same shortest repr, so
    ``CAST(ROUND(CAST(CAST(x AS VARCHAR) AS DECIMAL(38,15)), n) AS
    DOUBLE)`` makes DuckDB produce Spark's exact double.
    """
    low = sql.lower()
    i = low.find("round(")
    while i != -1:
        # must be a word boundary (not e.g. "xround(")
        if i > 0 and (low[i - 1].isalnum() or low[i - 1] == "_"):
            i = low.find("round(", i + 1)
            continue
        open_i = i + len("round")
        depth, close_i, split = 0, None, None
        in_str = False
        for j in range(open_i, len(sql)):
            c = sql[j]
            if c == "'":
                in_str = not in_str
            elif not in_str:
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                    if depth == 0:
                        close_i = j
                        break
                elif c == "," and depth == 1:
                    split = j
        if close_i is None or split is None:
            i = low.find("round(", i + 1)
            continue
        expr = rewrite_spark_round(sql[open_i + 1 : split])
        nd = sql[split + 1 : close_i].strip()
        repl = (
            f"CAST(ROUND(CAST(CAST(({expr}) AS VARCHAR) AS DECIMAL(38,15)), {nd}) AS DOUBLE)"
        )
        sql = sql[:i] + repl + rewrite_spark_round(sql[close_i + 1 :])
        return sql
    return sql


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a query under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(
            name, fn, rewrite_spark_round(oracle) if oracle else oracle, tags
        )
        return fn

    return deco


def load_registry() -> dict[str, Query]:
    """Import all query modules (side effect: fills REGISTRY)."""
    from serverless_datalake_spark.queries import (  # noqa: F401
        aggregates,
        functions,
        functions2,
        joins,
        llm_dedup,
        llm_similarity,
        llm_text,
        multimodal,
        pipeline,
        relational,
        relational2,
        reshape,
        setops,
        sql_dialect,
        streaming_batch,
        tpch_shapes,
        udfs,
        windows,
    )

    return REGISTRY
