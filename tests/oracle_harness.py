"""Local twin of the driver's DuckDB-oracle comparison: row count,
sorted column names, and order-insensitive normalized value multiset.
Stricter than a hash — on mismatch it shows the differing rows."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

import duckdb

from serverless_datalake_spark.tables import TABLES, table_path


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')")
    return con


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0/0.0 and float repr noise far below our rounding
        return f"{v + 0.0:.9g}"
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, dt.date):
        return v.strftime("%Y-%m-%d") + " 00:00:00.000000"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def normalized_rows(columns: list[str], rows: list[tuple]) -> Counter:
    """Sort columns by name (driver semantics), normalize each cell."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return Counter(tuple(_norm_cell(r[i]) for i in order) for r in rows)


# DuckDB type → acceptable Spark dtypes. Kept strict on integer width
# and float/double so a driver-side type-sensitive hash can't surprise
# us; timestamp flavors are interchangeable (value-normalized anyway).
_TYPE_COMPAT = {
    "BIGINT": {"bigint"},
    "INTEGER": {"int"},
    "SMALLINT": {"smallint"},
    "DOUBLE": {"double"},
    "FLOAT": {"float"},
    "VARCHAR": {"string"},
    "DATE": {"date"},
    "BOOLEAN": {"boolean"},
    "BLOB": {"binary"},
}


def _types_ok(d_type: str, s_type: str) -> bool:
    d = str(d_type).upper()
    if d.startswith("TIMESTAMP"):
        return s_type.startswith("timestamp")
    if d in _TYPE_COMPAT:
        return s_type in _TYPE_COMPAT[d]
    return False  # HUGEINT, DECIMAL(...) etc: align the query instead


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    s_types = dict(spark_df.dtypes)
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return problems
    for col, d_type in zip(d_cols, rel.types):
        if not _types_ok(str(d_type), s_types[col]):
            problems.append(f"type mismatch on {col}: duckdb={d_type} spark={s_types[col]}")
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}")
    s_norm = normalized_rows(s_cols, s_rows)
    d_norm = normalized_rows(d_cols, d_rows)
    if s_norm != d_norm:
        only_s = list((s_norm - d_norm).items())[:5]
        only_d = list((d_norm - s_norm).items())[:5]
        problems.append(f"values differ; spark-only (≤5): {only_s}; duckdb-only (≤5): {only_d}")
    return problems
