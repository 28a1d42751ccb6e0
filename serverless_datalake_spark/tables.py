"""Fixture-table access.

The driver fixtures (TESTDATA.md) are one Parquet file per table under
``/root/testdata/sf*/``. At 100 TB these would be partitioned
directories; both shapes are just ``spark.read.parquet(path)``, so the
engine is layout-agnostic — partition pruning and predicate pushdown
apply whenever the layout provides them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Confs the engine's queries depend on, applied defensively because a
# caller (e.g. the verify driver) may hand us a SparkSession built
# without session.get_spark():
#  * nanosAsLong — the fixtures store TIMESTAMP(NANOS), which the
#    vectorized parquet reader otherwise rejects outright;
#  * UTC session tz — to_date/date_trunc on LTZ timestamps and
#    NTZ→timestamp casts are tz-dependent; the DuckDB oracle treats
#    naive timestamps as UTC;
#  * AQE — the scale posture assumes runtime re-planning.
_REQUIRED_CONF = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
}


def ensure_session_conf(spark: SparkSession) -> None:
    """Idempotently apply _REQUIRED_CONF (all runtime-settable)."""
    for k, v in _REQUIRED_CONF.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            pass  # never let a conf quirk break a read


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    ensure_session_conf(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    # The event-time column must always surface as TIMESTAMP (LTZ, UTC
    # session) no matter which physical layout the fixtures use:
    #  * TIMESTAMP(NANOS) arrives as long (nanosAsLong, session.py) —
    #    convert via integer division (`div`; double division would
    #    lose precision at 1e18 ns);
    #  * naive timestamp[us] arrives as TIMESTAMP_NTZ — cast (value-
    #    preserving under the enforced UTC session tz). Functions like
    #    unix_millis/unix_micros reject NTZ, so normalizing here keeps
    #    every downstream query layout-agnostic.
    for col, dtype in df.dtypes:
        if col in ("ts",):
            if dtype == "bigint":
                # FLOOR ns->us, integer-exact: bare `div` truncates
                # toward zero, converting a pre-1970 ns value with
                # sub-us residue 1 us too HIGH (DuckDB floors) — the
                # pmod form floors for both signs with no double math
                df = df.withColumn(
                    col,
                    F.expr(f"timestamp_micros(({col} - pmod({col}, 1000)) div 1000)"),
                )
            elif dtype == "timestamp_ntz":
                df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_events_pushdown(
    spark: SparkSession, sf_dir: str, ts_between: tuple[str, str] | None = None
) -> DataFrame:
    """Events scan with a parquet-pushable time-range filter.

    The fixtures store ts as TIMESTAMP(NANOS) which we read as long;
    a filter on the *converted* timestamp can't cross
    ``timestamp_micros(...)``, so range predicates are applied to the
    raw int64 nanoseconds FIRST (min/max row-group skipping applies),
    then the column is converted for downstream semantics."""
    import datetime as dt

    ensure_session_conf(spark)
    df = spark.read.parquet(table_path(sf_dir, "events"))
    dtypes = dict(df.dtypes)
    if dtypes.get("ts") != "bigint":  # plain-timestamp layout
        # NTZ cast BEFORE the filter: comparing a string bound against
        # a timestamp_ntz column coerces the bound to NTZ by DROPPING
        # its UTC offset (empirically: '13:00:00+02:00' becomes a
        # naive 13:00 instead of 11:00 UTC), silently diverging from
        # the bigint branch, which honors offsets (round-7 review
        # finding). Casting to the session (UTC) timestamp first makes
        # the string comparison offset-aware.
        if dtypes.get("ts") == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        if ts_between:
            df = df.where(F.col("ts").between(*ts_between))
        return df
    if ts_between:

        def _to_ns(b: str) -> int:
            d = dt.datetime.fromisoformat(b)
            # naive bounds mean session-UTC; offset-AWARE bounds keep
            # their offset (blindly .replace-ing tzinfo shifted them,
            # diverging from the plain-timestamp branch where Spark's
            # cast honors the offset)
            if d.tzinfo is None:
                d = d.replace(tzinfo=dt.timezone.utc)
            # integer-exact ns: timestamp() is a double whose ~1e-7 s
            # granularity at 2024 epochs truncated fractional-second
            # bounds ~100 ns low (excluding rows AT an inclusive hi);
            # whole seconds are exactly representable, microseconds
            # ride separately
            whole = d.replace(microsecond=0)
            return int(whole.timestamp()) * 10**9 + d.microsecond * 1000

        lo, hi = (_to_ns(b) for b in ts_between)
        df = df.where(F.col("ts").between(lo, hi))
    return df.withColumn(
        "ts", F.expr("timestamp_micros((ts - pmod(ts, 1000)) div 1000)")
    )


def register_views(
    spark: SparkSession, sf_dir: str, only: tuple[str, ...] | None = None
) -> dict[str, DataFrame]:
    """Register fixture tables as temp views (for spark.sql). Pass
    ``only`` to register just the tables a query touches — each
    registration costs a parquet-footer read."""
    names = TABLES if only is None else only
    dfs = {t: load_table(spark, sf_dir, t) for t in names}
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
