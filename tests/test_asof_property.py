"""Property-based as-of join check: on randomized event histories the
union+last composition must equal the naive per-row maximum-earlier
match, including duplicate timestamps, empty sides, and unmatched
keys. Few examples — each spins Spark jobs — but hypothesis shrinks
failures to minimal histories."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from serverless_datalake_spark.operators.asof import asof_join

BASE = dt.datetime(2024, 1, 1)

event = st.tuples(
    st.integers(min_value=0, max_value=3),  # key
    st.integers(min_value=0, max_value=50),  # minutes offset (dups allowed)
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(event, min_size=1, max_size=12),
    right=st.lists(event, min_size=0, max_size=12),
)
def test_asof_equals_naive_on_random_histories(spark, left, right):
    mk = lambda rows: [(k, BASE + dt.timedelta(minutes=m)) for k, m in rows]
    ldf = spark.createDataFrame(mk(left), "user_id long, ts timestamp").distinct()
    rdf = spark.createDataFrame(
        mk(right) or [(99, BASE)], "user_id long, ts timestamp"
    )
    if not right:
        rdf = rdf.where(F.lit(False))  # empty right side

    for direction, cmp_fn, agg_fn in (
        ("backward", lambda r, l: r <= l, F.max),
        ("forward", lambda r, l: r >= l, F.min),
    ):
        fast = asof_join(
            ldf, rdf, on="user_id", left_ts="ts", right_ts="ts",
            right_cols=["ts"], direction=direction,
        )
        cond = (F.col("l.user_id") == F.col("r.user_id")) & cmp_fn(
            F.col("r.ts"), F.col("l.ts")
        )
        naive = (
            ldf.alias("l")
            .join(rdf.alias("r"), cond, "left")
            .groupBy(F.col("l.user_id").alias("user_id"), F.col("l.ts").alias("ts"))
            .agg(agg_fn("r.ts").alias("asof_ts"))
        )
        got = {(r["user_id"], r["ts"], r["asof_ts"]) for r in fast.collect()}
        want = {(r["user_id"], r["ts"], r["asof_ts"]) for r in naive.collect()}
        assert got == want, direction
