"""Skew-stress harness (round-8 verdict #7): prove the mitigations
FIRE, don't just measure imbalance.

audit_partition_skew (queries/datapipe.py) measures key skew in the
fixtures; these tests run the flagship join/agg shapes against a
deliberately Zipf-skewed synthetic relation (hot key = 40% of all
rows — far beyond anything the TPC-H-ish fixtures produce) and
assert, structurally and arithmetically, that each mitigation engages:

* reducer-load arithmetic — Spark's HashPartitioning places a row by
  pmod(murmur3(keys), n) which is exactly F.hash, so the per-reducer
  row load of any planned shuffle is computable as a DataFrame query.
  Salting must cut the max load by the salting factor's order.
* AQE skew-join split — the executed plan must carry
  SortMergeJoin(skew=true) + "AQEShuffleRead … skewed" when the
  runtime thresholds qualify the hot partition, and must NOT when the
  feature is off (negative control proves the assertion bites).
* salted_agg / explode_salt_join — exactness on the hostile input
  (identical duplicate rows in the hot key — the case a content-hash
  salt cannot spread; operators/skew.py salts by row position) plus
  the structural spread proof (hot key occupies ALL salt buckets).

Wall-clock before/after lives in SCALE.md ("Round 9 — skew stress"),
measured once under the protocol; tests assert only deterministic
facts so they never flake on box weather.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from serverless_datalake_spark.operators import skew
from serverless_datalake_spark.operators.skew import _SALT, _salt_col

N = 1_200_000
HOT_SHARE = 0.4  # key 0 owns 40% of rows
N_KEYS = 20_000


def _zipfish(spark, n=N, seed_shift=0):
    """Deterministic hot-key relation: key 0 gets 40% of rows, the
    rest spread ~uniformly over N_KEYS keys (xxhash64 — no RNG, so
    re-runs and both sides of any comparison see identical data)."""
    return spark.range(n).select(
        F.when(F.col("id") % 5 < 2, F.lit(0))
        .otherwise(F.pmod(F.xxhash64(F.col("id") + seed_shift), F.lit(N_KEYS)) + 1)
        .alias("k"),
        (F.col("id") % 97).alias("v"),
    )


def _max_reducer_load(df, key_cols, n_partitions=32) -> int:
    """Exact rows-per-reducer of a hash shuffle on key_cols:
    HashPartitioning = pmod(Murmur3(keys), n) = pmod(F.hash, n)."""
    return (
        df.groupBy(F.pmod(F.hash(*key_cols), F.lit(n_partitions)).alias("pid"))
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )


def test_salting_cuts_max_reducer_load(spark):
    """The arithmetic the mitigation exists for: a 40%-hot key sends
    ~480k rows through one reducer; salted on (k, salt32) the max
    load must drop by >3x (exact factor depends on hash collisions
    among the 20k cold keys, so assert the order, not the constant)."""
    fact = _zipfish(spark)
    plain = _max_reducer_load(fact, ["k"])
    salted = _max_reducer_load(fact.withColumn(_SALT, _salt_col(32)), ["k", _SALT])
    assert plain >= int(N * HOT_SHARE)  # the hot key really is one reducer's load
    assert salted * 3 < plain, (plain, salted)


def test_aqe_skew_join_split_fires(spark):
    """Run the flagship skewed fact-dim equi-join shape under AQE with
    thresholds the hot partition qualifies for, and assert the
    EXECUTED plan shows the split: SortMergeJoin(skew=true) and an
    AQEShuffleRead marked skewed. Negative control: same join with
    skewJoin disabled shows neither — proving the positive assertion
    can actually fail."""
    fact = _zipfish(spark)
    dim = spark.range(N_KEYS + 1).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("w")
    )
    saved = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.adaptive.skewJoin.enabled": spark.conf.get(
            "spark.sql.adaptive.skewJoin.enabled"
        ),
    }
    tuned = {
        # force SMJ (broadcast would dodge the shuffle entirely) and
        # scale the skew thresholds to test-sized data: defaults are
        # 256 MB partitions, which a 1.2M-row fixture never reaches
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    }

    def run(skew_enabled: bool) -> str:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", str(skew_enabled).lower()
        )
        j = fact.join(dim, "k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
        )
        row = j.collect()[0]
        assert row["n"] == N  # every fact row matched exactly one dim row
        return j._jdf.queryExecution().executedPlan().toString()

    try:
        for key, val in tuned.items():
            spark.conf.set(key, val)
        plan_on = run(skew_enabled=True)
        plan_off = run(skew_enabled=False)
    finally:
        for key, val in saved.items():
            spark.conf.set(key, val)
        for key in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        ):
            spark.conf.unset(key)

    assert "skew=true" in plan_on, plan_on[:2000]
    assert "skewed" in plan_on, plan_on[:2000]
    assert "skew=true" not in plan_off
    assert "skewed" not in plan_off


def test_salted_agg_exact_and_spreads_duplicate_hot_rows(spark):
    """salted_agg on the HOSTILE input: the hot key's rows are
    byte-identical duplicates, so a content-hash salt would land them
    all in one bucket. Assert (a) exactness vs the plain groupBy and
    (b) the partial phase really spread the hot key over all 32 salt
    buckets (the structural proof the mitigation fired)."""
    fact = _zipfish(spark).withColumn(
        "v", F.when(F.col("k") == 0, F.lit(7)).otherwise(F.col("v"))
    )  # hot rows now identical (k=0, v=7)
    buckets = 32
    got = skew.salted_agg(
        fact, "k", {"n": "count(*)", "sv": "sum(v)", "mx": "max(v)"}, buckets=buckets
    ).select("k", F.col("n").alias("g_n"), F.col("sv").alias("g_sv"), F.col("mx").alias("g_mx"))
    want = fact.groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("sv"), F.max("v").alias("mx")
    )
    joined = got.join(want, "k", "full")
    diff = joined.where(
        F.col("g_n").isNull()
        | F.col("n").isNull()
        | (F.col("g_n") != F.col("n"))
        | (F.col("g_sv") != F.col("sv"))
        | (F.col("g_mx") != F.col("mx"))
    )
    assert diff.count() == 0
    hot_buckets = (
        fact.withColumn(_SALT, _salt_col(buckets))
        .where(F.col("k") == 0)
        .select(_SALT)
        .distinct()
        .count()
    )
    assert hot_buckets == buckets


def test_explode_salt_join_exact_on_hot_key(spark):
    """explode_salt_join vs the plain join on the skewed fact:
    identical aggregate over the join output (comparing 1.2M joined
    rows directly would dominate the test; the (count, sum) pair over
    a join is injective enough to catch dropped/duplicated matches)."""
    fact = _zipfish(spark)
    dim = spark.range(N_KEYS + 1).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("w")
    )
    plain = fact.join(dim, "k").agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("v") * F.col("w")).alias("s")
    ).collect()[0]
    salted = skew.explode_salt_join(fact, dim, on="k", buckets=16).agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("v") * F.col("w")).alias("s")
    ).collect()[0]
    assert (plain["n"], plain["s"]) == (salted["n"], salted["s"])
