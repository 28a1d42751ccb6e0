"""Distributed global ordering primitives — rank / running sum / NTILE
over a total order WITHOUT a single-partition window.

`Window.orderBy(...)` with no partitionBy serializes the whole relation
through ONE task (Spark warns `WindowExec: No Partition Defined`).
Fine for value-grain relations (a few hundred rows); wrong for
entity-grain ones (customers, parts, vocabulary) that grow with the
data. The classic fix is the two-pass range-partitioned rank:

  1. `repartitionByRange` on the (total) order key — each partition
     holds a contiguous, disjoint key range;
  2. materialize the partition id into the rows, count/sum per
     partition (a partition-count-sized aggregate, collected to the
     driver — constant size);
  3. rank/cumsum WITHIN each partition (parallel windows partitioned
     by pid) and add the broadcast per-partition offset.

The result is bit-identical to the global window (the order key must
be a total order — include a unique tiebreaker) while every sort and
window runs partition-parallel. This is the same decomposition
Spark's own SQL `RANK` physical rewrite would want and what
Snowflake/BigQuery do under the hood for global ORDER BY analytics.

The relation is persisted for the duration of the two passes so the
offsets observed in pass 1 describe exactly the partitions ranked in
pass 2 (repartitionByRange samples its bounds; caching pins them).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["with_global_rank", "with_global_cumsum", "with_global_ntile"]


def _range_indexed(df: DataFrame, order_cols: list[Column], num_partitions: int):
    """Range-partition df by the total order and materialize the
    partition id. Returns (persisted df with `__pid`, pid->rows counts
    dict, pid->value sums pass computed by callers)."""
    parted = (
        df.repartitionByRange(num_partitions, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    return parted


def _offset_expr(offsets: dict[int, int]) -> Column:
    if not offsets:
        return F.lit(0)
    return F.coalesce(
        F.element_at(
            F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
            F.col("__pid"),
        ),
        F.lit(0),
    )


def _ranked_with_n(
    df: DataFrame, order_cols: list[Column], out: str, num_partitions: int
) -> tuple[DataFrame, int]:
    parted = _range_indexed(df, order_cols, num_partitions)
    counts = {
        r["__pid"]: r["n"]
        for r in parted.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    ranked = parted.withColumn(
        out, (F.row_number().over(w) + _offset_expr(offsets)).cast("long")
    ).drop("__pid")
    return ranked, acc


def with_global_rank(
    df: DataFrame,
    order_cols: list[Column],
    out: str = "rank",
    num_partitions: int = 32,
) -> DataFrame:
    """row_number() over a GLOBAL total order, computed with parallel
    per-range windows + broadcast offsets. `order_cols` must be a
    total order (append a unique key as tiebreaker)."""
    return _ranked_with_n(df, order_cols, out, num_partitions)[0]


def with_global_cumsum(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str,
    out: str = "cum",
    num_partitions: int = 32,
) -> DataFrame:
    """SUM(value) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING) over a
    global total order, as per-range running sums + broadcast prior-
    partition totals. Exact for integer value columns (offset addition
    is associative); for floats the result matches the global window
    only up to summation-order effects — use integer units on hot
    paths (the repo rule)."""
    parted = _range_indexed(df, order_cols, num_partitions)
    sums = {
        r["__pid"]: r["s"]
        for r in parted.groupBy("__pid")
        .agg(F.sum(value_col).alias("s"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid] or 0
    off = _offset_expr(offsets)
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        parted.withColumn(out, (F.sum(value_col).over(w) + off).cast("long"))
        .drop("__pid")
    )


def with_global_ntile(
    df: DataFrame,
    order_cols: list[Column],
    k: int,
    out: str = "ntile",
    num_partitions: int = 32,
) -> DataFrame:
    """NTILE(k) over a global total order via the distributed rank.
    Reproduces Spark/ANSI NTILE bucket sizing exactly: with n rows,
    the first (n mod k) buckets hold ceil(n/k) rows, the rest
    floor(n/k)."""
    ranked, n = _ranked_with_n(df, order_cols, "__rnk", num_partitions)
    q, rem = divmod(n, k)
    r0 = F.col("__rnk") - 1  # 0-based
    big = rem * (q + 1)  # rows covered by the ceil-sized buckets
    tile = F.when(
        r0 < big, F.floor(r0 / F.lit(q + 1)) + 1
    ).otherwise(F.lit(rem) + F.floor((r0 - big) / F.lit(max(q, 1))) + 1)
    return ranked.withColumn(out, tile.cast("long")).drop("__rnk")
