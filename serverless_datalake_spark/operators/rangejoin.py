"""Binned point-in-interval range join.

A pure range join (no equi key) — `point BETWEEN start AND end` — is
planned by Spark as BroadcastNestedLoopJoin (O(n·m) comparisons and an
unconditional broadcast), which does not survive fact-sized inputs.
This operator rewrites it as an equi join on a time *bin*:

  * every interval is exploded to the bins it overlaps
    (floor(start/w) .. floor(end/w));
  * every point belongs to exactly one bin (floor(p/w));
  * the join runs bin = bin (shuffle/broadcast HASH join, Catalyst's
    choice) with the BETWEEN kept as a residual filter.

Each qualifying (point, interval) pair meets in exactly one bin — the
point's — so no post-join dedup is needed. Cost is O(matches +
intervals · span/w): pick `bin_width` near the typical interval
length so each interval lands in ~1–2 bins. This is the same
generalization of the reference's sort-key BETWEEN scan
(src/event_replayer/lambda_function.py:28–38) that range-join
optimizations in warehouse engines implement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BIN = "__bin"


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
) -> DataFrame:
    """Inner-join rows of `points` to every interval containing them.

    `point_col`, `start_col`, `end_col` must be numeric (e.g. epoch
    seconds; cast timestamps first). `bin_width` is in the same unit.
    Output columns: all of points', then all of intervals'.
    """

    def bin_of(c: Column) -> Column:
        return F.floor(c / F.lit(bin_width)).cast("long")

    iv = intervals.withColumn(
        _BIN,
        F.explode(
            F.sequence(bin_of(F.col(start_col)), bin_of(F.col(end_col)))
        ),
    )
    pt = points.withColumn(_BIN, bin_of(F.col(point_col)))
    residual = F.col(point_col).between(F.col(start_col), F.col(end_col))
    return pt.join(iv, on=_BIN, how="inner").where(residual).drop(_BIN)
