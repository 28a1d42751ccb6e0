"""As-of join (nearest-earlier match) as a DataFrame composition.

Spark has no native as-of join (SURVEY.md §4.3). The naive encoding —
range join + row_number — explodes to O(|L|·|R|) per key before
pruning. This implementation uses the union + last(ignorenulls) trick:

  1. tag left rows (sort_rank=1) and right rows (sort_rank=0),
  2. union by name,
  3. one window over (keys, ts, sort_rank) carrying the latest
     right-row payload forward with last(..., ignorenulls=True),
  4. keep left rows.

Cost: ONE shuffle on the join keys + a sort within partitions —
linear in |L|+|R|, no pair explosion; survives 100× scale-up as long
as a single key's history fits a partition (salt-by-time-range if a
key is pathologically hot).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SORT_TS = "__asof_sort_ts"
_RANK = "__asof_rank"
_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    prefix: str = "asof_",
    direction: str = "backward",
    tolerance_sec: float | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row within the same
    ``on`` key(s): direction="backward" → greatest ``right_ts`` <=
    ``left_ts`` (default); direction="forward" → smallest ``right_ts``
    >= ``left_ts`` (same composition with the sort flipped).

    Attached columns are named ``{prefix}{col}``; all-null when no
    matching right row exists (left-outer semantics).

    ``tolerance_sec`` (pandas merge_asof's ``tolerance``): a match
    further than this many seconds from ``left_ts`` is discarded —
    the attached columns go null, exactly as if no right row existed.
    Applied as a post-fill mask on the carried payload (the matched
    timestamp rides inside the payload struct), so the plan cost is
    unchanged: still ONE shuffle, no range join.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on_cols = [on] if isinstance(on, str) else list(on)
    _MATCH_TS = "__asof_match_ts"

    l_tagged = (
        left.withColumn(_SORT_TS, F.col(left_ts))
        .withColumn(_RANK, F.lit(1))
        .withColumn(
            _PAYLOAD,
            F.lit(None).cast(
                "struct<"
                + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_cols)
                + f",{_MATCH_TS}:{right.schema[right_ts].dataType.simpleString()}>"
            ),
        )
    )
    r_tagged = right.select(
        *on_cols,
        F.col(right_ts).alias(_SORT_TS),
        F.lit(0).alias(_RANK),
        F.struct(
            *[F.col(c) for c in right_cols], F.col(right_ts).alias(_MATCH_TS)
        ).alias(_PAYLOAD),
    )

    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    # Backward: ascending scan, right rows sort before left at equal
    # ts so "at-or-before" includes exact ties. Forward: descending
    # scan, same tie rule gives "at-or-after".
    ts_order = F.col(_SORT_TS).asc() if direction == "backward" else F.col(_SORT_TS).desc()
    w = (
        Window.partitionBy(*on_cols)
        .orderBy(ts_order, F.col(_RANK).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w))

    out = filled.where(F.col(_RANK) == 1)
    if tolerance_sec is not None:
        within = (
            F.abs(
                F.col(left_ts).cast("double") - F.col(_PAYLOAD)[_MATCH_TS].cast("double")
            )
            <= F.lit(float(tolerance_sec))
        )
        for c in right_cols:
            out = out.withColumn(f"{prefix}{c}", F.when(within, F.col(_PAYLOAD)[c]))
    else:
        for c in right_cols:
            out = out.withColumn(f"{prefix}{c}", F.col(_PAYLOAD)[c])
    return out.drop(_SORT_TS, _RANK, _PAYLOAD)
