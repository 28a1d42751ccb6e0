"""Skew mitigation: salted aggregation and salted broadcast-side join.

AQE's skew-join splitting handles sort-merge joins automatically; the
cases it does NOT cover are (a) a hash aggregate where one key holds a
large fraction of all rows (one reducer becomes the stragglers), and
(b) exploding a hot key against a broadcast side. Salting fixes (a)
by two-phase aggregation: groupBy(key, salt) partial → groupBy(key)
final — the hot key's rows spread over `buckets` reducers and only
`buckets` partial rows meet in phase two. Exact for any algebraic
aggregate (count/sum/min/max); avg = sum/count at the end.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def _salt_col(buckets: int):
    """Row-position salt (see salted_agg docstring): spreads every row
    stream over `buckets` regardless of column entropy."""
    return F.pmod(F.monotonically_increasing_id(), F.lit(buckets))


def salted_agg(
    df: DataFrame,
    keys: str | Sequence[str],
    aggs: dict[str, str],
    buckets: int = 32,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column → "fn(input)" with fn in
    {count, sum, min, max, avg}. The salt is derived from the row's
    POSITION (monotonically_increasing_id = partition id << 33 | row
    offset), not its content: a content hash leaves a hot key made of
    byte-identical duplicate rows in ONE salt bucket, which is exactly
    the case salting exists for. Position spreads unconditionally —
    consecutive rows round-robin over the buckets — and any salt
    assignment is semantics-preserving for the two-phase algebraic
    aggregation.
    """
    key_cols = [keys] if isinstance(keys, str) else list(keys)
    salt = _salt_col(buckets)

    partial_exprs = []
    final_exprs = []
    for out, spec in aggs.items():
        fn, _, arg = spec.partition("(")
        arg = arg.rstrip(")")
        fn = fn.strip().lower()
        p = f"__p_{out}"
        if fn == "count":
            partial_exprs.append(F.count("*" if arg in ("", "*") else arg).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(arg).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(arg).alias(p))
            final_exprs.append(F.min(p).alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(arg).alias(p))
            final_exprs.append(F.max(p).alias(out))
        elif fn == "avg":
            partial_exprs.append(F.sum(arg).alias(p + "_s"))
            partial_exprs.append(F.count(arg).alias(p + "_c"))
            final_exprs.append((F.sum(p + "_s") / F.sum(p + "_c")).alias(out))
        else:
            raise ValueError(f"unsupported agg {fn!r} (algebraic aggs only)")

    partial = df.withColumn(_SALT, salt).groupBy(*key_cols, _SALT).agg(*partial_exprs)
    return partial.groupBy(*key_cols).agg(*final_exprs)


def explode_salt_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    buckets: int = 8,
) -> DataFrame:
    """Hot-key equi-join: salt the skewed side, replicate the small
    side across all salt values (explode), join on (key, salt). The
    small side grows ×buckets — acceptable because it is broadcast.
    Position-derived salt, as in salted_agg: identical duplicate rows
    must spread too."""
    s = skewed.withColumn(_SALT, _salt_col(buckets))
    replicated = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return s.join(F.broadcast(replicated), [on, _SALT]).drop(_SALT)
