"""The Arrow-vectorized hot paths (operators.similarity.dot_arrow,
pq_reconstruct_arrow) claim BIT-IDENTICAL doubles to the interpreted
HOF-expression twins — that equivalence is what lets the fast path
ship without touching a single oracle. Pin it on hostile inputs:
random vectors, exact distance ties (duplicate code vectors, where
only the first-wins argmin rule keeps the two paths aligned), and
negative / denormal-ish magnitudes. Comparison is on the raw doubles
(collected and compared with ==, no rounding)."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from serverless_datalake_spark.operators.similarity import (
    dot,
    dot_arrow,
    ivf_assign_arrow,
    ivf_assign_expr,
    pq_reconstruct_arrow,
    pq_reconstruct_expr,
)

M, D, NCODES = 4, 4, 8
DIM = M * D


def _vec(rng, dim, scale=1.0):
    return [rng.uniform(-scale, scale) for _ in range(dim)]


def _codebook_rows(rng):
    rows = []
    for s in range(M):
        for j in range(NCODES):
            rows.append({"s": s, "code_id": j, "code_vec": _vec(rng, D)})
    # exact-tie trap: code 3 duplicates code 1 in every subspace — a
    # vector nearest to that entry ties exactly, and only the
    # earliest-code-id rule keeps expr and arrow identical
    for s in range(M):
        rows[s * NCODES + 3]["code_vec"] = list(rows[s * NCODES + 1]["code_vec"])
    return rows


def test_pq_reconstruct_arrow_bitwise_equals_expr(spark):
    rng = random.Random(7)
    cb = _codebook_rows(rng)
    data = [(i, _vec(rng, DIM, scale=10.0 ** rng.randint(-3, 2))) for i in range(300)]
    # rows sitting EXACTLY on a duplicated code → guaranteed ties
    for i in range(300, 320):
        hit = [x for s in range(M) for x in cb[s * NCODES + 1]["code_vec"]]
        data.append((i, hit))
    df = spark.createDataFrame(data, "id long, v array<double>")

    expr_out = df.select(
        "id", pq_reconstruct_expr(cb, M, D, NCODES, "v").alias("r")
    )
    arrow_out = df.select(
        "id", pq_reconstruct_arrow(cb, M, D, NCODES, "v").alias("r")
    )
    e = {r["id"]: r["r"] for r in expr_out.collect()}
    a = {r["id"]: r["r"] for r in arrow_out.collect()}
    assert e.keys() == a.keys()
    for k in e:
        assert e[k] == a[k], f"row {k}: expr != arrow (not bit-identical)"


def test_pq_reconstruct_arrow_residual_base_readd(spark):
    """base= path: reconstruct(v - base) + base must equal doing the
    same three steps with the expression primitives."""
    rng = random.Random(11)
    cb = _codebook_rows(rng)
    data = [(i, _vec(rng, DIM), _vec(rng, DIM)) for i in range(200)]
    df = spark.createDataFrame(data, "id long, v array<double>, c array<double>")

    expr_out = df.select(
        "id",
        F.zip_with(
            "c",
            pq_reconstruct_expr(
                cb, M, D, NCODES, "zip_with(v, c, (x, y) -> x - y)"
            ),
            lambda x, y: x + y,
        ).alias("r"),
    )
    arrow_out = df.select(
        "id", pq_reconstruct_arrow(cb, M, D, NCODES, "v", base="c").alias("r")
    )
    e = {r["id"]: r["r"] for r in expr_out.collect()}
    a = {r["id"]: r["r"] for r in arrow_out.collect()}
    for k in e:
        assert e[k] == a[k], f"row {k}: residual expr != arrow"


def test_ivf_assign_arrow_equals_expr(spark):
    """Cell assignment: same cosine arithmetic, same earliest-id tie
    rule. Centroid 5 duplicates centroid 2 exactly — rows nearest that
    direction tie, and both paths must pick id 2."""
    rng = random.Random(17)
    cents = [
        {"centroid_id": j, "centroid": _vec(rng, DIM)} for j in range(8)
    ]
    cents[5]["centroid"] = list(cents[2]["centroid"])
    data = [(i, _vec(rng, DIM, scale=10.0 ** rng.randint(-3, 2))) for i in range(300)]
    # rows exactly ON the duplicated centroid direction (scaled — the
    # cosine is scale-invariant up to fp rounding, plus the exact vec)
    data += [(300 + j, [x * 2.0 for x in cents[2]["centroid"]]) for j in range(5)]
    data.append((310, list(cents[2]["centroid"])))
    df = spark.createDataFrame(data, "id long, v array<double>")
    both = df.select(
        "id",
        ivf_assign_expr(cents, "v").alias("e"),
        ivf_assign_arrow(cents, "v").alias("a"),
    ).collect()
    for r in both:
        assert r["e"] == r["a"], f"row {r['id']}: expr {r['e']} != arrow {r['a']}"
    exact = {r["id"]: r["a"] for r in both if r["id"] >= 300}
    assert set(exact.values()) == {2}, exact  # tie broken to smaller id


def test_dot_arrow_bitwise_equals_fold(spark):
    rng = random.Random(13)
    data = [
        (i, _vec(rng, 96, scale=10.0 ** rng.randint(-6, 3)), _vec(rng, 96))
        for i in range(500)
    ]
    df = spark.createDataFrame(data, "id long, a array<double>, b array<double>")
    both = df.select(
        "id",
        dot(F.col("a"), F.col("b")).alias("fold"),
        dot_arrow("a", "b").alias("arrow"),
    ).collect()
    for r in both:
        assert r["fold"] == r["arrow"], f"row {r['id']}: dot fold != arrow"
        assert not math.isnan(r["arrow"])


def test_arrow_twins_batching_independent(spark):
    """Forcing 7-row Arrow batches must not change a single double —
    every kernel is row-local, so batch boundaries are invisible. This
    pins the claim that the twins are safe at ANY executor batch size
    (the production maxRecordsPerBatch is 10k; a regression that
    accumulated state across rows inside a batch would pass the
    single-batch tests above and corrupt results only at scale)."""
    rng = random.Random(23)
    cb = _codebook_rows(rng)
    data = [(i, _vec(rng, DIM), _vec(rng, DIM)) for i in range(100)]
    df = spark.createDataFrame(data, "id long, v array<double>, c array<double>")
    cents = [{"centroid_id": j, "centroid": _vec(rng, DIM)} for j in range(6)]

    def run():
        out = df.select(
            "id",
            pq_reconstruct_arrow(cb, M, D, NCODES, "v", base="c").alias("r"),
            dot_arrow("v", "c").alias("d"),
            ivf_assign_arrow(cents, "v").alias("cell"),
        ).collect()
        return {r["id"]: (r["r"], r["d"], r["cell"]) for r in out}

    base = run()
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        small = run()
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert base == small
