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


def test_arrow_twins_degenerate_inputs(spark):
    """Review-found edges: NULL vectors must yield NULL (not crash
    np.stack); a zero-norm vector's normalized form has NULL elements
    in SQL, so dot_arrow must yield NULL (never NaN — Spark predicates
    treat NaN as larger than any threshold, which would flip a dedup
    filter); a zero-norm FIRST centroid makes every SQL fold score
    NULL-sticky, so assignment lands on the first id in both paths."""
    rng = random.Random(29)
    cb = _codebook_rows(rng)

    # NULL arrays → NULL out, valid rows unaffected
    data = [(0, _vec(rng, DIM), _vec(rng, DIM)), (1, None, _vec(rng, DIM)),
            (2, _vec(rng, DIM), None), (3, None, None)]
    df = spark.createDataFrame(data, "id long, a array<double>, b array<double>")
    rows = {r["id"]: r for r in df.select(
        "id",
        dot_arrow("a", "b").alias("d"),
        pq_reconstruct_arrow(cb, M, D, NCODES, "a").alias("r"),
        pq_reconstruct_arrow(cb, M, D, NCODES, "a", base="b").alias("rb"),
    ).collect()}
    assert rows[0]["d"] is not None and rows[0]["r"] is not None
    assert rows[1]["d"] is None and rows[1]["r"] is None and rows[1]["rb"] is None
    assert rows[2]["d"] is None and rows[2]["rb"] is None
    assert rows[3]["d"] is None

    # NULL ELEMENTS inside the array (the session is ANSI, so x/0
    # raises rather than producing these; NULL elements arrive from
    # data or try_divide): expression dot folds to NULL, arrow dot
    # must be NULL too (never NaN — NaN would pass a >= threshold)
    z = spark.sql(
        "SELECT array(CAST(NULL AS DOUBLE), 1.0D, 2.0D, 3.0D) AS u, "
        "array(1.0D, 1.0D, 1.0D, 1.0D) AS w"
    )
    got = z.select(
        dot(F.col("u"), F.col("w")).alias("e"), dot_arrow("u", "w").alias("a")
    ).collect()[0]
    assert got["e"] is None and got["a"] is None

    # zero-norm centroids: under ANSI (the session default) the SQL
    # expression RAISES on the 0 denominator — it can never produce a
    # result to diverge from; with ANSI off its divide yields NULL and
    # the fold is NULL-STICKY on the first centroid's score. The Arrow
    # twin replicates the non-ANSI semantics (zero-norm FIRST centroid
    # → every row lands on the first id; zero-norm later centroid →
    # never chosen), so the twins agree whenever the expr returns.
    import pytest
    from pyspark.errors.exceptions.captured import ArithmeticException

    cents = [{"centroid_id": j, "centroid": _vec(rng, DIM)} for j in range(4)]
    cents[0]["centroid"] = [0.0] * DIM
    dfv = spark.createDataFrame(
        [(i, _vec(rng, DIM)) for i in range(20)], "id long, v array<double>"
    )
    with pytest.raises(ArithmeticException):
        dfv.select(ivf_assign_expr(cents, "v").alias("e")).collect()
    got = dfv.select(ivf_assign_arrow(cents, "v").alias("a")).collect()
    assert all(r["a"] == 0 for r in got)  # NULL-sticky first centroid

    cents2 = [{"centroid_id": j, "centroid": _vec(rng, DIM)} for j in range(4)]
    cents2[2]["centroid"] = [0.0] * DIM
    got2 = dfv.select(ivf_assign_arrow(cents2, "v").alias("a")).collect()
    assert all(r["a"] is not None and r["a"] != 2 for r in got2)

    # incomplete codebook fails LOUD at build (the expr twin KeyErrors)
    with pytest.raises(ValueError, match="missing"):
        pq_reconstruct_arrow(cb[:-1], M, D, NCODES, "a")


def test_lsh_bucket_arrow_equals_expr(spark):
    """Signature twin: same sequential plane dots, same strict > 0
    sign test, same 2^j packing. Includes vectors with an EXACT zero
    dot against plane 0 (all-ones input against a ±1 plane with equal
    +1/-1 counts sums to exactly 0.0 — the strict > keeps bit 0 off
    in both paths), plus float32-typed input (the embeddings column
    type; widening to double is exact)."""
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        LongType,
        StructField,
        StructType,
    )

    from serverless_datalake_spark.operators.similarity import (
        _hyperplanes,
        lsh_bucket,
        lsh_bucket_arrow,
    )

    rng = random.Random(31)
    P, DIMV = 6, 16
    planes = _hyperplanes(P, DIMV)
    rows = [(i, [rng.uniform(-2, 2) for _ in range(DIMV)]) for i in range(200)]
    # exact-zero trap: ones vector dotted with a balanced ±1 plane
    if sum(planes[0]) == 0:
        rows.append((200, [1.0] * DIMV))
    rows.append((201, [0.0] * DIMV))  # zero vector: all dots exactly 0
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("v", ArrayType(FloatType())),  # embeddings dtype
        ]
    )
    df = spark.createDataFrame(rows, schema)
    both = df.select(
        "id",
        lsh_bucket("v", P, DIMV).alias("e"),
        lsh_bucket_arrow("v", P, DIMV).alias("a"),
    ).collect()
    for r in both:
        assert r["e"] == r["a"], f"row {r['id']}: {r['e']} != {r['a']}"
    assert [r["a"] for r in both if r["id"] == 201] == [0]


def test_single_centroid_and_single_code_do_not_crash(spark):
    """n == 1 degenerate shapes: sequence(1, 0) runs DESCENDING in
    Spark, so the argmax/argmin folds used to probe index 2 of a
    1-element score array and die under ANSI (round-7 review finding).
    One centroid must assign everything to it; a 1-entry codebook must
    reconstruct every segment from its only code."""
    import random as _random

    from serverless_datalake_spark.operators.similarity import (
        ivf_centroid_vec_expr,
    )

    rng = _random.Random(5)
    cents = [{"centroid_id": 3, "centroid": _vec(rng, DIM)}]
    df = spark.createDataFrame(
        [(i, _vec(rng, DIM)) for i in range(20)], "id long, v array<double>"
    )
    got = df.select(
        "id",
        ivf_assign_expr(cents, "v").alias("cid"),
        ivf_centroid_vec_expr(cents, "v").alias("cv"),
    ).collect()
    assert all(r["cid"] == 3 for r in got)
    assert all(r["cv"] == cents[0]["centroid"] for r in got)
    # 1-code codebook: every segment reconstructs to that code
    m, d = 4, DIM // 4
    cb = [
        {"s": s, "code_id": 0, "code_vec": [float(s)] * d} for s in range(m)
    ]
    rec = df.select(pq_reconstruct_expr(cb, m, d, 1, "v").alias("r")).collect()
    want = [x for s in range(m) for x in [float(s)] * d]
    assert all(r["r"] == want for r in rec)
