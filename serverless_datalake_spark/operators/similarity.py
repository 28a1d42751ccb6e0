"""Vector-similarity search over embedding columns (north star).

Three tiers:
* brute-force cosine top-k — the correctness baseline (oracle twin);
  broadcast the query set, scan the corpus once, per-group top-k;
* random-hyperplane LSH — bucketed approximate search: one cheap
  signature per vector, search only the query's bucket;
* IVF — corpus partitioned by nearest centroid, queries probe the
  nprobe closest centroid partitions.

Dot products are deterministic sequential folds (double precision,
fixed summation order → oracle-matchable) with TWO interchangeable
implementations: array HOFs (zip_with + aggregate — zero Python, used
on scan-shaped paths) and Arrow-vectorized pandas UDFs with the SAME
fold order (dot_arrow / pq_reconstruct_arrow — used on the hot
quadratic/encode paths, where interpreted HOF eval costs ~100× more
per row than a vectorized batch; Spark never codegens higher-order
functions). Both produce bit-identical doubles, so either side of an
A/B stays oracle-green. At real scale the corpus side stays columnar
and partitioned by bucket/centroid id so a probe is a partition-pruned
scan, and the Arrow encode is the FAISS design point (SIMD ADC over
code batches).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window

from serverless_datalake_spark.operators import pin as _pin
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    da, db = _as_double(a), _as_double(b)
    return dot(da, db) / (norm(da) * norm(db))


def _stack_valid(*series):
    """Row-validity mask + stacked matrices for Arrow kernels: a NULL
    array on any input marks the row invalid (the expression twins
    return NULL for such rows; np.stack would crash on the None).
    Returns (mask, [matrix_of_valid_rows, ...])."""
    cols = [s.to_numpy() for s in series]
    mask = np.array(
        [all(v is not None for v in row) for row in zip(*cols)], dtype=bool
    )
    mats = [
        np.stack([v for v, ok in zip(c, mask) if ok]) if mask.any() else None
        for c in cols
    ]
    return mask, mats


def dot_arrow(a: Column | str, b: Column | str) -> Column:
    """Arrow-vectorized twin of ``dot`` for HOT pair-scoring paths
    (quadratic candidate sets): bit-identical to the expression fold —
    the accumulator adds term t in index order starting from 0.0, the
    exact left-fold summation order — but vectorized across the Arrow
    batch instead of interpreted per row (HOFs never enter whole-stage
    codegen; measured ~10 µs/pair at d=96 interpreted vs ~0.1 µs
    vectorized). Inputs must already be array<double>.

    Degenerate inputs: a NULL array, or a NULL ELEMENT (Spark's
    non-ANSI x/0, e.g. a zero-norm normalize upstream), yields NULL —
    exactly the expression fold's NULL propagation. Arrow delivers
    NULL elements to the kernel as NaN, so a NaN fold result maps to
    NULL here; genuinely-NaN data elements (which the expression would
    propagate as NaN, and which Spark predicates then treat as LARGER
    than any threshold) therefore also land on NULL — the repo's
    fixture/parquet data is NaN-free, so only the NULL source is
    reachable, and NULL is the filter-safe answer for both."""
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def _dot(va: pd.Series, vb: pd.Series) -> pd.Series:
        if len(va) == 0:
            return pd.Series([], dtype=np.float64)
        mask, (A, B) = _stack_valid(va, vb)
        out = [None] * len(mask)
        if A is not None:
            acc = np.zeros(A.shape[0], dtype=np.float64)
            for t in range(A.shape[1]):  # sequential over dims == fold order
                acc += A[:, t] * B[:, t]
            it = iter(acc)
            out = [float(next(it)) if ok else None for ok in mask]
            out = [None if (v is not None and math.isnan(v)) else v for v in out]
        return pd.Series(out, dtype=object)

    return _dot(
        a if isinstance(a, Column) else F.col(a),
        b if isinstance(b, Column) else F.col(b),
    )


def topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    vec: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k per query. The query set is broadcast (it is
    the small side by construction); the corpus is scanned once; the
    per-query window top-k benefits from WindowGroupLimit pushdown
    (partial top-k before the shuffle)."""
    q = queries.select(F.col(query_id), F.col(vec).alias("__qv"))
    c = corpus.select(F.col(corpus_id), F.col(vec).alias("__cv"))
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id,
        corpus_id,
        cosine(F.col("__qv"), F.col("__cv")).alias("score"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("score").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, corpus_id, F.round("score", 6).alias("score"), F.col("rank").cast("long").alias("rank"))
    )


def _hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random ±1 hyperplanes from md5 bits (no
    RNG state; same planes on every executor/run)."""
    planes = []
    for j in range(n_planes):
        coords = []
        for i in range(dim):
            h = hashlib.md5(f"plane:{j}:{i}".encode()).digest()
            coords.append(1.0 if h[0] & 1 else -1.0)
        planes.append(coords)
    return planes


def lsh_bucket(vec: Column | str, n_planes: int, dim: int) -> Column:
    """Random-hyperplane signature: bit j = sign(v · h_j); packed int.

    The plane matrix is ONE nested array literal (a single Literal
    node) indexed inside the lambda — unrolling it into n_planes × dim
    `lit()` nodes made the expression tree ~500 nodes per call site
    and tripled cold planning/codegen time (measured at sf0.1).

    Pass the vector COLUMN NAME (string) on hot paths: the whole
    expression then ships as one SQL string through F.expr — a single
    py4j round trip instead of hundreds of Column-API calls (measured
    ~1.0 s → ~5 ms per call site building the plan). The Column
    overload builds the identical expression through the DataFrame API
    (same Catalyst tree, same buckets)."""
    if isinstance(vec, str):
        planes_sql = "array(" + ",".join(
            "array(" + ",".join(f"{c}D" for c in p) + ")" for p in _hyperplanes(n_planes, dim)
        ) + ")"
        v_sql = f"transform({vec}, x -> CAST(x AS DOUBLE))"
        return F.expr(
            f"aggregate(transform(sequence(0, {n_planes - 1}), j -> "
            f"CASE WHEN aggregate(zip_with({v_sql}, element_at({planes_sql}, j + 1), "
            f"(x, c) -> x * c), 0.0D, (a, x) -> a + x) > 0 "
            f"THEN CAST(pow(2.0D, CAST(j AS DOUBLE)) AS INT) ELSE 0 END), "
            f"0, (a, x) -> a + x)"
        )
    planes = F.lit(_hyperplanes(n_planes, dim))
    v = _as_double(vec)
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(n_planes - 1)),
        lambda j: F.when(
            F.aggregate(
                F.zip_with(v, F.element_at(planes, j + 1), lambda x, c: x * c),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            > 0,
            F.pow(F.lit(2.0), j.cast("double")).cast("int"),
        ).otherwise(F.lit(0)),
    )
    return F.aggregate(bits, F.lit(0), lambda a, x: a + x)


def lsh_bucket_arrow(vec: Column | str, n_planes: int, dim: int) -> Column:
    """Arrow-vectorized twin of ``lsh_bucket`` (the per-row signature
    hot loop — n_planes × dim multiply-adds per vector). Bit-identical
    by the module's fold-order rule: each plane's dot accumulates
    sequentially over dims from 0.0 (±1 plane coefficients multiply
    exactly; float→double widening is exact), the sign test is the
    same strict ``> 0``, and bit j contributes 2^j via integer adds.
    NULL vectors yield a NULL bucket (the whole expression is NULL);
    a NULL ELEMENT zeroes that plane's bit in the expression (CASE
    over a NULL dot → ELSE 0) — here the NaN dot fails ``> 0`` the
    same way, so buckets agree."""
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import IntegerType

    planes = np.array(_hyperplanes(n_planes, dim), dtype=np.float64)

    @pandas_udf(IntegerType())
    def _bucket(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        mask, (V,) = _stack_valid(v)
        out = [None] * len(mask)
        if V is not None:
            V = V.astype(np.float64, copy=False)
            code = np.zeros(V.shape[0], dtype=np.int64)
            for j in range(n_planes):
                dj = np.zeros(V.shape[0], dtype=np.float64)
                for t in range(dim):  # sequential over dims == fold order
                    dj += V[:, t] * planes[j, t]
                code += (dj > 0).astype(np.int64) << j
            it = iter(code)
            out = [int(next(it)) if ok else None for ok in mask]
        return pd.Series(out, dtype=object)

    return _bucket(vec if isinstance(vec, Column) else F.col(vec))


def topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    vec: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates are corpus vectors sharing the
    query's hyperplane bucket; exact cosine re-rank inside the bucket.
    At scale, corpus is written partitionBy(bucket) → a query probes
    one partition instead of the whole corpus."""
    q = queries.select(
        F.col(query_id), F.col(vec).alias("__qv"),
        lsh_bucket_arrow(vec, n_planes, dim).alias("bucket"),
    )
    c = corpus.select(
        F.col(corpus_id), F.col(vec).alias("__cv"),
        lsh_bucket_arrow(vec, n_planes, dim).alias("bucket"),
    )
    scored = c.join(F.broadcast(q), "bucket").select(
        query_id, corpus_id, cosine(F.col("__qv"), F.col("__cv")).alias("score")
    )
    w = Window.partitionBy(query_id).orderBy(F.col("score").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, corpus_id, F.round("score", 6).alias("score"), F.col("rank").cast("long").alias("rank"))
    )


def topk_lsh_multiprobe(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    vec: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Multi-probe LSH: each query searches its own bucket PLUS every
    bucket at Hamming distance 1 (flip one signature bit) — n_planes+1
    probes recover most of the recall a vector near a hyperplane loses
    to single-probe, at ~(p+1)/2^p of the corpus scanned instead of a
    bigger index. Corpus side is unchanged (same at-rest layout as
    single-probe; probes are still partition-prunable)."""
    q = queries.select(
        F.col(query_id),
        F.col(vec).alias("__qv"),
        lsh_bucket_arrow(vec, n_planes, dim).alias("__b0"),
    )
    probes = q.select(
        query_id,
        "__qv",
        F.explode(
            F.array(
                F.col("__b0"),
                *[F.col("__b0").bitwiseXOR(F.lit(1 << j)) for j in range(n_planes)],
            )
        ).alias("bucket"),
    )
    c = corpus.select(
        F.col(corpus_id), F.col(vec).alias("__cv"),
        lsh_bucket_arrow(vec, n_planes, dim).alias("bucket"),
    )
    scored = c.join(F.broadcast(probes), "bucket").select(
        query_id, corpus_id, cosine(F.col("__qv"), F.col("__cv")).alias("score")
    )
    w = Window.partitionBy(query_id).orderBy(F.col("score").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            query_id,
            corpus_id,
            F.round("score", 6).alias("score"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def ivf_centroids(
    corpus: DataFrame, corpus_id: str, vec: str, by: str, mode: str = "mean"
) -> DataFrame:
    """Centroid per `by` group (the fixture's label column stands in
    for k-means assignment — deterministic, no iterative fitting).

    mode='mean': per-dimension average — the classic IVF centroid, but
    a distributed float sum whose low bits depend on partitioning.
    mode='medoid': the group's min-id member vector (sample-
    representative initialization) — bit-exact under ANY partitioning
    and in any engine, which is what the oracle-checked query uses."""
    if mode == "medoid":
        w = Window.partitionBy(by).orderBy(corpus_id)
        return (
            corpus.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select(F.col(by).alias("centroid_id"), _as_double(F.col(vec)).alias("centroid"))
        )
    exploded = corpus.select(F.col(by).alias("centroid_id"), F.posexplode(_as_double(F.col(vec))))
    means = exploded.groupBy("centroid_id", "pos").agg(F.avg("col").alias("m"))
    return (
        means.groupBy("centroid_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("centroid_id", F.transform("pm", lambda s: s["m"]).alias("centroid"))
    )


def _fold_dot(a: list[float], b: list[float]) -> float:
    """Left-to-right double fold — the Python twin of the sequential
    `aggregate(zip_with(...))` / `list_aggregate(list_transform(...))`
    folds both engines run; identical summation order ⇒ identical
    doubles."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _fold_cos(a: list[float], b: list[float]) -> float:
    import math

    return _fold_dot(a, b) / (math.sqrt(_fold_dot(a, a)) * math.sqrt(_fold_dot(b, b)))


def kcenter_rows(sample: list[tuple[int, list[float]]], k: int) -> list[dict]:
    """Deterministic farthest-point (greedy k-center) seeding over the
    training sample — the k-means++-style spread-maximizing init,
    derandomized: c0 is the smallest-id sample vector; each next
    center is the sample point with the SMALLEST maximum cosine to the
    already-chosen set (i.e. the farthest point under cosine
    similarity), ties to the smaller id.

    Pure driver-side arithmetic over ≤ sample_n rows, but every float
    op is the same fold/IEEE primitive the SQL twin uses (MAX over
    identical doubles is order-free), so DuckDB recomputes the exact
    same centers. Spread-out seeds cover the corpus' directions far
    better than whatever the first k labels/ids happen to hit, which
    is what lifts post-Lloyd's recall."""
    import math

    sample = sorted(sample, key=lambda r: r[0])
    vecs = [emb for _, emb in sample]
    # norms once per vector (identical doubles to the per-call sqrt)
    norms = [math.sqrt(_fold_dot(v, v)) for v in vecs]

    def cos_to(j: int, c: list[float], nc: float) -> float:
        denom = norms[j] * nc
        # zero-norm vectors score NaN (the SQL cosine's value) rather
        # than raising; NaN loses every comparison below
        return _fold_dot(vecs[j], c) / denom if denom != 0.0 else float("nan")

    chosen = [vecs[0]]
    nc0 = norms[0]
    # incremental farthest-point: maxsim_j only ever grows by the
    # NEWEST center, so track it per point — O(k·n) cosines instead of
    # the O(k²·n) recompute-over-all-chosen (identical floats: max
    # over the same values arrives at the same double; argmin keeps
    # the original first-strictly-smaller id-order tie-break)
    maxsim = [cos_to(j, chosen[0], nc0) for j in range(len(vecs))]
    for _ in range(1, k):
        best_j = 0
        for j in range(1, len(vecs)):
            if maxsim[j] < maxsim[best_j]:
                best_j = j
        newest = vecs[best_j]
        chosen.append(newest)
        nn = norms[best_j]
        for j in range(len(vecs)):
            s = cos_to(j, newest, nn)
            if s > maxsim[j]:
                maxsim[j] = s
    return [
        {"centroid_id": i, "centroid": list(map(float, c))} for i, c in enumerate(chosen)
    ]


def ivf_centroids_refined(
    corpus: DataFrame,
    corpus_id: str = "corpus_id",
    vec: str = "embedding",
    by: str = "label",
    dim: int = 64,
    refine_iters: int = 4,
    sample_n: int = 256,
    init: str = "medoid",
    n_centroids: int = 10,
) -> DataFrame:
    """Spherical-k-means refinement of the IVF coarse quantizer:
    deterministic initialization (init="medoid": smallest-id member
    per label; init="kcenter": greedy farthest-point seeding over the
    training sample — see kcenter_rows, the k-means++-quality seeds),
    then `refine_iters` rounds of cosine-assignment → mean update over
    a bounded smallest-id training sample.

    Engine-portable like pq_codebook's refinement: cosine assignment
    uses sequential folds (ties to the smaller centroid id), the mean
    is a per-dimension ordered left fold in corpus_id order, and empty
    cells keep their previous centroid. Centroids are NOT re-normalized
    — cosine ranking is scale-invariant, so the unnormalized mean
    yields the same assignments as the spherical-k-means unit mean
    while keeping the SQL twin one step shorter. The cosine objective
    Σ max_c cos(x, c) is non-decreasing per round (spherical k-means
    monotonicity; asserted in tests/test_pq_refine.py)."""
    sample_rows = [
        (r[corpus_id], list(r["__v"]))
        for r in (
            corpus.select(F.col(corpus_id), _as_double(F.col(vec)).alias("__v"))
            .orderBy(corpus_id)
            .limit(sample_n)
            .collect()
        )
    ]
    sample_rows.sort(key=lambda r: r[0])
    if init == "kcenter":
        cent_ids = list(range(n_centroids))
        cent_rows = [r["centroid"] for r in kcenter_rows(sample_rows, n_centroids)]
    elif init == "medoid":
        # preserve the centroid_id values ivf_centroids assigns (the
        # label ids) — the SQL twin keeps them, and they need not be a
        # contiguous 0..n-1 range
        medoids = sorted(
            ivf_centroids(corpus, corpus_id, vec, by, mode="medoid").collect(),
            key=lambda r: r["centroid_id"],
        )
        cent_ids = [int(r["centroid_id"]) for r in medoids]
        cent_rows = [list(r["centroid"]) for r in medoids]
    else:
        raise ValueError(f"init must be medoid|kcenter, got {init!r}")
    # Lloyd's rounds run DRIVER-SIDE over the collected sample (the
    # kcenter_rows precedent: every float op is the same sequential
    # fold/IEEE primitive the SQL twin and the former DataFrame loop
    # used — cosine as left-fold dot over dims, ties to the smaller
    # centroid id, per-dimension mean as a left fold in corpus_id
    # order, empty cells keep their centroid — so the trained rows are
    # bit-identical). A Spark job per round cost ~2 s each in pure
    # scheduling for a 256-row sample; this whole loop is ~ms.
    import math

    for _ in range(refine_iters):
        members: dict[int, list[list[float]]] = {}
        for _cid, v in sample_rows:
            nv = math.sqrt(_fold_dot(v, v))
            best_c, best_s = 0, None
            for c_idx, cvec in enumerate(cent_rows):
                denom = nv * math.sqrt(_fold_dot(cvec, cvec))
                # zero-norm vectors: NaN like the SQL cosine (float
                # division never throws in either engine). Both Spark
                # and DuckDB sort NaN GREATEST, so under ORDER BY cos
                # DESC a NaN score WINS; mirror that (first NaN keeps
                # the smaller centroid id, the window's tie-break).
                s = _fold_dot(v, cvec) / denom if denom != 0.0 else float("nan")
                if best_s is None:
                    best_c, best_s = c_idx, s
                elif math.isnan(best_s):
                    pass  # NaN incumbent sorts first; smaller id wins
                elif math.isnan(s) or s > best_s:
                    best_c, best_s = c_idx, s
            members.setdefault(best_c, []).append(v)
        new_cents = []
        for c_idx, cvec in enumerate(cent_rows):
            mem = members.get(c_idx)
            if not mem:
                new_cents.append(cvec)
                continue
            n = float(len(mem))
            newv = []
            for di in range(dim):
                acc = 0.0
                for v in mem:  # corpus_id order (sample_rows sorted)
                    acc += v[di]
                newv.append(acc / n)
            new_cents.append(newv)
        cent_rows = new_cents
    return corpus.sparkSession.createDataFrame(
        [
            (cid, [float(x) for x in c])
            for cid, c in zip(cent_ids, cent_rows)
        ],
        "centroid_id int, centroid array<double>",
    )


def topk_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    vec: str = "embedding",
    by: str = "label",
    k: int = 5,
    nprobe: int = 2,
    centroid_mode: str = "mean",
    centroids: DataFrame | None = None,
    centroid_rows: list | None = None,
) -> DataFrame:
    """IVF search: assign corpus vectors to centroids, route each
    query to its nprobe nearest centroids, brute-force only there.
    Scan cost drops by ~n_centroids/nprobe; partition the corpus by
    centroid_id at rest to make the probe partition-pruned."""
    # localCheckpoint, NOT cache(): a cached centroid frame sits in the
    # CacheManager for the life of the session — one leaked entry per
    # query in a bench/sweep loop (round-7 review finding; the same
    # leak ranking.py's round-5 fix documents). Checkpoint blocks are
    # GC-reclaimed with the frame.
    if centroid_rows is not None:
        cents = corpus.sparkSession.createDataFrame(
            centroid_rows, "centroid_id int, centroid array<double>"
        ).transform(_pin)
    else:
        cents = (
            centroids if centroids is not None
            else ivf_centroids(corpus, corpus_id, vec, by, mode=centroid_mode)
        ).transform(_pin)

    def assign(df: DataFrame, id_col: str, keep_vec: str, topn: int) -> DataFrame:
        scored = df.crossJoin(F.broadcast(cents)).select(
            F.col(id_col),
            F.col(keep_vec),
            "centroid_id",
            cosine(F.col(keep_vec), F.col("centroid")).alias("cscore"),
        )
        w = Window.partitionBy(id_col).orderBy(F.col("cscore").desc(), F.col("centroid_id"))
        return scored.withColumn("crank", F.row_number().over(w)).where(F.col("crank") <= topn)

    c = corpus.select(F.col(corpus_id), F.col(vec).alias("__cv"))
    if centroid_rows is not None:
        # map-only corpus assignment (see ivf_assign_expr)
        c_assigned = c.select(
            corpus_id,
            "__cv",
            ivf_assign_arrow(
                centroid_rows, _as_double(F.col("__cv"))
            ).alias("centroid_id"),
        )
    else:
        c_assigned = assign(c, corpus_id, "__cv", 1).select(corpus_id, "__cv", "centroid_id")
    q = queries.select(F.col(query_id), F.col(vec).alias("__qv"))
    q_probes = assign(q, query_id, "__qv", nprobe).select(query_id, "__qv", "centroid_id")

    scored = c_assigned.join(F.broadcast(q_probes), "centroid_id").select(
        query_id, corpus_id, cosine(F.col("__qv"), F.col("__cv")).alias("score")
    )
    w = Window.partitionBy(query_id).orderBy(F.col("score").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, corpus_id, F.round("score", 6).alias("score"), F.col("rank").cast("long").alias("rank"))
    )


def embedding_near_dup_pairs(
    corpus: DataFrame, corpus_id: str, vec: str, threshold: float
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (brute force; restrict
    the input or pre-bucket with lsh_bucket before calling at scale)."""
    a = corpus.select(F.col(corpus_id).alias("id_a"), F.col(vec).alias("__va"))
    b = corpus.select(F.col(corpus_id).alias("id_b"), F.col(vec).alias("__vb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("__va"), F.col("__vb")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def _explode_subspaces(
    df: DataFrame, id_col: str, vec_col: str, m: int, d: int, out: str
) -> DataFrame:
    """(id, vec) → (id, s, out) rows, one per subspace slice."""
    return df.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.struct(
                    s.cast("int").alias("s"),
                    F.slice(vec_col, s * d + 1, d).alias(out),
                ),
            )
        ).alias("sc"),
    ).select(id_col, F.col("sc.s").alias("s"), F.col(f"sc.{out}").alias(out))


def pq_codebook(
    corpus: DataFrame,
    corpus_id: str = "corpus_id",
    vec: str = "embedding",
    m: int = 8,
    d: int = 8,
    n_codes: int = 32,
    refine_iters: int = 4,
    sample_n: int = 256,
) -> DataFrame:
    """Product-quantization codebook: split the vector into m
    subspaces of d dims; per subspace, n_codes code vectors.

    Codes are sample-initialized (the subvectors of the n_codes
    smallest-id corpus vectors), then refined with `refine_iters`
    Lloyd's (k-means) iterations over a deterministic training sample
    (the `sample_n` smallest-id vectors — bounded size is the standard
    ANN practice: FAISS trains codebooks on a corpus sample too, so
    the training cost stays flat while the corpus grows).

    Everything is ENGINE-PORTABLE, keeping the pipeline
    oracle-checkable with refinement on:
    * assignment: per-subspace L2 argmin, sequential-fold distance,
      ties to the smaller code id — bit-exact in any engine;
    * update: per-dimension mean summed as a sequential left fold in
      corpus_id order (array_sort(collect_list) → aggregate), NOT a
      distributed partial-sum — so DuckDB's ordered list fold
      reproduces each new centroid bit-for-bit;
    * empty clusters keep their previous code (COALESCE after a left
      join), as in classic Lloyd's.
    Lloyd's never increases the within-cluster SSE on the training
    sample — asserted by tests/test_pq_refine.py."""
    w = Window.orderBy(corpus_id)
    src = (
        corpus.select(F.col(corpus_id), _as_double(F.col(vec)).alias("__v"))
        .orderBy(corpus_id)
        .limit(n_codes)
        .withColumn("code_id", F.row_number().over(w) - 1)
    )
    sub = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda s: F.struct(
                s.cast("int").alias("s"),
                F.slice("__v", s * d + 1, d).alias("code_vec"),
            ),
        )
    )
    cb = src.select("code_id", sub.alias("sc")).select(
        "code_id", F.col("sc.s").alias("s"), F.col("sc.code_vec").alias("code_vec")
    )
    if refine_iters <= 0:
        return cb

    # Lloyd's rounds run DRIVER-SIDE over the collected sample (the
    # ivf_centroids_refined / kcenter_rows discipline: sequential-fold
    # L2 distance, ties to the smaller code id, per-dimension mean as
    # a left fold in corpus_id order, empty clusters keep their code —
    # every float op is the same IEEE primitive the SQL twin uses, so
    # the codebook rows are bit-identical to the former DataFrame
    # loop, which paid ~1-2 s of job scheduling per round).
    sample_rows = [
        (r[corpus_id], list(r["__v"]))
        for r in (
            corpus.select(F.col(corpus_id), _as_double(F.col(vec)).alias("__v"))
            .orderBy(corpus_id)
            .limit(sample_n)
            .collect()
        )
    ]
    sample_rows.sort(key=lambda r: r[0])
    # init: subvectors of the n_codes smallest-id vectors, code_id by
    # id rank (matches the row_number() init above)
    init_rows = sample_rows[:n_codes] if len(sample_rows) >= n_codes else sample_rows
    codes: dict[int, list[list[float]]] = {}
    for s in range(m):
        codes[s] = [v[s * d : (s + 1) * d] for _, v in init_rows]
    for _ in range(refine_iters):
        members: dict[tuple[int, int], list[list[float]]] = {}
        for _cid, v in sample_rows:
            for s in range(m):
                sub = v[s * d : (s + 1) * d]
                best_c, best_dist = 0, None
                for c_idx, cvec in enumerate(codes[s]):
                    acc = 0.0
                    for x, y in zip(sub, cvec):
                        acc += (x - y) * (x - y)
                    if best_dist is None or acc < best_dist:
                        best_c, best_dist = c_idx, acc
                members.setdefault((s, best_c), []).append(sub)
        for s in range(m):
            new_codes = []
            for c_idx, cvec in enumerate(codes[s]):
                mem = members.get((s, c_idx))
                if not mem:
                    new_codes.append(cvec)
                    continue
                n = float(len(mem))
                newv = []
                for di in range(d):
                    acc = 0.0
                    for sub in mem:  # corpus_id order (sample sorted)
                        acc += sub[di]
                    newv.append(acc / n)
                new_codes.append(newv)
            codes[s] = new_codes
    return corpus.sparkSession.createDataFrame(
        [
            (c_idx, s, [float(x) for x in cvec])
            for s in range(m)
            for c_idx, cvec in enumerate(codes[s])
        ],
        "code_id int, s int, code_vec array<double>",
    )


def ivf_assign_expr(centroid_rows: list, vec_sql: str) -> Column:
    """Nearest-centroid cell assignment as ONE shuffle-free projection,
    given the trained coarse quantizer as driver-side rows
    (centroid_id, centroid).

    Replaces the crossJoin(centroids) + per-row window top-1 on the
    CORPUS side — which shuffles corpus × n_cells rows by corpus_id at
    scale — with a fold argmax over a centroid literal (ties keep the
    smallest centroid_id, identical to the window's ORDER BY cscore
    DESC, centroid_id). Scores are the exact cosine folds the
    DataFrame path computes, so assignments are bit-identical. The
    query side keeps the window (it needs top-nprobe and is the tiny
    side)."""
    rows = sorted(centroid_rows, key=lambda r: r["centroid_id"])
    ids_sql = "array(" + ",".join(str(int(r["centroid_id"])) for r in rows) + ")"
    cents_sql = "array(" + ",".join(
        "array(" + ",".join(f"{float(x)!r}D" for x in r["centroid"]) + ")" for r in rows
    ) + ")"
    n = len(rows)
    # bind the cast vector (v) and its norm (nv) ONCE via the
    # transform-over-singleton trick — without it every centroid
    # comparison recomputes the row vector's cast and norm folds
    cos = (
        f"transform({cents_sql}, c -> "
        f"aggregate(zip_with(v, c, (x, y) -> x * y), 0.0D, (a, x) -> a + x) / "
        f"(nv * SQRT(aggregate(transform(c, x -> x * x), 0.0D, (a, x) -> a + x))))"
    )
    # n == 1: sequence(1, 0) runs DESCENDING in Spark ([1, 0] — the
    # known sequence gotcha), so the fold would probe cs[2] past the
    # end of a 1-element array and die under ANSI; a single centroid
    # needs no argmax at all (round-7 review finding)
    argmax = "1" if n == 1 else (
        f"aggregate(sequence(1, {n - 1}), 1, (bi, j) -> "
        f"CASE WHEN element_at(cs, j + 1) > element_at(cs, bi) THEN j + 1 ELSE bi END)"
    )
    return F.expr(
        f"element_at(transform(array({vec_sql}), v -> "
        f"element_at(transform(array(SQRT(aggregate(transform(v, x -> x * x), 0.0D, (a, x) -> a + x))), nv -> "
        f"element_at({ids_sql}, element_at(transform(array({cos}), cs -> {argmax}), 1))"
        f"), 1)), 1)"
    )


def ivf_assign_arrow(centroid_rows: list, vec: Column | str) -> Column:
    """Arrow-vectorized twin of ivf_assign_expr — the corpus-side cell
    assignment, bit-identical by construction (the pattern documented
    at pq_reconstruct_arrow):

    * every sum (vector norm, per-centroid dot, centroid norm)
      accumulates SEQUENTIALLY over dims, matching the expression
      fold's left-to-right order from 0.0;
    * the score is ``dot / (nv * sqrt(csumsq))`` with the exact same
      association as the SQL expression;
    * ``np.argmax`` keeps the FIRST maximum == the fold's strict ``>``
      earliest-index rule, and centroids are visited in sorted-id
      order, so ties go to the smallest centroid_id.

    At corpus scale the assignment is THE per-row hot loop (k cosine
    folds per row); interpreted HOF eval costs ~0.2 ms/row at k=16,
    d=96 — days of CPU per billion rows — while the Arrow batch runs
    the same arithmetic ~100× faster, still map-only, still one scan.
    The input column must already be array<double>.

    Degenerate inputs replicate the expression fold exactly: a NULL
    vector yields a NULL cell (the whole expression is NULL); a
    zero-norm vector or zero-norm centroid makes the SQL score NULL
    (non-ANSI x/0), and a NULL score can never displace the fold's
    current best — so all-NULL rows land on the FIRST centroid id.
    Here those undefined scores become -inf before argmax, which
    reproduces both behaviors (an all--inf row argmaxes to index 0).

    ANSI caveat (round-6 advisor): under the session's ANSI default
    the EXPRESSION twin raises ArithmeticException on a zero-norm
    vector/centroid — loud — while this kernel silently assigns such
    rows to the first centroid (the non-ANSI fold semantics above).
    Callers on possibly-dirty corpora who want the fail-loud behavior
    should pre-screen (``WHERE aggregate(v, 0D, (a,x)->a+x*x) > 0``,
    one scan-side filter) or assert zero-norm counts before assigning;
    every in-repo call site runs on fixture embeddings validated
    non-degenerate at build (see embedding_quality_screen)."""
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import IntegerType

    rows = sorted(centroid_rows, key=lambda r: r["centroid_id"])
    ids = np.array([int(r["centroid_id"]) for r in rows], dtype=np.int32)
    C = np.stack([np.asarray(list(r["centroid"]), dtype=np.float64) for r in rows])
    k, d = C.shape
    cnorm = np.empty(k, dtype=np.float64)
    for j in range(k):  # sequential sum-of-squares per centroid
        acc = 0.0
        for t in range(d):
            acc += C[j, t] * C[j, t]
        cnorm[j] = np.sqrt(acc)

    @pandas_udf(IntegerType())
    def _assign(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        mask, (V,) = _stack_valid(v)
        out = [None] * len(mask)
        if V is not None:
            nv = np.zeros(V.shape[0], dtype=np.float64)
            for t in range(d):
                nv += V[:, t] * V[:, t]
            nv = np.sqrt(nv)
            scores = np.empty((V.shape[0], k), dtype=np.float64)
            with np.errstate(divide="ignore", invalid="ignore"):
                for j in range(k):
                    dotj = np.zeros(V.shape[0], dtype=np.float64)
                    for t in range(d):  # sequential over dims == fold order
                        dotj += V[:, t] * C[j, t]
                    scores[:, j] = dotj / (nv * cnorm[j])
                    if cnorm[j] == 0.0:
                        scores[:, j] = -np.inf  # SQL score is NULL
            scores[np.isnan(scores)] = -np.inf  # 0/0 → NULL in SQL
            scores[nv == 0.0, :] = -np.inf
            best = ids[np.argmax(scores, axis=1)]
            if cnorm[0] == 0.0:
                # the SQL fold's current-best starts at centroid 0; a
                # NULL score there is STICKY (every CASE WHEN compares
                # against NULL → ELSE keeps it), so the expression
                # returns the first id for every row
                best = np.full_like(best, ids[0])
            it = iter(best)
            out = [int(next(it)) if ok else None for ok in mask]
        return pd.Series(out, dtype=object)

    return _assign(vec if isinstance(vec, Column) else F.col(vec))


def ivf_centroid_vec_expr(centroid_rows: list, vec_sql: str) -> Column:
    """Like ivf_assign_expr but returns the nearest centroid's VECTOR
    (for residual computation x − centroid). Same fold argmax, same
    tie rule, same cosine arithmetic — the index chosen here always
    matches ivf_assign_expr's id for the same row."""
    rows = sorted(centroid_rows, key=lambda r: r["centroid_id"])
    cents_sql = "array(" + ",".join(
        "array(" + ",".join(f"{float(x)!r}D" for x in r["centroid"]) + ")" for r in rows
    ) + ")"
    n = len(rows)
    cos = (
        f"transform(cents, c -> "
        f"aggregate(zip_with(v, c, (x, y) -> x * y), 0.0D, (a, x) -> a + x) / "
        f"(nv * SQRT(aggregate(transform(c, x -> x * x), 0.0D, (a, x) -> a + x))))"
    )
    # n == 1: sequence(1, 0) runs DESCENDING in Spark ([1, 0] — the
    # known sequence gotcha), so the fold would probe cs[2] past the
    # end of a 1-element array and die under ANSI; a single centroid
    # needs no argmax at all (round-7 review finding)
    argmax = "1" if n == 1 else (
        f"aggregate(sequence(1, {n - 1}), 1, (bi, j) -> "
        f"CASE WHEN element_at(cs, j + 1) > element_at(cs, bi) THEN j + 1 ELSE bi END)"
    )
    return F.expr(
        f"element_at(transform(array({cents_sql}), cents -> "
        f"element_at(transform(array({vec_sql}), v -> "
        f"element_at(transform(array(SQRT(aggregate(transform(v, x -> x * x), 0.0D, (a, x) -> a + x))), nv -> "
        f"element_at(cents, element_at(transform(array({cos}), cs -> {argmax}), 1))"
        f"), 1)), 1)), 1)"
    )


def ivf_centroid_lookup_expr(centroid_rows: list, id_sql: str) -> Column:
    """Centroid VECTOR by already-computed cell id — an array_position
    lookup into the sorted centroid literal. Pair with ivf_assign_expr
    to avoid re-running the full cosine argmax fold a second time when
    both the id and the vector are needed (residual computation)."""
    rows = sorted(centroid_rows, key=lambda r: r["centroid_id"])
    ids_sql = "array(" + ",".join(str(int(r["centroid_id"])) for r in rows) + ")"
    cents_sql = "array(" + ",".join(
        "array(" + ",".join(f"{float(x)!r}D" for x in r["centroid"]) + ")" for r in rows
    ) + ")"
    return F.expr(f"element_at({cents_sql}, CAST(array_position({ids_sql}, {id_sql}) AS INT))")


def pq_residual_codebook(
    corpus: DataFrame,
    corpus_id: str = "corpus_id",
    vec: str = "embedding",
    centroid_rows: list | None = None,
    m: int = 8,
    d: int = 8,
    n_codes: int = 32,
    refine_iters: int = 4,
    sample_n: int = 256,
) -> DataFrame:
    """PQ codebook trained on RESIDUALS x − centroid(x) (FAISS's
    IndexIVFPQ default): after coarse quantization the residuals are
    much smaller and more isotropic than the raw vectors, so the same
    code budget quantizes them far more accurately. Deterministic
    end-to-end: cell choice via the literal-centroid fold argmax,
    residual as an exact elementwise subtraction, then the standard
    Lloyd's-refined pq_codebook over the residual frame."""
    if centroid_rows is None:
        raise ValueError("pq_residual_codebook requires trained centroid_rows")
    cd = corpus.select(F.col(corpus_id), _as_double(F.col(vec)).alias("__v"))
    residuals = cd.select(
        F.col(corpus_id), "__v", ivf_assign_arrow(centroid_rows, "__v").alias("__cell")
    ).select(
        F.col(corpus_id),
        F.zip_with(
            F.col("__v"),
            ivf_centroid_lookup_expr(centroid_rows, "__cell"),
            lambda x, y: x - y,
        ).alias("__r"),
    )
    return pq_codebook(
        residuals, corpus_id, "__r", m, d, n_codes, refine_iters, sample_n
    )


def topk_ivfpq_residual(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    vec: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
    m: int = 8,
    d: int = 8,
    n_codes: int = 32,
    centroid_rows: list | None = None,
    codebook_rows: list | None = None,
) -> DataFrame:
    """Residual IVF-PQ — the FAISS-standard layout: route by coarse
    centroid, PQ-encode the RESIDUAL x − centroid, score queries
    against centroid + reconstructed residual. Requires the trained
    quantizers as literal rows (the train/search split); the whole
    corpus side is ONE map-only projection (assignment, residual,
    encode, reconstruct, re-add) before the broadcast probe join —
    identical plan shape to topk_ivfpq's literal path, with strictly
    better reconstruction accuracy for the same 8-byte code budget."""
    if centroid_rows is None or codebook_rows is None:
        raise ValueError("topk_ivfpq_residual requires trained literal rows")
    # localCheckpoint, not cache() — see topk_ivf (CacheManager leak)
    cents = corpus.sparkSession.createDataFrame(
        centroid_rows, "centroid_id int, centroid array<double>"
    ).transform(_pin)

    q = queries.select(F.col(query_id), _as_double(F.col(vec)).alias("__qv"))
    scored_q = q.crossJoin(F.broadcast(cents)).select(
        query_id, "__qv", "centroid_id", cosine(F.col("__qv"), F.col("centroid")).alias("cscore")
    )
    wq0 = Window.partitionBy(query_id).orderBy(F.col("cscore").desc(), F.col("centroid_id"))
    q_probes = (
        scored_q.withColumn("crank", F.row_number().over(wq0))
        .where(F.col("crank") <= nprobe)
        .select(query_id, "__qv", "centroid_id")
    )

    cd = corpus.select(F.col(corpus_id), _as_double(F.col(vec)).alias("__v"))
    # one argmax fold for the cell id, then an O(1) literal lookup for
    # its vector — NOT a second argmax (subexpression elimination does
    # not reach inside HOF lambdas, so two folds would run twice)
    with_cell = cd.select(
        corpus_id, "__v", ivf_assign_arrow(centroid_rows, "__v").alias("centroid_id")
    )
    # residual encode+reconstruct+re-add rides the Arrow path: bit-
    # identical to the expression twin (see pq_reconstruct_arrow), but
    # vectorized instead of interpreted-per-row — still one map-only
    # projection before the probe join
    enc = with_cell.select(
        corpus_id,
        "centroid_id",
        ivf_centroid_lookup_expr(centroid_rows, "centroid_id").alias("__cvec"),
        "__v",
    ).select(
        corpus_id,
        "centroid_id",
        pq_reconstruct_arrow(
            codebook_rows, m, d, n_codes, "__v", base="__cvec"
        ).alias("__av"),
    )
    cand = enc.join(F.broadcast(q_probes), "centroid_id")
    scored = cand.select(
        query_id, corpus_id, dot(F.col("__qv"), F.col("__av")).alias("score")
    )
    wq = Window.partitionBy(query_id).orderBy(F.col("score").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(wq))
        .where(F.col("rank") <= k)
        .select(
            query_id,
            corpus_id,
            F.round("score", 6).alias("score"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def pq_reconstruct_expr(
    codebook_rows: list, m: int, d: int, n_codes: int, vec_sql: str
) -> Column:
    """PQ encode+reconstruct as ONE shuffle-free projection, given the
    trained codebook as driver-side rows (code_id, s, code_vec).

    The codebook ships as a single nested array literal (m × n_codes ×
    d doubles); per subspace, the nearest code is picked by a
    sequential fold over the distance array (strict `<` keeps the
    earliest index, identical to the join+window path's
    ORDER BY dist, code_id), and the chosen code vectors are flattened
    in subspace order. Same bits as the DataFrame-codebook path — but
    zero shuffles and zero joins: at 100 TB, encode becomes a map-only
    scan instead of a (corpus × m)-row shuffle + window + regroup. The
    whole expression is one SQL string (one py4j round trip, one
    Literal node — the lsh_bucket lesson)."""
    codes: dict[tuple[int, int], list[float]] = {}
    for r in codebook_rows:
        codes[(r["s"], r["code_id"])] = list(r["code_vec"])
    cb_sql = "array(" + ",".join(
        "array(" + ",".join(
            "array(" + ",".join(f"{float(x)!r}D" for x in codes[(s, j)]) + ")"
            for j in range(n_codes)
        ) + ")"
        for s in range(m)
    ) + ")"
    dists = (
        f"transform(element_at(cb, s + 1), cv -> "
        f"aggregate(zip_with(slice({vec_sql}, s * {d} + 1, {d}), cv, "
        f"(x, y) -> (x - y) * (x - y)), 0.0D, (a, x) -> a + x))"
    )
    # n_codes == 1: same descending-sequence/ANSI hazard as the argmax
    # folds above — a 1-entry codebook needs no argmin
    argmin = "1" if n_codes == 1 else (
        f"aggregate(sequence(1, {n_codes - 1}), 1, (bi, j) -> "
        f"CASE WHEN element_at(ds, j + 1) < element_at(ds, bi) THEN j + 1 ELSE bi END)"
    )
    # bind the codebook literal ONCE (transform-over-singleton) — it
    # is ~20 KB of doubles; inlining it at both use sites doubles the
    # expression tree and codegen size
    return F.expr(
        f"element_at(transform(array({cb_sql}), cb -> "
        f"flatten(transform(sequence(0, {m - 1}), s -> "
        f"element_at(transform(array({dists}), ds -> "
        f"element_at(element_at(cb, s + 1), {argmin})), 1)))), 1)"
    )


def pq_reconstruct_arrow(
    codebook_rows: list,
    m: int,
    d: int,
    n_codes: int,
    vec: Column | str,
    base: Column | str | None = None,
) -> Column:
    """Arrow-vectorized twin of pq_reconstruct_expr: encode+reconstruct
    as ONE pandas UDF over the raw vector column. Bit-identical to the
    HOF-expression path by construction:

    * subspace L2 distances accumulate SEQUENTIALLY over the d dims
      (``acc += (x_t - c_t)^2`` in emission order == the expression's
      left fold from 0.0 — IEEE754 add/mul are deterministic, only
      the order matters);
    * ``np.argmin`` keeps the FIRST minimum == the fold's strict ``<``
      earliest-code-id tie rule;
    * reconstruction (and the optional ``base +`` re-add for the
      residual layout) is the same elementwise double add.

    Why it exists: the expression path evaluates nested higher-order
    functions INTERPRETED per row (HOFs never enter whole-stage
    codegen), costing ~1.3 ms/row at m=8, n_codes=32 — measured 2.5 s
    for a 2k-row corpus, the bench's single largest cost. The Arrow
    path is the FAISS design point (vectorized ADC encode over code
    batches): ~30 µs/row, and at 100 TB the encode stays a map-only
    scan — same plan shape, no shuffle, no joins. The expression twin
    remains for plan-shape tests and as the zero-Python fallback."""
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import ArrayType, DoubleType

    cb = np.zeros((m, n_codes, d), dtype=np.float64)
    seen = np.zeros((m, n_codes), dtype=bool)
    for r in codebook_rows:
        cb[r["s"], r["code_id"]] = list(r["code_vec"])
        seen[r["s"], r["code_id"]] = True
    if not seen.all():
        # fail LOUD at plan-build time, like the expression twin's
        # KeyError — a silent zero codebook entry would participate in
        # argmin and return junk reconstructions with no error
        missing = [tuple(map(int, ij)) for ij in np.argwhere(~seen)[:5]]
        raise ValueError(
            f"codebook_rows missing (s, code_id) entries, e.g. {missing}; "
            f"expected {m}x{n_codes}"
        )

    def _recon_block(V: np.ndarray) -> np.ndarray:
        out = np.empty_like(V)
        for s in range(m):
            X = V[:, s * d : (s + 1) * d]  # (n, d)
            acc = np.zeros((X.shape[0], n_codes), dtype=np.float64)
            for t in range(d):  # sequential over dims == the fold order
                diff = X[:, t : t + 1] - cb[s, :, t][None, :]
                acc += diff * diff
            codes = np.argmin(acc, axis=1)  # first-wins ties
            out[:, s * d : (s + 1) * d] = cb[s][codes]
        return out

    def _emit(mask, block):
        it = iter(block) if block is not None else iter(())
        return pd.Series(
            [next(it) if ok else None for ok in mask], dtype=object
        )

    if base is None:

        @pandas_udf(ArrayType(DoubleType()))
        def _pq_recon(v: pd.Series) -> pd.Series:
            if len(v) == 0:
                return pd.Series([], dtype=object)
            mask, (V,) = _stack_valid(v)
            return _emit(mask, _recon_block(V) if V is not None else None)

        return _pq_recon(vec if isinstance(vec, Column) else F.col(vec))

    @pandas_udf(ArrayType(DoubleType()))
    def _pq_recon_residual(v: pd.Series, c: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        mask, (V, C) = _stack_valid(v, c)
        return _emit(mask, C + _recon_block(V - C) if V is not None else None)

    return _pq_recon_residual(
        vec if isinstance(vec, Column) else F.col(vec),
        base if isinstance(base, Column) else F.col(base),
    )


def topk_pq(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    vec: str = "embedding",
    k: int = 5,
    m: int = 8,
    d: int = 8,
    n_codes: int = 32,
    refine_iters: int = 4,
    sample_n: int = 256,
    codebook: DataFrame | None = None,
    codebook_rows: list | None = None,
) -> DataFrame:
    """ANN via product quantization: encode each corpus vector as m
    code ids (nearest codebook entry per subspace, L2, ties to the
    smaller code id), then score queries against the RECONSTRUCTED
    vectors with one sequential dot fold.

    dot(q, reconstruction) == Σ_s dot(q_s, code_s) — the ADC value —
    computed as a single fold so the summation order is fixed and the
    oracle reproduces it bit-for-bit. At real scale the same value
    comes from the classic LUT form (m lookups per pair into a
    per-query m×n_codes distance table) over a corpus that stores
    ONLY the m-byte codes — a 32× memory cut at these parameters; the
    codes are also the natural partition key for an IVF-PQ hybrid.

    Pass ``codebook`` (a (code_id, s, code_vec) frame, e.g. a
    pre-trained/materialized one) to keep the training subtree out of
    the probe plan, or ``codebook_rows`` (its collected rows) to also
    collapse encode+reconstruct into one shuffle-free projection
    (pq_reconstruct_expr) — the FAISS separation of train() from
    search()."""
    c = corpus.select(F.col(corpus_id), _as_double(F.col(vec)).alias("__v"))
    if codebook_rows is not None:
        recon = c.select(
            corpus_id,
            pq_reconstruct_arrow(codebook_rows, m, d, n_codes, "__v").alias("__rv"),
        )
    else:
        cb = codebook if codebook is not None else pq_codebook(
            corpus, corpus_id, vec, m, d, n_codes, refine_iters, sample_n
        )
        c_sub = _explode_subspaces(c, corpus_id, "__v", m, d, "sub_vec")

        dist = F.aggregate(
            F.zip_with("sub_vec", "code_vec", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        scored_codes = c_sub.join(F.broadcast(cb), "s").select(
            corpus_id, "s", "code_id", "code_vec", dist.alias("__dist")
        )
        w = Window.partitionBy(corpus_id, "s").orderBy("__dist", "code_id")
        codes = (
            scored_codes.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select(corpus_id, "s", "code_id", "code_vec")
        )
        recon = (
            codes.groupBy(corpus_id)
            .agg(F.array_sort(F.collect_list(F.struct("s", "code_vec"))).alias("sv"))
            .select(
                corpus_id,
                F.flatten(F.transform("sv", lambda x: x["code_vec"])).alias("__rv"),
            )
        )

    q = queries.select(F.col(query_id), _as_double(F.col(vec)).alias("__qv"))
    scored = recon.crossJoin(F.broadcast(q)).select(
        query_id,
        corpus_id,
        dot(F.col("__qv"), F.col("__rv")).alias("score"),
    )
    wq = Window.partitionBy(query_id).orderBy(F.col("score").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(wq))
        .where(F.col("rank") <= k)
        .select(
            query_id,
            corpus_id,
            F.round("score", 6).alias("score"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def topk_ivfpq(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    vec: str = "embedding",
    by: str = "label",
    k: int = 5,
    nprobe: int = 2,
    m: int = 8,
    d: int = 8,
    n_codes: int = 32,
    refine_iters: int = 4,
    sample_n: int = 256,
    codebook: DataFrame | None = None,
    centroids: DataFrame | None = None,
    codebook_rows: list | None = None,
    centroid_rows: list | None = None,
) -> DataFrame:
    """IVF-PQ: the standard billion-scale ANN layout. The coarse
    quantizer (medoid centroid per cell) routes each query to nprobe
    cells; within a cell, candidates are scored against their PQ
    reconstructions (topk_pq's fixed-order fold). At rest the corpus
    stores (cell_id, m-byte code) partitioned by cell — the probe is
    a partition-pruned scan of compressed codes: cells cut the scan by
    n_cells/nprobe, PQ cuts the bytes per row by ~32×.

    ``codebook_rows`` (the trained codebook collected to the driver)
    collapses encode+reconstruct into one shuffle-free projection —
    see pq_reconstruct_expr."""
    # localCheckpoint, not cache() — see topk_ivf (CacheManager leak)
    if centroid_rows is not None:
        cents = corpus.sparkSession.createDataFrame(
            centroid_rows, "centroid_id int, centroid array<double>"
        ).transform(_pin)
    else:
        cents = (
            centroids if centroids is not None
            else ivf_centroids(corpus, corpus_id, vec, by, mode="medoid")
        ).transform(_pin)

    def assign(df: DataFrame, id_col: str, keep_vec: str, topn: int) -> DataFrame:
        scored = df.crossJoin(F.broadcast(cents)).select(
            F.col(id_col),
            F.col(keep_vec),
            "centroid_id",
            cosine(F.col(keep_vec), F.col("centroid")).alias("cscore"),
        )
        w = Window.partitionBy(id_col).orderBy(F.col("cscore").desc(), F.col("centroid_id"))
        return scored.withColumn("crank", F.row_number().over(w)).where(F.col("crank") <= topn)

    q = queries.select(F.col(query_id), _as_double(F.col(vec)).alias("__qv"))
    q_probes = assign(q, query_id, "__qv", nprobe).select(query_id, "__qv", "centroid_id")

    if centroid_rows is not None and codebook_rows is not None:
        # the fully-literal path: cell assignment AND PQ reconstruction
        # in ONE map-only projection over a single corpus scan — no
        # self-join of assignment against reconstruction, no shuffle
        # before the probe join (this is the at-rest layout's compute
        # twin: at scale `enc` IS the table partitionBy(centroid_id))
        cd = corpus.select(F.col(corpus_id), _as_double(F.col(vec)).alias("__v"))
        enc = cd.select(
            corpus_id,
            ivf_assign_arrow(centroid_rows, "__v").alias("centroid_id"),
            pq_reconstruct_arrow(codebook_rows, m, d, n_codes, "__v").alias("__rv"),
        )
        cand = enc.join(F.broadcast(q_probes), "centroid_id")
        scored = cand.select(
            query_id, corpus_id, dot(F.col("__qv"), F.col("__rv")).alias("score")
        )
        wq = Window.partitionBy(query_id).orderBy(F.col("score").desc(), F.col(corpus_id))
        return (
            scored.withColumn("rank", F.row_number().over(wq))
            .where(F.col("rank") <= k)
            .select(
                query_id,
                corpus_id,
                F.round("score", 6).alias("score"),
                F.col("rank").cast("long").alias("rank"),
            )
        )

    c = corpus.select(F.col(corpus_id), F.col(vec).alias("__cv"))
    if centroid_rows is not None:
        # map-only corpus assignment (see ivf_assign_expr)
        c_assigned = c.select(
            corpus_id,
            ivf_assign_arrow(
                centroid_rows, _as_double(F.col("__cv"))
            ).alias("centroid_id"),
        )
    else:
        c_assigned = assign(c, corpus_id, "__cv", 1).select(corpus_id, "centroid_id")

    cd = corpus.select(F.col(corpus_id), _as_double(F.col(vec)).alias("__v"))
    if codebook_rows is not None:
        recon = cd.select(
            corpus_id,
            pq_reconstruct_arrow(codebook_rows, m, d, n_codes, "__v").alias("__rv"),
        )
    else:
        cb = codebook if codebook is not None else pq_codebook(
            corpus, corpus_id, vec, m, d, n_codes, refine_iters, sample_n
        )
        c_sub = _explode_subspaces(cd, corpus_id, "__v", m, d, "sub_vec")
        dist = F.aggregate(
            F.zip_with("sub_vec", "code_vec", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        sc = c_sub.join(F.broadcast(cb), "s").select(
            corpus_id, "s", "code_id", "code_vec", dist.alias("__dist")
        )
        wmin = Window.partitionBy(corpus_id, "s").orderBy("__dist", "code_id")
        codes = (
            sc.withColumn("__rn", F.row_number().over(wmin))
            .where(F.col("__rn") == 1)
            .select(corpus_id, "s", "code_vec")
        )
        recon = (
            codes.groupBy(corpus_id)
            .agg(F.array_sort(F.collect_list(F.struct("s", "code_vec"))).alias("sv"))
            .select(
                corpus_id,
                F.flatten(F.transform("sv", lambda x: x["code_vec"])).alias("__rv"),
            )
        )

    cand = c_assigned.join(F.broadcast(q_probes), "centroid_id").join(recon, corpus_id)
    scored = cand.select(
        query_id, corpus_id, dot(F.col("__qv"), F.col("__rv")).alias("score")
    )
    wq = Window.partitionBy(query_id).orderBy(F.col("score").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(wq))
        .where(F.col("rank") <= k)
        .select(
            query_id,
            corpus_id,
            F.round("score", 6).alias("score"),
            F.col("rank").cast("long").alias("rank"),
        )
    )
