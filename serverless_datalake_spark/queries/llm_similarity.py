"""Similarity-search queries over `embeddings` (north star):
brute-force cosine top-k (oracle-verified baseline), LSH-bucketed and
IVF approximate variants (rows-only; recall asserted in tests)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window

from serverless_datalake_spark.operators import pin as _pin
from pyspark.sql import functions as F

from serverless_datalake_spark.operators import similarity
from serverless_datalake_spark.operators.similarity import _hyperplanes
from serverless_datalake_spark.queries import query
from serverless_datalake_spark.tables import load_table


def _bucket_sql(col: str, n_planes: int = 8, dim: int = 64) -> str:
    """DuckDB expression reproducing operators.similarity.lsh_bucket
    bit-for-bit: the ±1 hyperplanes are the same md5-derived constants,
    and the dot product unrolls to the same left-associated addition
    chain Spark's sequential HOF fold performs (x*+1.0 == x and
    x*-1.0 == -x exactly, so sign decisions agree on every vector)."""
    parts = []
    for j, plane in enumerate(_hyperplanes(n_planes, dim)):
        terms = "".join(
            f" {'+' if c > 0 else '-'} {col}[{i + 1}]" for i, c in enumerate(plane)
        )
        parts.append(f"(CASE WHEN 0.0{terms} > 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(parts) + ")"


_COSINE_SQL = """
      list_aggregate(list_transform(list_zip(qb.emb, cb.emb),
                     p -> p[1] * p[2]), 'sum')
      / (SQRT(list_aggregate(list_transform(qb.emb, x -> x * x), 'sum'))
         * SQRT(list_aggregate(list_transform(cb.emb, x -> x * x), 'sum')))
"""

_SPLIT_SQL = """
    q AS (
      SELECT vec_id AS query_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings WHERE vec_id < 10
    ), c AS (
      SELECT vec_id AS corpus_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings WHERE vec_id >= 10
    )
"""


def _lsh_oracle(multiprobe: bool) -> str:
    probe_src = f"SELECT query_id, emb, {_bucket_sql('emb')} AS bucket FROM q"
    if multiprobe:
        flips = ", ".join(f"xor(bucket, {1 << j})" for j in range(8))
        probe_src = (
            f"SELECT query_id, emb, unnest([bucket, {flips}]) AS bucket "
            f"FROM ({probe_src})"
        )
    return f"""
    WITH {_SPLIT_SQL},
    qb AS ({probe_src}),
    cb AS (SELECT corpus_id, emb, {_bucket_sql('emb')} AS bucket FROM c),
    scored AS (
      SELECT qb.query_id, cb.corpus_id, {_COSINE_SQL} AS score
      FROM cb JOIN qb USING (bucket)
    ), ranked AS (
      SELECT query_id, corpus_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, corpus_id) AS rank
      FROM scored
    )
    SELECT query_id, corpus_id, ROUND(score, 6) AS score, rank
    FROM ranked WHERE rank <= 5
    """


def _split(spark: SparkSession, sf_dir: str):
    em = load_table(spark, sf_dir, "embeddings")
    queries = em.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = em.where(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("corpus_id"), "embedding"
    )
    return queries, corpus


# Trained PQ codebooks per fixture dir (fixtures are immutable per
# round, and pq_codebook is deterministic — same cache rationale as
# the materialized ANN index in sim_topk_lsh_indexed). Collecting the
# 16-code × 8-subspace result (128 tiny rows) is the FAISS train() /
# search() split: training cost is paid once, probe plans stay free of
# the Lloyd's-iteration subtree.
_CB_CACHE: dict[str, list] = {}
_CENT_CACHE: dict[str, list] = {}

# corpus row count per fixture dir — a scalar, session-independent;
# cached so the corpus-proportional shortlist (np8 leg) doesn't rerun
# a count job on every plan build in registry-wide sweeps/audits
_CORPUS_N_CACHE: dict[str, int] = {}


def _corpus_n(sf_dir: str, corpus_lab) -> int:
    n = _CORPUS_N_CACHE.get(sf_dir)
    if n is None:
        n = corpus_lab.count()
        _CORPUS_N_CACHE[sf_dir] = n
    return n


def _codebook_rows(sf_dir: str, corpus) -> list:
    """Trained codebook rows (collected once per fixture dir); probes
    inline them as a literal via pq_reconstruct_expr — encode becomes a
    shuffle-free projection."""
    from serverless_datalake_spark.operators.similarity import pq_codebook

    rows = _CB_CACHE.get(sf_dir)
    if rows is None:
        rows = pq_codebook(corpus, "corpus_id", "embedding").collect()
        _CB_CACHE[sf_dir] = rows
    return rows


def _centroid_rows(sf_dir: str, corpus_lab) -> list:
    """Farthest-point-seeded, spherical-k-means-refined coarse
    quantizer rows, trained once
    per fixture dir (10 tiny rows collected) — the IVF counterpart of
    _codebook_rows' train/search split; probes inline them via
    ivf_assign_expr (map-only corpus assignment)."""
    from serverless_datalake_spark.operators.similarity import ivf_centroids_refined

    rows = _CENT_CACHE.get(sf_dir)
    if rows is None:
        rows = ivf_centroids_refined(corpus_lab, init="kcenter").collect()
        _CENT_CACHE[sf_dir] = rows
    return rows


@query(
    "sim_topk_bruteforce",
    oracle="""
    WITH q AS (
      SELECT vec_id AS query_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings WHERE vec_id < 10
    ), c AS (
      SELECT vec_id AS corpus_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings WHERE vec_id >= 10
    ), scored AS (
      SELECT q.query_id, c.corpus_id,
             list_aggregate(list_transform(list_zip(q.emb, c.emb),
                            p -> p[1] * p[2]), 'sum')
             / (SQRT(list_aggregate(list_transform(q.emb, x -> x * x), 'sum'))
                * SQRT(list_aggregate(list_transform(c.emb, x -> x * x), 'sum'))) AS score
      FROM q CROSS JOIN c
    ), ranked AS (
      SELECT query_id, corpus_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, corpus_id) AS rank
      FROM scored
    )
    SELECT query_id, corpus_id, ROUND(score, 6) AS score, rank
    FROM ranked WHERE rank <= 5
    """,
    tags=("llm", "similarity", "topk"),
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for 10 query vectors: broadcast
    queries × one corpus scan; the ANN baseline every approximate
    index is measured against."""
    queries, corpus = _split(spark, sf_dir)
    return similarity.topk_bruteforce(queries, corpus, k=5)


@query(
    "sim_topk_lsh",
    # The bucket assignment is DETERMINISTIC (md5-derived hyperplanes),
    # so the oracle recomputes the same algorithm rather than checking
    # recall: same buckets, same candidates, same scores (_bucket_sql).
    oracle=_lsh_oracle(multiprobe=False),
    # baseline-only: 1-table single-probe LSH ships 0.00 recall@5 at
    # sf0.001 (RECALL.md) — it exists as the motivating baseline for
    # multiprobe/IVF/rerank, NOT as a serving leg; consumers should
    # use sim_topk_ivfpq_rerank_np8 or sim_topk_sq8_rerank (same
    # convention as graph_jaccard_links' exact-baseline demotion).
    tags=("llm", "similarity", "ann", "baseline-only"),
)
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-hyperplane LSH: 8 deterministic hyperplanes →
    256 buckets; a query scans only its own bucket (partition-pruned
    at rest when the corpus is written partitionBy(bucket))."""
    queries, corpus = _split(spark, sf_dir)
    return similarity.topk_lsh(queries, corpus, k=5, n_planes=8, dim=64)


@query(
    "sim_topk_lsh_multiprobe",
    # Deterministic probe sequence (own bucket + 8 Hamming-1 flips) →
    # the oracle enumerates the same probes; see sim_topk_lsh.
    oracle=_lsh_oracle(multiprobe=True),
    tags=("llm", "similarity", "ann"),
)
def sim_topk_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe ANN: own bucket + all Hamming-1 neighbors (9 probes
    of 256 buckets) — recovers boundary-vector recall without growing
    the index."""
    queries, corpus = _split(spark, sf_dir)
    return similarity.topk_lsh_multiprobe(queries, corpus, k=5, n_planes=8, dim=64)


@query(
    "sim_topk_lsh_indexed",
    # Same algorithm as sim_topk_lsh — the index only changes WHERE the
    # bucket assignment is computed (materialized at rest vs on the
    # fly) — so the same oracle applies.
    oracle=_lsh_oracle(multiprobe=False),
    # baseline-only: same 0.00-recall single-probe leg as sim_topk_lsh
    # (the index changes WHERE bucketing happens, not recall) — kept
    # for the partition-pruning plan shape it demonstrates.
    tags=("llm", "similarity", "ann", "index", "baseline-only"),
)
def sim_topk_lsh_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production ANN probe: the corpus is materialized ONCE
    partitioned by LSH bucket (sources/indexes.build_ann_index); each
    query then reads only its bucket partition — the plan shows
    PartitionFilters on `bucket` instead of a corpus scan. Built
    lazily per fixture dir (fixtures are immutable per round) into the
    local warehouse; the probe is what gets timed."""
    import os

    from serverless_datalake_spark.sources import indexes

    queries, corpus = _split(spark, sf_dir)
    sf_name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = os.path.join("spark-warehouse", "ann_index_" + sf_name)
    success = os.path.join(path, "_SUCCESS")
    fixture = os.path.join(sf_dir, "embeddings.parquet")
    # Rebuild when the fixture is NEWER than the index (fixtures are
    # regenerated per round; an index surviving from an earlier
    # generation would silently serve stale buckets).
    stale = os.path.exists(fixture) and (
        not os.path.exists(success)
        or os.path.getmtime(fixture) > os.path.getmtime(success)
    )
    if stale or not os.path.exists(success):
        indexes.build_ann_index(corpus, path)
    return indexes.probe_ann_index(spark, path, queries, k=5)


def _cos_sql(a: str, b: str) -> str:
    return f"""
      list_aggregate(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]), 'sum')
      / (SQRT(list_aggregate(list_transform({a}, x -> x * x), 'sum'))
         * SQRT(list_aggregate(list_transform({b}, x -> x * x), 'sum')))
    """


def _ivf_cents_sql(
    refine_iters: int = 4,
    sample_n: int = 256,
    dim: int = 64,
    init: str = "kcenter",
    n_centroids: int = 10,
) -> str:
    """CTE chain recomputing operators.similarity.ivf_centroids_refined
    bit-for-bit, ending in a CTE named `cents`: deterministic init
    (init="medoid": label-medoid; init="kcenter": greedy farthest-point
    over the training sample — MAX over identical fold cosines is
    order-free, selection ties to the smaller corpus_id, exactly
    operators.similarity.kcenter_rows), then spherical-k-means rounds
    (cosine assignment with ties to the smaller centroid id;
    per-dimension ordered-fold mean update over the
    smallest-`sample_n`-id training sample; empty cells keep their
    centroid). Same determinism contract as _pq_codebook_sql."""
    init_name = "cents" if refine_iters == 0 else "cents0"
    if init == "kcenter":
        sel = [
            f"""
    csmp AS MATERIALIZED (
      SELECT corpus_id, emb FROM cl ORDER BY corpus_id LIMIT {sample_n}
    ),
    ch0 AS MATERIALIZED (
      SELECT 0 AS centroid_id, emb AS centroid
      FROM csmp ORDER BY corpus_id LIMIT 1
    )"""
        ]
        for t in range(1, n_centroids):
            sel.append(f"""
    far{t} AS MATERIALIZED (
      SELECT s.corpus_id, s.emb,
             MAX({_cos_sql("s.emb", f"ch{t - 1}.centroid")}) AS maxsim
      FROM csmp s CROSS JOIN ch{t - 1}
      GROUP BY s.corpus_id, s.emb
    ),
    ch{t} AS MATERIALIZED (
      SELECT * FROM ch{t - 1}
      UNION ALL
      SELECT {t} AS centroid_id, emb AS centroid FROM (
        SELECT emb FROM far{t} ORDER BY maxsim ASC, corpus_id LIMIT 1
      )
    )""")
        sel.append(f"""
    {init_name} AS (
      SELECT centroid_id, centroid FROM ch{n_centroids - 1}
    )""")
        parts = [",".join(sel)]
    else:
        parts = [
            f"""
    {init_name} AS (
      SELECT label AS centroid_id, emb AS centroid
      FROM (SELECT label, emb, ROW_NUMBER() OVER (PARTITION BY label ORDER BY corpus_id) AS rn FROM cl)
      WHERE rn = 1
    ),
    csmp AS (
      SELECT corpus_id, emb FROM cl ORDER BY corpus_id LIMIT {sample_n}
    )"""
        ]
    for t in range(refine_iters):
        nxt = "cents" if t == refine_iters - 1 else f"cents{t + 1}"
        parts.append(f"""
    casg{t} AS (
      SELECT corpus_id, centroid_id, emb FROM (
        SELECT csmp.corpus_id, cents{t}.centroid_id, csmp.emb,
               ROW_NUMBER() OVER (PARTITION BY csmp.corpus_id
                 ORDER BY {_cos_sql("csmp.emb", f"cents{t}.centroid")} DESC, cents{t}.centroid_id) AS rn
        FROM csmp CROSS JOIN cents{t}
      ) WHERE rn = 1
    ),
    cmu{t} AS (
      SELECT centroid_id,
             list_transform(range(1, {dim + 1}), i ->
               list_aggregate(list_transform(vs, v -> v[i]), 'sum') / len(vs)) AS new_c
      FROM (SELECT centroid_id, list(emb ORDER BY corpus_id) AS vs
            FROM casg{t} GROUP BY centroid_id)
    ),
    {nxt} AS MATERIALIZED (
      SELECT cents{t}.centroid_id, COALESCE(cmu{t}.new_c, cents{t}.centroid) AS centroid
      FROM cents{t} LEFT JOIN cmu{t} USING (centroid_id)
    )""")
    return ",".join(parts)


def _ivf_oracle(k: int = 5, nprobe: int = 2) -> str:
    """Same IVF pipeline in SQL: spherical-k-means-refined centroids
    (label-medoid init — bit-exact in any engine, see _ivf_cents_sql),
    nearest-centroid corpus assignment, nprobe query routing,
    brute-force re-rank inside probed cells."""
    return f"""
    WITH {_SPLIT_SQL},
    cl AS (
      SELECT vec_id AS corpus_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb, label
      FROM embeddings WHERE vec_id >= 10
    ),
    {_ivf_cents_sql()},
    c_assigned AS (
      SELECT corpus_id, emb, centroid_id FROM (
        SELECT cl.corpus_id, cl.emb, cents.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY cl.corpus_id
                                  ORDER BY {_cos_sql("cl.emb", "cents.centroid")} DESC, cents.centroid_id) AS crank
        FROM cl CROSS JOIN cents
      ) WHERE crank = 1
    ),
    q_probes AS (
      SELECT query_id, emb, centroid_id FROM (
        SELECT q.query_id, q.emb, cents.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                                  ORDER BY {_cos_sql("q.emb", "cents.centroid")} DESC, cents.centroid_id) AS crank
        FROM q CROSS JOIN cents
      ) WHERE crank <= {nprobe}
    ),
    scored AS (
      SELECT qb.query_id, cb.corpus_id, {_COSINE_SQL} AS score
      FROM c_assigned cb JOIN q_probes qb USING (centroid_id)
    ), ranked AS (
      SELECT query_id, corpus_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, corpus_id) AS rank
      FROM scored
    )
    SELECT query_id, corpus_id, ROUND(score, 6) AS score, rank
    FROM ranked WHERE rank <= {k}
    """


@query(
    "sim_topk_ivf",
    # Medoid centroids are deterministic and engine-portable, so the
    # oracle recomputes the same assignment/probe/re-rank pipeline.
    oracle=_ivf_oracle(),
    tags=("llm", "similarity", "ann"),
)
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via IVF: label-cell medoid centroids, nprobe=2 — the scan
    reads ~2/k_centroids of the corpus instead of all of it."""
    queries, corpus = _split(spark, sf_dir)
    em = load_table(spark, sf_dir, "embeddings")
    corpus_lab = em.where(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("corpus_id"), "embedding", "label"
    )
    cents = _centroid_rows(sf_dir, corpus_lab)
    return similarity.topk_ivf(queries, corpus_lab, k=5, nprobe=2, centroid_rows=cents)


def _pq_codebook_sql(
    m: int, d: int, n_codes: int, refine_iters: int, sample_n: int, src: str = "c"
) -> str:
    """CTE chain recomputing operators.similarity.pq_codebook
    bit-for-bit, ending in a CTE named `cb`: sample-initialized codes
    followed by `refine_iters` Lloyd's iterations. Bit-exactness hangs
    on the same two engine-portable primitives the cosine oracles use:
    sequential-fold L2 distances (fixed summation order) and
    per-dimension means summed over an ORDER BY corpus_id list (the
    Spark side folds an array_sort(collect_list) the same way)."""
    parts = [
        f"""
    cb_src AS (
      SELECT corpus_id, emb, ROW_NUMBER() OVER (ORDER BY corpus_id) - 1 AS code_id
      FROM {src} ORDER BY corpus_id LIMIT {n_codes}
    ),
    subs AS (SELECT unnest(range(0, {m})) AS s),
    cb0 AS (
      SELECT code_id, s, list_transform(range(1, {d + 1}), i -> emb[s * {d} + i]) AS code_vec
      FROM cb_src, subs
    ),
    smp AS (
      SELECT corpus_id, emb FROM {src} ORDER BY corpus_id LIMIT {sample_n}
    ),
    smp_sub AS (
      SELECT corpus_id, s, list_transform(range(1, {d + 1}), i -> emb[s * {d} + i]) AS sub_vec
      FROM smp, subs
    )"""
    ]
    for t in range(refine_iters):
        nxt = "cb" if t == refine_iters - 1 else f"cb{t + 1}"
        parts.append(f"""
    asg{t} AS (
      SELECT corpus_id, s, code_id, sub_vec FROM (
        SELECT smp_sub.corpus_id, smp_sub.s AS s, cb{t}.code_id, smp_sub.sub_vec,
               ROW_NUMBER() OVER (PARTITION BY smp_sub.corpus_id, smp_sub.s
                 ORDER BY list_aggregate(list_transform(list_zip(smp_sub.sub_vec, cb{t}.code_vec),
                          p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum'), cb{t}.code_id) AS rn
        FROM smp_sub JOIN cb{t} ON cb{t}.s = smp_sub.s
      ) WHERE rn = 1
    ),
    mu{t} AS (
      SELECT s, code_id,
             list_transform(range(1, {d + 1}), i ->
               list_aggregate(list_transform(vs, v -> v[i]), 'sum') / len(vs)) AS new_vec
      FROM (SELECT s, code_id, list(sub_vec ORDER BY corpus_id) AS vs
            FROM asg{t} GROUP BY s, code_id)
    ),
    {nxt} AS MATERIALIZED (
      SELECT cb{t}.code_id, cb{t}.s, COALESCE(mu{t}.new_vec, cb{t}.code_vec) AS code_vec
      FROM cb{t} LEFT JOIN mu{t} ON mu{t}.s = cb{t}.s AND mu{t}.code_id = cb{t}.code_id
    )""")
    if refine_iters == 0:
        parts.append("""
    cb AS (SELECT code_id, s, code_vec FROM cb0)""")
    return ",".join(parts)


def _pq_oracle(
    k: int = 5,
    m: int = 8,
    d: int = 8,
    n_codes: int = 32,
    refine_iters: int = 4,
    sample_n: int = 256,
) -> str:
    """Same PQ pipeline in SQL: k-means-refined codebooks
    (_pq_codebook_sql), per-subspace L2 argmin encoding (ties to the
    smaller code id), reconstruction in subspace order, one-fold dot
    scoring."""
    return f"""
    WITH {_SPLIT_SQL},
    {_pq_codebook_sql(m, d, n_codes, refine_iters, sample_n)},
    c_sub AS (
      SELECT corpus_id, s, list_transform(range(1, {d + 1}), i -> emb[s * {d} + i]) AS sub_vec
      FROM c, subs
    ),
    scored_codes AS (
      SELECT corpus_id, c_sub.s AS s, code_id, code_vec,
             list_aggregate(list_transform(list_zip(sub_vec, code_vec),
                            p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum') AS dist
      FROM c_sub JOIN cb ON cb.s = c_sub.s
    ),
    codes AS (
      SELECT corpus_id, s, code_id, code_vec FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY corpus_id, s ORDER BY dist, code_id) AS rn
        FROM scored_codes
      ) WHERE rn = 1
    ),
    recon AS (
      SELECT corpus_id, flatten(list(code_vec ORDER BY s)) AS rv
      FROM codes GROUP BY corpus_id
    ),
    scored AS (
      SELECT q.query_id, recon.corpus_id,
             list_aggregate(list_transform(list_zip(q.emb, recon.rv),
                            p -> p[1] * p[2]), 'sum') AS score
      FROM recon CROSS JOIN q
    ), ranked AS (
      SELECT query_id, corpus_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, corpus_id) AS rank
      FROM scored
    )
    SELECT query_id, corpus_id, ROUND(score, 6) AS score, rank
    FROM ranked WHERE rank <= {k}
    """


@query(
    "sim_topk_pq",
    # The k-means-refined codebook is deterministic end to end
    # (sample init, ordered-fold assignment + means), and the encode
    # argmin / reconstructed-dot score are fixed-order folds — the
    # oracle recomputes the identical refined PQ pipeline.
    oracle=_pq_oracle(),
    tags=("llm", "similarity", "ann", "pq"),
)
def sim_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via product quantization (8 subspaces × 16 codes → 8-byte
    codes, a 32× memory cut over float32 vectors): encode the corpus
    once, score queries against reconstructions (≡ the ADC value).
    The scale path stores only the codes and scores via per-query
    lookup tables; IVF-PQ partitions the codes by coarse centroid."""
    queries, corpus = _split(spark, sf_dir)
    rows = _codebook_rows(sf_dir, corpus)
    return similarity.topk_pq(queries, corpus, k=5, codebook_rows=rows)


def _ivfpq_oracle(
    k: int = 5,
    nprobe: int = 2,
    m: int = 8,
    d: int = 8,
    n_codes: int = 32,
    refine_iters: int = 4,
    sample_n: int = 256,
) -> str:
    """IVF routing (medoid centroids, nprobe cells) composed with PQ
    scoring (refined codebook/encode/reconstruct) — both deterministic,
    so the oracle recomputes the exact hybrid pipeline."""
    return f"""
    WITH {_SPLIT_SQL},
    cl AS (
      SELECT vec_id AS corpus_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb, label
      FROM embeddings WHERE vec_id >= 10
    ),
    {_ivf_cents_sql()},
    c_assigned AS (
      SELECT corpus_id, centroid_id FROM (
        SELECT cl.corpus_id, cents.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY cl.corpus_id
                                  ORDER BY {_cos_sql("cl.emb", "cents.centroid")} DESC, cents.centroid_id) AS crank
        FROM cl CROSS JOIN cents
      ) WHERE crank = 1
    ),
    q_probes AS (
      SELECT query_id, emb, centroid_id FROM (
        SELECT q.query_id, q.emb, cents.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                                  ORDER BY {_cos_sql("q.emb", "cents.centroid")} DESC, cents.centroid_id) AS crank
        FROM q CROSS JOIN cents
      ) WHERE crank <= {nprobe}
    ),
    {_pq_codebook_sql(m, d, n_codes, refine_iters, sample_n)},
    c_sub AS (
      SELECT corpus_id, s, list_transform(range(1, {d + 1}), i -> emb[s * {d} + i]) AS sub_vec
      FROM c, subs
    ),
    scored_codes AS (
      SELECT corpus_id, c_sub.s AS s, code_id, code_vec,
             list_aggregate(list_transform(list_zip(sub_vec, code_vec),
                            p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum') AS dist
      FROM c_sub JOIN cb ON cb.s = c_sub.s
    ),
    codes AS (
      SELECT corpus_id, s, code_vec FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY corpus_id, s ORDER BY dist, code_id) AS rn
        FROM scored_codes
      ) WHERE rn = 1
    ),
    recon AS (
      SELECT corpus_id, flatten(list(code_vec ORDER BY s)) AS rv
      FROM codes GROUP BY corpus_id
    ),
    scored AS (
      SELECT qp.query_id, ca.corpus_id,
             list_aggregate(list_transform(list_zip(qp.emb, recon.rv),
                            p -> p[1] * p[2]), 'sum') AS score
      FROM c_assigned ca
      JOIN q_probes qp USING (centroid_id)
      JOIN recon ON recon.corpus_id = ca.corpus_id
    ), ranked AS (
      SELECT query_id, corpus_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, corpus_id) AS rank
      FROM scored
    )
    SELECT query_id, corpus_id, ROUND(score, 6) AS score, rank
    FROM ranked WHERE rank <= {k}
    """


@query(
    "sim_topk_ivfpq",
    # Both stages are deterministic (medoid centroids, k-means-refined
    # codebooks via ordered folds) — the oracle recomputes the exact
    # hybrid. See _ivf_oracle and _pq_oracle for the pieces.
    oracle=_ivfpq_oracle(),
    tags=("llm", "similarity", "ann", "ivf", "pq"),
)
def sim_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ — the billion-scale ANN layout: coarse cells route each
    query to nprobe=2 partitions, PQ codes (8×16) score candidates at
    ~32× less memory than raw vectors. At rest: partitionBy(cell) over
    (cell_id, code) rows → a probe reads compressed codes from two
    partitions instead of the corpus."""
    queries, corpus = _split(spark, sf_dir)
    rows = _codebook_rows(sf_dir, corpus)
    em = load_table(spark, sf_dir, "embeddings")
    corpus_lab = em.where(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("corpus_id"), "embedding", "label"
    )
    cents = _centroid_rows(sf_dir, corpus_lab)
    return similarity.topk_ivfpq(
        queries, corpus_lab, k=5, nprobe=2, codebook_rows=rows, centroid_rows=cents
    )

_RCB_CACHE: dict[str, list] = {}


def _residual_codebook_rows(sf_dir: str, corpus, cent_rows: list) -> list:
    """PQ codebook trained on coarse-quantizer residuals (collected
    once per fixture dir) — see operators.similarity.pq_residual_codebook."""
    from serverless_datalake_spark.operators.similarity import pq_residual_codebook

    rows = _RCB_CACHE.get(sf_dir)
    if rows is None:
        rows = pq_residual_codebook(
            corpus, "corpus_id", "embedding", centroid_rows=cent_rows
        ).collect()
        _RCB_CACHE[sf_dir] = rows
    return rows


def _ivfpq_residual_oracle(
    k: int = 5, nprobe: int = 2, m: int = 8, d: int = 8, n_codes: int = 32
) -> str:
    """Residual IVF-PQ in SQL: refined centroids (_ivf_cents_sql), exact
    per-vector residuals, Lloyd's codebook over the residual relation
    (_pq_codebook_sql src='cr'), residual encode/reconstruct, re-add the
    centroid, ADC scoring inside probed cells. Every stage reuses the
    proven deterministic idioms, so the oracle recomputes the exact
    hybrid."""
    return f"""
    WITH {_SPLIT_SQL},
    cl AS (
      SELECT vec_id AS corpus_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb, label
      FROM embeddings WHERE vec_id >= 10
    ),
    {_ivf_cents_sql()},
    q_probes AS (
      SELECT query_id, emb, centroid_id FROM (
        SELECT q.query_id, q.emb, cents.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                                  ORDER BY {_cos_sql("q.emb", "cents.centroid")} DESC, cents.centroid_id) AS crank
        FROM q CROSS JOIN cents
      ) WHERE crank <= {nprobe}
    ),
    cra AS (
      SELECT corpus_id, emb, centroid_id, centroid FROM (
        SELECT c.corpus_id, c.emb, cents.centroid_id, cents.centroid,
               ROW_NUMBER() OVER (PARTITION BY c.corpus_id
                                  ORDER BY {_cos_sql("c.emb", "cents.centroid")} DESC, cents.centroid_id) AS rn
        FROM c CROSS JOIN cents
      ) WHERE rn = 1
    ),
    cr AS (
      SELECT corpus_id, list_transform(list_zip(emb, centroid), p -> p[1] - p[2]) AS emb
      FROM cra
    ),
    {_pq_codebook_sql(m, d, n_codes, 4, 256, src="cr")},
    r_sub AS (
      SELECT corpus_id, s, list_transform(range(1, {d + 1}), i -> emb[s * {d} + i]) AS sub_vec
      FROM cr, subs
    ),
    r_scored AS (
      SELECT corpus_id, r_sub.s AS s, code_id, code_vec,
             list_aggregate(list_transform(list_zip(sub_vec, code_vec),
                            p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum') AS dist
      FROM r_sub JOIN cb ON cb.s = r_sub.s
    ),
    r_codes AS (
      SELECT corpus_id, s, code_vec FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY corpus_id, s ORDER BY dist, code_id) AS rn
        FROM r_scored
      ) WHERE rn = 1
    ),
    r_recon AS (
      SELECT corpus_id, flatten(list(code_vec ORDER BY s)) AS rv
      FROM r_codes GROUP BY corpus_id
    ),
    appx AS (
      SELECT cra.corpus_id, cra.centroid_id,
             list_transform(list_zip(cra.centroid, r_recon.rv), p -> p[1] + p[2]) AS av
      FROM cra JOIN r_recon USING (corpus_id)
    ),
    scored AS (
      SELECT qp.query_id, ax.corpus_id,
             list_aggregate(list_transform(list_zip(qp.emb, ax.av),
                            p -> p[1] * p[2]), 'sum') AS score
      FROM appx ax JOIN q_probes qp USING (centroid_id)
    ), ranked AS (
      SELECT query_id, corpus_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, corpus_id) AS rank
      FROM scored
    )
    SELECT query_id, corpus_id, ROUND(score, 6) AS score, rank
    FROM ranked WHERE rank <= {k}
    """


@query(
    "sim_topk_ivfpq_residual",
    # Residuals, codebook, encode, and scoring all reuse the proven
    # deterministic idioms (ordered folds, fold argmin/argmax with
    # first-wins ties) — the oracle recomputes the exact pipeline.
    oracle=_ivfpq_residual_oracle(nprobe=4),
    tags=("llm", "similarity", "ann", "ivf", "pq", "residual"),
)
def sim_topk_ivfpq_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual IVF-PQ (FAISS IndexIVFPQ layout): PQ-encode
    x − centroid instead of x. The same 8-byte code budget then
    quantizes the (smaller) residuals more accurately — reconstruction
    error drops ~8% on the near-uniform fixture embeddings
    (tests/test_pq_refine.py asserts the strict improvement) and far
    more on genuinely clustered corpora, where residual norms shrink
    with cluster tightness. The corpus side is one map-only projection
    (assign → residual → encode → reconstruct → re-add) before the
    broadcast probe join.

    Knobs (measured, round 5): on this fixture the binding constraint
    is ROUTING, not quantization — exact-vector recall inside the
    probed cells is 0.36 at nprobe=2 vs 0.66 at nprobe=4, while
    residual reconstruction MSE is already below plain IVF-PQ's
    (0.0069 vs 0.0074; the near-uniform embeddings leave the coarse
    quantizer only ~7% of the energy to remove, so the residual gain
    is structural, not dramatic). nprobe=4 lifts this leg's recall@5
    0.20 → 0.30 for ~2× candidate-scoring cost on the cheap ADC side;
    the corpus-side encode (the expensive fixed cost) is unchanged."""
    queries, corpus = _split(spark, sf_dir)
    em = load_table(spark, sf_dir, "embeddings")
    corpus_lab = em.where(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("corpus_id"), "embedding", "label"
    )
    cents = _centroid_rows(sf_dir, corpus_lab)
    rcb = _residual_codebook_rows(sf_dir, corpus, cents)
    return similarity.topk_ivfpq_residual(
        queries, corpus, k=5, nprobe=4, centroid_rows=cents, codebook_rows=rcb
    )


def _ivfpq_rerank_oracle(k: int = 5, shortlist: int = 20, nprobe: int = 2) -> str:
    """The full IVF-PQ pipeline (nested as a CTE — DuckDB allows WITH
    inside a CTE body) widened to a ``shortlist``-deep candidate list,
    then re-scored with EXACT cosine against the raw vectors."""
    return f"""
    WITH shortlist AS (
      {_ivfpq_oracle(k=shortlist, nprobe=nprobe)}
    ), {_SPLIT_SQL},
    rescored AS (
      SELECT s.query_id, s.corpus_id, {_cos_sql("q.emb", "c.emb")} AS score
      FROM shortlist s
      JOIN q ON q.query_id = s.query_id
      JOIN c ON c.corpus_id = s.corpus_id
    ), ranked AS (
      SELECT query_id, corpus_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, corpus_id) AS rank
      FROM rescored
    )
    SELECT query_id, corpus_id, ROUND(score, 6) AS score, rank
    FROM ranked WHERE rank <= {k}
    """


@query(
    "sim_topk_ivfpq_rerank",
    oracle=_ivfpq_rerank_oracle(),
    tags=("llm", "similarity", "ann", "ivf", "pq", "rerank"),
)
def sim_topk_ivfpq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ + exact re-ranking — the production recall fix (FAISS's
    refine/RFlat stage): the compressed index nominates a shortlist
    (here 4k deep), then ONLY those shortlist rows are re-scored
    against their raw vectors with exact cosine. ADC quantization
    error affects candidate *nomination* but no longer the final
    ordering, so recall@k approaches brute force while the corpus-wide
    scan still touches only PQ codes in nprobe cells.

    Scale shape: the expensive stage (ADC over probed cells) is
    unchanged from sim_topk_ivfpq; the re-rank joins |Q|·shortlist
    rows (tiny) back to the corpus by id — at rest that's a point-read
    of raw vectors for ~20 ids per query, the classic "codes in RAM,
    raw vectors on flash" split (DiskANN/FAISS refine). No new
    corpus-wide shuffle is introduced; the shortlist side is broadcast."""
    queries, corpus = _split(spark, sf_dir)
    em = load_table(spark, sf_dir, "embeddings")
    corpus_lab = em.where(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("corpus_id"), "embedding", "label"
    )
    rows = _codebook_rows(sf_dir, corpus)
    cents = _centroid_rows(sf_dir, corpus_lab)
    sl = similarity.topk_ivfpq(
        queries, corpus_lab, k=20, nprobe=2,
        codebook_rows=rows, centroid_rows=cents,
    ).select("query_id", "corpus_id")
    from pyspark.sql import Window

    from serverless_datalake_spark.operators.similarity import _as_double, cosine

    q = queries.select("query_id", _as_double(F.col("embedding")).alias("__qv"))
    c = corpus.select("corpus_id", _as_double(F.col("embedding")).alias("__cv"))
    rescored = (
        c.join(F.broadcast(sl), "corpus_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "corpus_id",
            cosine(F.col("__qv"), F.col("__cv")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("corpus_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select(
            "query_id",
            "corpus_id",
            F.round("score", 6).alias("score"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def _sq8_oracle() -> str:
    """Scalar int8 quantization twin: identical per-dim min/max grid,
    identical quantize/dequantize arithmetic, ordered error folds."""
    return """
    WITH c AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ), dims AS (
      SELECT u.i AS dim, MIN(c.emb[u.i]) AS lo, MAX(c.emb[u.i]) AS hi
      FROM c, (SELECT unnest(range(1, 65)) AS i) u
      GROUP BY 1
    ), grid AS (
      SELECT list(lo ORDER BY dim) AS los, list(hi ORDER BY dim) AS his FROM dims
    ), err AS (
      SELECT c.vec_id,
             list_transform(range(1, 65), i ->
               CASE WHEN grid.his[i] = grid.los[i] THEN 0.0
                    ELSE c.emb[i] - (grid.los[i]
                         + (ROUND((c.emb[i] - grid.los[i])
                                  / (grid.his[i] - grid.los[i]) * 254.0, 0) / 254.0)
                           * (grid.his[i] - grid.los[i]))
               END) AS es
      FROM c CROSS JOIN grid
    )
    SELECT vec_id,
           ROUND(list_aggregate(list_transform(es, e -> e * e), 'sum') / 64.0, 8) AS mse,
           ROUND(list_aggregate(list_transform(es, e -> ABS(e)), 'max'), 8) AS max_abs_err
    FROM err
    """


@query("embedding_quantize_int8", oracle=_sq8_oracle(), tags=("llm", "similarity", "quantization"))
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization (the FAISS SQ8 layout): per-dimension
    [min, max] ranges over the corpus, each coordinate snapped to one
    of 255 levels — 4× storage cut with sub-percent cosine distortion,
    the cheap tier below PQ's 32× (sim_topk_pq). Reported per vector:
    reconstruction MSE and max absolute coordinate error — the
    numbers that decide whether SQ8 or PQ backs the serving index.

    Scale shape: the range grid is one explode + 64-row aggregate,
    broadcast back as two 64-element arrays; quantize/dequantize/error
    is then MAP-ONLY per vector (ordered index folds, so the oracle is
    bit-exact; degenerate constant dimensions quantize to zero error
    by definition)."""
    em = load_table(spark, sf_dir, "embeddings")
    c = em.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("emb"),
    )
    dims = c.select(
        F.posexplode(F.col("emb")).alias("p", "x")
    ).groupBy("p").agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    grid = dims.groupBy().agg(
        F.array_sort(F.collect_list(F.struct("p", "lo", "hi"))).alias("g")
    ).select(
        F.transform("g", lambda s: s["lo"]).alias("los"),
        F.transform("g", lambda s: s["hi"]).alias("his"),
    )
    lo = lambda i: F.element_at("los", i)  # noqa: E731
    hi = lambda i: F.element_at("his", i)  # noqa: E731
    x = lambda i: F.element_at("emb", i)  # noqa: E731
    recon = lambda i: lo(i) + (
        F.round((x(i) - lo(i)) / (hi(i) - lo(i)) * 254.0, 0) / 254.0
    ) * (hi(i) - lo(i))  # noqa: E731
    es = F.transform(
        F.sequence(F.lit(1), F.lit(64)),
        lambda i: F.when(hi(i) == lo(i), F.lit(0.0)).otherwise(x(i) - recon(i)),
    )
    err = c.crossJoin(F.broadcast(grid)).select("vec_id", es.alias("es"))
    mse = F.aggregate(
        F.transform("es", lambda e: e * e), F.lit(0.0), lambda s, e: s + e
    ) / F.lit(64.0)
    mx = F.array_max(F.transform("es", lambda e: F.abs(e)))
    return err.select(
        "vec_id",
        F.round(mse, 8).alias("mse"),
        F.round(mx, 8).alias("max_abs_err"),
    )


def _range_search_oracle(tau: float = 0.15) -> str:
    return f"""
    WITH {_SPLIT_SQL},
    qb AS (SELECT query_id, emb, {_bucket_sql('emb', n_planes=4)} AS bucket FROM q),
    cb AS (SELECT corpus_id, emb, {_bucket_sql('emb', n_planes=4)} AS bucket FROM c),
    scored AS (
      SELECT qb.query_id, cb.corpus_id, {_COSINE_SQL} AS score
      FROM cb JOIN qb USING (bucket)
    )
    SELECT query_id, corpus_id, ROUND(score, 6) AS score
    FROM scored WHERE score >= {tau}
    """


@query(
    "sim_range_search",
    oracle=_range_search_oracle(),
    tags=("llm", "similarity", "range"),
)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius (range) similarity search — "everything within cosine
    ≥ τ", the other half of the ANN API surface next to top-k:
    near-duplicate harvesting, recommendation pools, and dedup
    candidate generation all want ALL matches above a floor, not a
    fixed k. (τ = 0.15 sits at the fixture's ~p90 of cross-set
    cosines, so the radius set is non-trivial at both gate scales.) Candidates come from the same deterministic hyperplane
    buckets as sim_topk_lsh; the τ filter replaces the per-query
    rank window, so there is NO window state at all — output size is
    data-driven.

    Scale shape: identical to the bucketed top-k up to the last
    operator (bucket join on the at-rest layout), minus the window:
    one broadcast of the query probes, one filtered projection.
    The unbounded output is the point — it streams straight into the
    dedup pair consumers without a top-k truncation bias."""
    queries, corpus = _split(spark, sf_dir)
    from serverless_datalake_spark.operators.similarity import (
        _as_double,
        cosine,
        lsh_bucket,
    )

    q = queries.select(
        "query_id",
        _as_double(F.col("embedding")).alias("__qv"),
        lsh_bucket("embedding", 4, 64).alias("bucket"),
    )
    c = corpus.select(
        "corpus_id",
        _as_double(F.col("embedding")).alias("__cv"),
        lsh_bucket("embedding", 4, 64).alias("bucket"),
    )
    return (
        c.join(F.broadcast(q), "bucket")
        .select(
            "query_id",
            "corpus_id",
            cosine(F.col("__qv"), F.col("__cv")).alias("score"),
        )
        .where(F.col("score") >= 0.15)
        .select("query_id", "corpus_id", F.round("score", 6).alias("score"))
    )


def _matryoshka_oracle(dims: int = 16, k: int = 5) -> str:
    return f"""
    WITH q AS (
      SELECT vec_id AS query_id,
             list_transform(embedding[1:{dims}], x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings WHERE vec_id < 10
    ), c AS (
      SELECT vec_id AS corpus_id,
             list_transform(embedding[1:{dims}], x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings WHERE vec_id >= 10
    ), scored AS (
      SELECT q.query_id, c.corpus_id, {_cos_sql("q.emb", "c.emb")} AS score
      FROM q CROSS JOIN c
    ), ranked AS (
      SELECT query_id, corpus_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, corpus_id) AS rank
      FROM scored
    )
    SELECT query_id, corpus_id, ROUND(score, 6) AS score, rank
    FROM ranked WHERE rank <= {k}
    """


@query(
    "sim_topk_truncated_dims",
    oracle=_matryoshka_oracle(),
    tags=("llm", "similarity", "matryoshka"),
)
def sim_topk_truncated_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated-dimension retrieval (the Matryoshka/MRL serving
    pattern): score with only the FIRST 16 of 64 dimensions — 4× less
    memory bandwidth and compute per comparison, the standard
    first-stage filter when embeddings are trained with
    matryoshka-style prefix losses (for fixtures' isotropic vectors
    truncation costs recall, which is exactly what comparing against
    sim_topk_bruteforce measures — the property test quantifies it).

    Scale shape: identical to sim_topk_bruteforce (labeled baseline)
    — broadcast queries × one corpus scan — but the scan reads a
    prefix slice; at rest a dims-major layout (or a separate prefix
    column) turns the slice into genuine I/O savings, and the full-
    vector re-rank of the shortlist is sim_topk_ivfpq_rerank's
    refine stage."""
    em = load_table(spark, sf_dir, "embeddings")
    from serverless_datalake_spark.operators.similarity import _as_double

    def pfx(df, idc):
        return df.select(
            F.col("vec_id").alias(idc),
            F.slice(_as_double(F.col("embedding")), 1, 16).alias("emb"),
        )

    queries = pfx(em.where(F.col("vec_id") < 10), "query_id")
    corpus = pfx(em.where(F.col("vec_id") >= 10), "corpus_id")
    return similarity.topk_bruteforce(
        queries, corpus, k=5, vec="emb"
    )


def _sq8_rerank_oracle(shortlist: int = 12, k: int = 5) -> str:
    """SQ8 serving twin: corpus-side per-dim grid, identical
    dequantize arithmetic to _sq8_oracle, approx-cosine shortlist,
    exact-cosine re-rank."""
    return f"""
    WITH {_SPLIT_SQL},
    dims AS (
      SELECT u.i AS dim, MIN(c.emb[u.i]) AS lo, MAX(c.emb[u.i]) AS hi
      FROM c, (SELECT unnest(range(1, 65)) AS i) u
      GROUP BY 1
    ), grid AS (
      SELECT list(lo ORDER BY dim) AS los, list(hi ORDER BY dim) AS his FROM dims
    ), crec AS (
      SELECT c.corpus_id,
             list_transform(range(1, 65), i ->
               CASE WHEN grid.his[i] = grid.los[i] THEN grid.los[i]
                    ELSE grid.los[i]
                         + (ROUND((c.emb[i] - grid.los[i])
                                  / (grid.his[i] - grid.los[i]) * 254.0, 0) / 254.0)
                           * (grid.his[i] - grid.los[i])
               END) AS rec
      FROM c CROSS JOIN grid
    ), approx AS (
      SELECT q.query_id, crec.corpus_id, {_cos_sql("q.emb", "crec.rec")} AS ascore
      FROM q CROSS JOIN crec
    ), shortlist AS (
      SELECT query_id, corpus_id FROM (
        SELECT query_id, corpus_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY ascore DESC, corpus_id) AS arn
        FROM approx
      ) WHERE arn <= {shortlist}
    ), exact AS (
      SELECT s.query_id, s.corpus_id, {_cos_sql("q.emb", "c.emb")} AS score
      FROM shortlist s
      JOIN q ON s.query_id = q.query_id
      JOIN c ON s.corpus_id = c.corpus_id
    ), ranked AS (
      SELECT query_id, corpus_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, corpus_id) AS rank
      FROM exact
    )
    SELECT query_id, corpus_id, ROUND(score, 6) AS score, rank
    FROM ranked WHERE rank <= {k}
    """


@query(
    "sim_topk_sq8_rerank",
    oracle=_sq8_rerank_oracle(),
    tags=("llm", "similarity", "quantization", "rerank"),
)
def sim_topk_sq8_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 SERVING leg (the 4x tier below PQ): score queries against
    the int8-DEQUANTIZED corpus (embedding_quantize_int8's exact grid
    arithmetic — per-dim corpus [lo, hi], 255 levels), shortlist the
    top 12 per query by approximate cosine, then re-rank the shortlist
    with exact full-precision cosine and emit the final top 5. The
    standard memory-bandwidth trade for a serving index whose recall
    loss PQ would double: 4x less scan per comparison, exactness
    restored on the 12-deep cut.

    Scale shape: the grid is one explode + 64-row aggregate broadcast
    back (constant); dequantize + approx score is the map-only corpus
    scan every brute-force leg pays (at rest the int8 codes are the
    stored column, so the scan reads 1/4 the bytes); both rank windows
    are per-query WindowGroupLimit top-k; the exact re-rank re-reads
    only shortlist ids (broadcast semi-join point-reads), carrying
    (ids, score) — never payloads — through the windows."""
    from serverless_datalake_spark.operators.similarity import _as_double, cosine

    em = load_table(spark, sf_dir, "embeddings")
    q = em.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), _as_double(F.col("embedding")).alias("qv")
    )
    c = em.where(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("corpus_id"), _as_double(F.col("embedding")).alias("cv")
    )
    dims = c.select(F.posexplode(F.col("cv")).alias("p", "x")).groupBy("p").agg(
        F.min("x").alias("lo"), F.max("x").alias("hi")
    )
    grid = dims.groupBy().agg(
        F.array_sort(F.collect_list(F.struct("p", "lo", "hi"))).alias("g")
    ).select(
        F.transform("g", lambda s: s["lo"]).alias("los"),
        F.transform("g", lambda s: s["hi"]).alias("his"),
    )
    lo = lambda i: F.element_at("los", i)  # noqa: E731
    hi = lambda i: F.element_at("his", i)  # noqa: E731
    x = lambda i: F.element_at("cv", i)  # noqa: E731
    rec = F.transform(
        F.sequence(F.lit(1), F.lit(64)),
        lambda i: F.when(hi(i) == lo(i), lo(i)).otherwise(
            lo(i)
            + (F.round((x(i) - lo(i)) / (hi(i) - lo(i)) * 254.0, 0) / 254.0)
            * (hi(i) - lo(i))
        ),
    )
    crec = c.crossJoin(F.broadcast(grid)).select("corpus_id", rec.alias("rec"))
    approx = crec.crossJoin(F.broadcast(q)).select(
        "query_id", "corpus_id", cosine(F.col("qv"), F.col("rec")).alias("ascore")
    )
    aw = Window.partitionBy("query_id").orderBy(
        F.col("ascore").desc(), F.col("corpus_id")
    )
    shortlist = (
        approx.withColumn("arn", F.row_number().over(aw))
        .where(F.col("arn") <= 12)
        .select("query_id", "corpus_id")
    )
    exact = (
        c.join(F.broadcast(shortlist), "corpus_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "corpus_id", cosine(F.col("qv"), F.col("cv")).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("corpus_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select(
            "query_id",
            "corpus_id",
            F.round("score", 6).alias("score"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


@query(
    "sim_centroid_drift",
    oracle="""
    WITH dims AS (
      SELECT label, vec_id, u.i AS p,
             CAST(embedding[u.i] AS DOUBLE) AS x
      FROM embeddings, (SELECT unnest(range(1, 65)) AS i) u
    ), lab AS (
      SELECT label, p,
             list_aggregate(list(x ORDER BY vec_id), 'sum') / CAST(COUNT(*) AS DOUBLE) AS m
      FROM dims GROUP BY label, p
    ), gctr AS (
      SELECT p,
             list_aggregate(list(x ORDER BY vec_id), 'sum') / CAST(COUNT(*) AS DOUBLE) AS g
      FROM dims GROUP BY p
    ), vecs AS (
      SELECT lab.label,
             list(lab.m ORDER BY lab.p) AS lv,
             list(gctr.g ORDER BY lab.p) AS gv
      FROM lab JOIN gctr USING (p)
      GROUP BY lab.label
    )
    SELECT label,
           ROUND(
             list_aggregate(list_transform(list_zip(lv, gv), q -> q[1] * q[2]), 'sum')
             / (SQRT(list_aggregate(list_transform(lv, x -> x * x), 'sum'))
                * SQRT(list_aggregate(list_transform(gv, x -> x * x), 'sum'))), 6)
             AS centroid_cosine
    FROM vecs
    """,
    tags=("llm", "similarity", "drift"),
)
def sim_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift monitor: cosine between each label's
    centroid and the global centroid — the per-slice statistic that
    catches an embedding model change or a poisoned shard shifting
    one class's region while the corpus-level mean stays put (the
    embedding-space analog of text_kl_divergence's token drift).

    Per-dimension means fold in vec_id order (distributed mean is
    float-order-sensitive; the ordered fold keeps both engines
    bit-identical), centroid vectors assemble dim-sorted, the final
    cosine is the established fold spelling.

    Scale shape: one (label, dim) shuffle of exploded coordinates
    (64× row expansion — dimension-bounded, the standard columnar
    layout for embedding stats), a dim-keyed join of label and global
    centroids (64·|labels| rows), label-sized output."""
    em = load_table(spark, sf_dir, "embeddings")
    dims = em.select(
        "label",
        "vec_id",
        F.posexplode(
            F.transform(F.col("embedding"), lambda x: x.cast("double"))
        ).alias("p", "x"),
    )

    def mean_fold(df, keys):
        arr = F.array_sort(F.collect_list(F.struct("vec_id", "x")))
        return df.groupBy(*keys).agg(
            (
                F.aggregate(
                    F.transform(arr, lambda r: r["x"]), F.lit(0.0), lambda s, v: s + v
                )
                / F.count(F.lit(1)).cast("double")
            ).alias("m")
        )

    lab = mean_fold(dims, ["label", "p"])
    glob = mean_fold(dims, ["p"]).withColumnRenamed("m", "g")
    vecs = (
        lab.join(glob, "p")
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("p", "m", "g"))).alias("a"))
        .select(
            "label",
            F.transform("a", lambda r: r["m"]).alias("lv"),
            F.transform("a", lambda r: r["g"]).alias("gv"),
        )
    )
    dot = F.aggregate(
        F.zip_with("lv", "gv", lambda a, b: a * b), F.lit(0.0), lambda s, v: s + v
    )
    nl = F.sqrt(
        F.aggregate(F.transform("lv", lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
    )
    ng = F.sqrt(
        F.aggregate(F.transform("gv", lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
    )
    return vecs.select(
        "label", F.round(dot / (nl * ng), 6).alias("centroid_cosine")
    )


def _pca_oracle(iters: int = 3) -> str:
    """Power-iteration oracle: each round recomputes s = Σ_rows x·(x·v)
    in exact 1e-8 integer units (order-independent sum), then
    renormalizes through an ordered p-fold — the bit-exact DuckDB twin
    of the Spark iteration."""
    parts = [
        """
    WITH dims AS (
      SELECT vec_id, u.i AS p, CAST(embedding[u.i] AS DOUBLE) AS x
      FROM embeddings, (SELECT unnest(range(1, 65)) AS i) u
    ), v0 AS (
      SELECT list_transform(range(1, 65), q -> 0.125) AS v
    )"""
    ]
    for k in range(1, iters + 1):
        parts.append(
            f""", dot{k} AS (
      SELECT vec_id,
             list_aggregate(list(x * v[p] ORDER BY p), 'sum') AS dot
      FROM dims CROSS JOIN v{k - 1}
      GROUP BY vec_id
    ), s{k} AS (
      SELECT d.p,
             CAST(SUM(CAST(ROUND(d.x * t.dot * 100000000.0, 0) AS BIGINT)) AS BIGINT) AS s
      FROM dims d JOIN dot{k} t ON t.vec_id = d.vec_id
      GROUP BY d.p
    ), n{k} AS (
      SELECT SQRT(list_aggregate(
               list_transform(list(s / 100000000.0 ORDER BY p), q -> q * q), 'sum'))
             AS nrm
      FROM s{k}
    ), v{k} AS (
      SELECT list(s / 100000000.0 / nrm ORDER BY p) AS v
      FROM s{k} CROSS JOIN n{k}
    )"""
        )
    parts.append(
        f"""
    SELECT u.i AS dim,
           ROUND(v[u.i], 6) AS loading,
           ROUND((SELECT nrm FROM n{iters}), 3) AS eigenvalue
    FROM v{iters}, (SELECT unnest(range(1, 65)) AS i) u
    """
    )
    return "".join(parts)


@query(
    "embedding_pca_power",
    oracle=_pca_oracle(),
    tags=("llm", "embedding", "pca"),
)
def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal direction of the (uncentered) embedding
    second-moment matrix by DISTRIBUTED POWER ITERATION — the
    spectral primitive behind whitening, anisotropy diagnostics
    ("is the embedding space collapsing to a cone?"), and
    Matryoshka-style dimension ranking. Three fixed iterations of
    s ← Σ_rows x·(xᵀv); v ← s/‖s‖ from the deterministic start
    v₀ = (1/8,…,1/8); returns the 64 loadings and the eigenvalue
    estimate ‖s₃‖ (Rayleigh quotient at unit norm).

    Exactness: the data-sized sum Σ x·(xᵀv) accumulates in 1e-8
    integer units (order-independent, partial-agg map-side — the
    pagerank discipline), while the per-row inner product and the
    64-term normalization fold in fixed index order in both engines.

    Scale shape: per iteration ONE shuffle of 64-key partial sums
    (the exploded coordinate relation never materializes — it
    streams from the scan into map-side combine); v is a 64-double
    broadcast. Iteration count is fixed → one static 3-round plan,
    no driver-side data movement."""
    em = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("emb"),
    )
    v = spark.range(1).select(
        F.array_repeat(F.lit(0.125), 64).alias("v")
    )
    for _ in range(3):
        dot = F.aggregate(
            F.zip_with("emb", "v", lambda x, w: x * w), F.lit(0.0), lambda s, x: s + x
        )
        contrib = (
            em.crossJoin(F.broadcast(v))
            .select("vec_id", dot.alias("dot"), F.posexplode("emb").alias("p", "x"))
            .select(
                "p",
                F.round(F.col("x") * F.col("dot") * 100000000.0, 0)
                .cast("long")
                .alias("c"),
            )
        )
        s = contrib.groupBy("p").agg(F.sum("c").alias("s"))
        assembled = s.groupBy().agg(
            F.array_sort(F.collect_list(F.struct("p", "s"))).alias("a")
        )
        nrm = F.sqrt(
            F.aggregate(
                F.transform("a", lambda r: (r["s"] / 100000000.0) * (r["s"] / 100000000.0)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        v = assembled.select(
            nrm.alias("nrm"),
            F.transform("a", lambda r: r["s"] / 100000000.0).alias("sv"),
        ).select(
            F.zip_with(
                "sv", F.array_repeat("nrm", 64), lambda x, n: x / n
            ).alias("v"),
            "nrm",
        )
        nrm_col = True
    # final: explode loadings with 1-based dim to mirror the oracle
    return v.select(
        F.posexplode("v").alias("p0", "loading_raw"), F.col("nrm")
    ).select(
        (F.col("p0") + 1).cast("long").alias("dim"),
        F.round("loading_raw", 6).alias("loading"),
        F.round("nrm", 3).alias("eigenvalue"),
    )


@query(
    "sim_knn_graph_blocked",
    oracle="""
    WITH v AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ), scored AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             list_aggregate(list_transform(list_zip(a.emb, b.emb),
                            p -> p[1] * p[2]), 'sum')
             / (SQRT(list_aggregate(list_transform(a.emb, x -> x * x), 'sum'))
                * SQRT(list_aggregate(list_transform(b.emb, x -> x * x), 'sum'))) AS score
      FROM v a JOIN v b ON a.label = b.label AND a.vec_id <> b.vec_id
    ), ranked AS (
      SELECT src, dst, score,
             ROW_NUMBER() OVER (PARTITION BY src ORDER BY score DESC, dst) AS rank
      FROM scored
    )
    SELECT src, dst, ROUND(score, 6) AS score, rank
    FROM ranked WHERE rank <= 3
    """,
    tags=("llm", "similarity", "knn-graph"),
)
def sim_knn_graph_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked k-NN GRAPH construction: every vector's top-3 cosine
    neighbors within its coarse cluster (label = the IVF cell) — the
    corpus×corpus primitive underneath SemDeDup, graph-based
    clustering, and kNN-classifier export, as opposed to the
    query→corpus sim_topk_* family.

    Scale shape: blocking turns the O(n²) all-pairs join into
    Σ|cell|² — one equi-join keyed on the cell id (same bound as
    dedup_semdedup's pair join), then WindowGroupLimit keeps per-src
    state at k rows before the exchange. At 100 TB the cell id is the
    at-rest partition key (sources/indexes.py layout), making the
    self-join co-located and shuffle-free on the corpus side;
    neighbors in adjacent cells come from multiprobe (union more
    cell pairs) exactly as in sim_topk_lsh_multiprobe."""
    em = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("emb"),
    )
    # norms are a per-VECTOR property — compute them once below the
    # pair join (bit-identical doubles to a per-pair evaluation; the
    # HOF norm fold is interpreted, so evaluating it per Σ|cell|² pair
    # instead of per vector tripled the per-pair cost)
    nrm = F.sqrt(
        F.aggregate(F.transform("emb", lambda x: x * x), F.lit(0.0), lambda s, x: s + x)
    )
    em = em.select("vec_id", "label", "emb", nrm.alias("nrm"))
    a = em.select(
        F.col("vec_id").alias("src"), F.col("label").alias("la"),
        F.col("emb").alias("ea"), F.col("nrm").alias("na"),
    )
    b = em.select(
        F.col("vec_id").alias("dst"), F.col("label").alias("lb"),
        F.col("emb").alias("eb"), F.col("nrm").alias("nb"),
    )
    pairs = a.join(b, (F.col("la") == F.col("lb")) & (F.col("src") != F.col("dst")))
    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
    )
    scored = pairs.select("src", "dst", (dot / (F.col("na") * F.col("nb"))).alias("score"))
    w = Window.partitionBy("src").orderBy(F.col("score").desc(), F.col("dst"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("src", "dst", F.round("score", 6).alias("score"), F.col("rank").cast("long"))
    )


@query(
    "sample_hard_negatives",
    oracle=f"""
    WITH a AS (
      SELECT vec_id AS anchor_id, label AS anchor_label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings WHERE vec_id < 20
    ), c AS (
      SELECT vec_id AS corpus_id, label AS neg_label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings WHERE vec_id >= 20
    ), scored AS (
      SELECT a.anchor_id, a.anchor_label, c.corpus_id, c.neg_label,
             ROUND(
      list_aggregate(list_transform(list_zip(a.emb, c.emb), p -> p[1] * p[2]), 'sum')
      / (SQRT(list_aggregate(list_transform(a.emb, x -> x * x), 'sum'))
         * SQRT(list_aggregate(list_transform(c.emb, x -> x * x), 'sum'))), 6) AS cos
      FROM a JOIN c ON a.anchor_label <> c.neg_label
    ), ranked AS (
      SELECT anchor_id, anchor_label, corpus_id, neg_label, cos,
             ROW_NUMBER() OVER (PARTITION BY anchor_id
                                ORDER BY cos DESC, corpus_id) AS rank
      FROM scored
    )
    SELECT anchor_id, anchor_label, corpus_id, neg_label, cos, rank
    FROM ranked WHERE rank <= 3
    """,
    tags=("llm", "similarity", "contrastive", "mining"),
)
def sample_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor
    vector, the top-3 most-similar vectors carrying a DIFFERENT label
    — the near-miss examples that make embedding models learn
    boundaries (random negatives are trivially separable; hard ones
    drive the loss). The label inequality is the join predicate, so
    positives never enter the candidate relation at all.

    Scale shape: anchors broadcast over the corpus scan (mining runs
    anchor-batch × corpus, the same probe shape as the ANN family —
    at fleet scale the corpus side is the LSH/IVF-pruned candidate
    stream, sim_knn_graph_blocked's blocking applied per batch);
    per-anchor top-3 plans as WindowGroupLimit. The house cosine fold
    keeps the oracle bit-exact."""
    em = load_table(spark, sf_dir, "embeddings")
    a = em.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("embedding").alias("aemb"),
    )
    c = em.where(F.col("vec_id") >= 20).select(
        F.col("vec_id").alias("corpus_id"),
        F.col("label").alias("neg_label"),
        F.col("embedding").alias("cemb"),
    )
    from serverless_datalake_spark.operators.similarity import cosine

    scored = c.join(
        F.broadcast(a), F.col("anchor_label") != F.col("neg_label")
    ).select(
        "anchor_id",
        "anchor_label",
        "corpus_id",
        "neg_label",
        F.round(cosine(F.col("aemb"), F.col("cemb")), 6).alias("cos"),
    )
    w = Window.partitionBy("anchor_id").orderBy(F.col("cos").desc(), "corpus_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select(
            "anchor_id", "anchor_label", "corpus_id", "neg_label", "cos",
            F.col("rank").cast("long").alias("rank"),
        )
    )


_CORESET_K = 6

_COS_PAIR = """
      list_aggregate(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]), 'sum')
      / (SQRT(list_aggregate(list_transform({a}, x -> x * x), 'sum'))
         * SQRT(list_aggregate(list_transform({b}, x -> x * x), 'sum')))
"""


def _coreset_oracle() -> str:
    parts = [
        """
    WITH pts AS (
      SELECT vec_id AS cid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings WHERE vec_id >= 10
    ), s1 AS (
      SELECT cid, CAST(1 AS BIGINT) AS pick_round,
             CAST(0.0 AS DOUBLE) AS dist_to_set
      FROM pts ORDER BY cid LIMIT 1
    ), sel1 AS (SELECT * FROM s1)"""
    ]
    for r in range(2, _CORESET_K + 1):
        prev = r - 1
        cos = _COS_PAIR.format(a="p.emb", b="sp.emb")
        parts.append(
            f""", s{r} AS (
      SELECT p.cid, CAST({r} AS BIGINT) AS pick_round,
             MIN(ROUND(1.0 - ({cos}), 6)) AS dist_to_set
      FROM pts p
      JOIN pts sp ON sp.cid IN (SELECT cid FROM sel{prev})
      WHERE p.cid NOT IN (SELECT cid FROM sel{prev})
      GROUP BY p.cid
      ORDER BY dist_to_set DESC, p.cid LIMIT 1
    ), sel{r} AS (SELECT * FROM sel{prev} UNION ALL SELECT * FROM s{r})"""
        )
    parts.append(f"""
    SELECT cid AS vec_id, pick_round, dist_to_set FROM sel{_CORESET_K}
    """)
    return "".join(parts)


@query("sample_coreset_kcenter", oracle=_coreset_oracle(),
       tags=("llm", "sampling", "coreset"))
def sample_coreset_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset selection (K=6) over the corpus
    embeddings: iteratively pick the point FARTHEST (cosine distance)
    from the already-selected set — the 2-approximation to the
    k-center objective and the standard diversity-maximizing
    data-pruning / active-labeling selector (the derandomized
    k-means++ seeding the IVF family trains with, exposed as a
    first-class sampling operator).

    Scale shape: each of the K-1 rounds is one broadcast join of the
    (tiny, growing) selected set against the corpus scan plus a
    per-point MIN and a 1-row TakeOrdered pick — K corpus passes
    total, the known cost of exact greedy k-center (production
    coresets run it per-cluster after a cheap partition, bounding
    each pass). Each round's single-row pick is materialized
    driver-side (K rows total — the k-sized-metadata collect policy
    the IVF training path already uses): a lazily chained loop would
    re-derive every earlier round on all three join sides of each
    later one, an O(3^K) plan blow-up that measured 22 s at sf0.1 vs
    ~3 s materialized. Distances are the house cosine fold rounded at
    6; every pick has a total (dist DESC, id) tie-break."""
    from serverless_datalake_spark.operators.similarity import cosine
    from serverless_datalake_spark.queries.graph import _retire_and_cache

    em = load_table(spark, sf_dir, "embeddings")
    pts = em.where(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("emb")
    )
    (pts,) = _retire_and_cache(("coreset", sf_dir), [pts])
    pts.count()

    first = pts.orderBy("cid").select("cid").limit(1).collect()
    picked: list[tuple[int, int, float]] = [
        (int(r["cid"]), 1, 0.0) for r in first[:1]
    ]
    for r in range(2, _CORESET_K + 1):
        if not picked:
            break
        sel_ids = [p[0] for p in picked]
        sel_emb = F.broadcast(
            pts.where(F.col("cid").isin(sel_ids)).select(
                F.col("cid").alias("scid"), F.col("emb").alias("semb")
            )
        )
        rows = (
            pts.where(~F.col("cid").isin(sel_ids))
            .crossJoin(sel_emb)
            .select(
                "cid",
                F.round(F.lit(1.0) - cosine(F.col("emb"), F.col("semb")), 6).alias("d"),
            )
            .groupBy("cid")
            .agg(F.min("d").alias("dist_to_set"))
            .orderBy(F.col("dist_to_set").desc(), "cid")
            .limit(1)
            .collect()
        )
        if not rows:  # corpus smaller than K: stop like the former
            break     # empty Window pick did, keeping rounds so far
        dist = rows[0]["dist_to_set"]
        # a NULL aggregate (all-NULL cosines, e.g. zero-norm vectors)
        # propagates as a NULL row, as the former Window pick did
        picked.append(
            (int(rows[0]["cid"]), r, None if dist is None else float(dist))
        )
    out = spark.createDataFrame(
        picked, schema="vec_id long, pick_round long, dist_to_set double"
    )
    return out


def _recall_eval_oracle() -> str:
    """Compose ALREADY-REGISTERED oracles (ground truth = brute force;
    candidates = single-table LSH and its multiprobe variant) as CTE
    subqueries and score recall@5 per system — evaluation-as-a-query."""
    from serverless_datalake_spark.queries import REGISTRY

    bf = REGISTRY["sim_topk_bruteforce"].oracle
    lsh = REGISTRY["sim_topk_lsh"].oracle
    mp = REGISTRY["sim_topk_lsh_multiprobe"].oracle
    return f"""
    WITH bf AS ({bf}), lsh AS ({lsh}), mp AS ({mp}),
    cands AS (
      SELECT 'lsh_1table' AS system, query_id, corpus_id FROM lsh
      UNION ALL
      SELECT 'lsh_multiprobe', query_id, corpus_id FROM mp
    ), hits AS (
      SELECT s.system, bf.query_id,
             CAST(COUNT(c.corpus_id) AS BIGINT) AS n_hits
      FROM bf CROSS JOIN (SELECT DISTINCT system FROM cands) s
      LEFT JOIN cands c
        ON c.system = s.system AND c.query_id = bf.query_id
       AND c.corpus_id = bf.corpus_id
      GROUP BY 1, 2
    )
    SELECT system,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(n_hits) AS BIGINT) AS total_hits,
           ROUND(CAST(SUM(n_hits) AS DOUBLE)
                 / (5.0 * CAST(COUNT(*) AS DOUBLE)), 4) AS mean_recall_at_5,
           ROUND(CAST(MIN(n_hits) AS DOUBLE) / 5.0, 4) AS worst_recall_at_5
    FROM hits GROUP BY 1
    """


@query("sim_recall_eval", oracle=_recall_eval_oracle(),
       tags=("llm", "similarity", "evaluation"))
def sim_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval EVALUATION as a query: recall@5 of the LSH ANN
    probes (single-table and multiprobe) against the exact
    brute-force ground truth — the IR evaluation every index
    deployment gates on, put in the data plane where a quality
    dashboard reads it (the validate_expectations move applied to
    retrieval). The single-table row EXPOSES why multiprobe exists:
    one 8-plane bucket per query recalls almost nothing at fixture
    dimensionality; probing the 8 Hamming-1 neighbors recovers it —
    the table reports both honestly.

    Exactness: hit counts are integers; each recall ratio is a single
    division of exact values (no per-query float averaging).

    Scale shape: every leg is the registry query's own plan (≤5 rows
    per query each); scoring joins tiny shortlists. Production
    measures recall exactly this way — ground truth brute-forced on a
    SAMPLE, so the exact leg's cost is bounded by the sample, not the
    corpus."""
    from serverless_datalake_spark.queries import REGISTRY

    # pinned: the exact leg feeds one join per scored system, and
    # unpinned each consumer re-ran the full brute-force pass (the
    # round-8 branch-point lesson — see eval_ndcg_at_5)
    bf = (
        REGISTRY["sim_topk_bruteforce"]
        .fn(spark, sf_dir)
        .select(F.col("query_id").alias("bq"), F.col("corpus_id").alias("bc"))
        .transform(_pin)
    )
    legs = {
        "lsh_1table": "sim_topk_lsh",
        "lsh_multiprobe": "sim_topk_lsh_multiprobe",
    }
    outs = []
    for system, qname in sorted(legs.items()):
        cand = REGISTRY[qname].fn(spark, sf_dir).select(
            F.col("query_id").alias("lq"), F.col("corpus_id").alias("lc")
        )
        hits = (
            bf.join(
                cand, (F.col("lq") == F.col("bq")) & (F.col("lc") == F.col("bc")), "left"
            )
            .groupBy("bq")
            .agg(F.count("lc").cast("long").alias("n_hits"))
        )
        outs.append(
            hits.agg(
                F.lit(system).alias("system"),
                F.count(F.lit(1)).alias("n_queries"),
                F.sum("n_hits").cast("long").alias("total_hits"),
                F.round(
                    F.sum("n_hits").cast("double")
                    / (F.lit(5.0) * F.count(F.lit(1)).cast("double")),
                    4,
                ).alias("mean_recall_at_5"),
                F.round(F.min("n_hits").cast("double") / F.lit(5.0), 4).alias(
                    "worst_recall_at_5"
                ),
            ).select(
                "system", "n_queries", "total_hits", "mean_recall_at_5",
                "worst_recall_at_5",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def _index_health_oracle() -> str:
    bucket = _bucket_sql("emb")
    return f"""
    WITH c AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings WHERE vec_id >= 10
    ), assigned AS (
      SELECT vec_id, {bucket} AS bucket FROM c
    ), sizes AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n FROM assigned GROUP BY 1
    ), ranked AS (
      SELECT n, ROW_NUMBER() OVER (ORDER BY n, bucket) AS rn,
             COUNT(*) OVER () AS nb
      FROM sizes
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM sizes) AS n_occupied_buckets,
           CAST(256 - (SELECT COUNT(*) FROM sizes) AS BIGINT) AS n_empty_buckets,
           (SELECT CAST(MAX(n) AS BIGINT) FROM sizes) AS max_bucket,
           (SELECT CAST(MIN(n) AS BIGINT) FROM sizes) AS min_occupied,
           (SELECT CAST(MAX(CASE WHEN rn = CAST(CEIL(nb * 0.5) AS BIGINT) THEN n END)
                   AS BIGINT) FROM ranked) AS p50_bucket,
           (SELECT CAST(MAX(CASE WHEN rn = CAST(CEIL(nb * 0.9) AS BIGINT) THEN n END)
                   AS BIGINT) FROM ranked) AS p90_bucket
    """


@query("sim_index_health", oracle=_index_health_oracle(),
       tags=("llm", "similarity", "index", "ops"))
def sim_index_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index HEALTH report: the bucket-occupancy distribution of
    the 8-plane LSH index over the corpus (occupied/empty buckets,
    max/min/p50/p90 bucket sizes) — the operational numbers an index
    team watches: skewed buckets mean probe latency variance and
    recall loss; many empties mean wasted planes. This is the
    monitoring face of sim_topk_lsh_indexed's at-rest layout
    (exact order-statistic percentiles over the 256-row size
    relation, the registry's rank-window discipline).

    Scale shape: one map-only bucket assignment + a bucket-grain
    aggregate. The size relation is 2^planes rows for THIS index, but
    bucket count is a config knob that grows with the corpus, so the
    percentile ranking runs through `with_global_rank`
    (operators/ranking.py) — range-partitioned two-pass rank, no
    single-task sort — and the bucket count rides out of the rank's
    own pass-1 stats as a literal (no extra scan, no COUNT window)."""
    from serverless_datalake_spark.operators.ranking import with_global_rank
    from serverless_datalake_spark.operators.similarity import lsh_bucket

    em = load_table(spark, sf_dir, "embeddings")
    c = em.where(F.col("vec_id") >= 10)
    # pinned: with_global_rank's range sampling would otherwise re-run
    # the corpus-wide lsh_bucket fold + aggregate a second time; the
    # pinned relation is <= 2^planes rows
    sizes = c.select(lsh_bucket(F.col("embedding"), 8, 64).alias("bucket")).groupBy(
        "bucket"
    ).agg(F.count(F.lit(1)).alias("n")).transform(_pin)
    # bucket count rides out of the rank's pass-1 stats — no second
    # corpus-wide bucket-assignment scan
    ranked = with_global_rank(
        sizes, [F.col("n"), F.col("bucket")], out="rn", n_out="nb"
    ).select("n", "rn", "nb")
    pct = ranked.agg(
        F.max(
            F.when(F.col("rn") == F.ceil(F.col("nb") * 0.5).cast("long"), F.col("n"))
        )
        .cast("long")
        .alias("p50_bucket"),
        F.max(
            F.when(F.col("rn") == F.ceil(F.col("nb") * 0.9).cast("long"), F.col("n"))
        )
        .cast("long")
        .alias("p90_bucket"),
    )
    summary = sizes.agg(
        F.count(F.lit(1)).alias("n_occupied_buckets"),
        (F.lit(256) - F.count(F.lit(1))).cast("long").alias("n_empty_buckets"),
        F.max("n").cast("long").alias("max_bucket"),
        F.min("n").cast("long").alias("min_occupied"),
    )
    return summary.crossJoin(F.broadcast(pct)).select(
        "n_occupied_buckets",
        "n_empty_buckets",
        "max_bucket",
        "min_occupied",
        "p50_bucket",
        "p90_bucket",
    )


# ---------------------------------------------------------------------------
# Binary (sign-bit) embeddings with Hamming ranking

def _hamming_pack_sql(emb: str, word: int) -> str:
    """DuckDB: pack dims [word*32, word*32+32) of `emb` into a BIGINT
    by sign bit (shifts ≤ 31 — DuckDB's checked `<<` overflows at 63,
    so 64 dims ship as two 32-bit-occupied words)."""
    lo = word * 32
    return (
        f"list_reduce(list_transform(range(0, 32), d -> "
        f"CASE WHEN list_extract({emb}, d + {lo + 1}) > 0 "
        f"THEN (CAST(1 AS BIGINT) << CAST(d AS INT)) ELSE CAST(0 AS BIGINT) END), "
        f"(a, b) -> a | b)"
    )


def _hamming_oracle() -> str:
    packs = """
      SELECT vec_id, {w0} AS w0, {w1} AS w1 FROM embeddings
    """.format(w0=_hamming_pack_sql("embedding", 0), w1=_hamming_pack_sql("embedding", 1))
    return f"""
    WITH packed AS ({packs}),
    q AS (SELECT vec_id AS query_id, w0, w1 FROM packed WHERE vec_id < 10),
    c AS (SELECT vec_id AS corpus_id, w0 AS c0, w1 AS c1 FROM packed WHERE vec_id >= 10),
    scored AS (
      SELECT q.query_id, c.corpus_id,
             CAST(bit_count(xor(q.w0, c.c0)) + bit_count(xor(q.w1, c.c1)) AS BIGINT)
               AS hamming
      FROM q CROSS JOIN c
    ), ranked AS (
      SELECT query_id, corpus_id, hamming,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY hamming, corpus_id) AS BIGINT) AS rank
      FROM scored
    )
    SELECT query_id, corpus_id, hamming, rank FROM ranked WHERE rank <= 5
    """


@query(
    "sim_topk_hamming",
    oracle=_hamming_oracle(),
    tags=("llm", "similarity", "ann", "binary", "hamming"),
)
def sim_topk_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized ANN: each embedding collapses to its 64 SIGN
    BITS packed into two 64-bit words (dims 0–31 / 32–63; 32 bits per
    word keeps every shift ≤ 31, which both engines' checked shifts
    accept), and similarity becomes Hamming distance = popcount of
    XOR — the 1-bit-per-dim scheme (FAISS binary indexes / "binary
    passage retrieval") that cuts a float32 corpus 32× and turns
    distance into two CPU instructions.

    Exactness: packing, XOR, and popcount are integer-exact in both
    engines; ranking ties break on corpus_id — no float anywhere
    after the sign test (fixture embeddings have no exact-0.0
    component, so `> 0` is unambiguous).

    Scale shape: the packed corpus is 16 bytes/vector — a 1B-vector
    corpus is 16 GB, scannable per query batch at memory bandwidth;
    the rank window is per-query top-k (WindowGroupLimit partial
    top-k before the final shuffle). The production refinement is the
    two-stage pattern shipped as sim_topk_ivfpq_rerank: Hamming
    shortlist → exact re-rank by id."""
    em = load_table(spark, sf_dir, "embeddings")

    def pack(word: int) -> Column:
        lo = word * 32
        return F.expr(
            f"aggregate(sequence(0, 31), CAST(0 AS BIGINT), (acc, d) -> "
            f"acc | (CASE WHEN element_at(embedding, CAST(d + {lo + 1} AS INT)) > 0 "
            f"THEN shiftleft(CAST(1 AS BIGINT), CAST(d AS INT)) ELSE CAST(0 AS BIGINT) END))"
        )

    packed = em.select("vec_id", pack(0).alias("w0"), pack(1).alias("w1"))
    q = packed.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("w0").alias("q0"), F.col("w1").alias("q1")
    )
    c = packed.where(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("corpus_id"), F.col("w0").alias("c0"), F.col("w1").alias("c1")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "corpus_id",
        (
            F.bit_count(F.col("q0").bitwiseXOR(F.col("c0")))
            + F.bit_count(F.col("q1").bitwiseXOR(F.col("c1")))
        )
        .cast("long")
        .alias("hamming"),
    )
    w = Window.partitionBy("query_id").orderBy("hamming", "corpus_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 5)
        .select("query_id", "corpus_id", "hamming", "rank")
    )


@query(
    "sim_topk_ivf_nprobe4",
    oracle=_ivf_oracle(nprobe=4),
    tags=("llm", "similarity", "ann", "recall-knob"),
)
def sim_topk_ivf_nprobe4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF recall/cost KNOB made explicit: identical index to
    sim_topk_ivf, but each query probes its 4 nearest cells instead
    of 2 — double the candidate scan for measurably higher recall@5
    (RECALL.md tracks both rows side by side, which is exactly the
    sweep an index operator runs before picking production nprobe).
    The plan shape is unchanged: probe cells route via the broadcast
    centroid table; cost scales linearly in nprobe, never in corpus
    size."""
    queries, corpus = _split(spark, sf_dir)
    em = load_table(spark, sf_dir, "embeddings")
    corpus_lab = em.where(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("corpus_id"), "embedding", "label"
    )
    cents = _centroid_rows(sf_dir, corpus_lab)
    return similarity.topk_ivf(queries, corpus_lab, k=5, nprobe=4, centroid_rows=cents)


@query(
    "embedding_quality_screen",
    oracle="""
    WITH v AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ), norms AS (
      SELECT vec_id,
             CAST(ROUND(SQRT(list_aggregate(list_transform(emb, x -> x * x),
                                            'sum')) * 1000000000.0, 0)
                  AS BIGINT) AS norm_nu
      FROM v
    ), stats AS (
      SELECT vec_id, norm_nu,
             CAST(SUM(norm_nu) OVER () AS DOUBLE)
               / CAST(COUNT(*) OVER () AS DOUBLE) AS mean_nu,
             CAST(COUNT(*) OVER () AS DOUBLE) AS n,
             CAST(SUM(CAST(norm_nu AS HUGEINT) * CAST(norm_nu AS HUGEINT))
                  OVER () AS DOUBLE) AS ss
      FROM norms
    ), scored AS (
      SELECT vec_id, norm_nu,
             (CAST(norm_nu AS DOUBLE) - mean_nu)
               / SQRT((ss - mean_nu * mean_nu * n) / (n - 1.0)) AS z
      FROM stats
    ), ranked AS (
      SELECT vec_id, norm_nu, z,
             ROW_NUMBER() OVER (ORDER BY ABS(z) DESC, vec_id) AS rk
      FROM scored
    )
    SELECT vec_id,
           ROUND(CAST(norm_nu AS DOUBLE) / 1000000000.0, 6) AS l2_norm,
           ROUND(z, 4) AS norm_z,
           CAST(rk AS BIGINT) AS outlier_rank
    FROM ranked WHERE rk <= 10
    """,
    tags=("llm", "similarity", "data-guard"),
)
def embedding_quality_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding QA before anything is indexed: the top-10 L2-norm
    outliers by z-score — the screen that catches zero vectors (dead
    encoder outputs), norm blowups (overflow/truncation bugs), and
    mis-scaled batches before they poison an ANN index or a cosine
    threshold. Norms are exact integer NANO-UNITS so the corpus mean
    and variance are order-independent sums; z uses the identical
    closed form in both engines.

    Scale shape: one scan computes per-vector norms map-side (payload
    never shuffles); the moment aggregation reduces to three scalars;
    the top-10 is a TakeOrdered over (|z|, vec_id) — no full sort, no
    join. Screens 100 TB of embeddings at scan speed."""
    em = load_table(spark, sf_dir, "embeddings")
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm2 = F.aggregate(
        F.transform(emb_d, lambda x: x * x),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norms = em.select(
        "vec_id",
        F.round(F.sqrt(norm2) * 1000000000.0, 0).cast("long").alias("norm_nu"),
    )
    # corpus moments as a broadcast 1-row aggregate (exact decimal
    # sums), not an unpartitioned window at vector grain
    d38 = "decimal(38,0)"
    mom = norms.agg(
        (
            F.sum(F.col("norm_nu").cast(d38)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_nu"),
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum((F.col("norm_nu") * F.col("norm_nu")).cast(d38))
        .cast("double")
        .alias("ss"),
    )
    stats = norms.crossJoin(F.broadcast(mom)).select(
        "vec_id", "norm_nu", "mean_nu", "n", "ss"
    )
    scored = stats.select(
        "vec_id",
        "norm_nu",
        (
            (F.col("norm_nu").cast("double") - F.col("mean_nu"))
            / F.sqrt(
                (F.col("ss") - F.col("mean_nu") * F.col("mean_nu") * F.col("n"))
                / (F.col("n") - F.lit(1.0))
            )
        ).alias("z"),
    )
    ranked = scored.select(
        "vec_id",
        "norm_nu",
        "z",
        F.row_number()
        .over(Window.orderBy(F.abs(F.col("z")).desc(), "vec_id"))
        .alias("rk"),
    )
    return ranked.where(F.col("rk") <= 10).select(
        "vec_id",
        F.round(F.col("norm_nu").cast("double") / 1000000000.0, 6).alias("l2_norm"),
        F.round("z", 4).alias("norm_z"),
        F.col("rk").cast("long").alias("outlier_rank"),
    )


@query(
    "sim_topk_ivfpq_rerank_np4",
    oracle=_ivfpq_rerank_oracle(nprobe=4, shortlist=60),
    tags=("llm", "similarity", "ann", "ivf", "pq", "rerank", "recall-knob"),
)
def sim_topk_ivfpq_rerank_np4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rerank pipeline at the wide operating point: PQ codes
    nominate a 60-deep shortlist from FOUR probed cells, exact cosine
    re-orders it. The two recall levers, isolated in RECALL.md:
    nprobe bounds which true neighbors are REACHABLE (cell recall —
    sim_topk_ivf_nprobe4's 0.68 is this query's ceiling), shortlist
    depth bounds how many reachable ones PQ nomination SURFACES for
    exact scoring (20→60 moved recall@5 0.36→0.54 at sf0.01 against
    that 0.68 ceiling; the residual gap is PQ ordering error inside
    the cells). Exact-stage cost stays ~60 point reads per query —
    the knob sweep an index operator runs before fixing production
    (nprobe, shortlist)."""
    queries, corpus = _split(spark, sf_dir)
    em = load_table(spark, sf_dir, "embeddings")
    corpus_lab = em.where(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("corpus_id"), "embedding", "label"
    )
    rows = _codebook_rows(sf_dir, corpus)
    cents = _centroid_rows(sf_dir, corpus_lab)
    sl = similarity.topk_ivfpq(
        queries, corpus_lab, k=60, nprobe=4,
        codebook_rows=rows, centroid_rows=cents,
    ).select("query_id", "corpus_id")
    from pyspark.sql import Window

    from serverless_datalake_spark.operators.similarity import _as_double, cosine

    q = queries.select("query_id", _as_double(F.col("embedding")).alias("__qv"))
    c = corpus.select("corpus_id", _as_double(F.col("embedding")).alias("__cv"))
    rescored = (
        c.join(F.broadcast(sl), "corpus_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "corpus_id",
            cosine(F.col("__qv"), F.col("__cv")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("corpus_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 5)
        .select("query_id", "corpus_id", F.round("score", 6).alias("score"), "rank")
    )


@query(
    "sim_topk_ivfpq_rerank_np8",
    # shortlist is CORPUS-PROPORTIONAL (30% of corpus, floor 150 —
    # integer-exact `(3n+9)//10` on both engines): round 9's sf0.1
    # recall sweep measured the fixed-150 point decaying 0.94 → 0.78
    # at a 4x corpus because 150 fell from 30% to 7.5% nomination
    # depth; holding the FRACTION holds recall (0.94 at sf0.1,
    # RECALL.md drift table). See the docstring for the 100 TB form.
    oracle=_ivfpq_rerank_oracle(
        nprobe=8,
        shortlist="GREATEST(150, (3 * (SELECT COUNT(*) FROM cl) + 9) // 10)",
    ),
    tags=("llm", "similarity", "ann", "ivf", "pq", "rerank", "recall-knob"),
)
def sim_topk_ivfpq_rerank_np8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rerank pipeline at the HIGH-RECALL operating point
    (nprobe=8 of 10 cells, 150-deep shortlist) — the leg a retrieval
    user runs when recall, not scan fraction, is the SLO.

    Why this point exists: the fixture embeddings are near-uniform on
    the unit sphere (RECALL.md's k-sweep shows routing recall tracks
    probe fraction almost linearly, and MORE centroids at equal probe
    fraction do not help — measured k=16/24/32 all land BELOW k=10 at
    the same fraction). For such geometry cell recall ~ probe
    fraction is an information-theoretic property of the data, not an
    index defect, so the honest high-recall config probes widely
    (8/10 cells ~ 80% of the corpus) and lets the deep shortlist +
    exact re-rank recover ordering. On genuinely clustered production
    embeddings the SAME pipeline gets this recall at far smaller
    probe fractions — the knobs, not the plan, change.

    Operating-point drift (round-9 finding): shortlist depth must be
    held as a FRACTION of the corpus, not a constant — the fixed 150
    was 30% nomination depth at sf0.01 but 7.5% at sf0.1, and recall
    decayed 0.94 → 0.78; re-measured at 30% it returns to 0.94
    (RECALL.md drift table). This leg therefore nominates
    max(150, ceil(0.3·n)) candidates, integer-exact on both engines.
    At 100 TB a 30%-of-corpus exact re-rank is not the shipping form —
    there you hold CELL population constant instead (n_centroids ∝
    √n, nprobe ∝ √growth) so shortlist/cell stays fixed; on this
    fixture's near-uniform sphere more centroids measurably don't
    help (see above), so the honest scale lever is the fraction.

    Scale shape is unchanged from sim_topk_ivfpq_rerank: ADC over PQ
    codes inside probed cells (map-only, partition-pruned at rest),
    then an exact re-rank that point-reads raw vectors for the
    shortlist ids per query via a broadcast join — no corpus-wide
    shuffle at any stage."""
    queries, corpus = _split(spark, sf_dir)
    em = load_table(spark, sf_dir, "embeddings")
    corpus_lab = em.where(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("corpus_id"), "embedding", "label"
    )
    rows = _codebook_rows(sf_dir, corpus)
    cents = _centroid_rows(sf_dir, corpus_lab)
    n = _corpus_n(sf_dir, corpus_lab)
    sl = similarity.topk_ivfpq(
        queries, corpus_lab, k=max(150, (3 * n + 9) // 10), nprobe=8,
        codebook_rows=rows, centroid_rows=cents,
    ).select("query_id", "corpus_id")
    from serverless_datalake_spark.operators.similarity import _as_double, cosine

    q = queries.select("query_id", _as_double(F.col("embedding")).alias("__qv"))
    c = corpus.select("corpus_id", _as_double(F.col("embedding")).alias("__cv"))
    rescored = (
        c.join(F.broadcast(sl), "corpus_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "corpus_id",
            cosine(F.col("__qv"), F.col("__cv")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("corpus_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 5)
        .select("query_id", "corpus_id", F.round("score", 6).alias("score"), "rank")
    )
