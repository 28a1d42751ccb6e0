"""Deduplication queries over `documents` / `embeddings` (north star).
Implementations in operators/dedup.py and operators/similarity.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from serverless_datalake_spark.operators import dedup, pin as _pin, similarity
from serverless_datalake_spark.operators.dedup import _MINHASH_P, minhash_params
from serverless_datalake_spark.queries import query
from serverless_datalake_spark.tables import load_table

# ---------------------------------------------------------------------------
# Oracle SQL generators. The MinHash/SimHash hash family is md5-based
# (operators/dedup.py module header), so DuckDB recomputes the EXACT
# signatures/buckets — the oracle runs the same deterministic
# algorithm, not a recall approximation. Shared pieces:


def _hex8_int(h8: str) -> str:
    """BIGINT from 8 lowercase hex chars (DuckDB twin of md5_key32;
    explicit BIGINT casts keep every product out of INT32 range)."""
    terms = [
        f"(strpos('0123456789abcdef', substr({h8}, {i + 1}, 1)) - 1) * CAST({16 ** (7 - i)} AS BIGINT)"
        for i in range(8)
    ]
    return "(" + " + ".join(terms) + ")"


def _minhash_ctes(bands: int = 8, num_hashes: int = 64) -> str:
    """CTE chain: tokens → 32-bit keys → 64 MIN-hash columns → band
    membership rows with the same '_'-joined band value Spark emits."""
    r = num_hashes // bands
    params = minhash_params(num_hashes)
    sig_cols = ", ".join(
        f"MIN(({a} * x + {b}) % {_MINHASH_P}) AS s{j}" for j, (a, b) in enumerate(params)
    )
    bands_sql = "\n      UNION ALL ".join(
        "SELECT doc_id, {b} AS band_id, {val} AS band_val FROM sigs".format(
            b=b,
            val=" || '_' || ".join(
                f"CAST(s{b * r + i} AS VARCHAR)" for i in range(r)
            ),
        )
        for b in range(bands)
    )
    return f"""
    toks AS (
      SELECT doc_id, unnest(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS t
      FROM documents
    ), xs AS (
      SELECT doc_id, {_hex8_int("substr(md5(t), 1, 8)")} AS x FROM toks
    ), sigs AS (
      SELECT doc_id, {sig_cols} FROM xs GROUP BY doc_id
    ), membership AS (
      {bands_sql}
    )"""


def _minhash_lsh_oracle() -> str:
    return f"""
    WITH {_minhash_ctes()},
    buckets AS (
      SELECT band_id, band_val, MIN(doc_id) AS bucket_rep
      FROM membership GROUP BY band_id, band_val
    )
    SELECT m.doc_id,
           MIN(b.bucket_rep) AS cluster_rep,
           MIN(b.bucket_rep) = m.doc_id AS is_survivor
    FROM membership m JOIN buckets b USING (band_id, band_val)
    GROUP BY m.doc_id
    """


def _minhash_components_oracle() -> str:
    """Connected components of the LSH bucket graph via recursive
    transitive closure (each bucket is a clique, so pair edges and
    bucket-graph components coincide); label = min reachable doc_id —
    exactly the fixpoint Spark's label propagation converges to."""
    return f"""
    WITH RECURSIVE {_minhash_ctes()},
    edges AS (
      SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
      FROM membership a
      JOIN membership b ON a.band_id = b.band_id AND a.band_val = b.band_val
      WHERE a.doc_id <> b.doc_id
    ),
    reach(id, r) AS (
      SELECT doc_id, doc_id FROM sigs
      UNION
      SELECT reach.id, e.v FROM reach JOIN edges e ON e.u = reach.r
    )
    SELECT id AS doc_id,
           MIN(r) AS cluster_rep,
           MIN(r) = id AS is_survivor
    FROM reach GROUP BY id
    """


def _simhash_oracle(bits: int = 32, chunks: int = 4, max_hamming: int = 3) -> str:
    w = bits // chunks
    mask = (1 << w) - 1
    cnt_cols = ", ".join(f"SUM((x >> {b}) & 1) AS c{b}" for b in range(bits))
    packed = " + ".join(
        f"(CASE WHEN 2 * c{b} > n THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(bits)
    )
    chunk_sql = "\n      UNION ALL ".join(
        f"SELECT doc_id, simhash, {c} AS chunk_id, (simhash >> {c * w}) & {mask} AS chunk_val FROM packed"
        for c in range(chunks)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS t
      FROM documents
    ), xs AS (
      SELECT doc_id, {_hex8_int("substr(md5(t), 1, 8)")} AS x FROM toks
    ), cnts AS (
      SELECT doc_id, COUNT(*) AS n, {cnt_cols} FROM xs GROUP BY doc_id
    ), packed AS (
      SELECT doc_id, {packed} AS simhash FROM cnts
    ), membership AS (
      {chunk_sql}
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM membership a
    JOIN membership b ON a.chunk_id = b.chunk_id AND a.chunk_val = b.chunk_val
    WHERE a.doc_id < b.doc_id
      AND bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(lower(trim(text))) AS fp,
           MIN(doc_id) AS survivor_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
    tags=("llm", "dedup"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the normalized-content fingerprint
    with a deterministic survivor. One shuffle on the hash — the
    canonical 100 TB exact-dedup plan."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.exact_dedup_survivors(d, "doc_id", "text")


@query(
    "dedup_ngram_jaccard",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_distinct(list_filter(string_split(text, ' '), t -> t <> '')) AS toks
      FROM documents WHERE doc_id < 80
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                 / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))), 4) AS jaccard
    FROM toks a JOIN toks b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
          / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.4
    """,
    tags=("llm", "dedup", "jaccard"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force token-set Jaccard pairs (restricted to doc_id < 80
    — all-pairs is the correctness baseline, not the scale path; the
    scale path is dedup_minhash_lsh below, verified against this)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 80)
    return dedup.ngram_jaccard_pairs(d, "doc_id", "text", threshold=0.4)


@query(
    "dedup_minhash_lsh",
    # The md5-based hash family makes the signatures engine-portable:
    # the oracle recomputes the exact 64 minima, the exact band values,
    # and the same min-doc_id bucket clustering (no recall caveat).
    oracle=_minhash_lsh_oracle(),
    tags=("llm", "dedup", "minhash"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) + LSH(8 bands × 8) near-dup clustering: every doc
    assigned min-doc_id cluster representative over its LSH buckets,
    NO pair join — linear output even on self-similar corpora (the
    fixture has ~24% of all pairs at J≥0.8; enumerating them is
    inherently quadratic, so the headline operator clusters instead;
    pair enumeration with exact-Jaccard verify remains available as
    operators/dedup.minhash_near_dups and is property-tested against
    brute force). k=1 shingles: the fixture text is unordered word
    soup, so signatures estimate token-set Jaccard. 8×8 banding puts
    the S-curve midpoint at (1/8)^(1/8) ≈ 0.77 — clusters form at
    J ≳ 0.8, matching the pair queries' threshold."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.minhash_dedup_survivors(d, "doc_id", "text", bands=8, k=1)


@query(
    "dedup_minhash_components",
    # Exact-signature banding (see dedup_minhash_lsh) + recursive
    # transitive closure: DuckDB computes the same connected components
    # Spark's label propagation converges to. Also double-checked
    # against a python union-find in tests/test_operators.py.
    oracle=_minhash_components_oracle(),
    tags=("llm", "dedup", "minhash", "components"),
)
def dedup_minhash_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive-closure near-dup clustering: label propagation to
    fixpoint over the LSH bucket graph — the full connected-components
    answer the single-pass variant approximates (chain A~B~C collapses
    even when A,C never share a bucket)."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.minhash_dedup_components(d, "doc_id", "text", bands=8, k=1)


@query(
    "dedup_simhash",
    # md5-based token keys → DuckDB recomputes the exact 32-bit
    # signature, the same pigeonhole chunk buckets, and the same
    # Hamming verification (bit_count ∘ xor).
    oracle=_simhash_oracle(),
    tags=("llm", "dedup", "simhash"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(32-bit) near-dup pairs within Hamming distance 3,
    found via pigeonhole chunk banding (4 × 8-bit chunks)."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.simhash_near_dups(d, "doc_id", "text", max_hamming=3)


@query(
    "dedup_embedding_cosine",
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings WHERE vec_id % 5 = 0
    ), pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_aggregate(list_transform(list_zip(a.emb, b.emb),
                            p -> p[1] * p[2]), 'sum')
             / (SQRT(list_aggregate(list_transform(a.emb, x -> x * x), 'sum'))
                * SQRT(list_aggregate(list_transform(b.emb, x -> x * x), 'sum'))) AS cs
      FROM v a JOIN v b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, ROUND(cs, 6) AS cos_sim
    FROM pairs WHERE cs >= 0.3
    """,
    tags=("llm", "dedup", "embedding"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (sampled subset — brute force
    is the oracle-verifiable baseline; the scale path pre-buckets with
    operators/similarity.lsh_bucket)."""
    em = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") % 5 == 0)
    return similarity.embedding_near_dup_pairs(em, "vec_id", "embedding", threshold=0.3)


# Spherical-k-means centroids over the FULL embeddings table (the
# similarity module's cache covers only the vec_id>=10 corpus split),
# trained once per fixture dir — same train/search split rationale as
# llm_similarity._centroid_rows.
_SEMDEDUP_CENTS: dict[str, list] = {}


def _semdedup_oracle(threshold: float = 0.3) -> str:
    """SemDeDup in SQL: the shared spherical-k-means CTE chain
    (llm_similarity._ivf_cents_sql) over the full table, fold-cosine
    cluster assignment, then intra-cluster duplicate marking."""
    from serverless_datalake_spark.queries.llm_similarity import (
        _cos_sql,
        _ivf_cents_sql,
    )

    return f"""
    WITH cl AS (
      SELECT vec_id AS corpus_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb, label
      FROM embeddings
    ),
    {_ivf_cents_sql()},
    asg AS (
      SELECT corpus_id, emb, centroid_id FROM (
        SELECT cl.corpus_id, cl.emb, cents.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY cl.corpus_id
                                  ORDER BY {_cos_sql("cl.emb", "cents.centroid")} DESC, cents.centroid_id) AS rn
        FROM cl CROSS JOIN cents
      ) WHERE rn = 1
    ),
    un AS (
      SELECT corpus_id, centroid_id, list_transform(emb, x -> x / nv) AS u
      FROM (SELECT corpus_id, centroid_id, emb,
                   SQRT(list_aggregate(list_transform(emb, x -> x * x), 'sum')) AS nv
            FROM asg)
    ),
    dups AS (
      SELECT DISTINCT b.corpus_id AS dup_id
      FROM un a JOIN un b ON a.centroid_id = b.centroid_id AND a.corpus_id < b.corpus_id
      WHERE list_aggregate(list_transform(list_zip(a.u, b.u), p -> p[1] * p[2]), 'sum') >= {threshold}
    )
    SELECT un.corpus_id AS vec_id,
           CAST(un.centroid_id AS INTEGER) AS cluster_id,
           dups.dup_id IS NULL AS is_survivor
    FROM un LEFT JOIN dups ON un.corpus_id = dups.dup_id
    """


@query(
    "dedup_semdedup",
    # Centroid training, fold-cosine assignment (ties to the smaller
    # centroid id), and the intra-cluster cosine verify all reuse the
    # proven deterministic idioms from the ANN family — the oracle
    # recomputes the exact pipeline, not a recall approximation.
    oracle=_semdedup_oracle(),
    tags=("llm", "dedup", "embedding", "semdedup"),
)
def dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means-cluster the embedding
    space, then mark duplicates ONLY within each cluster — a vector is
    pruned when a lower-id vector in the same cluster has cosine ≥ τ;
    min-id survivors keep the semantics deterministic.

    This is the scale-correct semantic-dedup layout: clustering bounds
    the quadratic term to Σ|cluster|² instead of N² (pick k ∝ N so
    cluster sizes stay bounded), the cluster id is the natural at-rest
    partition key (intra-cluster pairing becomes a co-partitioned
    self-join with NO cross-cluster shuffle), and cell assignment is a
    map-only fold over broadcast-literal centroids
    (operators/similarity.ivf_assign_expr) — one corpus scan, one
    bounded pair join. The brute-force twin is dedup_embedding_cosine;
    the hyperplane-bucket twin is dedup_embedding_lsh (buckets by
    random planes; SemDeDup buckets by learned cluster structure,
    which concentrates true neighbors far better on clustered data).
    """
    from serverless_datalake_spark.operators.similarity import (
        _as_double,
        dot_arrow,
        ivf_assign_arrow,
        ivf_centroids_refined,
        norm,
    )

    em = load_table(spark, sf_dir, "embeddings")
    corpus_lab = em.select(F.col("vec_id").alias("corpus_id"), "embedding", "label")
    rows = _SEMDEDUP_CENTS.get(sf_dir)
    if rows is None:
        rows = ivf_centroids_refined(corpus_lab, init="kcenter").collect()
        _SEMDEDUP_CENTS[sf_dir] = rows

    # normalize ONCE per vector in the map stage so the quadratic pair
    # scoring is a single dot fold instead of dot + two norm folds per
    # pair (3× less per-pair arithmetic; cosine(a,b) == dot(â,b̂)).
    # ivf_assign_arrow silently sends zero-norm vectors to the first
    # centroid where the ANSI expression twin would raise — fixture
    # embeddings are validated non-degenerate (see its docstring)
    # pinned: asg feeds both self-join sides AND the final dup-flag
    # attach — unpinned, the Arrow centroid-assignment UDF pass over
    # the corpus (the expensive JVM↔Python crossing) executed three
    # times per run (guide §4: pay the Python boundary once)
    asg = _pin(
        em.select("vec_id", _as_double(F.col("embedding")).alias("__v"))
        .withColumn("cluster_id", ivf_assign_arrow(rows, "__v"))
        .withColumn("__nv", norm(F.col("__v")))
        .select(
            "vec_id",
            "cluster_id",
            F.transform(F.col("__v"), lambda x: x / F.col("__nv")).alias("__u"),
        )
    )
    a = asg.select(F.col("vec_id").alias("id_a"), F.col("__u").alias("__ua"), "cluster_id")
    b = asg.select(F.col("vec_id").alias("id_b"), F.col("__u").alias("__ub"), "cluster_id")
    # big-big self-join co-partitioned on the cluster key; the
    # shuffle-hash hint skips the per-partition sorts an SMJ would pay
    # on (id, 64-dim vector) rows — cluster populations are bounded by
    # construction, so the hash side always fits.
    # pair scoring rides the Arrow dot (bit-identical fold order, see
    # dot_arrow) — the quadratic Σ|cluster|² term is the hot path here
    dups = (
        a.join(b.hint("shuffle_hash"), "cluster_id")
        .where(F.col("id_a") < F.col("id_b"))
        .where(dot_arrow(F.col("__ua"), F.col("__ub")) >= 0.3)
        .select(F.col("id_b").alias("dup_id"))
        .distinct()
    )
    # the dup-flag attach joins on vec_id — co-partitioned hash join
    # (never broadcast: at scale the duplicate set is corpus-sized)
    return asg.join(dups.hint("shuffle_hash"), asg.vec_id == dups.dup_id, "left").select(
        "vec_id",
        F.col("cluster_id").cast("int").alias("cluster_id"),
        F.col("dup_id").isNull().alias("is_survivor"),
    )


@query(
    "dedup_embedding_lsh",
    # Deterministic hyperplane buckets (same md5 planes as the ANN
    # family) → the oracle recomputes the identical bucketing and the
    # identical cosine verification.
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ), b AS (
      SELECT vec_id, emb, ((CASE WHEN 0.0 - emb[1] + emb[2] - emb[3] - emb[4] + emb[5] + emb[6] + emb[7] - emb[8] + emb[9] + emb[10] + emb[11] + emb[12] - emb[13] + emb[14] - emb[15] + emb[16] + emb[17] + emb[18] + emb[19] - emb[20] - emb[21] + emb[22] - emb[23] + emb[24] - emb[25] - emb[26] - emb[27] - emb[28] - emb[29] - emb[30] - emb[31] - emb[32] - emb[33] - emb[34] + emb[35] - emb[36] - emb[37] - emb[38] + emb[39] - emb[40] - emb[41] - emb[42] + emb[43] - emb[44] - emb[45] + emb[46] - emb[47] - emb[48] - emb[49] - emb[50] - emb[51] + emb[52] + emb[53] + emb[54] + emb[55] + emb[56] + emb[57] - emb[58] + emb[59] + emb[60] + emb[61] + emb[62] - emb[63] - emb[64] > 0 THEN 1 ELSE 0 END) + (CASE WHEN 0.0 + emb[1] + emb[2] - emb[3] + emb[4] - emb[5] - emb[6] - emb[7] + emb[8] + emb[9] - emb[10] + emb[11] - emb[12] - emb[13] + emb[14] - emb[15] + emb[16] - emb[17] + emb[18] + emb[19] + emb[20] - emb[21] + emb[22] + emb[23] + emb[24] + emb[25] - emb[26] - emb[27] - emb[28] + emb[29] + emb[30] + emb[31] - emb[32] - emb[33] + emb[34] - emb[35] + emb[36] - emb[37] + emb[38] - emb[39] - emb[40] - emb[41] + emb[42] + emb[43] - emb[44] - emb[45] - emb[46] + emb[47] - emb[48] - emb[49] - emb[50] - emb[51] + emb[52] + emb[53] - emb[54] + emb[55] - emb[56] - emb[57] + emb[58] + emb[59] - emb[60] - emb[61] - emb[62] - emb[63] + emb[64] > 0 THEN 2 ELSE 0 END) + (CASE WHEN 0.0 + emb[1] + emb[2] - emb[3] + emb[4] + emb[5] + emb[6] + emb[7] + emb[8] - emb[9] - emb[10] + emb[11] - emb[12] - emb[13] + emb[14] - emb[15] + emb[16] - emb[17] + emb[18] + emb[19] + emb[20] - emb[21] + emb[22] - emb[23] - emb[24] + emb[25] + emb[26] - emb[27] + emb[28] - emb[29] - emb[30] + emb[31] - emb[32] + emb[33] + emb[34] - emb[35] - emb[36] - emb[37] - emb[38] - emb[39] - emb[40] + emb[41] + emb[42] - emb[43] - emb[44] - emb[45] + emb[46] + emb[47] - emb[48] + emb[49] - emb[50] + emb[51] - emb[52] + emb[53] - emb[54] - emb[55] - emb[56] + emb[57] - emb[58] - emb[59] - emb[60] + emb[61] - emb[62] - emb[63] - emb[64] > 0 THEN 4 ELSE 0 END) + (CASE WHEN 0.0 + emb[1] + emb[2] - emb[3] + emb[4] - emb[5] + emb[6] - emb[7] - emb[8] + emb[9] - emb[10] + emb[11] + emb[12] - emb[13] + emb[14] - emb[15] + emb[16] + emb[17] - emb[18] + emb[19] + emb[20] + emb[21] - emb[22] - emb[23] - emb[24] + emb[25] - emb[26] + emb[27] + emb[28] + emb[29] - emb[30] + emb[31] - emb[32] + emb[33] - emb[34] - emb[35] - emb[36] - emb[37] + emb[38] - emb[39] - emb[40] + emb[41] - emb[42] - emb[43] + emb[44] - emb[45] + emb[46] + emb[47] - emb[48] - emb[49] + emb[50] + emb[51] - emb[52] - emb[53] + emb[54] - emb[55] + emb[56] + emb[57] + emb[58] + emb[59] - emb[60] + emb[61] - emb[62] - emb[63] + emb[64] > 0 THEN 8 ELSE 0 END) + (CASE WHEN 0.0 - emb[1] - emb[2] - emb[3] - emb[4] + emb[5] + emb[6] + emb[7] + emb[8] - emb[9] + emb[10] - emb[11] - emb[12] + emb[13] - emb[14] + emb[15] + emb[16] + emb[17] + emb[18] - emb[19] - emb[20] - emb[21] - emb[22] + emb[23] + emb[24] - emb[25] + emb[26] - emb[27] + emb[28] - emb[29] - emb[30] - emb[31] - emb[32] - emb[33] + emb[34] + emb[35] + emb[36] + emb[37] + emb[38] - emb[39] - emb[40] - emb[41] - emb[42] - emb[43] - emb[44] + emb[45] - emb[46] + emb[47] + emb[48] - emb[49] + emb[50] + emb[51] - emb[52] - emb[53] - emb[54] - emb[55] + emb[56] + emb[57] + emb[58] - emb[59] - emb[60] - emb[61] + emb[62] - emb[63] + emb[64] > 0 THEN 16 ELSE 0 END) + (CASE WHEN 0.0 - emb[1] + emb[2] - emb[3] + emb[4] + emb[5] + emb[6] + emb[7] - emb[8] - emb[9] - emb[10] - emb[11] - emb[12] + emb[13] - emb[14] - emb[15] - emb[16] - emb[17] + emb[18] - emb[19] + emb[20] - emb[21] - emb[22] - emb[23] - emb[24] + emb[25] + emb[26] + emb[27] + emb[28] - emb[29] - emb[30] + emb[31] + emb[32] - emb[33] + emb[34] - emb[35] + emb[36] + emb[37] - emb[38] - emb[39] + emb[40] + emb[41] + emb[42] + emb[43] + emb[44] - emb[45] + emb[46] - emb[47] + emb[48] + emb[49] + emb[50] + emb[51] + emb[52] - emb[53] - emb[54] + emb[55] + emb[56] + emb[57] + emb[58] + emb[59] + emb[60] + emb[61] - emb[62] + emb[63] - emb[64] > 0 THEN 32 ELSE 0 END) + (CASE WHEN 0.0 - emb[1] - emb[2] + emb[3] + emb[4] - emb[5] - emb[6] - emb[7] + emb[8] - emb[9] - emb[10] - emb[11] + emb[12] - emb[13] + emb[14] + emb[15] + emb[16] - emb[17] + emb[18] + emb[19] - emb[20] - emb[21] - emb[22] - emb[23] + emb[24] + emb[25] + emb[26] - emb[27] - emb[28] + emb[29] - emb[30] + emb[31] - emb[32] - emb[33] + emb[34] + emb[35] + emb[36] - emb[37] - emb[38] + emb[39] - emb[40] - emb[41] - emb[42] + emb[43] + emb[44] - emb[45] - emb[46] - emb[47] + emb[48] - emb[49] + emb[50] + emb[51] + emb[52] - emb[53] + emb[54] - emb[55] + emb[56] + emb[57] - emb[58] + emb[59] + emb[60] + emb[61] - emb[62] - emb[63] - emb[64] > 0 THEN 64 ELSE 0 END) + (CASE WHEN 0.0 - emb[1] - emb[2] + emb[3] - emb[4] + emb[5] + emb[6] - emb[7] - emb[8] + emb[9] - emb[10] - emb[11] - emb[12] + emb[13] + emb[14] + emb[15] - emb[16] - emb[17] + emb[18] + emb[19] + emb[20] + emb[21] + emb[22] + emb[23] + emb[24] + emb[25] + emb[26] + emb[27] - emb[28] + emb[29] + emb[30] - emb[31] - emb[32] - emb[33] + emb[34] - emb[35] - emb[36] + emb[37] - emb[38] + emb[39] + emb[40] - emb[41] - emb[42] - emb[43] - emb[44] + emb[45] + emb[46] - emb[47] + emb[48] + emb[49] + emb[50] - emb[51] - emb[52] + emb[53] + emb[54] + emb[55] + emb[56] + emb[57] + emb[58] - emb[59] - emb[60] - emb[61] - emb[62] + emb[63] + emb[64] > 0 THEN 128 ELSE 0 END)) AS bucket FROM v
    )
    SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
           ROUND(list_aggregate(list_transform(list_zip(a.emb, b2.emb),
                          p -> p[1] * p[2]), 'sum')
           / (SQRT(list_aggregate(list_transform(a.emb, x -> x * x), 'sum'))
              * SQRT(list_aggregate(list_transform(b2.emb, x -> x * x), 'sum'))), 6) AS cos_sim
    FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
    WHERE list_aggregate(list_transform(list_zip(a.emb, b2.emb),
                         p -> p[1] * p[2]), 'sum')
          / (SQRT(list_aggregate(list_transform(a.emb, x -> x * x), 'sum'))
             * SQRT(list_aggregate(list_transform(b2.emb, x -> x * x), 'sum'))) >= 0.3
    """,
    tags=("llm", "dedup", "embedding", "ann"),
)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production twin of dedup_embedding_cosine: candidate pairs
    come from shared hyperplane-LSH buckets (ONE bucket shuffle over
    the full table — no sample, no crossJoin), then exact cosine
    verification ≥ 0.3. At 100 TB the bucket column is the at-rest
    partition key (sources/indexes.build_ann_index) so admission of
    new vectors probes single partitions."""
    from serverless_datalake_spark.operators.similarity import cosine, lsh_bucket

    em = load_table(spark, sf_dir, "embeddings")
    b = em.select(
        "vec_id",
        F.col("embedding"),
        lsh_bucket("embedding", 8, 64).alias("bucket"),
    )
    a = b.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("__va"), "bucket"
    )
    c = b.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("__vb"), "bucket"
    )
    pairs = a.join(c, "bucket").where(F.col("id_a") < F.col("id_b"))
    cs = cosine(F.col("__va"), F.col("__vb"))
    return pairs.where(cs >= 0.3).select(
        "id_a", "id_b", F.round(cs, 6).alias("cos_sim")
    )


_BLOOM_BITS_PER_KEY = 4  # deliberately undersized (production ~10)
                         # so false positives are exercised at EVERY
                         # scale factor; m scales with the reference,
                         # so the fill ratio — and the FP rate — is
                         # scale-invariant instead of saturating
_BLOOM_K = 5


def _bloom_oracle() -> str:
    """DuckDB twin of the bloom membership check: identical md5-derived
    (h1 + i*h2) mod m positions, identical splits."""
    h1 = _hex8_int("substr(md5(text), 1, 8)")
    h2 = _hex8_int("substr(md5(text), 9, 8)")
    return f"""
    WITH ref AS (
      SELECT text, md5(text) AS fp FROM documents WHERE doc_id % 3 <> 0
    ), mm AS (
      SELECT CAST({_BLOOM_BITS_PER_KEY} * COUNT(*) AS BIGINT) AS m FROM ref
    ), ref_pos AS (
      SELECT DISTINCT ({h1} + i * {h2}) % mm.m AS pos
      FROM ref, (SELECT unnest(range({_BLOOM_K})) AS i), mm
    ), bloom AS (
      SELECT list(pos ORDER BY pos) AS rp FROM ref_pos
    ), new_batch AS (
      SELECT doc_id, text, md5(text) AS fp FROM documents WHERE doc_id % 2 = 0
    )
    SELECT n.doc_id,
           list_has_all(bloom.rp,
             list_transform(range({_BLOOM_K}),
               i -> ({h1} + i * {h2}) % mm.m)) AS bloom_dup,
           (n.fp IN (SELECT fp FROM ref)) AS exact_dup
    FROM new_batch n CROSS JOIN bloom CROSS JOIN mm
    """


@query("dedup_bloom_incremental", oracle=_bloom_oracle(), tags=("llm", "dedup", "bloom"))
def dedup_bloom_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup via a Bloom filter: screen a new crawl
    batch against the already-ingested reference corpus WITHOUT
    shuffling (or even carrying) the reference fingerprint set. The
    scenario is a re-crawl: the reference is two-thirds of the corpus
    (doc_id % 3 != 0), the incoming batch is the even half — their
    overlap is rediscovered content that must not be ingested twice.

    The filter is the classic k-probe Bloom: positions
    (h1 + i·h2) mod m for i < k (Kirsch–Mitzenmacher double hashing)
    with h1/h2 the two md5 32-bit halves — deterministic, so the
    DuckDB oracle recomputes the *same* filter, false positives
    included. m scales WITH the reference (4 bits/key, vs ~10 in
    production) so the fill ratio — and the FP rate, ≈ fill^k ≈ 18% —
    is the same at every scale factor instead of saturating when the
    reference outgrows a fixed bitset; bloom_dup ⊇ exact_dup always,
    never the reverse.

    Scale shape: the bloom is ONE broadcast set-bit relation of at
    most m integers (membership = broadcast hash join, O(1)/probe) (at production sizing, ~10 bits per reference key, the
    bitset for a billion-doc reference is ~1.2 GB — built once at
    ingest time and persisted, not rebuilt per batch as this
    self-contained query does). The membership test is then MAP-ONLY
    over the new batch — zero shuffles, no join against the reference:
    exactly what keeps incremental dedup cheap when the reference is
    1000× the batch. Definite-new docs (any probe bit unset) skip the
    expensive exact/near-dup path entirely; only bloom hits proceed.
    The exact_dup column here is the verification twin (broadcast
    fingerprint set), kept because the fixture reference is small."""
    docs = load_table(spark, sf_dir, "documents")

    def fp_h1(fp):
        return F.conv(F.substring(fp, 1, 8), 16, 10).cast("long")

    def fp_h2(fp):
        return F.conv(F.substring(fp, 9, 8), 16, 10).cast("long")

    def probes(fp, m):
        h1, h2 = fp_h1(fp), fp_h2(fp)
        return F.transform(
            F.sequence(F.lit(0), F.lit(_BLOOM_K - 1)),
            lambda i: (h1 + i.cast("long") * h2) % m,
        )

    ref = docs.filter(F.col("doc_id") % 3 != 0)
    # everything on the reference side (sizing count, probe positions,
    # exact-fingerprint set) is a function of md5(text) — pin the
    # fingerprint projection once and derive all three, instead of
    # re-scanning the reference text per consumer (4 scans before)
    rfp = _pin(ref.select(F.md5("text").alias("fp")))
    mm = rfp.groupBy().agg(
        (F.lit(_BLOOM_BITS_PER_KEY) * F.count(F.lit(1))).cast("long").alias("m")
    )
    # the set-bit relation IS the bitset; membership = broadcast HASH
    # join (O(1) per probe — an array-valued bitset would force a
    # linear array_contains scan per probe, measured 4x slower at
    # sf0.1)
    set_bits = (
        rfp.crossJoin(F.broadcast(mm))
        .select(F.explode(probes(F.col("fp"), F.col("m"))).alias("pos"))
        .distinct()
        .withColumn("__set", F.lit(True))
    )
    ref_fp = rfp.select("fp").distinct().withColumn("__hit", F.lit(True))
    new_pos = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .select("doc_id", F.md5("text").alias("fp"))
        .crossJoin(F.broadcast(mm))
        .select(
            "doc_id",
            "fp",
            F.explode(probes(F.col("fp"), F.col("m"))).alias("pos"),
        )
    )
    per_doc = (
        new_pos.join(F.broadcast(set_bits), "pos", "left")
        .groupBy("doc_id", "fp")
        .agg(
            (F.count(F.when(F.col("__set"), 1)) == _BLOOM_K).alias("bloom_dup")
        )
    )
    return (
        per_doc.join(F.broadcast(ref_fp), "fp", "left")
        .select(
            "doc_id",
            "bloom_dup",
            F.coalesce(F.col("__hit"), F.lit(False)).alias("exact_dup"),
        )
    )


def _containment_oracle(threshold: float = 0.8) -> str:
    """LSH candidate pairs (same 8×8 banding as dedup_minhash_lsh)
    scored with exact asymmetric containment |A∩B|/|A|."""
    return f"""
    WITH {_minhash_ctes()},
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM membership a
      JOIN membership b ON a.band_id = b.band_id AND a.band_val = b.band_val
      WHERE a.doc_id < b.doc_id
    ), ts AS (
      SELECT doc_id,
             list_distinct(list_filter(string_split(text, ' '), t -> t <> '')) AS toks
      FROM documents
    ), sc AS (
      SELECT p.doc_a, p.doc_b,
             CAST(len(list_intersect(ta.toks, tb.toks)) AS DOUBLE) AS inter,
             CAST(len(ta.toks) AS DOUBLE) AS na,
             CAST(len(tb.toks) AS DOUBLE) AS nb
      FROM pairs p
      JOIN ts ta ON ta.doc_id = p.doc_a
      JOIN ts tb ON tb.doc_id = p.doc_b
    )
    SELECT doc_a, doc_b,
           ROUND(inter / na, 4) AS containment_a_in_b,
           ROUND(inter / nb, 4) AS containment_b_in_a
    FROM sc WHERE GREATEST(inter / na, inter / nb) >= {threshold}
    """


@query(
    "text_minhash_containment",
    oracle=_containment_oracle(),
    tags=("llm", "dedup", "minhash", "containment"),
)
def text_minhash_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment detection — the boilerplate/quote case
    Jaccard misses: a short document wholly embedded in a longer one
    has C(A,B) = |A∩B|/|A| ≈ 1 while J(A,B) stays low. Candidates are
    nominated by the SAME MinHash 8×8 banding as the dedup family (one
    signature pass, one band shuffle); exact containment is computed
    only on colliding pairs, both directions reported.

    Scale shape: candidate-limited like dedup_minhash_lsh — the only
    quadratic surface is within-bucket, which tracks true near-dup
    mass; the exact-scoring join touches |pairs| rows, not |corpus|².
    (For containment-heavy workloads, banding the SHORTER side with
    more permissive parameters raises recall; the fixture's word-soup
    text keeps the standard banding adequate.)"""
    d = load_table(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(d, "doc_id", "text", k=1)
    pairs = dedup.lsh_candidate_pairs(sigs, bands=8)
    # token_sets_encoded carries its own lazy localCheckpoint, so both
    # score directions share one materialization of the encode
    toks = dedup.token_sets_encoded(d, "doc_id", "text")
    a = toks.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a"))
    b = toks.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b"))
    inter = F.size(F.array_intersect("toks_a", "toks_b")).cast("double")
    na = F.size("toks_a").cast("double")
    nb = F.size("toks_b").cast("double")
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            inter.alias("inter"),
            na.alias("na"),
            nb.alias("nb"),
        )
        .where(F.greatest(F.col("inter") / F.col("na"), F.col("inter") / F.col("nb")) >= 0.8)
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("inter") / F.col("na"), 4).alias("containment_a_in_b"),
            F.round(F.col("inter") / F.col("nb"), 4).alias("containment_b_in_a"),
        )
    )


def _curation2_oracle() -> str:
    """Composition oracle: bloom screen (same CTEs as
    dedup_bloom_incremental) → unigram-LM gate at the survivor mean →
    temperature mixture over kept docs, per language."""
    h1 = _hex8_int("substr(md5(text), 1, 8)")
    h2 = _hex8_int("substr(md5(text), 9, 8)")
    return f"""
    WITH ref AS (
      SELECT text FROM documents WHERE doc_id % 3 <> 0
    ), mm AS (
      SELECT CAST({_BLOOM_BITS_PER_KEY} * COUNT(*) AS BIGINT) AS m FROM ref
    ), ref_pos AS (
      SELECT DISTINCT ({h1} + i * {h2}) % mm.m AS pos
      FROM ref, (SELECT unnest(range({_BLOOM_K})) AS i), mm
    ), bloom AS (
      SELECT list(pos ORDER BY pos) AS rp FROM ref_pos
    ), new_batch AS (
      SELECT doc_id, lang, text FROM documents WHERE doc_id % 2 = 0
    ), screened AS (
      SELECT n.doc_id, n.lang, n.text
      FROM new_batch n CROSS JOIN bloom CROSS JOIN mm
      WHERE NOT list_has_all(bloom.rp,
              list_transform(range({_BLOOM_K}),
                i -> ({h1} + i * {h2}) % mm.m))
    ), tok AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
      FROM documents
    ), cnt AS (
      SELECT t, COUNT(*) AS c FROM tok GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v FROM cnt
    ), lm AS (
      SELECT t, ROUND(ln((CAST(c AS DOUBLE) + 1.0)
                         / (CAST(n AS DOUBLE) + CAST(v AS DOUBLE))), 8) AS lp
      FROM cnt CROSS JOIN tot
    ), stok AS (
      SELECT s.doc_id, s.lang,
             unnest(list_filter(string_split(s.text, ' '), x -> x <> '')) AS t
      FROM screened s
    ), dt AS (
      SELECT doc_id, lang, t, CAST(COUNT(*) AS BIGINT) AS k FROM stok GROUP BY 1, 2, 3
    ), contrib AS (
      SELECT dt.doc_id, dt.lang, dt.t, dt.k, CAST(dt.k AS DOUBLE) * lm.lp AS klp
      FROM dt JOIN lm USING (t)
    ), nll AS (
      SELECT doc_id, lang,
             ROUND(-list_aggregate(list(klp ORDER BY t), 'sum')
                   / CAST(SUM(k) AS DOUBLE), 6) AS mean_nll
      FROM contrib GROUP BY doc_id, lang
    ), thr AS (
      SELECT ROUND(list_aggregate(list(mean_nll ORDER BY doc_id), 'sum')
                   / CAST(COUNT(*) AS DOUBLE), 6) AS m
      FROM nll
    ), kept AS (
      SELECT nll.doc_id, nll.lang FROM nll CROSS JOIN thr WHERE nll.mean_nll <= thr.m
    ), per AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept FROM kept GROUP BY 1
    ), temp AS (
      SELECT lang, n_kept,
             ROUND(exp(0.7 * ln(CAST(n_kept AS DOUBLE))), 8) AS ts
      FROM per
    ), tt AS (
      SELECT list_aggregate(list(ts ORDER BY lang), 'sum') AS tt FROM temp
    )
    SELECT temp.lang, temp.n_kept,
           ROUND(temp.ts / tt.tt, 6) AS temp_share
    FROM temp CROSS JOIN tt
    """


@query(
    "pipeline_llm_curation2",
    oracle=_curation2_oracle(),
    tags=("llm", "pipeline", "capstone"),
)
def pipeline_llm_curation2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone composition of the continued-round operators as ONE
    plan: (1) Bloom-screen the incoming re-crawl batch against the
    ingested reference — only definite-new documents continue; (2)
    gate them on the corpus unigram-LM score (keep mean_nll ≤ the
    survivor mean — the CCNet-style 'head+middle' cut); (3) compute
    temperature-scaled (α=0.7) language sampling shares over what
    survives. Output: per-language kept counts + mixture shares — the
    numbers a training-data scheduler actually consumes.

    Composition cost: the reference appears ONLY as the broadcast
    bloom bitset; the corpus is scanned twice (once for the LM counts,
    once as the batch side); every gate is a filter or broadcast join
    stacked into the same DAG — no materialization barriers between
    stages, so Catalyst pipelines the whole curation pass. The
    multi-consumer branch points (cnt, nll, temp) are identical-keyed
    subtrees that AQE's ReusedExchange computes once — pinning them
    (and the reference fingerprints) was measured slower at sf0.1
    (round-9 optimization A/B)."""
    docs = load_table(spark, sf_dir, "documents")
    h1 = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(F.md5("text"), 9, 8), 16, 10).cast("long")

    def probes(m):
        return F.transform(
            F.sequence(F.lit(0), F.lit(_BLOOM_K - 1)),
            lambda i: (h1 + i.cast("long") * h2) % m,
        )

    ref = docs.filter(F.col("doc_id") % 3 != 0)
    # NOT restructured onto a pinned fingerprint projection (the
    # dedup_bloom_incremental layout): here the sizing aggregate needs
    # only a count (no md5), so the pin trades a cheap count scan for
    # a materialization barrier — measured 2.69 -> 2.95 s at sf0.1
    # (round-9 per-query B/A/B/A)
    mm = ref.groupBy().agg(
        (F.lit(_BLOOM_BITS_PER_KEY) * F.count(F.lit(1))).cast("long").alias("m")
    )
    set_bits = (
        ref.crossJoin(F.broadcast(mm))
        .select(F.explode(probes(F.col("m"))).alias("pos"))
        .distinct()
        .withColumn("__set", F.lit(True))
    )
    screened = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .crossJoin(F.broadcast(mm))
        .select("doc_id", "lang", "text", F.explode(probes(F.col("m"))).alias("pos"))
        .join(F.broadcast(set_bits), "pos", "left")
        .groupBy("doc_id", "lang", "text")
        .agg((F.count(F.when(F.col("__set"), 1)) == _BLOOM_K).alias("__dup"))
        .where(~F.col("__dup"))
        .select("doc_id", "lang", "text")
    )
    toks = lambda c: F.filter(F.split(c, " "), lambda x: x != "")  # noqa: E731
    tok = docs.select(F.explode(toks(F.col("text"))).alias("t"))
    cnt = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy().agg(F.sum("c").alias("n"), F.count(F.lit(1)).alias("v"))
    lm = cnt.crossJoin(F.broadcast(tot)).select(
        "t",
        F.round(
            F.log(
                (F.col("c").cast("double") + F.lit(1.0))
                / (F.col("n").cast("double") + F.col("v").cast("double"))
            ),
            8,
        ).alias("lp"),
    )
    stok = screened.select(
        "doc_id", "lang", F.explode(toks(F.col("text"))).alias("t")
    )
    dt = stok.groupBy("doc_id", "lang", "t").agg(F.count(F.lit(1)).alias("k"))
    contrib = dt.join(lm, "t").select(
        "doc_id", "lang", "t",
        F.col("k").cast("long").alias("k"),
        (F.col("k").cast("double") * F.col("lp")).alias("klp"),
    )
    arr = F.array_sort(F.collect_list(F.struct(F.col("t"), F.col("klp"))))
    folded = F.aggregate(
        F.transform(arr, lambda x: x["klp"]), F.lit(0.0), lambda a, x: a + x
    )
    nll = contrib.groupBy("doc_id", "lang").agg(
        F.round(-folded / F.sum("k").cast("double"), 6).alias("mean_nll")
    )
    narr = F.array_sort(F.collect_list(F.struct(F.col("doc_id"), F.col("mean_nll"))))
    thr = nll.groupBy().agg(
        F.round(
            F.aggregate(
                F.transform(narr, lambda x: x["mean_nll"]),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("m")
    )
    kept = nll.crossJoin(F.broadcast(thr)).where(F.col("mean_nll") <= F.col("m"))
    per = kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))
    temp = per.select(
        "lang",
        "n_kept",
        F.round(F.exp(0.7 * F.log(F.col("n_kept").cast("double"))), 8).alias("ts"),
    )
    tarr = F.array_sort(F.collect_list(F.struct(F.col("lang"), F.col("ts"))))
    tt = temp.groupBy().agg(
        F.aggregate(
            F.transform(tarr, lambda x: x["ts"]), F.lit(0.0), lambda a, x: a + x
        ).alias("tt")
    )
    return temp.crossJoin(F.broadcast(tt)).select(
        "lang",
        "n_kept",
        F.round(F.col("ts") / F.col("tt"), 6).alias("temp_share"),
    )


def _minhash_pairs_oracle(threshold: float = 0.8) -> str:
    """Band-candidate pairs + exact Jaccard verify — the oracle runs
    the identical candidate+verify pipeline."""
    return f"""
    WITH {_minhash_ctes()},
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM membership a
      JOIN membership b ON a.band_id = b.band_id AND a.band_val = b.band_val
      WHERE a.doc_id < b.doc_id
    ), ts AS (
      SELECT doc_id,
             list_distinct(list_filter(string_split(text, ' '), t -> t <> '')) AS toks
      FROM documents
    )
    SELECT p.doc_a, p.doc_b,
           ROUND(CAST(len(list_intersect(ta.toks, tb.toks)) AS DOUBLE)
                 / (CAST(len(ta.toks) + len(tb.toks) AS DOUBLE)
                    - CAST(len(list_intersect(ta.toks, tb.toks)) AS DOUBLE)), 4) AS jaccard
    FROM pairs p
    JOIN ts ta ON ta.doc_id = p.doc_a
    JOIN ts tb ON tb.doc_id = p.doc_b
    WHERE ROUND(CAST(len(list_intersect(ta.toks, tb.toks)) AS DOUBLE)
                / (CAST(len(ta.toks) + len(tb.toks) AS DOUBLE)
                   - CAST(len(list_intersect(ta.toks, tb.toks)) AS DOUBLE)), 4) >= {threshold}
    """


@query(
    "dedup_minhash_pairs",
    oracle=_minhash_pairs_oracle(),
    tags=("llm", "dedup", "minhash", "pairs"),
)
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The candidate+verify near-dup PAIR join — the production shape
    when downstream wants the duplicate EDGES (for audit trails,
    cluster re-linking, or containment scoring), not just survivors:
    MinHash signatures → banded candidates (one band shuffle) → exact
    Jaccard confirm at J ≥ 0.8 on colliding pairs only. Complements
    dedup_minhash_lsh (cluster/survivor view, no pair join) and
    text_minhash_containment (asymmetric scores) over the same
    signature machinery — one index, three read shapes.

    Scale shape: quadratic ONLY within buckets (output tracks true
    near-dup mass); the verify join touches candidate pairs, never
    |corpus|²."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.minhash_near_dups(
        d, "doc_id", "text", threshold=0.8, bands=8, k=1
    )


def _threshold_sweep_oracle() -> str:
    """Candidate pairs (minhash banding) bucketed by exact-Jaccard
    threshold band — the dedup-aggressiveness curve in one pass."""
    return f"""
    WITH {_minhash_ctes()},
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM membership a
      JOIN membership b ON a.band_id = b.band_id AND a.band_val = b.band_val
      WHERE a.doc_id < b.doc_id
    ), ts AS (
      SELECT doc_id,
             list_distinct(list_filter(string_split(text, ' '), t -> t <> '')) AS toks
      FROM documents
    ), scored AS (
      SELECT ROUND(CAST(len(list_intersect(ta.toks, tb.toks)) AS DOUBLE)
                   / (CAST(len(ta.toks) + len(tb.toks) AS DOUBLE)
                      - CAST(len(list_intersect(ta.toks, tb.toks)) AS DOUBLE)), 4) AS j
      FROM pairs p
      JOIN ts ta ON ta.doc_id = p.doc_a
      JOIN ts tb ON tb.doc_id = p.doc_b
    )
    SELECT CASE WHEN j >= 0.9 THEN '>=0.9'
                WHEN j >= 0.8 THEN '0.8-0.9'
                WHEN j >= 0.7 THEN '0.7-0.8'
                ELSE '<0.7' END AS jaccard_band,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM scored GROUP BY 1
    """


@query(
    "dedup_threshold_sweep",
    oracle=_threshold_sweep_oracle(),
    tags=("llm", "dedup", "tuning"),
)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold sensitivity sweep — how many candidate pairs each
    Jaccard band holds (≥0.9 / 0.8–0.9 / 0.7–0.8 / below) — the
    tuning table read BEFORE committing a dedup threshold: a corpus
    whose mass sits at 0.7–0.8 deduplicates very differently at 0.8
    vs 0.7, and this one query shows the cliff. One pass over the
    same banded candidates as the whole minhash family — scoring once
    and bucketing beats re-running dedup per candidate threshold.

    Scale shape: identical to dedup_minhash_pairs up to the last
    aggregate (candidate-bounded), output is 4 rows."""
    d = load_table(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(d, "doc_id", "text", k=1)
    pairs = dedup.lsh_candidate_pairs(sigs, bands=8)
    toks = dedup.token_sets_encoded(d, "doc_id", "text")
    scored = dedup.jaccard_on_pairs(pairs, toks)
    band = (
        F.when(F.col("jaccard") >= 0.9, ">=0.9")
        .when(F.col("jaccard") >= 0.8, "0.8-0.9")
        .when(F.col("jaccard") >= 0.7, "0.7-0.8")
        .otherwise("<0.7")
    )
    return scored.groupBy(band.alias("jaccard_band")).agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


# ---------------------------------------------------------------------------
# Corpus-duplicated n-gram SPANS (substring-granular dedup audit)

_SPAN_K = 8  # shingle width in tokens (Lee et al. use 50 BPE tokens;
             # 8 words ≈ the same idea at fixture document lengths)


@query(
    "dedup_ngram_spans",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ), pos AS (
      SELECT doc_id, unnest(range(1, len(toks) - {_SPAN_K - 2})) AS p, toks
      FROM t WHERE len(toks) >= {_SPAN_K}
    ), sh AS (
      SELECT doc_id, p,
             md5(array_to_string(list_slice(toks, p, p + {_SPAN_K - 1}), ' ')) AS fp
      FROM pos
    ), dup AS (
      SELECT fp FROM sh GROUP BY fp HAVING COUNT(DISTINCT doc_id) >= 2
    ), flagged AS (
      SELECT sh.doc_id, sh.p, CASE WHEN dup.fp IS NOT NULL THEN 1 ELSE 0 END AS f
      FROM sh LEFT JOIN dup ON dup.fp = sh.fp
    ), runs AS (
      SELECT doc_id, p - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p) AS run_id
      FROM flagged WHERE f = 1
    ), max_run AS (
      SELECT doc_id, CAST(MAX(run_len) AS BIGINT) AS max_dup_run
      FROM (SELECT doc_id, run_id, COUNT(*) AS run_len FROM runs GROUP BY 1, 2)
      GROUP BY doc_id
    ), per_doc AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
             CAST(SUM(f) AS BIGINT) AS n_dup
      FROM flagged GROUP BY doc_id
    )
    SELECT d.doc_id, d.n_shingles, d.n_dup,
           ROUND(CAST(d.n_dup AS DOUBLE) / CAST(d.n_shingles AS DOUBLE), 6) AS dup_frac,
           COALESCE(m.max_dup_run, CAST(0 AS BIGINT)) AS max_dup_run
    FROM per_doc d LEFT JOIN max_run m ON m.doc_id = d.doc_id
    """,
    tags=("llm", "dedup", "substring", "spans"),
)
def dedup_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-granular duplication audit (the Lee et al.
    "Deduplicating Training Data Makes Language Models Better" shape
    at n-gram resolution): every 8-token shingle POSITION whose
    shingle also occurs in another document is flagged, and each doc
    reports its duplicated-position count, fraction, and LONGEST
    consecutive duplicated run — the span a substring-level deduper
    would cut, found without suffix arrays (the shingle relation is
    the distributed stand-in; contiguous flagged positions ≡ a shared
    substring of length run+7 tokens).

    Exactness: counts and run lengths are integers (the gaps-islands
    row_number trick); the one division rounds at 6.

    Scale shape: the shingle relation is token-grain (one row per
    position — same cardinality as text_tfidf's explode); the
    duplicate flag is min≠max(doc_id) over the fp-partitioned window,
    ONE shuffle of the shingle relation with no self-join (the flag
    join restated as a window so sh is computed once, not four times).
    At 100 TB this is exactly the published MinHash-scale pipeline
    with fp as the shuffle key; no pairwise comparison anywhere."""
    from pyspark.sql import Window
    from serverless_datalake_spark.operators import textops

    d = load_table(spark, sf_dir, "documents")
    toks = textops.tokens(F.col("text"))
    t = d.select("doc_id", toks.alias("toks")).where(F.size("toks") >= _SPAN_K)
    sh = t.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("toks") - (_SPAN_K - 1))).alias("p"),
        "toks",
    ).select(
        "doc_id",
        "p",
        F.md5(F.concat_ws(" ", F.slice("toks", F.col("p"), _SPAN_K))).alias("fp"),
    )
    # one pass instead of four: a position is duplicated iff its fp
    # occurs in >=2 distinct docs ⇔ min(doc_id)≠max(doc_id) within the
    # fp partition — an fp-partitioned window over the shingle
    # relation, so the dup-fp aggregate + flag join (which re-derived
    # the md5 shingle scan on both sides) collapse into ONE shuffle of
    # sh. The fp strings are dropped before the pin, so the
    # materialized branch point is three ints per position.
    wfp = Window.partitionBy("fp")
    flagged = _pin(
        sh.select(
            "doc_id",
            "p",
            F.when(
                F.min("doc_id").over(wfp) != F.max("doc_id").over(wfp), 1
            ).otherwise(0).alias("f"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy("p")
    runs = (
        flagged.where(F.col("f") == 1)
        .select("doc_id", (F.col("p") - F.row_number().over(w)).alias("run_id"))
        .groupBy("doc_id", "run_id")
        .agg(F.count(F.lit(1)).alias("run_len"))
        .groupBy("doc_id")
        .agg(F.max("run_len").cast("long").alias("max_dup_run"))
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles"),
        F.sum("f").cast("long").alias("n_dup"),
    )
    return per_doc.join(runs, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        "n_dup",
        F.round(F.col("n_dup").cast("double") / F.col("n_shingles").cast("double"), 6).alias(
            "dup_frac"
        ),
        F.coalesce("max_dup_run", F.lit(0).cast("long")).alias("max_dup_run"),
    )


def _minhash_cluster_report_oracle() -> str:
    """The components recursion (see _minhash_components_oracle) with
    a size-histogram head: per cluster-size, how many clusters and
    docs land there, and the doc share."""
    return f"""
    WITH RECURSIVE {_minhash_ctes()},
    edges AS (
      SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
      FROM membership a
      JOIN membership b ON a.band_id = b.band_id AND a.band_val = b.band_val
      WHERE a.doc_id <> b.doc_id
    ),
    reach(id, r) AS (
      SELECT doc_id, doc_id FROM sigs
      UNION
      SELECT reach.id, e.v FROM reach JOIN edges e ON e.u = reach.r
    ),
    comp AS (
      SELECT id AS doc_id, MIN(r) AS rep FROM reach GROUP BY id
    ),
    sizes AS (
      SELECT rep, COUNT(*) AS sz FROM comp GROUP BY rep
    ),
    hist AS (
      SELECT sz, CAST(COUNT(*) AS BIGINT) AS n_clusters,
             CAST(SUM(sz) AS BIGINT) AS n_docs
      FROM sizes GROUP BY sz
    )
    SELECT CAST(sz AS BIGINT) AS cluster_size, n_clusters, n_docs,
           ROUND(CAST(n_docs AS DOUBLE)
                 / CAST(SUM(n_docs) OVER () AS DOUBLE), 6) AS doc_share
    FROM hist
    """


@query(
    "dedup_cluster_report",
    oracle=_minhash_cluster_report_oracle(),
    tags=("llm", "dedup", "minhash", "audit"),
)
def dedup_cluster_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-audit artifact: the cluster-SIZE histogram of the full
    transitive-closure near-dup clustering — how many singletons, how
    many small clusters, whether one giant component is eating the
    corpus (the classic symptom of a too-loose banding threshold),
    and each size's share of all docs. The report every dedup run
    should emit before anyone trusts its survivor set.

    Scale shape: the components cost is dedup_minhash_components
    (banded shuffles + O(log d) pointer-jump rounds); the report adds
    two group-cardinality aggregates and a window over the size
    histogram (tens of rows) — free at any scale."""
    d = load_table(spark, sf_dir, "documents")
    comp = dedup.minhash_dedup_components(d, "doc_id", "text", bands=8, k=1)
    sizes = comp.groupBy("cluster_rep").agg(F.count(F.lit(1)).alias("sz"))
    hist = sizes.groupBy("sz").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("sz").alias("n_docs"),
    )
    tot = hist.agg(F.sum("n_docs").alias("__tot"))
    return hist.crossJoin(F.broadcast(tot)).select(
        F.col("sz").cast("long").alias("cluster_size"),
        F.col("n_clusters"),
        F.col("n_docs"),
        F.round(
            F.col("n_docs").cast("double") / F.col("__tot").cast("double"),
            6,
        ).alias("doc_share"),
    )


def _minhash_pr_eval_oracle() -> str:
    """Banding-quality eval: LSH candidate pairs vs exact-Jaccard≥0.8
    ground truth on the brute-feasible doc_id<80 subset."""
    return f"""
    WITH {_minhash_ctes()},
    pred AS (
      SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      FROM membership a
      JOIN membership b ON a.band_id = b.band_id AND a.band_val = b.band_val
      WHERE a.doc_id < b.doc_id AND a.doc_id < 80 AND b.doc_id < 80
    ), ts AS (
      SELECT doc_id,
             list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))
               AS toks
      FROM documents WHERE doc_id < 80
    ), truth AS (
      SELECT ta.doc_id AS da, tb.doc_id AS db
      FROM ts ta JOIN ts tb ON ta.doc_id < tb.doc_id
      WHERE ROUND(CAST(len(list_intersect(ta.toks, tb.toks)) AS DOUBLE)
                  / (CAST(len(ta.toks) + len(tb.toks) AS DOUBLE)
                     - CAST(len(list_intersect(ta.toks, tb.toks)) AS DOUBLE)),
                  4) >= 0.8
    ), joined AS (
      SELECT COALESCE(p.da, t.da) AS da,
             CASE WHEN p.da IS NOT NULL THEN 1 ELSE 0 END AS in_pred,
             CASE WHEN t.da IS NOT NULL THEN 1 ELSE 0 END AS in_truth
      FROM pred p
      FULL OUTER JOIN truth t ON p.da = t.da AND p.db = t.db
    ), counts AS (
      SELECT CAST(SUM(in_pred) AS DOUBLE) AS np,
             CAST(SUM(in_truth) AS DOUBLE) AS nt,
             CAST(SUM(in_pred * in_truth) AS DOUBLE) AS tp
      FROM joined
    )
    SELECT CAST(np AS BIGINT) AS n_candidate_pairs,
           CAST(nt AS BIGINT) AS n_true_pairs,
           CAST(tp AS BIGINT) AS n_hits,
           ROUND(CASE WHEN np = 0 THEN 0.0 ELSE tp / np END, 6) AS precision,
           ROUND(CASE WHEN nt = 0 THEN 0.0 ELSE tp / nt END, 6) AS recall,
           ROUND(CASE WHEN tp = 0 THEN 0.0
                      ELSE 2.0 * (tp / np) * (tp / nt)
                           / (tp / np + tp / nt) END, 6) AS f1
    FROM counts
    """


@query(
    "dedup_minhash_pr_eval",
    oracle=_minhash_pr_eval_oracle(),
    tags=("llm", "dedup", "minhash", "eval"),
)
def dedup_minhash_pr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding-quality evaluation — the dedup family's twin of
    sim_recall_eval: precision/recall/F1 of the RAW LSH candidate
    pairs (8×8 banding, no Jaccard verify) against exact-Jaccard≥0.8
    ground truth on the brute-feasible doc_id<80 subset. Quantifies
    the S-curve claim the banding parameters encode (midpoint
    (1/8)^(1/8) ≈ 0.77): recall says how much true near-dup mass the
    bands catch; precision says how much the verify stage must filter
    — the two numbers that justify (or re-tune) bands×rows before a
    100 TB run.

    Scale shape: the eval runs on a bounded audit sample by
    construction (ground truth is inherently quadratic); the banding
    side reuses the production signature machinery unchanged. One
    full-outer pair join + a scalar aggregate."""
    d = load_table(spark, sf_dir, "documents")
    d80 = d.where(F.col("doc_id") < 80)
    sigs = dedup.minhash_signatures(d80, "doc_id", "text", 64, 1)
    mem = dedup.banded_membership(sigs, 8, 64)
    ma = mem.select(
        F.col("band_id").alias("ba"), F.col("band_hash").alias("bh"),
        F.col("doc_id").alias("da"),
    )
    mb = mem.select(
        F.col("band_id").alias("ba"), F.col("band_hash").alias("bh"),
        F.col("doc_id").alias("db"),
    )
    pred = (
        ma.join(mb, ["ba", "bh"])
        .where(F.col("da") < F.col("db"))
        .select("da", "db")
        .distinct()
    )
    truth = dedup.ngram_jaccard_pairs(d80, "doc_id", "text", threshold=0.8).select(
        F.col("doc_a").alias("da"), F.col("doc_b").alias("db")
    )
    p = pred.withColumn("in_pred", F.lit(1))
    t = truth.withColumn("in_truth", F.lit(1))
    joined = p.join(t, ["da", "db"], "full_outer").select(
        F.coalesce("in_pred", F.lit(0)).alias("in_pred"),
        F.coalesce("in_truth", F.lit(0)).alias("in_truth"),
    )
    c = joined.agg(
        F.sum("in_pred").cast("double").alias("np"),
        F.sum("in_truth").cast("double").alias("nt"),
        F.sum(F.col("in_pred") * F.col("in_truth")).cast("double").alias("tp"),
    )
    prec = F.when(F.col("np") == 0, 0.0).otherwise(F.col("tp") / F.col("np"))
    rec = F.when(F.col("nt") == 0, 0.0).otherwise(F.col("tp") / F.col("nt"))
    f1 = F.when(F.col("tp") == 0, 0.0).otherwise(
        2.0
        * (F.col("tp") / F.col("np"))
        * (F.col("tp") / F.col("nt"))
        / (F.col("tp") / F.col("np") + F.col("tp") / F.col("nt"))
    )
    return c.select(
        F.col("np").cast("long").alias("n_candidate_pairs"),
        F.col("nt").cast("long").alias("n_true_pairs"),
        F.col("tp").cast("long").alias("n_hits"),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


@query(
    "dedup_span_removal",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ), pos AS (
      SELECT doc_id, unnest(range(1, len(toks) - {_SPAN_K - 2})) AS p, toks
      FROM t WHERE len(toks) >= {_SPAN_K}
    ), sh AS (
      SELECT doc_id, p,
             md5(array_to_string(list_slice(toks, p, p + {_SPAN_K - 1}), ' ')) AS fp
      FROM pos
    ), dup AS (
      SELECT fp FROM sh GROUP BY fp HAVING COUNT(DISTINCT doc_id) >= 2
    ), cov AS (
      SELECT sh.doc_id,
             list_distinct(flatten(list(range(sh.p, sh.p + {_SPAN_K})))) AS covered
      FROM sh JOIN dup USING (fp)
      GROUP BY 1
    ), rewritten AS (
      SELECT t.doc_id,
             CAST(len(t.toks) AS BIGINT) AS n_tokens,
             list_transform(
               list_filter(range(1, len(t.toks) + 1),
                           q -> NOT list_contains(COALESCE(c.covered, CAST([] AS BIGINT[])), q)),
               q -> t.toks[q]) AS kept
      FROM t LEFT JOIN cov c USING (doc_id)
    )
    SELECT doc_id, n_tokens,
           CAST(n_tokens - len(kept) AS BIGINT) AS n_removed,
           CAST(len(kept) AS BIGINT) AS n_kept,
           -- DuckDB array_to_string([]) is NULL (Spark array_join is
           -- ''): a fully-removed doc must fingerprint as md5('')
           md5(COALESCE(array_to_string(kept, ' '), '')) AS kept_fp
    FROM rewritten
    """,
    tags=("llm", "dedup", "substring", "spans"),
)
def dedup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr span REMOVAL — the dedup ACTION to
    dedup_ngram_spans' audit: rewrite every document with the tokens
    covered by any cross-document duplicated 8-token window deleted
    (Lee et al. cut the shared spans rather than dropping documents,
    preserving the unique remainder). kept_fp fingerprints the
    rewritten token stream so the oracle value-verifies the full
    rewrite, not just the counts; docs shorter than the window (and
    docs with no shared span) pass through with n_removed = 0 and
    kept_fp = fingerprint(original).

    Scale shape: the shingle relation and fp-partitioned duplicate
    window are shared with dedup_ngram_spans (fp-keyed, one shingle
    pass, no pairwise work); covered positions aggregate per doc (one doc_id shuffle,
    output bounded by token count), and the rewrite is a doc-local HOF
    over (toks, covered). The membership filter is O(n * |covered|)
    per doc — fine at fixture lengths; for 100k-token documents sort
    the starts and merge intervals (linear, same doc-local stage). The
    DISTRIBUTED shape — inverted gram index + doc-local rewrite — is
    what replaces the single-node suffix array at 100 TB."""
    from serverless_datalake_spark.operators import textops

    d = load_table(spark, sf_dir, "documents")
    toks = textops.tokens(F.col("text"))
    base = d.select("doc_id", toks.alias("toks"))
    t = base.where(F.size("toks") >= _SPAN_K)
    sh = t.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("toks") - (_SPAN_K - 1))).alias("p"),
        "toks",
    ).select(
        "doc_id",
        "p",
        F.md5(F.concat_ws(" ", F.slice("toks", F.col("p"), _SPAN_K))).alias("fp"),
    )
    # duplicated-shingle flag as an fp-partitioned window (min≠max
    # doc_id ⇔ ≥2 distinct docs) instead of a dup-fp aggregate + flag
    # join whose two sides each re-derived the md5 shingle scan — the
    # dedup_ngram_spans rewrite; sh is computed once, one fp shuffle
    cov = (
        sh.select(
            "doc_id",
            "p",
            (
                F.min("doc_id").over(Window.partitionBy("fp"))
                != F.max("doc_id").over(Window.partitionBy("fp"))
            ).alias("__dup"),
        )
        .where(F.col("__dup"))
        .groupBy("doc_id")
        .agg(
            F.array_distinct(
                F.flatten(
                    F.collect_list(
                        F.sequence(F.col("p"), F.col("p") + (_SPAN_K - 1))
                    )
                )
            ).alias("covered")
        )
    )
    j = base.join(cov, "doc_id", "left")
    covered = F.coalesce(F.col("covered"), F.array().cast("array<int>"))
    kept_pos = F.filter(
        F.sequence(F.lit(1), F.size("toks")),
        lambda q: ~F.array_contains(covered, q),
    )
    kept = F.transform(kept_pos, lambda q: F.element_at(F.col("toks"), q))
    return j.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        (F.size("toks") - F.size(kept)).cast("long").alias("n_removed"),
        F.size(kept).cast("long").alias("n_kept"),
        F.md5(F.array_join(kept, " ")).alias("kept_fp"),
    )


@query(
    "dedup_boilerplate_grams",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ), g AS (
      SELECT doc_id, array_to_string(list_slice(toks, p, p + {_SPAN_K - 1}), ' ') AS gram
      FROM (
        SELECT doc_id, unnest(range(1, len(toks) - {_SPAN_K - 2})) AS p, toks
        FROM t WHERE len(toks) >= {_SPAN_K}
      )
    ), df AS (
      SELECT gram,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(COUNT(*) AS BIGINT) AS n_occ,
             MIN(doc_id) AS first_doc
      FROM g GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY n_docs DESC, n_occ DESC, gram) AS rank
      FROM df
    )
    SELECT CAST(rank AS BIGINT) AS rank, gram, n_docs, n_occ, first_doc
    FROM ranked WHERE rank <= 20
    """,
    tags=("llm", "dedup", "substring", "spans"),
)
def dedup_boilerplate_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate hotlist: the 20 8-token windows shared by the most
    documents — the report a curation team reads before writing
    removal rules (license headers, navigation chrome, and quoted
    passages surface here first). Complements text_heavy_hitters
    (single-token, per-source) and text_top_bigrams (2-gram, corpus
    frequency) with CROSS-DOCUMENT document-frequency at span width —
    the signal that separates boilerplate from merely-common phrases.

    Scale shape: one map-only gram expansion + ONE hash aggregate
    carrying (n_docs, n_occ, first_doc) in the same pass, then a
    20-row rank window over the >= 2-doc survivors. The gram STRING
    rides the shuffle here because it is the report payload; the
    audit/removal twins shuffle only the 32-char md5."""
    from pyspark.sql import Window
    from serverless_datalake_spark.operators import textops

    d = load_table(spark, sf_dir, "documents")
    toks = textops.tokens(F.col("text"))
    t = d.select("doc_id", toks.alias("toks")).where(F.size("toks") >= _SPAN_K)
    g = t.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("toks") - (_SPAN_K - 1))).alias("p"),
        "toks",
    ).select(
        "doc_id",
        F.concat_ws(" ", F.slice("toks", F.col("p"), _SPAN_K)).alias("gram"),
    )
    df = (
        g.groupBy("gram")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_occ"),
            F.min("doc_id").alias("first_doc"),
        )
        .where(F.col("n_docs") >= 2)
    )
    w = Window.orderBy(F.col("n_docs").desc(), F.col("n_occ").desc(), "gram")
    return (
        df.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 20)
        .select("rank", "gram", "n_docs", "n_occ", "first_doc")
    )


@query(
    "dedup_cdc_chunks",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ), tok AS (
      SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos
      FROM t
    ), fl AS (
      SELECT doc_id, pos, tok,
             CASE WHEN ({_hex8_int("substr(md5(tok), 1, 8)")} % 32) = 0
                  THEN 1 ELSE 0 END AS f
      FROM tok
    ), ch AS (
      SELECT doc_id, pos, tok,
             COALESCE(SUM(f) OVER (PARTITION BY doc_id ORDER BY pos
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND 1 PRECEDING), 0) AS cid
      FROM fl
    ), chunks AS (
      SELECT doc_id, cid, md5(string_agg(tok, ' ' ORDER BY pos)) AS fp,
             CAST(COUNT(*) AS BIGINT) AS ntok
      FROM ch GROUP BY 1, 2
    ), fps AS (
      SELECT fp, CAST(COUNT(*) AS BIGINT) AS c, CAST(SUM(ntok) AS BIGINT) AS st
      FROM chunks GROUP BY 1
    )
    SELECT CAST(SUM(c) AS BIGINT) AS n_chunks,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_chunks,
           ROUND(1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6)
             AS dup_share,
           CAST(MAX(c) AS BIGINT) AS max_dup,
           ROUND(CAST(SUM(st) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6)
             AS mean_chunk_tokens
    FROM fps
    """,
    tags=("llm", "dedup", "cdc", "chunking"),
)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (CDC) duplication profile — the
    storage-dedup technique (rsync/LBFS rolling-hash cut points)
    applied to corpus text: a chunk boundary falls AFTER any token
    whose 32-bit content hash is 0 mod 32 (expected chunk length 32
    tokens), so chunk boundaries survive insertions and deletions
    that shift token positions — unlike dedup_chunk_exact's
    fixed-width windows, which lose alignment after one edit. The
    profile reports how much chunk-grain redundancy CDC exposes
    (dup_share) and the heaviest repeated chunk.

    Cut decisions use md5_key32 per token (engine-portable; the
    oracle recomputes it from md5 hex, the minhash discipline), chunk
    ids are an exclusive prefix sum of cut flags per document, and
    chunk fingerprints are md5 of the space-joined token span —
    everything integer/string exact, no floats until the two output
    ratios.

    Scale shape: token-grain explode (the text family's standard
    inflation), ONE partitioned prefix-sum window keyed by doc_id
    (never global), then two hash aggregates (doc+chunk grain, then
    fingerprint grain) — each map-side combinable. At 100 TB the
    explode dominates; boundaries are per-doc local so documents
    partition freely."""
    from serverless_datalake_spark.operators import textops
    from serverless_datalake_spark.operators.dedup import md5_key32

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.posexplode(textops.tokens(F.col("text"))).alias("pos", "tok"),
    )
    fl = tok.select(
        "doc_id",
        "pos",
        "tok",
        F.when(md5_key32(F.col("tok")) % 32 == 0, 1).otherwise(0).alias("f"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ch = fl.select(
        "doc_id",
        "pos",
        "tok",
        F.coalesce(F.sum("f").over(w), F.lit(0)).alias("cid"),
    )
    chunks = ch.groupBy("doc_id", "cid").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            )
        ).alias("fp"),
        F.count(F.lit(1)).cast("long").alias("ntok"),
    )
    fps = chunks.groupBy("fp").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("ntok").cast("long").alias("st"),
    )
    return fps.agg(
        F.sum("c").cast("long").alias("n_chunks"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_chunks"),
        F.round(
            F.lit(1.0) - F.count(F.lit(1)).cast("double") / F.sum("c").cast("double"),
            6,
        ).alias("dup_share"),
        F.max("c").cast("long").alias("max_dup"),
        F.round(F.sum("st").cast("double") / F.sum("c").cast("double"), 6).alias(
            "mean_chunk_tokens"
        ),
    )
