"""Retrieval-ranking queries: BM25 lexical scoring, hybrid lexical+
vector fusion (reciprocal-rank fusion), and MMR diversified re-ranking.

These are the three ranking primitives a RAG / search stack runs on
top of the ANN family (llm_similarity): BM25 is the lexical leg,
RRF fuses the lexical and vector shortlists without score calibration,
and MMR re-ranks the fused shortlist for diversity. The reference's
engine exposes only key-range retrieval (event_replayer
lambda_function.py:19–39); this module is part of the beyond-reference
training/serving surface SURVEY §2c claims.

Determinism discipline (house rules, README "Correctness"):
* BM25's only transcendental (LN in the idf) is rounded at 6 the
  moment it is produced — the text_tfidf precedent — and every
  subsequent float op is written with IDENTICAL association order in
  Spark and DuckDB, so both engines compute the same doubles;
* per-document scores sum a FIXED literal term list left-to-right
  (no shuffle-order drift — the sum never crosses an aggregate);
* RRF works on integer ranks (exact) and two correctly-rounded
  divisions added in fixed order;
* MMR's greedy loop is unrolled to a fixed K like graph_pagerank's
  iterations; every round compares 6-rounded doubles with a total
  (score DESC, id) tie-break, so the pick sequence is bit-stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from serverless_datalake_spark.operators import textops
from serverless_datalake_spark.operators.similarity import cosine
from serverless_datalake_spark.queries import query
from serverless_datalake_spark.tables import load_table

_K1 = 1.2
_B = 0.75
_K1P1 = 2.2     # k1 + 1 spelled as a literal (1.2 + 1.0 would be a
_ONE_MINUS_B = 0.25  # different double than the literal on one engine)
_TERMS = ("join", "filter", "window")
_RRF_K = 60.0
_MMR_LAMBDA = 0.7
_MMR_REST = 0.3  # 1 - λ as a literal, the graph_pagerank _TELEPORT rule
_MMR_K = 5
_MMR_SHORTLIST = 20


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, dl, score): BM25 over the fixed literal query-term set.

    Scale shape: ONE corpus scan producing per-doc (dl, tf_i) — the
    stats relation (n_docs, Σdl, df_i) is a single 1-row aggregate
    broadcast back over the scan (the feature_minmax_scale pattern),
    so scoring is map-only after one tiny shuffle. df/idf stay exact
    integers-as-doubles; the idf LN is rounded at 6 on creation."""
    d = load_table(spark, sf_dir, "documents")

    def tf(word: str) -> Column:
        # NB: a `lambda t, w=w:` default-arg closure would arrive at
        # F.filter as a TWO-arg lambda, which PySpark binds as
        # (element, index) — the index would silently replace the word
        return F.size(F.filter(F.col("toks"), lambda t: t == F.lit(word)))

    base = d.select(
        "doc_id", textops.tokens(F.col("text")).alias("toks")
    ).select(
        "doc_id",
        F.size("toks").cast("long").alias("dl"),
        *[tf(w).cast("double").alias(f"tf{i}") for i, w in enumerate(_TERMS)],
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("dl").cast("double").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).cast("double").alias(f"df{i}")
            for i in range(len(_TERMS))
        ],
    )

    def term_score(i: int) -> Column:
        idf = F.round(
            F.log(
                (F.col("n_docs") - F.col(f"df{i}") + F.lit(0.5))
                / (F.col(f"df{i}") + F.lit(0.5))
                + F.lit(1.0)
            ),
            6,
        )
        tf = F.col(f"tf{i}")
        den = tf + F.lit(_K1) * (
            F.lit(_ONE_MINUS_B)
            + (F.lit(_B) * F.col("dl").cast("double")) / (F.col("sum_dl") / F.col("n_docs"))
        )
        return idf * ((tf * F.lit(_K1P1)) / den)

    total = term_score(0)
    for i in range(1, len(_TERMS)):
        total = total + term_score(i)
    return base.crossJoin(F.broadcast(stats)).select(
        "doc_id", "dl", F.round(total, 6).alias("score")
    )


def _bm25_sql_ctes() -> str:
    """DuckDB CTEs mirroring _bm25_scored expression-for-expression."""
    tf_cols = ",\n         ".join(
        f"CAST(len(list_filter(toks, t -> t = '{w}')) AS DOUBLE) AS tf{i}"
        for i, w in enumerate(_TERMS)
    )
    df_cols = ",\n         ".join(
        f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df{i}"
        for i in range(len(_TERMS))
    )
    # idf ROUNDs live in their own CTE so the outer score ROUND's
    # operand contains no nested ROUND (the Spark-rounding rewrite
    # duplicates its operand ~10x; nesting multiplies — the inlined
    # spelling rewrote text_bm25_topk/sim_hybrid_rrf to ~1.1 MB each)
    idf_cols = ",\n         ".join(
        f"ROUND(LN((n_docs - df{i} + 0.5) / (df{i} + 0.5) + 1.0), 6) AS idf{i}"
        for i in range(len(_TERMS))
    )
    terms = " + ".join(
        f"s.idf{i}"
        f" * ((d.tf{i} * {_K1P1}) / (d.tf{i} + {_K1} * ({_ONE_MINUS_B}"
        f" + ({_B} * CAST(d.dl AS DOUBLE)) / (s.sum_dl / s.n_docs))))"
        for i in range(len(_TERMS))
    )
    return f"""
    base AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), t -> t <> '') AS toks
      FROM documents
    ), docs AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
         {tf_cols}
      FROM base
    ), stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) AS sum_dl,
         {df_cols}
      FROM docs
    ), stats2 AS (
      SELECT *,
         {idf_cols}
      FROM stats
    ), scored AS (
      SELECT d.doc_id, d.dl, ROUND({terms}, 6) AS score
      FROM docs d CROSS JOIN stats2 s
    )"""


@query(
    "text_bm25_topk",
    oracle=f"""
    WITH {_bm25_sql_ctes()}, ranked AS (
      SELECT doc_id, dl, score,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM scored WHERE score > 0
    )
    SELECT doc_id, dl, score, rank FROM ranked WHERE rank <= 20
    """,
    tags=("llm", "retrieval", "bm25"),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1=1.2, b=0.75) top-20 documents for a fixed literal
    query-term set — the lexical retrieval leg of a hybrid search
    stack (Robertson–Spärck Jones idf with the +1 floor, the Lucene
    formulation).

    Scale shape: one corpus scan computes (dl, tf_i) per doc; the
    corpus statistics are a 1-row broadcast; scoring is a map-only
    projection; the top-20 is a rank-window filter Spark rewrites to
    WindowGroupLimit (partial top-k on every partition before one
    final merge — no global sort materializes)."""
    scored = _bm25_scored(spark, sf_dir).where(F.col("score") > 0)
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 20)
        .select("doc_id", "dl", "score", F.col("rank").cast("long").alias("rank"))
    )


_COS_AB = """
      list_aggregate(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]), 'sum')
      / (SQRT(list_aggregate(list_transform({a}, x -> x * x), 'sum'))
         * SQRT(list_aggregate(list_transform({b}, x -> x * x), 'sum')))
"""


@query(
    "sim_hybrid_rrf",
    oracle=f"""
    WITH {_bm25_sql_ctes()}, lex AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS lex_rank
      FROM scored WHERE score > 0
    ), lex100 AS (
      SELECT doc_id, lex_rank FROM lex WHERE lex_rank <= 100
    ), q AS (
      SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings WHERE vec_id = 0
    ), c AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings WHERE vec_id >= 1
    ), vecscore AS (
      SELECT c.vec_id,
             ROUND({_COS_AB.format(a="c.emb", b="q.emb")}, 6) AS cos
      FROM c CROSS JOIN q
    ), vec AS (
      SELECT vec_id, ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) AS vec_rank
      FROM vecscore
    ), vec100 AS (
      SELECT vec_id, vec_rank FROM vec WHERE vec_rank <= 100
    ), fused AS (
      SELECT COALESCE(l.doc_id, v.vec_id) AS doc_id,
             l.lex_rank, v.vec_rank,
             ROUND(COALESCE(1.0 / ({_RRF_K} + CAST(l.lex_rank AS DOUBLE)), 0.0)
                   + COALESCE(1.0 / ({_RRF_K} + CAST(v.vec_rank AS DOUBLE)), 0.0), 6) AS rrf_score
      FROM lex100 l FULL OUTER JOIN vec100 v ON v.vec_id = l.doc_id
    ), final AS (
      SELECT doc_id, lex_rank, vec_rank, rrf_score,
             ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id) AS rank
      FROM fused
    )
    SELECT doc_id, lex_rank, vec_rank, rrf_score, rank
    FROM final WHERE rank <= 10
    """,
    tags=("llm", "retrieval", "hybrid", "rrf"),
)
def sim_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: BM25 top-100 and embedding-cosine top-100
    shortlists fused by reciprocal-rank fusion (k=60, the canonical
    Cormack/Clarke constant), final top-10. RRF needs no score
    calibration between the legs — exactly why production hybrid
    search uses it — and the fixture's doc_id ↔ vec_id identity plays
    the shared-document-key role.

    Scale shape: each leg ends in a rank-window ≤ 100 filter
    (WindowGroupLimit — partial top-k per partition, no global sort of
    the corpus); fusion joins two ≤100-row shortlists (broadcast) and
    ranks 100 rows. At fleet scale both legs arrive per-query
    pre-shortened (the ANN probe and an inverted index), so fusion
    cost is per-query constant; nothing here scales with the corpus
    except the two leg scans, which are the ANN/scan families'
    problem, not the fusion's."""
    lex_w = Window.orderBy(F.col("score").desc(), "doc_id")
    lex = (
        _bm25_scored(spark, sf_dir)
        .where(F.col("score") > 0)
        .withColumn("lex_rank", F.row_number().over(lex_w))
        .where(F.col("lex_rank") <= 100)
        .select("doc_id", "lex_rank")
    )
    em = load_table(spark, sf_dir, "embeddings")
    probe = em.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    vec_w = Window.orderBy(F.col("cos").desc(), "vec_id")
    vec = (
        em.where(F.col("vec_id") >= 1)
        .crossJoin(F.broadcast(probe))
        .select(
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("q")), 6).alias("cos"),
        )
        .withColumn("vec_rank", F.row_number().over(vec_w))
        .where(F.col("vec_rank") <= 100)
        .select("vec_id", "vec_rank")
    )
    # Canonical RRF scores the UNION of the legs — a document present
    # in only one shortlist keeps that leg's 1/(k+rank) term and the
    # missing leg contributes 0, so strong vector-only hits survive a
    # short lexical leg. Spelled as union + ONE hash aggregate (no
    # join at all): each leg emits (doc_id, its rank, its reciprocal
    # contribution) and the groupBy sums contributions / keeps the
    # per-leg ranks via max. Addition of the two per-leg doubles is
    # order-free (IEEE + is commutative), so this matches the oracle's
    # FULL OUTER + COALESCE spelling bit-for-bit.
    lex_c = lex.select(
        "doc_id",
        F.col("lex_rank").alias("l_r"),
        F.lit(None).cast("int").alias("v_r"),
        (F.lit(1.0) / (F.lit(_RRF_K) + F.col("lex_rank").cast("double"))).alias("contrib"),
    )
    vec_c = vec.select(
        F.col("vec_id").alias("doc_id"),
        F.lit(None).cast("int").alias("l_r"),
        F.col("vec_rank").alias("v_r"),
        (F.lit(1.0) / (F.lit(_RRF_K) + F.col("vec_rank").cast("double"))).alias("contrib"),
    )
    fused = (
        lex_c.unionAll(vec_c)
        .groupBy("doc_id")
        .agg(
            F.max("l_r").alias("lex_rank"),
            F.max("v_r").alias("vec_rank"),
            F.round(F.sum("contrib"), 6).alias("rrf_score"),
        )
    )
    fin_w = Window.orderBy(F.col("rrf_score").desc(), "doc_id")
    return (
        fused.withColumn("rank", F.row_number().over(fin_w))
        .where(F.col("rank") <= 10)
        .select(
            "doc_id",
            F.col("lex_rank").cast("long").alias("lex_rank"),
            F.col("vec_rank").cast("long").alias("vec_rank"),
            "rrf_score",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def _mmr_oracle() -> str:
    """Unrolled greedy MMR as a CTE chain (graph_pagerank's unrolled-
    iteration oracle pattern applied to selection instead of ranking)."""
    parts = [
        f"""
    WITH q AS (
      SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings WHERE vec_id = 0
    ), c AS (
      SELECT vec_id AS cid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings WHERE vec_id >= 10
    ), rel0 AS (
      SELECT c.cid, c.emb,
             ROUND({_COS_AB.format(a="c.emb", b="q.emb")}, 6) AS rel
      FROM c CROSS JOIN q
    ), cand AS (
      SELECT cid, emb, rel FROM (
        SELECT cid, emb, rel,
               ROW_NUMBER() OVER (ORDER BY rel DESC, cid) AS rk
        FROM rel0
      ) WHERE rk <= {_MMR_SHORTLIST}
    ), pairs AS (
      SELECT a.cid AS ca, b.cid AS cb,
             ROUND({_COS_AB.format(a="a.emb", b="b.emb")}, 6) AS sim
      FROM cand a JOIN cand b ON a.cid <> b.cid
    ), s1 AS (
      SELECT cid, CAST(1 AS BIGINT) AS pick_round,
             ROUND({_MMR_LAMBDA} * rel, 6) AS mmr_score
      FROM cand ORDER BY mmr_score DESC, cid LIMIT 1
    ), sel1 AS (SELECT * FROM s1)"""
    ]
    for r in range(2, _MMR_K + 1):
        prev = r - 1
        parts.append(
            f""", s{r} AS (
      SELECT d.cid, CAST({r} AS BIGINT) AS pick_round,
             ROUND({_MMR_LAMBDA} * d.rel - {_MMR_REST} * m.ms, 6) AS mmr_score
      FROM cand d
      JOIN (
        SELECT p.ca AS cid, MAX(p.sim) AS ms
        FROM pairs p JOIN sel{prev} s ON p.cb = s.cid
        GROUP BY 1
      ) m ON m.cid = d.cid
      WHERE d.cid NOT IN (SELECT cid FROM sel{prev})
      ORDER BY mmr_score DESC, d.cid LIMIT 1
    ), sel{r} AS (SELECT * FROM sel{prev} UNION ALL SELECT * FROM s{r})"""
        )
    parts.append(
        f"""
    SELECT cid AS corpus_id, pick_round, mmr_score FROM sel{_MMR_K}
    """
    )
    return "".join(parts)


@query("sim_mmr_rerank", oracle=_mmr_oracle(), tags=("llm", "retrieval", "mmr"))
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (λ=0.7, K=5) of the
    cosine top-20 shortlist for probe vec_id=0 — the standard
    diversity re-ranker for RAG context assembly (don't feed the model
    five near-copies of the same passage).

    Greedy MMR is inherently sequential in K, so the loop is UNROLLED
    to a fixed K=5 exactly like graph_pagerank unrolls its
    iterations: every round is an anti-join (drop selected), a
    broadcast join against the pair-sim relation restricted to the
    selected set, a per-candidate MAX, and a 1-row rank-window pick.
    All relations after the shortlist window are ≤ shortlist²
    (≤ 400 rows here) regardless of corpus size — the corpus-scaled
    work is ONLY the shortlist construction, which at fleet scale is
    the ANN probe (sim_topk_lsh_indexed), not this brute scan.
    Shortlist and pair-sims are persisted once (the graph-module
    cache-generation pattern) so the 5 unrolled rounds replan tiny
    cached relations, not the corpus scan."""
    from serverless_datalake_spark.queries.graph import _retire_and_cache

    em = load_table(spark, sf_dir, "embeddings")
    probe = em.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    shortlist_w = Window.orderBy(F.col("rel").desc(), "cid")
    cand = (
        em.where(F.col("vec_id") >= 10)
        .crossJoin(F.broadcast(probe))
        .select(
            F.col("vec_id").alias("cid"),
            "embedding",
            F.round(cosine(F.col("embedding"), F.col("q")), 6).alias("rel"),
        )
        .withColumn("rk", F.row_number().over(shortlist_w))
        .where(F.col("rk") <= _MMR_SHORTLIST)
        .drop("rk")
    )
    a = cand.select(F.col("cid").alias("ca"), F.col("embedding").alias("ea"))
    b = cand.select(F.col("cid").alias("cb"), F.col("embedding").alias("eb"))
    pairs = (
        a.join(b, F.col("ca") != F.col("cb"))
        .select("ca", "cb", F.round(cosine(F.col("ea"), F.col("eb")), 6).alias("sim"))
    )
    cand = cand.drop("embedding")
    cand, pairs = _retire_and_cache(("mmr", sf_dir), [cand, pairs])
    # eager: collapse the shortlist/pair lineage before the unrolled
    # rounds replan it on every join side (triangle-count precedent)
    pairs.count()

    # each greedy round's single-row pick is materialized driver-side
    # (K rows total — the coreset k-sized-metadata pattern): a lazily
    # chained selected-set re-derives every earlier round on all three
    # consumer sides, a branching^K plan blow-up that measured ~7 s of
    # pure planning/micro-jobs at sf0.1 vs ~2 s materialized
    first = (
        cand.select(
            "cid",
            F.round(F.lit(_MMR_LAMBDA) * F.col("rel"), 6).alias("mmr_score"),
        )
        .orderBy(F.col("mmr_score").desc(), "cid")
        .limit(1)
        .collect()
    )
    picked: list[tuple[int, int, float]] = [
        (
            int(r["cid"]),
            1,
            None if r["mmr_score"] is None else float(r["mmr_score"]),
        )
        for r in first[:1]
    ]
    for r in range(2, _MMR_K + 1):
        if not picked:
            break
        sel_ids = [p[0] for p in picked]
        rows = (
            pairs.where(F.col("cb").isin(sel_ids))
            .groupBy(F.col("ca").alias("cid"))
            .agg(F.max("sim").alias("ms"))
            .join(cand.where(~F.col("cid").isin(sel_ids)), "cid")
            .select(
                "cid",
                F.round(
                    F.lit(_MMR_LAMBDA) * F.col("rel") - F.lit(_MMR_REST) * F.col("ms"),
                    6,
                ).alias("mmr_score"),
            )
            .orderBy(F.col("mmr_score").desc(), "cid")
            .limit(1)
            .collect()
        )
        if not rows:  # shortlist exhausted: stop like the former
            break     # empty Window pick did, keeping rounds so far
        ms = rows[0]["mmr_score"]
        # a NULL score (all-NULL cosines) propagates as a NULL row,
        # as the former Window pick did
        picked.append((int(rows[0]["cid"]), r, None if ms is None else float(ms)))
    return spark.createDataFrame(
        picked, schema="corpus_id long, pick_round long, mmr_score double"
    )


_MS_SUBS = 8   # 64-dim vectors → 8 sub-vectors of 8 dims
_MS_DIM = 8



_MS_DEPTH = 50  # rerank depth: MaxSim runs on the pooled-cosine
                # shortlist, never the corpus (the two-stage pattern)


def _maxsim_oracle() -> str:
    """Stage 1 mirrors the pooled single-vector cosine shortlist
    (rank ≤ depth per query); stage 2 computes MaxSim only on the
    shortlist pairs. Chunk lists and norms are precomputed per side of
    the surviving pair (the Spark factoring); the pair expression is
    dot/(na·nb) — the house cosine arithmetic unchanged."""
    def chunks(col):
        s = f"list_slice({col}, i * {_MS_DIM} + 1, i * {_MS_DIM} + {_MS_DIM})"
        return (
            f"list_transform(range({_MS_SUBS}), i -> {s})",
            f"list_transform(range({_MS_SUBS}), i -> "
            f"SQRT(list_aggregate(list_transform({s}, x -> x * x), 'sum')))",
        )

    qc, qn = chunks("s.qemb")
    cc, cn = chunks("s.cemb")
    pooled = _COS_AB.format(a="q.emb", b="c.emb")
    pair = """(
      list_aggregate(list_transform(list_zip(qc[i + 1], cc[j + 1]),
                     p -> p[1] * p[2]), 'sum')
      / (qn[i + 1] * cn[j + 1]))"""
    return f"""
    WITH q AS (
      SELECT vec_id AS query_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings WHERE vec_id < 5
    ), c AS (
      SELECT vec_id AS corpus_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings WHERE vec_id >= 10
    ), pooled AS (
      SELECT q.query_id, c.corpus_id, q.emb AS qemb, c.emb AS cemb,
             ROUND({pooled}, 6) AS pooled_cos
      FROM q CROSS JOIN c
    ), shortlist AS (
      SELECT * FROM (
        SELECT query_id, corpus_id, qemb, cemb, pooled_cos,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY pooled_cos DESC, corpus_id) AS rk
        FROM pooled
      ) WHERE rk <= {_MS_DEPTH}
    ), chunked AS (
      SELECT s.query_id, s.corpus_id, s.pooled_cos,
             {qc} AS qc, {qn} AS qn, {cc} AS cc, {cn} AS cn
      FROM shortlist s
    ), inner_max AS (
      -- per-(pair, query-chunk i) max over corpus chunks j: the inner
      -- ROUND sits in its own CTE so the outer sum ROUND's operand
      -- has no nested ROUND (Spark-rounding rewrite size discipline)
      SELECT query_id, corpus_id, pooled_cos, u.i AS i,
             ROUND(list_aggregate(list_transform(range({_MS_SUBS}), j ->
               {pair}), 'max'), 6) AS mi
      FROM chunked, unnest(range({_MS_SUBS})) AS u(i)
    ), scored AS (
      SELECT query_id, corpus_id, pooled_cos,
             ROUND(list_aggregate(list(mi ORDER BY i), 'sum'), 6) AS maxsim
      FROM inner_max GROUP BY query_id, corpus_id, pooled_cos
    ), ranked AS (
      SELECT query_id, corpus_id, pooled_cos, maxsim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY maxsim DESC, corpus_id) AS rank
      FROM scored
    )
    SELECT query_id, corpus_id, pooled_cos, maxsim, rank
    FROM ranked WHERE rank <= 5
    """


@query("sim_maxsim_late_interaction", oracle=_maxsim_oracle(),
       tags=("llm", "retrieval", "maxsim", "colbert"))
def sim_maxsim_late_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT-style late-interaction re-ranking, two-stage exactly as
    production runs it: stage 1 shortlists the pooled single-vector
    cosine top-50 per query (the cheap pass — at fleet scale this is
    the ANN probe, sim_topk_lsh_indexed); stage 2 scores only the
    shortlist with MaxSim — treat each 64-dim vector as 8 token-level
    sub-vectors of 8 dims, score = Σ_i max_j cos(q_i, d_j) (every
    query token matches its best document token; the quality jump
    late interaction buys over pooled cosine). Final top-5 per query.

    Exactness: pooled cosine and each sub-cosine are the house
    zip-fold dot/(na·nb); inner MAX is order-free on identical
    doubles, rounded at 6; the outer sum folds chunk index order
    sequentially; every rank has a total (score DESC, id) tie-break.

    Scale shape: stage-1 cost is the ANN family's problem (here a
    broadcast probe scan with a per-query WindowGroupLimit); stage-2
    work is |queries|·depth pairs — independent of corpus size, the
    whole point of reranking a shortlist. Chunk lists and norms are
    projected ONCE per surviving pair side, so the pair expression is
    64 small dots, not 64 norm recomputations; HOF expressions are
    interpreted (not codegen), which is why bounding the pair count
    matters."""
    from serverless_datalake_spark.operators.similarity import _as_double

    em = load_table(spark, sf_dir, "embeddings")

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )

    def nrm(a):
        return F.sqrt(
            F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
        )

    def sub(col, i):
        return F.slice(col, i * _MS_DIM + 1, _MS_DIM)

    q = em.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), _as_double(F.col("embedding")).alias("qemb")
    )
    c = em.where(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("corpus_id"), _as_double(F.col("embedding")).alias("cemb")
    )
    # the rank window must carry only (ids, score) — embeddings ride
    # along as point re-reads AFTER the depth cut (the
    # sim_topk_ivfpq_rerank discipline: no corpus-wide shuffle of
    # vector payloads)
    pooled = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "corpus_id",
        F.round(
            dot(F.col("qemb"), F.col("cemb"))
            / (nrm(F.col("qemb")) * nrm(F.col("cemb"))),
            6,
        ).alias("pooled_cos"),
    )
    sw = Window.partitionBy("query_id").orderBy(F.col("pooled_cos").desc(), "corpus_id")
    ids = (
        pooled.withColumn("rk", F.row_number().over(sw))
        .where(F.col("rk") <= _MS_DEPTH)
        .drop("rk")
    )
    shortlist = ids.join(F.broadcast(q), "query_id").join(c, "corpus_id")

    # The MaxSim expression references BOTH join sides, so Catalyst
    # cannot push any of it below the join — it runs on exactly
    # |queries|·depth rows. (A per-side chunk/norm PROJECTION here
    # would be pushed onto the full corpus scan — measured 5× slower.)
    # The 64-pair fold ships as ONE F.expr string (the _hyperplanes
    # precedent): building it as nested Column objects costs ~8 s of
    # py4j round-trips PER PLAN — the string parses JVM-side in ms.
    def s_slice(col: str, k: int) -> str:
        return f"slice({col}, {k * _MS_DIM + 1}, {_MS_DIM})"

    def s_dot(a: str, b: str) -> str:
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
            f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )

    def s_nrm(a: str) -> str:
        return (
            f"sqrt(aggregate(transform({a}, x -> x * x), "
            f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))"
        )

    def s_cos(i: int, j: int) -> str:
        a, b = s_slice("qemb", i), s_slice("cemb", j)
        return f"({s_dot(a, b)} / ({s_nrm(a)} * {s_nrm(b)}))"

    chunk_terms = [
        f"round(array_max(array({', '.join(s_cos(i, j) for j in range(_MS_SUBS))})), 6)"
        for i in range(_MS_SUBS)
    ]
    score = F.expr(f"round({' + '.join(chunk_terms)}, 6)")

    scored = shortlist.select(
        "query_id", "corpus_id", "pooled_cos", score.alias("maxsim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("maxsim").desc(), "corpus_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select(
            "query_id", "corpus_id", "pooled_cos", "maxsim",
            F.col("rank").cast("long").alias("rank"),
        )
    )


_QL_MU = 200.0  # Dirichlet pseudo-count, sized for the fixture's short docs


def _ql_sql_ctes() -> str:
    """DuckDB CTEs mirroring retrieval_query_likelihood_dirichlet
    expression-for-expression (same association order, LN rounded at 6
    in its own CTE so the outer ROUND operand nests no ROUND)."""
    tf_cols = ",\n         ".join(
        f"CAST(len(list_filter(toks, t -> t = '{w}')) AS DOUBLE) AS tf{i}"
        for i, w in enumerate(_TERMS)
    )
    cf_cols = ",\n         ".join(
        f"CAST(SUM(tf{i}) AS DOUBLE) AS cf{i}" for i in range(len(_TERMS))
    )
    term_cols = ",\n         ".join(
        f"ROUND(LN((tf{i} + {_QL_MU} * ((cf{i} + 1.0) / (t_tokens + 1.0)))"
        f" / (CAST(dl AS DOUBLE) + {_QL_MU})), 6) AS term{i}"
        for i in range(len(_TERMS))
    )
    score_sum = " + ".join(f"term{i}" for i in range(len(_TERMS)))
    return f"""base AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ), feats AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
         {tf_cols}
      FROM base
    ), stats AS (
      SELECT CAST(SUM(dl) AS DOUBLE) AS t_tokens,
         {cf_cols}
      FROM feats
    ), terms AS (
      SELECT doc_id, dl,
         {term_cols}
      FROM feats CROSS JOIN stats
    ), scored AS (
      SELECT doc_id, dl, ROUND({score_sum}, 6) AS score FROM terms
    )"""


@query(
    "retrieval_query_likelihood_dirichlet",
    oracle=f"""
    WITH {_ql_sql_ctes()}, ranked AS (
      SELECT doc_id, dl, score,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM scored
    )
    SELECT doc_id, dl, score, rank FROM ranked WHERE rank <= 20
    """,
    tags=("llm", "retrieval", "query-likelihood"),
)
def retrieval_query_likelihood_dirichlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    Lafferty) — the language-modeling leg of the classic IR trio
    (alongside BM25 and vector cosine): score(q,d) = Σ_{w∈q}
    ln((tf_wd + μ·p(w|C)) / (dl + μ)) with μ=200 and the add-one
    collection floor p(w|C) = (cf_w+1)/(T+1), so an unseen query term
    degrades smoothly instead of −∞.

    Determinism: each per-term LN (the only transcendental) is rounded
    at 6 on creation — the BM25/tf-idf house rule — then the per-doc
    score sums the fixed literal term list left-to-right.

    Scale shape: identical to text_bm25_topk — one corpus scan
    produces (dl, tf_i), the corpus stats (T, cf_i) are a 1-row
    broadcast, scoring is map-only, and the top-20 rank-window
    rewrites to WindowGroupLimit (partial top-k per partition)."""
    d = load_table(spark, sf_dir, "documents")

    def tf(word: str) -> Column:
        return F.size(F.filter(F.col("toks"), lambda t: t == F.lit(word)))

    base = d.select("doc_id", textops.tokens(F.col("text")).alias("toks")).select(
        "doc_id",
        F.size("toks").cast("long").alias("dl"),
        *[tf(w).cast("double").alias(f"tf{i}") for i, w in enumerate(_TERMS)],
    )
    stats = base.agg(
        F.sum("dl").cast("double").alias("t_tokens"),
        *[F.sum(f"tf{i}").cast("double").alias(f"cf{i}") for i in range(len(_TERMS))],
    )

    def term(i: int) -> Column:
        return F.round(
            F.log(
                (
                    F.col(f"tf{i}")
                    + F.lit(_QL_MU)
                    * ((F.col(f"cf{i}") + F.lit(1.0)) / (F.col("t_tokens") + F.lit(1.0)))
                )
                / (F.col("dl").cast("double") + F.lit(_QL_MU))
            ),
            6,
        )

    total = term(0)
    for i in range(1, len(_TERMS)):
        total = total + term(i)
    scored = base.crossJoin(F.broadcast(stats)).select(
        "doc_id", "dl", F.round(total, 6).alias("score")
    )
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 20)
        .select("doc_id", "dl", "score", F.col("rank").cast("long").alias("rank"))
    )
