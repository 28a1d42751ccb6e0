"""Model/data evaluation operators: the measurement queries an LLM
training pipeline runs NEXT TO its data plane — pass@k success
estimation over attempt logs, inter-rater agreement for labeling QA,
n-gram overlap (ROUGE-1) between paired documents, and Bradley–Terry
preference-strength fitting over pairwise comparisons (the RLHF
reward-data shape).

Reference tie-in: the reference pipeline carries opaque event payloads
per source (serverless_datalake_stack.py:129–147) and its only query
is a keyed range scan (event_replayer/lambda_function.py:19–39); these
operators generalize that "measure the stream you ingested" role to
the evaluation tables a training pipeline publishes.

Exactness discipline (module-wide): every estimator reduces to exact
integer counts first; the few genuinely-real-valued steps (pass@k's
product fold, Bradley–Terry's fixed-point updates) are left-to-right
folds over index-ordered sequences, so both engines multiply/add the
same doubles in the same order — bit-identical without rounding slack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window

from serverless_datalake_spark.operators import pin as _pin
from pyspark.sql import functions as F

from serverless_datalake_spark.queries import query
from serverless_datalake_spark.queries.llm_dedup import _hex8_int
from serverless_datalake_spark.tables import load_table

# --------------------------------------------------------------------------
# pass@k


_PASS_KS = (1, 5, 10)


def _passk_oracle() -> str:
    h = _hex8_int("substr(md5(CAST(event_id AS VARCHAR)), 1, 8)")
    per_k = []
    for k in _PASS_KS:
        # inner per-task ROUND hoisted into a subquery column so the
        # Spark-rounding rewrite never sees ROUND nested in ROUND (the
        # rewrite duplicates its operand ~10x; nesting multiplies)
        per_k.append(
            f"""
    SELECT CAST({k} AS BIGINT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_tasks,
           ROUND(CAST(SUM(p_e6) AS DOUBLE)
                 / (1000000.0 * CAST(COUNT(*) AS DOUBLE)), 6) AS mean_pass_at_k
    FROM (
      SELECT CAST(ROUND((CASE WHEN n - c < {k} THEN 1.0
                 ELSE 1.0 - list_reduce(list_transform(range(0, {k}),
                      i -> CAST(n - c - i AS DOUBLE) / CAST(n - i AS DOUBLE)),
                      (a, b) -> a * b) END) * 1000000.0, 0) AS BIGINT) AS p_e6
      FROM tasks WHERE n >= {k}
    )"""
        )
    return (
        f"""
    WITH attempts AS (
      SELECT event_id % 64 AS task_id,
             CASE WHEN ({h}) % 10 < 3 THEN 1 ELSE 0 END AS correct
      FROM events
    ), tasks AS (
      SELECT task_id, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(correct) AS BIGINT) AS c
      FROM attempts GROUP BY task_id
    )
    """
        + "\n    UNION ALL".join(per_k)
    )


@query("eval_pass_at_k", oracle=_passk_oracle(), tags=("evaluation", "pass-at-k"))
def eval_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbiased pass@k (Codex-paper estimator: 1 − C(n−c,k)/C(n,k))
    over a per-task attempt log — the headline metric of every
    code/reasoning eval, computed in the data plane. Tasks are
    event_id%64 buckets; "correct" is a deterministic md5 gate (30%)
    standing in for a grader verdict, so both engines replay the same
    outcomes.

    Exactness: the binomial ratio is a left-to-right product fold of
    k ≤ 10 index-ordered terms (identical doubles both engines);
    per-task values round to 1e-6 integers and aggregate as BIGINTs,
    so the final mean is one exact-integer division per k.

    Scale shape: attempts reduce to task grain (n, c) in ONE
    partial-agg shuffle; the three k-estimates are constant-size
    aggregates of the task relation — at 100 TB of attempt logs the
    only data-proportional cost is the first scan."""
    ev = load_table(spark, sf_dir, "events")
    correct = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 10
        < 3
    )
    # NOT pinned: the three k-branches hang off this identical
    # groupBy(task_id) subtree, which AQE's ReusedExchange computes
    # once — a pin measured neutral-to-slower at sf0.1 (round-9 A/B)
    tasks = (
        ev.select(
            (F.col("event_id") % 64).alias("task_id"),
            F.when(correct, 1).otherwise(0).alias("correct"),
        )
        .groupBy("task_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("correct").cast("long").alias("c"),
        )
    )
    outs = []
    for k in _PASS_KS:
        fold = (
            f"1.0 - aggregate(sequence(0, {k - 1}), CAST(1.0 AS DOUBLE), "
            f"(acc, i) -> acc * (CAST(n - c - i AS DOUBLE) / CAST(n - i AS DOUBLE)))"
        )
        p = F.expr(f"CASE WHEN n - c < {k} THEN CAST(1.0 AS DOUBLE) ELSE {fold} END")
        outs.append(
            tasks.where(F.col("n") >= k)
            .select(F.round(p * 1000000.0, 0).cast("long").alias("p_e6"))
            .agg(
                F.lit(k).cast("long").alias("k"),
                F.count(F.lit(1)).cast("long").alias("n_tasks"),
                F.round(
                    F.sum("p_e6").cast("double")
                    / (F.lit(1000000.0) * F.count(F.lit(1)).cast("double")),
                    6,
                ).alias("mean_pass_at_k"),
            )
            .select("k", "n_tasks", "mean_pass_at_k")
        )
    return _union_all(outs)


# --------------------------------------------------------------------------
# Cohen's kappa

_KAPPA_TOKC = "len(list_filter(string_split(text, ' '), t -> t <> ''))"


@query(
    "stats_cohens_kappa",
    oracle=f"""
    WITH rated AS (
      SELECT CASE WHEN n_chars < 250 THEN 0 WHEN n_chars < 400 THEN 1 ELSE 2 END AS ra,
             CASE WHEN {_KAPPA_TOKC} < 45 THEN 0
                  WHEN {_KAPPA_TOKC} < 75 THEN 1 ELSE 2 END AS rb
      FROM documents
    ), counts AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nd,
             CAST(SUM(CASE WHEN ra = rb THEN 1 ELSE 0 END) AS BIGINT) AS agree,
             CAST(SUM(CASE WHEN ra = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a0,
             CAST(SUM(CASE WHEN ra = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a1,
             CAST(SUM(CASE WHEN ra = 2 THEN 1 ELSE 0 END) AS BIGINT) AS a2,
             CAST(SUM(CASE WHEN rb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b0,
             CAST(SUM(CASE WHEN rb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b1,
             CAST(SUM(CASE WHEN rb = 2 THEN 1 ELSE 0 END) AS BIGINT) AS b2
      FROM rated
    ), probs AS (
      SELECT nd,
             CAST(agree AS DOUBLE) / CAST(nd AS DOUBLE) AS po,
             CAST(a0 * b0 + a1 * b1 + a2 * b2 AS DOUBLE)
               / CAST(nd AS DOUBLE) / CAST(nd AS DOUBLE) AS pe
      FROM counts
    )
    SELECT nd AS n_items, ROUND(po, 6) AS po, ROUND(pe, 6) AS pe,
           ROUND((po - pe) / (1.0 - pe), 6) AS kappa
    FROM probs
    """,
    tags=("evaluation", "statistics", "agreement"),
)
def stats_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two deterministic raters labeling each
    document into 3 size classes (rater A by character count, rater B
    by token count) — the labeling-QA statistic every human-annotation
    or LLM-judge pipeline gates batches on (kappa, not raw agreement,
    because 3 imbalanced classes make chance agreement high).

    Exactness: the 3×3 confusion table and both marginals are exact
    integers from one aggregation pass; po/pe/kappa are three
    divisions spelled identically in both engines.

    Scale shape: ONE scan, one constant-size aggregate — no shuffle of
    anything but 8 partial counters."""
    from serverless_datalake_spark.operators import textops

    d = load_table(spark, sf_dir, "documents")
    tokc = F.size(textops.tokens(F.col("text")))
    ra = (
        F.when(F.col("n_chars") < 250, 0).when(F.col("n_chars") < 400, 1).otherwise(2)
    )
    rb = F.when(tokc < 45, 0).when(tokc < 75, 1).otherwise(2)
    rated = d.select(ra.alias("ra"), rb.alias("rb"))

    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    counts = rated.agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        cnt(F.col("ra") == F.col("rb")).alias("agree"),
        cnt(F.col("ra") == 0).alias("a0"),
        cnt(F.col("ra") == 1).alias("a1"),
        cnt(F.col("ra") == 2).alias("a2"),
        cnt(F.col("rb") == 0).alias("b0"),
        cnt(F.col("rb") == 1).alias("b1"),
        cnt(F.col("rb") == 2).alias("b2"),
    )
    probs = counts.select(
        "nd",
        (F.col("agree").cast("double") / F.col("nd").cast("double")).alias("po"),
        (
            (F.col("a0") * F.col("b0") + F.col("a1") * F.col("b1") + F.col("a2") * F.col("b2"))
            .cast("double")
            / F.col("nd").cast("double")
            / F.col("nd").cast("double")
        ).alias("pe"),
    )
    return probs.select(
        F.col("nd").alias("n_items"),
        F.round("po", 6).alias("po"),
        F.round("pe", 6).alias("pe"),
        F.round((F.col("po") - F.col("pe")) / (F.lit(1.0) - F.col("pe")), 6).alias("kappa"),
    )


# --------------------------------------------------------------------------
# ROUGE-1 over document pairs

_TOKS = "list_filter(string_split(text, ' '), t -> t <> '')"


@query(
    "eval_rouge1_pairs",
    oracle=f"""
    WITH cand AS (
      SELECT doc_id AS cand_id, {_TOKS} AS ctoks FROM documents WHERE doc_id % 7 = 0
    ), ref AS (
      SELECT doc_id AS ref_id, {_TOKS} AS rtoks FROM documents
    ), pairs AS (
      SELECT cand_id, ref_id, ctoks, rtoks FROM cand JOIN ref ON ref_id = cand_id + 1
    ), cg AS (
      SELECT cand_id, tok, CAST(COUNT(*) AS BIGINT) AS ccnt
      FROM (SELECT cand_id, unnest(ctoks) AS tok FROM pairs) GROUP BY 1, 2
    ), rg AS (
      SELECT ref_id, tok, CAST(COUNT(*) AS BIGINT) AS rcnt
      FROM (SELECT ref_id, unnest(rtoks) AS tok FROM pairs) GROUP BY 1, 2
    ), mt AS (
      SELECT p.cand_id, p.ref_id, CAST(SUM(LEAST(ccnt, rcnt)) AS BIGINT) AS m
      FROM pairs p
      JOIN cg ON cg.cand_id = p.cand_id
      JOIN rg ON rg.ref_id = p.ref_id AND rg.tok = cg.tok
      GROUP BY 1, 2
    ), raw AS (
      SELECT p.cand_id, p.ref_id,
             COALESCE(mt.m, 0) AS m,
             CAST(COALESCE(mt.m, 0) AS DOUBLE) / CAST(len(ctoks) AS DOUBLE) AS praw,
             CAST(COALESCE(mt.m, 0) AS DOUBLE) / CAST(len(rtoks) AS DOUBLE) AS rraw
      FROM pairs p LEFT JOIN mt ON mt.cand_id = p.cand_id AND mt.ref_id = p.ref_id
    )
    SELECT cand_id, ref_id, CAST(m AS BIGINT) AS n_match,
           ROUND(praw, 6) AS rouge1_p, ROUND(rraw, 6) AS rouge1_r,
           CASE WHEN m = 0 THEN 0.0
                ELSE ROUND(2.0 * praw * rraw / (praw + rraw), 6) END AS rouge1_f1
    FROM raw
    """,
    tags=("evaluation", "text", "rouge"),
)
def eval_rouge1_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-1 (clipped unigram precision/recall/F1) between each
    sampled document and its successor — the n-gram overlap score
    summarization/distillation evals report, and the scoring core of
    the memorization screen (eval_ngram_novelty counts novel grams;
    this scores overlap per candidate-reference PAIR with multiplicity
    clipping, the part plain set-Jaccard gets wrong).

    Exactness: clipped match counts are exact integers
    (Σ min(count_cand, count_ref) per token); P/R are single
    divisions, F1 one expression over them — identical both engines.

    Scale shape: token counts shuffle on (doc, token) — bounded by
    corpus token count, the same grain as text_tfidf; pair scoring
    joins per-document count relations, never materializing cross-doc
    token products. At 100 TB pairs come from a shortlist (dedup
    candidates, retrieval output), so the join is shortlist-sized."""
    from serverless_datalake_spark.operators import textops

    d = load_table(spark, sf_dir, "documents")
    toks = textops.tokens(F.col("text"))
    cand = d.where(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("cand_id"), toks.alias("ctoks")
    )
    ref = d.select(F.col("doc_id").alias("ref_id"), toks.alias("rtoks"))
    pairs = cand.join(ref, F.col("ref_id") == F.col("cand_id") + 1)
    cg = (
        pairs.select("cand_id", F.explode("ctoks").alias("tok"))
        .groupBy("cand_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("ccnt"))
    )
    rg = (
        pairs.select("ref_id", F.explode("rtoks").alias("tok"))
        .groupBy("ref_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("rcnt"))
    )
    rg2 = rg.select(
        F.col("ref_id").alias("r_ref_id"), F.col("tok").alias("rtok"), "rcnt"
    )
    mt = (
        pairs.select("cand_id", "ref_id")
        .join(cg, "cand_id")
        .join(rg2, (F.col("ref_id") == F.col("r_ref_id")) & (F.col("tok") == F.col("rtok")))
        .groupBy("cand_id", "ref_id")
        .agg(F.sum(F.least("ccnt", "rcnt")).cast("long").alias("m"))
    )
    raw = (
        pairs.join(mt, ["cand_id", "ref_id"], "left")
        .select(
            "cand_id",
            "ref_id",
            F.coalesce("m", F.lit(0)).alias("m"),
            (
                F.coalesce("m", F.lit(0)).cast("double")
                / F.size("ctoks").cast("double")
            ).alias("praw"),
            (
                F.coalesce("m", F.lit(0)).cast("double")
                / F.size("rtoks").cast("double")
            ).alias("rraw"),
        )
    )
    return raw.select(
        "cand_id",
        "ref_id",
        F.col("m").cast("long").alias("n_match"),
        F.round("praw", 6).alias("rouge1_p"),
        F.round("rraw", 6).alias("rouge1_r"),
        F.when(F.col("m") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.lit(2.0) * F.col("praw") * F.col("rraw")
                / (F.col("praw") + F.col("rraw")),
                6,
            )
        )
        .alias("rouge1_f1"),
    )


# --------------------------------------------------------------------------
# Bradley–Terry preference strengths

_BT_ITERS = 5

_BT_COMPS_SQL = """
    seqd AS (
      SELECT event_type, value,
             LAG(event_type) OVER w AS ptype, LAG(value) OVER w AS pvalue
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), comps AS (
      SELECT CASE WHEN value > pvalue THEN event_type
                  WHEN value < pvalue THEN ptype
                  WHEN event_type < ptype THEN event_type ELSE ptype END AS winner,
             CASE WHEN value > pvalue THEN ptype
                  WHEN value < pvalue THEN event_type
                  WHEN event_type < ptype THEN ptype ELSE event_type END AS loser
      FROM seqd WHERE ptype IS NOT NULL AND ptype <> event_type
    ), wins AS (
      SELECT winner, loser, CAST(COUNT(*) AS BIGINT) AS w FROM comps GROUP BY 1, 2
    ), items AS (
      SELECT item, CAST(ROW_NUMBER() OVER (ORDER BY item) - 1 AS BIGINT) AS idx
      FROM (SELECT winner AS item FROM wins UNION SELECT loser FROM wins)
    ), iwins AS (
      SELECT wi.idx AS i, li.idx AS j, w
      FROM wins JOIN items wi ON wi.item = winner JOIN items li ON li.item = loser
    ), cellw AS (
      SELECT i, CAST(SUM(w) AS BIGINT) AS tw FROM iwins GROUP BY i
    ), nmat AS (
      SELECT i, j, CAST(SUM(w) AS BIGINT) AS nij
      FROM (SELECT i, j, w FROM iwins UNION ALL SELECT j AS i, i AS j, w FROM iwins)
      GROUP BY i, j
    ), mcount AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM items)
"""


def _bt_oracle() -> str:
    step_raw = """
      list_transform(range(0, m), i ->
        list_extract(wv, i + 1) / list_reduce(list_transform(range(0, m), j ->
          CASE WHEN j = i THEN 0.0
               ELSE list_extract(nm, i * m + j + 1)
                    / (list_extract(p, i + 1) + list_extract(p, j + 1)) END),
          (a, b) -> a + b))
    """
    norm = """
      list_transform(praw, x -> x / list_reduce(praw, (a, b) -> a + b))
    """
    iters = []
    # AS MATERIALIZED is load-bearing: DuckDB inlines single-reference
    # CTEs, and each step's two `p` references would then duplicate
    # the entire upstream iteration tree (measured: 49 s for 5 items
    # without the hint, <0.1 s with it).
    for r in range(1, _BT_ITERS + 1):
        iters.append(
            f", it{r}a AS MATERIALIZED (SELECT m, wv, nm, {step_raw} AS praw FROM it{r - 1})"
            f", it{r} AS MATERIALIZED (SELECT m, wv, nm, {norm} AS p FROM it{r}a)"
        )
    return (
        "WITH "
        + _BT_COMPS_SQL
        + f""", cells AS (
      SELECT a.idx AS i, b.idx AS j FROM items a CROSS JOIN items b
    ), nm0 AS (
      SELECT c.i, c.j, COALESCE(n.nij, 0) AS nij
      FROM cells c LEFT JOIN nmat n ON n.i = c.i AND n.j = c.j
    ), mat AS (
      SELECT (SELECT m FROM mcount) AS m,
             (SELECT list(CAST(COALESCE(cw.tw, 0) AS DOUBLE) ORDER BY it.idx)
              FROM items it LEFT JOIN cellw cw ON cw.i = it.idx) AS wv,
             (SELECT list(CAST(nij AS DOUBLE) ORDER BY i * (SELECT m FROM mcount) + j)
              FROM nm0) AS nm
    ), it0 AS MATERIALIZED (
      SELECT m, wv, nm,
             list_transform(range(0, m), i -> 1.0 / CAST(m AS DOUBLE)) AS p
      FROM mat
    )"""
        + "".join(iters)
        + f"""
    SELECT it.item, CAST(COALESCE(cw.tw, 0) AS BIGINT) AS wins,
           ROUND(list_extract((SELECT p FROM it{_BT_ITERS}), it.idx + 1), 6) AS strength
    FROM items it LEFT JOIN cellw cw ON cw.i = it.idx
    """
    )


@query("pref_bradley_terry", oracle=_bt_oracle(), tags=("evaluation", "preference", "rlhf"))
def pref_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley–Terry preference strengths over pairwise comparisons —
    the model RLHF/DPO reward pipelines fit on preference pairs, run
    as a query. Comparisons are synthesized deterministically from the
    event stream (consecutive events of a user: the higher-valued
    event's type wins; value ties break to the lexicographically
    smaller type), then 5 rounds of the Zermelo/Hunter MM update
    p_i ← W_i / Σ_j n_ij/(p_i+p_j), sum-normalized each round.

    Exactness: the wins/pairings matrix is exact integers; each MM
    round's per-item denominator and the normalizer are left-to-right
    folds over index-ordered sequences, so both engines see identical
    doubles (the graph_pagerank discipline applied to an m-item
    fixed point).

    Scale shape: comparisons reduce to an m×m matrix in one window
    pass + one partial-agg shuffle (m = #items, here 5); the fixed
    point then runs on the DRIVER over the collected matrix — at
    100 TB only the comparison extraction scans data, exactly how
    production BT fits work (the reward-model data is big, the item
    matrix is not; scipy on a collected matrix is the normal final
    step). The collect is m²-grain driver metadata (the
    codebook-collect precedent). An all-Spark expression variant was
    tried and rejected: Catalyst's project collapsing duplicates the
    nested fold expression per p-reference, going exponential across
    iterations — the same blowup DuckDB's CTE inlining shows, fixed
    there with AS MATERIALIZED (see _bt_oracle)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seqd = ev.select(
        "event_type",
        "value",
        F.lag("event_type").over(w).alias("ptype"),
        F.lag("value").over(w).alias("pvalue"),
    ).where(F.col("ptype").isNotNull() & (F.col("ptype") != F.col("event_type")))
    winner = (
        F.when(F.col("value") > F.col("pvalue"), F.col("event_type"))
        .when(F.col("value") < F.col("pvalue"), F.col("ptype"))
        .when(F.col("event_type") < F.col("ptype"), F.col("event_type"))
        .otherwise(F.col("ptype"))
    )
    loser = (
        F.when(F.col("value") > F.col("pvalue"), F.col("ptype"))
        .when(F.col("value") < F.col("pvalue"), F.col("event_type"))
        .when(F.col("event_type") < F.col("ptype"), F.col("ptype"))
        .otherwise(F.col("event_type"))
    )
    wins_rows = (
        seqd.select(winner.alias("winner"), loser.alias("loser"))
        .groupBy("winner", "loser")
        .count()
        .collect()
    )
    items = sorted({r["winner"] for r in wins_rows} | {r["loser"] for r in wins_rows})
    m = len(items)
    idx = {it: i for i, it in enumerate(items)}
    wv = [0] * m
    nm = [0] * (m * m)
    for r in wins_rows:
        i, j, cnt = idx[r["winner"]], idx[r["loser"]], int(r["count"])
        wv[i] += cnt
        nm[i * m + j] += cnt
        nm[j * m + i] += cnt
    # MM fixed point in plain Python floats, mirroring the oracle's
    # fold order exactly: per-item denominators and the normalizer
    # accumulate left-to-right over index order (0.0 + t0 == t0 in
    # IEEE, so the init difference vs DuckDB's list_reduce is exact).
    wvf = [float(x) for x in wv]
    nmf = [float(x) for x in nm]
    p = [1.0 / float(m)] * m
    for _ in range(_BT_ITERS):
        praw = []
        for i in range(m):
            acc = 0.0
            for j in range(m):
                if j != i:
                    acc = acc + nmf[i * m + j] / (p[i] + p[j])
            praw.append(wvf[i] / acc)
        s = 0.0
        for x in praw:
            s = s + x
        p = [x / s for x in praw]
    rows = [(it, int(wv[i]), p[i]) for it, i in sorted(idx.items(), key=lambda kv: kv[1])]
    out = spark.createDataFrame(rows, "item string, wins long, strength_raw double")
    return out.select("item", "wins", F.round("strength_raw", 6).alias("strength"))


# --------------------------------------------------------------------------
# nDCG@5 of the ANN systems against exact ground truth

# Discount table 1/log2(r+1), r = 1..5, computed ONCE in Python and
# embedded as identical e9-integer literals in BOTH engines: DCG then
# sums exact integers (rel ∈ {0,1} times a constant), so no
# transcendental evaluation ever happens inside either engine and
# summation order cannot matter.
import math as _math

_NDCG_DISC_E9 = [round(1.0 / _math.log2(r + 1) * 1e9) for r in range(1, 6)]
_NDCG_IDCG_E9 = sum(_NDCG_DISC_E9)


# The ANN systems under evaluation, shared by every retrieval metric
# (nDCG@5 and MRR@5; the recall eval's oracle twin lives in
# llm_similarity). Adding a leg here adds it to every metric at once —
# the round-9 review found the dict duplicated per metric, so a third
# leg would have needed parallel edits.
_ANN_EVAL_LEGS = {
    "lsh_multiprobe": "sim_topk_lsh_multiprobe",
    "ivfpq_rerank": "sim_topk_ivfpq_rerank",
}


def _union_all(parts: list) -> DataFrame:
    res = parts[0]
    for o in parts[1:]:
        res = res.unionAll(o)
    return res


def _ndcg_oracle() -> str:
    from serverless_datalake_spark.queries import REGISTRY

    bf = REGISTRY["sim_topk_bruteforce"].oracle
    legs = {k: REGISTRY[v].oracle for k, v in _ANN_EVAL_LEGS.items()}
    disc = " ".join(
        f"WHEN {r + 1} THEN CAST({d} AS BIGINT)" for r, d in enumerate(_NDCG_DISC_E9)
    )
    per = []
    for name, leg in legs.items():
        per.append(
            f"""
    SELECT '{name}' AS system,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           ROUND(CAST(SUM(ndcg_e6) AS DOUBLE)
                 / (1000000.0 * CAST(COUNT(*) AS DOUBLE)), 6) AS mean_ndcg_at_5
    FROM (
      SELECT q.query_id,
             CAST(ROUND(CAST(SUM(CASE WHEN t.corpus_id IS NOT NULL
                        THEN (CASE c.rank {disc} ELSE 0 END)
                        ELSE CAST(0 AS BIGINT) END) AS DOUBLE)
                  / {_NDCG_IDCG_E9}.0 * 1000000.0, 0) AS BIGINT) AS ndcg_e6
      FROM (SELECT DISTINCT query_id FROM bf) q
      LEFT JOIN ({leg}) c ON c.query_id = q.query_id
      LEFT JOIN bf t ON t.query_id = c.query_id AND t.corpus_id = c.corpus_id
      GROUP BY q.query_id
    )"""
        )
    return f"WITH bf AS ({bf})\n" + "\n    UNION ALL".join(per)


@query("eval_ndcg_at_5", oracle=_ndcg_oracle(), tags=("evaluation", "retrieval", "ndcg"))
def eval_ndcg_at_5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@5 of the ANN probes against exact-cosine ground truth —
    the position-aware companion of sim_recall_eval (recall counts
    hits anywhere in the top-5; nDCG pays more for putting true
    neighbors FIRST, which is what a retrieval-augmented consumer
    experiences). Relevance is binary (pair ∈ exact top-5), the ideal
    DCG is the full-relevance constant, and the discount table
    1/log2(r+1) is precomputed into identical e9-integer literals for
    both engines — DCG accumulates exact integers, so no
    transcendental or float-order concern exists anywhere.

    Scale shape: each leg is the registry query's own plan (≤5 rows
    per query); scoring joins shortlist-sized relations and reduces to
    one row per system. Ground truth comes from a sampled exact leg in
    production, as in sim_recall_eval. The brute-force relation is
    PINNED (lazy localCheckpoint): it feeds four consumers (the
    query-id spine and the truth join, per leg), and unpinned each
    consumer re-ran the full exact-cosine pass — 5.8 s steady at sf0.1
    for a metric whose components sum to ~3 s (the round-8
    branch-point lesson; see stats_kruskal_wallis)."""
    from serverless_datalake_spark.queries import REGISTRY

    bf = (
        REGISTRY["sim_topk_bruteforce"]
        .fn(spark, sf_dir)
        .select(F.col("query_id").alias("tq"), F.col("corpus_id").alias("tc"))
        .transform(_pin)
    )
    disc_map = F.create_map(
        *[x for r, d in enumerate(_NDCG_DISC_E9) for x in (F.lit(r + 1), F.lit(d))]
    )
    outs = []
    for name, qname in sorted(_ANN_EVAL_LEGS.items()):
        cand = REGISTRY[qname].fn(spark, sf_dir).select(
            "query_id", "corpus_id", F.col("rank").cast("int").alias("rank")
        )
        truth = bf.select(F.col("tq").alias("t2q"), F.col("tc").alias("t2c"))
        scored = (
            bf.select("tq").distinct()
            .join(cand, F.col("query_id") == F.col("tq"), "left")
            .join(
                truth,
                (F.col("t2q") == F.col("query_id")) & (F.col("t2c") == F.col("corpus_id")),
                "left",
            )
            .groupBy(F.col("tq"))
            .agg(
                F.round(
                    F.sum(
                        F.when(
                            F.col("t2c").isNotNull(),
                            F.element_at(disc_map, F.col("rank")),
                        ).otherwise(F.lit(0).cast("long"))
                    ).cast("double")
                    / F.lit(float(_NDCG_IDCG_E9))
                    * 1000000.0,
                    0,
                )
                .cast("long")
                .alias("ndcg_e6")
            )
        )
        outs.append(
            scored.agg(
                F.lit(name).alias("system"),
                F.count(F.lit(1)).cast("long").alias("n_queries"),
                F.round(
                    F.sum("ndcg_e6").cast("double")
                    / (F.lit(1000000.0) * F.count(F.lit(1)).cast("double")),
                    6,
                ).alias("mean_ndcg_at_5"),
            ).select("system", "n_queries", "mean_ndcg_at_5")
        )
    return _union_all(outs)


# --------------------------------------------------------------------------
# AUC-ROC via the rank-sum identity

# ONE definition of the scored quality gate (confidence score + binary
# label) shared by the calibration/classification family — AUC, cost
# threshold, Brier, ECE (statistics.py), isotonic. The round-9 review
# counted seven drifting copies of this expression pair; a change to
# the score or the gate now lands everywhere at once (the
# _copurchase_edges / _hourly_obs precedent). `gate` carries the RAW
# double confidence; each consumer quantizes to its own grain (e4
# integer or 4-decimal), so every existing oracle stays bit-identical.
SCORED_GATE_SQL = """
    t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ), gate AS (
      SELECT doc_id,
             (0.5 * (CAST(len(list_distinct(toks)) AS DOUBLE)
                     / GREATEST(len(toks), 1)) + 0.5 * 0.9) AS conf_raw,
             CASE WHEN len(toks) >= 30
                   AND len(list_distinct(toks)) * 2 >= len(toks) THEN 1 ELSE 0 END
               AS label
      FROM t
    )
"""


def scored_gate(d: DataFrame) -> DataFrame:
    """(doc_id, conf_raw DOUBLE, label) — the Spark twin of
    SCORED_GATE_SQL's `gate` CTE. One spelling of the confidence
    expression so the doubles match the oracle bit-for-bit."""
    from serverless_datalake_spark.operators import textops

    toks = textops.tokens(F.col("text"))
    nd = F.size(F.array_distinct(toks))
    n = F.size(toks)
    conf_raw = F.lit(0.5) * (nd.cast("double") / F.greatest(n, F.lit(1))) + F.lit(
        0.5
    ) * F.lit(0.9)
    return d.select(
        "doc_id",
        conf_raw.alias("conf_raw"),
        F.when((n >= 30) & (nd * 2 >= n), 1).otherwise(0).alias("label"),
    )


_AUC_SCORED = f"""{SCORED_GATE_SQL}, scored AS (
      SELECT CAST(ROUND(conf_raw * 10000.0, 0) AS BIGINT) AS v,
             label AS pos
      FROM gate
    )"""


@query(
    "eval_auc_roc",
    oracle=f"""
    WITH {_AUC_SCORED}, vals AS (
      SELECT v, CAST(SUM(pos) AS BIGINT) AS c1,
             CAST(SUM(1 - pos) AS BIGINT) AS c0
      FROM scored GROUP BY v
    ), ranked AS (
      SELECT c1, c0, c1 + c0 AS c,
             CAST(COALESCE(SUM(c1 + c0) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS prev
      FROM vals
    ), sums AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c0) AS BIGINT) AS n0,
             CAST(SUM(c1 * (2 * prev + c + 1)) AS BIGINT) AS r1x2
      FROM ranked
    )
    SELECT n1 AS n_pos, n0 AS n_neg,
           ROUND(CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE)
                 / CAST(2 * n1 * n0 AS DOUBLE), 6) AS auc
    FROM sums
    """,
    tags=("evaluation", "classification", "auc"),
)
def eval_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC-ROC of a scored gate (the ECE query's confidence score vs
    its quality-gate label) via the rank-sum identity
    AUC = (R₁ − n₁(n₁+1)/2) / (n₁n₀) — the threshold-free companion
    of eval_calibration_ece: ECE asks "are the probabilities honest",
    AUC asks "does the score order positives above negatives at all",
    and every scored filter (quality, toxicity, dedup confidence)
    should publish both.

    Exactness: scores round to e4 integers and aggregate to VALUE
    grain; mid-rank tie handling stays integral by doubling (the
    stats_mann_whitney_u device), so AUC is one exact-integer
    division.

    Scale shape: one scan to value-grain counts (≤10001 distinct
    score values — bounded by the e4 rounding, NOT by corpus size),
    one cumulative window over that bounded relation."""
    scored = scored_gate(load_table(spark, sf_dir, "documents")).select(
        F.round(F.col("conf_raw") * 10000.0, 0).cast("long").alias("v"),
        F.col("label").alias("pos"),
    )
    vals = scored.groupBy("v").agg(
        F.sum("pos").cast("long").alias("c1"),
        F.sum(F.lit(1) - F.col("pos")).cast("long").alias("c0"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = vals.select(
        "c1",
        "c0",
        (F.col("c1") + F.col("c0")).alias("c"),
        F.coalesce(F.sum(F.col("c1") + F.col("c0")).over(w), F.lit(0)).cast("long").alias("prev"),
    )
    sums = ranked.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c0").cast("long").alias("n0"),
        F.sum(F.col("c1") * (F.lit(2) * F.col("prev") + F.col("c") + 1))
        .cast("long")
        .alias("r1x2"),
    )
    return sums.select(
        F.col("n1").alias("n_pos"),
        F.col("n0").alias("n_neg"),
        F.round(
            (F.col("r1x2") - F.col("n1") * (F.col("n1") + 1)).cast("double")
            / (F.lit(2) * F.col("n1") * F.col("n0")).cast("double"),
            6,
        ).alias("auc"),
    )


# --------------------------------------------------------------------------
# Per-class precision/recall/F1

@query(
    "eval_confusion_prf",
    oracle=f"""
    WITH rated AS (
      SELECT CASE WHEN n_chars < 250 THEN 0 WHEN n_chars < 400 THEN 1 ELSE 2 END AS truth,
             CASE WHEN {_KAPPA_TOKC} < 45 THEN 0
                  WHEN {_KAPPA_TOKC} < 75 THEN 1 ELSE 2 END AS pred
      FROM documents
    ), per_class AS (
      SELECT c.cls,
             CAST(SUM(CASE WHEN truth = c.cls AND pred = c.cls THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN truth <> c.cls AND pred = c.cls THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(SUM(CASE WHEN truth = c.cls AND pred <> c.cls THEN 1 ELSE 0 END) AS BIGINT) AS fn
      FROM rated CROSS JOIN (SELECT unnest([0, 1, 2]) AS cls) c
      GROUP BY c.cls
    ), raw AS (
      SELECT cls, tp, fp, fn,
             CASE WHEN tp + fp = 0 THEN 0.0
                  ELSE CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS praw,
             CASE WHEN tp + fn = 0 THEN 0.0
                  ELSE CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS rraw
      FROM per_class
    )
    SELECT CAST(cls AS BIGINT) AS cls, tp, fp, fn,
           ROUND(praw, 6) AS precision_, ROUND(rraw, 6) AS recall_,
           CASE WHEN praw + rraw = 0.0 THEN 0.0
                ELSE ROUND(2.0 * praw * rraw / (praw + rraw), 6) END AS f1
    FROM raw
    """,
    tags=("evaluation", "classification", "prf"),
)
def eval_confusion_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall/F1 of the token-count classifier
    against the character-count truth (the stats_cohens_kappa pair
    read as truth vs prediction) — the standard per-class report card
    that kappa's single scalar hides: kappa can look healthy while
    one minority class has terrible recall.

    Exactness: tp/fp/fn are exact integers from one pass; P/R are
    guarded single divisions and F1 one expression over the unrounded
    values, identical both engines.

    Scale shape: one scan, 3-row output; the class expansion is a
    3-row broadcast cross join so all counts share one aggregate."""
    from serverless_datalake_spark.operators import textops

    d = load_table(spark, sf_dir, "documents")
    tokc = F.size(textops.tokens(F.col("text")))
    truth = F.when(F.col("n_chars") < 250, 0).when(F.col("n_chars") < 400, 1).otherwise(2)
    pred = F.when(tokc < 45, 0).when(tokc < 75, 1).otherwise(2)
    rated = d.select(truth.alias("truth"), pred.alias("pred"))
    cls = spark.range(3).select(F.col("id").cast("int").alias("cls"))
    per_class = (
        rated.crossJoin(F.broadcast(cls))
        .groupBy("cls")
        .agg(
            F.sum(
                F.when((F.col("truth") == F.col("cls")) & (F.col("pred") == F.col("cls")), 1).otherwise(0)
            ).cast("long").alias("tp"),
            F.sum(
                F.when((F.col("truth") != F.col("cls")) & (F.col("pred") == F.col("cls")), 1).otherwise(0)
            ).cast("long").alias("fp"),
            F.sum(
                F.when((F.col("truth") == F.col("cls")) & (F.col("pred") != F.col("cls")), 1).otherwise(0)
            ).cast("long").alias("fn"),
        )
    )
    raw = per_class.select(
        "cls",
        "tp",
        "fp",
        "fn",
        F.when(F.col("tp") + F.col("fp") == 0, F.lit(0.0))
        .otherwise(F.col("tp").cast("double") / (F.col("tp") + F.col("fp")).cast("double"))
        .alias("praw"),
        F.when(F.col("tp") + F.col("fn") == 0, F.lit(0.0))
        .otherwise(F.col("tp").cast("double") / (F.col("tp") + F.col("fn")).cast("double"))
        .alias("rraw"),
    )
    return raw.select(
        F.col("cls").cast("long").alias("cls"),
        "tp",
        "fp",
        "fn",
        F.round("praw", 6).alias("precision_"),
        F.round("rraw", 6).alias("recall_"),
        F.when(F.col("praw") + F.col("rraw") == 0.0, F.lit(0.0))
        .otherwise(F.round(F.lit(2.0) * F.col("praw") * F.col("rraw") / (F.col("praw") + F.col("rraw")), 6))
        .alias("f1"),
    )


# --------------------------------------------------------------------------
# Brier score with Murphy decomposition

@query(
    "eval_brier_decomposition",
    oracle=f"""
    WITH {SCORED_GATE_SQL}, scored AS (
      SELECT CAST(ROUND(conf_raw * 10000.0, 0) AS BIGINT) AS conf_e4, label
      FROM gate
    ), binned AS (
      SELECT LEAST(CAST(FLOOR(CAST(conf_e4 AS DOUBLE) / 1000.0) AS BIGINT), 9) AS bin,
             conf_e4, label
      FROM scored
    ), cells AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(conf_e4) AS BIGINT) AS s_conf,
             CAST(SUM(label) AS BIGINT) AS n_pos,
             CAST(SUM(CAST(conf_e4 AS HUGEINT) * CAST(conf_e4 AS HUGEINT)) AS HUGEINT)
               AS s_conf2,
             CAST(SUM(CAST(conf_e4 AS HUGEINT) * CAST(label AS HUGEINT)) AS HUGEINT)
               AS s_cl
      FROM binned GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(n_pos) AS BIGINT) AS pt,
             CAST(SUM(s_conf2) AS HUGEINT) AS c2t,
             CAST(SUM(s_conf) AS HUGEINT) AS ct,
             CAST(SUM(s_cl) AS HUGEINT) AS clt
      FROM cells
    ), reso AS (
      -- resolution = sum_b n_b (o_b - o)^2 / N; reliability =
      -- sum_b n_b (p_b - o_b)^2 / N, both from exact cell sums
      SELECT ROUND(CAST(SUM(CAST(c.n AS DOUBLE)
                 * POW(CAST(c.n_pos AS DOUBLE) / CAST(c.n AS DOUBLE)
                       - CAST(t.pt AS DOUBLE) / CAST(t.nt AS DOUBLE), 2)) AS DOUBLE)
                 / CAST(MAX(t.nt) AS DOUBLE), 6) AS resolution,
             ROUND(CAST(SUM(CAST(c.n AS DOUBLE)
                 * POW(CAST(c.s_conf AS DOUBLE) / CAST(c.n AS DOUBLE) / 10000.0
                       - CAST(c.n_pos AS DOUBLE) / CAST(c.n AS DOUBLE), 2)) AS DOUBLE)
                 / CAST(MAX(t.nt) AS DOUBLE), 6) AS reliability
      FROM cells c CROSS JOIN tot t
    )
    SELECT t.nt AS n_items,
           ROUND((CAST(t.c2t AS DOUBLE) - 2.0 * 10000.0 * CAST(t.clt AS DOUBLE)
                  + 100000000.0 * CAST(t.pt AS DOUBLE))
                 / (100000000.0 * CAST(t.nt AS DOUBLE)), 6) AS brier,
           ROUND(CAST(t.pt AS DOUBLE) / CAST(t.nt AS DOUBLE)
                 * (1.0 - CAST(t.pt AS DOUBLE) / CAST(t.nt AS DOUBLE)), 6)
             AS uncertainty,
           r.resolution, r.reliability
    FROM tot t CROSS JOIN reso r
    """,
    tags=("evaluation", "calibration", "brier"),
)
def eval_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score with the Murphy decomposition (uncertainty −
    resolution + reliability, binned): the mean-squared companion of
    eval_calibration_ece — ECE reports the reliability GAP per bin,
    Brier folds sharpness and calibration into one proper scoring
    rule, and the decomposition says whether a bad score comes from
    an uninformative scorer (low resolution) or a miscalibrated one
    (high reliability term).

    Exactness: confidences are e4 integers; Σp², Σp·y accumulate as
    HUGEINT/DECIMAL(38,0) exact sums; the decomposition terms are
    spelled identically from exact cell sums (the POW(x,2) operands
    are identical doubles in both engines).

    Scale shape: one scan to 10 cell rows + exact integer totals —
    constant-size everything after the first aggregate."""
    d38 = "decimal(38,0)"
    scored = scored_gate(load_table(spark, sf_dir, "documents")).select(
        F.round(F.col("conf_raw") * 10000.0, 0).cast("long").alias("conf_e4"),
        "label",
    )
    binned = scored.select(
        F.least(F.floor(F.col("conf_e4").cast("double") / 1000.0).cast("long"), F.lit(9).cast("long")).alias("bin"),
        "conf_e4",
        "label",
    )
    cells = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("conf_e4").cast("long").alias("s_conf"),
        F.sum("label").cast("long").alias("n_pos"),
        F.sum((F.col("conf_e4").cast(d38) * F.col("conf_e4").cast(d38))).alias("s_conf2"),
        F.sum((F.col("conf_e4").cast(d38) * F.col("label").cast(d38))).alias("s_cl"),
    )
    tot = cells.agg(
        F.sum("n").cast("long").alias("nt"),
        F.sum("n_pos").cast("long").alias("pt"),
        F.sum("s_conf2").alias("c2t"),
        F.sum("s_conf").alias("ct"),
        F.sum("s_cl").alias("clt"),
    )
    base = F.col("pt").cast("double") / F.col("nt").cast("double")
    reso = cells.crossJoin(F.broadcast(tot)).agg(
        F.round(
            F.sum(
                F.col("n").cast("double")
                * F.pow(
                    F.col("n_pos").cast("double") / F.col("n").cast("double")
                    - F.col("pt").cast("double") / F.col("nt").cast("double"),
                    2,
                )
            )
            / F.max("nt").cast("double"),
            6,
        ).alias("resolution"),
        F.round(
            F.sum(
                F.col("n").cast("double")
                * F.pow(
                    F.col("s_conf").cast("double") / F.col("n").cast("double") / 10000.0
                    - F.col("n_pos").cast("double") / F.col("n").cast("double"),
                    2,
                )
            )
            / F.max("nt").cast("double"),
            6,
        ).alias("reliability"),
    )
    return tot.crossJoin(F.broadcast(reso)).select(
        F.col("nt").alias("n_items"),
        F.round(
            (
                F.col("c2t").cast("double")
                - F.lit(2.0) * F.lit(10000.0) * F.col("clt").cast("double")
                + F.lit(100000000.0) * F.col("pt").cast("double")
            )
            / (F.lit(100000000.0) * F.col("nt").cast("double")),
            6,
        ).alias("brier"),
        F.round(base * (F.lit(1.0) - base), 6).alias("uncertainty"),
        "resolution",
        "reliability",
    )


# --------------------------------------------------------------------------
# Cost-optimal decision threshold

_COST_FP = 1  # keeping a bad document
_COST_FN = 4  # discarding a good one — asymmetric, the curation frame


@query(
    "eval_cost_threshold",
    oracle=f"""
    WITH {_AUC_SCORED}, vals AS (
      SELECT v, CAST(SUM(pos) AS BIGINT) AS c1,
             CAST(SUM(1 - pos) AS BIGINT) AS c0
      FROM scored GROUP BY v
    ), tot AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS p, CAST(SUM(c0) AS BIGINT) AS ng FROM vals
    ), sweep AS (
      -- predict positive iff score >= v: FP = negatives at/above v,
      -- FN = positives below v (cumulative from the value grain)
      SELECT v,
             CAST(tot.ng - COALESCE(SUM(c0) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS fp,
             CAST(COALESCE(SUM(c1) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS fn
      FROM vals CROSS JOIN tot
    ), costed AS (
      SELECT v, fp, fn, {_COST_FP} * fp + {_COST_FN} * fn AS cost
      FROM sweep
    ), best AS (
      SELECT v, fp, fn, CAST(cost AS BIGINT) AS cost
      FROM costed ORDER BY cost, v LIMIT 1
    )
    SELECT b.v AS threshold_e4, b.fp, b.fn, b.cost,
           CAST({_COST_FP} * t.ng AS BIGINT) AS cost_accept_all,
           CAST({_COST_FN} * t.p AS BIGINT) AS cost_reject_all
    FROM best b CROSS JOIN tot t
    """,
    tags=("evaluation", "classification", "threshold"),
)
def eval_cost_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-optimal operating point for the scored gate: sweep every
    candidate threshold (the distinct score values) and pick the one
    minimizing FP·1 + FN·4 — the asymmetric-cost version of the
    decision every filter must make (here a discarded good document
    costs 4× a kept bad one). Reported against the two trivial
    policies (accept-all / reject-all) so the table shows what the
    scorer actually buys.

    Exactness: the whole sweep is exact integers — cumulative counts
    over the e4-value grain, an integer cost, a deterministic
    (cost, threshold) argmin.

    Scale shape: value-grain relation (≤10001 rows) + one cumulative
    window + a 1-row argmin; corpus size only affects the first
    scan."""
    scored = scored_gate(load_table(spark, sf_dir, "documents")).select(
        F.round(F.col("conf_raw") * 10000.0, 0).cast("long").alias("v"),
        F.col("label").alias("pos"),
    )
    vals = scored.groupBy("v").agg(
        F.sum("pos").cast("long").alias("c1"),
        F.sum(F.lit(1) - F.col("pos")).cast("long").alias("c0"),
    )
    tot = vals.agg(
        F.sum("c1").cast("long").alias("p"), F.sum("c0").cast("long").alias("ng")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    sweep = vals.crossJoin(F.broadcast(tot)).select(
        "v",
        (F.col("ng") - F.coalesce(F.sum("c0").over(w), F.lit(0))).cast("long").alias("fp"),
        F.coalesce(F.sum("c1").over(w), F.lit(0)).cast("long").alias("fn"),
    )
    costed = sweep.select(
        "v", "fp", "fn",
        (F.lit(_COST_FP) * F.col("fp") + F.lit(_COST_FN) * F.col("fn")).cast("long").alias("cost"),
    )
    best = costed.orderBy("cost", "v").limit(1)
    return best.crossJoin(F.broadcast(tot)).select(
        F.col("v").alias("threshold_e4"),
        "fp",
        "fn",
        "cost",
        (F.lit(_COST_FP) * F.col("ng")).cast("long").alias("cost_accept_all"),
        (F.lit(_COST_FN) * F.col("p")).cast("long").alias("cost_reject_all"),
    )


# --------------------------------------------------------------------------
# Logistic-regression quality-model fitting (in-plane ML)

_LR_STEPS = 100
_LR_ETA = "2.0"
# Hard cap on the driver-collected training sample: the modulo filter
# selects a FRACTION of the corpus (unbounded at 100 TB); the
# hash-ordered LIMIT makes the collected set constant-size.
_LR_CAP = 4096


def _logreg_oracle() -> str:
    sample = f"""
    WITH cap AS (
      -- constant-size training set: hash-ordered LIMIT caps the
      -- collected sample at {_LR_CAP} rows regardless of corpus size
      -- (a modulo filter alone is a FRACTION, not a bound)
      SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT {_LR_CAP}
    ), t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM cap
    ), feat0 AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 30
                   AND len(list_distinct(toks)) * 2 >= len(toks)
                  THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS y,
             ROUND((CAST(len(list_distinct(toks)) AS DOUBLE)
                    / GREATEST(len(toks), 1) - 0.5) * 10.0, 8) AS x1,
             ROUND((CAST(len(toks) AS DOUBLE) - 30.0) / 20.0, 8) AS x2
      FROM t
    ), feat AS (
      -- x3 = threshold-violation depth: how far BELOW either gate
      -- margin the doc sits (0 when both satisfied) — linearizes the
      -- AND boundary a plain linear model cannot express
      SELECT doc_id, y, x1, x2,
             ROUND(LEAST(x1, 0.0) + LEAST(x2, 0.0), 8) AS x3
      FROM feat0
    ), sl AS MATERIALIZED (
      SELECT list(struct_pack(y := y, x1 := x1, x2 := x2, x3 := x3)
                  ORDER BY doc_id) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM feat
    ), it0 AS MATERIALIZED (
      SELECT s, n, CAST(0.0 AS DOUBLE) AS t0, CAST(0.0 AS DOUBLE) AS t1,
             CAST(0.0 AS DOUBLE) AS t2, CAST(0.0 AS DOUBLE) AS t3 FROM sl
    )"""

    def grad(xj: str) -> str:
        # raw doubles throughout: the Spark side fits in CPython, and
        # CPython and DuckDB share the platform libm, so exp() and the
        # ordered fold reproduce the identical trajectory bit-for-bit
        # — per-step ROUND guards would cost megabytes of rewritten
        # oracle SQL (the round-mimic expands ~20x and nests) for no
        # additional determinism.
        return (
            f"list_reduce(list_transform(s, r -> "
            f"{xj} * (r.y - 1.0 / (1.0 + exp(-(t0 + t1 * r.x1 + t2 * r.x2 + t3 * r.x3))))), "
            f"(a, b) -> a + b)"
        )

    iters = []
    for k in range(1, _LR_STEPS + 1):
        iters.append(
            f""", it{k} AS MATERIALIZED (
      SELECT s, n,
             t0 + {_LR_ETA} * {grad('1.0')} / CAST(n AS DOUBLE) AS t0,
             t1 + {_LR_ETA} * {grad('r.x1')} / CAST(n AS DOUBLE) AS t1,
             t2 + {_LR_ETA} * {grad('r.x2')} / CAST(n AS DOUBLE) AS t2,
             t3 + {_LR_ETA} * {grad('r.x3')} / CAST(n AS DOUBLE) AS t3
      FROM it{k - 1}
    )"""
        )
    acc = (
        "list_reduce(list_transform(s, r -> CASE WHEN "
        "(CASE WHEN 1.0 / (1.0 + exp(-(t0 + t1 * r.x1 + t2 * r.x2 + t3 * r.x3))) >= 0.5 "
        "THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END) = r.y "
        "THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END), (a, b) -> a + b)"
    )
    return (
        sample
        + "".join(iters)
        + f"""
    SELECT n AS n_train,
           ROUND(t0, 6) AS theta0, ROUND(t1, 6) AS theta1, ROUND(t2, 6) AS theta2,
           ROUND(t3, 6) AS theta3,
           ROUND({acc} / CAST(n AS DOUBLE), 6) AS train_acc
    FROM it{_LR_STEPS}
    """
    )


@query("model_logreg_quality_fit", oracle=_logreg_oracle(),
       tags=("evaluation", "model", "logistic-regression"))
def model_logreg_quality_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-CLASSIFIER TRAINING in the data plane: logistic
    regression (bias + centered diversity + centered length + a
    threshold-violation depth feature that linearizes the gate's AND
    boundary) fit to the quality-gate label with 100 deterministic
    full-batch gradient steps on a deterministic sample: doc_id % 5
    pre-filter, then a HASH-ORDERED LIMIT (_LR_CAP = 4096) so the
    collected set is CONSTANT-SIZE at any corpus scale — the
    fastText-style pattern where the platform trains its own gate
    instead of importing scores. Reports θ and training accuracy; the
    learned θ deploys as a pure projection (the text_quality_model
    serving path).

    Exactness: the fit runs DRIVER-SIDE in Python over the collected
    sample — deliberately: CPython and DuckDB share the platform
    libm, so exp() and the doc_id-ordered gradient folds reproduce
    the identical raw-double trajectory bit-for-bit (a JVM-side fold
    would reopen the 1-ulp StrictMath/libm gap, which an ITERATED fit
    amplifies); only the outputs round (at 6). Features round at 8 on
    the distributed side before collection, so the collected doubles
    are the oracle's exactly.

    Scale shape: feature extraction is the distributed part (one
    scan); the collected sample is capped at _LR_CAP rows by a
    TakeOrdered over md5(doc_id) (constant driver memory at any
    corpus size), the fit is O(cap × steps) driver-side, and SERVING
    the model is map-only."""
    import math

    from serverless_datalake_spark.operators import textops

    d = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 5 == 0)
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .limit(_LR_CAP)
    )
    toks = textops.tokens(F.col("text"))
    nd = F.size(F.array_distinct(toks))
    n = F.size(toks)
    feat = d.select(
        "doc_id",
        F.when((n >= 30) & (nd * 2 >= n), 1.0).otherwise(0.0).alias("y"),
        F.round(
            (nd.cast("double") / F.greatest(n, F.lit(1)) - F.lit(0.5)) * 10.0, 8
        ).alias("x1"),
        F.round((n.cast("double") - 30.0) / 20.0, 8).alias("x2"),
    ).select(
        "doc_id", "y", "x1", "x2",
        F.round(F.least(F.col("x1"), F.lit(0.0)) + F.least(F.col("x2"), F.lit(0.0)), 8).alias("x3"),
    )
    rows = [
        (r["y"], r["x1"], r["x2"], r["x3"]) for r in feat.orderBy("doc_id").collect()
    ]
    nn = len(rows)
    th = [0.0, 0.0, 0.0, 0.0]
    eta = float(_LR_ETA)
    for _ in range(_LR_STEPS):
        g = [0.0, 0.0, 0.0, 0.0]
        for y, x1, x2, x3 in rows:
            sig = 1.0 / (1.0 + math.exp(-(th[0] + th[1] * x1 + th[2] * x2 + th[3] * x3)))
            for j, xv in enumerate((1.0, x1, x2, x3)):
                g[j] = g[j] + xv * (y - sig)
        for j in range(4):
            th[j] = th[j] + eta * g[j] / nn
    acc = 0.0
    for y, x1, x2, x3 in rows:
        sig = 1.0 / (1.0 + math.exp(-(th[0] + th[1] * x1 + th[2] * x2 + th[3] * x3)))
        acc = acc + (1.0 if (1.0 if sig >= 0.5 else 0.0) == y else 0.0)
    out = spark.createDataFrame(
        [(nn, th[0], th[1], th[2], th[3], acc / nn)],
        "n_train long, th0 double, th1 double, th2 double, th3 double, acc double",
    )
    return out.select(
        "n_train",
        F.round("th0", 6).alias("theta0"),
        F.round("th1", 6).alias("theta1"),
        F.round("th2", 6).alias("theta2"),
        F.round("th3", 6).alias("theta3"),
        F.round("acc", 6).alias("train_acc"),
    )


def _logreg_serve_oracle() -> str:
    fit = _logreg_oracle()
    return f"""
    WITH fitted AS ({fit}), ft0 AS (
      SELECT source,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ), ft AS (
      SELECT source,
             ROUND((CAST(len(list_distinct(toks)) AS DOUBLE)
                    / GREATEST(len(toks), 1) - 0.5) * 10.0, 8) AS x1,
             ROUND((CAST(len(toks) AS DOUBLE) - 30.0) / 20.0, 8) AS x2
      FROM ft0
    ), scored AS (
      SELECT ft.source,
             CASE WHEN f.theta0 + f.theta1 * ft.x1 + f.theta2 * ft.x2
                  + f.theta3 * ROUND(LEAST(ft.x1, 0.0) + LEAST(ft.x2, 0.0), 8)
                  >= 0.0 THEN 1 ELSE 0 END AS accept
      FROM ft CROSS JOIN fitted f
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(accept) AS BIGINT) AS n_accepted,
           ROUND(CAST(SUM(accept) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
             AS accept_rate
    FROM scored GROUP BY source
    """


@query("model_logreg_quality_serve", oracle=_logreg_serve_oracle(),
       tags=("evaluation", "model", "serving"))
def model_logreg_quality_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SERVING the trained quality model over the full corpus: the
    fitted θ (model_logreg_quality_fit, rounded at 6 — the deployed
    artifact) scores every document as a pure projection, and the
    accept decision uses the SIGN of the linear score (σ(z) ≥ 0.5 ⟺
    z ≥ 0), so no transcendental is ever evaluated in the serving
    path — the decision is exact IEEE arithmetic on identical doubles
    in both engines. Output is the per-source accept-rate table a
    curation dashboard watches after a model rollout.

    Scale shape: train on a sample driver-side (the fit query), ship
    θ as 4 literals, serve as a map-only scan — the canonical
    train-small/serve-everywhere split, with zero shuffle in the
    serving pass beyond the source rollup."""
    from serverless_datalake_spark.operators import textops
    from serverless_datalake_spark.queries import REGISTRY

    fitted = REGISTRY["model_logreg_quality_fit"].fn(spark, sf_dir).collect()[0]
    th0, th1, th2, th3 = (
        fitted["theta0"], fitted["theta1"], fitted["theta2"], fitted["theta3"]
    )
    d = load_table(spark, sf_dir, "documents")
    toks = textops.tokens(F.col("text"))
    nd = F.size(F.array_distinct(toks))
    n = F.size(toks)
    x1 = F.round((nd.cast("double") / F.greatest(n, F.lit(1)) - F.lit(0.5)) * 10.0, 8)
    x2 = F.round((n.cast("double") - 30.0) / 20.0, 8)
    x3 = F.round(F.least(x1, F.lit(0.0)) + F.least(x2, F.lit(0.0)), 8)
    z = F.lit(th0) + F.lit(th1) * x1 + F.lit(th2) * x2 + F.lit(th3) * x3
    scored = d.select("source", F.when(z >= 0.0, 1).otherwise(0).alias("accept"))
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("accept").cast("long").alias("n_accepted"),
        F.round(
            F.sum("accept").cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("accept_rate"),
    )


@query(
    "model_decision_stump_fit",
    oracle="""
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ), feat AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 30
                   AND len(list_distinct(toks)) * 2 >= len(toks)
                  THEN 1 ELSE 0 END AS y,
             CAST(ROUND(CAST(len(list_distinct(toks)) AS DOUBLE)
                        / GREATEST(len(toks), 1) * 10000.0, 0) AS BIGINT)
               AS f_ratio_e4,
             CAST(len(toks) AS BIGINT) AS f_len
      FROM t
    ), melted AS (
      SELECT 'ratio_e4' AS feature, f_ratio_e4 AS v, y FROM feat
      UNION ALL
      SELECT 'len' AS feature, f_len AS v, y FROM feat
    ), vals AS (
      SELECT feature, v,
             CAST(SUM(y) AS BIGINT) AS c1,
             CAST(COUNT(*) - SUM(y) AS BIGINT) AS c0
      FROM melted GROUP BY 1, 2
    ), cum AS (
      SELECT feature, v,
             CAST(SUM(c1) OVER (PARTITION BY feature ORDER BY v
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS l1,
             CAST(SUM(c0) OVER (PARTITION BY feature ORDER BY v
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS l0,
             CAST(SUM(c1) OVER (PARTITION BY feature) AS BIGINT) AS t1,
             CAST(SUM(c0) OVER (PARTITION BY feature) AS BIGINT) AS t0
      FROM vals
    ), scored AS (
      SELECT feature, v, l1, l0, t1 - l1 AS r1, t0 - l0 AS r0, t1, t0,
             (CAST(l1 + l0 AS DOUBLE)
                * (1.0 - (CAST(l1 AS DOUBLE) / CAST(l1 + l0 AS DOUBLE))
                           * (CAST(l1 AS DOUBLE) / CAST(l1 + l0 AS DOUBLE))
                        - (CAST(l0 AS DOUBLE) / CAST(l1 + l0 AS DOUBLE))
                           * (CAST(l0 AS DOUBLE) / CAST(l1 + l0 AS DOUBLE)))
              + CAST(t1 - l1 + t0 - l0 AS DOUBLE)
                * (1.0 - (CAST(t1 - l1 AS DOUBLE) / CAST(t1 - l1 + t0 - l0 AS DOUBLE))
                           * (CAST(t1 - l1 AS DOUBLE) / CAST(t1 - l1 + t0 - l0 AS DOUBLE))
                        - (CAST(t0 - l0 AS DOUBLE) / CAST(t1 - l1 + t0 - l0 AS DOUBLE))
                           * (CAST(t0 - l0 AS DOUBLE) / CAST(t1 - l1 + t0 - l0 AS DOUBLE))))
             / CAST(t1 + t0 AS DOUBLE) AS wgini
      FROM cum
      WHERE l1 + l0 > 0 AND t1 - l1 + t0 - l0 > 0
    )
    SELECT feature, v AS threshold, l1 + l0 AS n_left, r1 + r0 AS n_right,
           ROUND(wgini, 6) AS weighted_gini,
           ROUND(1.0 - (CAST(t1 AS DOUBLE) / CAST(t1 + t0 AS DOUBLE))
                         * (CAST(t1 AS DOUBLE) / CAST(t1 + t0 AS DOUBLE))
                     - (CAST(t0 AS DOUBLE) / CAST(t1 + t0 AS DOUBLE))
                         * (CAST(t0 AS DOUBLE) / CAST(t1 + t0 AS DOUBLE)), 6)
             AS root_gini
    FROM scored
    ORDER BY wgini, feature, v
    LIMIT 1
    """,
    tags=("evaluation", "model", "decision-tree"),
)
def model_decision_stump_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-STUMP training fully IN the data plane: the exact
    best (feature, threshold) split by weighted Gini impurity over
    every candidate threshold of every feature — the CART inner loop,
    run distributed (contrast model_logreg_quality_fit, whose
    iterative fit is deliberately driver-side). The classic at-scale
    trick: per-feature value histograms + ONE prefix-sum window turn
    the O(features × thresholds × rows) naive sweep into
    O(features × distinct-values) after a single count shuffle — the
    same histogram-split structure XGBoost/LightGBM use per node.

    Exactness: split scores derive from exact integer class counts;
    both engines evaluate the identical Gini expression, and the
    (gini, feature, threshold) tie-break makes the argmin total.

    Scale shape: one scan → (feature, value, class-counts) partial
    agg; cumulative windows run per feature over DISTINCT VALUES
    (bounded by the e4 quantization, not row count); the argmin is a
    TakeOrdered(1). Deepening to a tree = re-running per node on
    filtered partitions."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    nt = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    feat = d.select(
        F.when((nt >= 30) & (nd * 2 >= nt), 1).otherwise(0).alias("y"),
        F.round(nd.cast("double") / F.greatest(nt, F.lit(1)) * 10000.0, 0)
        .cast("long")
        .alias("f_ratio_e4"),
        nt.cast("long").alias("f_len"),
    )
    melted = feat.select(
        F.lit("ratio_e4").alias("feature"), F.col("f_ratio_e4").alias("v"), "y"
    ).unionAll(
        feat.select(F.lit("len").alias("feature"), F.col("f_len").alias("v"), "y")
    )
    vals = melted.groupBy("feature", "v").agg(
        F.sum("y").cast("long").alias("c1"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("c0"),
    )
    cw = (
        Window.partitionBy("feature")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fw = Window.partitionBy("feature")
    cum = vals.select(
        "feature",
        "v",
        F.sum("c1").over(cw).cast("long").alias("l1"),
        F.sum("c0").over(cw).cast("long").alias("l0"),
        F.sum("c1").over(fw).cast("long").alias("t1"),
        F.sum("c0").over(fw).cast("long").alias("t0"),
    )
    nl = (F.col("l1") + F.col("l0")).cast("double")
    r1 = F.col("t1") - F.col("l1")
    r0 = F.col("t0") - F.col("l0")
    nr = (r1 + r0).cast("double")
    n = (F.col("t1") + F.col("t0")).cast("double")
    p1l = F.col("l1").cast("double") / nl
    p0l = F.col("l0").cast("double") / nl
    p1r = r1.cast("double") / nr
    p0r = r0.cast("double") / nr
    wgini = (
        nl * (F.lit(1.0) - p1l * p1l - p0l * p0l)
        + nr * (F.lit(1.0) - p1r * p1r - p0r * p0r)
    ) / n
    p1 = F.col("t1").cast("double") / n
    p0 = F.col("t0").cast("double") / n
    scored = cum.where((F.col("l1") + F.col("l0") > 0) & (r1 + r0 > 0)).select(
        "feature",
        F.col("v").alias("threshold"),
        (F.col("l1") + F.col("l0")).alias("n_left"),
        (r1 + r0).alias("n_right"),
        wgini.alias("wgini"),
        (F.lit(1.0) - p1 * p1 - p0 * p0).alias("rgini"),
    )
    return (
        scored.orderBy("wgini", "feature", "threshold")
        .limit(1)
        .select(
            "feature",
            "threshold",
            "n_left",
            "n_right",
            F.round("wgini", 6).alias("weighted_gini"),
            F.round("rgini", 6).alias("root_gini"),
        )
    )


@query(
    "eval_mcnemar_paired",
    oracle="""
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ), preds AS (
      SELECT CASE WHEN len(toks) >= 30
                   AND len(list_distinct(toks)) * 2 >= len(toks)
                  THEN 1 ELSE 0 END AS y,
             CASE WHEN len(list_distinct(toks)) * 2 >= len(toks)
                  THEN 1 ELSE 0 END AS pred_a,
             CASE WHEN len(toks) >= 30 THEN 1 ELSE 0 END AS pred_b
      FROM t
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN pred_a = y AND pred_b <> y THEN 1 ELSE 0 END)
                AS BIGINT) AS b_only_a_right,
           CAST(SUM(CASE WHEN pred_a <> y AND pred_b = y THEN 1 ELSE 0 END)
                AS BIGINT) AS c_only_b_right,
           ROUND(CASE WHEN SUM(CASE WHEN pred_a <> pred_b THEN 1 ELSE 0 END) = 0
                      THEN 0.0
                      ELSE (ABS(CAST(SUM(CASE WHEN pred_a = y AND pred_b <> y
                                              THEN 1 ELSE 0 END) AS DOUBLE)
                                - CAST(SUM(CASE WHEN pred_a <> y AND pred_b = y
                                                THEN 1 ELSE 0 END) AS DOUBLE))
                            - 1.0)
                           * (ABS(CAST(SUM(CASE WHEN pred_a = y AND pred_b <> y
                                               THEN 1 ELSE 0 END) AS DOUBLE)
                                  - CAST(SUM(CASE WHEN pred_a <> y AND pred_b = y
                                                  THEN 1 ELSE 0 END) AS DOUBLE))
                              - 1.0)
                           / (CAST(SUM(CASE WHEN pred_a = y AND pred_b <> y
                                            THEN 1 ELSE 0 END) AS DOUBLE)
                              + CAST(SUM(CASE WHEN pred_a <> y AND pred_b = y
                                              THEN 1 ELSE 0 END) AS DOUBLE))
                 END, 6) AS chi2_cc
    FROM preds
    """,
    tags=("evaluation", "hypothesis-test"),
)
def eval_mcnemar_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test for comparing two classifiers on the
    SAME examples — the correct test when model A and model B score
    identical rows (two independent proportions would double-count
    the shared examples). Only the discordant pair counts matter:
    b = A right where B wrong, c = B right where A wrong;
    continuity-corrected statistic (|b−c|−1)²/(b+c). Here the rivals
    are the two halves of the quality gate (diversity-only vs
    length-only), judged against the full gate's label.

    Exactness: pure integer counts into one fixed double expression;
    degenerate b+c=0 emits 0 rather than NaN.

    Scale shape: single scan, map-side predicate evaluation, ONE
    scalar aggregate — no shuffle beyond the final reduce. The
    model-comparison gate a 100 TB eval harness runs cheapest."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    nt = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    preds = d.select(
        F.when((nt >= 30) & (nd * 2 >= nt), 1).otherwise(0).alias("y"),
        F.when(nd * 2 >= nt, 1).otherwise(0).alias("pred_a"),
        F.when(nt >= 30, 1).otherwise(0).alias("pred_b"),
    )
    b = F.sum(
        F.when((F.col("pred_a") == F.col("y")) & (F.col("pred_b") != F.col("y")), 1).otherwise(0)
    )
    c = F.sum(
        F.when((F.col("pred_a") != F.col("y")) & (F.col("pred_b") == F.col("y")), 1).otherwise(0)
    )
    disc = F.sum(F.when(F.col("pred_a") != F.col("pred_b"), 1).otherwise(0))
    bd = b.cast("double")
    cd = c.cast("double")
    chi2 = F.when(disc == 0, F.lit(0.0)).otherwise(
        (F.abs(bd - cd) - 1.0) * (F.abs(bd - cd) - 1.0) / (bd + cd)
    )
    return preds.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        b.cast("long").alias("b_only_a_right"),
        c.cast("long").alias("c_only_b_right"),
        F.round(chi2, 6).alias("chi2_cc"),
    )


# --------------------------------------------------------------------------
# Multinomial naive Bayes language classifier — trained IN-PLANE with
# aggregate-grain parameters (contrast: model_logreg_quality_fit
# collects a bounded sample for its sequential GD loop; NB's
# sufficient statistics ARE group-by counts, so training is fully
# distributed at any corpus size)


@query(
    "model_naive_bayes_langid",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang AS true_lang,
             unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
      FROM documents
    ), lt AS (
      SELECT true_lang AS lang, t, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok GROUP BY 1, 2
    ), nl AS (
      SELECT lang, CAST(SUM(c) AS BIGINT) AS n_l FROM lt GROUP BY 1
    ), vocab AS (
      SELECT DISTINCT t FROM tok
    ), vv AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab
    ), lm AS (
      SELECT vocab.t, nl.lang,
             ROUND(ln((CAST(COALESCE(lt.c, 0) AS DOUBLE) + 1.0)
                      / (CAST(nl.n_l AS DOUBLE) + CAST(vv.v AS DOUBLE))), 8) AS ll
      FROM vocab CROSS JOIN nl CROSS JOIN vv
      LEFT JOIN lt ON lt.t = vocab.t AND lt.lang = nl.lang
    ), pri AS (
      SELECT lang,
             ROUND(ln(CAST(nd AS DOUBLE)
                      / CAST(SUM(nd) OVER () AS DOUBLE)), 8) AS lp
      FROM (SELECT lang, CAST(COUNT(*) AS BIGINT) AS nd
            FROM documents GROUP BY 1)
    ), dt AS (
      SELECT doc_id, true_lang, t, CAST(COUNT(*) AS BIGINT) AS k
      FROM tok GROUP BY 1, 2, 3
    ), contrib AS (
      SELECT dt.doc_id, dt.true_lang, lm.lang AS cand_lang, dt.t,
             CAST(dt.k AS DOUBLE) * lm.ll AS kll
      FROM dt JOIN lm ON lm.t = dt.t
    ), sc AS (
      SELECT c.doc_id, c.true_lang, c.cand_lang,
             ROUND(p.lp + list_aggregate(list(c.kll ORDER BY c.t), 'sum'), 6)
               AS score
      FROM contrib c JOIN pri p ON p.lang = c.cand_lang
      GROUP BY c.doc_id, c.true_lang, c.cand_lang, p.lp
    ), pred AS (
      SELECT doc_id, true_lang, cand_lang AS pred_lang,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, cand_lang) AS rn
      FROM sc
    ), cells AS (
      SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM pred WHERE rn = 1 GROUP BY 1, 2
    )
    SELECT true_lang, pred_lang, n_docs,
           ROUND(CAST(n_docs AS DOUBLE)
                 / CAST(SUM(n_docs) OVER (PARTITION BY true_lang) AS DOUBLE), 4)
             AS frac
    FROM cells
    """,
    tags=("model", "langid", "naive-bayes", "training"),
)
def model_naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive Bayes language classifier, trained and served
    in-plane: per-language token counts with Laplace add-one smoothing
    are the ENTIRE model (NB's sufficient statistics are group-by
    aggregates — training distributes at any corpus size, unlike the
    collected-sample GD of model_logreg_quality_fit), and every
    document is classified by argmax of ln(prior) + sum k_t * ln
    P(t|lang). Output is the training-set confusion matrix (labeled x
    predicted language, row-normalized) — the view that tells a
    curation team whether the corpus' language labels are even
    self-consistent enough to train a router on.

    Cross-engine float discipline: log-likelihoods and log-priors
    rounded at 8 decimals, per-(doc, lang) contributions summed as an
    ORDERED fold over the token-sorted list, scores rounded at 6
    before the argmax window (DESC score, ASC lang tie-break).

    Scale shape: training = two token-keyed aggregates (lang x token
    counts, vocabulary-sized output) plus a vocabulary x |langs| LEFT
    join to materialize the smoothing floor (the crossJoin fans a
    CONSTANT 5-row language dimension over the vocab — broadcast);
    serving joins doc-token counts against the token-keyed model
    (vocabulary-grain, AQE-broadcastable per shard) and folds per
    (doc, lang) bounded by distinct tokens x |langs|. Nothing
    corpus-sized crosses the driver."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        F.col("doc_id"),
        F.col("lang").alias("true_lang"),
        F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("t"),
    )
    lt = tok.groupBy(F.col("true_lang").alias("lang"), "t").agg(
        F.count(F.lit(1)).alias("c")
    )
    nl = lt.groupBy("lang").agg(F.sum("c").alias("n_l"))
    vocab = lt.select("t").distinct()
    vv = vocab.agg(F.count(F.lit(1)).alias("v"))
    lm = (
        vocab.crossJoin(F.broadcast(nl))
        .crossJoin(F.broadcast(vv))
        .join(lt, ["t", "lang"], "left")
        .select(
            "t",
            "lang",
            F.round(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)).cast("double") + F.lit(1.0))
                    / (F.col("n_l").cast("double") + F.col("v").cast("double"))
                ),
                8,
            ).alias("ll"),
        )
    )
    nd = d.groupBy("lang").agg(F.count(F.lit(1)).alias("nd"))
    pri = nd.select(
        "lang",
        F.round(
            F.log(
                F.col("nd").cast("double")
                / F.sum("nd").over(Window.partitionBy()).cast("double")
            ),
            8,
        ).alias("lp"),
    )
    dt = tok.groupBy("doc_id", "true_lang", "t").agg(F.count(F.lit(1)).alias("k"))
    contrib = dt.join(lm.withColumnRenamed("lang", "cand_lang"), "t").select(
        "doc_id",
        "true_lang",
        "cand_lang",
        "t",
        (F.col("k").cast("double") * F.col("ll")).alias("kll"),
    )
    arr = F.array_sort(F.collect_list(F.struct(F.col("t"), F.col("kll"))))
    folded = F.aggregate(
        F.transform(arr, lambda x: x["kll"]), F.lit(0.0), lambda a, x: a + x
    )
    sc = (
        contrib.join(
            F.broadcast(pri.withColumnRenamed("lang", "cand_lang")), "cand_lang"
        )
        .groupBy("doc_id", "true_lang", "cand_lang", "lp")
        .agg(F.round(F.col("lp") + folded, 6).alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "cand_lang")
    pred = (
        sc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("true_lang", F.col("cand_lang").alias("pred_lang"))
    )
    cells = pred.groupBy("true_lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    wl = Window.partitionBy("true_lang")
    return cells.select(
        "true_lang",
        "pred_lang",
        "n_docs",
        F.round(
            F.col("n_docs").cast("double") / F.sum("n_docs").over(wl).cast("double"),
            4,
        ).alias("frac"),
    )



# --------------------------------------------------------------------------
# BLEU (clipped 1-4-gram precisions + brevity penalty)


@query(
    "eval_bleu_pairs",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_TOKS} AS toks, len({_TOKS}) AS nt
      FROM documents WHERE doc_id % 7 = 0
    ), pairs AS (
      SELECT doc_id,
             toks[1 : nt - CAST(FLOOR(3 * nt / 10.0) AS BIGINT)] AS ctoks,
             toks[CAST(FLOOR(nt / 5.0) AS BIGINT) + 1 : nt] AS rtoks
      FROM base
    ), sized AS (
      SELECT doc_id, ctoks, rtoks,
             CAST(len(ctoks) AS BIGINT) AS c, CAST(len(rtoks) AS BIGINT) AS r
      FROM pairs
    ), ns AS (
      SELECT unnest([1, 2, 3, 4]) AS n
    ), cg AS (
      SELECT doc_id, n, array_to_string(ctoks[i : i + n - 1], ' ') AS g,
             CAST(COUNT(*) AS BIGINT) AS ccnt
      FROM sized CROSS JOIN ns,
           unnest(range(1, len(ctoks) - n + 2)) AS u(i)
      WHERE len(ctoks) >= n
      GROUP BY 1, 2, 3
    ), rg AS (
      SELECT doc_id, n, array_to_string(rtoks[i : i + n - 1], ' ') AS g,
             CAST(COUNT(*) AS BIGINT) AS rcnt
      FROM sized CROSS JOIN ns,
           unnest(range(1, len(rtoks) - n + 2)) AS u(i)
      WHERE len(rtoks) >= n
      GROUP BY 1, 2, 3
    ), mt AS (
      SELECT cg.doc_id, cg.n, CAST(SUM(LEAST(cg.ccnt, rg.rcnt)) AS BIGINT) AS m
      FROM cg JOIN rg ON rg.doc_id = cg.doc_id AND rg.n = cg.n AND rg.g = cg.g
      GROUP BY 1, 2
    ), per AS (
      SELECT s.doc_id, s.c, s.r,
             COALESCE(MAX(CASE WHEN mt.n = 1 THEN mt.m END), 0) AS m1,
             COALESCE(MAX(CASE WHEN mt.n = 2 THEN mt.m END), 0) AS m2,
             COALESCE(MAX(CASE WHEN mt.n = 3 THEN mt.m END), 0) AS m3,
             COALESCE(MAX(CASE WHEN mt.n = 4 THEN mt.m END), 0) AS m4,
             GREATEST(s.c, 0) AS t1, GREATEST(s.c - 1, 0) AS t2,
             GREATEST(s.c - 2, 0) AS t3, GREATEST(s.c - 3, 0) AS t4
      FROM sized s LEFT JOIN mt ON mt.doc_id = s.doc_id
      GROUP BY 1, 2, 3
    ), logs AS (
      -- each ROUND operand is a SHORT column expression: the Spark-
      -- rounding rewrite (queries/__init__.rewrite_spark_round)
      -- duplicates its operand ~10x, so NESTED rounds expand
      -- multiplicatively (the original nested spelling rewrote to a
      -- 1.7 MB oracle that cost ~1 GB to bind in DuckDB)
      SELECT doc_id, c, r, m1, m4, t1, t4,
             (m1 = 0 OR m2 = 0 OR m3 = 0 OR m4 = 0
              OR t1 = 0 OR t2 = 0 OR t3 = 0 OR t4 = 0) AS degenerate,
             CASE WHEN c >= r OR c = 0 THEN 0.0
                  ELSE ROUND(1.0 - CAST(r AS DOUBLE) / CAST(c AS DOUBLE), 8) END AS bp,
             CASE WHEN m1 = 0 OR t1 = 0 THEN 0.0
                  ELSE ROUND(ln(CAST(m1 AS DOUBLE) / CAST(t1 AS DOUBLE)), 8) END AS lp1,
             CASE WHEN m2 = 0 OR t2 = 0 THEN 0.0
                  ELSE ROUND(ln(CAST(m2 AS DOUBLE) / CAST(t2 AS DOUBLE)), 8) END AS lp2,
             CASE WHEN m3 = 0 OR t3 = 0 THEN 0.0
                  ELSE ROUND(ln(CAST(m3 AS DOUBLE) / CAST(t3 AS DOUBLE)), 8) END AS lp3,
             CASE WHEN m4 = 0 OR t4 = 0 THEN 0.0
                  ELSE ROUND(ln(CAST(m4 AS DOUBLE) / CAST(t4 AS DOUBLE)), 8) END AS lp4
      FROM per
    )
    SELECT doc_id, c AS n_cand_tokens, r AS n_ref_tokens,
           CASE WHEN t1 = 0 THEN 0.0
                ELSE ROUND(CAST(m1 AS DOUBLE) / CAST(t1 AS DOUBLE), 6) END AS prec1,
           CASE WHEN t4 = 0 THEN 0.0
                ELSE ROUND(CAST(m4 AS DOUBLE) / CAST(t4 AS DOUBLE), 6) END AS prec4,
           CASE WHEN degenerate THEN 0.0
                ELSE ROUND(exp(bp + (lp1 + lp2 + lp3 + lp4) / 4.0), 6)
                END AS bleu
    FROM logs
    """,
    tags=("evaluation", "text", "bleu"),
)
def eval_bleu_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-level BLEU (unsmoothed, clipped 1-4-gram precisions,
    brevity penalty) — the precision-oriented generation eval
    alongside eval_rouge1_pairs' recall-oriented unigram overlap.
    Candidate/reference pairs are two overlapping windows of each
    sampled document (the first 70% vs the last 80% of its tokens):
    the ~60% shared middle gives every pair KNOWN nonzero n-gram
    precisions and the shorter candidate exercises the brevity
    penalty — a metric-calibration harness whose expected values are
    visible in the output (successor-doc pairing on this word-soup
    fixture scores an all-zero column, which verifies trivially; the
    clipping, geometric mean, and BP arithmetic is what this query
    pins cross-engine).

    Cross-engine float discipline: match counts and totals are exact
    integers; per-order log-precisions rounded at 8, summed in the
    spelled-out order, brevity-penalty exponent rounded at 8, final
    exp rounded at 6 (the text_unigram_logprob exp precedent).

    Scale shape: n-gram counting shuffles on (doc, n, gram) — 4x
    token grain, the text_tfidf family; pair scoring joins the two
    per-document count relations on (doc, n, gram) and never
    materializes cross-document products. With real candidate/
    reference columns the same kernel runs unchanged; pairs would
    come from a shortlist, keeping everything downstream
    shortlist-sized."""
    from serverless_datalake_spark.operators import textops

    d = load_table(spark, sf_dir, "documents")
    toks = textops.tokens(F.col("text"))
    base = d.where(F.col("doc_id") % 7 == 0).select(
        "doc_id", toks.alias("toks"), F.size(toks).alias("nt")
    )
    sized = base.select(
        "doc_id",
        F.slice(
            "toks", 1, F.col("nt") - F.floor(F.lit(3) * F.col("nt") / F.lit(10.0)).cast("int")
        ).alias("ctoks"),
        F.slice(
            "toks",
            F.floor(F.col("nt") / F.lit(5.0)).cast("int") + F.lit(1),
            F.col("nt"),
        ).alias("rtoks"),
    ).select(
        "doc_id",
        "ctoks",
        "rtoks",
        F.size("ctoks").cast("long").alias("c"),
        F.size("rtoks").cast("long").alias("r"),
    )
    ns = F.explode(F.array(*[F.lit(n) for n in (1, 2, 3, 4)])).alias("n")

    def grams(tc, cnt_name):
        # guard the n > len case explicitly: sequence(1, len-n+1)
        # DESCENDS when len < n (the SCALE.md sequence gotcha)
        g = F.expr(
            f"CASE WHEN size({tc}) >= n THEN "
            f"transform(sequence(1, size({tc}) - n + 1), "
            f"i -> concat_ws(' ', slice({tc}, i, n))) "
            f"ELSE CAST(array() AS array<string>) END"
        )
        return (
            sized.select("doc_id", tc, ns)
            .select("doc_id", "n", F.explode(g).alias("g"))
            .groupBy("doc_id", "n", "g")
            .agg(F.count(F.lit(1)).cast("long").alias(cnt_name))
        )

    cg = grams("ctoks", "ccnt")
    rg = grams("rtoks", "rcnt")
    mt = (
        cg.join(rg, ["doc_id", "n", "g"])
        .groupBy("doc_id", "n")
        .agg(F.sum(F.least("ccnt", "rcnt")).cast("long").alias("m"))
    )
    per = (
        sized.join(mt, "doc_id", "left")
        .groupBy("doc_id", "c", "r")
        .agg(
            *[
                F.coalesce(
                    F.max(F.when(F.col("n") == i, F.col("m"))), F.lit(0).cast("long")
                ).alias(f"m{i}")
                for i in (1, 2, 3, 4)
            ]
        )
        .select(
            "*",
            *[
                F.greatest(F.col("c") - (i - 1), F.lit(0).cast("long")).alias(f"t{i}")
                for i in (1, 2, 3, 4)
            ],
        )
    )
    zero = (
        (F.col("m1") == 0) | (F.col("m2") == 0) | (F.col("m3") == 0)
        | (F.col("m4") == 0) | (F.col("t1") == 0) | (F.col("t2") == 0)
        | (F.col("t3") == 0) | (F.col("t4") == 0)
    )
    bp_log = F.when(F.col("c") >= F.col("r"), F.lit(0.0)).otherwise(
        F.round(F.lit(1.0) - F.col("r").cast("double") / F.col("c").cast("double"), 8)
    )
    lp = [
        F.round(F.log(F.col(f"m{i}").cast("double") / F.col(f"t{i}").cast("double")), 8)
        for i in (1, 2, 3, 4)
    ]
    return per.select(
        "doc_id",
        F.col("c").alias("n_cand_tokens"),
        F.col("r").alias("n_ref_tokens"),
        F.when(F.col("t1") == 0, 0.0)
        .otherwise(F.round(F.col("m1").cast("double") / F.col("t1").cast("double"), 6))
        .alias("prec1"),
        F.when(F.col("t4") == 0, 0.0)
        .otherwise(F.round(F.col("m4").cast("double") / F.col("t4").cast("double"), 6))
        .alias("prec4"),
        F.when(zero, 0.0)
        .otherwise(
            F.round(F.exp(bp_log + (lp[0] + lp[1] + lp[2] + lp[3]) / F.lit(4.0)), 6)
        )
        .alias("bleu"),
    )


@query(
    "eval_distinct_n",
    oracle=f"""
    WITH t AS (
      SELECT source, doc_id, {_TOKS} AS toks FROM documents
    ), g AS (
      SELECT source, n, array_to_string(toks[i : i + n - 1], ' ') AS g
      FROM t CROSS JOIN (SELECT unnest([1, 2, 3]) AS n),
           unnest(range(1, len(toks) - n + 2)) AS u(i)
      WHERE len(toks) >= n
    ), per AS (
      SELECT source, n,
             CAST(COUNT(*) AS BIGINT) AS n_grams,
             CAST(COUNT(DISTINCT g) AS BIGINT) AS n_distinct
      FROM g GROUP BY 1, 2
    )
    SELECT source, CAST(n AS BIGINT) AS n, n_grams, n_distinct,
           ROUND(CAST(n_distinct AS DOUBLE) / CAST(n_grams AS DOUBLE), 6)
             AS distinct_ratio
    FROM per
    """,
    tags=("evaluation", "text", "diversity"),
)
def eval_distinct_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-n diversity (Li et al. 2016): per source, the ratio of
    distinct 1/2/3-grams to total — THE standard degeneracy metric
    for generated text (mode-collapsed or template-heavy sources show
    a low distinct-2/3 long before humans notice). The per-source
    grain makes it the dashboard row a curation team tracks per
    upstream generator.

    Exactness: both counts are integers from one aggregate; the ratio
    is a single division rounded at 6.

    Scale shape: gram expansion is map-only; ONE (source, n, gram)
    aggregate with a distinct count (two-phase partial) — 3x the
    token grain, no joins, no windows. Mergeable across shards: at
    100 TB keep per-shard (gram, count) partials and merge."""
    from serverless_datalake_spark.operators import textops

    d = load_table(spark, sf_dir, "documents")
    toks = textops.tokens(F.col("text"))
    t = d.select("source", "doc_id", toks.alias("toks"))
    ns = F.explode(F.array(*[F.lit(n) for n in (1, 2, 3)])).alias("n")
    g = F.expr(
        "CASE WHEN size(toks) >= n THEN "
        "transform(sequence(1, size(toks) - n + 1), "
        "i -> concat_ws(' ', slice(toks, i, n))) "
        "ELSE CAST(array() AS array<string>) END"
    )
    grams = t.select("source", "toks", ns).select(
        "source", "n", F.explode(g).alias("g")
    )
    per = grams.groupBy("source", "n").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.countDistinct("g").cast("long").alias("n_distinct"),
    )
    return per.select(
        "source",
        F.col("n").cast("long").alias("n"),
        "n_grams",
        "n_distinct",
        F.round(
            F.col("n_distinct").cast("double") / F.col("n_grams").cast("double"), 6
        ).alias("distinct_ratio"),
    )


@query(
    "eval_chrf_pairs",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_TOKS} AS toks, len({_TOKS}) AS nt
      FROM documents WHERE doc_id % 7 = 0
    ), pairs AS (
      SELECT doc_id,
             array_to_string(toks[1 : nt - CAST(FLOOR(3 * nt / 10.0) AS BIGINT)], '') AS cs,
             array_to_string(toks[CAST(FLOOR(nt / 5.0) AS BIGINT) + 1 : nt], '') AS rs
      FROM base
    ), sized AS (
      SELECT doc_id, COALESCE(cs, '') AS cs, COALESCE(rs, '') AS rs,
             CAST(length(COALESCE(cs, '')) AS BIGINT) AS c,
             CAST(length(COALESCE(rs, '')) AS BIGINT) AS r
      FROM pairs
    ), ns AS (
      SELECT unnest([1, 2, 3, 4]) AS n
    ), cg AS (
      SELECT doc_id, n, substr(cs, CAST(i AS INTEGER), CAST(n AS INTEGER)) AS g,
             CAST(COUNT(*) AS BIGINT) AS ccnt
      FROM sized CROSS JOIN ns,
           unnest(range(1, length(cs) - n + 2)) AS u(i)
      WHERE length(cs) >= n
      GROUP BY 1, 2, 3
    ), rg AS (
      SELECT doc_id, n, substr(rs, CAST(i AS INTEGER), CAST(n AS INTEGER)) AS g,
             CAST(COUNT(*) AS BIGINT) AS rcnt
      FROM sized CROSS JOIN ns,
           unnest(range(1, length(rs) - n + 2)) AS u(i)
      WHERE length(rs) >= n
      GROUP BY 1, 2, 3
    ), mt AS (
      SELECT cg.doc_id, cg.n, CAST(SUM(LEAST(cg.ccnt, rg.rcnt)) AS BIGINT) AS m
      FROM cg JOIN rg ON rg.doc_id = cg.doc_id AND rg.n = cg.n AND rg.g = cg.g
      GROUP BY 1, 2
    ), per AS (
      SELECT s.doc_id, s.c, s.r,
             COALESCE(MAX(CASE WHEN mt.n = 1 THEN mt.m END), 0) AS m1,
             COALESCE(MAX(CASE WHEN mt.n = 2 THEN mt.m END), 0) AS m2,
             COALESCE(MAX(CASE WHEN mt.n = 3 THEN mt.m END), 0) AS m3,
             COALESCE(MAX(CASE WHEN mt.n = 4 THEN mt.m END), 0) AS m4
      FROM sized s LEFT JOIN mt ON mt.doc_id = s.doc_id
      GROUP BY 1, 2, 3
    ), pr AS (
      SELECT doc_id, c, r,
             ((CASE WHEN c - 0 <= 0 THEN 0.0 ELSE CAST(m1 AS DOUBLE) / CAST(c - 0 AS DOUBLE) END)
            + (CASE WHEN c - 1 <= 0 THEN 0.0 ELSE CAST(m2 AS DOUBLE) / CAST(c - 1 AS DOUBLE) END)
            + (CASE WHEN c - 2 <= 0 THEN 0.0 ELSE CAST(m3 AS DOUBLE) / CAST(c - 2 AS DOUBLE) END)
            + (CASE WHEN c - 3 <= 0 THEN 0.0 ELSE CAST(m4 AS DOUBLE) / CAST(c - 3 AS DOUBLE) END)) / 4.0 AS p,
             ((CASE WHEN r - 0 <= 0 THEN 0.0 ELSE CAST(m1 AS DOUBLE) / CAST(r - 0 AS DOUBLE) END)
            + (CASE WHEN r - 1 <= 0 THEN 0.0 ELSE CAST(m2 AS DOUBLE) / CAST(r - 1 AS DOUBLE) END)
            + (CASE WHEN r - 2 <= 0 THEN 0.0 ELSE CAST(m3 AS DOUBLE) / CAST(r - 2 AS DOUBLE) END)
            + (CASE WHEN r - 3 <= 0 THEN 0.0 ELSE CAST(m4 AS DOUBLE) / CAST(r - 3 AS DOUBLE) END)) / 4.0 AS rr
      FROM per
    )
    SELECT doc_id,
           c AS n_cand_chars, r AS n_ref_chars,
           ROUND(p, 6) AS chrf_precision,
           ROUND(rr, 6) AS chrf_recall,
           CASE WHEN 4.0 * p + rr = 0.0 THEN 0.0
                ELSE ROUND(5.0 * p * rr / (4.0 * p + rr), 6) END AS chrf2
    FROM pr
    """,
    tags=("evaluation", "text", "chrf"),
)
def eval_chrf_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """chrF2 (Popović 2015): character n-gram F-beta (beta=2,
    recall-weighted) over whitespace-stripped text — the third
    standard generation metric beside eval_bleu_pairs (word-precision)
    and eval_rouge1_pairs (word-recall); chrF is the robust one for
    morphology-rich languages and noisy tokenization because it never
    trusts word boundaries. Same deterministic overlapping-window
    candidate/reference pairs as BLEU (first 70% vs last 80% of each
    sampled doc's tokens, concatenated without spaces). Orders n=1..4;
    per-order precision/recall are exact integer divisions (0 when an
    order has no grams, the sacreBLEU empty-order convention),
    averaged in spelled-out fixed order, F computed once and rounded
    at 6 — no nested ROUND anywhere (the rewrite-size discipline).

    Scale shape: char-gram counting shuffles on (doc, n, gram) — same
    family as the BLEU kernel one granularity finer; everything
    downstream of the counts is pair-grain."""
    from serverless_datalake_spark.operators import textops

    d = load_table(spark, sf_dir, "documents")
    toks = textops.tokens(F.col("text"))
    base = d.where(F.col("doc_id") % 7 == 0).select(
        "doc_id", toks.alias("toks"), F.size(toks).alias("nt")
    )
    sized = base.select(
        "doc_id",
        F.coalesce(
            F.array_join(
                F.slice(
                    "toks",
                    1,
                    F.col("nt")
                    - F.floor(F.lit(3) * F.col("nt") / F.lit(10.0)).cast("int"),
                ),
                "",
            ),
            F.lit(""),
        ).alias("cs"),
        F.coalesce(
            F.array_join(
                F.slice(
                    "toks",
                    F.floor(F.col("nt") / F.lit(5.0)).cast("int") + F.lit(1),
                    F.col("nt"),
                ),
                "",
            ),
            F.lit(""),
        ).alias("rs"),
    ).select(
        "doc_id", "cs", "rs",
        F.length("cs").cast("long").alias("c"),
        F.length("rs").cast("long").alias("r"),
    )
    ns = F.explode(F.array(*[F.lit(n) for n in (1, 2, 3, 4)])).alias("n")

    def grams(sc, cnt_name):
        g = F.expr(
            f"CASE WHEN length({sc}) >= n THEN "
            f"transform(sequence(1, length({sc}) - n + 1), "
            f"i -> substring({sc}, i, n)) "
            f"ELSE CAST(array() AS array<string>) END"
        )
        return (
            sized.select("doc_id", sc, ns)
            .select("doc_id", "n", F.explode(g).alias("g"))
            .groupBy("doc_id", "n", "g")
            .agg(F.count(F.lit(1)).cast("long").alias(cnt_name))
        )

    cg = grams("cs", "ccnt")
    rg = grams("rs", "rcnt")
    mt = (
        cg.join(rg, ["doc_id", "n", "g"])
        .groupBy("doc_id", "n")
        .agg(F.sum(F.least("ccnt", "rcnt")).cast("long").alias("m"))
    )
    per = (
        sized.join(mt, "doc_id", "left")
        .groupBy("doc_id", "c", "r")
        .agg(
            *[
                F.coalesce(
                    F.max(F.when(F.col("n") == i, F.col("m"))), F.lit(0).cast("long")
                ).alias(f"m{i}")
                for i in (1, 2, 3, 4)
            ]
        )
    )

    def _avg(tot_col):
        terms = []
        for i in (1, 2, 3, 4):
            t = F.col(tot_col) - (i - 1)
            terms.append(
                F.when(t <= 0, F.lit(0.0)).otherwise(
                    F.col(f"m{i}").cast("double") / t.cast("double")
                )
            )
        return (terms[0] + terms[1] + terms[2] + terms[3]) / F.lit(4.0)

    p, rr = _avg("c"), _avg("r")
    return per.select(
        "doc_id",
        F.col("c").alias("n_cand_chars"),
        F.col("r").alias("n_ref_chars"),
        F.round(p, 6).alias("chrf_precision"),
        F.round(rr, 6).alias("chrf_recall"),
        F.when(F.lit(4.0) * p + rr == 0.0, 0.0)
        .otherwise(F.round(F.lit(5.0) * p * rr / (F.lit(4.0) * p + rr), 6))
        .alias("chrf2"),
    )


_RIDGE_LAMBDA = "1000.0"  # spelled as the same literal on both sides


def _ridge_oracle() -> str:
    """Closed-form ridge via the exact distributed Gram matrix; the
    3x3 solve is a fixed cofactor expansion spelled identically in
    Spark — identical IEEE expression trees on identical doubles."""
    quad = (
        "t0 * (t0 * n + t1 * s1 + t2 * s2)"
        " + t1 * (t0 * s1 + t1 * s11 + t2 * s12)"
        " + t2 * (t0 * s2 + t1 * s12 + t2 * s22)"
    )
    return f"""
    WITH units AS (
      SELECT CAST(l_quantity AS BIGINT) AS x1,
             CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS x2,
             CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS y
      FROM lineitem
    ), g AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(x1 AS HUGEINT)) AS DOUBLE) AS s1,
             CAST(SUM(CAST(x2 AS HUGEINT)) AS DOUBLE) AS s2,
             CAST(SUM(CAST(x1 AS HUGEINT) * x1) AS DOUBLE) AS s11,
             CAST(SUM(CAST(x1 AS HUGEINT) * x2) AS DOUBLE) AS s12,
             CAST(SUM(CAST(x2 AS HUGEINT) * x2) AS DOUBLE) AS s22,
             CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x1 AS HUGEINT) * y) AS DOUBLE) AS s1y,
             CAST(SUM(CAST(x2 AS HUGEINT) * y) AS DOUBLE) AS s2y,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
      FROM units
    ), a AS (
      SELECT *,
             n + {_RIDGE_LAMBDA} AS a11,
             s11 + {_RIDGE_LAMBDA} AS a22,
             s22 + {_RIDGE_LAMBDA} AS a33
      FROM g
    ), det AS (
      SELECT *,
             a11 * (a22 * a33 - s12 * s12)
             - s1 * (s1 * a33 - s12 * s2)
             + s2 * (s1 * s12 - a22 * s2) AS d
      FROM a
    ), theta AS (
      SELECT *,
             (sy * (a22 * a33 - s12 * s12)
              - s1 * (s1y * a33 - s12 * s2y)
              + s2 * (s1y * s12 - a22 * s2y)) / d AS t0,
             (a11 * (s1y * a33 - s12 * s2y)
              - sy * (s1 * a33 - s12 * s2)
              + s2 * (s1 * s2y - s1y * s2)) / d AS t1,
             (a11 * (a22 * s2y - s1y * s12)
              - s1 * (s1 * s2y - s1y * s2)
              + sy * (s1 * s12 - a22 * s2)) / d AS t2
      FROM det
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           ROUND(t0, 6) AS theta0,
           ROUND(t1, 6) AS theta1,
           ROUND(t2, 6) AS theta2,
           ROUND(1.0 - (syy - 2.0 * (t0 * sy + t1 * s1y + t2 * s2y)
                        + ({quad}))
                     / (syy - sy * sy / n), 6) AS r2
    FROM theta
    """


@query(
    "model_ridge_gram",
    oracle=_ridge_oracle(),
    tags=("model", "regression", "ridge"),
)
def model_ridge_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge regression (2 features + intercept, λ=1000) fit ENTIRELY
    in the data plane via the Gram-matrix pattern — the canonical
    distributed closed-form fit: one scan accumulates the exact
    sufficient statistics (n, Σx, Σxxᵀ, Σxy, Σy²) in DECIMAL(38,0)
    integer units (quantity, discount-pct, price-cents), the 3×3
    system (XᵀX + λI)θ = Xᵀy is solved by a fixed cofactor expansion
    in the projection, and training R² comes from the same statistics
    (SSE = Σy² − 2θ·Xᵀy + θᵀXᵀXθ). Nothing is collected; at 100 TB
    the fit costs exactly one partial-agg shuffle to ONE row — this
    is how linear probes over petabyte corpora are actually fit
    (contrast model_logreg_quality_fit, which must iterate and so
    trains on a capped sample).

    Determinism: the sums are exact (order-independent integer
    accumulation); every double expression after the single CAST is
    spelled with identical association order in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    units = li.select(
        F.col("l_quantity").cast("long").alias("x1"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("x2"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("y"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    g = units.groupBy().agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dec("x1")).cast("double").alias("s1"),
        F.sum(dec("x2")).cast("double").alias("s2"),
        F.sum(dec("x1") * dec("x1")).cast("double").alias("s11"),
        F.sum(dec("x1") * dec("x2")).cast("double").alias("s12"),
        F.sum(dec("x2") * dec("x2")).cast("double").alias("s22"),
        F.sum(dec("y")).cast("double").alias("sy"),
        F.sum(dec("x1") * dec("y")).cast("double").alias("s1y"),
        F.sum(dec("x2") * dec("y")).cast("double").alias("s2y"),
        F.sum(dec("y") * dec("y")).cast("double").alias("syy"),
    )
    lam = F.lit(float(_RIDGE_LAMBDA))
    a = g.select(
        "*",
        (F.col("n") + lam).alias("a11"),
        (F.col("s11") + lam).alias("a22"),
        (F.col("s22") + lam).alias("a33"),
    )
    det = a.select(
        "*",
        (
            F.col("a11") * (F.col("a22") * F.col("a33") - F.col("s12") * F.col("s12"))
            - F.col("s1") * (F.col("s1") * F.col("a33") - F.col("s12") * F.col("s2"))
            + F.col("s2") * (F.col("s1") * F.col("s12") - F.col("a22") * F.col("s2"))
        ).alias("d"),
    )
    theta = det.select(
        "*",
        (
            (
                F.col("sy") * (F.col("a22") * F.col("a33") - F.col("s12") * F.col("s12"))
                - F.col("s1") * (F.col("s1y") * F.col("a33") - F.col("s12") * F.col("s2y"))
                + F.col("s2") * (F.col("s1y") * F.col("s12") - F.col("a22") * F.col("s2y"))
            )
            / F.col("d")
        ).alias("t0"),
        (
            (
                F.col("a11") * (F.col("s1y") * F.col("a33") - F.col("s12") * F.col("s2y"))
                - F.col("sy") * (F.col("s1") * F.col("a33") - F.col("s12") * F.col("s2"))
                + F.col("s2") * (F.col("s1") * F.col("s2y") - F.col("s1y") * F.col("s2"))
            )
            / F.col("d")
        ).alias("t1"),
        (
            (
                F.col("a11") * (F.col("a22") * F.col("s2y") - F.col("s1y") * F.col("s12"))
                - F.col("s1") * (F.col("s1") * F.col("s2y") - F.col("s1y") * F.col("s2"))
                + F.col("sy") * (F.col("s1") * F.col("s12") - F.col("a22") * F.col("s2"))
            )
            / F.col("d")
        ).alias("t2"),
    )
    quad = (
        F.col("t0") * (F.col("t0") * F.col("n") + F.col("t1") * F.col("s1") + F.col("t2") * F.col("s2"))
        + F.col("t1") * (F.col("t0") * F.col("s1") + F.col("t1") * F.col("s11") + F.col("t2") * F.col("s12"))
        + F.col("t2") * (F.col("t0") * F.col("s2") + F.col("t1") * F.col("s12") + F.col("t2") * F.col("s22"))
    )
    return theta.select(
        F.col("n").cast("long").alias("n_rows"),
        F.round("t0", 6).alias("theta0"),
        F.round("t1", 6).alias("theta1"),
        F.round("t2", 6).alias("theta2"),
        F.round(
            F.lit(1.0)
            - (
                F.col("syy")
                - F.lit(2.0)
                * (
                    F.col("t0") * F.col("sy")
                    + F.col("t1") * F.col("s1y")
                    + F.col("t2") * F.col("s2y")
                )
                + quad
            )
            / (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")),
            6,
        ).alias("r2"),
    )


@query(
    "eval_ppi_mean_estimate",
    oracle="""
    WITH scored AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ), feats AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 30
                   AND len(list_distinct(toks)) * 2 >= len(toks)
                  THEN 1 ELSE 0 END AS label,
             CASE WHEN len(toks) >= 25 THEN 1 ELSE 0 END AS pred,
             CASE WHEN doc_id % 20 = 0 THEN 1 ELSE 0 END AS labeled
      FROM scored
    ), g AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_all,
             CAST(SUM(pred) AS DOUBLE) AS s_pred_all,
             CAST(SUM(labeled) AS DOUBLE) AS n_lab,
             CAST(SUM(CASE WHEN labeled = 1 THEN label ELSE 0 END) AS DOUBLE)
               AS s_label_lab,
             CAST(SUM(CASE WHEN labeled = 1 THEN pred ELSE 0 END) AS DOUBLE)
               AS s_pred_lab
      FROM feats
    )
    SELECT CAST(n_all AS BIGINT) AS n_total,
           CAST(n_lab AS BIGINT) AS n_labeled,
           ROUND(s_label_lab / n_lab, 6) AS classical_mean,
           ROUND(s_pred_all / n_all, 6) AS pred_mean_all,
           ROUND(s_pred_all / n_all
                 - (s_pred_lab / n_lab - s_label_lab / n_lab), 6) AS ppi_mean
    FROM g
    """,
    tags=("evaluation", "ppi", "inference"),
)
def eval_ppi_mean_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prediction-Powered Inference (Angelopoulos et al. 2023) for a
    corpus-level mean — the modern eval pattern when labels are
    scarce but a model scores everything: estimate the quality-gate
    acceptance rate from a SMALL labeled slice (doc_id % 20, the
    'human annotations') plus a cheap model prediction (a length
    stump) over the WHOLE corpus. θ̂_PPI = mean(pred | all) −
    (mean(pred | labeled) − mean(label | labeled)) — the rectifier
    removes the model's bias while keeping the large-n variance of
    the prediction term. Output reports the classical small-sample
    estimate, the naive all-prediction mean, and the PPI estimate.

    Exactness: all five sufficient statistics are exact integer
    counts; the three divisions and the rectifier subtraction are
    the identical IEEE expression in both engines. Scale shape: ONE
    corpus scan to a 1-row aggregate — nothing collected, no joins;
    the labeled slice is a predicate, not a separate table."""
    d = load_table(spark, sf_dir, "documents")
    from serverless_datalake_spark.operators import textops

    toks = textops.tokens(F.col("text"))
    nd = F.size(F.array_distinct(toks))
    n = F.size(toks)
    feats = d.select(
        F.when((n >= 30) & (nd * 2 >= n), 1).otherwise(0).alias("label"),
        F.when(n >= 25, 1).otherwise(0).alias("pred"),
        F.when(F.col("doc_id") % 20 == 0, 1).otherwise(0).alias("labeled"),
    )
    g = feats.groupBy().agg(
        F.count(F.lit(1)).cast("double").alias("n_all"),
        F.sum("pred").cast("double").alias("s_pred_all"),
        F.sum("labeled").cast("double").alias("n_lab"),
        F.sum(F.when(F.col("labeled") == 1, F.col("label")).otherwise(0))
        .cast("double")
        .alias("s_label_lab"),
        F.sum(F.when(F.col("labeled") == 1, F.col("pred")).otherwise(0))
        .cast("double")
        .alias("s_pred_lab"),
    )
    return g.select(
        F.col("n_all").cast("long").alias("n_total"),
        F.col("n_lab").cast("long").alias("n_labeled"),
        F.round(F.col("s_label_lab") / F.col("n_lab"), 6).alias("classical_mean"),
        F.round(F.col("s_pred_all") / F.col("n_all"), 6).alias("pred_mean_all"),
        F.round(
            F.col("s_pred_all") / F.col("n_all")
            - (F.col("s_pred_lab") / F.col("n_lab") - F.col("s_label_lab") / F.col("n_lab")),
            6,
        ).alias("ppi_mean"),
    )


@query(
    "eval_fleiss_kappa",
    oracle="""
    WITH t AS (
      SELECT list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ), votes AS (
      SELECT (CASE WHEN len(toks) >= 30 THEN 1 ELSE 0 END)
             + (CASE WHEN len(list_distinct(toks)) * 2 >= len(toks)
                THEN 1 ELSE 0 END)
             + (CASE WHEN len(toks) >= 30
                      AND len(list_distinct(toks)) * 2 >= len(toks)
                THEN 1 ELSE 0 END) AS n1
      FROM t
    ), sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(SUM(n1) AS BIGINT) AS s1,
             CAST(SUM(CAST(n1 AS HUGEINT) * CAST(n1 AS HUGEINT)
                      + CAST(3 - n1 AS HUGEINT) * CAST(3 - n1 AS HUGEINT))
                  AS BIGINT) AS ssq
      FROM votes
    )
    SELECT n_items,
           ROUND((CAST(ssq AS DOUBLE) - 3.0 * CAST(n_items AS DOUBLE))
                 / (6.0 * CAST(n_items AS DOUBLE)), 6) AS p_bar,
           ROUND(POW(CAST(s1 AS DOUBLE) / (3.0 * CAST(n_items AS DOUBLE)), 2)
                 + POW(1.0 - CAST(s1 AS DOUBLE) / (3.0 * CAST(n_items AS DOUBLE)),
                       2), 6) AS p_e,
           ROUND(((CAST(ssq AS DOUBLE) - 3.0 * CAST(n_items AS DOUBLE))
                  / (6.0 * CAST(n_items AS DOUBLE))
                  - (POW(CAST(s1 AS DOUBLE) / (3.0 * CAST(n_items AS DOUBLE)), 2)
                     + POW(1.0 - CAST(s1 AS DOUBLE)
                           / (3.0 * CAST(n_items AS DOUBLE)), 2)))
                 / (1.0
                    - (POW(CAST(s1 AS DOUBLE) / (3.0 * CAST(n_items AS DOUBLE)), 2)
                       + POW(1.0 - CAST(s1 AS DOUBLE)
                             / (3.0 * CAST(n_items AS DOUBLE)), 2))), 6) AS kappa
    FROM sums
    """,
    tags=("evaluation", "agreement", "fleiss-kappa"),
)
def eval_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa across THREE deterministic quality raters per
    document (length gate ≥30 tokens; diversity gate 2·distinct ≥
    total; their conjunction) — the multi-rater agreement statistic a
    labeling pipeline runs before trusting majority-vote labels, and
    the n-rater generalization of stats_cohens_kappa (which compares
    exactly two). The third rater is deliberately correlated with both
    gates, the realistic ensemble case.

    Formula: per item Pᵢ = (Σⱼ nᵢⱼ² − n)/(n(n−1)) with n=3 raters and
    binary categories, P̄ = mean Pᵢ; chance agreement P_e = Σⱼ p̄ⱼ²
    from the pooled category shares; κ = (P̄ − P_e)/(1 − P_e).

    Exactness: vote counts are integers; Σn₁ and Σ(n₁² + n₀²) are
    exact integer aggregates, so P̄, P_e and κ are fixed double
    expressions over two exact integers — no ordering anywhere.

    Scale shape: one scan with per-row token-array work, one global
    partial aggregate to a single row — the cheapest possible shape;
    at 100 TB the token pass dominates and is embarrassingly
    parallel."""
    from serverless_datalake_spark.operators import textops

    d = load_table(spark, sf_dir, "documents")
    toks = textops.tokens(F.col("text"))
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    ra = F.when(n >= 30, 1).otherwise(0)
    rb = F.when(nd * 2 >= n, 1).otherwise(0)
    rc = F.when((n >= 30) & (nd * 2 >= n), 1).otherwise(0)
    d38 = "decimal(38,0)"
    votes = d.select((ra + rb + rc).alias("n1"))
    n1d38 = F.col("n1").cast(d38)
    n0d38 = (F.lit(3) - F.col("n1")).cast(d38)
    sums = votes.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("n1").cast("long").alias("s1"),
        F.sum(n1d38 * n1d38 + n0d38 * n0d38).cast("long").alias("ssq"),
    )
    nI = F.col("n_items").cast("double")
    p_bar = (F.col("ssq").cast("double") - F.lit(3.0) * nI) / (F.lit(6.0) * nI)
    p1 = F.col("s1").cast("double") / (F.lit(3.0) * nI)
    p_e = F.pow(p1, 2) + F.pow(F.lit(1.0) - p1, 2)
    return sums.select(
        "n_items",
        F.round(p_bar, 6).alias("p_bar"),
        F.round(p_e, 6).alias("p_e"),
        F.round((p_bar - p_e) / (F.lit(1.0) - p_e), 6).alias("kappa"),
    )


@query(
    "eval_krippendorff_alpha",
    oracle="""
    WITH t AS (
      SELECT list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ), votes AS (
      SELECT (CASE WHEN len(toks) >= 30 THEN 1 ELSE 0 END)
             + (CASE WHEN len(list_distinct(toks)) * 2 >= len(toks)
                THEN 1 ELSE 0 END)
             + (CASE WHEN len(toks) >= 30
                      AND len(list_distinct(toks)) * 2 >= len(toks)
                THEN 1 ELSE 0 END) AS n1
      FROM t
    ), sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(SUM(n1) AS BIGINT) AS s1,
             CAST(SUM(CAST(n1 AS HUGEINT) * CAST(3 - n1 AS HUGEINT)) AS BIGINT)
               AS dd
      FROM votes
    )
    SELECT n_items,
           ROUND(CAST(dd AS DOUBLE) / (3.0 * CAST(n_items AS DOUBLE)), 6) AS d_o,
           ROUND(2.0 * CAST(s1 AS DOUBLE)
                 * (3.0 * CAST(n_items AS DOUBLE) - CAST(s1 AS DOUBLE))
                 / (3.0 * CAST(n_items AS DOUBLE)
                    * (3.0 * CAST(n_items AS DOUBLE) - 1.0)), 6) AS d_e,
           ROUND(1.0 - (3.0 * CAST(n_items AS DOUBLE) - 1.0)
                       * CAST(dd AS DOUBLE)
                       / (2.0 * CAST(s1 AS DOUBLE)
                          * (3.0 * CAST(n_items AS DOUBLE)
                             - CAST(s1 AS DOUBLE))), 6) AS alpha
    FROM sums
    """,
    tags=("evaluation", "agreement", "krippendorff"),
)
def eval_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (nominal, binary) over the SAME three
    deterministic quality raters as eval_fleiss_kappa — deliberately
    paired so the two agreement coefficients are comparable on one
    panel: Fleiss models chance from per-RATER pooled shares, alpha
    from the pooled VALUE distribution with a small-sample (n-1)
    correction, which is why alpha is the one content-analysis
    standards bodies require and the one that stays defined when
    raters vary per item.

    Closed form for n_i = 3 raters, binary categories: with N items,
    s1 = total 1-votes, D = Sum n_i1*n_i0 (the per-item disagreeing
    pair mass), n = 3N pairable values: observed disagreement D_o =
    D/n, expected D_e = 2*s1*(n - s1)/(n*(n-1)), alpha = 1 -
    (n-1)*D/(2*s1*(n-s1)). Every input is an exact integer aggregate,
    so both engines evaluate one identical double expression — no
    ordering anywhere.

    Scale shape: identical to eval_fleiss_kappa — one token-array
    scan pass, one global partial aggregate to a single row; the 100
    TB cost is the embarrassingly parallel token pass."""
    from serverless_datalake_spark.operators import textops

    d = load_table(spark, sf_dir, "documents")
    toks = textops.tokens(F.col("text"))
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    ra = F.when(n >= 30, 1).otherwise(0)
    rb = F.when(nd * 2 >= n, 1).otherwise(0)
    rc = F.when((n >= 30) & (nd * 2 >= n), 1).otherwise(0)
    d38 = "decimal(38,0)"
    votes = d.select((ra + rb + rc).alias("n1"))
    sums = votes.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("n1").cast("long").alias("s1"),
        F.sum(F.col("n1").cast(d38) * (F.lit(3) - F.col("n1")).cast(d38))
        .cast("long")
        .alias("dd"),
    )
    nI = F.col("n_items").cast("double")
    s1 = F.col("s1").cast("double")
    dd = F.col("dd").cast("double")
    nv = F.lit(3.0) * nI
    return sums.select(
        "n_items",
        F.round(dd / nv, 6).alias("d_o"),
        F.round(F.lit(2.0) * s1 * (nv - s1) / (nv * (nv - F.lit(1.0))), 6).alias("d_e"),
        F.round(
            F.lit(1.0) - (nv - F.lit(1.0)) * dd / (F.lit(2.0) * s1 * (nv - s1)), 6
        ).alias("alpha"),
    )


@query(
    "model_isotonic_pava",
    oracle=f"""
    WITH {SCORED_GATE_SQL}, scored AS (
      SELECT ROUND(conf_raw, 4) AS conf, label FROM gate
    ), bins AS (
      SELECT LEAST(CAST(FLOOR(conf * 100.0) AS BIGINT), 99) AS b,
             CAST(COUNT(*) AS BIGINT) AS w,
             CAST(SUM(label) AS BIGINT) AS p
      FROM scored GROUP BY 1
    ), pref AS (
      SELECT b, w, p,
             SUM(w) OVER (ORDER BY b) AS wc,
             SUM(p) OVER (ORDER BY b) AS pc
      FROM bins
    ), pairs AS (
      SELECT i.b AS bi, j.b AS bj,
             CAST(j.pc - (i.pc - i.p) AS DOUBLE)
               / CAST(j.wc - (i.wc - i.w) AS DOUBLE) AS m
      FROM pref i JOIN pref j ON i.b <= j.b
    ), mn AS (
      SELECT bi, bj, MIN(m) OVER (PARTITION BY bi ORDER BY bj DESC) AS mn
      FROM pairs
    ), fit AS (
      SELECT bj AS b, MAX(mn) AS fitted FROM mn GROUP BY 1
    )
    SELECT bins.b AS bin, bins.w AS n_bin,
           ROUND(CAST(bins.p AS DOUBLE) / CAST(bins.w AS DOUBLE), 6) AS raw_rate,
           ROUND(fit.fitted, 6) AS fitted_rate
    FROM bins JOIN fit ON bins.b = fit.b
    """,
    tags=("model", "calibration", "isotonic"),
)
def model_isotonic_pava(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (monotone non-decreasing) calibration of the quality
    gate's confidence score — the nonparametric recalibration map a
    pipeline fits when eval_calibration_ece shows the raw scores are
    dishonest but their RANKING is trusted (isotonic regression is
    the standard post-hoc calibrator next to Platt scaling, which
    model_logreg_quality_fit covers parametrically). Same (conf,
    label) derivation as eval_calibration_ece, so the two tables
    read side by side.

    PAVA itself is a sequential pool-adjacent-violators sweep — the
    wrong shape for SQL twins — so both engines compute the fit by
    the EQUIVALENT minimax identity fitted(k) = max_{i<=k} min_{j>=k}
    mean(y[i..j]) at the CENTILE-BIN grain (<=100 weighted bins):
    prefix sums give every interval mean as one division of exact
    integer differences, a per-i reversed running min gives the inner
    min, and a per-bin max gives the outer max. Bin-grain isotonic
    with bin weights equals row-grain isotonic on tied scores, and
    min/max over bit-identical doubles are bit-identical.

    Scale shape: one corpus scan reduces to a <=100-row weighted bin
    relation (pinned; feeds both sides of the pair join). Everything
    after — the <=100-row cumulative window (domain-bounded,
    allowlisted), the <=5050-row pair relation, its per-i window and
    the final rollup — is constant-size, independent of corpus
    rows."""
    scored = scored_gate(load_table(spark, sf_dir, "documents")).select(
        F.round(F.col("conf_raw"), 4).alias("conf"), "label"
    )
    bins = (
        scored.groupBy(
            F.least(F.floor(F.col("conf") * 100.0).cast("long"), F.lit(99).cast("long")).alias("b")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("w"),
            F.sum("label").cast("long").alias("p"),
        )
        .transform(_pin)  # feeds the cum window + both pair-join sides + output join
    )
    cum = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pref = bins.select(
        "b",
        "w",
        "p",
        F.sum("w").over(cum).alias("wc"),
        F.sum("p").over(cum).alias("pc"),
    ).transform(_pin)  # both sides of the pair join
    i, j = pref.alias("i"), pref.alias("j")
    pairs = i.join(F.broadcast(j), F.col("i.b") <= F.col("j.b")).select(
        F.col("i.b").alias("bi"),
        F.col("j.b").alias("bj"),
        (
            (F.col("j.pc") - (F.col("i.pc") - F.col("i.p"))).cast("double")
            / (F.col("j.wc") - (F.col("i.wc") - F.col("i.w"))).cast("double")
        ).alias("m"),
    )
    rev = (
        Window.partitionBy("bi")
        .orderBy(F.col("bj").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    mn = pairs.select("bi", "bj", F.min("m").over(rev).alias("mn"))
    fit = mn.groupBy(F.col("bj").alias("fb")).agg(F.max("mn").alias("fitted"))
    return bins.join(fit, F.col("b") == F.col("fb")).select(
        F.col("b").alias("bin"),
        F.col("w").alias("n_bin"),
        F.round(F.col("p").cast("double") / F.col("w").cast("double"), 6).alias(
            "raw_rate"
        ),
        F.round(F.col("fitted"), 6).alias("fitted_rate"),
    )


# reciprocal-rank table 1/r, r = 1..5, as exact e9-integer literals in
# both engines (the _NDCG_DISC_E9 trick): contributions sum as exact
# integers, so no float-order concern exists.
_MRR_RECIP_E9 = [round(1.0 / r * 1e9) for r in range(1, 6)]


def _mrr_oracle() -> str:
    from serverless_datalake_spark.queries import REGISTRY

    bf = REGISTRY["sim_topk_bruteforce"].oracle
    legs = {k: REGISTRY[v].oracle for k, v in _ANN_EVAL_LEGS.items()}
    recip = " ".join(
        f"WHEN {r + 1} THEN CAST({v} AS BIGINT)"
        for r, v in enumerate(_MRR_RECIP_E9)
    )
    per = []
    for name, leg in legs.items():
        per.append(
            f"""
    SELECT '{name}' AS system,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           ROUND(CAST(SUM(rr_e9) AS DOUBLE)
                 / (1000000000.0 * CAST(COUNT(*) AS DOUBLE)), 6) AS mrr_at_5
    FROM (
      SELECT t.query_id,
             COALESCE(MAX(CASE c.rank {recip} ELSE CAST(0 AS BIGINT) END),
                      CAST(0 AS BIGINT)) AS rr_e9
      FROM (SELECT query_id, corpus_id FROM bf WHERE rank = 1) t
      LEFT JOIN ({leg}) c
        ON c.query_id = t.query_id AND c.corpus_id = t.corpus_id
      GROUP BY t.query_id
    )"""
        )
    return f"WITH bf AS ({bf})\n" + "\n    UNION ALL".join(per)


@query("eval_mrr_at_5", oracle=_mrr_oracle(), tags=("evaluation", "retrieval", "mrr"))
def eval_mrr_at_5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean reciprocal rank of the EXACT nearest neighbor inside each
    ANN leg's top-5 — the single-relevant-item retrieval metric
    (nDCG@5 scores the whole graded list; MRR answers "how far down
    is THE answer", which is what link-level dedup and
    query-suggestion consumers feel). Truth = the brute-force
    rank-1 neighbor per query; a leg that misses it entirely scores
    0 for that query.

    The reciprocal table 1/r is precomputed into identical e9-integer
    literals for both engines, so per-query contributions and their
    sum are exact integers (the eval_ndcg_at_5 discipline); the mean
    is one double division at the end.

    Scale shape: the truth relation is 1 row per query (pinned
    brute-force leg, sampled in production as in sim_recall_eval);
    each leg joins its <=5-row-per-query shortlist against it and
    reduces to one row per system — constant-size beyond the legs'
    own plans."""
    from serverless_datalake_spark.queries import REGISTRY

    truth = (
        REGISTRY["sim_topk_bruteforce"]
        .fn(spark, sf_dir)
        .where(F.col("rank") == 1)
        .select(F.col("query_id").alias("tq"), F.col("corpus_id").alias("tc"))
        .transform(_pin)
    )
    recip_map = F.create_map(
        *[x for r, v in enumerate(_MRR_RECIP_E9) for x in (F.lit(r + 1), F.lit(v))]
    )
    outs = []
    for name, qname in sorted(_ANN_EVAL_LEGS.items()):
        cand = (
            REGISTRY[qname]
            .fn(spark, sf_dir)
            .select("query_id", "corpus_id", F.col("rank").cast("int").alias("rank"))
        )
        per_q = (
            truth.join(
                cand,
                (F.col("query_id") == F.col("tq")) & (F.col("corpus_id") == F.col("tc")),
                "left",
            )
            .groupBy("tq")
            .agg(
                F.coalesce(
                    F.max(
                        F.coalesce(
                            F.element_at(recip_map, F.col("rank")),
                            F.lit(0).cast("long"),
                        )
                    ),
                    F.lit(0).cast("long"),
                ).alias("rr_e9")
            )
        )
        outs.append(
            per_q.agg(
                F.lit(name).alias("system"),
                F.count(F.lit(1)).cast("long").alias("n_queries"),
                F.round(
                    F.sum("rr_e9").cast("double")
                    / (F.lit(1000000000.0) * F.count(F.lit(1)).cast("double")),
                    6,
                ).alias("mrr_at_5"),
            ).select("system", "n_queries", "mrr_at_5")
        )
    return _union_all(outs)


# --------------------------------------------------------------------------
# quantized Lloyd's k-means, 2 iterations, k=4 — in-plane clustering

_KM_K = 4
_KM_ITERS = 2


def _kmeans_oracle() -> str:
    """Unrolled Lloyd iterations as MATERIALIZED CTEs (the round-4
    lesson: a per-round CTE referenced twice inlines 2^t times
    without AS MATERIALIZED)."""
    dist = (
        "list_aggregate(list_transform(list_zip(p.qv, c.cv),"
        " z -> (z[1] - z[2]) * (z[1] - z[2])), 'sum')"
    )
    parts = [
        f"""
    WITH pts AS MATERIALIZED (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 64.0) AS BIGINT)) AS qv
      FROM embeddings
    ), c0 AS MATERIALIZED (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS j,
             qv AS cv
      FROM (SELECT vec_id, qv FROM pts ORDER BY vec_id LIMIT {_KM_K})
    )"""
    ]
    prev = "c0"
    for t in range(1, _KM_ITERS + 2):
        parts.append(
            f""", d{t} AS (
      SELECT p.vec_id, p.qv, c.j, {dist} AS dist
      FROM pts p CROSS JOIN {prev} c
    ), a{t} AS MATERIALIZED (
      SELECT vec_id, qv, j, dist FROM (
        SELECT vec_id, qv, j, dist,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, j) AS rn
        FROM d{t}
      ) WHERE rn = 1
    )"""
        )
        if t <= _KM_ITERS:
            parts.append(
                f""", u{t} AS (
      SELECT j, generate_subscripts(qv, 1) AS dim, unnest(qv) AS v FROM a{t}
    ), s{t} AS (
      SELECT j, dim, CAST(SUM(v) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
      FROM u{t} GROUP BY 1, 2
    ), m{t} AS (
      SELECT j, list(CAST(FLOOR(CAST(2 * s + n AS DOUBLE)
                                / CAST(2 * n AS DOUBLE)) AS BIGINT)
                     ORDER BY dim) AS cv
      FROM s{t} GROUP BY 1
    ), c{t} AS MATERIALIZED (
      SELECT c.j, COALESCE(m{t}.cv, c.cv) AS cv
      FROM {prev} c LEFT JOIN m{t} ON m{t}.j = c.j
    )"""
            )
            prev = f"c{t}"
    final = _KM_ITERS + 1
    parts.append(
        f"""
    SELECT j AS cluster, CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(dist) AS BIGINT) AS wss,
           ROUND(CAST(SUM(dist) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
             AS mean_dist
    FROM a{final} GROUP BY 1"""
    )
    return "".join(parts)


@query(
    "model_kmeans_lloyd",
    oracle=_kmeans_oracle(),
    tags=("model", "clustering", "kmeans"),
)
def model_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means (k = 4, 2 iterations) over INTEGER-QUANTIZED
    embeddings — the in-plane clustering primitive behind IVF coarse
    quantizers (operators/similarity.py trains one imperatively with
    numpy inside mapInPandas; this is the declarative twin the
    engine exposes as a query, and the cross-engine-exact variant).
    Quantization floor(x*64) makes every distance an exact integer,
    so assignments — argmin with ties broken toward the lower
    centroid id — are bit-identical across engines with NO float
    tolerance anywhere; centroid updates round half-up to the integer
    grid via floor((2*sum + n)/(2n)), keeping iteration t+1's inputs
    exact integers too (the "integer k-means" used by PQ codebook
    trainers on the residual grid). Deterministic seeding from the 4
    lowest vec_ids; an emptied cluster keeps its previous centroid.

    Scale shape per iteration: assignment is a per-row argmin against
    a BROADCAST 1-row array of k centroids (zero shuffle, qv never
    moves); the update posexplodes assigned vectors to (cluster, dim)
    grain, which partial-aggregates map-side to k*64 rows before the
    only shuffle. The oracle unrolls the same two iterations as
    MATERIALIZED CTEs. At 100 TB: the scan dominates; k*d state is
    constant. Caveat pinned in-code: the floor((2s+n)/2n) double
    division is exact while 2s+n < 2^53 — beyond that, cast the sums
    to DECIMAL(38,0) first."""
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.floor(x.cast("double") * 64.0).cast("long")
        ).alias("qv"),
    ).transform(_pin)  # feeds every assignment pass + the seed
    w4 = Window.orderBy("vec_id")
    c = (
        pts.orderBy("vec_id")
        .limit(_KM_K)
        .select((F.row_number().over(w4) - 1).cast("long").alias("j"), F.col("qv").alias("cv"))
    )

    def cents_row(cdf):
        return cdf.agg(
            F.array_sort(F.collect_list(F.struct("j", "cv"))).alias("cents")
        )

    def assign(cdf):
        a = pts.crossJoin(F.broadcast(cents_row(cdf)))
        dists = F.transform(
            F.col("cents"),
            lambda cc: F.aggregate(
                F.zip_with(F.col("qv"), cc["cv"], lambda q, v: (q - v) * (q - v)),
                F.lit(0).cast("long"),
                lambda s, x: s + x,
            ),
        )
        pos = F.array_position(dists, F.array_min(dists)).cast("int")
        return a.select(
            "vec_id",
            "qv",
            (pos - 1).cast("long").alias("j"),
            F.element_at(dists, pos).alias("dist"),
        )

    for _ in range(_KM_ITERS):
        assigned = assign(c)
        upd = (
            assigned.select("j", F.posexplode("qv").alias("dim", "v"))
            .groupBy("j", "dim")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .select(
                "j",
                "dim",
                F.floor(
                    (2 * F.col("s") + F.col("n")).cast("double")
                    / (2 * F.col("n")).cast("double")
                ).cast("long").alias("cvd"),
            )
            .groupBy("j")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "cvd"))),
                    lambda s: s["cvd"],
                ).alias("cv_new")
            )
        )
        c = (
            c.alias("o")
            .join(F.broadcast(upd.alias("n")), F.col("o.j") == F.col("n.j"), "left")
            .select(
                F.col("o.j").alias("j"),
                F.coalesce(F.col("cv_new"), F.col("o.cv")).alias("cv"),
            )
            .transform(_pin)  # iteration boundary: feeds next assign + guard join
        )
    final = assign(c)
    return final.groupBy(F.col("j").alias("cluster")).agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.sum("dist").cast("long").alias("wss"),
        F.round(
            F.sum("dist").cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("mean_dist"),
    )


@query(
    "eval_kendall_w",
    oracle="""
    WITH ma AS (
      SELECT CAST(c_nationkey AS BIGINT) AS g,
             CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS HUGEINT)
               AS v,
             CAST(COUNT(*) AS BIGINT) AS n_cust
      FROM customer GROUP BY 1
    ), mc AS (
      SELECT CAST(c.c_nationkey AS BIGINT) AS g,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT))
                  AS HUGEINT) AS v
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1
    ), ranks AS (
      SELECT ma.g,
             CAST(ROW_NUMBER() OVER (ORDER BY ma.v DESC, ma.g) AS BIGINT)
               + CAST(ROW_NUMBER() OVER (ORDER BY ma.n_cust DESC, ma.g)
                      AS BIGINT)
               + CAST(ROW_NUMBER() OVER (ORDER BY mc.v DESC, ma.g) AS BIGINT)
               AS r
      FROM ma JOIN mc ON ma.g = mc.g
    ), sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM((2 * r - 3 * (CAST((SELECT COUNT(*) FROM ranks)
                                         AS BIGINT) + 1))
                      * (2 * r - 3 * (CAST((SELECT COUNT(*) FROM ranks)
                                           AS BIGINT) + 1))) AS BIGINT) AS s4
      FROM ranks
    )
    SELECT n AS n_items,
           CAST(3 AS BIGINT) AS m_judges,
           ROUND(3.0 * CAST(s4 AS DOUBLE)
                 / (9.0 * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                           * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))), 6) AS w,
           ROUND(3.0 * (CAST(n AS DOUBLE) - 1.0)
                 * (3.0 * CAST(s4 AS DOUBLE)
                    / (9.0 * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                              * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))), 6)
             AS chi2_approx
    FROM sums
    """,
    tags=("evaluation", "agreement", "concordance"),
)
def eval_kendall_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's coefficient of concordance W across three rankers of
    the 25 nations — total customer balance, customer count, total
    order value — the many-RANKERS agreement statistic that completes
    the panel family (Cohen/Fleiss/Krippendorff score categorical
    votes; W scores full rankings, which is what LLM-judge ensembles
    and metric leaderboards produce). W = 12.S/(m^2(n^3-n)) with S the
    squared deviation of rank sums from their mean m(n+1)/2.

    Exactness: ranks are row_number permutations (deterministic
    nation tie-break), so S is computed DOUBLED — (2r - m(n+1))^2
    sums to 4S as exact integers whatever the parity of m(n+1) — and
    both engines evaluate one identical double expression (the
    doubled-mid-rank discipline from stats_kruskal_wallis).

    Scale shape: two fact scans reduce to 25-row metric relations
    (the orders scan joins the customer dim on its key — co-keyed
    hash join); ranking runs three windows over the JOINED 25-row
    relation (domain-bounded, allowlisted); the rest is a single-row
    fold. Scan-bound at 100 TB."""
    cust = load_table(spark, sf_dir, "customer")
    ords = load_table(spark, sf_dir, "orders")
    d38 = "decimal(38,0)"
    ma = cust.groupBy(F.col("c_nationkey").cast("long").alias("g")).agg(
        F.sum(F.round(F.col("c_acctbal") * 100, 0).cast(d38)).alias("v"),
        F.count(F.lit(1)).cast("long").alias("n_cust"),
    )
    mc = (
        ords.join(cust.select("c_custkey", "c_nationkey"),
                  ords["o_custkey"] == cust["c_custkey"])
        .groupBy(F.col("c_nationkey").cast("long").alias("g"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100, 0).cast(d38)).alias("v"))
    )
    j = ma.join(mc.select(F.col("g").alias("g2"), F.col("v").alias("v2")),
                F.col("g") == F.col("g2"))
    r1 = F.row_number().over(Window.orderBy(F.col("v").desc(), F.col("g")))
    r2 = F.row_number().over(Window.orderBy(F.col("n_cust").desc(), F.col("g")))
    r3 = F.row_number().over(Window.orderBy(F.col("v2").desc(), F.col("g")))
    ranks = j.select(
        "g", (r1.cast("long") + r2.cast("long") + r3.cast("long")).alias("r")
    ).transform(_pin)  # feeds its own count branch + the deviation sum
    ranks = ranks.crossJoin(
        F.broadcast(ranks.agg(F.count(F.lit(1)).cast("long").alias("n")))
    )
    dev = 2 * F.col("r") - 3 * (F.col("n") + 1)
    sums = ranks.groupBy("n").agg(F.sum(dev * dev).cast("long").alias("s4"))
    nD = F.col("n").cast("double")
    w = F.lit(3.0) * F.col("s4").cast("double") / (F.lit(9.0) * (nD * nD * nD - nD))
    return sums.select(
        F.col("n").alias("n_items"),
        F.lit(3).cast("long").alias("m_judges"),
        F.round(w, 6).alias("w"),
        F.round(F.lit(3.0) * (nD - F.lit(1.0)) * w, 6).alias("chi2_approx"),
    )


@query(
    "eval_mbr_select",
    oracle="""
    WITH cands AS (
      SELECT doc_id,
             (doc_id // 23) % 8 AS task_id,
             list_distinct(list_filter(string_split(text, ' '),
                                       x -> x <> '')) AS toks
      FROM documents WHERE doc_id % 23 = 0
    ), sizes AS (
      SELECT doc_id, task_id, len(toks) AS sz FROM cands
    ), posting AS (
      SELECT task_id, doc_id, unnest(toks) AS tok FROM cands
    ), ovl AS (
      SELECT a.task_id, a.doc_id AS da, b.doc_id AS db,
             CAST(COUNT(*) AS BIGINT) AS inter
      FROM posting a JOIN posting b
        ON a.task_id = b.task_id AND a.tok = b.tok AND a.doc_id <> b.doc_id
      GROUP BY 1, 2, 3
    ), sims AS (
      SELECT o.task_id, o.da,
             CAST(ROUND(2.0 * CAST(o.inter AS DOUBLE)
                        / CAST(sa.sz + sb.sz AS DOUBLE) * 1e9, 0) AS BIGINT)
               AS sim_e9
      FROM ovl o
      JOIN sizes sa ON sa.doc_id = o.da
      JOIN sizes sb ON sb.doc_id = o.db
    ), per_cand AS (
      SELECT s.task_id, s.doc_id,
             COALESCE(t.tot, 0) AS tot,
             k.k
      FROM sizes s
      JOIN (SELECT task_id, CAST(COUNT(*) AS BIGINT) AS k
            FROM cands GROUP BY 1) k ON k.task_id = s.task_id
      LEFT JOIN (SELECT task_id, da, CAST(SUM(sim_e9) AS BIGINT) AS tot
                 FROM sims GROUP BY 1, 2) t
        ON t.task_id = s.task_id AND t.da = s.doc_id
      WHERE k.k >= 2
    ), scored AS (
      SELECT task_id, doc_id, k,
             CAST(tot AS DOUBLE) / (1e9 * CAST(k - 1 AS DOUBLE)) AS mbr,
             ROW_NUMBER() OVER (
               PARTITION BY task_id
               ORDER BY CAST(tot AS DOUBLE) / (1e9 * CAST(k - 1 AS DOUBLE))
                        DESC, doc_id) AS rn
      FROM per_cand
    )
    SELECT task_id, doc_id AS winner_doc_id, k AS n_candidates,
           ROUND(mbr, 6) AS mbr_score
    FROM scored WHERE rn = 1
    """,
    tags=("evaluation", "generation", "mbr"),
)
def eval_mbr_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-Bayes-risk consensus selection: within each candidate
    group, pick the candidate with the highest MEAN similarity to its
    peers — the MBR decoding / self-consistency selection rule an LLM
    sampling pipeline applies to N generations per prompt (here:
    sampled documents grouped into 8 tasks stand in for N candidates
    per prompt; similarity = F1 over distinct token sets, the
    unigram-overlap kernel of eval_rouge1_pairs).

    Scale discipline: pairwise overlap is computed at the TOKEN-
    POSTINGS grain — a (task, token) self-join of the inverted
    candidate-token relation — never as an array cross-join of
    candidates, so cost is bounded by shared-token postings (the
    dedup_minhash_pairs shape); zero-overlap pairs never materialize
    and contribute 0 through the left join. Per-pair similarities
    quantize to e9 integers so per-candidate totals are EXACT sums
    (order-free, map-side combinable); the winner is a deterministic
    (score, doc_id) rank within task.

    Scale shape: one scan -> postings explode -> one (task, token)
    shuffle -> candidate-grain rollup -> task-grain top-1
    (WindowGroupLimit, partitioned by task). Candidate-set sizes are
    the knob, exactly as in production MBR (N is 8-64)."""
    from serverless_datalake_spark.operators import textops

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 23 == 0)
    cands = d.select(
        "doc_id",
        ((F.col("doc_id") / 23).cast("long") % 8).alias("task_id"),
        F.array_distinct(textops.tokens(F.col("text"))).alias("toks"),
    ).transform(_pin)  # feeds sizes + postings + the k rollup
    sizes = cands.select("doc_id", "task_id", F.size("toks").alias("sz"))
    posting = cands.select("task_id", "doc_id", F.explode("toks").alias("tok"))
    a = posting.alias("a")
    b = posting.select(
        F.col("task_id").alias("tb"), F.col("doc_id").alias("db"),
        F.col("tok").alias("kb"),
    )
    ovl = (
        a.join(
            b,
            (F.col("task_id") == F.col("tb"))
            & (F.col("tok") == F.col("kb"))
            & (F.col("doc_id") != F.col("db")),
        )
        .groupBy("task_id", F.col("doc_id").alias("da"), "db")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("da2"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("db2"), F.col("sz").alias("szb"))
    sims = (
        ovl.join(sa, F.col("da") == F.col("da2"))
        .join(sb, F.col("db") == F.col("db2"))
        .select(
            "task_id",
            "da",
            F.round(
                F.lit(2.0)
                * F.col("inter").cast("double")
                / (F.col("sza") + F.col("szb")).cast("double")
                * 1e9,
                0,
            )
            .cast("long")
            .alias("sim_e9"),
        )
    )
    k = cands.groupBy("task_id").agg(F.count(F.lit(1)).cast("long").alias("k"))
    tot = sims.groupBy("task_id", "da").agg(F.sum("sim_e9").cast("long").alias("tot"))
    per_cand = (
        sizes.join(F.broadcast(k), "task_id")
        .where(F.col("k") >= 2)
        .join(
            tot.select(
                F.col("task_id").alias("t2"), F.col("da"), F.col("tot")
            ),
            (F.col("t2") == F.col("task_id")) & (F.col("da") == F.col("doc_id")),
            "left",
        )
        .select(
            "task_id",
            "doc_id",
            "k",
            F.coalesce(F.col("tot"), F.lit(0)).cast("long").alias("tot"),
        )
    )
    mbr = F.col("tot").cast("double") / (
        F.lit(1e9) * (F.col("k") - 1).cast("double")
    )
    w = Window.partitionBy("task_id").orderBy(mbr.desc(), F.col("doc_id"))
    return (
        per_cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "task_id",
            F.col("doc_id").alias("winner_doc_id"),
            F.col("k").alias("n_candidates"),
            F.round(mbr, 6).alias("mbr_score"),
        )
    )
