#!/usr/bin/env python
"""Regenerate RECALL.md: recall@5 of every ANN system vs the exact
brute-force ground truth, at sf0.001 and sf0.01.

Run per round (`python scripts/recall_report.py`) so retrieval-quality
regressions are tracked like perf ones — an index change that keeps
plans green but silently halves recall shows up here.

Each system's candidate set is its registry query's own output
(query_id, corpus_id shortlists, ≤5 rows per query), so the numbers
measure exactly what the driver-verified queries ship.

The brute-force ground truth — the deliberately-quadratic cross-join,
the most expensive query in the registry — is computed ONCE per
sf_dir and pinned (localCheckpoint); it used to be re-executed for
every one of the ~16 scored systems per sf_dir (round-7 review
finding).
"""

from __future__ import annotations

import datetime as dt
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from serverless_datalake_spark.queries import load_registry  # noqa: E402
from serverless_datalake_spark.session import get_spark  # noqa: E402

SYSTEMS = [
    "sim_topk_lsh",
    "sim_topk_lsh_multiprobe",
    "sim_topk_lsh_indexed",
    "sim_topk_ivf",
    "sim_topk_ivf_nprobe4",
    "sim_topk_pq",
    "sim_topk_ivfpq",
    "sim_topk_ivfpq_residual",
    "sim_topk_ivfpq_rerank",
    "sim_topk_ivfpq_rerank_np4",
    "sim_topk_ivfpq_rerank_np8",
    "sim_topk_hamming",
    "sim_topk_sq8_rerank",
]

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

# sf0.1 (2000-vector corpus, 4x sf0.01) scores the SHIPPING legs only
# (round-8 verdict ask: the operating-point claims were measured at
# sf0.001/sf0.01; a 10x corpus is the cheapest test of whether
# nprobe=8 / shortlist=150 holds or needs rescaling). The baseline
# legs stay off: their 0.0-recall motivation doesn't need a 4M-pair
# brute-force ground truth re-proven every round.
SF01_DIR = "/root/testdata/sf0.1"
SHIPPING = [
    "sim_topk_ivf_nprobe4",
    "sim_topk_ivfpq_rerank_np4",
    "sim_topk_ivfpq_rerank_np8",
    "sim_topk_sq8_rerank",
]


def ground_truth(spark, reg, sf_dir: str):
    """Exact top-5 pairs, computed once per sf_dir and pinned."""
    return (
        reg["sim_topk_bruteforce"]
        .fn(spark, sf_dir)
        .select(F.col("query_id").alias("bq"), F.col("corpus_id").alias("bc"))
        .localCheckpoint(eager=True)
    )


def recall_df(bf, cand) -> tuple[int, float, float]:
    """(n_queries, mean recall@5, worst per-query recall) of a
    candidate (query_id, corpus_id) DataFrame vs the pinned truth —
    the ONE hit-counting definition every section shares."""
    c = cand.select(F.col("query_id").alias("lq"), F.col("corpus_id").alias("lc"))
    hits = (
        bf.join(c, (F.col("lq") == F.col("bq")) & (F.col("lc") == F.col("bc")), "left")
        .groupBy("bq")
        .agg(F.count("lc").alias("n_hits"))
        .agg(
            F.count(F.lit(1)).alias("nq"),
            F.sum("n_hits").alias("hits"),
            F.min("n_hits").alias("worst"),
        )
        .collect()[0]
    )
    nq = int(hits["nq"])
    return nq, int(hits["hits"]) / (5.0 * nq), int(hits["worst"]) / 5.0


def residual_vs_plain_ab(spark, sf_dir: str, bf) -> list[str]:
    """Knob-matched A/B: residual-PQ vs plain-PQ ADC at IDENTICAL
    routing (same refined centroids, same nprobe, same 8x32 code
    budget). The registry rows compare shipping operating points
    (plain@nprobe2 vs residual@nprobe4), which conflates routing with
    quantization; this section isolates the quantizer so the FAISS
    'residual encodes less energy, so it must rank better' claim is
    checked directly against this fixture."""
    from serverless_datalake_spark.operators import similarity
    from serverless_datalake_spark.queries.llm_similarity import (
        _centroid_rows, _codebook_rows, _residual_codebook_rows, _split,
    )
    from serverless_datalake_spark.tables import load_table

    queries, corpus = _split(spark, sf_dir)
    em = load_table(spark, sf_dir, "embeddings")
    corpus_lab = em.where(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("corpus_id"), "embedding", "label"
    )
    cents = _centroid_rows(sf_dir, corpus_lab)
    cb = _codebook_rows(sf_dir, corpus)
    rcb = _residual_codebook_rows(sf_dir, corpus, cents)
    rows = []
    for nprobe in (2, 4):
        plain = similarity.topk_ivfpq(
            queries, corpus_lab, k=5, nprobe=nprobe, codebook_rows=cb, centroid_rows=cents
        )
        resid = similarity.topk_ivfpq_residual(
            queries, corpus, k=5, nprobe=nprobe, centroid_rows=cents, codebook_rows=rcb
        )
        _, pm, _ = recall_df(bf, plain)
        _, rm, _ = recall_df(bf, resid)
        rows.append(f"| nprobe={nprobe} | {pm:.4f} | {rm:.4f} | {'residual' if rm > pm else ('tie' if rm == pm else 'plain')} |")
        print(f"{os.path.basename(sf_dir)} A/B nprobe={nprobe}: plain={pm:.4f} residual={rm:.4f}", flush=True)
    return rows


def main() -> None:
    spark = get_spark(app_name="recall-report")
    reg = load_registry()
    lines = [
        "# RECALL — ANN retrieval quality, regenerated per round",
        "",
        f"Generated {dt.date.today().isoformat()} by `python scripts/recall_report.py`.",
        "Ground truth: `sim_topk_bruteforce` (exact cosine top-5 per query).",
        "Each row scores the registry query's own shortlist output, so these",
        "numbers measure exactly what the driver-verified queries ship.",
        "`worst` is the minimum per-query recall (a 0.0 means some query's",
        "shortlist missed all 5 true neighbors — expected for the 1-table",
        "LSH leg, which exists to motivate multiprobe).",
        "",
        "`sim_topk_lsh` and `sim_topk_lsh_indexed` are tagged",
        "**baseline-only** in the registry (round 8, same convention as",
        "`graph_jaccard_links`'s exact-baseline demotion): they are the",
        "motivating 0.00-recall single-probe baselines, NOT serving legs —",
        "consumers should use `sim_topk_ivfpq_rerank_np8` (0.94 mean",
        "recall@5) or `sim_topk_sq8_rerank` (1.00).",
        "",
    ]
    for sf_dir in SF_DIRS:
        tag = os.path.basename(sf_dir)
        bf = ground_truth(spark, reg, sf_dir)
        lines += [f"## {tag}", "", "| system | n_queries | mean recall@5 | worst |", "|---|---|---|---|"]
        for system in SYSTEMS:
            nq, mean, worst = recall_df(bf, reg[system].fn(spark, sf_dir))
            lines.append(f"| {system} | {nq} | {mean:.4f} | {worst:.2f} |")
            print(f"{tag} {system}: mean={mean:.4f} worst={worst:.2f}", flush=True)
        lines += [
            "",
            "### residual vs plain PQ — knob-matched A/B",
            "",
            "Same refined centroids, same nprobe, same 8×32 code budget;",
            "only the quantizer differs (encode x vs encode x − centroid).",
            "The table above compares SHIPPING operating points (different",
            "nprobe), which conflates routing with quantization; this",
            "isolates the quantizer.",
            "",
            "| routing | plain-PQ mean recall@5 | residual-PQ mean recall@5 | winner |",
            "|---|---|---|---|",
            *residual_vs_plain_ab(spark, sf_dir, bf),
            "",
        ]
    # sf0.1: shipping legs only, vs the same brute-force truth
    bf01 = ground_truth(spark, reg, SF01_DIR)
    lines += [
        "## sf0.1 — shipping legs (operating-point drift check)",
        "",
        "Scored on the 2000-vector corpus (4× sf0.01) to test whether",
        "the fixed operating points (nprobe, shortlist size) hold as",
        "the corpus grows — an index whose recall decays with corpus",
        "size needs its knobs rescaled, not a new algorithm.",
        "",
        "Drift found and fixed in round 9: with shortlist FIXED at 150,",
        "`sim_topk_ivfpq_rerank_np8` decayed 0.94 → 0.78 at the 4×",
        "corpus (150 deep fell from 30% to 7.5% nomination depth; the",
        "in-cell PQ ordering error surfaces proportionally fewer of the",
        "reachable true neighbors). The leg now nominates",
        "max(150, ceil(0.3·n)) — knob-sweep at sf0.1: 150→0.78,",
        "300→0.92, 600→0.94 (nprobe=8); nprobe=10+600 reaches 1.00.",
        "`sim_topk_sq8_rerank` holds 1.00 at every scale (its shortlist",
        "is per-query rank-based, and SQ8's elementwise quantization",
        "error doesn't grow with corpus size). The 100 TB form holds",
        "CELL population constant instead (n_centroids ∝ √n) so the",
        "per-cell shortlist stays fixed — see the np8 docstring.",
        "",
        "| system | n_queries | mean recall@5 | worst |",
        "|---|---|---|---|",
    ]
    for system in SHIPPING:
        nq, mean, worst = recall_df(bf01, reg[system].fn(spark, SF01_DIR))
        lines.append(f"| {system} | {nq} | {mean:.4f} | {worst:.2f} |")
        print(f"sf0.1 {system}: mean={mean:.4f} worst={worst:.2f}", flush=True)
    lines.append("")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "RECALL.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
