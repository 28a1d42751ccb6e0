"""Materialized search indexes: the at-rest layouts that make ANN and
near-dup probes partition-pruned scans instead of corpus scans.

`topk_lsh`/`minhash_near_dups` compute signatures on the fly — right
for one-shot jobs. A standing corpus instead materializes the
signature ONCE and lays the data out by bucket:

  build_ann_index:    embeddings → parquet partitioned by bucket=<lsh>
  probe_ann_index:    bucket(query) → read ONLY that partition
                      (plan shows PartitionFilters on bucket)

At 100 TB this is the difference between "every query scans 100 TB"
and "every query scans 100 TB / n_buckets". The same pattern applies
to the MinHash band table (build_dedup_index).

Every build writes a `_index_params.json` sidecar (hash family /
k / bands / planes / dim / column names); probes VALIDATE their
arguments against it. A probe hashed with different parameters than
the build silently returns zero candidates — admission control would
wave every duplicate through with no error — so the mismatch is loud
instead (the round-6 review's finding; same contract as a real
index's metadata footer).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from serverless_datalake_spark.operators import dedup as dedup_ops
from serverless_datalake_spark.operators import similarity as sim

_PARAMS_NAME = "_index_params.json"


def _write_params(path: str, params: dict) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _PARAMS_NAME), "w") as f:
        json.dump(params, f)


def _check_params(path: str, expected: dict) -> None:
    """Raise when probe arguments disagree with the build sidecar.
    A missing sidecar (pre-existing index) skips validation — the
    legacy behavior, just no longer the only behavior."""
    p = os.path.join(path, _PARAMS_NAME)
    if not os.path.exists(p):
        return
    with open(p) as f:
        built = json.load(f)
    diffs = {
        k: (built[k], v)
        for k, v in expected.items()
        if k in built and built[k] != v
    }
    if diffs:
        raise ValueError(
            f"index at {path} was built with different parameters: "
            + ", ".join(f"{k}: built={b!r} probe={q!r}" for k, (b, q) in diffs.items())
            + " — a mismatched probe returns zero candidates silently"
        )


def build_ann_index(
    corpus: DataFrame,
    path: str,
    corpus_id: str = "corpus_id",
    vec: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
) -> None:
    """Write the corpus partitioned by its hyperplane-LSH bucket."""
    indexed = corpus.select(
        F.col(corpus_id),
        F.col(vec),
        sim.lsh_bucket_arrow(vec, n_planes, dim).alias("bucket"),
    )
    indexed.write.mode("overwrite").partitionBy("bucket").parquet(path)
    _write_params(
        path,
        {"kind": "ann_lsh", "corpus_id": corpus_id, "vec": vec,
         "n_planes": n_planes, "dim": dim},
    )


def probe_ann_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    query_id: str = "query_id",
    vec: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    corpus_id: str = "corpus_id",
) -> DataFrame:
    """Exact re-rank inside the query's bucket partition only. The
    bucket EQ predicate prunes at plan time — the index partition
    column does the work the full-corpus scan would. The corpus-side
    column names come from the build (validated via the sidecar) —
    they were hard-coded before, so any non-default build made the
    probe fail on unresolved columns."""
    _check_params(
        path,
        {"kind": "ann_lsh", "vec": vec, "n_planes": n_planes, "dim": dim,
         "corpus_id": corpus_id},
    )
    q = queries.select(
        F.col(query_id),
        F.col(vec).alias("__qv"),
        sim.lsh_bucket_arrow(vec, n_planes, dim).alias("bucket"),
    )
    c = spark.read.parquet(path)
    scored = c.join(F.broadcast(q), "bucket").select(
        query_id,
        F.col(corpus_id),
        sim.cosine(F.col("__qv"), F.col(vec)).alias("score"),
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


def build_dedup_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
) -> None:
    """Materialize the MinHash band table partitioned by band_id: an
    incoming document only joins against its own bands' buckets."""
    sigs = dedup_ops.minhash_signatures(docs, id_col, text_col, num_hashes, k)
    banded = dedup_ops.banded_membership(sigs, bands, num_hashes)
    banded.write.mode("overwrite").partitionBy("band_id").parquet(path)
    _write_params(
        path,
        {"kind": "minhash_bands", "num_hashes": num_hashes, "bands": bands,
         "k": k},
    )


def probe_dedup_index(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    corpus: DataFrame | None = None,
) -> DataFrame:
    """Incremental near-dup check: band the NEW docs only, join against
    the materialized band table, verify exact Jaccard on candidates.

    This is the production admission-control shape: each new batch
    costs O(batch × bands) bucket lookups against the standing index,
    never a rescan of the corpus. ``corpus`` supplies the text for the
    exact-verify step (pass the docs table the index was built from);
    scoring goes through dedup.jaccard_on_pairs (two-sided form), so
    the empty-vs-empty guard applies — the previous inline copy of the
    Jaccard block re-raised ANSI DIVIDE_BY_ZERO on blank-doc pairs."""
    _check_params(
        path,
        {"kind": "minhash_bands", "num_hashes": num_hashes, "bands": bands,
         "k": k},
    )
    sigs = dedup_ops.minhash_signatures(new_docs, id_col, text_col, num_hashes, k)
    new_banded = dedup_ops.banded_membership(sigs, bands, num_hashes).withColumnRenamed(
        "doc_id", "new_id"
    )
    index = spark.read.parquet(path)
    cands = (
        new_banded.join(index, ["band_id", "band_hash"])
        .where(F.col("new_id") != F.col("doc_id"))
        .select(F.col("new_id").alias("doc_a"), F.col("doc_id").alias("doc_b"))
        .distinct()
    )
    if corpus is None:
        return cands
    toks_new = dedup_ops.token_sets(new_docs, id_col, text_col)
    toks_corpus = dedup_ops.token_sets(corpus, id_col, text_col)
    return dedup_ops.jaccard_on_pairs(cands, toks_new, toks_corpus).where(
        F.col("jaccard") >= threshold
    )
