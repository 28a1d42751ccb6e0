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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from serverless_datalake_spark.operators import dedup as dedup_ops
from serverless_datalake_spark.operators import similarity as sim


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


def probe_ann_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    query_id: str = "query_id",
    vec: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Exact re-rank inside the query's bucket partition only. The
    bucket EQ predicate prunes at plan time — the index partition
    column does the work the full-corpus scan would."""
    q = queries.select(
        F.col(query_id), F.col(vec).alias("__qv"), sim.lsh_bucket_arrow(vec, n_planes, dim).alias("bucket")
    )
    c = spark.read.parquet(path)
    scored = c.join(F.broadcast(q), "bucket").select(
        query_id,
        F.col("corpus_id"),
        sim.cosine(F.col("__qv"), F.col("embedding")).alias("score"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("score").desc(), F.col("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, "corpus_id", F.round("score", 6).alias("score"), F.col("rank").cast("long").alias("rank"))
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
    exact-verify step (pass the docs table the index was built from)."""
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
    a = toks_new.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a"))
    b = toks_corpus.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b"))
    inter = F.size(F.array_intersect("toks_a", "toks_b")).cast("double")
    union = (F.size("toks_a") + F.size("toks_b")).cast("double") - inter
    return (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", F.round(inter / union, 4).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )
