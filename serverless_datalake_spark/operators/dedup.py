"""Deduplication operators for the training-data pipeline: exact,
n-gram Jaccard, MinHash+LSH, SimHash (north star, BASELINE.json).

Scale design: every variant avoids the O(n²) all-pairs join on the
full corpus —
* exact: one hash aggregate on the fingerprint;
* Jaccard verify: runs only on candidate pairs;
* MinHash-LSH: signatures are computed with array HOFs (no explode, no
  shuffle), then ONE shuffle groups signatures into (band, band-hash)
  buckets; only same-bucket pairs are generated, so cost tracks the
  number of true near-duplicates, not n²;
* SimHash: same banding trick on signature chunks.
"""

from __future__ import annotations

import hashlib
import logging

from pyspark.sql import Column, DataFrame

from serverless_datalake_spark.operators import pin as _pin
from pyspark.sql import functions as F

from serverless_datalake_spark.operators import spread_for_compute, textops

_LOG = logging.getLogger(__name__)

# Universal-hash family over a 32-bit md5-derived key:
#   x(s)  = int(md5(s)[:8 hex], 16)            (0 ≤ x < 2^32)
#   h_j(x) = (a_j * x + b_j) mod P             (P prime > 2^32)
# Every piece is computable in ANY engine (md5 + integer arithmetic),
# which is what lets the DuckDB oracle recompute MinHash/SimHash
# signatures EXACTLY instead of settling for a rows-only check. It is
# also cheaper than the previous xxhash64(s, j) family: the string is
# hashed once per shingle, then each of the 64 h_j is two int ops.
# a_j*x + b_j < 2^31 * 2^32 + 2^31 < 2^63 — no bigint overflow on
# either engine (Spark runs ANSI mode; overflow would throw).
_MINHASH_P = 4294967311  # smallest prime > 2^32


def minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_j, b_j) pairs — same constants in the Spark
    expressions and in generated oracle SQL."""
    out = []
    for j in range(num_hashes):
        da = hashlib.md5(f"minhash-a:{j}".encode()).digest()
        db = hashlib.md5(f"minhash-b:{j}".encode()).digest()
        a = (int.from_bytes(da[:4], "big") % (2**31 - 1)) + 1
        b = int.from_bytes(db[:4], "big") % (2**31)
        out.append((a, b))
    return out


def md5_key32(s: Column) -> Column:
    """First 8 hex chars of md5 as a non-negative 32-bit integer key."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def exact_dedup_survivors(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup via content fingerprint: one row per distinct
    normalized text, survivor = smallest id (deterministic)."""
    return (
        docs.select(F.col(id_col), textops.fingerprint_md5(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("survivor_id"), F.count("*").alias("n_copies"))
    )


def token_sets(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(textops.tokens(F.col(text_col))).alias("toks"),
    )


def token_sets_encoded(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """token_sets with the token strings DICTIONARY-ENCODED to dense
    ints — an exact bijection (ids assigned by rank over the distinct
    vocabulary), so intersection/size arithmetic downstream is
    IDENTICAL to the string representation while the per-doc payload
    shrinks ~10× and array_intersect hashes ints instead of strings.
    Use for candidate-pair scoring joins, where millions of pairs each
    carry two token arrays: with string arrays the saturated-banding
    case measured 13–17 s at sf0.1; encoded, ~3 s.

    Scale note: ids are assigned as (hash-bucket << 32) | rank-within-
    bucket — the window partitions by a 1024-way hash of the token, so
    id assignment is partition-parallel (a global rank window would
    serialize the whole vocabulary through one task; downstream only
    needs an injective token→int map, not dense ranks). Injectivity
    bound: the in-bucket rank occupies 32 bits, so the map stays
    injective up to 2^32 distinct tokens PER bucket (~4.4e12 total
    across the 1024 buckets) — beyond that two tokens could collide
    and corrupt downstream Jaccard; widen the shift/bucket count if a
    vocabulary ever approaches that. The broadcast of the (token, id) vocabulary is
    vocabulary-bounded — fine to ~10^7 distinct tokens (a few hundred
    MB); beyond that drop the broadcast hint (shuffle join) or keep a
    persisted vocab table.
    Docs whose token set is empty drop out (they cannot score against
    anything). The result carries a lazy localCheckpoint: scoring
    joins consume it on BOTH pair sides, and the checkpoint makes the
    explode + vocab window + re-collect run once per call, not per
    consumer."""
    from pyspark.sql import Window

    toks = token_sets(docs, id_col, text_col)
    ex = toks.select("doc_id", F.explode("toks").alias("tok"))
    bucket = F.pmod(F.xxhash64("tok"), F.lit(1024)).alias("__b")
    vocab = (
        ex.select("tok")
        .distinct()
        .withColumn("__b", bucket)
        .select(
            "tok",
            (
                F.shiftleft(F.col("__b"), 32)
                + F.row_number().over(Window.partitionBy("__b").orderBy("tok"))
            ).cast("long").alias("tid"),
        )
    )
    return (
        ex.join(F.broadcast(vocab), "tok")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("tid")).alias("toks"))
        .transform(_pin)
    )


def jaccard_on_pairs(
    pairs: DataFrame, toks: DataFrame, toks_b: DataFrame | None = None
) -> DataFrame:
    """Exact token-set Jaccard for given (doc_a, doc_b) pairs.
    `toks_b` supplies the b-side token sets when the two sides come
    from different relations (the index-probe shape); default is the
    one-relation self form. Two EMPTY sets score 1.0 — they are
    identical documents — instead of evaluating 0/0, which RAISES
    under the session's ANSI default (two whitespace-only docs used
    to kill the whole job)."""
    a = toks.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a"))
    b = (toks_b if toks_b is not None else toks).select(
        F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b")
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b")).cast("double")
    union = (F.size("toks_a") + F.size("toks_b")).cast("double") - inter
    jac = F.when(union > 0, F.round(inter / union, 4)).otherwise(F.lit(1.0))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame, id_col: str, text_col: str, threshold: float
) -> DataFrame:
    """Brute-force all-pairs Jaccard ≥ threshold. O(n²) — correctness
    baseline / oracle twin for LSH; keep off full-scale corpora."""
    toks = token_sets(docs, id_col, text_col)
    pairs = (
        toks.select(F.col("doc_id").alias("doc_a"))
        .crossJoin(toks.select(F.col("doc_id").alias("doc_b")))
        .where(F.col("doc_a") < F.col("doc_b"))
    )
    return jaccard_on_pairs(pairs, toks).where(F.col("jaccard") >= threshold)


def minhash_signatures(
    docs: DataFrame, id_col: str, text_col: str, num_hashes: int = 64, k: int = 3
) -> DataFrame:
    """num_hashes-permutation MinHash over k-word shingles.

    sig[j] = min over shingles s of (a_j·x(s) + b_j) mod P with
    x = md5_key32 (see module header: engine-portable, so the oracle
    recomputes signatures exactly). Pure HOFs — ONE pass computes the
    key per shingle, a second carries num_hashes running minima
    (64 separate array_min(transform(...)) columns would make Catalyst
    re-expand the shingle expression 64× per row — measured ~70×
    slower at sf0.1). Docs with zero shingles have no signature and
    drop out (they cannot be near-duplicates of anything).
    """
    # One F.expr SQL string instead of Column-API construction: the
    # 64×2 constant literal plus nested lambdas cost ~0.5 s of py4j
    # round trips per call site; the parsed tree is identical.
    ab_sql = "array(" + ",".join(
        f"array({a}L,{b}L)" for a, b in minhash_params(num_hashes)
    ) + ")"
    sig = F.expr(
        f"aggregate(__keys, array_repeat({_MINHASH_P}L, {num_hashes}), "
        f"(acc, x) -> zip_with(acc, {ab_sql}, "
        f"(m, p) -> least(m, (element_at(p, 1) * x + element_at(p, 2)) % {_MINHASH_P}L)))"
    )
    narrow = spread_for_compute(docs.select(F.col(id_col), F.col(text_col)))
    # tokenize in a projection BELOW the shingle lambda so the split
    # runs once per doc, not once per shingle position (SCALE.md
    # aliased-fold rule; shingles_of_tokens docstring)
    keyed = (
        narrow.select(
            F.col(id_col).alias("doc_id"),
            textops.tokens(F.col(text_col)).alias("__toks"),
        )
        # drop empty/whitespace docs at TOKEN grain: shingles_of_tokens'
        # n<k fallback gives a zero-token doc the [''] shingle, so the
        # __keys filter below never fired for them and every blank doc
        # shared one signature — a full candidate clique across all
        # bands (quadratic in the blank count) scored 0/0 downstream
        .where(F.size("__toks") > 0)
        .select(
            "doc_id",
            F.transform(
                textops.shingles_of_tokens(F.col("__toks"), k), md5_key32
            ).alias("__keys"),
        )
        .where(F.size("__keys") > 0)
    )
    return keyed.select("doc_id", sig.alias("sig"))


def banded_membership(
    signatures: DataFrame, bands: int, num_hashes: int
) -> DataFrame:
    """(doc_id, band_id, band_hash) — one row per signature band.
    band_hash = the band's sub-signature values joined with '_' — an
    engine-portable bucket key (integers format identically
    everywhere), so oracle SQL can reproduce the exact bucketing. The
    loop lives inside a transform lambda over a tiny sequence, so the
    expression tree stays a handful of nodes instead of unrolling
    bands × rows_per_band element_at literals per call site."""
    if bands < 1 or num_hashes % bands != 0:
        # r = num_hashes // bands = 0 would make every band_hash the
        # empty string (ALL docs in one bucket — the O(n²) blowup this
        # module exists to avoid, silently); a non-dividing bands
        # silently drops the tail hashes and changes the S-curve
        raise ValueError(
            f"bands={bands} must divide num_hashes={num_hashes} with rows>=1"
        )
    r = num_hashes // bands
    bb = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.cast("int").alias("band_id"),
                F.array_join(
                    F.transform(F.slice("sig", b * r + 1, r), lambda s: s.cast("string")),
                    "_",
                ).alias("band_hash"),
            ),
        )
    )
    return signatures.select("doc_id", bb.alias("bb")).select(
        "doc_id",
        F.col("bb.band_id").alias("band_id"),
        F.col("bb.band_hash").alias("band_hash"),
    )


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 16, num_hashes: int = 64
) -> DataFrame:
    """Band the signature (bands × rows_per_band) and emit pairs that
    collide in ≥1 band. The only shuffle is the bucket self-join on
    (band_id, band_hash) — Jaccard-similar docs collide whp, so output
    size tracks true near-dups."""
    # NOT pinned: both self-join sides shuffle on the same
    # (band_id, band_hash) key, so AQE's ReusedExchange serves the
    # second side from the first side's shuffle output — a pin was
    # measured SLOWER at sf0.1 (materialization > the free reuse)
    banded = banded_membership(signatures, bands, num_hashes)
    a = banded.select("band_id", "band_hash", F.col("doc_id").alias("doc_a"))
    b = banded.select("band_id", "band_hash", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, ["band_id", "band_hash"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_near_dups(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.4,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
) -> DataFrame:
    """Full MinHash-LSH near-dup join: signatures → banded candidate
    pairs → exact Jaccard verify ≥ threshold. With b=16, r=4 the LSH
    S-curve midpoint is (1/16)^(1/4) ≈ 0.5 — near-total recall at
    J ≥ 0.6, graceful below."""
    sigs = minhash_signatures(docs, id_col, text_col, num_hashes, k)
    cands = lsh_candidate_pairs(sigs, bands, num_hashes)
    toks = token_sets_encoded(docs, id_col, text_col)
    return jaccard_on_pairs(cands, toks).where(F.col("jaccard") >= threshold)


def minhash_dedup_survivors(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
) -> DataFrame:
    """Single-pass near-dup CLUSTERING — the operator a 100 TB dedup
    actually runs. Pair enumeration (minhash_near_dups) is Ω(#pairs),
    which is quadratic on self-similar corpora; clustering assigns
    every doc ``cluster_rep = min(doc_id over shared LSH buckets)``
    with NO pair join: bucket → min, doc → min over its buckets.
    Output is one row per doc: (doc_id, cluster_rep, is_survivor).

    This is one hop of union-find (docs linked only through a shared
    bucket collapse; a chain A~B~C with A,C in disjoint buckets needs
    iterating — at real scale run this repeatedly to fixpoint, each
    pass one shuffle)."""
    sigs = minhash_signatures(docs, id_col, text_col, num_hashes, k)
    # NOT pinned: the bucket-rep aggregate and the assignment join
    # shuffle the banded relation on the same (band_id, band_hash)
    # key, so AQE's ReusedExchange computes the signature fold once —
    # a pin was measured SLOWER at sf0.1 (1.53 -> 1.88 s min-of-3)
    banded = banded_membership(sigs, bands, num_hashes)
    bucket_rep = banded.groupBy("band_id", "band_hash").agg(
        F.min("doc_id").alias("bucket_rep")
    )
    assigned = (
        banded.join(bucket_rep, ["band_id", "band_hash"])
        .groupBy("doc_id")
        .agg(F.min("bucket_rep").alias("cluster_rep"))
    )
    return assigned.select(
        "doc_id",
        "cluster_rep",
        (F.col("doc_id") == F.col("cluster_rep")).alias("is_survivor"),
    )


def minhash_dedup_components(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    max_iters: int = 20,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Full connected-components dedup clustering over the LSH bucket
    graph (the transitive closure minhash_dedup_survivors skips).

    Label propagation with POINTER JUMPING to fixpoint: each round
    sets label(x) = min label over x's bucket neighbors, then jumps
    label(x) ← label(label(x)) (path halving). The jump makes chain
    components converge in O(log diameter) rounds instead of
    O(diameter) — the difference between ~40 and ~12 shuffles on a
    million-doc near-dup chain. Labels are monotone non-increasing
    (min ops only; label(y) ≤ y for every y), so convergence is
    detected by an unchanged SUM(label) — one aggregate on the cached
    labels, no join against the previous iteration.

    Although caching keeps recomputation flat, the logical plan still
    nests one level per iteration; on a large component graph that
    lineage makes every task-retry/cache-eviction recompute the whole
    chain. ``localCheckpoint`` every `checkpoint_every` iterations
    truncates it (blocks materialize on executors; no HDFS dir needed,
    matching the fault domain of the cached blocks it replaces).
    """
    sigs = minhash_signatures(docs, id_col, text_col, num_hashes, k)
    # cached: the pruned loop relation derives from it AND the final
    # singleton anti-join reads it again — uncached, the second read
    # would recompute the shingle/minhash scan pass
    all_membership = banded_membership(sigs, bands, num_hashes).distinct().cache()
    # Candidate-subgraph pruning (round 9): only buckets with >= 2
    # members constrain any label, and a doc touching no such bucket
    # is its own singleton component — it can skip the fixpoint
    # entirely. The iterated relation shrinks from |docs|*bands rows
    # to the LSH-collision subgraph (measured sf0.1: 80k -> 6.8k
    # membership rows, 5000 -> 477 label rows), and at corpus scale
    # this is the difference between iterating over 100 TB of docs
    # and iterating over the near-dup candidates only.
    from pyspark.sql import Window

    _wband = Window.partitionBy("band_id", "band_hash")
    # Bucket-size pruning via a window over the band exchange, not a
    # groupBy + join-back: a window partitioned like the preceding
    # grouping reuses ONE shuffle where the join-back spelling paid
    # two plus a join (guide §2.4) — round-10 loop rewrite.
    #
    # Eager checkpoint, not cache(): the loop's per-iteration plans
    # embed this relation's LOGICAL subtree several times, and a cache
    # does not truncate the logical plan — with the pruning in the
    # lineage the iteration trees grew ~4x per round and Catalyst/py4j
    # time dominated the loop (measured: the sf0.1 fixpoint SLOWED
    # 10.5 s -> 16 s until this cut). A flat LogicalRDD keeps every
    # iteration's tree O(labels lineage). Blocks are executor-resident
    # like the cache they replace; iteration-boundary cut, sanctioned
    # per operators.pin. The checkpoint is taken AFTER a repartition
    # on doc_id, and LogicalRDD retains that output partitioning: the
    # per-iteration label join on doc_id then never reshuffles the
    # membership side — only the (smaller) label relation moves. At
    # cluster scale this is the bucketed-layout discipline applied to
    # the loop relation.
    membership = (
        all_membership.withColumn("__n", F.count(F.lit(1)).over(_wband))
        .where(F.col("__n") >= 2)
        .drop("__n")
        .repartition("doc_id")
        .localCheckpoint(eager=True)
    )
    multi_docs = membership.select("doc_id").distinct()
    # singleton components: every doc with NO multi-member bucket —
    # resolved join-free at the end (label = own id); anti-join once
    singletons = (
        all_membership.select("doc_id")
        .distinct()
        .join(multi_docs, "doc_id", "left_anti")
        .withColumn("label", F.col("doc_id"))
    )
    labels = multi_docs.withColumn("label", F.col("doc_id"))
    # convergence statistic: integral ids sum EXACTLY in decimal(38,0)
    # (a plain long SUM can overflow under ANSI on large hash-derived
    # ids); other id types (strings etc., which F.min handles fine)
    # use an xxhash64 surrogate — its sum-equality is probabilistic
    # (~2^-64 per round false stop), documented rather than hidden
    ltype = dict(labels.dtypes)["label"]
    if ltype in ("tinyint", "smallint", "int", "bigint") or ltype.startswith(
        "decimal"
    ):
        _stat = F.sum(F.col("label").cast("decimal(38,0)"))
    else:
        _stat = F.sum(F.xxhash64(F.col("label").cast("string")).cast("decimal(38,0)"))
    prev_sum = None
    n_iters = 0
    converged = False
    for it in range(max_iters):
        # Per-iteration shape (round-10 rewrite): bucket minima come
        # from a WINDOW over the band exchange instead of a groupBy
        # whose result joined BACK against membership — the join-back
        # shuffled the membership relation a second time every round
        # (guide §2.4: a window partitioned by the aggregation key
        # shares its exchange). Iteration 0 skips the label join
        # entirely: labels are identity there, so min(label) over the
        # bucket IS min(doc_id) over the bucket.
        joined = (
            membership.withColumn("label", F.col("doc_id"))
            if it == 0
            else membership.join(labels, "doc_id")
        )
        neighbor_min = (
            joined.withColumn("bucket_label", F.min("label").over(_wband))
            .groupBy("doc_id")
            .agg(F.min("bucket_label").alias("label"))
        )
        # pointer jump: follow the label one hop (labels ARE doc ids,
        # so the lookup is a self-join of the label table)
        lut = neighbor_min.select(
            F.col("doc_id").alias("__l"), F.col("label").alias("__ll")
        )
        new_labels = neighbor_min.join(
            lut, neighbor_min.label == F.col("__l"), "left"
        ).select("doc_id", F.coalesce("__ll", "label").alias("label"))
        if (it + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)  # cut lineage
        else:
            new_labels = new_labels.cache()
        new_sum = new_labels.agg(_stat).collect()[0][0]
        # drop the superseded iteration's CACHED frame eagerly; a
        # superseded localCheckpoint's blocks are not in the cache
        # manager (is_cached is False for them) — they are reclaimed by
        # the ContextCleaner once the rebinding below drops the last
        # reference, so at most one checkpointed label table lingers
        # between GC cycles (each is just (doc_id, label) pairs)
        if labels.is_cached:
            labels.unpersist()
        labels = new_labels
        n_iters = it + 1
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if converged:
        _LOG.info("minhash_components converged after %d iterations", n_iters)
    else:
        # exhausted max_iters with the labels still moving: chained
        # components may be split into several clusters — say so
        # instead of claiming convergence (callers should raise
        # max_iters; O(log diameter) rounds normally suffice)
        _LOG.warning(
            "minhash_components did NOT converge after %d iterations; "
            "labels may split long chain components — raise max_iters",
            n_iters,
        )
    result = labels.unionByName(singletons).select(
        "doc_id",
        F.col("label").alias("cluster_rep"),
        (F.col("doc_id") == F.col("label")).alias("is_survivor"),
    )
    # Flatten the result to a LogicalRDD (eager iteration-boundary
    # cut — sanctioned, see operators.pin): by now the fixpoint has
    # executed, but WITHOUT a cut the returned plan nests one join
    # level per iteration times the singleton/union branches —
    # measured at sf0.1: 2 MB of plan text, ~7.5k FileScan nodes —
    # and every consumer pays Catalyst optimization of that tree
    # (seconds per action) even though execution would hit the
    # caches. The checkpointed relation is doc-grain (doc_id,
    # cluster_rep, is_survivor) — the natural materialization a real
    # pipeline would write to a table between stages.
    result = result.localCheckpoint(eager=True)
    # membership is a checkpointed relation now (not cache-managed) —
    # its blocks are reclaimed by the ContextCleaner when the frame
    # drops; the explicit unpersists cover the cache-managed frames
    all_membership.unpersist()
    if labels.is_cached:
        labels.unpersist()
    return result


def simhash_signatures(
    docs: DataFrame, id_col: str, text_col: str, bits: int = 32
) -> DataFrame:
    """bits-wide SimHash over the distinct token set: bit b is set iff
    more token-hashes have bit b set than unset. HOF-only. Token hash
    = md5_key32 (engine-portable — the oracle recomputes the exact
    signature; see module header)."""
    # Staged projections keep every expensive expression evaluated
    # once: tokens → per-token hashes (one md5 per token) →
    # ONE aggregate pass carrying `bits` set-bit counters → pack.
    # (A per-bit filter() would re-scan the token array `bits` times —
    # same trap as the original MinHash implementation. shiftright
    # needs a literal count, so the counter update unrolls per bit
    # inside the single merge lambda.)
    toks = F.array_distinct(textops.tokens(F.col(text_col)))
    hashed = spread_for_compute(docs.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("__n"),
        F.transform(toks, md5_key32).alias("__h"),
    )
    # F.expr strings for the same reason as the MinHash fold: the
    # 32-term unrolled counter update was hundreds of py4j calls per
    # call site; the parsed trees are identical.
    counter_terms = ",".join(
        f"element_at(acc, {b + 1}) + CAST(shiftright(h, {b}) & 1 AS INT)"
        for b in range(bits)
    )
    counts = F.expr(
        f"aggregate(__h, array_repeat(0, {bits}), (acc, h) -> array({counter_terms}))"
    )
    counted = hashed.select("doc_id", "__n", counts.alias("__counts"))
    weights_sql = "array(" + ",".join(f"{1 << b}L" for b in range(bits)) + ")"
    packed = F.expr(
        f"aggregate(zip_with(__counts, {weights_sql}, "
        f"(c, w) -> CASE WHEN c * 2 > __n THEN w ELSE 0L END), 0L, (acc, x) -> acc + x)"
    )
    return counted.select("doc_id", packed.alias("simhash"))


def simhash_near_dups(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bits: int = 32,
    chunks: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs: by pigeonhole, any pair within
    max_hamming ≤ chunks-1 bit flips collides on at least one of the
    `chunks` signature chunks → bucket-join on chunks, verify exact
    Hamming distance with bit_count(xor)."""
    if max_hamming > chunks - 1:
        # the pigeonhole guarantee needs one UNTOUCHED chunk: with
        # max_hamming >= chunks a pair can flip one bit per chunk and
        # collide in no bucket — the result would be silently missing
        # true near-dups, not erroring (round-7 review finding;
        # banded_membership raises for the analogous misuse)
        raise ValueError(
            f"max_hamming={max_hamming} needs chunks >= max_hamming + 1 "
            f"(got chunks={chunks}): recall is no longer guaranteed"
        )
    if bits % chunks != 0:
        raise ValueError(f"bits={bits} not divisible by chunks={chunks}")
    sigs = simhash_signatures(docs, id_col, text_col, bits)
    w = bits // chunks
    mask = (1 << w) - 1
    chunked = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_id"),
                        F.shiftrightunsigned("simhash", c * w)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk_val"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("cc"),
    ).select("doc_id", "simhash", F.col("cc.chunk_id").alias("chunk_id"), F.col("cc.chunk_val").alias("chunk_val"))
    a = chunked.select("chunk_id", "chunk_val", F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"))
    b = chunked.select("chunk_id", "chunk_val", F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"))
    return (
        a.join(b, ["chunk_id", "chunk_val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
