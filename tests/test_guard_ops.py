"""Hand-computed semantic checks for the data-guard operators — the
oracle parity suite proves Spark == DuckDB, these prove both equal the
INTENDED semantics on known inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from serverless_datalake_spark.queries import load_registry
from serverless_datalake_spark.tables import load_table


def test_pii_redact_removes_every_detected_pattern(spark, sf_dir):
    reg = load_registry()
    red = reg["pii_redact"].fn(spark, sf_dir)
    det = reg["pii_detect"].fn(spark, sf_dir)
    # after redaction, the detection regexes must find nothing
    leftover = red.select(
        F.expr(
            "size(regexp_extract_all(redacted, '[a-z0-9]+@[a-z0-9]+[.]com', 0))"
            " + size(regexp_extract_all(redacted, '555-[0-9][0-9][0-9][0-9]', 0))"
            " + size(regexp_extract_all(redacted, 'http://[a-z0-9./?=]+', 0))"
        ).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert leftover == 0
    # every document had at least one of each injected pattern
    mins = det.agg(
        F.min("n_emails"), F.min("n_phones"), F.min("n_urls")
    ).collect()[0]
    assert mins[0] >= 1 and mins[1] >= 1 and mins[2] >= 1
    # placeholders actually landed
    n_placeholders = red.where(
        F.col("redacted").contains("<EMAIL>")
        & F.col("redacted").contains("<PHONE>")
        & F.col("redacted").contains("<URL>")
    ).count()
    assert n_placeholders == red.count()


def test_clean_normalize_produces_canonical_spacing(spark, sf_dir):
    reg = load_registry()
    out = reg["text_clean_normalize"].fn(spark, sf_dir)
    bad = out.where(
        F.col("clean_text").contains("  ")
        | F.col("clean_text").contains("\t")
        | F.col("clean_text").startswith(" ")
        | F.col("clean_text").endswith(" ")
    ).count()
    assert bad == 0
    # cleaning must preserve the token sequence exactly
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    joined = out.join(docs, "doc_id")
    mismatches = joined.where(
        F.filter(F.split("clean_text", " "), lambda x: x != "")
        != F.filter(F.split("text", " "), lambda x: x != "")
    ).count()
    assert mismatches == 0


def test_url_canonical_groups_variants(spark, sf_dir):
    reg = load_registry()
    out = reg["dedup_url_canonical"].fn(spark, sf_dir)
    rows = out.collect()
    # canonical keys carry no scheme/www/query noise
    for r in rows:
        assert not r.canonical_url.startswith("http://")
        assert "www." not in r.canonical_url
        assert "?" not in r.canonical_url
    # 7 sites × 13 pages = 91 canonical URLs; variants collapse into them
    assert len(rows) == 91
    assert sum(r.n_docs for r in rows) == load_table(spark, sf_dir, "documents").count()
    # with ≥2 docs per canonical URL there must be collapsed variants
    assert any(r.n_variants > 1 for r in rows)


def test_intra_line_dedup_conserves_and_dedups(spark, sf_dir):
    reg = load_registry()
    out = reg["dedup_intra_lines"].fn(spark, sf_dir)
    agg = out.agg(
        F.sum("n_lines_kept").alias("kept"), F.sum("n_lines_total").alias("total")
    ).collect()[0]
    assert 0 < agg.kept <= agg.total
    # something actually deduplicated (the fixtures repeat lines)
    assert agg.kept < agg.total
    # global first-occurrence-wins ⇒ re-segmenting the kept text into
    # 10-token lines must yield a GLOBALLY unique line multiset
    toks = F.filter(F.split(F.col("kept_text"), " "), lambda x: x != "")
    kept_lines = (
        out.where(F.col("kept_text") != "")
        .select(
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(0), F.ceil(F.size(toks) / F.lit(10.0)).cast("int") - 1
                    ),
                    lambda i: F.array_join(F.slice(toks, i * 10 + 1, 10), " "),
                )
            ).alias("line")
        )
    )
    n_lines = kept_lines.count()
    n_distinct = kept_lines.distinct().count()
    assert n_lines > 0 and n_lines == n_distinct
    # the doc with doc_id 0 keeps at least its own first line (nothing
    # precedes (0, 0) in the global order)
    first = out.where(F.col("doc_id") == 0).collect()[0]
    assert first.n_lines_kept >= 1


def test_decontaminate_threshold_semantics(spark, sf_dir):
    reg = load_registry()
    out = reg["decontaminate_semantic"].fn(spark, sf_dir)
    rows = out.collect()
    assert all(r.score >= 0.30 for r in rows)
    # flagged ids must be train-side (>= 10); eval ids eval-side (< 10)
    assert all(r.train_id >= 10 and r.closest_eval_id < 10 for r in rows)
    # one row per flagged train vector (top-1, not top-k)
    assert len({r.train_id for r in rows}) == len(rows)


def test_winsorize_approx_twin_matches_exact_bounds(spark, sf_dir):
    """The approxQuantile production twin must land within sketch
    tolerance of the exact order-statistic bounds the oracle query
    uses (rel_err 0.001 on ~4k rows ⇒ a few rank positions)."""
    from serverless_datalake_spark.queries.features import winsorize_bounds_approx

    li = load_table(spark, sf_dir, "lineitem")
    lo_a, hi_a = winsorize_bounds_approx(li, "l_extendedprice")
    n = li.count()
    exact = (
        li.select(F.col("l_extendedprice").alias("v"))
        .orderBy("v")
        .collect()
    )
    vs = [r.v for r in exact]
    import math

    def exact_bound(p):
        idx = p * (n - 1)
        f = idx - math.floor(idx)
        i = int(math.floor(idx))
        return vs[i] + f * (vs[i + 1] - vs[i])

    lo_e, hi_e = exact_bound(0.01), exact_bound(0.99)
    # sketch guarantees rank error <= rel_err * n; translate to value
    # tolerance via the neighborhood spread around each bound
    slack = max(3, int(0.002 * n))
    lo_band = vs[max(0, int(0.01 * n) - slack) : int(0.01 * n) + slack]
    hi_band = vs[int(0.99 * n) - slack : min(n, int(0.99 * n) + slack)]
    assert min(lo_band) <= lo_a <= max(lo_band), (lo_a, lo_e)
    assert min(hi_band) <= hi_a <= max(hi_band), (hi_a, hi_e)
