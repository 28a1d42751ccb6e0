"""Property tests for the round-8 k-group statistics: the oracle SQL
of stats_kruskal_wallis / stats_dunn_posthoc / stats_levene_bf /
stats_tukey_hsd / eval_fleiss_kappa must equal brute-force Python on
arbitrary small inputs (ties, singleton groups, skewed sizes). Spark ==
oracle is already pinned by test_oracle_parity, so validating the SQL
against brute force closes the chain python-brute ↔ oracle-SQL ↔ Spark
without paying a Spark session per hypothesis example (the
test_mlstat_property pattern)."""

from __future__ import annotations

import itertools
import math
import statistics as st_mod
from collections import Counter

import duckdb
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from serverless_datalake_spark.queries import load_registry

REG = load_registry()

# (grp, value) rows: 2-4 groups, small value domain to force heavy ties
_rows = st.lists(
    st.tuples(st.sampled_from(["A", "B", "C", "D"]), st.integers(0, 8)),
    min_size=4,
    max_size=40,
)


def _mid_ranks(vals: list[int]) -> dict[int, float]:
    cnt = Counter(vals)
    ranks, pos = {}, 0
    for v in sorted(cnt):
        c = cnt[v]
        ranks[v] = pos + (c + 1) / 2
        pos += c
    return ranks


def _kw_brute(rows: list[tuple[str, int]]) -> float:
    vals = [v for _, v in rows]
    ranks = _mid_ranks(vals)
    cnt = Counter(vals)
    n = len(vals)
    groups: dict[str, list[int]] = {}
    for g, v in rows:
        groups.setdefault(g, []).append(v)
    srn = sum(sum(ranks[v] for v in xs) ** 2 / len(xs) for xs in groups.values())
    h = 12 / (n * (n + 1)) * srn - 3 * (n + 1)
    corr = 1 - sum(c**3 - c for c in cnt.values()) / (n**3 - n)
    return h / corr


def _con_lineitem_qty(rows: list[tuple[str, int]]) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("CREATE TABLE lineitem(l_returnflag VARCHAR, l_quantity BIGINT)")
    con.executemany("INSERT INTO lineitem VALUES (?, ?)", rows)
    return con


@settings(max_examples=40, deadline=None)
@given(_rows)
def test_kruskal_wallis_oracle_matches_brute(rows):
    assume(len({g for g, _ in rows}) >= 2)
    assume(len({v for _, v in rows}) >= 2)  # tie correction nonzero
    got = _con_lineitem_qty(rows).execute(REG["stats_kruskal_wallis"].oracle).fetchone()
    assert got[1] == len(rows)
    assert math.isclose(got[3], round(_kw_brute(rows), 6), abs_tol=1e-6)


@settings(max_examples=40, deadline=None)
@given(_rows)
def test_dunn_oracle_matches_brute(rows):
    assume(len({g for g, _ in rows}) >= 2)
    assume(len({v for _, v in rows}) >= 2)
    vals = [v for _, v in rows]
    ranks = _mid_ranks(vals)
    cnt = Counter(vals)
    n = len(vals)
    groups: dict[str, list[int]] = {}
    for g, v in rows:
        groups.setdefault(g, []).append(v)
    var0 = n * (n + 1) / 12 - sum(c**3 - c for c in cnt.values()) / (12 * (n - 1))
    assume(var0 > 0)  # all-tied data has zero rank variance
    want = {}
    for g1, g2 in itertools.combinations(sorted(groups), 2):
        m1 = sum(ranks[v] for v in groups[g1]) / len(groups[g1])
        m2 = sum(ranks[v] for v in groups[g2]) / len(groups[g2])
        z = abs(m1 - m2) / math.sqrt(var0 * (1 / len(groups[g1]) + 1 / len(groups[g2])))
        want[(g1, g2)] = (round(abs(m1 - m2), 6), round(z, 6))
    got = _con_lineitem_qty(rows).execute(REG["stats_dunn_posthoc"].oracle).fetchall()
    assert len(got) == len(want)
    for g1, g2, rank_diff, z_stat, _ in got:
        w = want[(g1, g2)]
        assert math.isclose(rank_diff, w[0], abs_tol=1e-6)
        assert math.isclose(z_stat, w[1], abs_tol=1e-6)


@settings(max_examples=40, deadline=None)
@given(_rows)
def test_levene_bf_oracle_matches_brute(rows):
    assume(len({g for g, _ in rows}) >= 2)
    groups: dict[str, list[int]] = {}
    for g, v in rows:
        groups.setdefault(g, []).append(v)
    meds = {g: st_mod.median(xs) for g, xs in groups.items()}
    z = {g: [abs(x - meds[g]) for x in xs] for g, xs in groups.items()}
    allz = [x for xs in z.values() for x in xs]
    n, k = len(allz), len(z)
    assume(n > k)
    zbar = sum(allz) / n
    ssb = sum(len(xs) * ((sum(xs) / len(xs)) - zbar) ** 2 for xs in z.values())
    ssw = sum((x - sum(xs) / len(xs)) ** 2 for xs in z.values() for x in xs)
    assume(ssw > 1e-9)  # all-constant |x - med| → F undefined
    f = (ssb / (k - 1)) / (ssw / (n - k))
    con = duckdb.connect()
    con.execute("CREATE TABLE lineitem(l_returnflag VARCHAR, l_extendedprice DOUBLE)")
    con.executemany(
        "INSERT INTO lineitem VALUES (?, ?)", [(g, v / 100.0) for g, v in rows]
    )
    got = con.execute(REG["stats_levene_bf"].oracle).fetchone()
    assert got[1] == n
    assert math.isclose(got[2], round(f, 6), abs_tol=1e-5)


@settings(max_examples=40, deadline=None)
@given(_rows)
def test_tukey_oracle_matches_brute(rows):
    assume(len({g for g, _ in rows}) >= 2)
    groups: dict[str, list[int]] = {}
    for g, v in rows:
        groups.setdefault(g, []).append(v)
    n, k = len(rows), len(groups)
    assume(n > k)
    means = {g: sum(xs) / len(xs) for g, xs in groups.items()}
    ssw = sum((x - means[g]) ** 2 for g, xs in groups.items() for x in xs)
    assume(ssw > 1e-9)
    mse = ssw / (n - k)
    want = {}
    for g1, g2 in itertools.combinations(sorted(groups), 2):
        d = abs(means[g1] - means[g2])
        q = d / math.sqrt(mse / 2 * (1 / len(groups[g1]) + 1 / len(groups[g2])))
        want[(g1, g2)] = (round(d, 6), round(q, 6))
    got = _con_lineitem_qty(rows).execute(REG["stats_tukey_hsd"].oracle).fetchall()
    assert len(got) == len(want)
    for g1, g2, mean_diff, q_stat, _ in got:
        w = want[(g1, g2)]
        assert math.isclose(mean_diff, w[0], abs_tol=1e-6)
        assert math.isclose(q_stat, w[1], abs_tol=1e-5)


_docs = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "dd", "eee"]), min_size=0, max_size=40),
    min_size=1,
    max_size=25,
)


@settings(max_examples=40, deadline=None)
@given(_docs)
def test_fleiss_kappa_oracle_matches_brute(docs):
    votes = []
    for toks in docs:
        a = 1 if len(toks) >= 30 else 0
        b = 1 if 2 * len(set(toks)) >= len(toks) else 0
        c = 1 if (a and b) else 0
        votes.append(a + b + c)
    n_items = len(votes)
    p_bar = sum(v * v + (3 - v) * (3 - v) - 3 for v in votes) / (6 * n_items)
    p1 = sum(votes) / (3 * n_items)
    p_e = p1 * p1 + (1 - p1) * (1 - p1)
    assume(abs(1 - p_e) > 1e-9)  # unanimous-everything → kappa undefined
    kappa = (p_bar - p_e) / (1 - p_e)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?)", [(" ".join(t),) for t in docs])
    got = con.execute(REG["eval_fleiss_kappa"].oracle).fetchone()
    assert got[0] == n_items
    assert math.isclose(got[1], round(p_bar, 6), abs_tol=1e-6)
    assert math.isclose(got[2], round(p_e, 6), abs_tol=1e-6)
    assert math.isclose(got[3], round(kappa, 6), abs_tol=1e-6)
