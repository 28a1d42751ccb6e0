"""Property test for the model_naive_bayes_langid ORACLE SQL: the
vocab x language smoothing fan-out, the ordered per-(doc, lang)
fold, and the argmax tie-break must equal an independent pure-Python
reference on arbitrary labeled corpora. Spark == oracle is pinned by
test_oracle_parity; this closes python-brute ↔ oracle-SQL ↔ Spark
(the test_mlstat_property pattern)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from serverless_datalake_spark.queries import load_registry

REGISTRY = load_registry()
_ORACLE = REGISTRY["model_naive_bayes_langid"].oracle


def _rnd(x: float, nd: int) -> float:
    # DuckDB/Spark ROUND on DOUBLE: HALF_UP on the shortest decimal
    # repr (the queries/udfs.py oracle-mimic discipline; Python's
    # built-in round is HALF_EVEN and disagrees on exact midpoints)
    return float(Decimal(repr(x)).quantize(Decimal(1).scaleb(-nd), rounding=ROUND_HALF_UP))


def _reference(docs: list[tuple[int, str, str]]):
    toks = {i: [t for t in text.split(" ") if t != ""] for i, lang, text in docs}
    lang_of = {i: lang for i, lang, _ in docs}
    lt: dict[tuple[str, str], int] = Counter()
    for i, tk in toks.items():
        for t in tk:
            lt[(lang_of[i], t)] += 1
    nl: dict[str, int] = Counter()
    for (lang, _t), c in lt.items():
        nl[lang] += c
    vocab = sorted({t for (_l, t) in lt})
    v = len(vocab)
    cand_langs = sorted(nl)  # langs with >= 1 token (the SQL's nl CTE)
    ll = {
        (t, lang): _rnd(math.log((lt.get((lang, t), 0) + 1.0) / (nl[lang] + v)), 8)
        for t in vocab
        for lang in cand_langs
    }
    nd_docs = Counter(lang for _i, lang, _t in docs)
    total = sum(nd_docs.values())
    lp = {lang: _rnd(math.log(nd_docs[lang] / total), 8) for lang in nd_docs}
    cells: dict[tuple[str, str], int] = Counter()
    for i, tk in toks.items():
        if not tk:
            continue  # token-less docs never reach the contrib join
        kcnt = Counter(tk)
        best = None
        for lang in cand_langs:
            acc = 0.0
            for t in sorted(kcnt):  # ordered fold, bucket-sorted
                acc += float(kcnt[t]) * ll[(t, lang)]
            score = _rnd(lp[lang] + acc, 6)
            if best is None or score > best[0] or (score == best[0] and lang < best[1]):
                best = (score, lang)
        cells[(lang_of[i], best[1])] += 1
    row_tot: dict[str, int] = Counter()
    for (tl, _pl), n in cells.items():
        row_tot[tl] += n
    return {
        (tl, pl): (n, _rnd(n / row_tot[tl], 4)) for (tl, pl), n in cells.items()
    }


_doc_text = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=0, max_size=8
).map(" ".join)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["en", "de", "fr"]), _doc_text),
        min_size=1,
        max_size=12,
    )
)
def test_nb_oracle_equals_python_reference(rows):
    docs = [(i, lang, text) for i, (lang, text) in enumerate(rows)]
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": [i for i, _, _ in docs],
                "lang": [l for _, l, _ in docs],
                "text": [t for _, _, t in docs],
            }
        ),
    )
    got = {
        (r[0], r[1]): (int(r[2]), float(r[3]))
        for r in con.execute(_ORACLE).fetchall()
    }
    con.close()
    assert got == _reference(docs)
