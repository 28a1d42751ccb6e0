"""Property tests for the eval_bleu_pairs and sample_dsir_importance
ORACLE SQL against independent pure-Python references (the
test_mlstat_property pattern: Spark == oracle is pinned by
test_oracle_parity, so python-brute ↔ oracle-SQL closes the chain)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from serverless_datalake_spark.queries import load_registry

REGISTRY = load_registry()
_BLEU = REGISTRY["eval_bleu_pairs"].oracle
_DSIR = REGISTRY["sample_dsir_importance"].oracle


def _rnd(x: float, nd: int) -> float:
    return float(
        Decimal(repr(x)).quantize(Decimal(1).scaleb(-nd), rounding=ROUND_HALF_UP)
    )


# ---------------------------------------------------------------- BLEU


def _bleu_ref(doc_id: int, text: str):
    tk = [t for t in text.split(" ") if t != ""]
    nt = len(tk)
    c_toks = tk[: nt - math.floor(3 * nt / 10.0)]
    r_toks = tk[math.floor(nt / 5.0) :]
    c, r = len(c_toks), len(r_toks)

    def gcnt(toks, n):
        return Counter(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        ) if len(toks) >= n else Counter()

    m, t = {}, {}
    for n in (1, 2, 3, 4):
        cg, rg = gcnt(c_toks, n), gcnt(r_toks, n)
        m[n] = sum(min(cnt, rg[g]) for g, cnt in cg.items())
        t[n] = max(c - n + 1, 0)
    prec1 = 0.0 if t[1] == 0 else _rnd(m[1] / t[1], 6)
    prec4 = 0.0 if t[4] == 0 else _rnd(m[4] / t[4], 6)
    if any(m[n] == 0 or t[n] == 0 for n in (1, 2, 3, 4)):
        bleu = 0.0
    else:
        bp = 0.0 if c >= r else _rnd(1.0 - r / c, 8)
        lp = sum(_rnd(math.log(m[n] / t[n]), 8) for n in (1, 2, 3, 4))
        bleu = _rnd(math.exp(bp + lp / 4.0), 6)
    return (c, r, prec1, prec4, bleu)


_PHRASE = ["u v w x y z a b", "c d e f g h i j"]
_text = st.lists(
    st.one_of(st.sampled_from(_PHRASE), st.text(alphabet="ab", min_size=1, max_size=2)),
    min_size=0,
    max_size=5,
).map(" ".join)


@settings(max_examples=25, deadline=None)
@given(st.lists(_text, min_size=1, max_size=6))
def test_bleu_oracle_equals_python_reference(texts):
    ids = [7 * i for i in range(len(texts))]  # all pass the % 7 sample
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"doc_id": ids, "text": texts}))
    rows = con.execute(_BLEU).fetchall()
    con.close()
    got = {
        int(r[0]): (int(r[1]), int(r[2]), float(r[3]), float(r[4]), float(r[5]))
        for r in rows
    }
    assert got == {i: _bleu_ref(i, t) for i, t in zip(ids, texts)}


# ---------------------------------------------------------------- DSIR


def _bucket(t: str) -> int:
    return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 256


def _dsir_ref(docs: list[tuple[int, str, str]]):
    toks = {i: [t for t in text.split(" ") if t != ""] for i, _l, text in docs}
    lang_of = {i: l for i, l, _ in docs}
    qc, pc = Counter(), Counter()
    for i, tk in toks.items():
        for t in tk:
            b = _bucket(t)
            qc[b] += 1
            if lang_of[i] == "en":
                pc[b] += 1
    nq, np_ = sum(qc.values()), sum(pc.values())
    w = {
        b: _rnd(math.log((pc.get(b, 0) + 1.0) / (np_ + 256.0)), 8)
        - _rnd(math.log((qc[b] + 1.0) / (nq + 256.0)), 8)
        for b in qc
    }
    scored = []
    for i, tk in toks.items():
        if not tk:
            continue
        kcnt = Counter(_bucket(t) for t in tk)
        acc = 0.0
        for b in sorted(kcnt):
            acc += float(kcnt[b]) * w[b]
        scored.append((i, lang_of[i], len(tk), _rnd(acc, 6)))
    # NTILE(5) ORDER BY logw DESC, doc_id: first (n % 5) tiles get
    # ceil(n/5) rows
    scored.sort(key=lambda r: (-r[3], r[0]))
    n = len(scored)
    big, rem = divmod(n, 5)
    tile1 = big + (1 if rem >= 1 else 0)
    return {
        r[0]: (r[1], r[2], r[3], 1 if idx < tile1 else 0)
        for idx, r in enumerate(scored)
    }


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["en", "de"]), _text), min_size=1, max_size=10
    )
)
def test_dsir_oracle_equals_python_reference(rows):
    docs = [(i, l, t) for i, (l, t) in enumerate(rows)]
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
        int(r[0]): (r[1], int(r[2]), float(r[3]), int(r[4]))
        for r in con.execute(_DSIR).fetchall()
    }
    con.close()
    assert got == _dsir_ref(docs)


# ---------------------------------------------------------------- chrF

_CHRF = REGISTRY["eval_chrf_pairs"].oracle


def _chrf_ref(doc_id: int, text: str):
    tk = [t for t in text.split(" ") if t != ""]
    nt = len(tk)
    cs = "".join(tk[: nt - math.floor(3 * nt / 10.0)])
    rs = "".join(tk[math.floor(nt / 5.0) :])
    c, r = len(cs), len(rs)

    def gcnt(s, n):
        return Counter(s[i : i + n] for i in range(len(s) - n + 1))

    def avg(side_len, other):
        acc = 0.0
        for n in (1, 2, 3, 4):
            t = side_len - (n - 1)
            if t <= 0:
                acc += 0.0
            else:
                m = sum(
                    min(cnt, gcnt(other[1], n)[g])
                    for g, cnt in gcnt(other[0], n).items()
                )
                acc += m / t
        return acc / 4.0

    p = avg(c, (cs, rs))
    rr = avg(r, (rs, cs))
    chrf = 0.0 if 4.0 * p + rr == 0.0 else _rnd(5.0 * p * rr / (4.0 * p + rr), 6)
    return (c, r, _rnd(p, 6), _rnd(rr, 6), chrf)


@settings(max_examples=25, deadline=None)
@given(st.lists(_text, min_size=1, max_size=6))
def test_chrf_oracle_equals_python_reference(texts):
    ids = [7 * i for i in range(len(texts))]
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"doc_id": ids, "text": texts}))
    rows = con.execute(_CHRF).fetchall()
    con.close()
    got = {
        int(r[0]): (int(r[1]), int(r[2]), float(r[3]), float(r[4]), float(r[5]))
        for r in rows
    }
    assert got == {i: _chrf_ref(i, t) for i, t in zip(ids, texts)}
