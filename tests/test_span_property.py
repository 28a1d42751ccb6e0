"""Property test for the dedup_span_removal ORACLE SQL: the
gram-index + covered-position rewrite must equal an independent
pure-Python reference on arbitrary corpora (including empty docs,
docs shorter than the window, fully-removed docs, and heavy cross-doc
phrase sharing). Spark == oracle is already pinned by
test_oracle_parity, so validating the SQL against Python brute force
closes the chain python-brute ↔ oracle-SQL ↔ Spark without paying a
Spark session per hypothesis example (the test_mlstat_property
pattern)."""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from serverless_datalake_spark.queries import load_registry

_K = 8  # must match llm_dedup._SPAN_K

REGISTRY = load_registry()
_ORACLE = REGISTRY["dedup_span_removal"].oracle


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _reference(docs: list[tuple[int, str]]) -> dict[int, tuple[int, int, int, str]]:
    toks = {i: [t for t in text.split(" ") if t != ""] for i, text in docs}
    gram_docs: dict[str, set[int]] = {}
    grams: dict[int, list[tuple[int, str]]] = {}
    for i, tk in toks.items():
        g = []
        if len(tk) >= _K:
            for p in range(1, len(tk) - _K + 2):
                h = _md5(" ".join(tk[p - 1 : p - 1 + _K]))
                g.append((p, h))
                gram_docs.setdefault(h, set()).add(i)
        grams[i] = g
    out = {}
    for i, tk in toks.items():
        covered: set[int] = set()
        for p, h in grams[i]:
            if len(gram_docs[h]) >= 2:
                covered.update(range(p, p + _K))
        kept = [t for j, t in enumerate(tk, start=1) if j not in covered]
        out[i] = (len(tk), len(tk) - len(kept), len(kept), _md5(" ".join(kept)))
    return out


# Docs are concatenations of a tiny shared-phrase pool plus noise, so
# cross-document >=8-token collisions are COMMON (random token soup
# would almost never collide and the dup path would go untested).
_PHRASES = [
    "p q r s t u v w x",
    "a b c d e f g h",
    "m n o p q r s t u",
]
_doc = st.lists(
    st.one_of(
        st.sampled_from(_PHRASES),
        st.text(alphabet="abc", min_size=1, max_size=3),
    ),
    min_size=0,
    max_size=6,
).map(lambda parts: " ".join(parts))


@settings(max_examples=30, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=8))
def test_span_removal_oracle_equals_python_reference(texts):
    docs = list(enumerate(texts))
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": [i for i, _ in docs], "text": [t for _, t in docs]}),
    )
    rows = con.execute(_ORACLE).fetchall()
    con.close()
    got = {int(r[0]): (int(r[1]), int(r[2]), int(r[3]), r[4]) for r in rows}
    assert got == _reference(docs)


@settings(max_examples=15, deadline=None)
@given(st.lists(st.sampled_from(_PHRASES), min_size=2, max_size=4))
def test_span_removal_identical_docs_fully_removed(parts):
    """Two byte-identical long docs: every window is cross-document
    duplicated, so BOTH rewrite to empty (n_kept 0, kept_fp md5(''))."""
    text = " ".join(parts)
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"doc_id": [0, 1], "text": [text, text]}))
    rows = sorted(con.execute(_ORACLE).fetchall())
    con.close()
    n = len([t for t in text.split(" ") if t])
    for r in rows:
        if n >= _K:
            assert (int(r[2]), int(r[3]), r[4]) == (n, 0, _md5(""))
        else:  # below window width: nothing to flag, doc unchanged
            assert (int(r[2]), int(r[3])) == (0, n)
