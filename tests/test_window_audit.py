"""Full-registry unpartitioned-window gate (the round-6 verdict's
"script, not a test" gap): rebuild every registry query's physical
plan and fail if any non-allowlisted query carries an unpartitioned
WindowExec — the pattern that serializes a growing relation through
one task at scale. Allowlist changes require editing the checked-in
list in serverless_datalake_spark/plans/window_audit.py with a
bounded-grain justification.

Marked `audit` (slow, ~2.5 min: 408 plan builds, no execution); runs
in the default `pytest tests/` pass and can be scoped with
`-m audit`."""

from __future__ import annotations

import pytest

from serverless_datalake_spark.plans.window_audit import ALLOWLIST, audit_registry
from serverless_datalake_spark.queries import load_registry


@pytest.mark.audit
def test_registry_has_no_unallowlisted_global_windows(spark, sf_dir):
    out = audit_registry(spark, sf_dir, reg=load_registry())
    assert out["n_errors"] == 0, {
        n: v for n, v in out["queries"].items() if "error" in v
    }
    assert out["violations"] == [], {
        n: out["queries"][n] for n in out["violations"]
    }


@pytest.mark.audit
def test_allowlist_has_no_stale_entries():
    """Every allowlisted name must still exist in the registry — a
    renamed/deleted query leaving a stale allowlist row would let a
    NEW query reuse the name and inherit the exemption unreviewed."""
    reg = load_registry()
    stale = sorted(n for n in ALLOWLIST if n not in reg)
    assert stale == [], stale


def test_windows_plan_covers_backlog():
    """Every registry query with no driver CORRECTNESS row yet (the
    backlog = registry minus the union of CORRECTNESS_r*.json keys)
    must appear in some not-yet-run WINDOWS.md round block (>= 8) —
    the round-7 verdict caught the header math lagging the registry
    (three round-7 additions were easy to lose from round 9's list).
    Stable across rounds: planned names that have SINCE come back
    green simply move to `seen`; what can never happen is a backlog
    query missing from every future window (it would never get its
    driver row) or a planned name that exists in no round's registry
    nor history (a typo burning a window slot)."""
    import glob
    import json
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen: set[str] = set()
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        with open(f) as fh:
            seen |= set(json.load(fh).keys())
    reg = set(load_registry())
    backlog = reg - seen
    text = open(os.path.join(repo, "WINDOWS.md")).read()
    planned: set[str] = set()
    for num, block in re.findall(
        r"## round (\d+) \(.*?\)\n\n((?:- .+\n)+)", text
    ):
        if int(num) >= 8:
            planned |= {
                line[2:].split(" ")[0].strip()
                for line in block.strip().splitlines()
            }
    assert backlog <= planned, {
        "backlog_but_not_planned": sorted(backlog - planned)
    }
    assert planned - backlog <= seen, {
        "planned_but_neither_backlog_nor_green": sorted(
            planned - backlog - seen
        )
    }


def test_no_raw_lazy_pins():
    """The pin-audit contract (operators.pin docstring): the ONLY
    eager=False localCheckpoint in the package is pin() itself — a
    raw lazy checkpoint elsewhere would be invisible to
    SPARK_GRAFT_NO_PIN and could hide a global window from the audit
    (round-8 advisor finding: text_zipf_fit had exactly this). Eager
    call sites (iteration-boundary lineage cuts inside driver-side
    loops — a different mechanism, exempt by design) are enumerated
    here so a new one forces a review. AST-based so docstring prose
    mentioning the API doesn't count as a call."""
    import ast
    import os

    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "serverless_datalake_spark",
    )
    lazy: list[str] = []
    eager: set[str] = set()
    for root, _dirs, files in os.walk(pkg):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            rel = os.path.relpath(path, pkg)
            tree = ast.parse(open(path).read(), filename=path)
            for node in ast.walk(tree):
                if not (
                    isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr == "localCheckpoint"
                ):
                    continue
                # eager iff the `eager` arg is ABSENT (defaults True)
                # or is literally True — keyword OR positional (the
                # first positional arg IS `eager`). Anything else
                # (False, a variable, an expression) is classified
                # lazy/suspect so `localCheckpoint(False)` or
                # `localCheckpoint(eager=flag)` can't slip past the
                # gate (round-9 review finding).
                eager_args = [
                    kw.value for kw in node.keywords if kw.arg == "eager"
                ] + node.args[:1]
                is_eager = all(
                    isinstance(a, ast.Constant) and a.value is True
                    for a in eager_args
                )
                (eager.add(rel) if is_eager else lazy.append(rel))
    assert lazy == [os.path.join("operators", "__init__.py")], lazy
    assert eager <= {
        os.path.join("operators", "dedup.py"),
        os.path.join("queries", "graph.py"),
    }, sorted(eager)
