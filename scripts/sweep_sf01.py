#!/usr/bin/env python
"""One-off timed sweep of the ENTIRE registry at sf0.1 (the perf twin
of the sf0.01 correctness sweep): catches data-proportional surprises
in the non-headline queries that bench.py's 49-query set never times.

Runs in CHUNKS of 40 queries, each in a fresh subprocess/JVM: a single
long-lived session accumulates generated projection classes until the
JIT code cache fills and HOF expressions drop to interpreted eval
(observed: a 6 s query taking 25+ min as query #76 of one session).
The per-chunk JVM restart costs ~10 s and keeps every measurement at
codegen speed — which is also the honest number, since production jobs
don't run 330 unrelated queries in one driver.

Writes SWEEP_sf0.1.json: per-query wall seconds. Queries whose FIRST
run exceeds 5 s are run a second time in the same chunk session and
report the steady-state (second) run in `times`, with the cold first
run preserved in `cold_first_run` — measured round 5: graph_pagerank
reads 12.6 s cold vs 3.6 s steady (whole-stage-codegen compilation of
a 17-exchange iterative plan, paid once per JVM), and conflating the
two had the sweep flagging compile time as data-proportional cost.
Sub-5 s queries stay single-run (codegen included) — they are a smoke
screen for scaling anomalies, not a benchmark.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CHUNK = 40

_CHILD = """
import json, sys, time
sys.path.insert(0, {repo!r})
from serverless_datalake_spark.queries import load_registry
from serverless_datalake_spark.session import get_spark

names = json.loads(sys.argv[1])
spark = get_spark(app_name="sweep-chunk")
reg = load_registry()
reg["scan_project"].fn(spark, {sf_dir!r}).write.format("noop").mode("overwrite").save()
times, cold, errs = {{}}, {{}}, {{}}
for name in names:
    t0 = time.time()
    try:
        reg[name].fn(spark, {sf_dir!r}).write.format("noop").mode("overwrite").save()
    except Exception as ex:
        # errs only — a time-to-failure in `times` would inflate
        # total_sec and could list a BROKEN query in over_5s as if it
        # were a slow success (round-7 review finding)
        errs[name] = repr(ex)[:300]
        continue
    t1 = time.time() - t0
    if t1 > 5.0:
        # steady-state rerun: first runs pay whole-stage-codegen
        # compilation (once per JVM), which is not data-proportional
        t0 = time.time()
        reg[name].fn(spark, {sf_dir!r}).write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)
        cold[name] = round(t1, 3)
    else:
        times[name] = round(t1, 3)
print("CHUNK_RESULT " + json.dumps({{"times": times, "cold": cold, "errs": errs}}), flush=True)
"""


BASELINE_SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    from serverless_datalake_spark.queries import load_registry

    reg = load_registry()
    # `exact-baseline` queries are deliberately quadratic oracle twins
    # (kept for verification, never deployed at scale) — sweep them at
    # sf0.01 so the sf0.1 total reflects only production-shaped plans.
    baselines = [n for n, q in reg.items() if "exact-baseline" in q.tags]
    names = [n for n in reg if n not in baselines]
    times: dict[str, float] = {}
    cold: dict[str, float] = {}
    errs: dict[str, str] = {}
    child_src = _CHILD.format(repo=REPO, sf_dir=SF_DIR)
    for lo in range(0, len(names), CHUNK):
        chunk = names[lo : lo + CHUNK]
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, "-c", child_src, json.dumps(chunk)],
                capture_output=True,
                text=True,
                timeout=1800,
            )
        except subprocess.TimeoutExpired:
            for n in chunk:
                errs[n] = "chunk timed out at 1800s (one query likely hung)"
            print(f"{min(lo + CHUNK, len(names))}/{len(names)} CHUNK TIMEOUT", flush=True)
            continue
        out = [l for l in proc.stdout.splitlines() if l.startswith("CHUNK_RESULT ")]
        if not out:
            for n in chunk:
                errs[n] = f"chunk died rc={proc.returncode}: {proc.stderr[-200:]}"
            continue
        res = json.loads(out[0][len("CHUNK_RESULT ") :])
        times.update(res["times"])
        cold.update(res.get("cold", {}))
        errs.update(res["errs"])
        print(
            f"{min(lo + CHUNK, len(names))}/{len(names)} "
            f"(chunk {time.time() - t0:.0f}s, cumulative {sum(times.values()):.0f}s)",
            flush=True,
        )
    base_times: dict[str, float] = {}
    if baselines:
        base_src = _CHILD.format(repo=REPO, sf_dir=BASELINE_SF_DIR)
        try:
            proc = subprocess.run(
                [sys.executable, "-c", base_src, json.dumps(baselines)],
                capture_output=True, text=True, timeout=1800,
            )
            out_l = [l for l in proc.stdout.splitlines() if l.startswith("CHUNK_RESULT ")]
            if out_l:
                res = json.loads(out_l[0][len("CHUNK_RESULT ") :])
                base_times.update(res["times"])
                errs.update(res["errs"])
            else:
                # a silently-dead baseline chunk (OOM, import error)
                # must surface as errors, not as baselines-never-ran
                # (round-7 review finding; mirrors the main loop)
                tail = (proc.stderr or "")[-200:]
                for n in baselines:
                    errs[n] = f"baseline chunk died rc={proc.returncode}: {tail}"
        except subprocess.TimeoutExpired:
            for n in baselines:
                errs[n] = "baseline chunk timed out at 1800s"
    slow = {n: t for n, t in sorted(times.items(), key=lambda kv: -kv[1]) if t > 5.0}
    out = {
        "sf_dir": SF_DIR,
        "n_queries": len(times),
        "total_sec": round(sum(times.values()), 1),
        "over_5s": slow,
        "cold_first_run": dict(sorted(cold.items(), key=lambda kv: -kv[1])),
        "exact_baselines_sf0.01": base_times,
        "errors": errs,
        "times": dict(sorted(times.items(), key=lambda kv: -kv[1])),
    }
    dst = os.path.join(REPO, "SWEEP_sf0.1.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(f"total {out['total_sec']}s; {len(slow)} queries >5s; {len(errs)} errors; wrote {dst}")


if __name__ == "__main__":
    main()
