"""Full-registry driver simulation at an arbitrary sf_dir (default
sf0.01, the driver's correctness-gate scale): run every registry
query through the same compare() the tests use (row count + sorted
column names + normalized value multiset vs the DuckDB oracle) and
print one line per failure plus a summary.  Used to pre-verify the
rounds-6..9 DRIVER_WINDOW blocks against the current round's
fixtures before the driver ever sees them.

Usage: python scripts/driver_sim_all.py [sf_dir] [start:stop]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tests.oracle_harness import compare, duckdb_conn  # noqa: E402

from serverless_datalake_spark.queries import load_registry  # noqa: E402
from serverless_datalake_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sl = slice(None)
    if len(sys.argv) > 2:
        a, b = sys.argv[2].split(":")
        sl = slice(int(a) if a else None, int(b) if b else None)
    spark = get_spark(app_name="driver-sim-all", shuffle_partitions=16)
    con = duckdb_conn(sf_dir)
    reg = load_registry()
    names = list(reg)[sl]
    fails: dict[str, list[str]] = {}
    zero_rows: list[str] = []
    t0 = time.time()
    for i, name in enumerate(names):
        q = reg[name]
        try:
            df = q.fn(spark, sf_dir)
            if q.oracle is None:
                n = df.count()
                if n == 0:
                    zero_rows.append(name)
                continue
            problems = compare(df, con, q.oracle)
        except Exception as exc:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(exc).__name__}: {exc}"]
        if problems:
            fails[name] = problems
            print(f"FAIL {name}: {problems[0][:300]}", flush=True)
        if (i + 1) % 50 == 0:
            print(
                f"... {i + 1}/{len(names)} done, {len(fails)} fails, "
                f"{time.time() - t0:.0f}s",
                flush=True,
            )
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n": len(names),
                "n_fail": len(fails),
                "fails": {k: v[0][:200] for k, v in fails.items()},
                "zero_row_unoracled": zero_rows,
                "sec": round(time.time() - t0, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
