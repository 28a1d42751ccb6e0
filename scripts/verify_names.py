#!/usr/bin/env python
"""Oracle-parity check for a named subset of registry queries — the
optimization round's per-change correctness gate (same compare() as
the tests and the full driver sim).

Usage: python scripts/verify_names.py name [name ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tests.oracle_harness import compare, duckdb_conn  # noqa: E402

from serverless_datalake_spark.queries import load_registry  # noqa: E402
from serverless_datalake_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    names = sys.argv[1:]
    spark = get_spark(app_name="verify-names", shuffle_partitions=16)
    con = duckdb_conn(sf_dir)
    reg = load_registry()
    bad = 0
    for name in names:
        q = reg[name]
        df = q.fn(spark, sf_dir)
        if q.oracle is None:
            n = df.count()
            print(f"{name}: rows-only, {n} rows", flush=True)
            continue
        problems = compare(df, con, q.oracle)
        if problems:
            bad += 1
            print(f"{name}: FAIL {problems}", flush=True)
        else:
            print(f"{name}: ok", flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
