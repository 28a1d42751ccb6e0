#!/usr/bin/env python
"""Round-artifact wrapper for the registry-wide unpartitioned-window
audit (core + allowlist live in
serverless_datalake_spark/plans/window_audit.py so the pytest gate,
tests/test_window_audit.py, shares them). Writes WINDOW_AUDIT.json;
exit code 1 if any non-allowlisted query has an unpartitioned window.

Usage: python scripts/window_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from serverless_datalake_spark.plans.window_audit import audit_registry  # noqa: E402
from serverless_datalake_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="window-audit", shuffle_partitions=16)
    out = audit_registry(spark, sf_dir)
    with open(os.path.join(REPO, "WINDOW_AUDIT.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(
        f"{out['n_with_unpartitioned_windows']} queries with unpartitioned "
        f"windows, {out['n_errors']} plan-build errors, "
        f"{len(out['violations'])} violations, {out['sec']}s -> WINDOW_AUDIT.json"
    )
    if out["violations"]:
        print("VIOLATIONS:", ", ".join(out["violations"]))
        sys.exit(1)


if __name__ == "__main__":
    main()
