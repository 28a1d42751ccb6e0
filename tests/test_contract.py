"""Driver-contract guards: __spark_entry__ shape and bench output."""

from __future__ import annotations

import io
import json
from contextlib import redirect_stdout

import __spark_entry__ as ent


def test_entry_contract(spark):
    df = ent.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["day", "n_events", "sum_value", "n_users"]


def test_oracle_keys_subset_of_queries():
    qs = ent.queries()
    os_ = ent.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 79
    # every oracle is non-trivial SQL mentioning a fixture table
    for name, sql in os_.items():
        assert "SELECT" in sql.upper(), name


def test_bench_emits_one_json_line(monkeypatch, spark, tmp_path):
    import bench

    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    # keep the sf0.1 round artifact at the repo root intact
    monkeypatch.setenv("SPARK_GRAFT_BENCH_DETAIL", str(tmp_path / "detail.json"))
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench.main()
    lines = [ln for ln in buf.getvalue().strip().splitlines() if ln.strip()]
    assert len(lines) == 1
    payload = json.loads(lines[0])
    assert payload["unit"] == "sec"
    assert payload["sf"] == 0.001
    assert payload["value"] > 0
    assert set(payload["queries"]) == set(bench.HEADLINE)
