from __future__ import annotations

import pytest

from serverless_datalake_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


def pytest_collection_modifyitems(config, items):
    """Split the suite into two marker families so a fast behavior
    pass exists: `-m parity` = the full-registry DuckDB oracle sweep
    (tests/test_oracle_parity.py, the slow half), `-m behavior` =
    everything else (operator/pipeline/plan/property tests)."""
    for item in items:
        fname = item.fspath.basename if hasattr(item, "fspath") else ""
        if fname == "test_oracle_parity.py":
            item.add_marker(pytest.mark.parity)
        else:
            item.add_marker(pytest.mark.behavior)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
