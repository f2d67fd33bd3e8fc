from __future__ import annotations

import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


def pytest_configure(config):
    # fast/slow split (r13, VERDICT r12 #7): `slow` marks the
    # chaos/fuzz/stress suites and the individually heavy (>~8 s)
    # cases, so the per-batch loop can run `pytest -m "not slow"`
    # (~half the wall time) while the round gate runs everything.
    config.addinivalue_line(
        "markers",
        "slow: chaos/fuzz/stress suites and >~8s cases — per-batch "
        'loops run -m "not slow"; the round gate runs all',
    )


@pytest.fixture(scope="session")
def spark():
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark(app_name="lakegraft-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_CORRECT}/{t}.parquet')"
        )
    yield con
    con.close()
