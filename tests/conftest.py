"""Shared Spark fixture for the test suite — one local session, small
shuffle width for speed. The oracle-differential layer (SURVEY.md §5.1)
lives in tools/check_oracle.py and the driver; these tests are the
unit/property/e2e layers (§5.2-5.4)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from pasta_pipeline_spark.session import get_spark

    s = get_spark("pasta-tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def tmp_table_dir(tmp_path):
    return str(tmp_path / "tables")
