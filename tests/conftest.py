from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
REFERENCE_FIXTURES = "/root/reference/resource/simple_test"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from mapreduce_rust_spark import get_spark

    # warehouse dir is a static conf — must be set at session creation
    # (bucketed-table tests write managed tables there)
    wh = str(tmp_path_factory.mktemp("warehouse"))
    s = get_spark("tests", extra_conf={"spark.sql.warehouse.dir": wh})
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", SF_SMOKE)
