from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Private oracle-scratch dir per pytest run: the default path is shared
# machine-wide, and a concurrent driver/verify sweep at another SF
# rewrites artifacts (IVF codebooks, LSH planes) this session's oracles
# are mid-reading (false q129 FAIL, round 6). Must be set before
# plans.queries is imported — the path is baked into oracle SQL strings.
os.environ.setdefault(
    "SPARK_GRAFT_ORACLE_SCRATCH",
    f"/tmp/spark_graft_oracle_pytest_{os.getpid()}",
)

from e_commerce_data_pipeline_spark.session import get_spark  # noqa: E402

TESTDATA_SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("pipeline-tests")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return TESTDATA_SF
