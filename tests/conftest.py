from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cobradb_spark.session import get_spark

# r7 ADVICE: every scale path derives from ONE movable root so a
# relocated testdata tree is a one-env-var change, not a grep.
TESTDATA_ROOT = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMALL = f"{TESTDATA_ROOT}/sf0.001"
SF_MID = f"{TESTDATA_ROOT}/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_mid() -> str:
    """sf0.01 — for behavioral-contract tests whose assertions are
    scale-sensitive (e.g. DBSCAN must see all three roles)."""
    return SF_MID
