from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")

# Deterministic count-based version retirement for the suite (r12): the
# PRODUCTION default keeps superseded versions for a generous TTL
# (storage.version_ttl_s, SPARK_GRAFT_VERSION_TTL_S=3600) so long scans
# survive rapid mutation bursts; tests that pin exact retirement /
# steady-state directory layouts need the count-only mode. TTL-specific
# tests opt back in with an explicit ttl_s argument or monkeypatched env.
os.environ.setdefault("SPARK_GRAFT_VERSION_TTL_S", "0")


@pytest.fixture(scope="session")
def spark():
    import tempfile

    from hbacker_spark.session import get_spark

    # Fewer threads/partitions for test latency; semantics identical.
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark(
        "hbacker_spark_tests",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark_wh_")},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMALL


@pytest.fixture(scope="session")
def oracle_sf_dir() -> str:
    return SF_ORACLE
