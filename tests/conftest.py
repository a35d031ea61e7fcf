from __future__ import annotations

import sys
from pathlib import Path

import pytest

# Make `import oracle` and the package importable when pytest runs from
# the repo root.
sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent))

SF_SMOKE = "/root/testdata/sf0.001"
SF_T2 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from flink_streaming_kmeans_spark.session import get_spark

    s = get_spark("pytest")
    yield s


@pytest.fixture(scope="session")
def duck_smoke():
    from oracle import make_duckdb

    return make_duckdb(SF_SMOKE)


@pytest.fixture(scope="session")
def duck_t2():
    from oracle import make_duckdb

    return make_duckdb(SF_T2)


@pytest.fixture(scope="session")
def registry():
    from flink_streaming_kmeans_spark.plans.registry import collect

    return collect()
