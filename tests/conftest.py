from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sycl_mapreduce_cpu_gpu_hybrid_spark.session import get_spark

# CI runs the symmetric-graph contract probe (a bounded anti-join per
# symmetric pagerank run) so a directed caller fails loudly here
# rather than silently in production; benches leave it off.
os.environ.setdefault("SMRGH_VERIFY_SYMMETRIC", "1")

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
