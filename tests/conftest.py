from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkdiff.session import get_spark  # noqa: E402

SF_DIR_SMALL = "/root/testdata/sf0.001"
SF_DIR_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("sparkdiff-tests", cpus=8, shuffle_partitions=8)
    yield s
