from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pgvector_db_spark import get_spark, load_tables  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", cpus=8, shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def tables(spark):
    return load_tables(spark, SF_DIR)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "realmodel: needs real sentence-transformers/torch weights "
        "(absent in this image; the test skips itself cleanly)",
    )
    config.addinivalue_line(
        "markers",
        "slow: multi-minute full-registry sweeps (deselect with "
        "-m 'not slow' for a quick loop)",
    )
