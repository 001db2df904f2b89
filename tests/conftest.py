from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from rdkafka_streams_spark import get_spark  # noqa: E402
from rdkafka_streams_spark.testing import duck_con  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    s = get_spark(
        "tests",
        master="local[8]",
        shuffle_partitions=8,
        **{"spark.sql.warehouse.dir": str(wh)},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    return duck_con(SF_DIR)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
