from __future__ import annotations

import pytest

from vector_knowledge_base_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("vkb-tests", cpus=8, shuffle_partitions=8)
    yield spark
    spark.stop()
