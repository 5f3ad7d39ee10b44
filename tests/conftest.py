from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from clinical_search_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="csdp-tests",
        master="local[4]",
        extra_confs={"spark.sql.shuffle.partitions": "4"},
    )
    yield spark
    spark.stop()
