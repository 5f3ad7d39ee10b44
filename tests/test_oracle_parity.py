"""Local replica of the driver's t2 gate: every oracled query must match its
DuckDB oracle exactly (row count + columns + order-insensitive values) at
sf0.001. The driver runs the same comparison at sf0.01."""

from __future__ import annotations

import pytest

from clinical_search_data_pipeline_spark.registry import all_specs
from clinical_search_data_pipeline_spark.testing import check_query
from tests.conftest import SF_SMOKE


def _names() -> list[str]:
    return sorted(all_specs().keys())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, name):
    errors = check_query(spark, SF_SMOKE, name)
    assert not errors, f"{name} mismatch:\n" + "\n".join(errors)
