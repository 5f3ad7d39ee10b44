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


def test_env_fingerprint_recorded():
    """The parity run stamps the same env fingerprint bench_results.json
    carries (pyspark version + parquet ts logical type), into
    parity_env.json — so a future environment drift is visible in BOTH
    round artifacts, not only the bench record (VERDICT r04 #8)."""
    import json
    import pathlib

    from clinical_search_data_pipeline_spark.testing import env_fingerprint

    fp = env_fingerprint(SF_SMOKE)
    assert fp["pyspark"] != "unknown", fp
    assert not fp["events_ts_type"].startswith("unknown"), fp
    out = pathlib.Path(__file__).resolve().parent.parent / "parity_env.json"
    out.write_text(json.dumps(fp, indent=2, sort_keys=True) + "\n")
