"""ORC source/sink round trip (sources/readers.read_orc / write_orc)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clinical_search_data_pipeline_spark.sources.readers import (
    read_orc,
    read_table,
    write_orc,
)
from tests.conftest import SF_SMOKE


def test_orc_round_trip_and_pushdown(spark, tmp_path):
    docs = read_table(spark, SF_SMOKE, "documents")
    path = str(tmp_path / "docs_orc")
    write_orc(docs, path)
    back = read_orc(spark, path, schema=docs.schema)
    assert back.count() == docs.count()
    a = {r.doc_id: r.text for r in docs.collect()}
    b = {r.doc_id: r.text for r in back.collect()}
    assert a == b
    # filters reach the ORC scan (same pushdown contract as parquet)
    plan = (
        back.filter(F.col("doc_id") < 10)
        .select("doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,10)]" in plan


def test_orc_explicit_schema_subset_prunes_columns(spark, tmp_path):
    docs = read_table(spark, SF_SMOKE, "documents")
    path = str(tmp_path / "docs_orc")
    write_orc(docs, path)
    two = read_orc(spark, path).select("doc_id", "lang")
    assert set(two.columns) == {"doc_id", "lang"}
    plan = two._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in plan
