"""CSV bronze source: schema-pinned, no inference, PERMISSIVE nulls —
same contract as the JSON path (S5) in a third wire format."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_read_csv_log_roundtrip(spark, tmp_path):
    from clinical_search_data_pipeline_spark.schemas import CLICK_EVENT_CSV_SCHEMA
    from clinical_search_data_pipeline_spark.sources.readers import read_csv_log

    cols = [f.name for f in CLICK_EVENT_CSV_SCHEMA.fields]
    p = tmp_path / "clicks.csv"
    rows = [
        # full row; documents pipe-joined
        ["/Date(1700000000000)/", "s1", "42", "http://x", "T", "d1",
         "kw", '",Cardiology,Oncology"', "a|b", "2023-11-14T22:13:20Z",
         "2023-11-14", "k1"],
        # sparse row: empties become nulls under the pinned schema
        ["", "s2", "", "", "", "", "", "", "", "", "2023-11-15", "k2"],
    ]
    lines = [",".join(cols)] + [",".join(r) for r in rows]
    p.write_text("\n".join(lines) + "\n")

    df = read_csv_log(spark, str(p))
    assert [f.name for f in df.schema.fields] == cols
    got = {r.dedup_key: r for r in df.collect()}
    assert got["k1"].document_id == 42  # typed by the pinned schema
    assert got["k1"].documents == "a|b"
    assert got["k2"].document_id is None  # PERMISSIVE null, not a crash
    # the pipe-joined documents field splits with the standard normalizer
    n = (
        df.filter(F.col("dedup_key") == "k1")
        .select(F.explode(F.split("documents", r"\|")).alias("d"))
        .count()
    )
    assert n == 2


def test_read_csv_log_malformed_row_is_null_not_error(spark, tmp_path):
    from clinical_search_data_pipeline_spark.sources.readers import read_csv_log

    p = tmp_path / "bad.csv"
    p.write_text(
        "date_created,session_id,document_id,url,title,doi,keywords,"
        "clinical_areas,documents,event_ts,event_date,dedup_key\n"
        'x,s1,NOT_AN_INT,u,t,d,k,c,docs,ts,2023-11-14,k1\n'
    )
    row = read_csv_log(spark, str(p)).collect()[0]
    assert row.document_id is None and row.session_id == "s1"
