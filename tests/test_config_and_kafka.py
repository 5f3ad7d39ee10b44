"""Config layering (S6) and Kafka sink framing (K9) unit tests."""

from __future__ import annotations

import json

from clinical_search_data_pipeline_spark.config import load_config
from clinical_search_data_pipeline_spark.sinks.kafka import frame_for_kafka


def test_config_precedence(tmp_path):
    cfg_file = tmp_path / "job.json"
    cfg_file.write_text(json.dumps({"kafka": {"topic": "from_file", "acks": 1}}))
    cfg = load_config(
        defaults={"kafka": {"topic": "default", "acks": 0, "linger_ms": 50}},
        config_file=str(cfg_file),
        environ={"CSDP_KAFKA_ACKS": "2"},
    )
    assert cfg.get("kafka.topic") == "from_file"  # file beats default
    assert cfg.get_int("kafka.acks") == 2  # env beats file
    assert cfg.get_int("kafka.linger_ms") == 50  # default survives
    assert cfg.get("missing", "fallback") == "fallback"


def test_config_require_raises():
    cfg = load_config(defaults={"a": 1})
    try:
        cfg.require("kafka.topic")
        raise AssertionError("expected KeyError")
    except KeyError as e:
        assert "CSDP_KAFKA_TOPIC" in str(e)


def test_kafka_framing(spark):
    df = spark.createDataFrame(
        [(1, "s1", "click"), (2, "s2", "view")], "event_id INT, session_id STRING, event_type STRING"
    )
    framed = frame_for_kafka(df, key_col="session_id")
    assert framed.columns == ["key", "value"]
    rows = {r.key: json.loads(r.value) for r in framed.collect()}
    assert rows["s1"] == {"event_id": 1, "session_id": "s1", "event_type": "click"}
    # value restricted to selected columns
    slim = frame_for_kafka(df, key_col="session_id", value_cols=["event_type"])
    assert json.loads(slim.collect()[0].value) == {"event_type": "click"}
