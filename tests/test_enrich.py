"""Enrichment operators (P1/U1-U3): bot rules, segmentation ladder,
geo broadcast join, ProcessedEvent envelope."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from e_commerce_data_pipeline_spark.operators.enrich import (
    bot_score,
    to_processed_events,
    user_segments,
)


def test_bot_score_flags_hyperactive_and_scripted(spark):
    rows = [("s_hot", f"e{i}", "Chrome") for i in range(120)] + [
        ("s_ok", "e_ok", "Firefox"),
        ("s_bot", "e_bot", "HeadlessChrome/1.0"),
    ]
    df = spark.createDataFrame(rows, "session_id string, event_id string, browser string")
    out = {r["event_id"]: r["is_bot"] for r in bot_score(df, 100).collect()}
    assert out["e0"] is True  # 120 events in one session
    assert out["e_ok"] is False
    assert out["e_bot"] is True  # headless UA


def test_user_segments_ladder(spark):
    rows = [
        ("whale", 600.0, "2024-01-01 00:00:00"),
        *[("loyal", 10.0, f"2024-01-0{i} 00:00:00") for i in range(1, 7)],
        ("newbie", 20.0, "2024-01-01 00:00:00"),
        ("reg", 30.0, "2024-01-01 00:00:00"),
        ("reg", 40.0, "2024-01-02 00:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, total_amount double, ts_s string"
    ).withColumn("timestamp", F.col("ts_s").cast("timestamp"))
    seg = {r["user_id"]: r["user_segment"] for r in user_segments(df).collect()}
    assert seg == {
        "whale": "high_value",
        "loyal": "loyal",
        "newbie": "new",
        "reg": "regular",
    }


def test_processed_event_envelope(spark):
    df = spark.createDataFrame(
        [
            ("e1", "user_click", "2024-01-01 00:00:00", "s1", "u1", "US"),
            ("e2", "user_click", "2024-01-01 00:01:00", "s1", None, "XX"),
        ],
        "event_id string, event_type string, ts_s string, session_id string, user_id string, country_code string",
    ).withColumn("timestamp", F.col("ts_s").cast("timestamp")).drop("ts_s")
    segments = spark.createDataFrame([("u1", "high_value")], "user_id string, user_segment string")
    out = {r["event_id"]: r for r in to_processed_events(df, spark, segments=segments).collect()}
    e1 = out["e1"]
    assert e1["geo_region"] == "AMER"  # US -> AMER broadcast lookup
    assert e1["user_segment"] == "high_value"
    assert not e1["has_missing_fields"]
    payload = json.loads(e1["raw_payload"])  # P1: original record preserved
    assert payload["event_id"] == "e1" and payload["country_code"] == "US"
    e2 = out["e2"]
    assert e2["geo_region"] is None  # unknown country
    assert e2["user_segment"] is None  # anonymous
    assert e2["quality_score"] == 1.0
