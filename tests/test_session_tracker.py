"""transformWithStateInPandas session tracker: accumulation across
micro-batches via typed ValueState. Skips where the runtime lacks the
TWS worker's protobuf dependency (this container does — verified: the
worker crashes with ImportError on google.protobuf.descriptor)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from e_commerce_data_pipeline_spark.streaming.session_tracker import (
    track_sessions,
    tws_available,
)

SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)


def _evt(user, ts, value):
    return json.dumps({"user_id": user, "ts": ts, "value": value})


def test_unavailable_runtime_raises_clearly(spark):
    if tws_available():
        pytest.skip("protobuf present; the unavailable path is moot")
    df = spark.readStream.format("rate").load().select(
        F.lit("u").alias("user_id"),
        F.col("timestamp").alias("ts"),
        F.lit(1.0).alias("value"),
    )
    with pytest.raises(NotImplementedError):
        track_sessions(df)


@pytest.mark.skipif(
    not tws_available(), reason="google.protobuf missing (TWS worker dependency)"
)
def test_value_state_accumulates_across_restarts(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    ckpt = tmp_path / "ck"
    collected = {}

    def run():
        raw = spark.readStream.format("text").load(str(src))
        parsed = raw.select(F.from_json("value", SCHEMA).alias("p")).select("p.*")
        tracked = track_sessions(parsed)

        def sink(df, i):
            for r in df.collect():
                collected[r["user_id"]] = r

        q = (
            tracked.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    (src / "b1.txt").write_text(
        "\n".join(
            [
                _evt("u1", "2024-01-01 00:00:00", 10.50),
                _evt("u1", "2024-01-01 00:01:00", 2.25),
                _evt("u2", "2024-01-01 00:00:30", 1.00),
            ]
        )
    )
    run()
    assert collected["u1"]["n_events"] == 2
    assert collected["u1"]["value_cents"] == 1275

    (src / "b2.txt").write_text(_evt("u1", "2024-01-01 00:02:00", 0.25))
    run()
    assert collected["u1"]["n_events"] == 3
    assert collected["u1"]["value_cents"] == 1300
