"""Env-gated Kafka broker round-trip smoke (SURVEY S1/S2).

The sandbox has no broker, so this module is skipped unless
``SPARK_GRAFT_KAFKA_BOOTSTRAP`` points at one (e.g.
``localhost:9092``). With a broker it exercises the one reference
behavior nothing else can: the producer->topic->consumer loop
(/root/reference/kafka/producer/event_producer.py:319-375,
kafka/consumer/event_consumer.py:153-220) — serialize rows with
``to_kafka_frame``, batch-publish with ``kafka_writer``, read back
with ``kafka_reader`` and compare round-tripped payloads.

Requires the spark-sql-kafka connector on the session classpath
(spark.jars.packages org.apache.spark:spark-sql-kafka-0-10_2.13).

Probe record (``tests/kafka_broker_probe.py``, run 2026-08-17 in this
sandbox): broker_distribution=False (no kafka-server-start launcher,
no kafka_* dist with server jars under /opt, /usr/local, /usr/share,
~), spark_sql_kafka_jar=False (no *kafka*.jar in $SPARK_HOME/jars),
python_client=False (no kafka-python / confluent-kafka), and
network_egress=False (pypi.org:443 and archive.apache.org:443 both
unresolvable) — so a single-node KRaft broker can be neither launched
nor fetched here, and even with one the connector jar to reach it is
absent. Re-run the probe after any image change; if it prints
"broker hostable", set SPARK_GRAFT_KAFKA_BOOTSTRAP and this module
runs.
"""

from __future__ import annotations

import json
import os
import uuid

import pytest
from pyspark.sql import functions as F

BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="set SPARK_GRAFT_KAFKA_BOOTSTRAP=<host:port> to run the broker smoke",
)


def test_kafka_round_trip(spark):
    from e_commerce_data_pipeline_spark.sources.kafka import (
        kafka_reader,
        kafka_writer,
        to_kafka_frame,
    )

    topic = f"spark_graft_smoke_{uuid.uuid4().hex[:8]}"
    events = spark.createDataFrame(
        [
            ("evt-1", "sess-a", "u1", "user_click"),
            ("evt-2", "sess-a", None, "user_click"),
            ("evt-3", None, "u2", "order"),
            ("evt-4", None, None, "order"),  # key falls back to 'anonymous'
        ],
        "event_id string, session_id string, user_id string, event_type string",
    )

    kafka_writer(
        to_kafka_frame(events), BOOTSTRAP, topic, streaming=False
    ).save()

    back = (
        kafka_reader(spark, BOOTSTRAP, topic, streaming=False)
        .load()
        .select(
            F.col("key").cast("string").alias("key"),
            F.col("value").cast("string").alias("value"),
        )
        .collect()
    )
    assert len(back) == events.count()
    payloads = {json.loads(r["value"])["event_id"]: r for r in back}
    assert set(payloads) == {"evt-1", "evt-2", "evt-3", "evt-4"}
    # per-key ordering contract: key = first non-null of (session, user)
    assert payloads["evt-1"]["key"] == "sess-a"
    assert payloads["evt-3"]["key"] == "u2"
    assert payloads["evt-4"]["key"] == "anonymous"
    # payload round-trips every column
    assert json.loads(payloads["evt-2"]["value"]) == {
        "event_id": "evt-2",
        "session_id": "sess-a",
        "event_type": "user_click",
    }  # null user_id omitted by to_json
